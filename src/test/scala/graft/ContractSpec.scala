package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: `oracleSql` keys must reference
  * real queries, and the rows-only set (queries with NO oracle) must
  * stay exactly the declared four — a typo'd oracle key or a new query
  * registered without its oracle would otherwise degrade SILENTLY to
  * the driver's weaker rows-only check and surface only in the
  * round-end CORRECTNESS report.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracleSql key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("the rows-only set is exactly the declared q13/q26/q61/qd24") {
    // q13's greedy k-center, q26's MLlib solver internals, q61's
    // boosted-tree split search, and qd24's data-dependent fixpoint
    // pass count are the only computations with no SQL analogue; all
    // four are spec-verified (qd24's oracle-mirrorable twin is qd21)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q13_coreset", "q26_mllib_forecast", "q61_gbt_forecast",
        "qd24_span_fixpoint"),
      "a query lost (or gained) its oracle without the declaration moving")
  }

  test("query keys follow the short-prefix naming the bench JSON relies on") {
    // Bench truncates each name at the first '_' AND drops the uniform
    // leading 'q' for the driver's 2000-byte output window; the q-less
    // prefixes must stay unique or timings would collide
    val prefixes = SparkEntry.queries.keySet.toSeq
      .map(_.takeWhile(_ != '_').drop(1))
    assert(prefixes.distinct.size === prefixes.size,
      "duplicate q-less prefixes would collide in the bench JSON")
    assert(SparkEntry.queries.keySet.forall(_.matches("^q[a-z]?\\d+_[a-z0-9_]+$")))
  }

  test("the bench JSON line fits the driver's 2000-byte output window") {
    // project the worst case Bench can emit: the 150 WIDEST-keyed
    // entries of the stdout cap at the widest 3-char adaptive value
    // rendering ("9.9" / "999"), the fixed envelope, the sf basename,
    // the `"more":N` omission marker, AND the capped errors tail
    // (2 names + nerr, modeled conservatively WITHOUT removing their
    // per-query entries) — truncation here is the BENCH_r03/r04
    // 'parsed: null' failure mode, caught at build time instead of
    // round end. The full per-query map lives in BENCH_DETAIL.json,
    // which has no byte window.
    val keys = SparkEntry.queries.keySet.toSeq
    val worstQueries = keys
      .map(k => "\"" + k.takeWhile(_ != '_').drop(1) + "\":999")
      .sortBy(-_.length).take(150)
      .mkString("{", ",", "}")
    val worstErrs = keys.map(k => "\"" + k.takeWhile(_ != '_').drop(1) + "\"")
      .sortBy(-_.length).take(2)
      .mkString(""","errors":[""", ",", s"""],"nerr":${keys.size}""")
    val worstLine =
      s"""{"metric":"total","value":9999.9,"unit":"sec","queries":$worstQueries,"more":${keys.size},"runs":[999,999,999],"calib":999$worstErrs,"sf":"sf0.001"}"""
    // budget is NOT the full 2000: sbt's trailing "[success] Total
    // time: ..." line (~80 B) lands in the same last-2000-bytes driver
    // capture AFTER the JSON line, so the line itself must leave room
    // for it or its head gets truncated (the BENCH_r03/r04 failure).
    assert(worstLine.length <= 1900,
      s"projected bench line ${worstLine.length} B — trim precision or keys before the 2000-B window truncates it")
  }
}
