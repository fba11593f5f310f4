package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.util.Quantiles

/** util.Quantiles is the threshold engine for the whole detection family
  * (q16/q23/q27/qp3/ModelStore/Coreset) — its rank-select internals
  * (range partition + per-partition counts + single-partition selects)
  * must reproduce the interpolated order statistics of a plain sorted
  * array bit-for-bit, for any partitioning of the input.
  */
class QuantilesSpec extends AnyFunSuite with SparkSuite {

  /** DuckDB-style interpolation over an in-driver sorted array. */
  private def refQuantile(sorted: Array[Double], q: Double): Double = {
    val r = (sorted.length - 1) * q
    val lo = math.floor(r).toInt
    val hi = math.ceil(r).toInt
    if (hi == lo) sorted(lo)
    else (1.0 - (r - lo)) * sorted(lo) + (r - lo) * sorted(hi)
  }

  test("rank-select quantiles == sorted-array interpolation (random sizes, dupes, partitionings)") {
    import spark.implicits._
    val rnd = new Random(7)
    val qs = Seq(0.01, 0.25, 0.5, 0.85, 0.99)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(5000)
      // heavy duplicates every other trial → many ties straddling
      // range-partition boundaries
      val vals = Array.fill(n)(
        if (trial % 2 == 0) rnd.nextInt(7).toDouble else rnd.nextDouble() * 2000 - 1000)
      val parts = 1 + rnd.nextInt(50) // more partitions than data sometimes
      val df = spark.sparkContext.parallelize(vals.toSeq, parts).toDF("v")
      val got = Quantiles.exact(df, "v", qs)
      val sorted = vals.sorted
      qs.foreach { q =>
        val want = refQuantile(sorted, q)
        assert(got(q).contains(want),
          s"trial $trial n=$n parts=$parts q=$q: got ${got(q)}, want $want")
      }
    }
  }

  test("edges: empty input -> None; single row -> that row for every q") {
    import spark.implicits._
    val empty = spark.emptyDataset[Double].toDF("v")
    assert(Quantiles.exact(empty, "v", Seq(0.5))(0.5).isEmpty)
    val one = Seq(42.5).toDF("v")
    assert(Quantiles.exactOne(one, "v", 0.0).contains(42.5))
    assert(Quantiles.exactOne(one, "v", 0.5).contains(42.5))
    assert(Quantiles.exactOne(one, "v", 1.0).contains(42.5))
  }

  test("nulls are ignored, like percentile()") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0), None, Some(2.0)).toDF("v")
    assert(Quantiles.exactOne(df, "v", 0.5).contains(2.0))
  }

  /** util.PrefixSum backs qt11/qm4's shard packing (r17): the two-pass
    * bucketed form must equal the naive single-window running sum
    * bit-for-bit for ANY group shape, bucket count (incl. buckets ≫
    * rows and buckets = 1, the degenerate single-window case), gappy
    * ids, and NEGATIVE values (the per-bucket total reads the window's
    * last row via max_by, which must stay exact when cumsums are not
    * monotone).
    */
  test("PrefixSum.runningSum equals the single-window running sum (40 random instances)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new Random(17)
    for (i <- 1 to 40) {
      val n = 1 + rnd.nextInt(120)
      val nGroups = 1 + rnd.nextInt(4)
      val nBuckets = Seq(1, 2, 7, 64, 1000)(rnd.nextInt(5))
      // gappy, shuffled ids; values can be negative
      val ids = rnd.shuffle((0 until 3 * n).toList).take(n)
      val rows = ids.map(id =>
        (s"g${rnd.nextInt(nGroups)}", id.toLong, (rnd.nextInt(401) - 100).toLong))
      val df = rows.toDF("g", "id", "v").repartition(1 + rnd.nextInt(5))
      val got = graft.util.PrefixSum.runningSum(df, Seq("g"), "id", "v", "cum", nBuckets)
        .select("g", "id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val w = Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val want = df.withColumn("cum", sum("v").over(w))
        .select("g", "id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === want, s"instance $i (n=$n groups=$nGroups buckets=$nBuckets)")
    }
  }

  test("PrefixSum.runningSum on empty input stays empty") {
    import spark.implicits._
    val df = Seq.empty[(String, Long, Long)].toDF("g", "id", "v")
    assert(graft.util.PrefixSum.runningSum(df, Seq("g"), "id", "v", "cum").count() === 0)
  }

  /** ADVICE r17: the old bucket id multiplied (ord−lo)·nBuckets, which
    * wraps for id ranges > 2⁶³/nBuckets (sparse snowflake/hash ids) —
    * silently breaking bucket monotonicity. The width-division form
    * must stay exact with ids pinned against Long.MaxValue (range ≈
    * 2⁶²·3, far past the old overflow point) and with a single-row
    * group riding along.
    */
  test("PrefixSum.runningSum is exact for ids near Long.MaxValue (old form overflowed)") {
    import spark.implicits._
    val big = Long.MaxValue
    val rows = Seq(
      ("a", big - 4L, 10L), ("a", big - 2L, -3L), ("a", big, 7L),
      ("a", big / 2, 5L), ("a", 42L, 1L),
      ("solo", big - 1L, 99L))
    val df = rows.toDF("g", "id", "v").repartition(3)
    val got = graft.util.PrefixSum.runningSum(df, Seq("g"), "id", "v", "cum", 64)
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("a", 42L) -> 1L, ("a", big / 2) -> 6L, ("a", big - 4L) -> 16L,
      ("a", big - 2L) -> 13L, ("a", big) -> 20L, ("solo", big - 1L) -> 99L))
  }

  /** ADVICE r17: a null order id used to be silently DROPPED (the
    * single-window form keeps it, nulls-first) — the contract is now a
    * loud failure, never a divergent row count.
    */
  test("PrefixSum.runningSum raises on a null order column") {
    import spark.implicits._
    val df = Seq[(String, Option[Long], Long)](("a", Some(1L), 1L), ("a", None, 2L))
      .toDF("g", "id", "v")
    val ex = intercept[Exception] {
      graft.util.PrefixSum.runningSum(df, Seq("g"), "id", "v", "cum").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("null in order column")))
  }
}
