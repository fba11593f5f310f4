package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-generated parquet test data.
  *
  * At cluster scale these would be catalog tables (bucketed on their join
  * keys); locally they are plain parquet reads. Column pruning and filter
  * pushdown reach the scan because every operator selects columns before
  * acting (verify with `.explain`: `ReadSchema`/`PushedFilters`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread an UNDER-SPLIT scan across the cluster before CPU-dense
    * per-row work (guide §2.5 "input skew: one huge unsplittable
    * file... repartition immediately after the read"). The test corpora
    * are single-row-group parquet files, so every scan is ONE task no
    * matter the split config — tokenization/hash-heavy builds that
    * follow would run on one core of 32 (measured r18: the qd20 span
    * stage spent 8.4 s of task time on 2 tasks). Conditional: when the
    * scan already yields at least the session's parallelism (the normal
    * case at cluster scale, where inputs split by row group), this is a
    * NO-OP — no shuffle is added. The repartition hashes on the row key,
    * so it is deterministic under retry (guide §2.5 rand-repartition
    * caveat) and downstream same-key aggregations reuse the exchange.
    */
  def spread(df: DataFrame, keys: String*): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (probeNumPartitions(df) >= target) df
    else df.repartition(target, keys.map(org.apache.spark.sql.functions.col): _*)
  }

  /** The no-op guard's scan-parallelism probe, MEMOIZED per (session,
    * canonicalized plan) — `df.rdd.getNumPartitions` forces a physical
    * planning pass on the driver, and ~10 call sites re-probed the same
    * documents scan every build (ADVICE r18). A semanticHash collision
    * could only reuse another plan's probed count, i.e. a wrong
    * spread/no-op decision — a performance nuance, never a correctness
    * one. Known limit (documented, accepted): the probe counts
    * byte-range file splits, not row groups, so a single-row-group file
    * larger than parallelism × maxPartitionBytes would count as "split
    * enough" while only one split yields rows; none of the driver
    * corpora or production row-group sizings (≤ 1 GB) get near that
    * regime.
    */
  private val probed =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int), Integer]()

  private def probeNumPartitions(df: DataFrame): Int = {
    val it = probed.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    probed.computeIfAbsent(
      (df.sparkSession, df.queryExecution.logical.canonicalized.semanticHash()),
      _ => df.rdd.getNumPartitions).intValue()
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
