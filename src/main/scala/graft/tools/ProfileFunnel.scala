package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round): per-stage wall times of the qc7
  * funnel (corpusBuildPreflight on the committed hotdata corpus) — the
  * r18 bench's second-heaviest key despite a 240 KB input, so the cost
  * must be per-stage fixed overhead, not data. Each stage is forced in
  * funnel order; the delta is that stage's own build cost.
  * Usage: tools/run_main.sh graft.tools.ProfileFunnel [dir] [cpus]
  */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else graft.SparkEntry.HotDir
    val cpus = if (args.length > 1) args(1) else
      Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    // the bench warmers run before any timed key — replicate them so the
    // deltas here match what the bench bills qc7 (engine already warm)
    t("warmers") {
      spark.range(100000).selectExpr("sum(id * 2)").collect()
      val r = spark.range(200000).selectExpr("id", "id % 97 as k", "cast(id % 31 as double) as v")
      r.groupBy("k").agg(org.apache.spark.sql.functions.countDistinct("v"),
        org.apache.spark.sql.functions.sum("v")).count()
      r.selectExpr("k", "sum(v) over (partition by k order by id rows between unbounded preceding and current row) as rs").count()
      r.as("a").join(r.as("b"), "k").count()
      r.join(org.apache.spark.sql.functions.broadcast(r.limit(100)), "id").count()
      r.distinct().count()
      graft.functions.VectorExprs.register(spark)
      1L
    }
    t("quality") { graft.text.TextOps.qualityFilter(spark, dir).count() }
    t("decontam") { graft.text.Dedup.decontaminate(spark, dir, 5, 50L).count() }
    t("dupClusters") { graft.text.Dedup.dupClusters(spark, dir).count() }
    t("corpusBuild") { graft.text.TextOps.corpusBuild(spark, dir).count() }
    t("hotReport") { graft.text.HotReport.hotBlockReport(spark, dir,
      50L, 50L, 70L, 70L).count() }
    t("qc7-full") {
      val df = graft.text.TextOps.corpusBuildPreflight(spark, dir,
        maxBucket = 50, maxBlock = 50, maxLabel = 70, maxCell = 70)
      import org.apache.spark.sql.functions.{col, xxhash64}
      df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(Map("h" -> "max")).count()
    }
    spark.stop()
  }
}
