package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage wall times for the shared TS chain (the cost a
  * first-touching query like q09 pays). Each stage is forced through
  * its StageCache materialization in order, so the printed delta is
  * that stage's own build cost. Usage:
  *   sbt "runMain graft.Profile /root/testdata/sf0.1 32"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.timeseries._
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    t("warm") { spark.range(1000).selectExpr("sum(id)").count() }
    t("evscan") { graft.util.Tables.events(spark, sfDir).select("event_type").limit(1).count() }
    t("hourlyAgg") { TsCore.hourlyAgg(spark, sfDir).count() }
    t("grid") { TsCore.hourlyGrid(spark, sfDir).count() }
    t("grid2") { TsCore.hourlyGrid(spark, sfDir).count() }
    t("filled") { TsCore.filled(spark, sfDir).count() }
    t("daywin") { TsCore.dayWindows(spark, sfDir).count() }
    t("inject") { TsCore.injected(spark, sfDir).count() }
    t("scaled") { TsCore.scaled(spark, sfDir).count() }
    t("patches") { TsCore.patches(spark, sfDir).count() }
    t("bank+test") { val (b, te) = TsCore.bankAndTest(spark, sfDir); b.count() + te.count() }
    t("q09 score") { Detect.knnScore(spark, sfDir).count() }
    import graft.text._
    t("tokens") { TextCore.tokens(spark, sfDir).count() }
    t("shingles") { TextCore.shingles(spark, sfDir, 3).count() }
    t("qd4-sharr") {
      import org.apache.spark.sql.functions.{col, floor, lit, count => cnt, collect_list, sort_array}
      TextCore.shingles(spark, sfDir, 3)
        .select(col("doc_id"), TextCore.strHash60(col("sh")).as("shh")).distinct()
        .groupBy("doc_id")
        .agg(sort_array(collect_list("shh")).as("shs"), cnt(lit(1)).as("sz")).count()
    }
    t("qd4-cand") {
      import org.apache.spark.sql.functions.{col, floor, explode, array}
      val docs = graft.util.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), floor(col("n_chars") / 20).as("blk"))
      val probes = docs.withColumn("blk", explode(array(col("blk") - 1, col("blk"), col("blk") + 1)))
      docs.select(col("doc_id").as("doc_a"), col("lang"), col("blk"))
        .join(probes.select(col("doc_id").as("doc_b"), col("lang"), col("blk")), Seq("lang", "blk"))
        .filter(col("doc_a") < col("doc_b")).count()
    }
    t("qd4") { Dedup.ngramJaccard(spark, sfDir).count() }
    // qp2 phases: HLL sketch pass vs unioned exact-distinct pass
    import org.apache.spark.sql.functions.{approx_count_distinct, lit}
    val li = graft.util.Tables.lineitem(spark, sfDir)
      .select(Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice").map(c => org.apache.spark.sql.functions.col(c)): _*)
    t("qp2-hll") {
      li.agg(approx_count_distinct(org.apache.spark.sql.functions.col("l_partkey"), 0.01),
        approx_count_distinct(org.apache.spark.sql.functions.col("l_suppkey"), 0.01),
        approx_count_distinct(org.apache.spark.sql.functions.col("l_quantity"), 0.01),
        approx_count_distinct(org.apache.spark.sql.functions.col("l_extendedprice"), 0.01)).count()
    }
    t("qp2-exact") {
      Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice").map(c =>
          li.select(lit(c).as("column_name"), org.apache.spark.sql.functions.col(c).cast("double").as("v")))
        .reduce(_ unionByName _).distinct().groupBy("column_name").count().count()
    }
    // qp3 phases: the approx_percentile pass vs each column's exact
    // range-sort quantile chain (util.Quantiles)
    locally {
      import org.apache.spark.sql.functions.{col, expr}
      val li2 = graft.util.Tables.lineitem(spark, sfDir).select("l_quantity", "l_extendedprice")
      t("qp3-approx") {
        li2.agg(expr("approx_percentile(l_quantity, array(0.25,0.5,0.75), 10000)"),
          expr("approx_percentile(l_extendedprice, array(0.25,0.5,0.75), 10000)")).count()
      }
      t("qp3-exQ") {
        graft.util.Quantiles.exact(li2, "l_quantity", Seq(0.25, 0.5, 0.75)).size.toLong
      }
      t("qp3-exP") {
        graft.util.Quantiles.exact(li2, "l_extendedprice", Seq(0.25, 0.5, 0.75)).size.toLong
      }
      // raw phases of one exact call, un-memoized
      val vals = li2.select(col("l_extendedprice").cast("double").as("v")).na.drop()
      val sorted = vals.orderBy("v").rdd.map(_.getDouble(0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("qp3-sortN") { sorted.count() }
      t("qp3-zip") { sorted.zipWithIndex().filter { case (_, i) => i == 100 }.count() }
      sorted.unpersist(blocking = false)
    }
    spark.stop()
  }
}
