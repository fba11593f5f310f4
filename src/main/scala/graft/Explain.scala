package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      // headline plan features only
      plan.split("\n").filter(l =>
        l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Exchange") || l.contains("Broadcast") || l.contains("WholeStageCodegen") ||
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("HashAggregate") || l.contains("Window") ||
        l.contains("graft_") ||
        l.contains("might_contain") || l.contains("BloomFilter") ||
        l.contains("CartesianProduct") || l.contains("NestedLoop")
      ).take(40)
        // cap line length: literal sketches (qd10's inlined bloom) would
        // otherwise dump hundreds of KB of hex into the evidence file
        .map(l => if (l.length > 400) l.take(400) + s"…(+${l.length - 400} chars)" else l)
        .foreach(println)
    }
    spark.stop()
  }
}
