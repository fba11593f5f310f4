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
        l.contains("CartesianProduct") || l.contains("NestedLoop")
      ).take(40).foreach(println)
    }
    spark.stop()
  }
}
