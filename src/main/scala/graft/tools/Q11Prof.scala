package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q11Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "target/testdata/sf1"
    val (bank, _) = graft.timeseries.TsCore.bankAndTest(spark, sf)
    bank.cache()
    val t0=System.nanoTime; val nb = bank.count(); val t1=System.nanoTime
    println(f"bank rows=$nb materialize ${(t1-t0)/1e9}%.1f s")
    println("per-pos windows: " + bank.select("series","win","pos").groupBy("pos").count()
      .agg(min("count"),max("count"),count(lit(1))).collect().head)
    val t2=System.nanoTime
    val lof = graft.timeseries.Detect.lofWeight(spark, sf)
    val n = lof.count(); val t3=System.nanoTime
    println(f"q11 full: $n rows in ${(t3-t2)/1e9}%.1f s (bank cached)")
    spark.stop()
  }
}
