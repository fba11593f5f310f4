package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: A/B shuffle/storage configs for tiny-job latency. */
object SchedProbe {
  def run(tag: String, extra: (String, String)*): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    val t0 = System.nanoTime()
    for (_ <- 1 to 100) spark.range(320).count()
    println(f"$tag: ${(System.nanoTime() - t0) / 1e9 / 100 * 1000}%.0f ms/job")
    spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val base = Seq("spark.local.dir" -> "/dev/shm/spark-local",
      "spark.shuffle.checksum.enabled" -> "false")
    run("shm+nochk", base: _*)
    run("shm+nochk+mmap128m", (base :+ ("spark.storage.memoryMapThreshold" -> "134217728")): _*)
    run("shm+nochk+mmap128m+nocompress", (base ++ Seq(
      "spark.storage.memoryMapThreshold" -> "134217728",
      "spark.shuffle.compress" -> "false")): _*)
    run("all+localityoff", (base ++ Seq(
      "spark.storage.memoryMapThreshold" -> "134217728",
      "spark.locality.wait" -> "0")): _*)
  }
}
