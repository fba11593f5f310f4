package graft.tools

import org.apache.spark.sql.SparkSession

/** qt28 at PRODUCTION round counts, measured (VERDICT r12 "next #6"):
  * trains the hybrid BPE miner at the requested round count against a
  * driver-layout corpus and prints wall time for (a) the distributed
  * word count and (b) the incremental local merge mining, plus the
  * realized merge count (the miner stops early when pairs exhaust).
  * Usage: BpeRounds [sfDir] [rounds]
  */
object BpeRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 1024
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val wf = graft.text.TextOps.bpeWordFreq(spark, sfDir).cache()
    val nWords = wf.count()
    val t1 = System.nanoTime()
    val merges = graft.text.TextOps.bpeTrainLocal(spark, wf, rounds)._1.collect()
    val t2 = System.nanoTime()
    println(f"bpe rounds=$rounds sfDir=$sfDir: vocab=$nWords words, " +
      f"mined=${merges.length} merges; word-count ${(t1 - t0) / 1e9}%.2f s, " +
      f"mining ${(t2 - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
