package graft.timeseries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Num

/** Detection-model persistence (reference: softpatch.py save_to_path /
  * load_from_path + common.py NearestNeighbourScorer.save/load): the
  * fitted "model" is data — the denoised+coreset'd memory bank with its
  * soft weights, the scaling bounds, and the score threshold — stored
  * as parquet so any session (batch or streaming) can reload and score
  * without refitting.
  */
object ModelStore {

  /** Fit on the train split and persist all scoring artifacts. */
  def save(spark: SparkSession, sfDir: String, path: String,
           denoiseThr: Double = 0.15, contamRate: Double = 0.1): Unit = {
    val (bank, _) = TsCore.bankAndTest(spark, sfDir)
    val w = Detect.nearestDistWeight(spark, sfDir).withColumn("wgt", col("w_nearest") + 1.0)
    val thrW = w.agg(expr(s"percentile(wgt, ${1.0 - denoiseThr})").as("thrw"))
    val kept = bank.withColumn("id", concat_ws("#", col("series"), col("win")))
      .join(w.select("id", "pos", "wgt"), Seq("id", "pos"))
      .crossJoin(broadcast(thrW)).filter(col("wgt") <= col("thrw"))
      .select((Seq("id", "pos", "wgt").map(col) ++ Detect.FeatCols.map(col)): _*)
    kept.write.mode("overwrite").parquet(s"$path/bank")
    TsCore.scaleBounds(spark, sfDir).write.mode("overwrite").parquet(s"$path/bounds")
    val scores = Detect.pipeline(spark, sfDir, denoiseThr, contamRate)
    scores.agg(expr(s"percentile(score, ${1.0 - contamRate})").as("threshold"))
      .write.mode("overwrite").parquet(s"$path/threshold")
  }

  /** Reload artifacts and score the given patch table (same f0..f8
    * schema) against the saved bank — no refit, bank broadcast.
    */
  def loadAndScore(spark: SparkSession, path: String, patches: DataFrame): DataFrame = {
    val bank = spark.read.parquet(s"$path/bank")
    val thr = spark.read.parquet(s"$path/threshold")
    val b = bank.columns.foldLeft(bank)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val dist2 = Detect.FeatCols.map(f =>
      (col(f) - col(s"b_$f")) * (col(f) - col(s"b_$f"))).reduce(_ + _)
    val wNear = Window.partitionBy("series", "win", "pos").orderBy(col("d"), col("b_id"))
    patches.crossJoin(broadcast(b))
      .withColumn("d", sqrt(dist2))
      .withColumn("rn", row_number().over(wNear)).filter(col("rn") === 1)
      .select(col("series"), col("win"), (col("d") * col("b_wgt")).as("pscore"))
      .groupBy("series", "win").agg(max("pscore").as("score"))
      .crossJoin(broadcast(thr))
      .select(col("series"), col("win"), Num.r4(col("score")).as("score"),
        when(col("score") > col("threshold"), 1).otherwise(0).as("pred"))
  }
}
