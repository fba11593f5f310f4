package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming scoring path — the streaming twin of the batch
  * detection pipeline (SURVEY §2.G): events stream in, get bucketed into
  * event-time windows with a watermark, window stats are scored against
  * a broadcast memory bank of per-series statistics, and anomalous
  * windows are emitted.
  *
  * The bank here is the Gaussian per-series profile (mean/std of window
  * means from the batch pipeline); at scale it is a small broadcast
  * table, so the stream side never shuffles beyond the windowed
  * aggregation itself.
  */
object ScoreStream {

  /** Static bank: per-series mean/std of hourly values (train region). */
  def staticBank(spark: SparkSession, sfDir: String): DataFrame =
    graft.timeseries.TsCore.hourlyGrid(spark, sfDir)
      .groupBy("series").agg(avg("v").as("mu"), stddev_samp("v").as("sd"))

  /** Wire a streaming DataFrame of raw events (ts: timestamp,
    * event_type, value) into watermarked sliding windows scored against
    * the bank. Returns the streaming result (score = |window mean − μ|/σ).
    */
  def scoreStream(events: DataFrame, bank: DataFrame,
                  windowDur: String = "1 hour", slide: String = "30 minutes",
                  watermark: String = "2 hours"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type").as("series"))
      .agg(avg("value").as("wmean"), count(lit(1)).as("n"))
      .join(broadcast(bank), "series")
      .select(col("series"), col("window.start").as("wstart"),
        col("wmean"), col("n"),
        (abs(col("wmean") - col("mu")) / col("sd")).as("score"))
  }
}
