package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, processed in partition-local batches — the Spark-side shape
  * of an image/audio decode + featurize stage.
  *
  * The decode itself is STUBBED with a deterministic byte-level fake
  * (media codecs are not available in this environment); everything
  * around it — schema, batching, partitioning, output contract — is the
  * real production shape: batches of `batchSize` rows are processed at
  * once inside `mapPartitions` (like `mapInPandas` arrow batches), so a
  * real decoder could be swapped in per batch without changing the plan.
  */
object BinaryMeta {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String, n_chars: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, byte_sum: Long,
                           f0: Double, f1: Double, f2: Double, f3: Double)

  /** Documents re-cast as opaque binary payloads with typed metadata. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        concat(lit("text/"), col("lang")).as("media_type"), col("n_chars"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic per-byte "feature extraction". A real
    * implementation would decode the payload (image/audio frame) here.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = r.payload
      var s = 0L
      var i = 0
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      def moment(k: Int): Double =
        if (bytes.isEmpty) 0.0
        else bytes.iterator.map(b => math.pow((b & 0xff) / 255.0, k.toDouble)).sum / bytes.length
      MediaFeatures(r.doc_id, bytes.length, s, moment(1), moment(2), moment(3), moment(4))
    }

  /** qm1: batched partition-local featurization over the media table. */
  def mediaFeatures(spark: SparkSession, sfDir: String, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
      .toDF()
  }

  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, frame_hash: Long)

  /** qm2: deterministic frame sampling — the video-column shape: each
    * payload is treated as a sequence of fixed-size frames; at most `k`
    * evenly-strided frames are emitted per row (bounded fan-out, so the
    * exploded side stays O(k·rows) at 100 TB). The per-frame decode is
    * the same stub seam as qm1 — a real codec slots into the frame loop
    * without changing schema or plan.
    */
  def frameSample(spark: SparkSession, sfDir: String,
                  frameSize: Int = 256, k: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir).flatMap { r =>
      val nFrames = math.max(1, r.payload.length / frameSize)
      val stride = math.max(1, nFrames / k)
      Range(0, nFrames, stride).take(k).map { fi =>
        val from = fi * frameSize
        val until = math.min(from + frameSize, r.payload.length)
        var h = 1125899906842597L
        var i = from
        while (i < until) { h = 31 * h + (r.payload(i) & 0xff); i += 1 }
        Frame(r.doc_id, fi, until - from, h)
      }
    }.toDF()
  }
}
