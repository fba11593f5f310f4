package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink surface (reference: src/data_processing/collect_aemo_data
  * .py + process_* CSV ingestion; results/ writers). Batch CSV/JSONL
  * readers with explicit schemas (never inferSchema on a 100 TB lake —
  * schema inference is an extra full scan), a partitioned parquet sink,
  * and file-based streaming ingestion.
  */
object Ingest {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** CSV load-series reader (the AEMO collect path: date + load columns,
    * explicit timestamp format, malformed rows dropped).
    */
  def readEventsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventsSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .option("mode", "DROPMALFORMED")
      .csv(path)

  /** JSONL document reader — schema-first, corrupt records dropped. */
  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** Partitioned parquet sink: partition pruning for downstream readers;
    * partition columns should be low-cardinality (series, date), never
    * high-cardinality keys (small-files explosion at scale).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** ORC round-trip (second columnar format; schema carried by files). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** File-based streaming ingestion of an events directory — the
    * batch-compatible entry into streaming/ScoreStream.
    */
  def streamEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 4)
      .parquet(dir)
}
