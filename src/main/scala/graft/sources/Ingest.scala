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

  /** Bucketed + sorted table sink: pre-hash-partitions rows into
    * `nBuckets` files per partition on `bucketCol` so downstream joins
    * and aggregations on that key read co-located data and skip their
    * Exchange entirely (verified in IngestSpec: a join of two tables
    * bucketed on the same key by the same count plans with zero
    * shuffles). The 100 TB pattern for fact-fact joins too big to
    * broadcast: pay the shuffle once at write time, amortize it over
    * every subsequent join. Requires a catalog table (bucket metadata
    * lives in the metastore, not the files).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

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

  // ----- Reference dataset loaders -------------------------------------
  // (reference: process_park.py, process_INPG.py,
  // process_yahoo_benchmark.py). Each normalizes a raw CSV layout to the
  // canonical long frame (series, ts, value[, is_anom]) that feeds the
  // hourly-grid chain (TsCore.hourlyGrid shape). Name-based column
  // selection (header row), never positional schema application — the
  // raw exports carry extra columns in dataset-specific orders. The
  // per-file series id comes from the file name, matching the
  // one-CSV-per-building/series layout of the raw datasets.

  // input_file_name() is a percent-encoded file URI — decode it so
  // "bldg a.csv" yields series "bldg a", not "bldg%20a"; fall back to
  // the raw name if the URI contains a stray malformed % escape.
  // ONE definition: every loader deriving its series from the path
  // (file-per-series park/yahoo, dir-per-region AEMO) shares it.
  private def decodedFilePath: org.apache.spark.sql.Column =
    coalesce(expr("try_url_decode(input_file_name())"), input_file_name())

  private def seriesFromFile: org.apache.spark.sql.Column =
    regexp_extract(decodedFilePath, "([^/]+)\\.csv$", 1)

  /** Park smart-meter export: one CSV per building under `root`, columns
    * "Time" + "Power (kW)" (process_park.py:20-22 defaults).
    */
  def readParkCsv(spark: SparkSession, root: String,
                  dateCol: String = "Time",
                  loadCol: String = "Power (kW)"): DataFrame =
    spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .csv(s"$root/*.csv")
      .select(seriesFromFile.as("series"),
        try_to_timestamp(col(dateCol)).as("ts"),
        expr(s"try_cast(`$loadCol` AS DOUBLE)").as("value"))
      .filter(col("ts").isNotNull && col("value").isNotNull)

  /** INPG predis-mhi export: a single CSV, columns "date_time" +
    * "conso_global" (process_INPG.py:18-21 defaults); series fixed.
    */
  def readInpgCsv(spark: SparkSession, path: String,
                  dateCol: String = "date_time",
                  loadCol: String = "conso_global",
                  series: String = "INPG"): DataFrame =
    spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .csv(path)
      .select(lit(series).as("series"),
        try_to_timestamp(col(dateCol)).as("ts"),
        expr(s"try_cast(`$loadCol` AS DOUBLE)").as("value"))
      .filter(col("ts").isNotNull && col("value").isNotNull)

  /** AEMO raw price-and-demand feed: the layout collect_aemo_data.py
    * (:1-18) downloads — one directory per region (NSW/QLD/…), one CSV
    * per month inside it, columns "SETTLEMENTDATE" (format
    * yyyy/MM/dd HH:mm:ss — process_aemo.py:44 pd.to_datetime format) +
    * "TOTALDEMAND" (process_aemo.py:19-20 defaults). The series id is
    * the REGION DIRECTORY name (the collector's save layout), and
    * duplicate (series, ts) rows — the raw feed repeats month-boundary
    * settlement rows across adjacent files (process_aemo.py:56 drops
    * duplicate indices, i.e. keeps the FIRST) — collapse via a true
    * distributed keep-first: min_by on (source file, value), so the
    * earlier month file's reading wins even when a later file carries a
    * REVISED value for the same settlement instant (the yyyymm file
    * naming makes lexicographic file order = chronological ingest
    * order; the value tie-break only orders exact-duplicate rows
    * within one file).
    */
  def readAemoCsv(spark: SparkSession, root: String,
                  dateCol: String = "SETTLEMENTDATE",
                  loadCol: String = "TOTALDEMAND"): DataFrame = {
    val region = regexp_extract(decodedFilePath, "([^/]+)/[^/]+\\.csv$", 1)
    spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .csv(s"$root/*/*.csv")
      .select(region.as("series"),
        expr(s"try_to_timestamp(`$dateCol`, 'yyyy/MM/dd HH:mm:ss')").as("ts"),
        expr(s"try_cast(`$loadCol` AS DOUBLE)").as("value"),
        decodedFilePath.as("src"))
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy("series", "ts")
      .agg(expr("min_by(value, struct(src, value))").as("value"))
  }

  /** Yahoo anomaly benchmark: one CSV per series under `root`, columns
    * "timestamp" (epoch seconds) + "value" + "is_anomaly" ground truth
    * (process_yahoo_benchmark.py:17-20 defaults).
    */
  def readYahooCsv(spark: SparkSession, root: String,
                   dateCol: String = "timestamp",
                   valueCol: String = "value",
                   gtCol: String = "is_anomaly"): DataFrame =
    spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .csv(s"$root/*.csv")
      .select(seriesFromFile.as("series"),
        timestamp_seconds(expr(s"try_cast(`$dateCol` AS BIGINT)")).as("ts"),
        expr(s"try_cast(`$valueCol` AS DOUBLE)").as("value"),
        expr(s"try_cast(`$gtCol` AS INT)").as("is_anom"))
      .filter(col("ts").isNotNull && col("value").isNotNull)
}
