package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Ingest

class IngestSpec extends SparkSuite {

  test("csv events round-trip preserves rows and timestamps") {
    val tmp = Files.createTempDirectory("graft-csv").toString
    val ev = spark.read.parquet(s"$Sf001/events.parquet")
      .withColumn("ts", expr("timestamp_micros(cast(ts / 1000 as long))"))
    ev.withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    val back = Ingest.readEventsCsv(spark, tmp)
    assert(back.count() === ev.count())
    assert(back.filter(col("ts").isNull).count() === 0)
    assert(back.filter(col("event_type").isNull).count() === 0)
  }

  test("jsonl documents round-trip preserves rows") {
    val tmp = Files.createTempDirectory("graft-jsonl").toString
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    docs.coalesce(1).write.mode("overwrite").json(tmp)
    val back = Ingest.readDocumentsJsonl(spark, tmp)
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ===
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("partitioned parquet sink enables partition pruning") {
    val tmp = Files.createTempDirectory("graft-sink").toString
    val grid = graft.timeseries.TsCore.hourlyGrid(spark, Sf001)
    Ingest.writePartitioned(grid, tmp, Seq("series"))
    val back = spark.read.parquet(tmp).filter(col("series") === "click")
    assert(back.count() > 0)
    // partition filter must reach the scan, not a post-filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("click"))
  }

  test("file stream source wires into the scoring pipeline") {
    val out = Ingest.streamEvents(spark, s"$Sf001")
    assert(out.isStreaming)
  }
}
