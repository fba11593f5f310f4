package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Ingest

class IngestSpec extends SparkSuite {

  test("csv events round-trip preserves rows and timestamps") {
    val tmp = Files.createTempDirectory("graft-csv").toString
    val raw = spark.read.parquet(s"$Sf001/events.parquet")
    // normalize any ts encoding (nanos-long / TIMESTAMP / TIMESTAMP_NTZ)
    // to a plain TIMESTAMP column for the text round-trip
    val ev = raw.withColumn("ts", raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(cast(ts / 1000 as long))")
      case _ => col("ts").cast("timestamp")
    })
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

  test("dynamic partition pruning: a filtered dim prunes fact partitions at runtime") {
    // the 100 TB join shape: fact partitioned on the join key, dim
    // filtered at runtime — Catalyst must push a DynamicPruningExpression
    // into the fact scan so only matching partitions are read, instead
    // of scanning everything and filtering post-join
    val tmp = Files.createTempDirectory("graft-dpp").toString
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumn("pk", pmod(col("l_orderkey"), lit(20)))
    Ingest.writePartitioned(li, tmp, Seq("pk"))
    val fact = spark.read.parquet(tmp)
    val dim = spark.range(20).select(col("id").as("pk"), pmod(col("id"), lit(7)).as("grp"))
    val joined = fact.join(broadcast(dim.filter(col("grp") === 0)), "pk")
      .agg(count(lit(1)).as("n"))
    val n = joined.head.getLong(0)
    val expect = spark.read.parquet(s"$Sf001/lineitem.parquet")
      .filter(pmod(col("l_orderkey"), lit(20)).isin(0L, 7L, 14L)).count()
    assert(n === expect)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DynamicPruningExpression in the fact scan:\n${plan.take(1500)}")
  }

  test("file stream source wires into the scoring pipeline") {
    val out = Ingest.streamEvents(spark, s"$Sf001")
    assert(out.isStreaming)
  }

  test("bucketed tables join with zero exchanges (co-located fact-fact join)") {
    // idempotence across JVMs: a fresh derby metastore doesn't know
    // about tables whose warehouse directories survived a previous
    // run, and saveAsTable refuses to reuse the orphan location
    Seq("b_orders", "b_lineitem").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(del)
        f.delete(): Unit
      }
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists) del(loc)
    }
    val orders = spark.read.parquet(s"$Sf001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Ingest.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Ingest.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      assert(j.count() === li.count(), "join result intact")
      val p = j.queryExecution.executedPlan.toString
      // both sides bucketed on the join key with equal counts → the
      // sort-merge join reads co-located buckets, no shuffle anywhere
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n${p.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("reference dataset loaders normalize park/INPG/yahoo layouts") {
    def writeCsv(dir: java.nio.file.Path, name: String, lines: Seq[String]): Unit =
      Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)

    // Park: one CSV per building, extra columns, (Time, Power (kW))
    val park = Files.createTempDirectory("graft-park")
    writeCsv(park, "bldg_a.csv", Seq(
      "Time,Power (kW),Site", "2021-01-01 00:30:00,12.5,x", "2021-01-01 01:00:00,13.0,x"))
    writeCsv(park, "bldg_b.csv", Seq(
      "Time,Power (kW),Site", "2021-01-01 00:30:00,7.25,y", "bogus,notanumber,y"))
    val p = Ingest.readParkCsv(spark, park.toString).cache()
    assert(p.count() === 3, "malformed row dropped")
    assert(p.select("series").distinct().collect().map(_.getString(0)).sorted
      === Array("bldg_a", "bldg_b"))
    assert(p.schema.fieldNames === Array("series", "ts", "value"))

    // INPG: single CSV, (date_time, conso_global)
    val inpg = Files.createTempDirectory("graft-inpg")
    writeCsv(inpg, "predis-mhi.csv", Seq(
      "date_time,conso_global", "2019-03-01 10:00:00,101.5", "2019-03-01 11:00:00,99.0"))
    val i = Ingest.readInpgCsv(spark, inpg.resolve("predis-mhi.csv").toString).cache()
    assert(i.count() === 2)
    assert(i.select("series").distinct().head.getString(0) === "INPG")

    // Yahoo: epoch-second timestamps + ground-truth label
    val yahoo = Files.createTempDirectory("graft-yahoo")
    writeCsv(yahoo, "synthetic_1.csv", Seq(
      "timestamp,value,is_anomaly", "1609459200,5.5,0", "1609462800,50.0,1"))
    val y = Ingest.readYahooCsv(spark, yahoo.toString).cache()
    assert(y.count() === 2)
    assert(y.filter(col("is_anom") === 1).count() === 1)
    assert(y.schema("ts").dataType.typeName === "timestamp")
  }

  test("AEMO raw loader: region dirs of monthly CSVs, dup settlement rows collapse") {
    def writeCsv(dir: java.nio.file.Path, name: String, lines: Seq[String]): Unit =
      Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)
    // collect_aemo_data.py layout: <root>/<REGION>/<yyyymm>.csv with the
    // public PRICE_AND_DEMAND column set; the Jan file repeats Dec's
    // boundary settlement row (same value) and carries a malformed row
    val root = Files.createTempDirectory("graft-aemo")
    val nsw = Files.createDirectory(root.resolve("NSW"))
    val qld = Files.createDirectory(root.resolve("QLD"))
    val hdr = "REGION,SETTLEMENTDATE,TOTALDEMAND,RRP,PERIODTYPE"
    writeCsv(nsw, "201512.csv", Seq(hdr,
      "NSW1,2015/12/31 23:30:00,7001.5,40.1,TRADE",
      "NSW1,2016/01/01 00:00:00,6950.25,39.0,TRADE"))
    writeCsv(nsw, "201601.csv", Seq(hdr,
      "NSW1,2016/01/01 00:00:00,6950.25,39.0,TRADE",
      "NSW1,2016/01/01 00:30:00,6888.0,38.5,TRADE",
      "NSW1,not-a-date,oops,x,TRADE"))
    writeCsv(qld, "201512.csv", Seq(hdr,
      "QLD1,2015/12/31 23:30:00,5750.0,34.0,TRADE"))
    writeCsv(qld, "201601.csv", Seq(hdr,
      // REVISED boundary value, deliberately SMALLER than Dec's 5750 so
      // a min(value) tie-break would pick the wrong row — keep-first
      // must take the Dec file's reading
      "QLD1,2015/12/31 23:30:00,5600.0,34.5,TRADE",
      "QLD1,2016/01/01 00:00:00,5800.0,35.0,TRADE"))
    val a = Ingest.readAemoCsv(spark, root.toString).cache()
    assert(a.schema.fieldNames === Array("series", "ts", "value"))
    // 7 well-formed rows − 2 month-boundary duplicates = 5
    assert(a.count() === 5, "duplicate settlement rows must collapse, malformed row drop")
    assert(a.select("series").distinct().collect().map(_.getString(0)).sorted
      === Array("NSW", "QLD"), "series comes from the region directory")
    val dup = a.filter(col("series") === "NSW" &&
      col("ts") === java.sql.Timestamp.valueOf("2016-01-01 00:00:00"))
    assert(dup.count() === 1 && dup.head.getDouble(2) === 6950.25)
    // a REVISED duplicate (different value in the later month file) must
    // resolve keep-first: the earlier file's reading wins, not min(value)
    val rev = a.filter(col("series") === "QLD" &&
      col("ts") === java.sql.Timestamp.valueOf("2015-12-31 23:30:00"))
    assert(rev.count() === 1 && rev.head.getDouble(2) === 5750.0,
      "revised-value duplicate must keep the FIRST file's reading")
  }
}
