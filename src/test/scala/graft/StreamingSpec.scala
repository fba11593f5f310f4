package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ScoreStream

class StreamingSpec extends SparkSuite {

  case class Ev(ts: Timestamp, event_type: String, value: Double)
  case class Pt(ts: Timestamp, series: String, value: Double)

  test("streaming score pipeline emits windowed scores against the bank") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val bank = Seq(("click", 50.0, 10.0)).toDF("series", "mu", "sd")
    val out = ScoreStream.scoreStream(mem.toDF(), bank)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("scored").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
      mem.addData(
        Ev(at(5), "click", 40.0), Ev(at(20), "click", 60.0),
        Ev(at(35), "click", 55.0), Ev(at(65), "click", 300.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      mem.addData(Ev(at(600), "click", 50.0))
      q.processAllAvailable()
      val rows = spark.table("scored").collect()
      assert(rows.nonEmpty, "expected closed windows after watermark advance")
      val scored = spark.table("scored")
      assert(scored.filter(col("score") < 0).count() === 0)
      // the 300.0 spike window must score much higher than the calm ones
      val maxScore = scored.agg(max("score")).head.getDouble(0)
      assert(maxScore > 1.0, s"spike window score $maxScore")
    } finally q.stop()
  }

  test("stateful scorer accumulates per-series state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val out = ScoreStream.statefulScore(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stateful").start()
    try {
      mem.addData(("a", 10.0), ("a", 12.0), ("a", 11.0))
      q.processAllAvailable()
      mem.addData(("a", 100.0)) // outlier vs accumulated state
      q.processAllAvailable()
      val rows = spark.table("stateful").as[ScoreStream.Scored].collect()
      assert(rows.length === 4)
      assert(rows.map(_.nSeen).max === 4, "state must persist across batches")
      val outlier = rows.find(_.value === 100.0).get
      val calm = rows.filter(r => r.value < 50 && r.nSeen > 2)
      assert(outlier.score > 10, s"outlier score ${outlier.score}")
      assert(calm.forall(_.score < 5))
    } finally q.stop()
  }

  test("streaming cusum matches the batch q45 flags across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val Sf = Sf001
    // batch fit: the same quantized sufficient statistics q45 uses
    val pts = graft.timeseries.TsCore.filled(spark, Sf)
      .filter(col("v_filled").isNotNull)
      .select("series", "t", "v_filled").as[(String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val params = pts.groupBy(_._1).collect { case (s, rows) if rows.length > 1 =>
      val vs = rows.map(_._3); val n = vs.length
      val mu = vs.map(v => math.floor(v * 10000d + 0.5d).toLong).sum / 10000d / n
      val m2 = vs.map(v => math.floor(v * v * 10000d + 0.5d).toLong).sum / 10000d
      s -> (mu, math.sqrt(math.max(0.0, (m2 - n * mu * mu) / (n - 1))))
    }.toMap
    val mem = MemoryStream[(String, Long, Double)]
    val out = ScoreStream.cusumStream(mem.toDS(), params)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cusum_stream").start()
    try {
      // two microbatches split mid-series: state must carry across
      val mid = pts.map(_._2).max / 2
      mem.addData(pts.filter(_._2 <= mid).toSeq)
      q.processAllAvailable()
      mem.addData(pts.filter(_._2 > mid).toSeq)
      q.processAllAvailable()
      val got = spark.table("cusum_stream").as[ScoreStream.CusumFlag].collect()
        .map(f => (f.series, f.t) -> (f.cusumPos, f.cusumNeg)).toMap
      val batch = graft.timeseries.Intervals.cusum(spark, Sf).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
      // recursion vs prefix form: same flags, values to quantization ulps
      assert(got.keySet === batch.keySet)
      batch.foreach { case (key, (bp, bn)) =>
        val (gp, gn) = got(key)
        assert(math.abs(gp - bp) < 2e-4 && math.abs(gn - bn) < 2e-4,
          s"$key: ($gp,$gn) vs ($bp,$bn)")
      }
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming attribution: random event streams with random splits match the driver model") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val types = Vector("click", "view", "signup", "purchase", "error")
    for (inst <- 1 to 3) {
      val evs = (1 to 120).map { i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(12000).toLong, i.toLong,
          types(rnd.nextInt(types.length)), rnd.nextDouble() * 50)
      }
      val mem = MemoryStream[(Long, Long, Long, String, Double)]
      val out = ScoreStream.attributionStream(mem.toDS())
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(s"attr_prop_$inst").start()
      try {
        // random 3-way split BY TIME (arrival order must respect event
        // time across batches — the operator's documented contract)
        val cut1 = rnd.nextInt(4000) + 2000L
        val cut2 = cut1 + rnd.nextInt(4000) + 1000L
        Seq(evs.filter(_._2 <= cut1), evs.filter(e => e._2 > cut1 && e._2 <= cut2),
          evs.filter(_._2 > cut2)).foreach { b =>
          mem.addData(b); q.processAllAvailable()
        }
        val got = spark.table(s"attr_prop_$inst").as[ScoreStream.AttributedConv].collect()
          .map(c => (c.userId, c.tsec, c.channel, c.gapS, c.value)).sortBy(c => (c._1, c._2, c._5))
        // driver model: dedupe touches per (user,tsec) by max event_id,
        // purchases take the latest strictly-earlier touch within 3600s
        val touch = Set("click", "view", "signup")
        val byUser = evs.filter(e => touch(e._4)).groupBy(e => (e._1, e._2))
          .map(_._2.maxBy(_._3)).toSeq.groupBy(_._1)
        val want = evs.filter(_._4 == "purchase").map { p =>
          val prior = byUser.getOrElse(p._1, Seq()).filter(t => t._2 < p._2)
          val lt = if (prior.isEmpty) None else Some(prior.maxBy(_._2))
          lt match {
            case Some(t) if p._2 - t._2 <= 3600 => (p._1, p._2, t._4, p._2 - t._2, p._5)
            case _ => (p._1, p._2, "direct", -1L, p._5)
          }
        }.sortBy(c => (c._1, c._2, c._5))
        assert(got.toSeq === want, s"instance $inst")
      } finally q.stop()
    }
  }

  test("streaming shard packing matches batch qt11 across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .selectExpr("source", "lang", "doc_id",
        "CAST(size(filter(split(text, ' '), t -> t != '')) AS LONG) AS n_toks")
      .as[(String, String, Long, Long)].collect().sortBy(_._3)
    val mem = MemoryStream[(String, String, Long, Long)]
    val out = ScoreStream.shardPackStream(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("pack_stream").start()
    try {
      val mid = docs.map(_._3).max / 2
      mem.addData(docs.filter(_._3 <= mid).toSeq)
      q.processAllAvailable()
      mem.addData(docs.filter(_._3 > mid).toSeq)
      q.processAllAvailable()
      val got = spark.table("pack_stream").as[ScoreStream.ShardAssign].collect()
        .map(s => s.docId -> (s.source, s.lang, s.nToks, s.shard)).toMap
      val batch = graft.text.TextOps.packShards(spark, Sf001).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
      assert(got === batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming domain cap admits exactly the batch qt21 kept set under ordered arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    val mem = MemoryStream[(String, Long, Long)]
    val q = ScoreStream.domainCapStream(mem.toDS(), cap = 20)
      .writeStream.outputMode("append").format("memory").queryName("cap_stream").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("cap_stream").as[ScoreStream.CapVerdict].collect()
      assert(got.length === docs.length)
      // ordered arrival ⇒ first-come == lowest-doc_id: per-doc verdicts
      // equal the BATCH RULE ITSELF — perSourceCapThreshold's
      // group-limited cap_thr (r16's rewrite), kept ⇔ doc_id ≤ cap_thr.
      // Anchoring on the shared threshold builder (not a spec-local
      // re-derivation) means a drift in the batch rewrite breaks this
      // reconciliation, not just qt21's oracle.
      val thr = graft.text.TextOps.perSourceCapThreshold(
        spark.read.parquet(s"$Sf001/documents.parquet").select("source", "doc_id"), 20)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.forall(v => v.kept === (v.docId <= thr(v.source))))
      // and the per-source admit counts reconcile with qt21's audit
      val gotCounts = got.filter(_.kept).groupBy(_.source).map { case (s, vs) => s -> vs.length.toLong }
      val batchCounts = graft.text.TextOps.domainCap(spark, Sf001, cap = 20).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(gotCounts === batchCounts)
    } finally q.stop()
  }

  test("streaming burst rate: per-user peaks equal batch qe15 under ordered arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val raw = graft.util.Tables.events(spark, Sf001)
    val evs = raw.select(col("user_id"), graft.util.Ts.sec(raw).as("tsec"))
      .as[(Long, Long)].collect().sortBy(e => (e._2, e._1))
    // split so no (user, tsec) group straddles the batch boundary —
    // RANGE-frame semantics need a second's cohort to arrive together
    var cut = evs.length / 2
    while (cut < evs.length && evs(cut) == evs(cut - 1)) cut += 1
    val mem = MemoryStream[(Long, Long)]
    val q = ScoreStream.burstRateStream(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("burst_stream").start()
    try {
      val (h1, h2) = evs.splitAt(cut)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("burst_stream").as[ScoreStream.RateVerdict].collect()
      assert(got.length === evs.length, "one verdict per event")
      val gotPeak = got.groupBy(_.userId)
        .map { case (u, vs) => u -> (vs.length.toLong, vs.map(_.nw).max) }
      val batch = graft.analytics.Events.burstRate(spark, Sf001).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(gotPeak === batch)
      // the flag is the peak's threshold crossing, bit-for-bit
      got.foreach(v => assert(v.flagged === (v.nw >= 8L)))
    } finally q.stop()
  }

  test("streaming attribution matches the batch qe10 rollup across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val evRaw = spark.read.parquet(s"$Sf001/events.parquet")
    val evs = evRaw
      .select(col("user_id"), graft.util.Ts.sec(evRaw).as("tsec"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val out = ScoreStream.attributionStream(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("attr_stream").start()
    try {
      val mid = evs.map(_._2).max / 2
      mem.addData(evs.filter(_._2 <= mid).toSeq)
      q.processAllAvailable()
      mem.addData(evs.filter(_._2 > mid).toSeq)
      q.processAllAvailable()
      val got = spark.table("attr_stream").as[ScoreStream.AttributedConv].collect()
      val gotRoll = got.groupBy(_.channel).map { case (ch, rows) =>
        val gaps = rows.map(_.gapS).filter(_ >= 0)
        ch -> (rows.length.toLong,
          r4(rows.map(r => math.floor(r.value * 10000 + 0.5).toLong).sum / 10000.0),
          if (gaps.isEmpty) null else r4(gaps.map(_.toDouble).sum / rows.length))
      }
      val batch = graft.analytics.Events.attribution(spark, Sf001).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3))).toMap
      assert(gotRoll.keySet === batch.keySet)
      for ((ch, v) <- batch) assert(gotRoll(ch) === v, s"channel $ch")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  case class UEv(ts: Timestamp, user_id: Long)
  case class Doc(ts: Timestamp, doc_id: Long, text: String)
  case class CDoc(ts: Timestamp, doc_id: Long, source: String, lang: String,
                  text: String, n_chars: Long)
  case class SDoc(ts: Timestamp, doc_id: Long, source: String, text: String)
  case class LDoc(ts: Timestamp, doc_id: Long, lang: String, text: String)
  case class FRow(ts: Timestamp, series: String, t: Long, y: Double,
                  x1: Double, x2: Double, x3: Double, x4: Double,
                  x5: Double, x6: Double)
  case class IRow(ts: Timestamp, series: String, win: Long, pos: Long, o: Long,
                  xl: Double, xr: Double, xs: Double)
  case class PatchRow(ts: Timestamp, series: String, win: Long, pos: Long,
                      f0: Double, f1: Double, f2: Double, f3: Double, f4: Double,
                      f5: Double, f6: Double, f7: Double, f8: Double)
  case class CRow(ts: Timestamp, series: String, y: Double, p: Double)

  test("streaming refit audit: scores exact vs the saved pair; whole-window psi/verdict equals batch q62") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.{Forecast, ModelStore}
    val path = java.nio.file.Files.createTempDirectory("graft-refit").toString
    ModelStore.saveRefitAudit(spark, Sf01, path)
    // batch anchor — reads the SAME session-cached artifact realization
    val batch = Forecast.refitTrigger(spark, Sf01).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    def fRows(fromCol: String): Array[FRow] =
      Forecast.refitLags(spark, Sf01).filter(col("t") >= col(fromCol))
        .select("series", "t", "y", "x1", "x2", "x3").collect()
        .map(r => FRow(new Timestamp(r.getLong(1) * 3600000L), r.getString(0),
          r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), 0.0, 0.0, 0.0))
    val liveA = fRows("cutA") // batch q62's whole PSI live half
    val liveB = fRows("cutB") // batch q62's error-eval slice
    // (1) stateless dual scorer == the batch ModelStore apply, bit-for-bit
    val feats = liveA.toIndexedSeq
      .map(f => (f.ts, f.series, f.t, f.y, f.x1, f.x2, f.x3))
      .toDF("ts", "series", "t", "y", "x1", "x2", "x3")
    val want = ModelStore.loadAndRefitScore(spark, path, feats).collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("t")) ->
        ((r.getAs[Double]("p_stale"), r.getAs[Double]("p_refit")))).toMap
    val mem = MemoryStream[FRow]
    val q = ScoreStream.refitScoreStream(spark, path, mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("refit_scores").start()
    try {
      val (h1, h2) = liveA.splitAt(liveA.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("refit_scores").collect()
        .map(r => (r.getAs[String]("series"), r.getAs[Long]("t")) ->
          ((r.getAs[Double]("p_stale"), r.getAs[Double]("p_refit")))).toMap
      assert(got === want, "streamed dual-model scores must equal the batch apply exactly")
    } finally q.stop()
    // (2) decision window over the whole live half: PSI and the drift
    // verdict are BIT-IDENTICAL to batch q62 (same quantized fold)
    // far past the 36500-day window's END (+watermark) so append mode
    // closes every real window
    def flush(m: MemoryStream[FRow]): FRow =
      liveA.head.copy(series = "zz_flush",
        ts = new Timestamp(liveA.map(_.ts.getTime).max + 36500L * 86400000L * 2))
    val memD = MemoryStream[FRow]
    val qd = ScoreStream.refitStream(spark, path, memD.toDF(), windowDur = "36500 days")
      .writeStream.outputMode("append").format("memory").queryName("refit_decisions").start()
    try {
      memD.addData(liveA.toIndexedSeq); qd.processAllAvailable()
      memD.addData(flush(memD)); qd.processAllAvailable()
      val got = spark.table("refit_decisions").filter(col("series") =!= "zz_flush")
        .collect().map(r => r.getAs[String]("series") ->
          ((r.getAs[Double]("psi"), r.getAs[Int]("drifted")))).toMap
      assert(got.keySet === batch.keySet)
      for ((s, (psi, drifted)) <- got) {
        assert(psi === batch(s)._1, s"$s: stream psi $psi vs batch ${batch(s)._1}")
        assert(drifted === batch(s)._2)
      }
    } finally qd.stop()
    // (3) the error window on batch q62's own eval slice (t >= cutB):
    // same footprint, MAEs agree to one r4 step (the stream sums
    // quantized per-row errors — order-free; batch averages raw floats)
    val memE = MemoryStream[FRow]
    val qe = ScoreStream.refitStream(spark, path, memE.toDF(), windowDur = "36500 days")
      .writeStream.outputMode("append").format("memory").queryName("refit_errs").start()
    try {
      memE.addData(liveB.toIndexedSeq); qe.processAllAvailable()
      memE.addData(flush(memE)); qe.processAllAvailable()
      val got = spark.table("refit_errs").filter(col("series") =!= "zz_flush")
        .collect().map(r => r.getAs[String]("series") ->
          ((r.getAs[Long]("n_eval"), r.getAs[Double]("mae_stale"),
            r.getAs[Double]("mae_refit")))).toMap
      for ((s, (n, st, rf)) <- got) {
        assert(n === batch(s)._3, s"$s: eval footprint $n vs batch ${batch(s)._3}")
        assert(math.abs(st - batch(s)._4) <= 1.01e-4, s"$s stale $st vs ${batch(s)._4}")
        assert(math.abs(rf - batch(s)._5) <= 1.01e-4, s"$s refit $rf vs ${batch(s)._5}")
      }
    } finally qe.stop()
  }

  test("streaming scorer over a saved ModelStore bank matches batch pipeline scores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-model-stream").toString
    graft.timeseries.ModelStore.save(spark, Sf01, path)
    val (_, testP) = graft.timeseries.TsCore.bankAndTest(spark, Sf01)
    val rows = testP
      .select((Seq("series", "win", "pos") ++ graft.timeseries.Detect.FeatCols).map(col): _*)
      .collect().map { r =>
        PatchRow(new Timestamp(86400000L * (30 + r.getLong(1))),
          r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7), r.getDouble(8), r.getDouble(9), r.getDouble(10),
          r.getDouble(11))
      }
    val mem = MemoryStream[PatchRow]
    val out = ScoreStream.bankScoreStream(spark, path, mem.toDF(), watermark = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("bankscored").start()
    try {
      mem.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      // watermark sentinel: a far-future patch closes every real window
      mem.addData(rows.head.copy(ts = new Timestamp(86400000L * 10000),
        series = "zz_sentinel"))
      q.processAllAvailable()
      val stream = spark.table("bankscored").filter(col("series") =!= "zz_sentinel")
      val batch = graft.timeseries.Detect.pipeline(spark, Sf01)
      assert(stream.count() === batch.count(),
        "every closed (series, win) must emit exactly once")
      val j = stream.as("s").join(batch.as("b"),
        col("s.series") === col("b.series") && col("s.win") === col("b.win"))
      assert(j.count() === batch.count())
      assert(j.filter(abs(col("s.score") - col("b.score")) > 1e-9).count() === 0,
        "stream scores must equal batch pipeline scores")
      assert(j.filter(col("s.pred") =!= col("b.pred")).count() === 0)
    } finally q.stop()
  }

  test("streaming session windows merge within gap and split across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UEv]
    val out = ScoreStream.sessionStream(mem.toDF(), gap = "30 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
      // user 1: events at 0,10,20 (one session) then 120 (new session)
      mem.addData(UEv(at(0), 1L), UEv(at(10), 1L), UEv(at(20), 1L), UEv(at(120), 1L))
      q.processAllAvailable()
      mem.addData(UEv(at(600), 2L)) // advance watermark to close sessions
      q.processAllAvailable()
      val rows = spark.table("sessions").where(col("user_id") === 1L).collect()
      assert(rows.length === 2, s"expected 2 closed sessions, got ${rows.toSeq}")
      assert(rows.map(_.getAs[Long]("n_events")).sorted.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  case class SEv(ts: Timestamp, user_id: Long, a_val: String)
  case class SEv2(ts: Timestamp, user_id: Long, b_val: String)

  test("stream-stream interval join matches pairs within the delay, drops outside") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memA = MemoryStream[SEv]
    val memB = MemoryStream[SEv2]
    val out = ScoreStream.intervalJoinStreams(memA.toDF(), memB.toDF(),
      maxDelay = "30 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
      // user 1: views at 0 and 50; purchase at 60 → only the view at 50
      // is within 30 min. user 2: view at 5, no purchase.
      memA.addData(SEv(at(0), 1L, "v0"), SEv(at(50), 1L, "v50"), SEv(at(5), 2L, "v5"))
      memB.addData(SEv2(at(60), 1L, "p60"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin").collect()
      assert(rows.map(r => (r.getAs[Long]("user_id"), r.getAs[String]("a_val"),
        r.getAs[String]("b_val"))).toSet === Set((1L, "v50", "p60")))
    } finally q.stop()
  }

  test("streaming dedup drops repeated content within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val out = ScoreStream.dedupStream(mem.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
      mem.addData(Doc(at(0), 1L, "aa"), Doc(at(1), 2L, "aa"), Doc(at(2), 3L, "bb"))
      q.processAllAvailable()
      mem.addData(Doc(at(3), 4L, "aa"))
      q.processAllAvailable()
      val texts = spark.table("deduped").collect().map(_.getAs[String]("text"))
      assert(texts.sorted.toSeq === Seq("aa", "bb"), s"got ${texts.toSeq}")
    } finally q.stop()
  }

  test("streaming drift monitor reproduces batch qp7 PSI for a whole-half window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val want = graft.timeseries.TsQueries.qp7Drift(spark, Sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val baseline = graft.timeseries.TsQueries.driftBaseline(spark, Sf001)
    // second-half points (qp7's half == 1), as an event stream
    val filled = graft.timeseries.TsCore.filled(spark, Sf001)
      .filter(col("v_filled").isNotNull)
      .select("series", "t", "v_filled").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val mids = filled.groupBy(_._1).map { case (s, g) =>
      s -> (g.map(_._2).min + g.map(_._2).max) / 2
    }
    val second = filled.filter { case (s, t, _) => t > mids(s) }
    def ts(t: Long) = new Timestamp(t * 3600000L)
    val mem = MemoryStream[Pt]
    // one window wide enough to hold the whole half → the stream PSI
    // must equal the batch qp7 PSI exactly
    val out = ScoreStream.driftStream(mem.toDF(), baseline, windowDur = "3650 days")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("drift_stream").start()
    try {
      val (h1, h2) = second.splitAt(second.length / 2)
      mem.addData(h1.map { case (s, t, v) => Pt(ts(t), s, v) }.toSeq)
      q.processAllAvailable()
      mem.addData(h2.map { case (s, t, v) => Pt(ts(t), s, v) }.toSeq)
      q.processAllAvailable()
      mem.addData(Pt(ts(filled.map(_._2).max + 24L * 36500), "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("drift_stream").filter(col("series") =!= "flush")
        .collect().map(r => r.getAs[String]("series") ->
          ((r.getAs[Long]("n_live"), r.getAs[Double]("psi")))).toMap
      assert(got === want.view.filterKeys(got.contains).toMap)
      assert(got.keySet === want.keySet)
    } finally q.stop()
  }

  test("streaming LSH dedup matches batch qd9 verdicts across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch qd9 on sf0.001: doc_id % 5 == 0 is the increment; the corpus
    // band table is the shared static artifact both sides probe
    val want = graft.text.Dedup.incrementalDedup(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val corpusBands = graft.text.Dedup.bandSignatures(spark, Sf001, 16, 4)
      .filter(col("doc_id") % 5 =!= 0)
    val incDocs = spark.read.parquet(s"$Sf001/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val mem = MemoryStream[Doc]
    val out = ScoreStream.lshDedupStream(mem.toDF(), corpusBands)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("lsh_dedup").start()
    try {
      // split the increment mid-stream: the verdicts must not depend on
      // microbatch boundaries
      val (half1, half2) = incDocs.splitAt(incDocs.length / 2)
      mem.addData(half1.map { case (id, t) => Doc(at(0), id, t) }.toSeq)
      q.processAllAvailable()
      mem.addData(half2.map { case (id, t) => Doc(at(1), id, t) }.toSeq)
      q.processAllAvailable()
      mem.addData(Doc(at(600), -1L, "watermark flush"))
      q.processAllAvailable()
      val got = spark.table("lsh_dedup")
        .filter(col("doc_new") >= 0).collect()
        .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_old")) ->
          r.getAs[Long]("n_bands")).toMap
      assert(got === want)
    } finally q.stop()
  }

  test("streaming quality filter matches batch qt10 verdicts over the whole corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val want = graft.text.TextOps.qualityFilter(spark, Sf001).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val mem = MemoryStream[LDoc]
    val out = ScoreStream.qualityFilterStream(mem.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("qfilter").start()
    try {
      // stateless operator: split the corpus across microbatches anyway
      // to prove verdicts don't depend on batch boundaries
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.map { case (id, lg, t) => LDoc(t0, id, lg, t) }.toSeq)
      q.processAllAvailable()
      mem.addData(h2.map { case (id, lg, t) => LDoc(t0, id, lg, t) }.toSeq)
      q.processAllAvailable()
      val got = spark.table("qfilter").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("reason"), r.getAs[Boolean]("keep"))).toMap
      assert(got.size === want.size)
      assert(got === want)
    } finally q.stop()
  }

  test("streaming DSIR scorer matches batch qt22 weights over the whole raw corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    graft.timeseries.ModelStore.saveDsir(spark, Sf001, path)
    val want = graft.text.TextOps.dsirWeights(spark, Sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .filter(col("source") =!= "src0")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val mem = MemoryStream[SDoc]
    val out = ScoreStream.dsirStream(spark, path, mem.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dsirscore").start()
    try {
      // stateless scorer: batch boundaries must not move a single bit
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.map { case (id, s, t) => SDoc(t0, id, s, t) }.toSeq)
      q.processAllAvailable()
      mem.addData(h2.map { case (id, s, t) => SDoc(t0, id, s, t) }.toSeq)
      q.processAllAvailable()
      val got = spark.table("dsirscore").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_feat"), r.getAs[Double]("log_w"), r.getAs[Long]("selected"))).toMap
      assert(got.size === want.size)
      assert(got === want)
    } finally q.stop()
  }

  test("streaming forecast scorer matches the saved-model batch predictions exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.{Forecast, ModelStore}
    val path = java.nio.file.Files.createTempDirectory("graft-fcs").toString
    ModelStore.saveForecast(spark, Sf01, path)
    val base = Forecast.featureBase(spark, Sf01).filter(col("t") >= col("tsplit"))
    val want = ModelStore.loadAndForecast(spark, path, base).collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("t")) -> r.getAs[Double]("p")).toMap
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = base.select("series", "t", "y", "x1", "x2", "x3", "x4", "x5", "x6")
      .collect().map(r => FRow(t0, r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))
    val mem = MemoryStream[FRow]
    val out = ScoreStream.forecastStream(spark, path, mem.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fcast").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("fcast").collect()
        .map(r => (r.getAs[String]("series"), r.getAs[Long]("t")) -> r.getAs[Double]("p")).toMap
      assert(got.size === want.size)
      // identical coefficients + identical apply chain → exact equality
      assert(got === want)
    } finally q.stop()
  }

  test("streaming GBT scorer matches the saved-model batch predictions exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.{Forecast, ModelStore}
    val path = java.nio.file.Files.createTempDirectory("graft-gbts").toString
    ModelStore.saveGbt(spark, Sf01, path)
    val base = Forecast.featureBase(spark, Sf01).filter(col("t") >= col("tsplit"))
    val want = ModelStore.loadAndGbtForecast(spark, path, base).collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("t")) -> r.getAs[Double]("p")).toMap
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = base.select("series", "t", "y", "x1", "x2", "x3", "x4", "x5", "x6")
      .collect().map(r => FRow(t0, r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))
    val mem = MemoryStream[FRow]
    val out = ScoreStream.gbtStream(spark, path, mem.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("gbts").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("gbts").collect()
        .map(r => (r.getAs[String]("series"), r.getAs[Long]("t")) -> r.getAs[Double]("p")).toMap
      assert(got.size === want.size)
      // same serialized trees + same shared apply chain → exact equality
      assert(got === want)
    } finally q.stop()
  }

  case class QVec(ts: Timestamp, qid: Long, av: Array[Double])

  test("streaming vector search over a saved SQ8 index matches batch qv11 exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.ModelStore
    val path = java.nio.file.Files.createTempDirectory("graft-sq8s").toString
    ModelStore.saveSq8Index(spark, Sf001, path)
    val want = graft.vector.Similarity.sq8Ann(spark, Sf001, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(want.nonEmpty)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = spark.read.parquet(s"$Sf001/embeddings.parquet")
      .filter(col("vec_id") % 100 === 0 && col("vec_id") < 100000L).collect()
      .map(r => QVec(t0, r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val mem = MemoryStream[QVec]
    val q = ScoreStream.annStream(spark, path, mem.toDF(), k = 5)
      .writeStream.outputMode("append").format("memory").queryName("ann_stream").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("ann_stream").collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk")) ->
          (r.getAs[Long]("vec_id"), r.getAs[Double]("ad2"))).toMap
      assert(got.size === want.size)
      // saved codes + identical grid + identical kernel → exact equality
      assert(got === want)
    } finally q.stop()
  }

  test("streaming conformal band monitor matches the saved-calibration batch flags exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.{ModelStore, TsCore}
    val path = java.nio.file.Files.createTempDirectory("graft-conf").toString
    ModelStore.saveConformal(spark, Sf01, path)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("series").orderBy("t")
    val pts = TsCore.filled(spark, Sf01)
      .select(col("series"), col("t"), col("v_filled").as("y"),
        lag("v_filled", TsCore.WeekLag).over(w).as("p"))
      .join(TsCore.splitBoundary(spark, Sf01)
        .select(col("series"), (col("mwin") * TsCore.DaySize).as("tsplit")), "series")
      .filter(col("y").isNotNull && col("p").isNotNull && col("t") >= col("tsplit"))
    val want = ModelStore.loadAndFlag(spark, path, pts).collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("t")) ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Int]("out_of_band"))).toMap
    assert(want.nonEmpty && want.values.exists(_._3 == 1) && want.values.exists(_._3 == 0),
      "test region must contain points on both sides of the band")
    val rows = pts.select("series", "t", "y", "p").collect()
      .map(r => CRow(new Timestamp(r.getLong(1) * 1000L), r.getString(0),
        r.getDouble(2), r.getDouble(3)))
    val mem = MemoryStream[CRow]
    val q = ScoreStream.conformalStream(spark, path, mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("confband").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("confband").collect()
        .map(r => (r.getAs[String]("series"), r.getAs[Timestamp]("ts").getTime / 1000L) ->
          (r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Int]("out_of_band"))).toMap
      assert(got.size === want.size)
      // same saved int-grid q̂ + same IEEE band arithmetic → exact equality
      assert(got === want)
    } finally q.stop()
  }

  test("streaming span imputer matches the saved-model batch imputations exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.{Impute, ModelStore}
    val path = java.nio.file.Files.createTempDirectory("graft-imps").toString
    ModelStore.saveImputer(spark, Sf01, path)
    val pts = Impute.imputePoints(spark, Sf01)
    val want = ModelStore.loadAndImpute(spark, path, pts).collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("win"), r.getAs[Long]("pos")) ->
        r.getAs[Double]("v_imp")).toMap
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = pts.select("series", "win", "pos", "o", "xl", "xr", "xs").collect()
      .map(r => IRow(t0, r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val mem = MemoryStream[IRow]
    val q = ScoreStream.imputeStream(spark, path, mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("impstr").start()
    try {
      mem.addData(rows.toSeq); q.processAllAvailable()
      val got = spark.table("impstr").collect()
        .map(r => (r.getAs[String]("series"), r.getAs[Long]("win"), r.getAs[Long]("pos")) ->
          r.getAs[Double]("v_imp")).toMap
      assert(got.size === want.size && got === want)
    } finally q.stop()
  }

  test("streaming decontamination flags docs sharing eval shingles, passes clean ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    // static eval-set shingle table: hashes of the 5-gram "a b c d e"
    // (and one decoy) — same hash family as the batch operator
    val evalShingles = Seq("a b c d e", "z z z z z").toDF("sh")
      .select(graft.text.TextCore.strHash60(col("sh")).as("h"))
    val out = ScoreStream.decontaminateStream(mem.toDF(), evalShingles)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("decontam").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
      mem.addData(
        Doc(at(0), 1L, "x a b c d e y"),   // contains the eval 5-gram twice over? once
        Doc(at(1), 2L, "totally clean text with no overlap at all"),
        Doc(at(2), 3L, "a b c d e a b c d e"))  // contains it twice (positions 0 and 5)
      q.processAllAvailable()
      // advance the watermark past the docs so the append-mode agg emits
      mem.addData(Doc(at(200), 99L, "flush"))
      q.processAllAvailable()
      val rows = spark.table("decontam").collect()
        .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))).toMap
      assert(rows(1L) === ((1L, true)))
      assert(rows(2L) === ((0L, false)))
      assert(rows(3L) === ((2L, true)))
    } finally q.stop()
  }

  test("streaming scores append to a real parquet sink with checkpointing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[Ev]
    val bank = Seq(("click", 50.0, 10.0)).toDF("series", "mu", "sd")
    val q = ScoreStream.scoreStream(mem.toDF(), bank).writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
      mem.addData(Ev(at(5), "click", 40.0), Ev(at(20), "click", 60.0))
      q.processAllAvailable()
      mem.addData(Ev(at(600), "click", 50.0)) // advance watermark
      q.processAllAvailable()
      val back = spark.read.parquet(s"$dir/out")
      assert(back.count() > 0, "closed windows must land in the parquet sink")
      assert(back.columns.toSet === Set("series", "wstart", "wmean", "n", "score"))
    } finally q.stop()
  }

  test("streaming corpus funnel matches batch qc1 stage flags under ordered arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch truth: the per-doc staged flags qc1/qc3 roll up
    val flags = graft.text.TextOps.corpusFlags(spark, Sf001, 20, 50L).collect()
    val want = flags.map { r =>
      def b(n: String) = !r.isNullAt(r.fieldIndex(n)) && r.getBoolean(r.fieldIndex(n))
      r.getLong(r.fieldIndex("doc_id")) ->
        ((b("q_keep"), b("c_keep"), b("d_keep"), b("final_keep")))
    }.toMap
    // static artifacts the production funnel persists: the eval-suite
    // shingle hash set (bounded) and the per-doc keeper table
    val evalHashes = graft.text.TextCore.shingles(spark, Sf001, 5)
      .filter(col("doc_id") % 50L === 0)
      .select(graft.text.TextCore.strHash60(col("sh")).as("h"))
      .distinct().as[Long].collect()
    val keepers = flags.map { r =>
      (r.getLong(r.fieldIndex("doc_id")),
        if (r.isNullAt(r.fieldIndex("keeper"))) None
        else Some(r.getLong(r.fieldIndex("keeper"))))
    }.toSeq.toDF("doc_id", "keeper")
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select("doc_id", "source", "lang", "text", "n_chars")
      .orderBy("doc_id").collect()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val mem = MemoryStream[CDoc]
    val out = ScoreStream.corpusFunnelStream(mem.toDF(), evalHashes, keepers)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel").start()
    try {
      // ingestion (doc_id) order split across TWO microbatches: the
      // per-source cap state must carry across the boundary
      val rows = docs.map(r => CDoc(t0, r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), r.getLong(4)))
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("funnel").collect().map { r =>
        r.getAs[Long]("docId") ->
          ((r.getAs[Boolean]("qKeep"), r.getAs[Boolean]("cKeep"),
            r.getAs[Boolean]("dKeep"), r.getAs[Boolean]("finalKeep"),
            r.getAs[String]("reason")))
      }.toMap
      assert(got.size === want.size)
      for ((id, (qk, ck, dk, fk)) <- want) {
        val (gq, gc, gd, gf, reason) = got(id)
        assert((gq, gc, gd, gf) === ((qk, ck, dk, fk)), s"doc $id (reason=$reason)")
        if (fk) assert(reason === "admitted", s"doc $id")
      }
      // the funnel is a funnel: some docs fail each of the major stages
      val reasons = got.values.map(_._5).toSet
      assert(reasons.contains("admitted") && reasons.contains("dup"))
    } finally q.stop()
  }

  test("burstRateStream validates idleTtl against the window at construction") {
    import spark.implicits._
    val ds = Seq((1L, 10L)).toDS()
    // Spark's CalendarInterval grammar (incl. compound strings — what
    // setTimeoutDuration actually accepts) passes when ttl >= window
    ScoreStream.burstRateStream(ds, windowSec = 3600, idleTtl = Some("1 hour 30 minutes"))
    ScoreStream.burstRateStream(ds, windowSec = 3600, idleTtl = Some("2 hours"))
    intercept[IllegalArgumentException] {
      ScoreStream.burstRateStream(ds, windowSec = 3600, idleTtl = Some("5 minutes"))
    }
    intercept[IllegalArgumentException] {
      ScoreStream.burstRateStream(ds, windowSec = 3600, idleTtl = Some("not a duration"))
    }
    intercept[IllegalArgumentException] {
      // months have no fixed length — must be rejected, not guessed
      ScoreStream.burstRateStream(ds, windowSec = 3600, idleTtl = Some("1 month"))
    }
  }

  test("streaming plan survives a static-bank broadcast join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val bank = ScoreStream.staticBank(spark, Sf001)
    val out = ScoreStream.scoreStream(mem.toDF(), bank)
    assert(out.isStreaming)
  }

  test("streaming chunker matches batch qt24 chunks across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val want = graft.text.TextOps.chunkDocs(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(want.nonEmpty)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc(t0, r.getLong(0), r.getString(1)))
    val mem = MemoryStream[Doc]
    val q = ScoreStream.chunkStream(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("chunks").start()
    try {
      // stateless: split the corpus anyway to prove chunk identity is
      // batch-boundary-free
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("chunks").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
          (r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok_chunk"),
            r.getAs[String]("chunk_md5"))).toMap
    // ONE shared chunk projection (TextOps.chunkFrom) → exact equality
      assert(got.size === want.size)
      assert(got === want)
    } finally q.stop()
  }

  case class Li(ts: Timestamp, l_returnflag: String, l_quantity: Double,
                l_discount: Double, l_extendedprice: Double)

  test("streaming media resize matches batch qm10 across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val want = graft.multimodal.BinaryMeta.resizePlanes(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("byte_sum"),
          r.getAs[Long]("mean_byte"))).toMap
    assert(want.nonEmpty)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc(t0, r.getLong(0), r.getString(1)))
    val mem = MemoryStream[Doc]
    val q = ScoreStream.resizeStream(spark, mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("rsz").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("rsz").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket")) ->
          (r.getAs[Long]("n_bytes"), r.getAs[Long]("byte_sum"),
            r.getAs[Long]("mean_byte"))).toMap
      // ONE shared resize kernel → exact equality
      assert(got === want)
    } finally q.stop()
  }

  test("streaming expectation gate matches batch qp11 row-level checks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rowNames = graft.analytics.Events.RowChecks.map(_._1).toSet
    val want = graft.analytics.Events.expectations(spark, Sf001).collect()
      .filter(r => rowNames.contains(r.getAs[String]("check_name")))
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Double]("metric"), r.getAs[Double]("threshold"),
          r.getAs[Long]("passed"))).toMap
    assert(want.size === graft.analytics.Events.RowChecks.size)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = spark.read.parquet(s"$Sf001/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
      .collect()
      .map(r => Li(t0, r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val mem = MemoryStream[Li]
    val q = ScoreStream.expectationsStream(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("expect").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      // advance the watermark past the window so it emits
      mem.addData(Seq(Li(Timestamp.valueOf("2024-01-03 00:00:00"), "A", 1.0, 0.0, 1.0)))
      q.processAllAvailable()
      val got = spark.table("expect")
        .filter(col("win_start") === lit(t0))
        .collect()
        .map(r => r.getAs[String]("check_name") ->
          (r.getAs[Double]("metric"), r.getAs[Double]("threshold"),
            r.getAs[Long]("passed"))).toMap
      // one shared constraint catalog + exact int ratios → equality
      assert(got === want)
    } finally q.stop()
  }

  test("streaming BPE encoder over a saved merge table matches batch qt26") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.ModelStore
    val path = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    ModelStore.saveBpe(spark, Sf001, path)
    val want = graft.text.TextOps.bpeEncode(spark, Sf001).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tok"),
        r.getAs[Long]("n_subword"), r.getAs[Double]("subword_per_char"))).toMap
    assert(want.nonEmpty)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc(t0, r.getLong(0), r.getString(1)))
    val mem = MemoryStream[Doc]
    val q = ScoreStream.bpeEncodeStream(spark, path, mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("bpenc").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("bpenc").collect()
        .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_tok"),
          r.getAs[Long]("n_subword"), r.getAs[Double]("subword_per_char"))).toMap
      // replaying the ordered rules in-row IS the sequential merge
      // process the vocabulary segmentation came from → exact equality
      assert(got.size === want.size)
      assert(got === want)
    } finally q.stop()
  }

  test("streaming chunk-dedup gate admits each lineage key exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc(t0, r.getLong(0), r.getString(1))).sortBy(_.doc_id)
    val batch = graft.text.TextOps.chunkDocs(spark, Sf001).cache()
    val distinctMd5 = batch.select("chunk_md5").distinct().collect()
      .map(_.getString(0)).toSet
    val mem = MemoryStream[Doc]
    val q = ScoreStream.chunkDedupStream(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("chdd").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("chdd").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("chunk_md5")))
      // exactly one admission per distinct lineage key — qc5's n_indexed
      assert(got.length === distinctMd5.size)
      assert(got.map(_._2).toSet === distinctMd5)
      // first-arrival keeper: a key present in the first half can never
      // be admitted from a second-half document
      val h1Ids = h1.map(_.doc_id).toSet
      val h1Md5 = batch.filter(col("doc_id").isin(h1Ids.toSeq: _*))
        .select("chunk_md5").distinct().collect().map(_.getString(0)).toSet
      assert(got.filter(g => h1Md5.contains(g._2)).forall(g => h1Ids.contains(g._1)))
    } finally { q.stop(); batch.unpersist() }
  }

  test("streaming chunk-dedup gate with a declared horizon bounds state via watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = Timestamp.valueOf(s"2024-01-01 0${m / 60}:${"%02d".format(m % 60)}:00")
    val mem = MemoryStream[Doc]
    val q = ScoreStream.chunkDedupStream(mem.toDF(), dedupWatermark = Some("1 hour"))
      .writeStream.outputMode("append").format("memory").queryName("chddwm").start()
    try {
      // within the horizon: duplicate suppressed exactly like the
      // unbounded gate
      mem.addData(Doc(t(0), 1L, "k1 k2 k3"), Doc(t(10), 2L, "k1 k2 k3"))
      q.processAllAvailable()
      // push the watermark past the first key's event time (+3h with a
      // 1h delay -> watermark 02:00 > 00:00): its state is evictable
      mem.addData(Doc(t(180), 3L, "other words here"))
      q.processAllAvailable()
      // the SAME lineage key re-arrives AFTER eviction: re-admitted —
      // the bounded-state contract the caller opted into
      mem.addData(Doc(t(181), 4L, "k1 k2 k3"))
      q.processAllAvailable()
      val got = spark.table("chddwm").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("chunk_md5")))
      val byDoc = got.groupBy(_._1)
      assert(byDoc.contains(1L) && !byDoc.contains(2L),
        s"in-horizon duplicate must be suppressed: $got")
      assert(byDoc.contains(3L))
      assert(byDoc.contains(4L),
        s"post-eviction re-arrival must be re-admitted: $got")
    } finally q.stop()
  }

  test("streaming BPE encoder serves a PRODUCTION-round (qt28/qt29) saved model") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.ModelStore
    val path = java.nio.file.Files.createTempDirectory("graft-bpe64").toString
    ModelStore.saveBpeLocal(spark, Sf001, path, rounds = 64)
    val want = graft.text.TextOps.bpeEncodeLocal(spark, Sf001, rounds = 64).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tok"),
        r.getAs[Long]("n_subword"), r.getAs[Double]("subword_per_char"))).toMap
    assert(want.nonEmpty)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc(t0, r.getLong(0), r.getString(1)))
    val mem = MemoryStream[Doc]
    // the compiled expression nests one replace() per merge rule — 64
    // here; plan-size headroom is what maxPlanStringLength is for
    val q = ScoreStream.bpeEncodeStream(spark, path, mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("bpenc64").start()
    try {
      mem.addData(docs.toSeq); q.processAllAvailable()
      val got = spark.table("bpenc64").collect()
        .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_tok"),
          r.getAs[Long]("n_subword"), r.getAs[Double]("subword_per_char"))).toMap
      assert(got === want)
    } finally q.stop()
  }

  case class QT(ts: Timestamp, qid: Long, terms: Array[String])

  case class HQ(ts: Timestamp, qid: Long, terms: Array[String],
                av: Array[Double], na: Double)

  test("streaming hybrid serve is bit-identical to batch qv25 (GUARDED hybridSearchIvf)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.ModelStore
    import graft.vector.Similarity
    val path = java.nio.file.Files.createTempDirectory("graft-hyb").toString
    ModelStore.saveHybridIndex(spark, Sf01, path)
    def key(r: org.apache.spark.sql.Row, o: Int) =
      (r.getLong(o), r.getLong(o + 1)) ->
        (r.getInt(o + 2), r.getInt(o + 3), r.getDouble(o + 4), r.getInt(o + 5))
    // the SERVING anchor: the stream's default share IS the guarded
    // configuration, so the batch side must be qv25's exact shape
    val share = Similarity.Bm25FallbackMaxDfShare
    val want = Similarity.hybridSearchIvf(spark, Sf01, fallbackMaxDfShare = share)
      .collect().map(key(_, 0)).toMap
    assert(want.nonEmpty)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val terms = Similarity.hybridQueryTerms(spark, Sf01, fallbackMaxDfShare = share)
      .collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._1)
      .map { case (q, g) => q -> g.map(_._2) }
    val qvecs = Similarity.vecs(spark, Sf01)
      .filter(col("vec_id") % 100 === 0 && col("vec_id") < 100L * Similarity.MaxQueries)
      .select("vec_id", "v", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val rows = qvecs.map { case (q, v, n) =>
      HQ(t0, q, terms.getOrElse(q, Array.empty[String]), v, n)
    }.sortBy(_.qid)
    val mem = MemoryStream[HQ]
    val q = ScoreStream.hybridServeStream(spark, path, mem.toDF(), windowDur = "1 day")
      .writeStream.outputMode("append").format("memory").queryName("hybs").start()
    try {
      // queries split across TWO batches — the window state must fuse
      // them identically to one batch
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      mem.addData(HQ(new Timestamp(t0.getTime + 10L * 86400000L), 999999L,
        Array("no-such-token"), null, 0.0)); q.processAllAvailable()
      val got = spark.table("hybs").collect().map(key(_, 1)).toMap
      assert(got.size === want.size)
      assert(got === want)
    } finally q.stop()
  }

  test("hybrid serve REFUSES over-cap live terms: hot posting never enters state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.ModelStore
    import graft.vector.Similarity
    val path = java.nio.file.Files.createTempDirectory("graft-hybref").toString
    ModelStore.saveHybridIndex(spark, Sf001, path)
    val share = 2L
    // the degenerate corpus has near-universal tokens — pick the
    // hottest (df > n_docs/share ⇒ over the serving ceiling) and any
    // admissible mid-df token
    val post = ModelStore.bm25Postings(spark, path)
      .select("tok", "df", "n_docs").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nDocs = post.head._3
    val ceil = math.max(math.max(Similarity.Bm25MaxDfFloor, nDocs / Similarity.Bm25MaxDfShare),
      nDocs / share)
    val hot = post.filter(_._2 > ceil).maxBy(_._2)._1
    val mid = post.filter(_._2 <= ceil).minBy(t => (t._2, t._1))._1
    // 1) STRUCTURAL: the guarded packed index contains NO over-cap row —
    //    the hot term's O(n_docs) posting array is never even built
    val packed = ModelStore.bm25PostingsPacked(spark, path, share)
    assert(packed.filter(col("df") > ceil).count() === 0L)
    assert(packed.filter(col("tok") === hot).count() === 0L)
    // 2) the refusal is LOUD on the audit channel
    val refused = ModelStore.bm25RefusedTerms(spark, path, share)
      .collect().map(_.getString(0)).toSet
    assert(refused.contains(hot))
    assert(!refused.contains(mid))
    // 3) BEHAVIORAL: a live query carrying the hot term is served
    //    exactly as if the term were absent (qids beyond the doc-id
    //    range so the e.id != qid filter is inert for both)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val mem = MemoryStream[HQ]
    val q = ScoreStream.hybridServeStream(spark, path, mem.toDF(),
      windowDur = "1 day", fallbackMaxDfShare = share)
      .writeStream.outputMode("append").format("memory").queryName("hybref").start()
    try {
      mem.addData(
        HQ(t0, 900001L, Array(hot, mid), null, 0.0),
        HQ(t0, 900002L, Array(mid), null, 0.0))
      q.processAllAvailable()
      mem.addData(HQ(new Timestamp(t0.getTime + 10L * 86400000L), 999999L,
        Array("no-such-token"), null, 0.0)); q.processAllAvailable()
      val rows = spark.table("hybref").collect()
        .map(r => r.getAs[Long]("qid") ->
          (r.getAs[Long]("doc_id"), r.getAs[Int]("lex_rank"),
            r.getAs[Int]("vec_rank"), r.getAs[Double]("rrf"),
            r.getAs[Int]("rnk")))
      val withHot = rows.filter(_._1 == 900001L).map(_._2).sortBy(_._5)
      val midOnly = rows.filter(_._1 == 900002L).map(_._2).sortBy(_._5)
      assert(midOnly.nonEmpty, "the admissible term must retrieve")
      assert(withHot === midOnly,
        "an over-cap term must contribute NOTHING (refused, not scored)")
    } finally q.stop()
    // the ROW-form twin honors the same ceiling BY DEFAULT (r15: both
    // lexical serving entry points default to the guarded share — a
    // user reaching for the BM25-only stream no longer falls into the
    // unvalved shape): the hot term's qid emits nothing, the admissible
    // term's qid scores
    assert(share === Similarity.Bm25FallbackMaxDfShare,
      "this test anchors the DEFAULT guarded share")
    val mem2 = MemoryStream[QT]
    val q2 = ScoreStream.bm25ScoreStream(spark, path, mem2.toDF(),
      windowDur = "1 day")
      .writeStream.outputMode("append").format("memory").queryName("bm25ref").start()
    try {
      mem2.addData(QT(t0, 900001L, Array(hot)), QT(t0, 900002L, Array(mid)))
      q2.processAllAvailable()
      mem2.addData(QT(new Timestamp(t0.getTime + 10L * 86400000L), 999999L,
        Array("no-such-token")))
      q2.processAllAvailable()
      val qids = spark.table("bm25ref").collect().map(_.getAs[Long]("qid")).toSet
      assert(!qids.contains(900001L), "row-form: over-cap term must score nothing")
      assert(qids.contains(900002L), "row-form: admissible term must score")
    } finally q2.stop()
  }

  test("hybrid serve epilogue folds a WIDE candidate window (3.5k entries, run sums)") {
    // the linearized per-doc scoring kernel (ONE array_sort by id +
    // run-boundary slice sums — O(C log C), replacing the r13
    // aggregate(filter) per distinct id that was O(C²) in one task) on
    // a PLANTED index wide enough that runs matter: tok 'w' posts to
    // 3000 docs, tok 'x' to docs 0..499, so one (window, qid) collects
    // 3500 entries with docs 0..499 as length-2 runs whose summands
    // must fold together. Expected ranking comes from the SHARED batch
    // scorer (bm25ScoreOf) over the same planted frame.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.ModelStore
    import graft.vector.Similarity
    val path = java.nio.file.Files.createTempDirectory("graft-hybwide").toString
    val nDocs = 9000L
    val avgdlen = 50.0
    def prow(tok: String, d: Long, df: Long) =
      (d, tok, 1L + d % 7L, 100L + d % 13L, df, nDocs, avgdlen)
    val post = ((0L until 3000L).map(prow("w", _, 3000L)) ++
      (0L until 500L).map(prow("x", _, 500L)))
      .toDF("doc_id", "tok", "tf", "dlen", "df", "n_docs", "avgdlen")
    post.write.mode("overwrite").parquet(s"$path/bm25postings")
    // minimal dense-side artifacts (the stream plans both branches)
    Seq((0, Array(0.0, 0.0))).toDF("cell", "cv")
      .write.mode("overwrite").parquet(s"$path/ivfcentroids")
    Seq((1L, Array(1.0, 0.0), 1.0, 0)).toDF("vec_id", "v", "nrm", "cell")
      .write.mode("overwrite").parquet(s"$path/ivflists")
    val qid = 900001L
    val depth = 20
    val k = 10
    val qterms = Seq((qid, "w"), (qid, "x")).toDF("qid", "tok")
    // lexical-only window (av null) ⇒ fused ranking = lex ranking, so
    // the emitted top-k is the first k of the depth-deep BM25 ordering
    val want = Similarity.bm25ScoreOf(post, qterms).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
      .map { case ((d, _), i) =>
        val rrf = 1.0 / (Similarity.RrfK + (i + 1))
        (d, i + 1, 0, math.floor(rrf * 1000000d + 0.5d) / 1000000d, i + 1) }
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val mem = MemoryStream[HQ]
    val q = ScoreStream.hybridServeStream(spark, path, mem.toDF(),
      windowDur = "1 day", depth = depth)
      .writeStream.outputMode("append").format("memory").queryName("hybwide").start()
    try {
      mem.addData(HQ(t0, qid, Array("w", "x"), null, 0.0))
      q.processAllAvailable()
      mem.addData(HQ(new Timestamp(t0.getTime + 10L * 86400000L), 999999L,
        Array("no-such-token"), null, 0.0)); q.processAllAvailable()
      val got = spark.table("hybwide").collect()
        .filter(_.getAs[Long]("qid") == qid)
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("lex_rank"),
          r.getAs[Int]("vec_rank"), r.getAs[Double]("rrf"),
          r.getAs[Int]("rnk"))).sortBy(_._5)
      assert(got.length === k)
      assert(got === want)
    } finally q.stop()
  }

  test("streaming BM25 scorer over a saved index matches batch qv18 lexical sums") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.ModelStore
    import graft.vector.Similarity
    val path = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    ModelStore.saveBm25Index(spark, Sf001, path)
    val qterms = Similarity.hybridQueryTerms(spark, Sf001)
    // the stream's GUARDED default ceiling, mirrored on the batch side:
    // parity is vs the df-ceilinged postings the stream actually serves
    val want = Similarity.bm25ScoreOf(
      Similarity.bm25Postings(spark, Sf001).filter(col("df") <=
        ModelStore.packedDfCeiling(Similarity.Bm25FallbackMaxDfShare)),
      qterms)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(want.nonEmpty)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = qterms.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (qid, g) => QT(t0, qid, g.map(_._2)) }.toSeq
    val mem = MemoryStream[QT]
    val q = ScoreStream.bm25ScoreStream(spark, path, mem.toDF(), windowDur = "1 day")
      .writeStream.outputMode("append").format("memory").queryName("bm25s").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
      // advance the watermark past the window so append mode emits
      mem.addData(QT(new Timestamp(t0.getTime + 10L * 86400000L), 999999L,
        Array("no-such-token"))); q.processAllAvailable()
      val got = spark.table("bm25s").collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id")) ->
          r.getAs[Long]("bm25q")).toMap
      // the SHARED bm25Contrib summand → exact int64 equality
      assert(got.size === want.size)
      assert(got === want)
    } finally q.stop()
  }

  // ───── the serving twins on the committed ZIPF events (VERDICT r17
  // next #2): the batch halves qz19/qz20 run on the bot-headed corpus
  // every round, but the twins' bounded-state claims — burstRate's
  // "state ≤ the densest window", session-window eviction — are
  // exactly what a 20%-head stream stresses. These replay the
  // committed zipfdata/events.parquet through the twins across a
  // mid-stream batch split and assert batch parity AND the state
  // bounds, read back from the checkpoint via the state data source.

  test("zipf streaming burst rate: batch parity + state bounded by the bot's densest window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-zburst").toString
    val raw = spark.read.parquet(s"${SparkEntry.ZipfDir}/events.parquet")
    val evs = raw.select(col("user_id"), graft.util.Ts.sec(raw).as("tsec"))
      .as[(Long, Long)].collect().sortBy(e => (e._2, e._1))
    var cut = evs.length / 2
    while (cut < evs.length && evs(cut) == evs(cut - 1)) cut += 1
    val mem = MemoryStream[(Long, Long)]
    val q = ScoreStream.burstRateStream(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("zipf_burst").option("checkpointLocation", ckpt).start()
    try {
      val (h1, h2) = evs.splitAt(cut)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      // parity: per-user (n_events, peak) equals batch qe15 on the
      // SAME corpus (qz19's oracle side), across the batch split
      val got = spark.table("zipf_burst").as[ScoreStream.RateVerdict].collect()
      assert(got.length === evs.length, "one verdict per event")
      val gotPeak = got.groupBy(_.userId)
        .map { case (u, vs) => u -> (vs.length.toLong, vs.map(_.nw).max) }
      val batch = graft.analytics.Events.burstRate(spark, SparkEntry.ZipfDir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(gotPeak === batch)
      // the bot IS flagged in flight (the rate limiter is live)
      assert(got.filter(_.userId == 0L).exists(_.flagged))
      // STATE BOUND, observed (not claimed): one state row per USER —
      // 150 keys for 10,000 events — and the bot's retained times are
      // its trailing-window cohort at its last arrival, never its
      // 2,026-event history. Bound: its own batch peak_rate (the
      // densest window).
      assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum ===
        evs.map(_._1).distinct.length.toLong)
      val st = spark.read.format("statestore").load(ckpt)
        .select(col("key.value").as("user"),
          size(col("value.groupState.times")).as("n_state"))
        .as[(Long, Int)].collect().toMap
      val botTimes = evs.filter(_._1 == 0L).map(_._2)
      val botLast = botTimes.max
      val botInWindow = botTimes.count(t => t > botLast - 86400L && t <= botLast)
      assert(st(0L) === botInWindow, "bot state = exactly the in-window cohort")
      assert(st(0L) <= batch(0L)._2, "bot state bounded by its densest window (peak_rate)")
      assert(st(0L).toLong < batch(0L)._1 / 5, "bot state is a small fraction of its history")
    } finally q.stop()
  }

  test("zipf streaming session windows: batch qe1 parity + closed-session state eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val raw = spark.read.parquet(s"${SparkEntry.ZipfDir}/events.parquet")
    val evs = raw.select(col("user_id"), graft.util.Ts.sec(raw).as("tsec"))
      .as[(Long, Long)].collect().sortBy(e => (e._2, e._1))
    // second-floored event times keep the boundary semantics exact:
    // session_window merges INCLUSIVELY at the gap (abutting windows
    // merge — verified against this corpus's adjacent gaps of exactly
    // 1800 s and 1801 s), which coincides with batch qe1's break rule
    // (new session iff diff > 1800 s) at gap = 30 minutes precisely.
    val mem = MemoryStream[UEv]
    val q = ScoreStream.sessionStream(mem.toDF(), gap = "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("zipf_sessions").start()
    try {
      val mid = (evs.head._2 + evs.last._2) / 2
      val (h1, h2) = evs.partition(_._2 <= mid)
      def rows(es: Array[(Long, Long)]) =
        es.map { case (u, t) => UEv(new Timestamp(t * 1000L), u) }.toSeq
      mem.addData(rows(h1)); q.processAllAvailable()
      mem.addData(rows(h2)); q.processAllAvailable()
      // sentinel far past the horizon: the watermark passes every real
      // session, so append mode emits them ALL (the sentinel's own
      // session stays open and is never emitted)
      mem.addData(UEv(new Timestamp((evs.last._2 + 30L * 86400L) * 1000L), -1L))
      q.processAllAvailable()
      val got = spark.table("zipf_sessions")
        .select(col("user_id"), col("s_start").cast("long").as("s0"),
          (col("s_end").cast("long") - 1800L).as("s1"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3, r._4)).sorted.toSeq
      val batch = graft.analytics.Events.sessionize(spark, SparkEntry.ZipfDir)
        .select(col("user_id"), col("start_epoch"), col("end_epoch"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(got === batch,
        s"stream sessions (${got.size}) must equal batch qe1 (${batch.size})")
      // the bot's dense chains (qz20: ≥20-event sessions) closed and
      // left the store: remaining state is the open sentinel session
      // only — eviction keeps state at the in-horizon session count,
      // not the corpus's session history
      assert(got.count(_._1 == 0L) >= 2, "the bot closes multiple sessions")
      assert(got.filter(_._1 == 0L).map(_._4).max >= 20L, "dense bot sessions")
      assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum <= 2L,
        "closed sessions must be evicted; only the sentinel's open session may remain")
    } finally q.stop()
  }

  case class IQ(ts: Timestamp, qid: Long, av: Array[Double], na: Double)

  test("streaming IVF serving over the saved SPLIT index matches batch ivfServe across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.timeseries.ModelStore
    // (c) of qv26's lifecycle: the rebalanced index round-trips through
    // ModelStore and the STREAMING server answers from it — the split
    // is invisible to serving (same layout, same arithmetic)
    val path = java.nio.file.Files.createTempDirectory("graft-zivf").toString
    ModelStore.saveSplitIvfIndex(spark, SparkEntry.ZipfDir, path)
    graft.functions.VectorExprs.register(spark)
    val q = spark.read.parquet(s"${SparkEntry.ZipfDir}/embeddings.parquet")
      .filter(col("vec_id") % 100 === 0 && col("vec_id") < 100000L)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("av"))
      .withColumn("na", sqrt(expr("graft_dot(av, av)")))
    val want = ModelStore.ivfServe(spark, path, q).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(want.nonEmpty)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = q.collect().map(r =>
      IQ(t0, r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val mem = MemoryStream[IQ]
    val sq = ScoreStream.ivfServeStream(spark, path, mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("zivf").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq); sq.processAllAvailable()
      mem.addData(h2.toSeq); sq.processAllAvailable()
      // sentinel far past the window+watermark closes the hour window
      mem.addData(IQ(new Timestamp(t0.getTime + 10L * 86400000L), -1L, null, 0.0))
      sq.processAllAvailable()
      val got = spark.table("zivf").collect()
        .map(r => (r.getLong(1), r.getInt(4)) -> (r.getLong(2), r.getDouble(3))).toMap
      // same probe order, same fold arithmetic, same tie-breaks and
      // quantization → bit-identical to the batch server
      assert(got === want)
    } finally sq.stop()
  }

  test("zipf streaming attribution matches the batch qe10 rollup across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val evRaw = spark.read.parquet(s"${SparkEntry.ZipfDir}/events.parquet")
    val evs = evRaw
      .select(col("user_id"), graft.util.Ts.sec(evRaw).as("tsec"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val out = ScoreStream.attributionStream(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("zipf_attr").start()
    try {
      val mid = evs.map(_._2).max / 2
      mem.addData(evs.filter(_._2 <= mid).toSeq)
      q.processAllAvailable()
      mem.addData(evs.filter(_._2 > mid).toSeq)
      q.processAllAvailable()
      val got = spark.table("zipf_attr").as[ScoreStream.AttributedConv].collect()
      val gotRoll = got.groupBy(_.channel).map { case (ch, rows) =>
        val gaps = rows.map(_.gapS).filter(_ >= 0)
        ch -> (rows.length.toLong,
          r4(rows.map(r => math.floor(r.value * 10000 + 0.5).toLong).sum / 10000.0),
          if (gaps.isEmpty) null else r4(gaps.map(_.toDouble).sum / rows.length))
      }
      val batch = graft.analytics.Events.attribution(spark, SparkEntry.ZipfDir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3))).toMap
      assert(gotRoll.keySet === batch.keySet)
      for ((ch, v) <- batch) assert(gotRoll(ch) === v, s"channel $ch")
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
