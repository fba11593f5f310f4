package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Events, Relational}
import graft.timeseries.{Forecast, Intervals, TsCore}

class IntervalsAsofSpec extends SparkSuite {

  test("as-of join: every match is the latest strictly-earlier view") {
    val a = Events.asofJoin(spark, Sf01).cache()
    assert(a.count() > 0)
    // strictness: matched view is strictly before the purchase
    assert(a.filter(col("view_tsec").isNotNull && col("gap_s") <= 0).count() === 0)
    // every purchase appears exactly once (left join, no fan-out)
    val purchases = graft.util.Tables.events(spark, Sf01)
      .filter(col("event_type") === "purchase").count()
    assert(a.count() === purchases)
  }

  test("range join: interval bucketing finds every contained point") {
    val r = Intervals.rangeJoin(spark, Sf01).cache()
    assert(r.count() > 0)
    // each padded interval covers at least its own anomalous run
    assert(r.filter(col("n_pts") <= 0).count() === 0)
    // n_pts never exceeds the padded interval width
    assert(r.filter(col("n_pts") > col("t_hi") - col("t_lo") + 1).count() === 0)
  }

  test("acf: lag-24 (daily) autocorrelation is strong on load-like series") {
    val a = Forecast.acf(spark, Sf01).cache()
    assert(a.filter(col("lag_h") === 24).count() > 0)
    assert(a.filter(col("acf") > 1.0001 || col("acf") < -1.0001).count() === 0)
  }

  test("level shift flags are symmetric-bounded and complete-frame only") {
    val l = Intervals.levelShift(spark, Sf01).cache()
    // every flag exceeds the threshold in absolute value
    assert(l.filter(abs(col("shift_z")) < 3.0 - 1e-4).count() === 0)
  }

  test("cusum: prefix-identity flags match the sequential Page recursion exactly") {
    // Recompute CUSUM the textbook way (driver-side sequential recursion
    // over each series) and assert the distributed prefix-form operator
    // flags the identical (series, t) set with identical normalized values.
    val k = 0.5; val h = 5.0
    val pts = TsCore.filled(spark, Sf001).filter(col("v_filled").isNotNull)
      .select("series", "t", "v_filled").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expected = pts.flatMap { case (series, rows) =>
      val vs = rows.map(_._3)
      val n = vs.length
      if (n <= 1) Seq.empty[((String, Long), (Double, Double))]
      else {
        val mu = vs.map(v => math.floor(v * 10000d + 0.5d).toLong).sum / 10000d / n
        val m2 = vs.map(v => math.floor(v * v * 10000d + 0.5d).toLong).sum / 10000d
        val sd = math.sqrt(math.max(0.0, (m2 - n * mu * mu) / (n - 1)))
        var sp = 0.0; var sn = 0.0
        rows.zip(vs).flatMap { case ((_, t, _), v) =>
          sp = math.max(0.0, sp + (v - mu - k * sd))
          sn = math.max(0.0, sn + (mu - k * sd - v))
          if (sp > h * sd || sn > h * sd)
            Some((series, t) -> (sp / sd, sn / sd))
          else None
        }.toSeq
      }
    }
    val got = Intervals.cusum(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    // The recursion resets to exact 0.0 at each max() while the prefix
    // form subtracts a running min — algebraically equal, ulp-different —
    // so keys must match exactly, values to quantization tolerance.
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, (ep, en)) =>
      val (gp, gn) = got(key)
      assert(math.abs(gp - ep) < 2e-4 && math.abs(gn - en) < 2e-4, s"$key: ($gp,$gn) vs ($ep,$en)")
    }
    assert(got.nonEmpty)
  }

  test("completeness audit: source counts partition the spine, gaps bounded") {
    val c = graft.timeseries.TsQueries.qp6Completeness(spark, Sf01).cache()
    assert(c.filter(col("n_obs") + col("n_lag") + col("n_lead") + col("n_missing")
      =!= col("n_slots")).count() === 0)
    assert(c.filter(col("pct_obs") < 0.0 || col("pct_obs") > 1.0).count() === 0)
    assert(c.filter(col("max_gap") > col("n_slots") - col("n_obs")).count() === 0)
    assert(c.count() === TsCore.filled(spark, Sf01).select("series").distinct().count())
  }

  test("episodes: interval union matches a driver-side sequential merge") {
    val pad = 2
    // ground truth: rebuild the padded intervals from the injected flags
    // and merge them sequentially per series
    val runs = TsCore.injected(spark, Sf01).filter(col("is_anom") === 1)
      .select("series", "win", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2))
    val iv = runs.toSeq.flatMap { case ((series, win), rows) =>
      val ps = rows.map(_._3).sorted
      // split consecutive positions into runs
      val brk = ps.zipWithIndex.map { case (p, i) => p - i }
      ps.zip(brk).groupBy(_._2).values.map { g =>
        val lo = g.map(_._1).min; val hi = g.map(_._1).max
        (series, win * 24 + lo - pad, win * 24 + hi + pad)
      }
    }
    val expected = iv.groupBy(_._1).flatMap { case (series, ivs) =>
      val sorted = ivs.sortBy(_._2)
      val eps = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      sorted.foreach { case (_, lo, hi) =>
        if (eps.nonEmpty && lo <= eps.last._2)
          eps(eps.length - 1) = (eps.last._1, math.max(eps.last._2, hi), eps.last._3 + 1)
        else eps += ((lo, hi, 1L))
      }
      eps.zipWithIndex.map { case ((lo, hi, n), i) =>
        (series, i + 1L, lo, hi, n, hi - lo + 1) }
    }.toSet
    val got = Intervals.episodes(spark, Sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("median filter: frame median matches a driver-side sorted-window recompute") {
    val half = 12
    val pts = TsCore.filled(spark, Sf001).filter(col("v_filled").isNotNull)
      .select("series", "t", "v_filled").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expected = pts.flatMap { case (series, rows) =>
      rows.indices.map { i =>
        val frame = rows.slice(math.max(0, i - half), math.min(rows.length, i + half + 1))
          .map(_._3).sorted
        val n = frame.length
        val med =
          if (n % 2 == 1) frame(n / 2)
          else { val a = frame(n / 2 - 1); a + (frame(n / 2) - a) * 0.5 }
        (series, rows(i)._2) -> (med, rows(i)._3 - med)
      }
    }
    val got = Intervals.medianFilter(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, (em, er)) =>
      val (gm, gr) = got(key)
      assert(math.abs(gm - em) < 2e-4 && math.abs(gr - er) < 2e-4, s"$key: ($gm,$gr) vs ($em,$er)")
    }
  }

  test("psi drift: non-negative, halves partition the series, driver recompute agrees") {
    val nBins = 10
    val d = graft.timeseries.TsQueries.qp7Drift(spark, Sf01).cache()
    assert(d.filter(col("psi") < 0.0).count() === 0)
    val pts = TsCore.filled(spark, Sf01).filter(col("v_filled").isNotNull)
      .select("series", "t", "v_filled").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).groupBy(_._1)
    val expected = pts.map { case (series, rows) =>
      val mid = math.floorDiv(rows.map(_._2).min + rows.map(_._2).max, 2)
      val mn = rows.map(_._3).min; val mx = rows.map(_._3).max
      def bin(v: Double): Long =
        if (mx == mn) 0L else math.min(math.floor((v - mn) / (mx - mn) * nBins).toLong, nBins - 1L)
      val byBin = rows.groupBy(r => bin(r._3))
      val t0 = rows.count(_._2 <= mid).toLong; val t1 = rows.size - t0
      val psiq = byBin.values.map { g =>
        val n0 = g.count(_._2 <= mid); val n1 = g.size - n0
        val p = (n0 + 0.5) / (t0 + 0.5 * nBins)
        val q = (n1 + 0.5) / (t1 + 0.5 * nBins)
        math.floor((p - q) * math.log(p / q) * 1000000d + 0.5d).toLong
      }.sum
      (series, t0, t1, math.floor(psiq / 1000000d * 10000d + 0.5d) / 10000d)
    }.toSet
    val got = d.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("mad outliers: no flags from constant (mad=0) windows, |z| > thr") {
    val m = Intervals.madOutliers(spark, Sf01).cache()
    assert(m.filter(abs(col("robust_z")) < 3.0 - 1e-4).count() === 0)
  }

  test("latest row keeps exactly one row per user") {
    val lr = Relational.latestRow(spark, Sf01).cache()
    val users = graft.util.Tables.events(spark, Sf01).select("user_id").distinct().count()
    assert(lr.count() === users)
    assert(lr.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
  }

  test("retention: offset-0 cell covers every user in the cohort") {
    val r = Events.retention(spark, Sf01).cache()
    val atZero = r.filter(col("week_offset") === 0)
      .agg(sum("n_users")).head.getLong(0)
    val users = graft.util.Tables.events(spark, Sf01).select("user_id").distinct().count()
    assert(atZero === users, "every user is active in their cohort week")
  }

  test("approx distinct stays within the 5% gate") {
    val d = Events.approxDistinct(spark, Sf01).cache()
    assert(d.count() === 4)
    assert(d.filter(col("approx_ok") === 0).count() === 0)
  }

  test("horizon backtest: one row per (series, horizon), rmse >= mae > 0") {
    val b = Forecast.horizonBacktest(spark, Sf01).cache()
    val series = graft.timeseries.TsCore.hourlyGrid(spark, Sf01)
      .select("series").distinct().count()
    assert(b.count() === series * 4)
    assert(b.filter(col("mae") <= 0 || col("rmse") < col("mae")).count() === 0)
  }

  test("qm6 modal coverage: fully paired test corpus audits clean; orphans surface") {
    val c = graft.multimodal.BinaryMeta.modalCoverage(spark, Sf01).cache()
    // the test tables are fully paired with 64-dim embeddings — every
    // counter must read zero and every modality complete
    assert(c.agg(org.apache.spark.sql.functions.sum("n_items")).head.getLong(0) === 500L)
    assert(c.filter(col("n_missing_embedding") =!= 0 || col("n_missing_payload") =!= 0 ||
      col("n_dim_mismatch") =!= 0 || col("pct_complete") =!= 1.0).count() === 0)
    assert(c.filter(col("media_type") === "(embedding_only)").count() === 0)
    c.unpersist()
  }

  test("qt20 mix weights: normalized, and alpha-sampling upsamples the tail") {
    val w = graft.text.TextOps.mixWeights(spark, Sf01).cache()
    val rows = w.collect().map(r => (r.getAs[Double]("p_nat"),
      r.getAs[Double]("w_mix"), r.getAs[Double]("oversample")))
    assert(rows.length === 20)
    // weights normalize (up to the 1e-4 output grid over 20 rows)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 20 * 1e-4)
    // α < 1 flattens: the smallest natural share is upsampled strictly
    // more than the largest
    val byShare = rows.sortBy(_._1)
    assert(byShare.head._3 > byShare.last._3)
    assert(byShare.head._3 > 1.0 || byShare.head._1 >= 1.0 / 20)
    w.unpersist()
  }

  test("frame sampling emits at most k bounded frames per doc") {
    val f = graft.multimodal.BinaryMeta.frameSample(spark, Sf01).cache()
    assert(f.count() > 0)
    assert(f.groupBy("doc_id").count().filter(col("count") > 4).count() === 0)
    assert(f.filter(col("n_bytes") > 256 || col("n_bytes") <= 0).count() === 0)
  }

  test("qm9: real ImageIO decode round-trips exactly and shares the stub's featurize chain") {
    import graft.multimodal.BinaryMeta
    // the seam contract, proven on the REAL codec: synth PNG → ImageIO
    // decode recovers the exact padded pixel plane, so qm9's features
    // equal the SHARED moment kernel applied to that plane directly —
    // stub and real decoder differ ONLY at the decode call
    val side = 16
    val payloads = Seq(
      "hello multimodal world".getBytes("UTF-8"),
      Array.tabulate(300)(i => (i % 251).toByte),
      Array[Byte](0, -1, 127, -128),
      Array.empty[Byte])
    for (p <- payloads) {
      val png = BinaryMeta.encodeGrayPng(p, side)
      // a genuine PNG came out of the writer
      assert(png.take(4).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47))
      val (w, h, pixels) = BinaryMeta.imageioGray(png).get
      val expH = math.max(1, (p.length + side - 1) / side)
      assert(w === side && h === expH)
      val padded = p.padTo(side * expH, 0.toByte)
      assert(pixels.toSeq === padded.toSeq, "gray PNG round-trip must be sample-exact")
      // downstream chain unchanged: the shared kernel on the decoded
      // plane IS the stub kernel on the padded payload
      assert(BinaryMeta.momentFeatures(7L, pixels) === BinaryMeta.momentFeatures(7L, padded))
    }
    // an undecodable payload surfaces as None, not garbage
    assert(BinaryMeta.imageioGray("not a png".getBytes("UTF-8")).isEmpty)
    // the registered query runs the real decoder distributed
    val f = BinaryMeta.imageioFeatures(spark, Sf01).cache()
    assert(f.count() > 0)
    assert(f.filter(col("width") =!= side || col("n_pixels") =!= col("width") * col("height")).count() === 0)
    f.unpersist()
  }

  test("qm10 resize: planted plane buckets exactly; corpus invariants hold") {
    import graft.multimodal.BinaryMeta
    // bytes 0..9 at r=4: bucket(p) = p*4/10 -> [0,0,0, 1,1, 2,2,2, 3,3]
    val planted = BinaryMeta.resizePlane(1L, (0 until 10).map(_.toByte).toArray, 4)
      .map(b => (b.bucket, b.n_bytes, b.byte_sum, b.mean_byte)).toSet
    assert(planted === Set((0, 3L, 3L, 1L), (1, 2L, 7L, 3L),
      (2, 3L, 18L, 6L), (3, 2L, 17L, 8L)))
    // short plane: L < r leaves empty buckets absent, every byte kept
    val short = BinaryMeta.resizePlane(2L, Array[Byte](100, 50), 4)
    assert(short.map(_.n_bytes).sum === 2L && short.forall(_.n_bytes === 1L))
    assert(BinaryMeta.resizePlane(3L, Array.empty[Byte], 4).isEmpty)
    // corpus: buckets in range, byte conservation vs the payload length
    val r = BinaryMeta.resizePlanes(spark, Sf001).cache()
    assert(r.count() > 0)
    assert(r.filter(col("bucket") < 0 || col("bucket") >= 16).count() === 0)
    assert(r.filter(col("mean_byte") < 0 || col("mean_byte") > 255).count() === 0)
    val tot = r.groupBy("doc_id").agg(sum("n_bytes").as("nb"))
    val lens = graft.util.Tables.documents(spark, Sf001)
      .select(col("doc_id"), // octet length: zh docs are multi-byte UTF-8
        length(encode(col("text"), "UTF-8")).cast("long").as("len"))
    assert(tot.join(lens, "doc_id").filter(col("nb") =!= col("len")).count() === 0,
      "every payload byte lands in exactly one bucket")
    r.unpersist()
  }

  test("cleaning impact: imputed series forecasts better than contaminated (the reference's headline claim)") {
    val ci = Forecast.cleaningImpact(spark, Sf01).cache()
    val wide = ci.groupBy("series")
      .pivot("variant", Seq("cleaned", "contam")).agg(first("mae"))
    assert(wide.filter(col("cleaned") >= col("contam")).count() === 0,
      "anomaly imputation must reduce forecast error on every series")
  }

  test("tfidf: rare tokens outrank common ones within a doc") {
    val t = graft.text.TextOps.tfidf(spark, Sf01).cache()
    assert(t.count() > 0)
    assert(t.filter(col("rnk") > 5).count() === 0)
  }
}
