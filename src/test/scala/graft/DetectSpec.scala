package graft

import org.apache.spark.sql.functions._
import graft.timeseries._

class DetectSpec extends SparkSuite {

  test("knn scores are nonnegative and cover all test windows") {
    val s = Detect.knnScore(spark, Sf01).cache()
    assert(s.count() > 0)
    assert(s.filter(col("score") < 0).count() === 0)
  }

  test("gaussian mahalanobis distances are nonnegative") {
    val g = Detect.gaussianScore(spark, Sf01).cache()
    assert(g.count() > 0)
    assert(g.filter(col("mdist") < 0).count() === 0)
  }

  test("gauss-jordan inverse: A·A⁻¹ = I on a random SPD matrix") {
    val rnd = new scala.util.Random(11)
    val b = Array.fill(9, 9)(rnd.nextDouble() - 0.5)
    // A = BᵀB + 0.01 I is SPD like the regularized covariance
    val a = Array.tabulate(9, 9) { (i, j) =>
      (0 until 9).map(k => b(k)(i) * b(k)(j)).sum + (if (i == j) 0.01 else 0.0)
    }
    val inv = Detect.invertGaussJordan(a)
    for (i <- 0 until 9; j <- 0 until 9) {
      val prod = (0 until 9).map(k => a(i)(k) * inv(k)(j)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(prod - expect) < 1e-8, s"($i,$j): $prod")
    }
  }

  test("lof weights hover around 1 for inliers") {
    val l = Detect.lofWeight(spark, Sf01).cache()
    assert(l.count() > 0)
    val med = l.agg(expr("percentile(lof, 0.5)")).head.getDouble(0)
    assert(med > 0.8 && med < 1.5, s"median LOF $med")
  }

  test("default (capped) LOF is bit-identical to exact LOF when maxRef >= n") {
    // the public default caps the reference set at 10000; the local bank
    // is far below that, so the default must EQUAL the uncapped oracle
    // path bit-for-bit
    val exact = Detect.lofWeightExact(spark, Sf01).withColumnRenamed("lof", "lof_exact")
    val default = Detect.lofWeight(spark, Sf01)
    val j = exact.join(default, Seq("id", "pos"))
    assert(j.count() === exact.count())
    assert(j.filter(col("lof") =!= col("lof_exact")).count() === 0,
      "capped(maxRef >= n) must be exactly the uncapped LOF")
  }

  test("default (capped) q12 nearest-dist is bit-identical to exact when maxRef >= n") {
    // q12's registered default caps the reference set like q11's; the
    // local bank is far below the cap, so it must EQUAL the uncapped
    // oracle path bit-for-bit
    val exact = Detect.nearestDistWeightExact(spark, Sf01)
      .withColumnRenamed("w_nearest", "w_exact")
    val default = Detect.nearestDistWeight(spark, Sf01)
    val j = exact.join(default, Seq("id", "pos"))
    assert(j.count() === exact.count())
    assert(j.filter(col("w_nearest") =!= col("w_exact")).count() === 0,
      "capped(maxRef >= n) must be exactly the uncapped nearest-dist weight")
  }

  test("packed graft_knn kernel is bit-identical to the pairwise window trim") {
    import org.apache.spark.sql.expressions.Window
    val (bank, _) = TsCore.bankAndTest(spark, Sf01)
    for ((k, eps, maxRef) <- Seq((6, 1e-6, 10000), (1, 0.0, 10000), (6, 1e-6, 40))) {
      // the reference implementation: materialize the full pair stream,
      // add eps, window-trim to k by (d, nid) — exactly what q11/q12
      // shipped before the kernel
      val pw = Detect.pairwiseRef(bank, maxRef).withColumn("d", col("d") + eps)
      val wN = Window.partitionBy("pos", "id").orderBy(col("d"), col("nid"))
      val want = pw.withColumn("rn", row_number().over(wN)).filter(col("rn") <= k)
        .select("pos", "id", "nid", "d")
      val got = Detect.knnRef(spark, bank, maxRef, k, eps)
      assert(got.count() === want.count(), s"(k=$k eps=$eps maxRef=$maxRef)")
      assert(got.except(want).count() === 0 && want.except(got).count() === 0,
        s"kernel k-NN stream diverged from the window trim (k=$k eps=$eps maxRef=$maxRef)")
    }
  }

  test("knnRef broadcast guard: past the byte ceiling it falls back, bit-identical") {
    // force the fallback with a 1-byte ceiling (ADVICE r13: a growing
    // position count must not silently exceed broadcast limits) — the
    // pairwise+trim plan must emit the exact kernel stream
    val (bank, _) = TsCore.bankAndTest(spark, Sf01)
    val kernel = Detect.knnRef(spark, bank, maxRef = 10000, k = 6, eps = 1e-6)
    val fb = Detect.knnRef(spark, bank, maxRef = 10000, k = 6, eps = 1e-6,
      maxBroadcastBytes = 1L)
    assert(fb.count() === kernel.count())
    assert(fb.except(kernel).count() === 0 && kernel.except(fb).count() === 0,
      "guard fallback diverged from the packed kernel")
  }

  test("graft_knn planted exact ties: equal distances break on UTF8 nid order") {
    import spark.implicits._
    // five candidates, four at IDENTICAL distance from the probe (same
    // feature row) — selection at k=3 must keep the lexicographically
    // smallest nids; also covers the k-boundary replace-on-tie branch.
    // Windows live in one position; series names chosen so UTF8 order
    // differs from arrival order.
    def row(series: String, v: Double) =
      (series, 1L, 0L, v, v, v, v, v, v, v, v, v)
    val bank = Seq(
      row("zz", 1.0), row("aa", 1.0), row("mm", 1.0), row("bb", 1.0),
      row("probe", 0.0)
    ).toDF("series", "win", "pos", "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7", "f8")
    val got = Detect.knnRef(spark, bank, maxRef = Int.MaxValue, k = 3, eps = 1e-6)
      .filter(col("id") === "probe#1")
      .orderBy("d", "nid").collect().map(r => r.getString(2))
    assert(got.toSeq === Seq("aa#1", "bb#1", "mm#1"),
      s"tie-break must keep the smallest nids: ${got.toSeq}")
    // and the window-trim reference implementation agrees exactly
    val pw = Detect.pairwiseRef(bank, Int.MaxValue).withColumn("d", col("d") + 1e-6)
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy("pos", "id").orderBy(col("d"), col("nid"))
    val want = pw.withColumn("rn", row_number().over(wN)).filter(col("rn") <= 3)
      .filter(col("id") === "probe#1")
      .orderBy("d", "nid").collect().map(r => r.getString(2))
    assert(want.toSeq === got.toSeq)
  }

  test("capped LOF approximates uncapped and bounds the reference set") {
    val full = Detect.lofWeightExact(spark, Sf01)
    val capped = Detect.lofWeightCapped(spark, Sf01, maxRef = 40)
    assert(capped.count() === full.count(), "every patch still scored under the cap")
    val joined = full.withColumnRenamed("lof", "lof_full")
      .join(capped, Seq("id", "pos"))
    val corrPairs = joined.agg(org.apache.spark.sql.functions.corr("lof_full", "lof"))
      .head.getDouble(0)
    assert(corrPairs > 0.5, s"capped LOF should track uncapped (corr=$corrPairs)")
  }

  test("greedy coreset picks spread-out points") {
    // 2 tight clusters + 1 outlier: k=2 must include the outlier
    val pts = Array(
      Array(0.0, 0.0), Array(0.01, 0.0), Array(0.0, 0.01),
      Array(10.0, 10.0))
    val sel = Coreset.greedy(pts, 2)
    assert(sel.length === 2)
    assert(sel.contains(3), s"outlier not selected: ${sel.mkString(",")}")
  }

  test("coreset operator returns ~10% of denoised bank") {
    val c = Coreset.coreset(spark, Sf01).cache()
    val n = c.count()
    assert(n > 0)
    val (bank, _) = TsCore.bankAndTest(spark, Sf01)
    val bn = bank.count()
    assert(n <= bn * 0.15 && n >= bn * 0.05, s"coreset $n of bank $bn")
  }

  test("JL-projected coreset preserves k-center structure (~2-approx coverage radius)") {
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    // sf0.01: sf0.001's spine has no complete day windows → empty bank
    val kept = Coreset.keptBank(spark, Sf01, 0.15).collect()
    val feats = kept.map(r => key(r) -> (0 until 9).map(i => r.getDouble(2 + i)).toArray).toMap
    def d(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // coverage radius of a selected set, measured in the ORIGINAL space
    def radius(sel: Set[(String, Long)]): Double = {
      val selF = sel.toArray.map(feats)
      feats.values.map(f => selF.map(s => d(f, s)).min).max
    }
    val exact = Coreset.coreset(spark, Sf01).collect().map(key).toSet
    val proj = Coreset.coresetProjected(spark, Sf01, projDim = 8).collect().map(key).toSet
    assert(proj.size === exact.size, "same coreset budget")
    val (r0, rp) = (radius(exact), radius(proj))
    // greedy in JL-projected space stays within the distortion bound of
    // the exact greedy's 2-approx coverage (small slack for the 9→8 map)
    assert(rp <= 2.5 * r0 + 1e-9, s"projected radius $rp vs exact $r0")
  }

  test("pipeline flags roughly the contamination share of windows") {
    val p = Detect.pipeline(spark, Sf01).cache()
    val n = p.count()
    val flagged = p.filter(col("pred") === 1).count()
    assert(n > 0 && flagged > 0 && flagged < n)
  }

  test("q50 anomaly mask == driver composition of q29 ∪ q14 ∪ extended q15") {
    import graft.timeseries.Postprocess
    type K = (String, Long)
    val top = Postprocess.highestPatchFlags(spark, Sf01).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    val wins = top.keySet
    val consec = Postprocess.consecRuns(spark, Sf01).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .filter(t => wins(t._1)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    val spikes = Postprocess.zscoreOutliers(spark, Sf01).collect()
      .filter(_.getInt(4) == 1)
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .filter(t => wins(t._1)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    val want = wins.flatMap { k =>
      val t = top.getOrElse(k, Set.empty[Long])
      val c = consec.getOrElse(k, Set.empty[Long])
      val ext = spikes.getOrElse(k, Set.empty[Long]).diff(t ++ c)
        .flatMap(p => (math.max(0L, p - 4) to math.min(p + 4, 22L)))
      (0L until 24L).map { pos =>
        (k._1, k._2, pos, if (t(pos)) 1 else 0, if (c(pos)) 1 else 0,
          if (ext(pos)) 1 else 0,
          if (t(pos) || c(pos) || ext(pos)) 1 else 0)
      }
    }.toSet
    val got = Postprocess.anomalyMask(spark, Sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6))).toSet
    assert(got === want)
    // every mask row belongs to a scored window; some masks have signal
    assert(got.exists(_._7 == 1) && got.forall(g => wins((g._1, g._2))))
  }

  test("q51 point adjust == driver recompute; adjusted recall >= raw recall") {
    import graft.timeseries.{Metrics, Postprocess, TsCore}
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val flags = Postprocess.zscoreOutliers(spark, Sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getInt(4)).toMap
    val pts = TsCore.scaled(spark, Sf01).select("series", "win", "pos", "is_anom").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val want = pts.groupBy(_._1).map { case (s, g) =>
      val anom = g.filter(_._4 == 1)
      // segments: consecutive pos runs per window
      val segs = anom.groupBy(_._2).toSeq.flatMap { case (w, ps) =>
        val sorted = ps.map(_._3).sorted
        sorted.zipWithIndex.groupBy { case (p, i) => p - i }.values
          .map(run => (w, run.map(_._1).toSet))
      }
      val tp = segs.map { case (w, poss) =>
        val hit = poss.exists(p => flags((s, w, p)) == 1)
        if (hit) poss.size.toLong
        else poss.count(p => flags((s, w, p)) == 1).toLong
      }.sum
      val nTrue = anom.length.toLong
      val fp = g.filter(_._4 == 0).count(t => flags((t._1, t._2, t._3)) == 1).toLong
      val fn = nTrue - tp
      s -> (tp, fn, fp,
        if (tp + fp > 0) r4(tp.toDouble / (tp + fp)) else null,
        if (tp + fn > 0) r4(tp.toDouble / (tp + fn)) else null,
        if (tp * 2 + fp + fn > 0) r4(tp * 2.0 / (tp * 2 + fp + fn)) else null)
    }
    val got = Metrics.pointAdjust(spark, Sf01).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5),
        if (r.isNullAt(6)) null else r.getDouble(6))).toMap
    assert(got.keySet === want.keySet)
    for ((s, v) <- want) assert(got(s) === v, s"series $s")
    // adjustment only adds true-positives: recall >= the raw point recall
    for ((s, g) <- pts.groupBy(_._1)) {
      val anom = g.filter(_._4 == 1)
      if (anom.nonEmpty) {
        val rawTp = anom.count(t => flags((t._1, t._2, t._3)) == 1)
        val rawRecall = rawTp.toDouble / anom.length
        assert(got(s)._5.asInstanceOf[Double] >= r4(rawRecall) - 1e-9, s"series $s")
      }
    }
  }

  test("detection has signal: auroc above chance") {
    val a = Metrics.auroc(spark, Sf01).head()
    val auroc = a.getDouble(a.fieldIndex("auroc"))
    assert(auroc > 0.5, s"auroc $auroc should beat chance on injected anomalies")
  }
}
