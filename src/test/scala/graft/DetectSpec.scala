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

  test("lof weights hover around 1 for inliers") {
    val l = Detect.lofWeight(spark, Sf01).cache()
    assert(l.count() > 0)
    val med = l.agg(expr("percentile(lof, 0.5)")).head.getDouble(0)
    assert(med > 0.8 && med < 1.5, s"median LOF $med")
  }

  test("capped LOF approximates uncapped and bounds the reference set") {
    val full = Detect.lofWeight(spark, Sf01)
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

  test("pipeline flags roughly the contamination share of windows") {
    val p = Detect.pipeline(spark, Sf01).cache()
    val n = p.count()
    val flagged = p.filter(col("pred") === 1).count()
    assert(n > 0 && flagged > 0 && flagged < n)
  }

  test("detection has signal: auroc above chance") {
    val a = Metrics.auroc(spark, Sf01).head()
    val auroc = a.getDouble(a.fieldIndex("auroc"))
    assert(auroc > 0.5, s"auroc $auroc should beat chance on injected anomalies")
  }
}
