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

  test("frame sampling emits at most k bounded frames per doc") {
    val f = graft.multimodal.BinaryMeta.frameSample(spark, Sf01).cache()
    assert(f.count() > 0)
    assert(f.groupBy("doc_id").count().filter(col("count") > 4).count() === 0)
    assert(f.filter(col("n_bytes") > 256 || col("n_bytes") <= 0).count() === 0)
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
