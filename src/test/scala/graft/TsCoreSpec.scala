package graft

import org.apache.spark.sql.functions._
import graft.timeseries._

class TsCoreSpec extends SparkSuite {

  test("hourly grid regularizes events with positive counts") {
    val g = TsCore.hourlyGrid(spark, Sf001).cache()
    assert(g.count() > 0)
    assert(g.filter(col("n") <= 0).count() === 0)
    assert(g.filter(col("t") < 0).count() === 0)
    // 5 event types = 5 series
    assert(g.select("series").distinct().count() === 5)
  }

  test("fill repairs some gaps via weekly lag") {
    val f = TsCore.filled(spark, Sf01).cache()
    val bySrc = f.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("obs", 0L) > 0)
    assert(bySrc.getOrElse("lag", 0L) > 0, "expected some lag-filled points at sf0.01")
  }

  test("week-walk fill repairs a first-week gap from the NEXT week (and prefers nearest prev)") {
    import spark.implicits._
    // phase 5 of week 0 missing → only later weeks can fill it;
    // phase 6 missing in weeks 1 and 2 → filled from week 0 (lag), not week 3
    val wl = TsCore.WeekLag
    val rows = (0L until 4L * wl).map { t =>
      val v: Option[Double] =
        if (t == 5L) None
        else if (t % wl == 6L && (t / wl == 1L || t / wl == 2L)) None
        else Some((t % wl).toDouble + 100.0 * (t / wl))
      ("s1", t, v)
    }
    val f = TsCore.fillWeekWalk(rows.toDF("series", "t", "v")).cache()
    val firstGap = f.filter(col("t") === 5L).head()
    assert(firstGap.getString(3) === "lead", "first-week gap must fill forward")
    assert(firstGap.getDouble(2) === 5.0 + 100.0, "from week 1, same hour-of-week")
    val midGap = f.filter(col("t") === wl + 6L).head()
    assert(midGap.getString(3) === "lag")
    assert(midGap.getDouble(2) === 6.0, "nearest PREVIOUS week wins over next")
    assert(f.filter(col("src") === "missing").count() === 0)
  }

  test("day windows are complete and correctly indexed") {
    val d = TsCore.dayWindows(spark, Sf01).cache()
    val sizes = d.groupBy("series", "win").count().select("count").distinct().collect()
    assert(sizes.map(_.getLong(0)).toSet === Set(TsCore.DaySize.toLong))
    assert(d.filter(col("pos") < 0 || col("pos") >= TsCore.DaySize).count() === 0)
  }

  test("anomaly injection conserves flags within parameter bounds") {
    val inj = TsCore.injected(spark, Sf01).cache()
    val flagged = inj.filter(col("is_anom") === 1)
    assert(flagged.count() > 0)
    // anomalies only placed in pos >= n/4 (reference randint lower bound)
    assert(flagged.filter(col("pos") < TsCore.DaySize / 4).count() === 0)
    // uncontaminated windows are untouched
    val diff = inj.filter(col("is_anom") === 0 && col("v_orig") =!= col("v_anom"))
    // only type-1/2 middles inside flagged spans differ; outside flags must match
    val wins = TsCore.injectParams(spark, Sf01).filter(!col("contam"))
      .select("series", "win")
    assert(diff.join(wins, Seq("series", "win")).count() === 0)
  }

  test("ewma closed form equals recursive definition") {
    val f = TsCore.features(spark, Sf01)
      .filter(col("series") === "click" && col("win") === 1)
      .orderBy("pos").select("vs", "ewma").collect()
    assert(f.nonEmpty)
    var m = f(0).getDouble(0) // m_0 = x_0
    val a = TsCore.Alpha
    f.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) m = a * r.getDouble(0) + (1 - a) * m
      assert(math.abs(r.getDouble(1) - m) < 1e-3, s"pos $i: ${r.getDouble(1)} vs $m")
    }
  }

  test("patch std matches manual computation per 8-patch") {
    val anyWin = TsCore.dayWindows(spark, Sf01).select("series", "win")
      .filter(col("series") === "click").agg(max("win")).head.getLong(0)
    val f = TsCore.features(spark, Sf01)
      .filter(col("series") === "click" && col("win") === anyWin)
      .orderBy("pos").select("vs", "pstd").collect()
    assert(f.length === TsCore.DaySize)
    val vs = f.map(_.getDouble(0))
    for (p <- 0 until TsCore.DaySize / TsCore.FeatPatch) {
      val seg = vs.slice(p * 8, p * 8 + 8)
      val mu = seg.sum / 8
      val sd = math.sqrt(seg.map(x => (x - mu) * (x - mu)).sum / 7)
      assert(math.abs(f(p * 8).getDouble(1) - sd) < 1e-3)
    }
  }

  test("quantile scaling maps bulk of values into [0,1]") {
    val s = TsQueries.q04QuantileScale(spark, Sf01).cache()
    val n = s.count()
    val inRange = s.filter(col("vs") >= -0.001 && col("vs") <= 1.001).count()
    assert(inRange.toDouble / n > 0.97)
  }

  test("q43 calendar filter drops blocked day ranges and data-derived empty days") {
    import spark.implicits._
    // series A: days 0-3 observed; day 2 fully week-walk-filled (no obs).
    // series B: all 4 days observed.
    val filled = (0L until 4 * 24L).flatMap { t =>
      val d = t / 24
      Seq(("A", t, 1.0, if (d == 2) "lag" else "obs"),
          ("B", t, 2.0, "obs"))
    }.toDF("series", "t", "v_filled", "src")
    // block day 0 only
    val kept = graft.timeseries.TsQueries
      .calendarFilterFrom(filled, Seq((0L, 1L)))
      .select("series", "t").as[(String, Long)].collect().toSet
    // day 0 gone for both; day 2 gone for A only (empty day); rest kept
    assert(!kept.exists(_._2 < 24), "blocked day 0 must be dropped for every series")
    assert(!kept.exists { case (s, t) => s == "A" && t / 24 == 2 },
      "A's unobserved day must be dropped")
    assert(kept.count { case (s, t) => s == "B" && t / 24 == 2 } === 24,
      "B's observed day 2 must survive")
    assert(kept.size === 24 * (3 + 2), "A keeps days 1,3; B keeps days 1,2,3")
  }
}
