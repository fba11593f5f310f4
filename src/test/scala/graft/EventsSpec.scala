package graft

import org.apache.spark.sql.functions._
import graft.analytics.Events

class EventsSpec extends SparkSuite {

  test("sessions have nonnegative durations and consecutive ids per user") {
    val s = Events.sessionize(spark, Sf001).cache()
    assert(s.count() > 0)
    assert(s.filter(col("duration_s") < 0).count() === 0)
    val maxVsCount = s.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
    assert(maxVsCount.filter(col("mx") =!= col("n")).count() === 0,
      "session ids must be 1..n per user")
  }

  test("funnel stage counts are monotonically non-increasing") {
    val f = Events.funnel(spark, Sf001).orderBy("stage").collect()
    assert(f.length === 4)
    val ns = f.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a }, ns.mkString(","))
    assert(ns.head > 0)
  }

  test("profile covers every requested column with sane bounds") {
    val p = Events.profile(spark, Sf001).cache()
    assert(p.count() === 4)
    assert(p.filter(col("min_v") > col("max_v")).count() === 0)
    assert(p.filter(col("n_distinct") <= 0).count() === 0)
  }

  test("qe5 window funnel matches a driver recompute of earliest chains") {
    val stages = Seq("signup", "view", "click", "purchase")
    val windowSec = 172800L
    val raw = spark.read.parquet(s"$Sf001/events.parquet")
    val evs = raw.select(col("user_id"), col("event_type"),
        graft.util.Ts.sec(raw).as("tsec"))
      .filter(col("event_type").isin(stages: _*))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).values.map { uevs =>
      // earliest chain: t_i = first stage-i time strictly after t_{i-1}
      val ts = stages.scanLeft(Option(Long.MinValue)) { (prev, st) =>
        prev.flatMap(p => uevs.filter(e => e._2 == st && e._3 > p)
          .map(_._3).sorted.headOption)
      }.tail
      val t0 = ts.head
      ts.zipWithIndex.reverse.collectFirst {
        case (Some(t), i) if t - t0.get <= windowSec => i + 1
      }.getOrElse(0)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Events.windowFunnel(spark, Sf001, stages, windowSec)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("qa14 incremental merge equals the single-pass aggregate bit-exactly") {
    import graft.analytics.Relational
    val merged = Relational.incrementalAgg(spark, Sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val li = spark.read.parquet(s"$Sf01/lineitem.parquet")
    val single = li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("l_quantity") * 10000d + 0.5d).cast("long")) / 10000d).as("sq"),
        (sum(floor((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 10000d + 0.5d)
          .cast("long")) / 10000d).as("sp"))
      .withColumn("aq", floor(col("sq") / col("n") * 10000d + 0.5d) / 10000d)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(merged === single) // == on doubles: the merge must be BIT-identical
  }

  test("qe12 survival == driver Kaplan-Meier recompute; curve monotone non-increasing from 1") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val evRaw = spark.read.parquet(s"$Sf001/events.parquet")
    val ev = evRaw
      .select(col("user_id"), col("event_type"), graft.util.Ts.sec(evRaw).as("tsec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tmax = ev.map(_._3).max
    val gaps = ev.filter(_._2 == "signup").groupBy(_._1).toSeq.map { case (u, g) =>
      val s0 = g.map(_._3).min
      val p0 = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= s0)
        .map(_._3).minOption
      (p0.map(p => (p - s0) / 86400).getOrElse((tmax - s0) / 86400), p0.isDefined)
    }
    val byDay = gaps.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) =>
      (d, g.count(_._2).toLong, g.count(!_._2).toLong)
    }
    var atRisk = gaps.length.toLong
    var lsum = 0L
    var dead = false
    val want = byDay.map { case (d, conv, cens) =>
      if (conv > 0 && conv < atRisk)
        lsum += math.floor(math.log(1.0 - conv.toDouble / atRisk) * 1000000d + 0.5d).toLong
      if (conv == atRisk) dead = true
      val s = if (dead) 0.0 else r4(math.exp(lsum / 1000000.0))
      val row = (d, atRisk, conv, cens, s)
      atRisk -= conv + cens
      row
    }.toSet
    val got = graft.analytics.Events.survival(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got === want)
    val curve = got.toSeq.sortBy(_._1).map(_._5)
    assert(curve.head <= 1.0 + 1e-9)
    curve.zip(curve.drop(1)).foreach { case (a, b) => assert(b <= a + 1e-9) }
  }

  test("qe11 cohort ltv: cumulative curves monotone, totals conserve, cohorts partition users") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Events.cohortLtv(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    for ((_, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._2)
      // cum_revenue is the running sum of revenue, so it never decreases
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(b._6 >= a._6 - 1e-9, s"cum must be monotone: $a -> $b") }
      assert(sorted.forall(r => r._4 <= r._3), "active purchasers bounded by cohort size")
    }
    val evRaw = spark.read.parquet(s"$Sf001/events.parquet")
    val ev = evRaw
      .select(col("user_id"), col("event_type"), graft.util.Ts.sec(evRaw).as("tsec"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // cohort sizes partition the user base
    assert(rows.groupBy(_._1).map(_._2.head._3).sum === ev.map(_._1).distinct.length.toLong)
    // total revenue across cells == total purchase revenue (quantized)
    val totalRev = r4(ev.filter(_._2 == "purchase")
      .map(e => math.floor(e._4 * 10000 + 0.5).toLong).sum / 10000.0)
    assert(r4(rows.map(r => math.floor(r._5 * 10000 + 0.5).toLong).sum / 10000.0) === totalRev)
  }

  test("qp10 quality audit: clean tables prove clean, zero/neg counters match recompute") {
    val got = graft.analytics.Events.qualityAudit(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got.size === 6)
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet").select("l_discount").collect().map(_.getDouble(0))
    val (n, nz, nn) = (li.length.toLong, li.count(_ == 0.0).toLong, li.count(_ < 0.0).toLong)
    assert(got(("lineitem", "l_discount")) === ((n, 0L, 0L, 0L, nz, nn)))
    // synthetic tables are clean: no NULL/NaN/Inf anywhere
    assert(got.values.forall(v => v._2 == 0 && v._3 == 0 && v._4 == 0))
  }

  test("qa17 grouping sets: exact lattice — the chosen sets and nothing else; SQL plan expands once") {
    import graft.analytics.Relational
    val df = Relational.groupingSets(spark, Sf001)
    // the SQL front door must compile to the same Expand + partial-agg
    // shape the DataFrame rollup/cube get
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Expand") && p.contains("partial_"),
      s"grouping sets must Expand with map-side partials:\n${p.take(1200)}")
    val rows = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * (1.0 - r.getDouble(3)) * 10000 + 0.5).toLong))
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    def agg(g: Seq[(String, String, Long)]) = (r4(g.map(_._3).sum / 10000.0), g.length.toLong)
    val fine = li.groupBy(t => (t._1, t._2)).map { case (k, g) => k -> agg(g.toSeq) }
    val byRf = li.groupBy(_._1).map { case (k, g) => (k, "ALL") -> agg(g.toSeq) }
    val total = Map(("ALL", "ALL") -> agg(li.toSeq))
    assert(rows === fine ++ byRf ++ total) // no (ls)-only stratum — GROUPING SETS, not CUBE
  }

  test("qp9 histogram == driver recompute; counts conserve; no per-row explode shuffle") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val df = graft.analytics.Events.histProfile(spark, Sf001)
    // the corpus never shuffles row-wise: the only exchanges feed
    // single-row aggregates (stats pass + counts pass)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"qp9 must not shuffle the corpus:\n${p.take(1200)}")
    val got = df.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet")
      .select(cols.map(col): _*).collect()
    val want = cols.zipWithIndex.flatMap { case (c, ci) =>
      val vs = li.map(_.getDouble(ci))
      val (mn, mx) = (vs.min, vs.max)
      vs.groupBy { v =>
        if (mx == mn) 0 else math.min(math.floor((v - mn) / (mx - mn) * 16).toInt, 15)
      }.map { case (b, g) =>
        (c, b) -> (r4(mn + (mx - mn) * b / 16), r4(mn + (mx - mn) * (b + 1) / 16), g.length.toLong)
      }
    }.toMap
    assert(got === want)
    assert(got.toSeq.map { case ((c, _), (_, _, n)) => (c, n) }
      .groupBy(_._1).forall(_._2.map(_._2).sum == li.length))
  }

  test("qe10 attribution == driver last-touch recompute") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val got = graft.analytics.Events.attribution(spark, Sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    val evRaw = spark.read.parquet(s"$Sf001/events.parquet")
    val ev = evRaw
      .select(col("event_id"), col("user_id"), col("event_type"),
        graft.util.Ts.sec(evRaw).as("tsec"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val touches = ev.filter(e => Set("click", "view", "signup")(e._3))
      .groupBy(e => (e._2, e._4)).map { case (_, g) => g.maxBy(_._1) }.toSeq
    val byUser = touches.groupBy(_._2)
    val rows = ev.filter(_._3 == "purchase").map { p =>
      val prior = byUser.getOrElse(p._2, Seq()).filter(t => t._4 < p._4)
      val lt = if (prior.isEmpty) None else Some(prior.maxBy(t => (t._4, t._1)))
      lt match {
        case Some(t) if p._4 - t._4 <= 3600 => (t._3, p._5, Some(p._4 - t._4))
        case _ => ("direct", p._5, None)
      }
    }
    val want = rows.groupBy(_._1).map { case (ch, g) =>
      val gaps = g.flatMap(_._3)
      ch -> (g.length.toLong,
        r4(g.map(r => math.floor(r._2 * 10000 + 0.5).toLong).sum / 10000.0).asInstanceOf[Any],
        (if (gaps.isEmpty) null else r4(gaps.map(_.toDouble).sum / g.length)).asInstanceOf[Any])
    }
    assert(got.keySet === want.keySet)
    for ((k, v) <- want) assert(got(k) === v, s"channel $k")
  }

  test("qa16 merge upsert: every MERGE branch exercised, keys partition correctly") {
    import graft.analytics.Relational
    val out = Relational.mergeUpsert(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3), r.getString(4)))
    val keys = spark.read.parquet(s"$Sf001/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val byKey = out.map(t => t._1 -> t).toMap
    assert(out.length === byKey.size, "merge output must be key-unique")
    for ((k, price) <- keys) {
      val inBase = k % 7 != 0; val inDelta = k % 3 == 0; val isDel = k % 9 == 0
      (inBase, inDelta, isDel) match {
        case (_, true, true) => assert(!byKey.contains(k), s"deleted key $k survived")
        case (true, true, false) =>
          val r = byKey(k); assert(r._5 === "update" && r._4 === "R" && r._3 === r4(price * 1.05))
        case (false, true, false) =>
          val r = byKey(k); assert(r._5 === "insert" && r._3 === r4(price * 1.05))
        case (true, false, _) => assert(byKey(k)._5 === "keep" && byKey(k)._3 === r4(price))
        case (false, false, _) => assert(!byKey.contains(k))
      }
    }
    assert(Set("insert", "update", "keep").subsetOf(out.map(_._5).toSet))
  }

  test("qp5 skew profile == driver recompute; top-N is TakeOrdered, not a global sort") {
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val df = Events.skewProfile(spark, Sf001)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "global top-N must plan as per-partition top-N + driver merge")
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val counts = spark.read.parquet(s"$Sf001/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val expected = counts.sortBy { case (id, c) => (-c, id) }.take(10).map { case (id, c) =>
      (id, c, r4(c.toDouble / total), r4(c.toDouble * counts.length / total))
    }
    assert(out.toSeq === expected.toSeq)
  }

  test("qa15 z-order cells: row total preserved; every cell spans ≤ 2^(bits - cellShift/2) buckets per key") {
    val cells = graft.analytics.Relational.zorderLayout(spark, Sf001).collect()
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cells.map(_.getLong(1)).sum === li.length)
    // within a cell the top 6 of each key's 10 bucket bits are fixed, so
    // the cell covers at most 2^4 = 16 buckets of EITHER key — the
    // locality property that makes per-file min/max stats prune both
    // predicate columns
    val (pmin, pmax) = (li.map(_._1).min, li.map(_._1).max)
    val (smin, smax) = (li.map(_._2).min, li.map(_._2).max)
    def pb(k: Long) = (k - pmin) * 1024 / (pmax - pmin + 1)
    def sb(k: Long) = (k - smin) * 1024 / (smax - smin + 1)
    cells.foreach { r =>
      assert(pb(r.getLong(3)) - pb(r.getLong(2)) <= 15, s"cell ${r.getLong(0)} partkey span")
      assert(sb(r.getLong(5)) - sb(r.getLong(4)) <= 15, s"cell ${r.getLong(0)} suppkey span")
    }
  }

  test("qe7 topPaths: pathLen=1 degenerates to first-event counts; top-N ordered") {
    val ev = spark.read.parquet(s"$Sf001/events.parquet")
    // pathLen=1: each user's path is just their first event type, so the
    // rollup must equal a first-event-per-user count computed independently
    val got = Events.topPaths(spark, Sf001, pathLen = 1, topN = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(graft.util.Ts.sec(ev), col("event_id"))
    val want = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // default run: descending counts, ≤ topN rows, paths have 3 segments
    val top = Events.topPaths(spark, Sf001).collect()
    assert(top.length <= 10)
    assert(top.map(_.getLong(1)).toSeq === top.map(_.getLong(1)).sortBy(-_).toSeq)
    top.foreach(r => assert(r.getString(0).split(">", -1).length === 3, r.getString(0)))
  }

  test("qp8 correlation matrix matches a driver recompute, |corr| <= 1") {
    import org.apache.spark.sql.functions._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = graft.util.Tables.lineitem(spark, Sf001)
      .select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i => r.getDouble(i)).toArray)
    val n = rows.length
    val scales = Array(1.0, 0.001, 100.0, 100.0)
    val means = cols.indices.map(i =>
      rows.map(r => math.floor(r(i) * 10000d + 0.5d).toLong).sum / 10000d / n)
    def cs(i: Int, j: Int): Long =
      rows.map { r =>
        val ci = (r(i) - means(i)) * scales(i); val cj = (r(j) - means(j)) * scales(j)
        math.floor(ci * cj * 10000d + 0.5d).toLong
      }.sum
    val expected = cols.indices.combinations(2).map { case Seq(i, j) =>
      (cols(i), cols(j), n.toLong,
        math.floor(cs(i, j) / math.sqrt(cs(i, i).toDouble * cs(j, j).toDouble) * 10000d + 0.5d) / 10000d)
    }.toSet
    val got = graft.analytics.Events.corrMatrix(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
    // the synthetic columns are near-independent — the check is the
    // exact recompute above plus the Cauchy-Schwarz bound here
    assert(got.forall { case (_, _, _, c) => c >= -1.0001 && c <= 1.0001 })
  }

  test("qe9 rfm: scores match a driver quantile recompute, cells well-formed") {
    import org.apache.spark.sql.functions._
    val out = graft.analytics.Events.rfm(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))
    def qcont(sorted: Array[Double], q: Double): Double = {
      val r = (sorted.length - 1) * q
      val (lo, hi) = (math.floor(r).toInt, math.ceil(r).toInt)
      if (lo == hi) sorted(lo) else (1.0 - (r - lo)) * sorted(lo) + (r - lo) * sorted(hi)
    }
    def bucket(v: Double, bs: Seq[Double]) = 1 + bs.count(v > _)
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    val rb = qs.map(qcont(out.map(_._2.toDouble).sorted, _))
    val fb = qs.map(qcont(out.map(_._3.toDouble).sorted, _))
    val mb = qs.map(qcont(out.map(r => math.floor(r._4 * 10000d + 0.5d)).sorted, _))
    for ((_, rd, fr, mon, rs, fs, ms, cell) <- out) {
      assert(rs === 6 - bucket(rd.toDouble, rb))
      assert(fs === bucket(fr.toDouble, fb))
      assert(ms === bucket(math.floor(mon * 10000d + 0.5d), mb))
      assert(cell === rs * 100 + fs * 10 + ms && rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
    }
    // quintile boundaries must segment: every monetary score level appears
    assert((1 to 5).forall(s => out.exists(_._7 == s)))
  }

  test("qe8 scd2: one current row per user, intervals chain without gaps") {
    import org.apache.spark.sql.functions._
    val s = graft.analytics.Events.scd2(spark, Sf01).cache()
    val ev = graft.util.Tables.events(spark, Sf01)
    // every event becomes exactly one interval row
    assert(s.count() === ev.count())
    // exactly one open (current) interval per user
    val cur = s.filter(col("is_current") === 1).groupBy("user_id").count()
    assert(cur.filter(col("count") =!= 1).count() === 0)
    assert(cur.count() === ev.select("user_id").distinct().count())
    // closed intervals never run backwards, and each valid_to equals the
    // next interval's valid_from (the chain has no gaps or overlaps)
    assert(s.filter(col("valid_to") < col("valid_from")).count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from", "event_id")
    assert(s.withColumn("nxt", lead("valid_from", 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("nxt"))
      .count() === 0)
  }

  test("qe13 audience overlap == driver set recompute") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val got = Events.audienceOverlap(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val ev = spark.read.parquet(s"$Sf001/events.parquet")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ev.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val types = byType.keys.toSeq.sorted
    val pairs = for { a <- types; b <- types if a < b } yield (a, b)
    assert(got.keySet === pairs.toSet)
    for ((a, b) <- pairs) {
      val (sa, sb) = (byType(a), byType(b))
      val both = (sa & sb).size.toLong
      val either = (sa | sb).size.toLong
      assert(got((a, b)) === ((sa.size.toLong, sb.size.toLong, both, either,
        r4(both.toDouble / either))), s"$a/$b")
    }
  }

  test("qe6 transitions: totals == per-user event counts − 1; probabilities sum to 1") {
    val t = Events.transitions(spark, Sf001).cache()
    val ev = spark.read.parquet(s"$Sf001/events.parquet")
    // each user with k events contributes exactly k−1 transitions
    val expected = ev.groupBy("user_id").count()
      .agg(sum(col("count") - 1)).head.getLong(0)
    assert(t.agg(sum("n")).head.getLong(0) === expected)
    // per-src probabilities sum to 1 up to the 1e-4 quantization
    t.groupBy("src").agg(sum("p").as("sp")).collect()
      .foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-3, r.getString(0)))
  }

  test("qe14 dau/mau == driver rolling-distinct recompute; bounds hold") {
    val out = Events.dauMau(spark, Sf01).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.nonEmpty)
    val raw = graft.util.Tables.events(spark, Sf01)
    val pairs = raw
      .select(floor(graft.util.Ts.sec(raw) / 86400L).cast("long").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = pairs.groupBy(_._1)
    val expected = byDay.map { case (d, xs) =>
      val dau = xs.length.toLong
      val mau = pairs.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).distinct.length.toLong
      d -> (dau, mau, math.floor(dau.toDouble / mau * 10000d + 0.5d) / 10000d)
    }
    assert(out === expected)
    // mau dominates dau; stickiness is a valid ratio; the FIRST observed
    // day's trailing window holds exactly that day's actives
    out.foreach { case (_, (dau, mau, st)) =>
      assert(mau >= dau && st > 0.0 && st <= 1.0)
    }
    val firstDay = out.keySet.min
    assert(out(firstDay)._1 === out(firstDay)._2)
  }

  test("qe15 burst rate == driver trailing-window recompute") {
    val out = Events.burstRate(spark, Sf01).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    val raw = graft.util.Tables.events(spark, Sf01)
    val evs = raw.select(col("user_id"), graft.util.Ts.sec(raw).as("tsec"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).map { case (u, xs) =>
      val ts = xs.map(_._2).sorted
      // RANGE frame: for each event, count events in (t-86399, t]
      val peak = ts.map(t => ts.count(s => s > t - 86400L && s <= t)).max.toLong
      u -> (ts.length.toLong, peak, if (peak >= 8L) 1L else 0L)
    }
    assert(out === expected)
    // the audit must separate: some users flagged, some not, at sf0.01
    assert(out.values.exists(_._3 == 1L) && out.values.exists(_._3 == 0L))
  }

  test("qe16 next-event eval: one row per source, accuracy bounded, beats 1/|types|") {
    val r = Events.nextEventEval(spark, Sf01).cache()
    val rows = r.collect()
    assert(rows.nonEmpty)
    // one verdict row per (src, its single predicted dst)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    for (row <- rows) {
      val (nTest, nCorrect, acc) = (row.getLong(2), row.getLong(3), row.getDouble(4))
      assert(nTest > 0 && nCorrect >= 0 && nCorrect <= nTest)
      assert(acc >= 0.0 && acc <= 1.0)
    }
    // the Markov argmax must beat uniform guessing over the observed
    // DESTINATION alphabet on aggregate (else the model learned
    // nothing) — the chance denominator is |distinct dst|, not the
    // number of source rows
    val nDst = Events.transitions(spark, Sf01)
      .select("dst").distinct().count().toDouble
    val total = rows.map(_.getLong(2)).sum.toDouble
    val correct = rows.map(_.getLong(3)).sum.toDouble
    assert(correct / total >= 1.0 / nDst - 1e-9,
      s"aggregate top-1 accuracy ${correct / total} below chance 1/$nDst")
    r.unpersist()
  }

  test("qm8 media clusters: one canonical per cluster, labels close qm7's pairs") {
    import graft.multimodal.BinaryMeta
    val c = BinaryMeta.mediaClusters(spark, Sf01).cache()
    val rows = c.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    for ((cid, members) <- byCluster) {
      assert(members.count(_._5 == 1) === 1, s"cluster $cid canonical count")
      assert(members.forall(_._4 == members.length.toLong), s"cluster $cid size")
      assert(cid === members.map(_._1).min, s"cluster $cid label is min doc_id")
      // the canonical is the most-intact copy (max nf, min id tie-break)
      val canon = members.find(_._5 == 1).get
      val best = members.minBy(m => (-m._3, m._1))
      assert(canon._1 === best._1, s"cluster $cid canonical election")
    }
    // every qm7 pair's endpoints landed in the same cluster
    val label = rows.map(m => m._1 -> m._2).toMap
    val pairs = BinaryMeta.frameNearDup(spark, Sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs) assert(label(a) === label(b), s"pair ($a,$b) split")
    c.unpersist()
  }

  test("qp11 expectations: verdict logic and the structural checks hold") {
    val r = Events.expectations(spark, Sf001).collect()
      .map(x => x.getAs[String]("check_name") ->
        (x.getAs[Double]("metric"), x.getAs[Double]("threshold"),
          x.getAs[Long]("passed"))).toMap
    assert(r.size === 9)
    r.values.foreach { case (m, t, p) =>
      assert(m >= 0.0 && m <= 1.0 && (p == 1L) == (m >= t), s"verdict broken: $r")
    }
    // the synthetic lineitem is referentially clean but REUSES
    // linenumbers — the scorecard catches a genuine PK violation (the
    // exact failure class Deequ exists to surface)
    assert(r("ref_orders") === ((1.0, 1.0, 1L)))
    assert(r("unique_pk")._1 < 1.0 && r("unique_pk")._3 === 0L,
      s"expected the PK-uniqueness violation to be reported: $r")
    // TPC-H-ish quantity runs past 40, so the strict bound FAILS while
    // the 0.85-threshold "mostly" variant of a looser bound passes —
    // both verdict branches exercised on real data
    assert(r("quantity_le_40")._3 === 0L, s"expected a failing check: $r")
    assert(r("mostly_quantity_le_45")._2 === 0.85)
    assert(r("mostly_quantity_le_45")._1 < 1.0 &&
      r("mostly_quantity_le_45")._3 === 1L)
  }

  test("qe17 CUPED: a perfect covariate gives theta 1, zero adjusted effect") {
    import spark.implicits._
    // users 0..9, one "m" event pre (tsec=u) and one post (tsec=1000+u),
    // BOTH valued 10+u: y == x per user, so theta = 1, variance
    // reduction = 1, and the CUPED effect cancels exactly while the raw
    // difference-in-means is 1.0 (odd arm mean 15, even arm mean 14)
    val ev = (0 until 10).flatMap { u =>
      Seq((u.toLong, "m", u.toLong, 10.0 + u), (u.toLong, "m", 1000L + u, 10.0 + u))
    }.toDF("user_id", "event_type", "tsec", "value")
    val r = Events.cupedFrom(ev).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n") === 10L && row.getAs[Long]("n1") === 5L)
    assert(row.getAs[Double]("effect_raw") === 1.0)
    assert(row.getAs[Double]("theta") === 1.0)
    assert(row.getAs[Double]("effect_cuped") === 0.0)
    assert(row.getAs[Double]("var_reduction") === 1.0)
  }

  test("qe17 CUPED invariants at sf0.001") {
    val r = Events.cuped(spark, Sf001).cache()
    assert(r.count() > 0)
    // arms partition the users; variance reduction is a squared
    // correlation — bounded by 1 up to the per-term quantization
    assert(r.filter(col("n1") <= 0 || col("n1") >= col("n")).count() === 0)
    assert(r.filter(col("var_reduction") < 0 ||
      col("var_reduction") > 1.001).count() === 0)
    // CUPED only recenters: with theta from the pooled regression the
    // adjusted effect must be finite wherever the raw one is
    assert(r.filter(col("effect_raw").isNotNull &&
      col("theta").isNotNull && col("effect_cuped").isNull).count() === 0)
    r.unpersist()
  }
}
