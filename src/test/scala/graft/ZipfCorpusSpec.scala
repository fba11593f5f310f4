package graft

import org.apache.spark.sql.functions._
import graft.tools.GenZipf

/** The degenerate-vocabulary blind spot (VERDICT r12 "what's wrong #1"):
  * on the driver's 31-token corpus every df-gated branch ran its
  * fallback/degenerate path, so parity could not see a bug in the
  * design path. These specs pin the heavy-tailed replacement corpus's
  * SHAPE and prove the gated branches actually fire on it:
  * qv18's ELIGIBLE term path (fallback inactive), qt13's df gate
  * excluding rare bigrams while catching the planted passages, qt12's
  * nonzero OOV, qd18's rare-shingle postings, and qd2's LSH catching
  * the planted near-dup pairs.
  */
class ZipfCorpusSpec extends SparkSuite {
  import graft.vector.Similarity

  /** One generated corpus dir (from the sf0.01 base = 500 docs — large
    * enough for stable df signal), shared across the suite.
    */
  lazy val zdir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    GenZipf.zipfDocuments(spark.read.parquet(s"$Sf01/documents.parquet"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    GenZipf.zipfEmbeddings(spark.read.parquet(s"$Sf01/embeddings.parquet"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    GenZipf.zipfEvents(spark.read.parquet(s"$Sf01/events.parquet"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val (zli, zord) = GenZipf.zipfFacts(
      spark.read.parquet(s"$Sf01/lineitem.parquet"),
      spark.read.parquet(s"$Sf01/orders.parquet"))
    zli.write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    zord.write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq("customer", "nation", "region").foreach(t =>
      spark.read.parquet(s"$Sf01/$t.parquet")
        .write.mode("overwrite").parquet(s"$d/$t.parquet"))
    d
  }

  test("the COMMITTED gate corpus (SparkEntry.ZipfDir) is the generator's output") {
    // the qz* keys in the OFFICIAL correctness gate read this committed
    // parquet; if the generator or the artifact drifts, this breaks
    val committed = spark.read.parquet(s"${SparkEntry.ZipfDir}/documents.parquet")
    val regen = GenZipf.zipfDocuments(spark.read.parquet(s"$Sf01/documents.parquet"))
    assert(committed.except(regen).count() === 0 &&
      regen.except(committed).count() === 0)
    // embeddings: since r16 ALSO generator output (zipf labels +
    // archetype-clustered vectors — qz14/qz15's corpus), pinned the
    // same way. Array equality via posexplode (DataFrame.except can't
    // compare array columns by value across all types reliably).
    val emb = spark.read.parquet(s"${SparkEntry.ZipfDir}/embeddings.parquet")
    val regenE = GenZipf.zipfEmbeddings(spark.read.parquet(s"$Sf01/embeddings.parquet"))
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
    assert(emb.count() === regenE.count())
    assert(flat(emb).except(flat(regenE)).count() === 0 &&
      flat(regenE).except(flat(emb)).count() === 0)
    // events: since r17 ALSO generator output (zipf types + zipf user
    // activity with the bot head — qz18/qz19/qz20's corpus)
    val evs = spark.read.parquet(s"${SparkEntry.ZipfDir}/events.parquet")
    val regenV = GenZipf.zipfEvents(spark.read.parquet(s"$Sf01/events.parquet"))
    assert(evs.except(regenV).count() === 0 &&
      regenV.except(evs).count() === 0)
    // facts: since r18 ALSO generator output (mega-order lineitem +
    // mega-customer orders — qz24/qz25's corpus), pinned the same way
    val (regenLi, regenOrd) = GenZipf.zipfFacts(
      spark.read.parquet(s"$Sf01/lineitem.parquet"),
      spark.read.parquet(s"$Sf01/orders.parquet"))
    val li = spark.read.parquet(s"${SparkEntry.ZipfDir}/lineitem.parquet")
    val ord = spark.read.parquet(s"${SparkEntry.ZipfDir}/orders.parquet")
    assert(li.count() === regenLi.count() &&
      li.except(regenLi).count() === 0 && regenLi.except(li).count() === 0)
    assert(ord.except(regenOrd).count() === 0 &&
      regenOrd.except(ord).count() === 0)
    // the dims qz25 joins ride through verbatim
    Seq("customer", "nation", "region").foreach { t =>
      val com = spark.read.parquet(s"${SparkEntry.ZipfDir}/$t.parquet")
      val base = spark.read.parquet(s"$Sf01/$t.parquet")
      assert(com.except(base).count() === 0 && base.except(com).count() === 0, t)
    }
  }

  test("zipf events: the bot head fires qp5's skew and qe15's rate limit (idle on base)") {
    import graft.analytics.Events
    val evs = spark.read.parquet(s"$zdir/events.parquet")
    val n = evs.count()
    // the bot (zipf rank 0) holds a double-digit share of ALL events
    val bot = evs.filter(col("user_id") === 0).count()
    assert(bot > n / 10, s"bot must dominate: $bot of $n")
    // qp5: the profiler's top key IS the bot, at a skew no uniform
    // stream produces; the base corpus never clears a 2x skew — the
    // diagnostic that decides salting is structurally idle there
    val topZ = Events.skewProfile(spark, zdir).orderBy(desc("skew")).limit(1).collect().head
    assert(topZ.getLong(topZ.fieldIndex("user_id")) === 0L)
    assert(topZ.getDouble(topZ.fieldIndex("skew")) >= 5.0,
      s"bot skew must be unmistakable: ${topZ.getDouble(topZ.fieldIndex("skew"))}")
    val topB = Events.skewProfile(spark, Sf01).agg(max("skew")).collect().head.getDouble(0)
    assert(topB < 2.0, s"base corpus must stay idle, got skew $topB")
    // qe15: the bot's trailing-day peak clears the rate-limit
    // threshold by an order of magnitude — the abuse screen is LIVE
    val br = Events.burstRate(spark, zdir).filter(col("user_id") === 0).collect().head
    assert(br.getLong(br.fieldIndex("flagged")) === 1L)
    assert(br.getLong(br.fieldIndex("peak_rate")) >= 40L,
      s"bot peak must dwarf thr=8: ${br.getLong(br.fieldIndex("peak_rate"))}")
    // qe1: the bot's stream is DENSE — sub-gap arrivals chain into
    // long sessions (the per-user state bound qe15/qe1 document is
    // exercised by a real hot partition, not a 3-event session)
    val botSess = Events.sessionize(spark, zdir).filter(col("user_id") === 0)
    assert(botSess.agg(max("n_events")).collect().head.getLong(0) >= 20L,
      "the bot must chain dense multi-event sessions")
  }

  test("zipf facts: mega-order and mega-customer dominate (idle on base)") {
    // qz24's design path: the hot l_orderkey group is the one a salted
    // two-phase agg exists to spread — double-digit share of ALL lines
    val li = spark.read.parquet(s"$zdir/lineitem.parquet")
    val nLi = li.count()
    val hotLines = li.filter(col("l_orderkey") === 0).count()
    assert(hotLines > nLi / 10, s"mega-order must dominate: $hotLines of $nLi")
    // base: the biggest order is ~7 lines — no key is a reducer risk
    val baseLi = spark.read.parquet(s"$Sf01/lineitem.parquet")
    val baseMax = baseLi.groupBy("l_orderkey").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(baseMax < nLi / 1000, s"base corpus must stay idle: max group $baseMax")
    // qz25's probe side: the mega-customer holds a double-digit share
    // of orders (the fact-fact join's build side stays per-order)
    val ord = spark.read.parquet(s"$zdir/orders.parquet")
    val nOrd = ord.count()
    val hotOrd = ord.filter(col("o_custkey") === 0).count()
    assert(hotOrd > nOrd / 10, s"mega-customer must dominate: $hotOrd of $nOrd")
    // and the salted kernel's phase-1 really fans the hot key out: all
    // `salts` partials exist for the mega-order (pmod(l_partkey, 8))
    val fanout = li.filter(col("l_orderkey") === 0)
      .select(pmod(col("l_partkey"), lit(8))).distinct().count()
    assert(fanout === 8L, s"phase-1 salt fan-out must cover all salts: $fanout")
  }

  test("qz25: AQE's skew-join split engages on the zipf facts (absent on base)") {
    // qa2's lineitem⋈orders leg is an unhinted shuffle join (the dims
    // broadcast by hint). Local partitions are KBs, so the split is
    // exercised at proportionally scaled thresholds — the DETECTION
    // (hot partition > factor × median AND > threshold) and the split
    // rewrite are the same code path a 100 TB run takes with the
    // production defaults (256 MB / 5×). Both corpora are rewritten to
    // an 8-file layout first: AQE splits a skewed reduce partition by
    // MAPPER block ranges, so a single-file (one row group → one map
    // task) table is unsplittable however hot its key — exactly why a
    // 100 TB fact table must never be one giant unsplittable blob.
    // The A/B is layout-matched: only the key distribution differs.
    def skewFires(src: String): Boolean = {
      val d = java.nio.file.Files.createTempDirectory("graft-skewjoin").toString
      Seq("lineitem", "orders", "customer", "nation", "region").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet").repartition(8)
          .write.mode("overwrite").parquet(s"$d/$t.parquet")
      }
      val c = spark.conf
      try {
        c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        c.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        c.set("spark.sql.shuffle.partitions", "64")
        val df = graft.analytics.Relational.revenueByNation(spark, d)
        df.collect()
        df.queryExecution.executedPlan.toString.contains("skew=true")
      } finally {
        Seq("spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.coalescePartitions.enabled",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "spark.sql.adaptive.forceOptimizeSkewedJoin").foreach(c.unset)
        c.set("spark.sql.shuffle.partitions", "4")
      }
    }
    assert(skewFires(SparkEntry.ZipfDir),
      "the mega-order partition must be detected and split on the committed zipf facts")
    assert(!skewFires(Sf01),
      "no skew split may appear on the uniform base corpus")
  }

  test("zipf embeddings: majority-class labels, archetype near-dup mass, skewed cells") {
    val emb = spark.read.parquet(s"$zdir/embeddings.parquet")
    val n = emb.count()
    // label skew: the head label is a MAJORITY-class shape (>25% of
    // vectors), vs ~10% uniform in the driver's corpus
    val top = emb.groupBy("label").count().orderBy(desc("count"))
      .limit(1).collect().head.getLong(1)
    assert(top > n / 4, s"head label must dominate: $top of $n")
    // archetype mass: qd5 finds real near-dup pairs, and some are
    // near-identical (cos > 0.9 — the mass-duplicated shape)
    val nd = Similarity.embedNearDup(spark, zdir)
    assert(nd.count() > 100, "within-label near-dup pairs must be plentiful")
    assert(nd.filter(col("cos") > 0.9).count() > 0, "archetype twins must exist")
    // cell skew: qv3's seeded cells see the uneven occupancy the cell
    // guard exists for — head cell ≥ 2× the uniform share — while the
    // default maxCell cap stays non-binding (the gate must stay green)
    val sd = Similarity.semanticDedup(spark, zdir)
    val cells = sd.groupBy("cell").count().collect().map(_.getLong(1))
    assert(cells.max >= 2L * n / 16, s"head cell must be hot: ${cells.max} of $n in 16 cells")
    // and the semantic dedup is LIVE: a substantial drop fraction
    val drops = sd.filter(!col("keep")).count()
    assert(drops > n / 10, s"semantic dups must be present: $drops of $n dropped")
  }

  test("qv10's hot-cell audit flag actually FIRES on the skewed cells (qz16's design path)") {
    // on the driver's isotropic corpus no cell clears hotFactor=2 — the
    // audit is parity-green but structurally idle; the archetype
    // clustering is exactly what it exists to catch
    val st = Similarity.indexStats(spark, zdir)
    assert(st.filter(col("hot") === 1).count() >= 1,
      "at least one archetype-concentrated cell must flag hot (skew > 2x uniform)")
    assert(Similarity.indexStats(spark, Sf01).filter(col("hot") === 1).count() === 0,
      "the isotropic base corpus must stay idle — the zipf corpus is the design-path gate")
  }

  test("qv26 hot-cell split: max occupancy strictly drops on the zipf head cell, identity on base") {
    val pre = Similarity.indexStats(spark, zdir).cache()
    val preMax = pre.agg(max("n_vecs")).collect().head.getLong(0)
    val post = Similarity.hotCellSplit(spark, zdir).cache()
    // the split is LIVE (qz16's hot flag fires → ≥1 child cell) and it
    // WORKS: the post-split maximum occupancy is strictly below the
    // pre-split head cell — the maintenance op qv10's audit triggers
    val postMax = post.agg(max("n_vecs")).collect().head.getLong(0)
    assert(postMax < preMax, s"split must reduce the head cell: $postMax !< $preMax")
    // no member lost or duplicated across the re-keying
    val n = spark.read.parquet(s"$zdir/embeddings.parquet").count()
    assert(post.agg(sum("n_vecs")).collect().head.getLong(0) === n)
    // only qv10-hot cells split; every other cell rides through intact
    val hotCells = pre.filter(col("hot") === 1)
      .collect().map(_.getLong(0)).toSet
    val childRows = post.filter(col("cell") =!= col("old_cell")).collect()
    assert(childRows.nonEmpty && childRows.forall(r => hotCells.contains(r.getLong(1))),
      s"children must come from the audit's hot set $hotCells")
    assert(post.filter(col("cell") === col("old_cell") && !col("old_cell").isin(hotCells.toSeq: _*))
      .join(pre, Seq("cell", "n_vecs")).count() === pre.count() - hotCells.size)
    post.unpersist(); pre.unpersist()
    // the isotropic base corpus has no hot cell (qz16's idle pin) →
    // the report is exactly qv10's occupancy, nothing re-keyed
    assert(Similarity.hotCellSplit(spark, Sf01)
      .filter(col("cell") =!= col("old_cell")).count() === 0)
  }

  test("qv26 lifecycle: splitToClean converges on zipf, cold cells stable, the split index SERVES") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val zd = SparkEntry.ZipfDir
    // (b) run-until-clean: the final assignment passes qv10's audit
    // rule — the absolute max-occupancy bound at the CONFIGURED cell
    // count (no cell above hotFactor× the original uniform share)
    val assign = Similarity.splitToClean(spark, zd).cache()
    val counts = assign.groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    assert(counts.forall { case (_, n) => r4(n * 16 / total) <= 2.0 },
      s"post-fixpoint audit must be clean: ${counts.toSeq.sortBy(-_._2).take(3)}")
    // the fixpoint did real work: more cells than configured, and mass
    // is conserved exactly
    assert(counts.size > 16, s"the zipf head cell must have split: ${counts.size} cells")
    assert(counts.values.sum === spark.read.parquet(s"$zd/embeddings.parquet").count())
    // cold cells NEVER renumber across rounds: every vector whose
    // pre-split cell is not in qv10's hot set keeps its assignment
    val hotCells = Similarity.indexStats(spark, zd).filter(col("hot") === 1)
      .collect().map(_.getLong(0)).toSet
    val pre = Similarity.cellAssignment(spark, zd, 16)
      .select(col("vec_id"), col("cell").cast("long").as("pre_cell"))
    val moved = assign.join(pre, "vec_id")
      .filter(!col("pre_cell").isin(hotCells.toSeq: _*) &&
        col("cell") =!= col("pre_cell")).count()
    assert(moved === 0L, s"$moved cold vectors re-keyed")
    // (a) the split index SERVES — two measured wins, not claims:
    //   · TAIL: at EQUAL nProbe, the worst query's scanned-candidate
    //     count DROPS — pre-split, any query probing the hot cell pays
    //     its 3.5× occupancy; post-split no probe can (that is what a
    //     hot cell does to serving latency, and what the split fixes);
    //   · BUDGET-MATCHED RECALL: some post-split probe level reaches
    //     the pre-split nProbe=3 recall at no more total scanned
    //     candidates — the recall-per-cost frontier does not degrade
    //     (FAISS's rule: after a split you probe more, smaller cells).
    val preAssign = pre.withColumnRenamed("pre_cell", "cell")
    def profile(a: org.apache.spark.sql.DataFrame, nProbe: Int): (Double, Long, Long) = {
      val sizes = a.groupBy("cell").agg(count(lit(1)).as("csz"))
      val s = Similarity.ivfProbesFrom(spark, zd, a, nProbe)
        .join(sizes, "cell").groupBy("qid").agg(sum("csz").as("sc"))
        .agg(sum("sc"), max("sc")).collect().head
      val rec = Similarity.annEvalFrom(spark, zd, a, nProbe)
        .collect().head.getAs[Double]("recall")
      (rec, s.getLong(0), s.getLong(1))
    }
    val (preRec2, _, preMaxScan2) = profile(preAssign, 2)
    val (_, postTot2, postMaxScan2) = profile(assign, 2)
    assert(postMaxScan2 < preMaxScan2,
      s"equal-nProbe tail scan must drop: $postMaxScan2 !< $preMaxScan2")
    assert(postTot2 > 0 && preRec2 > 0) // both probes live
    val (preRec3, preTot3, _) = profile(preAssign, 3)
    val matched = (2 to 8).view.map(p => p -> profile(assign, p))
      .find { case (_, (rec, tot, _)) => rec >= preRec3 && tot <= preTot3 }
    assert(matched.isDefined,
      s"no post-split probe level matches pre-split recall $preRec3 within scan $preTot3")
    assign.unpersist()
    // base corpus: no hot cell → the fixpoint is the identity in round 0
    val baseAssign = Similarity.splitToClean(spark, Sf01)
    val baseDiff = baseAssign.join(
      Similarity.cellAssignment(spark, Sf01, 16)
        .select(col("vec_id"), col("cell").cast("long").as("c0")), "vec_id")
      .filter(col("cell") =!= col("c0")).count()
    assert(baseDiff === 0L)
  }

  test("splitToClean fails loudly on duplicate-mass cells instead of looping") {
    import spark.implicits._
    // 41 IDENTICAL vectors in one cell: both sub-seeds coincide, the
    // argmin's first-index tie-break sends every member to child 0,
    // occupancy never drops — the case splitting CANNOT fix (drain
    // near-dups first). The fixpoint must throw, not spin.
    val d = java.nio.file.Files.createTempDirectory("graft-dupmass").toString
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f)
    val c = Array(0f, 0f, 1f, 0f); val e4 = Array(0f, 0f, 0f, 1f)
    val rows = (0L until 64L).map { i =>
      val v = i match {
        case 0 => a; case 1 => b; case 2 => c; case 3 => e4
        case i2 if i2 <= 43 => a
        case i2 => Seq(b, c, e4)((i2 % 3).toInt)
      }
      (i, 0, v)
    }
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val ex = intercept[IllegalStateException] {
      Similarity.splitToClean(spark, d, nCells = 4, maxRounds = 2)
    }
    assert(ex.getMessage.contains("still hot after 2 rounds"))
  }

  test("qz22/qz23: overlap matrix differentiates, pHash catches planted dups (idle on base)") {
    import graft.analytics.Events
    // qe13 on the driver's uniform events is SATURATED — every user
    // touches all 5 types, every pair's jaccard is exactly 1.0, so the
    // matrix can't distinguish anything (structurally idle); the zipf
    // types pull the tail type's audience well below the head's
    val base = Events.audienceOverlap(spark, Sf01)
    assert(base.agg(min("jaccard")).collect().head.getDouble(0) === 1.0,
      "uniform events must saturate the matrix — that's the blind spot")
    val z = Events.audienceOverlap(spark, zdir)
    assert(z.agg(min("jaccard")).collect().head.getDouble(0) < 0.9,
      "zipf types must differentiate the audience matrix")
    // qm3's byte-level pigeonhole pairs the planted perturbed
    // near-dups (doc_id%50==49 is its predecessor's text at 5% token
    // churn — pHash-close payloads)
    val pairs = graft.multimodal.BinaryMeta.phashNearDup(spark, zdir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.exists(p => p._2 == p._1 + 1 && p._2 % 50 == 49),
      s"planted (id-1, id%%50==49) near-dups must collide in pHash space: $pairs")
  }

  test("zipf corpus shape: heavy-tailed vocabulary, labels preserved") {
    val docs = spark.read.parquet(s"$zdir/documents.parquet")
    val base = spark.read.parquet(s"$Sf01/documents.parquet")
    assert(docs.count() === base.count())
    // doc_id/lang/source survive verbatim (all label-joined structure)
    assert(docs.select("doc_id", "lang", "source").except(
      base.select("doc_id", "lang", "source")).count() === 0)
    val dfr = graft.text.TextCore.tokens(spark, zdir)
      .select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val st = dfr.agg(count(lit(1)).as("v"), expr("median(df)").as("med"),
      max("df").as("mx")).collect().head
    assert(st.getLong(0) > 500, s"vocabulary must be large, got ${st.getLong(0)}")
    assert(st.getDouble(1) <= 5.0, s"median df must sit in the tail, got ${st.getDouble(1)}")
    assert(st.getLong(2) > 100, s"heads must be hot, got ${st.getLong(2)}")
    // determinism: regeneration is bit-identical
    val again = GenZipf.zipfDocuments(base)
    assert(docs.except(again).count() === 0 && again.except(docs).count() === 0)
  }

  test("qv18 eligible branch fires: every selected query term is under the df cap") {
    val post = Similarity.bm25Postings(spark, zdir)
    val nDocs = spark.read.parquet(s"$zdir/documents.parquet").count()
    val cap = math.max(Similarity.Bm25MaxDfFloor, nDocs / Similarity.Bm25MaxDfShare)
    val qt = Similarity.hybridQueryTerms(spark, zdir)
      .join(post.select("tok", "df").distinct(), "tok")
    assert(qt.count() > 0, "query sample must select terms")
    val overCap = qt.filter(col("df") > cap).count()
    assert(overCap === 0,
      s"fallback must be INACTIVE on a Zipfian corpus: $overCap over-cap terms selected (cap=$cap)")
    // and the valve genuinely had something to reject: hot terms exist
    assert(post.select("tok", "df").distinct().filter(col("df") > cap).count() > 0)
  }

  test("qt13 df gate excludes rare bigrams and catches the planted passages") {
    val nDocs = spark.read.parquet(s"$zdir/documents.parquet").count()
    val out = graft.text.TextOps.boilerplate(spark, zdir).cache()
    // planted carriers (doc_id%8==5) must show boilerplate coverage
    val carriers = out.filter(col("doc_id") % 8 === 5)
    assert(carriers.filter(col("n_boiler") > 0).count() === carriers.count(),
      "every passage carrier must be flagged")
    // frequent stop-bigrams legitimately qualify (real text has them
    // too), but the planted passages must still SEPARATE: carriers'
    // boilerplate coverage sits clearly above the background
    val carAvg = carriers.agg(avg(col("n_boiler") / col("n_bg")))
      .collect().head.getDouble(0)
    val bgAvg = out.filter(col("doc_id") % 8 =!= 5)
      .agg(avg(col("n_boiler") / col("n_bg"))).collect().head.getDouble(0)
    assert(carAvg > bgAvg + 0.1,
      f"passage carriers must stand out: carrier avg $carAvg%.3f vs background $bgAvg%.3f")
    out.unpersist()
    // the candidate set itself is small vs the bigram vocabulary
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("i")
    val bgs = graft.text.TextCore.tokens(spark, zdir)
      .withColumn("nxt", lead("tok", 1).over(w)).filter(col("nxt").isNotNull)
      .withColumn("bg", concat_ws(" ", col("tok"), col("nxt")))
      .select("doc_id", "bg").distinct()
    val byDf = bgs.groupBy("bg").agg(count(lit(1)).as("df"))
    val qualifying = byDf.filter(col("df") >= math.ceil(0.05 * nDocs)).count()
    val total = byDf.count()
    assert(qualifying > 0 && qualifying < total / 10,
      s"gate must separate head from tail: $qualifying of $total bigrams qualify")
  }

  test("qt12 OOV and qd18 rare-shingle postings are live on the zipf corpus") {
    val vc = graft.text.TextOps.vocabCoverage(spark, zdir)
    assert(vc.agg(sum("n_oov")).collect().head.getLong(0) > 0,
      "a 32-token vocab over a 2000+-word corpus must leave OOV tokens")
    val cont = graft.text.Dedup.containment(spark, zdir)
    assert(cont.count() > 0,
      "planted near-dups share >=3 rare shingles — postings must pair them")
  }

  test("qd2 LSH catches the planted near-dup pairs") {
    val cand = graft.text.Dedup.minhashLsh(spark, zdir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.nonEmpty, "near-dup structure must produce LSH candidates")
    // at Jaccard ~0.75 most planted (id-1, id) pairs land in a band
    val planted = (0 until 10).map(b => (b * 50 + 48L, b * 50 + 49L))
    val caught = planted.count(cand.contains)
    assert(caught >= planted.size / 2,
      s"only $caught of ${planted.size} planted near-dup pairs caught: $cand")
  }
}
