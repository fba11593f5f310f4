package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Num

/** Memory-bank anomaly detection operators (reference:
  * src/anomaly_detection/softpatch.py, common.py NearestNeighbourScorer,
  * multi_variate_gaussian.py).
  *
  * Scale design: the memory bank (train patches, later denoised +
  * coreset'd) is small relative to the scored stream and is broadcast;
  * scoring is a broadcast join + per-row min-reduce — the big side never
  * shuffles. The patch-weight ops partition by patch position, the
  * reference's "batch per patch" axis.
  */
object Detect {
  val FeatCols: Seq[String] = (0 to 8).map(i => s"f$i")

  /** Squared L2 distance between two patch-feature rows (prefixed cols). */
  private def dist2(l: String, r: String): Column =
    FeatCols.map(f => (col(s"$l$f") - col(s"$r$f")) * (col(s"$l$f") - col(s"$r$f")))
      .reduce(_ + _)

  private def renamed(df: DataFrame, p: String): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))

  /** q09: kNN (k=1) anomaly score — distance from each test patch to its
    * nearest bank patch; window score = max over patches (ref
    * softpatch.py _predict + PatchMaker.score). Bank is broadcast: the
    * scored side streams map-side.
    */
  def knnScore(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val (bank, test) = TsCore.bankAndTest(spark, sfDir)
    // The whole bank broadcasts as ONE flattened array row; each test
    // patch runs the codegen'd graft_min_dist2 scan (min is
    // order-independent, so collect_list order doesn't matter). This
    // replaces a |test|×|bank|-row broadcast join + hash-agg with one
    // tight loop per test row — the scored side never widens or
    // shuffles, which is the 100 TB contract.
    // min over squared distances, sqrt once per patch: sqrt is monotone,
    // so sqrt(min(d2)) == min(sqrt(d2)) exactly — matches the oracle.
    val bankRow = bank.agg(flatten(collect_list(array(FeatCols.map(col): _*))).as("bf"))
    test.select(col("series"), col("win"), col("pos"), array(FeatCols.map(col): _*).as("p"))
      .crossJoin(broadcast(bankRow))
      .select(col("series"), col("win"), col("pos"),
        sqrt(expr("graft_min_dist2(bf, p)")).as("pscore"))
      .groupBy("series", "win")
      .agg(Num.r4(max("pscore")).as("score"))
  }

  /** Fixed-order Gauss-Jordan inverse (no pivoting — the regularized
    * covariance is SPD, so the pivot a(k)(k) is always positive). Step
    * k maps a'(k,j) = a(k,j)/p and a'(i,j) = a(i,j) − a(i,k)·a(k,j)/p
    * — the EXACT expression the oracle's unrolled CTE chain evaluates,
    * so driver-side and DuckDB inverses agree on identical inputs
    * bit-for-bit (same IEEE operation sequence).
    */
  private[graft] def invertGaussJordan(sig: Array[Array[Double]]): Array[Array[Double]] = {
    val n = sig.length
    var a = Array.tabulate(n, 2 * n) { (i, j) =>
      if (j < n) sig(i)(j) else if (j - n == i) 1.0 else 0.0
    }
    for (k <- 0 until n) {
      val prev = a
      val p = prev(k)(k)
      a = Array.tabulate(n, 2 * n) { (i, j) =>
        if (i == k) prev(k)(j) / p
        else prev(i)(j) - prev(i)(k) * prev(k)(j) / p
      }
    }
    Array.tabulate(n, n)((i, j) => a(i)(j + n))
  }

  /** All (i, j) with i ≤ j — the upper-triangle traversal both engines
    * use for covariance columns and quadratic-form terms (TsOracle
    * references this same value so the orders can never diverge).
    */
  private[timeseries] val UpperIdx: Seq[(Int, Int)] =
    for { i <- 0 to 8; j <- i to 8 } yield (i, j)

  /** Per-patch-position full 9-dim Gaussian fit over the bank: means +
    * sample covariance (+0.01·I regularization) via one single-pass
    * groupBy (9 avg + 45 covar_samp sufficient statistics — fully
    * distributed), then the tiny ≤24 position × 9×9 matrices are
    * collected, inverted driver-side (scale-safe: the driver holds
    * 24×81 doubles regardless of bank size) and broadcast back.
    * (ref multi_variate_gaussian.py:15-84: torch _cov ddof=1 per patch
    * position + 0.01·eye, then linalg.inv.)
    */
  private def gaussianInv(spark: SparkSession, bank: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val meanAggs = (0 to 8).map(i => avg(s"f$i").as(s"m$i"))
    val covAggs = UpperIdx.map { case (i, j) => covar_samp(col(s"f$i"), col(s"f$j")).as(s"c${i}_$j") }
    val aggs = meanAggs ++ covAggs
    val stats = bank.groupBy("pos").agg(aggs.head, aggs.tail: _*).collect()
    val rows = stats.map { r =>
      // covar_samp is NULL for a single-patch position (n−1 = 0); the
      // oracle's CTE chain propagates those NULLs through to a NULL
      // mdist, so mirror that with an all-null stats row instead of
      // crashing the driver on getDouble(null).
      val degenerate = (1 until r.length).exists(r.isNullAt)
      if (degenerate)
        Row.fromSeq(r.getLong(r.fieldIndex("pos")) +: Seq.fill(9 + UpperIdx.length)(null))
      else {
        val sig = Array.tabulate(9, 9) { (i, j) =>
          val (a, b) = if (i <= j) (i, j) else (j, i)
          r.getDouble(r.fieldIndex(s"c${a}_$b")) + (if (i == j) 0.01 else 0.0)
        }
        val inv = invertGaussJordan(sig)
        Row.fromSeq(
          r.getLong(r.fieldIndex("pos")) +:
          ((0 to 8).map(i => r.getDouble(r.fieldIndex(s"m$i"))) ++
           UpperIdx.map { case (i, j) => inv(i)(j) }))
      }
    }
    val schema = StructType(
      StructField("pos", LongType) +:
      ((0 to 8).map(i => StructField(s"m$i", DoubleType)) ++
       UpperIdx.map { case (i, j) => StructField(s"i${i}_$j", DoubleType) }))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** q10: full 9-dim Mahalanobis distance of each test patch to the
    * per-position Gaussian fit on the bank (ref softpatch.py
    * _compute_distance_with_gaussian + multi_variate_gaussian.py).
    * Quadratic form unrolled over the upper triangle in fixed fold
    * order (i00, i01·2, …, i88) — mirrored term-for-term in the oracle.
    */
  def gaussianScore(spark: SparkSession, sfDir: String): DataFrame =
    // cached: q10 is the owner, but q29 (top patch), q50 (mask) and the
    // pipeline all consume the same heatmap — without the cache each
    // re-runs the 45-covar fit + driver inversion + scoring join
    graft.util.StageCache.cached(spark, sfDir, "gauss_mdist") {
      val (bank, test) = TsCore.bankAndTest(spark, sfDir)
      val g = gaussianInv(spark, bank)
      val d = (0 to 8).map(i => col(s"f$i") - col(s"m$i"))
      val form = UpperIdx.map { case (i, j) =>
        if (i == j) d(i) * d(j) * col(s"i${i}_$j")
        else lit(2.0) * d(i) * d(j) * col(s"i${i}_$j")
      }.reduce(_ + _)
      test.join(broadcast(g), "pos")
        .select(col("series"), col("win"), col("pos"),
          Num.r4(sqrt(form)).as("mdist"))
    }

  /** Pairwise distances against a CAPPED reference set: every patch is
    * still scored, but the neighbour-candidate side is truncated to the
    * deterministic first `maxRef` window ids per position BEFORE the
    * pairwise join, bounding the per-position pair product at
    * O(n·maxRef) in the plan itself (the b-side input shrinks — not a
    * post-join filter over the quadratic stream) — the 100 TB contract
    * for both q11 (LOF) and q12 (nearest-dist). With maxRef ≥ the
    * position's window count the result is EXACTLY the uncapped
    * pairwise (DetectSpec asserts bit-equality), so the oracle stays
    * the exact mirror at test scales.
    */
  /** The capped reference side with the LOUD truncation guard (one tiny
    * agg on the roster): the registered q11/q12 stay bit-identical to
    * their exact-uncapped DuckDB oracles ONLY while no position exceeds
    * maxRef windows — if a scale bump ever trips the cap, a parity
    * break must point HERE, not at the pairwise logic.
    */
  private def cappedRef(withId: DataFrame, maxRef: Int): DataFrame =
    if (maxRef == Int.MaxValue) withId
    else {
      // the candidate roster is the bank's own (pos, id) set — tiny
      // relative to the pair stream; rank it, keep the first maxRef
      val wRef = Window.partitionBy("pos").orderBy("id")
      val roster = withId.select("pos", "id").distinct()
      val over = roster.groupBy("pos").count()
        .filter(col("count") > maxRef).count()
      if (over > 0)
        Console.err.println(
          s"[graft] pairwiseRef: cap maxRef=$maxRef TRUNCATES $over " +
            "position(s) — capped result now diverges from the exact " +
            "pairwise (and its oracle) by design")
      val refIds = roster
        .withColumn("rr", row_number().over(wRef)).filter(col("rr") <= maxRef)
        .select("pos", "id")
      withId.join(refIds, Seq("pos", "id"))
    }

  private[graft] def pairwiseRef(bank: DataFrame, maxRef: Int): DataFrame = {
    val pid = concat_ws("#", col("series"), col("win"))
    val withId = bank.withColumn("id", pid)
    val a = renamed(withId, "a_")
    val b = renamed(cappedRef(withId, maxRef), "b_")
    a.join(b, col("a_pos") === col("b_pos") && col("a_id") =!= col("b_id"))
      .select(col("a_pos").as("pos"), col("a_id").as("id"), col("b_id").as("nid"),
        sqrt(dist2("a_", "b_")).as("d"))
  }

  /** The k-trimmed neighbour stream (pos, id, nid, d) via the PACKED
    * graft_knn kernel: each position's capped reference set packs into
    * ONE broadcast row (ids sorted + row-major features, ≤ maxRef·9
    * doubles), every patch probes it in-row, and only the k winners
    * materialize. Bit-identical to trimming [[pairwiseRef]] with
    * `row_number() OVER (PARTITION BY pos, id ORDER BY d+eps, nid) <= k`
    * — same ascending-index distance fold, eps added to the sqrt before
    * selection, UTF8 binary nid tie-break (DetectSpec asserts equality)
    * — but the n·maxRef pair rows never exist: at sf1 this removed a
    * 26M-row shuffle + window sort that was 60% of q11's wall time.
    */
  /** Packed-broadcast ceiling for [[knnRef]] (ADVICE r13): the packed
    * table is |positions| rows of ≤ maxRef·9 doubles (~720 KB/row at
    * maxRef=10000) — sized for the patch-bank geometry, but a caller
    * whose position count grows could silently exceed executor/driver
    * broadcast limits. One cheap per-position count bounds the exact
    * packed payload up front; past the ceiling knnRef falls back
    * (loudly) to the bit-identical pairwise+window-trim plan.
    */
  private[graft] val KnnBroadcastMaxBytes: Long = 1L << 30

  private[graft] def knnRef(spark: SparkSession, bank: DataFrame, maxRef: Int,
                            k: Int, eps: Double,
                            maxBroadcastBytes: Long = KnnBroadcastMaxBytes): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val pid = concat_ws("#", col("series"), col("win"))
    val withId = bank.withColumn("id", pid)
    // exact packed payload: Σ_pos min(|pos|, maxRef) features × 9 × 8 B
    // (a |positions|-row partial agg — trivial next to the scan itself)
    val estBytes = withId.groupBy("pos").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(least(col("c"), lit(maxRef.toLong))), lit(0L)))
      .first().getLong(0) * FeatCols.length * 8L
    if (estBytes > maxBroadcastBytes) {
      System.err.println(s"[detect] knnRef packed table ~$estBytes B exceeds " +
        s"$maxBroadcastBytes B — falling back to the pairwise+trim plan")
      val trimW = Window.partitionBy("pos", "id").orderBy(col("d"), col("nid"))
      return pairwiseRef(bank, maxRef)
        .withColumn("d", col("d") + eps)
        .withColumn("rn", row_number().over(trimW)).filter(col("rn") <= k)
        .select("pos", "id", "nid", "d")
    }
    val packed = cappedRef(withId, maxRef)
      .select(col("pos"),
        struct(col("id"), array(FeatCols.map(col): _*).as("fs")).as("s"))
      .groupBy("pos").agg(array_sort(collect_list(col("s"))).as("ps"))
      .select(col("pos"), expr("transform(ps, x -> x.id)").as("nids"),
        flatten(expr("transform(ps, x -> x.fs)")).as("bf"))
    withId.join(broadcast(packed), "pos")
      .select(col("pos"), col("id"),
        explode(call_function("graft_knn", col("id"),
          array(FeatCols.map(col): _*), col("nids"), col("bf"),
          lit(k), lit(eps))).as("s"))
      .select(col("pos"), col("id"), col("s.nid").as("nid"), col("s.d").as("d"))
  }

  /** q12: nearest-neighbour distance patch weight ("nearest" method, ref
    * softpatch.py _compute_nearest_distance: topk(2, smallest) over a
    * self-inclusive distance matrix = 0 + d(nearest other)). The PUBLIC
    * default (and the registered q12) runs the capped reference set —
    * exact whenever positions hold ≤ maxRef windows (all test scales).
    */
  def nearestDistWeight(spark: SparkSession, sfDir: String,
                        maxRef: Int = 10000): DataFrame =
    TsCore.cached(spark, sfDir, s"nnweight_$maxRef") {
      val (bank, _) = TsCore.bankAndTest(spark, sfDir)
      // k=1, eps=0: the kernel's single winner IS min(raw d) — sqrt+0.0
      // is bit-identical to sqrt on IEEE doubles
      knnRef(spark, bank, maxRef, k = 1, eps = 0.0)
        .groupBy("pos", "id")
        .agg(Num.r4(min("d")).as("w_nearest"))
        .select(col("id"), col("pos"), col("w_nearest"))
    }

  /** Exact (uncapped) q12 — the spec's small-N anchor. */
  def nearestDistWeightExact(spark: SparkSession, sfDir: String): DataFrame =
    nearestDistWeight(spark, sfDir, maxRef = Int.MaxValue)

  /** q23: end-to-end SoftPatch pipeline (ref softpatch.py fit + predict):
    * nearest-dist patch weights (+1) on the bank → denoise (drop the top
    * `denoiseThr` weight quantile) → score test patches against the kept
    * bank → soft re-weight by the matched bank patch's weight → window
    * score = max → flag windows above the (1−contam) score quantile.
    * The kept bank stays broadcast; ties on distance break by bank id.
    */
  def pipeline(spark: SparkSession, sfDir: String,
               denoiseThr: Double = 0.15, contamRate: Double = 0.1): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val (bank, test) = TsCore.bankAndTest(spark, sfDir)
    val w = nearestDistWeight(spark, sfDir).withColumn("wgt", col("w_nearest") + 1.0)
    // denoise threshold via the distributed range-sort (util.Quantiles),
    // embedded as a plan literal — at billions of bank patches the old
    // single-group percentile() buffer was the one non-distributed step
    val thrW = graft.util.Quantiles.exactLit(w, "wgt", 1.0 - denoiseThr)
    val bid = bank.withColumn("id", concat_ws("#", col("series"), col("win")))
    val kept = bid.join(w.select("id", "pos", "wgt"), Seq("id", "pos"))
      .filter(col("wgt") <= thrW)
    // Kept bank broadcasts as ONE row: features flattened sorted by
    // (id, pos) + the parallel weight array. graft_argmin_dist2 keeps
    // the FIRST index on exact distance ties, so the sorted packing
    // reproduces the oracle's `ORDER BY d, id` nearest-patch choice.
    val packed = kept
      .select(struct(col("id"), col("pos"), col("wgt"),
        array(FeatCols.map(col): _*).as("fs")).as("s"))
      .agg(array_sort(collect_list(col("s"))).as("ps"))
      .select(flatten(expr("transform(ps, x -> x.fs)")).as("bf"),
              expr("transform(ps, x -> x.wgt)").as("ws"))
    val pscores = test
      .select(col("series"), col("win"), col("pos"), array(FeatCols.map(col): _*).as("p"))
      .crossJoin(broadcast(packed))
      .withColumn("idx", expr("graft_argmin_dist2(bf, p)"))
      .select(col("series"), col("win"),
        (sqrt(expr("graft_min_dist2(bf, p)")) *
          expr("ws[int(idx)]")).as("pscore"))
    // window scores materialize once (the threshold pass and the final
    // select would otherwise each recompute the broadcast-kernel scan)
    val winScores = TsCore.cached(spark, sfDir, s"q23ws_$denoiseThr") {
      pscores.groupBy("series", "win").agg(max("pscore").as("score"))
    }
    val thrS = graft.util.Quantiles.exactLit(winScores, "score", 1.0 - contamRate)
    winScores
      .select(col("series"), col("win"), Num.r4(col("score")).as("score"),
        when(col("score") > thrS, 1).otherwise(0).as("pred"))
  }

  /** Local Outlier Factor (k=6) per patch position over the bank
    * (ref softpatch.py _compute_lof_gpu):
    * kdist(a) = d to k-th NN; reach(a,b) = max(d(a,b), kdist(b));
    * lrd(a) = k / Σ_{b∈kNN(a)} reach(a,b); lof(a) = mean lrd(b)/lrd(a).
    * The reference adds 1e-6 to all distances before the top-k.
    *
    * The PUBLIC default — and since r10 the REGISTERED q11 — is the
    * CAPPED path (maxRef = 10000): per-position pairwise LOF is O(n²) in
    * windows-per-position — the quadratic term a 100 TB bank cannot pay.
    * Whenever the position has ≤ maxRef windows the cap is EXACTLY the
    * uncapped LOF (DetectSpec asserts bit-equality), so the exact DuckDB
    * oracle stays valid at every test scale; only beyond the cap does
    * the reference set truncate. [[lofWeightExact]] remains the spec's
    * small-N anchor.
    */
  def lofWeight(spark: SparkSession, sfDir: String, k: Int = 6): DataFrame =
    lofWeightCapped(spark, sfDir, k)

  /** Exact (uncapped) LOF — the q11 oracle anchor; O(n²) per position,
    * reserve for oracle parity and small banks.
    */
  def lofWeightExact(spark: SparkSession, sfDir: String, k: Int = 6): DataFrame =
    lofWeightCapped(spark, sfDir, k, maxRef = Int.MaxValue)

  /** LOF with a per-position reference cap — the 100 TB path. When the
    * windows-per-position count makes the per-position pairwise
    * quadratic too wide, the *reference* set (neighbour candidates) is
    * capped to the first `maxRef` window ids per position
    * (deterministic), while every patch is still scored. With
    * maxRef ≥ bank size this is exactly the uncapped LOF (the oracle
    * path); capped results are approximate but bounded O(n·maxRef).
    */
  def lofWeightCapped(spark: SparkSession, sfDir: String, k: Int = 6,
                      maxRef: Int = 10000): DataFrame = {
    val (bank, _) = TsCore.bankAndTest(spark, sfDir)
    // the packed kernel emits the k-trimmed stream directly (d already
    // +1e-6, the reference's pre-top-k epsilon); still checkpointed:
    // kdist, lrd AND lof all read it — k·|bank| rows, linear in bank
    // size, and the kernel scan runs once instead of three times.
    val knn = knnRef(spark, bank, maxRef, k, eps = 1e-6)
      .localCheckpoint(eager = false)
    val kdist = knn.groupBy("pos", "id").agg(max("d").as("kdist"))
    // reach(a,b) = max(d(a,b), kdist(b)); lrd(a) = k / sum_b reach(a,b)
    val lrd = knn
      .join(kdist.select(col("pos"), col("id").as("nid"), col("kdist").as("kdist_b")),
        Seq("pos", "nid"))
      .groupBy("pos", "id")
      .agg((lit(k.toDouble) / sum(greatest(col("d"), col("kdist_b")))).as("lrd"))
    val lof = knn
      .join(lrd.select(col("pos"), col("id").as("nid"), col("lrd").as("lrd_b")), Seq("pos", "nid"))
      .groupBy("pos", "id")
      .agg((sum("lrd_b") / lit(k.toDouble)).as("sum_lrd_b"))
      .join(lrd, Seq("pos", "id"))
      .select(col("id"), col("pos"), Num.r4(col("sum_lrd_b") / col("lrd")).as("lof"))
    lof
  }
}
