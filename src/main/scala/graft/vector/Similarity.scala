package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Num, Tables}

/** Embedding similarity search: brute-force cosine top-k baseline, a
  * random-hyperplane LSH bucketed variant, and an IVF-style
  * centroid-probe variant (the 100 TB scale paths: LSH/IVF turn the
  * all-pairs problem into equi-joins on bucket / cell keys).
  *
  * Dot products use `zip_with` + `aggregate` higher-order functions —
  * codegen'd, array-local, no explode of the big side.
  */
object Similarity {

  /** Embeddings with double-cast vectors and precomputed norms. Dots go
    * through the native codegen'd kernel (graft.functions.DotProduct) —
    * same ascending-index summation as the DuckDB oracle.
    */
  private def vecs(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  private val dotAB: Column = expr("graft_dot(av, bv)")

  /** qd5: embedding-cosine near-duplicate pairs, blocked by label. */
  def embedNearDup(spark: SparkSession, sfDir: String, thr: Double = 0.25): DataFrame = {
    val e = vecs(spark, sfDir)
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("v").as("av"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("v").as("bv"), col("nrm").as("nb"))
    a.join(b, Seq("label")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", dotAB / (col("na") * col("nb")))
      .filter(col("cos") >= thr)
      .select(col("vec_a"), col("vec_b"), Num.r4(col("cos")).as("cos"))
  }

  /** qv1: brute-force cosine top-k — every 100th vector is a query; the
    * query side is broadcast against the full collection.
    *
    * `maxQueries` bounds the broadcast: the 1%-sample query side grows
    * with the collection (1 TB of queries at 100 TB), so the baseline
    * caps it at maxQueries × 64 dims × 8 B ≈ 0.5 MB — deterministic
    * (lowest qids), mirrored in the oracle, and non-binding at test
    * scales. A production brute-force pass over more queries should
    * flip the join: broadcast nothing, shuffle queries instead.
    */
  def cosineTopK(spark: SparkSession, sfDir: String, k: Int = 10, maxQueries: Int = 1000): DataFrame = {
    val e = vecs(spark, sfDir)
    val q = e.filter(col("vec_id") % 100 === 0 && col("vec_id") < lit(100L * maxQueries))
      .select(col("vec_id").as("qid"), col("v").as("av"), col("nrm").as("na"))
    val b = e.select(col("vec_id"), col("v").as("bv"), col("nrm").as("nb"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    b.crossJoin(broadcast(q)).filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", dotAB / (col("na") * col("nb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), Num.r4(col("cos")).as("cos"), col("rnk"))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * the shared hashed-uniform family over key p·64+d, mirrored in the
    * oracle. Exact dyadic rationals (k/2^31 − 1/2), so the driver-side
    * Double equals the engine-side formula bit-for-bit.
    */
  private def planeW(p: Int, d: Int): Double =
    Num.hashedUniform(p.toLong * 64L + d.toLong)

  /** Per-vector LSH bucket id from sign bits of nPlanes projections —
    * a pure COLUMN over the vector, not a separate table.
    *
    * The nPlanes×64 plane weights are a few KB of constants — they ride
    * along as literal arrays inside the projection expressions (no
    * broadcast join, no shuffle), and each projection is one codegen'd
    * `graft_dot` pass over the vector. The bucket id is computed inline
    * on the scan (no self-join to a bucket table); at 100 TB this is
    * embarrassingly parallel with zero shuffle before the bucket join
    * itself. (The naive alternative — posexplode(v) × explode(planes)
    * → two groupBys — pushes 512 rows/vector through two shuffles.)
    */
  private def bucketCol(nPlanes: Int, dim: Int = 64): Column =
    (0 until nPlanes).map { p =>
      val pw = array((0 until dim).map(d => lit(planeW(p, d))): _*)
      when(call_function("graft_dot", col("v"), pw) > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** qv2: LSH-bucketed ANN — candidates share the full bucket id; at
    * scale the bucket join replaces the quadratic scan entirely.
    */
  def lshAnn(spark: SparkSession, sfDir: String, nPlanes: Int = 8, k: Int = 5): DataFrame = {
    val e = vecs(spark, sfDir).withColumn("bucket", bucketCol(nPlanes))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("bucket"), col("v").as("av"), col("nrm").as("na"))
    val b = e.select(col("vec_id"), col("bucket"), col("v").as("bv"), col("nrm").as("nb"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    b.join(broadcast(q), Seq("bucket")).filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", dotAB / (col("na") * col("nb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), Num.r4(col("cos")).as("cos"), col("rnk"))
  }

  /** qv4: ANN quality evaluation — recall@k of the IVF index against
    * the exact top-k baseline, in one query. The evaluation harness a
    * production ANN deployment runs before trusting the index at scale.
    */
  def annEval(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val exact = cosineTopK(spark, sfDir, k).select(col("qid"), col("vec_id"))
    val approx = ivfAnn(spark, sfDir, k = k)
      .select(col("qid"), col("vec_id"), lit(1).as("hit"))
    exact.join(approx, Seq("qid", "vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .withColumn("recall", Num.r4(col("n_hit") / col("n_exact")))
  }

  /** The qv3 assignment stage: nearest packed seed per vector via ONE
    * codegen'd argmin scan — exposed for the PlanSpec gate (the
    * checkpoint in ivfAnn hides this subtree behind a LogicalRDD).
    */
  private[graft] def cellAssign(e: DataFrame,
                                packedSeeds: DataFrame): DataFrame =
    e.select(col("vec_id"), col("v")).crossJoin(broadcast(packedSeeds))
      .select(col("vec_id"), expr("int(graft_argmin_dist2(sf, v))").as("cell"))

  /** qv3: IVF-style ANN — cells seeded by the first nCells vec_ids, one
    * assignment pass, centroid = cell mean, queries probe the nProbe
    * nearest centroids and rank candidates in those cells. The cell
    * equi-join is the scale path; the centroid table broadcasts.
    */
  /** The seeded cell-assignment stage (vec_id, cell), shared by qv3
    * and qd11 through StageCache: cells are seeded by the first nCells
    * vec_ids and every vector joins its nearest seed (L2, ties → lower
    * cell). The nCells seed vectors pack into ONE flattened row sorted
    * by cell and broadcast; graft_argmin_dist2 scans them per vector in
    * a single codegen'd loop, keeping the FIRST index on exact ties —
    * i.e. the lowest cell, the same tie-break as min(struct(d2, cell)).
    * Zero shuffle on the collection side (the former shape fanned every
    * vector out ×nCells and shuffled 800k rows back through a groupBy).
    * The cached form is two narrow columns — trivial at any scale —
    * and every consumer (centroid build, candidate join, semantic
    * dedup) reads it instead of re-scanning the collection through the
    * kernel.
    */
  private[graft] def cellAssignment(spark: SparkSession, sfDir: String,
                                    nCells: Int): DataFrame =
    graft.util.StageCache.cached(spark, sfDir, s"ivfcells_$nCells") {
      val e = vecs(spark, sfDir)
      val seedIds = e.select("vec_id").orderBy("vec_id").limit(nCells)
        .withColumn("cell", row_number().over(Window.orderBy("vec_id")) - 1)
      val seeds = e.join(broadcast(seedIds), "vec_id").select(col("cell"), col("v").as("sv"))
      val packedSeeds = seeds
        .select(struct(col("cell"), col("sv")).as("s"))
        .agg(array_sort(collect_list(col("s"))).as("ps"))
        .select(flatten(expr("transform(ps, x -> x.sv)")).as("sf"))
      cellAssign(e, packedSeeds)
    }

  def ivfAnn(spark: SparkSession, sfDir: String, nCells: Int = 16, nProbe: Int = 2, k: Int = 5): DataFrame = {
    val e = vecs(spark, sfDir)
    val assign = cellAssignment(spark, sfDir, nCells)
    val pos = e.select(col("vec_id"), posexplode(col("v")).as(Seq("d", "x")))
    val centroids = pos.join(broadcast(assign), "vec_id")
      .groupBy("cell", "d").agg(avg("x").as("c"))
    // probe: nearest nProbe centroids per query, same kernel shape
    val centArr = centroids.groupBy("cell")
      .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
      .select(col("cell"), expr("transform(dc, s -> s.c)").as("cv"))
    val q = e.filter(col("vec_id") % 100 === 0)
    val wP = Window.partitionBy("qid").orderBy(col("d2"), col("cell"))
    val probes = q.select(col("vec_id").as("qid"), col("v"))
      .crossJoin(broadcast(centArr))
      .withColumn("d2", expr("graft_l2(v, cv)"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") <= nProbe)
      .select("qid", "cell")
    val cands = probes.join(assign, "cell").filter(col("qid") =!= col("vec_id"))
    val qv = q.select(col("vec_id").as("qid"), col("v").as("av"), col("nrm").as("na"))
    val bv = e.select(col("vec_id"), col("v").as("bv"), col("nrm").as("nb"))
    val wR = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    cands.join(broadcast(qv), "qid").join(bv, "vec_id")
      .withColumn("cos", dotAB / (col("na") * col("nb")))
      .withColumn("rnk", row_number().over(wR))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), Num.r4(col("cos")).as("cos"), col("rnk"))
  }

  /** qd11: semantic dedup — SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540, public) re-expressed relationally: embeddings
    * cluster into qv3's deterministic seeded cells (shared cached
    * assignment stage), and within a cell a vector is a semantic dup
    * when any lower-id vector has cosine ≥ thr; the lowest-id member of
    * each near-dup neighborhood survives. Comparisons never leave a
    * cell — the only shuffle is the cell equi-join (shuffle_hash so the
    * array payloads are never sort-buffered), never all-pairs. At
    * 100 TB nCells grows with the collection so per-cell candidate sets
    * stay bounded (the paper's k-means plays the seeded assignment's
    * role), and the output is the per-vector keep/drop verdict a
    * training-data pipeline filters the corpus by.
    */
  def semanticDedup(spark: SparkSession, sfDir: String, nCells: Int = 16,
                    thr: Double = 0.3): DataFrame = {
    val e = vecs(spark, sfDir)
    val withV = cellAssignment(spark, sfDir, nCells)
      .join(e.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
    val a = withV.select(col("cell"), col("vec_id").as("vec_a"), col("v").as("av"), col("nrm").as("na"))
    val b = withV.select(col("cell"), col("vec_id").as("vec_b"), col("v").as("bv"), col("nrm").as("nb"))
    val dups = a.hint("shuffle_hash").join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b") && dotAB / (col("na") * col("nb")) >= thr)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(count(lit(1)).as("n_prior_dups"))
    withV.select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_prior_dups"), lit(0L)).as("n_prior_dups"),
        col("n_prior_dups").isNull.as("keep"))
  }
}
