package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** qd22/qd23: the star reduction of LSH candidate generation — since
  * r15 the edge source of the DEFAULT cluster chain (qd6/qd7/qd16/
  * qd17, qc1's funnel).
  *
  * The planted corpus is the hot-bucket worst case the star exists
  * for: one cluster of IDENTICAL documents (all band buckets agree) —
  * the shape of a boilerplate/template cluster in a web crawl, where
  * qd2's within-bucket clique goes quadratic. The spec pins (a) the
  * star's edge count is LINEAR in the cluster (m−1 edges, hub = min
  * doc_id, co-signed in all 4 bands) while the clique is m(m−1)/2,
  * (b) the default dupClusters labels are bit-identical to an EXPLICIT
  * clique-edge closure — on the planted corpus AND on the real sf0.01
  * corpus (where the oracle gate also enforces it vs DuckDB's
  * recursive closure), (c) qd23 and qd6 share ONE cached CC build, and
  * (d) the default chain (dupClusters AND qc1's funnel) never builds
  * the clique pair stage at all — the band-table self-join is absent
  * not just from a plan string but from the session's stage cache.
  */
class DedupStarSpec extends SparkSuite {

  private val M = 24 // identical-doc cluster size

  private def plantCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-star").toString
    import spark.implicits._
    val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val loners = Seq(
      (1000L, "completely different text one about weather patterns today", "en"),
      (1001L, "another unrelated document concerning harbor shipping logs", "en"))
    val docs = (1L to M.toLong).map(i => (i, dupText, "en")) ++ loners
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val plantedDir: String = plantCorpus()

  /** The pre-r15 clique-edge closure, recomputed explicitly — the
    * label baseline the migrated default chain must bit-match.
    */
  private def cliqueClusters(dir: String) =
    Dedup.ccFrom(Dedup.symEdges(spark, dir))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))

  test("star edges are linear on an identical-doc bucket; clique is quadratic") {
    val star = Dedup.lshStarEdges(spark, plantedDir).collect()
    assert(star.length == M - 1, s"expected ${M - 1} star edges, got ${star.length}")
    assert(star.forall(_.getLong(0) == 1L), "every star edge must anchor at the hub (min doc_id)")
    assert(star.map(_.getLong(1)).sorted.toSeq == (2L to M.toLong),
      "members must be exactly the non-hub cluster docs")
    // identical docs agree in ALL bands (16 perms / 4 rows = 4 bands)
    assert(star.forall(_.getLong(2) == 4L), "identical docs co-sign all 4 bands")

    val clique = Dedup.minhashLsh(spark, plantedDir).count()
    assert(clique == M.toLong * (M - 1) / 2,
      s"clique baseline must be m(m-1)/2 = ${M * (M - 1) / 2}, got $clique")
  }

  test("default dupClusters labels bit-match the clique closure on the planted corpus") {
    val viaDefault = Dedup.dupClusters(spark, plantedDir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaDefault.sameElements(cliqueClusters(plantedDir)))
    assert(viaDefault.length == M && viaDefault.forall(_._2 == 1L),
      "one cluster of the M identical docs, labeled by its min doc_id")
    // qd23 IS qd6 now: same session-cached frame, not a parallel build
    assert(Dedup.starClusters(spark, plantedDir) eq Dedup.dupClusters(spark, plantedDir),
      "qd23 must share qd6's cached CC build")
  }

  test("default dupClusters labels bit-match the clique closure on the real sf0.01 corpus") {
    val viaDefault = Dedup.dupClusters(spark, Sf01)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaDefault.nonEmpty && viaDefault.sameElements(cliqueClusters(Sf01)))
  }

  test("the default chain (qd6 AND qc1's funnel) never builds the clique pair stage") {
    // fresh corpus dir = fresh StageCache key space: nothing below may
    // instantiate the clique pair join or its symmetrized edge cache.
    // This is the structural no-band-self-join gate in its strongest
    // form — once stages checkpoint to LogicalRDDs a plan string can't
    // show what was built, but the stage cache can.
    val dir = plantCorpus()
    val labels = Dedup.dupClusters(spark, dir)
    assert(labels.count() == M.toLong)
    val funnel = graft.text.TextOps.corpusBuild(spark, dir)
    assert(funnel.count() >= 1L)
    assert(graft.util.StageCache.contains(spark, dir, "staredges_sym"),
      "the cluster chain must ride the symmetrized star edges")
    assert(!graft.util.StageCache.contains(spark, dir,
        s"lshpairs_16_4_${Dedup.LshMaxBucket}"),
      "qd2's clique pair stage must NOT be built by the default chain")
    assert(!graft.util.StageCache.contains(spark, dir, "ccedges"),
      "the clique symmetrization must NOT be built by the default chain")
  }

  test("minhashLsh fails loudly on a hot bucket, naming the remedies") {
    import spark.implicits._
    // planted band table: one (band, sig) bucket of 12 co-signed docs
    val bands = ((1L to 12L).map(d => (d, 0L, 777L)) ++
      Seq((20L, 1L, 1L), (21L, 1L, 2L))).toDF("doc_id", "band", "sig")
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshFrom(bands, maxBucket = 10L)
    }
    assert(e.getMessage.contains("hot (band, sig) bucket"))
    assert(e.getMessage.contains("maxBucket=10"))
    assert(e.getMessage.contains("12 co-signed documents"))
    assert(e.getMessage.contains("lshStarEdges"), "the star remedy must be named")
    // the boundary is admission: m == maxBucket passes and emits the
    // full clique of the bucket
    assert(Dedup.minhashLshFrom(bands, maxBucket = 12L).count() == 12L * 11 / 2)
    // Long.MaxValue disables the guard (no guard job, same pairs)
    assert(Dedup.minhashLshFrom(bands, maxBucket = Long.MaxValue).count() == 12L * 11 / 2)
  }

  test("ccFrom refuses to return unconverged labels when maxIter binds") {
    import spark.implicits._
    // a chain 1-2-3-...-8: diameter 7, so maxIter=1 cannot converge
    // (round 1 changes labels and the loop exhausts before a proving
    // no-change round)
    val chain = (1L until 8L).map(i => (i, i + 1))
    val edges = (chain ++ chain.map(_.swap)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.ccFrom(edges, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    assert(e.getMessage.contains("maxIter=1"))
    // with room to converge the same graph labels as one component
    val ok = Dedup.ccFrom(edges, maxIter = 20).collect()
    assert(ok.length == 8 && ok.forall(_.getLong(1) == 1L))
  }
}
