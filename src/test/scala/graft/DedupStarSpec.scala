package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** qd22/qd23: the star reduction of LSH candidate generation.
  *
  * The planted corpus is the hot-bucket worst case the star exists
  * for: one cluster of IDENTICAL documents (all band buckets agree) —
  * the shape of a boilerplate/template cluster in a web crawl, where
  * qd2's within-bucket clique goes quadratic. The spec pins (a) the
  * star's edge count is LINEAR in the cluster (m−1 edges, hub = min
  * doc_id, co-signed in all 4 bands) while the clique is m(m−1)/2,
  * and (b) the clusters computed over star edges are bit-identical to
  * qd6's clique-edge clusters — on the planted corpus AND on the real
  * sf0.01 corpus (where the oracle gate also enforces it vs DuckDB's
  * recursive closure).
  */
class DedupStarSpec extends SparkSuite {

  private val M = 24 // identical-doc cluster size

  private lazy val plantedDir: String = {
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

  test("star clusters bit-match clique clusters on the planted corpus") {
    val viaStar = Dedup.starClusters(spark, plantedDir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaClique = Dedup.dupClusters(spark, plantedDir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaStar.sameElements(viaClique))
    assert(viaStar.length == M && viaStar.forall(_._2 == 1L),
      "one cluster of the M identical docs, labeled by its min doc_id")
  }

  test("star clusters bit-match clique clusters on the real sf0.01 corpus") {
    val viaStar = Dedup.starClusters(spark, Sf01)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaClique = Dedup.dupClusters(spark, Sf01)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaStar.nonEmpty && viaStar.sameElements(viaClique))
  }
}
