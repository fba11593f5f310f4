package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, HotReport}
import graft.tools.GenHot

/** The guard family's report-mode pre-flight (qh1/qh2) and its
  * committed corpus: the committed `hotdata/` parquet is the
  * generator's output, the planted 100-strong groups fire EVERY
  * family at the registered caps with the exact clique arithmetic the
  * refusal messages quote, the production-cap report on the zipf gate
  * corpus is clean, and the report's verdicts agree with the guards
  * themselves (an over-cap family in the report refuses as a build).
  */
class HotReportSpec extends SparkSuite {

  test("the COMMITTED hot corpus (SparkEntry.HotDir) is the generator's output") {
    val docs = spark.read.parquet(s"${SparkEntry.HotDir}/documents.parquet")
    val regenD = GenHot.hotDocuments(spark)
    assert(docs.except(regenD).count() === 0 && regenD.except(docs).count() === 0)
    val emb = spark.read.parquet(s"${SparkEntry.HotDir}/embeddings.parquet")
    val regenE = GenHot.hotEmbeddings(spark)
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
    assert(emb.count() === regenE.count())
    assert(flat(emb).except(flat(regenE)).count() === 0 &&
      flat(regenE).except(flat(emb)).count() === 0)
  }

  test("qh2: every guarded family fires on the planted clique with exact pair arithmetic") {
    val rep = HotReport.hotBlockReport(spark, SparkEntry.HotDir,
      maxBucket = 50, maxBlock = 50, maxLabel = 70, maxCell = 70)
      .collect()
    // the pair product every refusal message quotes: m(m-1)/2, exact
    assert(rep.forall(r => r.getLong(3) === r.getLong(2) * (r.getLong(2) - 1) / 2))
    def fam(f: String) = rep.filter(_.getString(0) == f)
    // qd2: the byte-identical clique co-signs ALL 4 bands → 4 buckets of exactly 100
    assert(fam("qd2_lsh_bucket").length === 4 &&
      fam("qd2_lsh_bucket").forall(_.getLong(2) === 100L))
    // qd4: the planted (en, n_chars/20) block carries the whole clique
    val blk = fam("qd4_len_block")
    assert(blk.exists(r => r.getString(1).startsWith("en:") && r.getLong(2) >= 100L))
    // qd5: label 0 is exactly the planted 100
    val lab = fam("qd5_label")
    assert(lab.length === 1 && lab.head.getString(1) === "0" && lab.head.getLong(2) === 100L)
    // qd11: the archetype clique concentrates one seeded cell past cap
    assert(fam("qd11_ivf_cell").exists(_.getLong(2) >= 100L))
  }

  test("qh1: the production-cap report is CLEAN on the committed zipf gate corpus") {
    assert(HotReport.hotBlockReport(spark, SparkEntry.ZipfDir).count() === 0,
      "every qz* build runs green on zipfdata — the pre-flight must agree")
  }

  test("the report's verdict agrees with the guards: over-cap families refuse as builds") {
    // same caps as the qh2 registration — each family the report
    // flags must refuse loudly when built (detection arithmetic is
    // ONE definition, not two)
    intercept[IllegalArgumentException] {
      Dedup.minhashLsh(spark, SparkEntry.HotDir, maxBucket = 50L).count()
    }
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccard(spark, SparkEntry.HotDir, maxBlock = 50L).count()
    }
    intercept[IllegalArgumentException] {
      graft.vector.Similarity.embedNearDup(spark, SparkEntry.HotDir, maxLabel = 70L).count()
    }
    intercept[IllegalArgumentException] {
      graft.vector.Similarity.semanticDedup(spark, SparkEntry.HotDir, maxCell = 70L).count()
    }
  }

  test("qc6/qc7: the funnel manifest carries the pre-flight verdict (report-then-build)") {
    import org.apache.spark.sql.functions._
    // planted corpus at qh2's caps: every manifest row surfaces ALL
    // FOUR would-be-hot families — and the build half still ran (the
    // caps are the pre-flight's knobs, not the build's: at production
    // caps the same funnel builds clean)
    val firing = graft.text.TextOps.corpusBuildPreflight(spark, SparkEntry.HotDir,
      maxBucket = 50, maxBlock = 50, maxLabel = 70, maxCell = 70).collect()
    assert(firing.nonEmpty && firing.forall(r =>
      r.getAs[String]("hot_families") ===
        "qd11_ivf_cell,qd2_lsh_bucket,qd4_len_block,qd5_label" &&
      r.getAs[Long]("hot_groups") === 8L))
    assert(firing.map(r => r.getAs[Long]("n_docs")).sum > 0,
      "the funnel itself must have run to a live manifest")
    // the committed zipf gate corpus at PRODUCTION caps: verdict clean
    val clean = graft.text.TextOps.corpusBuildPreflight(spark, SparkEntry.ZipfDir).collect()
    assert(clean.nonEmpty && clean.forall(r =>
      r.getAs[Long]("hot_groups") === 0L && r.getAs[String]("hot_families") === ""))
  }
}
