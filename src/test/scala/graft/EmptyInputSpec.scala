package graft

import org.apache.spark.sql.SaveMode

/** Degenerate-input robustness: every registered query must RUN (not
  * necessarily return rows) on a dataset directory whose tables are all
  * EMPTY but carry the production schemas. At 100 TB this is the
  * "partition with no data / brand-new tenant / filtered-to-nothing"
  * path — an operator that throws on it takes the whole job down.
  * (ADVICE r4 caught exactly this class of bug in qp2's exact-distinct
  * map; this spec makes the guarantee blanket.)
  */
class EmptyInputSpec extends SparkSuite {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$Sf001/$t.parquet").limit(0)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query runs on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty, s"queries crashing on empty input:\n${failures.mkString("\n")}")
  }
}
