package graft.timeseries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset of the denoised memory bank (reference:
  * src/anomaly_detection/sampler.py GreedyCoresetSampler /
  * ApproximateGreedyCoresetSampler).
  *
  * Scale: greedy k-center is inherently sequential, but the standard
  * two-level composition keeps it cluster-safe: each partition reduces
  * its points to a local coreset (same ratio) via mapPartitions, the
  * driver then runs the final greedy over ≤ `driverCap` candidates.
  * The result is a 2-approximation of the single-level coreset, and the
  * selected set stays small enough to broadcast into the scorer.
  * Determinism: start point = argmax distance from the candidate mean;
  * all ties break on lowest (id, pos).
  */
object Coreset {

  /** Local greedy k-center over an indexed feature array; returns selected
    * indices in selection order.
    */
  private[graft] def greedy(feats: Array[Array[Double]], k: Int): Array[Int] = {
    val n = feats.length
    if (n == 0 || k <= 0) return Array.empty
    val dim = feats(0).length
    val mean = new Array[Double](dim)
    for (f <- feats; i <- 0 until dim) mean(i) += f(i) / n
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val minDist = Array.fill(n)(Double.MaxValue)
    val chosen = Array.fill(n)(false)
    var cur = 0
    var best = -1.0
    for (i <- 0 until n) { val d = d2(feats(i), mean); if (d > best) { best = d; cur = i } }
    val out = new Array[Int](math.min(k, n))
    var s = 0
    while (s < out.length) {
      out(s) = cur
      chosen(cur) = true
      var nxt = -1; var bd = -1.0
      for (i <- 0 until n) {
        val d = d2(feats(i), feats(cur))
        if (d < minDist(i)) minDist(i) = d
        if (!chosen(i) && minDist(i) > bd) { bd = minDist(i); nxt = i }
      }
      // all remaining are duplicates of selected points → take the first
      if (nxt < 0) nxt = chosen.indexOf(false)
      cur = if (nxt >= 0) nxt else cur
      s += 1
    }
    out
  }

  /** q13: coreset over the denoised bank (patches whose nearest-distance
    * weight is below the 1−threshold quantile; ref softpatch.py
    * _fill_memory_bank denoising, threshold=0.15). Returns the selected
    * patches with selection order. Driver-side greedy over candidates;
    * two-level pre-reduction when candidates exceed `driverCap`.
    */
  def coreset(spark: SparkSession, sfDir: String, frac: Double = 0.1,
              denoiseThr: Double = 0.15, driverCap: Int = 200000): DataFrame = {
    import spark.implicits._
    val (bank, _) = TsCore.bankAndTest(spark, sfDir)
    val w = Detect.nearestDistWeight(spark, sfDir)
      .withColumn("wgt", col("w_nearest") + 1.0)
    val thr = w.agg(expr(s"percentile(wgt, ${1.0 - denoiseThr})").as("thr"))
    val bid = bank.withColumn("id", concat_ws("#", col("series"), col("win")))
    val kept = bid.join(w, Seq("id", "pos")).crossJoin(broadcast(thr))
      .filter(col("wgt") <= col("thr"))
      .select((Seq("id", "pos").map(col) ++ Detect.FeatCols.map(col)): _*)
      .orderBy("id", "pos")

    val nKept = kept.count()
    val candidates: Array[Row] =
      if (nKept <= driverCap) kept.collect()
      else {
        // two-level: local greedy per partition down to the driver cap
        val perPart = math.max(1, driverCap / kept.rdd.getNumPartitions)
        kept.rdd.mapPartitions { it =>
          val rows = it.toArray
          val feats = rows.map(r => Detect.FeatCols.indices.map(i => r.getDouble(2 + i)).toArray)
          greedy(feats, math.min(perPart, rows.length)).iterator.map(rows)
        }.collect()
      }
    val feats = candidates.map(r => Detect.FeatCols.indices.map(i => r.getDouble(2 + i)).toArray)
    val k = math.max(1, math.ceil(candidates.length * frac).toInt)
    val sel = greedy(feats, k)
    val out = sel.zipWithIndex.map { case (idx, ord) =>
      (candidates(idx).getString(0), candidates(idx).getLong(1), ord)
    }
    out.toSeq.toDF("id", "pos", "sel_order")
  }
}
