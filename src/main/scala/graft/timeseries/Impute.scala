package graft.timeseries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Num

/** Anomaly-span imputation (reference: src/anomaly_imputation/ — the
  * bi-LSTM denoising AE capability — and src/data_processing/
  * fill_missing_values.py). Re-expressed as scalable closed-form
  * imputers: linear interpolation, seasonal (weekly) fill, and the KNN
  * window imputer. All partition by series; the KNN imputer joins
  * anomalous windows against clean windows of the same series.
  */
object Impute {

  /** Full contaminated series (t = win*24 + pos) with anomaly flags. */
  private def flaggedSeries(spark: SparkSession, sfDir: String): DataFrame =
    TsCore.injected(spark, sfDir)
      .select(col("series"), (col("win") * TsCore.DaySize + col("pos")).as("t"),
        col("win"), col("pos"), col("v_anom"), col("is_anom"))

  /** q44: masked-span training pairs for the denoising autoencoder
    * (ref anomaly_imputation/dataset_ai.py:15-25: each window gets ONE
    * random zero-masked span of `maskSize`, yielding (clean, masked,
    * mask) triples). The mask position is a deterministic LCG draw per
    * (series, win) — same key family as the anomaly injector, salt 8 —
    * over [0, daySize − maskSize − 1), mirroring the reference's
    * randint bound. Map-side after the shared complete-window stage;
    * partition key (series, win).
    */
  def maskedPairs(spark: SparkSession, sfDir: String, maskSize: Int = 8): DataFrame = {
    require(maskSize >= 1 && maskSize < TsCore.DaySize - 1,
      s"maskSize=$maskSize: the reference draws mask starts from [0, daySize - maskSize - 1)")
    val hi = TsCore.DaySize - maskSize - 1
    val mi = TsCore.winKeys(spark, sfDir)
      .select(col("series"), col("win"),
        floor(TsCore.lcg(col("key"), 8) * hi).cast("long").as("mi"))
    TsCore.dayWindows(spark, sfDir)
      .join(mi, Seq("series", "win"))
      .withColumn("mask",
        when(col("pos") >= col("mi") && col("pos") < col("mi") + maskSize, 0).otherwise(1))
      .select(col("series"), col("win"), col("pos"), col("v"), col("mask"),
        when(col("mask") === 0, lit(0.0)).otherwise(col("v")).as("v_masked"))
  }

  /** q18: linear interpolation across flagged spans — for each flagged
    * point, interpolate between the nearest clean points on both sides.
    */
  def imputeLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val wPrev = Window.partitionBy("series").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("series").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val vc = when(col("is_anom") === 0, col("v_anom"))
    val tc = when(col("is_anom") === 0, col("t"))
    flaggedSeries(spark, sfDir)
      .withColumn("vp", last(vc, ignoreNulls = true).over(wPrev))
      .withColumn("tp", last(tc, ignoreNulls = true).over(wPrev))
      .withColumn("vn", first(vc, ignoreNulls = true).over(wNext))
      .withColumn("tn", first(tc, ignoreNulls = true).over(wNext))
      .select(col("series"), col("t"), col("is_anom").as("was_anom"),
        Num.r4(when(col("is_anom") === 0, col("v_anom"))
          .when(col("vp").isNotNull && col("vn").isNotNull,
            col("vp") + (col("vn") - col("vp")) * (col("t") - col("tp")) / (col("tn") - col("tp")))
          .otherwise(coalesce(col("vp"), col("vn")))).as("v_imp"))
  }

  /** q19: seasonal fill — flagged points take the same hour-of-week from
    * the nearest clean week (1 back, 1 fwd, 2 back, 2 fwd), like
    * fill_missing_values.py fill_empty_days walks prev/next weeks.
    */
  def imputeSeasonal(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("series").orderBy("t")
    val vc = when(col("is_anom") === 0, col("v_anom"))
    val L = TsCore.WeekLag
    flaggedSeries(spark, sfDir)
      .withColumn("imp", coalesce(lag(vc, L).over(w), lead(vc, L).over(w),
                                  lag(vc, 2 * L).over(w), lead(vc, 2 * L).over(w)))
      .select(col("series"), col("t"), col("is_anom").as("was_anom"),
        Num.r4(when(col("is_anom") === 0, col("v_anom")).otherwise(col("imp"))).as("v_imp"))
  }

  /** q20: KNN window imputer (ref fill_missing_values.py
    * replace_value_by_nn, sklearn KNNImputer semantics): for each window
    * containing flagged points, find the k nearest clean windows of the
    * same series by nan-euclidean distance over the window's clean
    * positions — d = sqrt(D/n_obs · Σ_obs (a−b)²) — and fill each flagged
    * position with the neighbours' mean at that position.
    */
  def imputeKnn(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val inj = TsCore.injected(spark, sfDir)
    val winFlag = inj.groupBy("series", "win").agg(max("is_anom").as("anyanom"))
    val anomW = inj.join(winFlag.filter(col("anyanom") === 1).select("series", "win"), Seq("series", "win"))
    val cleanW = inj.join(winFlag.filter(col("anyanom") === 0).select("series", "win"), Seq("series", "win"))
      .select(col("series"), col("win").as("cwin"), col("pos"), col("v_anom").as("cv"))
    // distance over the anomalous window's clean positions
    val dists = anomW.filter(col("is_anom") === 0)
      .join(cleanW, Seq("series", "pos"))
      .groupBy("series", "win", "cwin")
      .agg(sqrt(lit(TsCore.DaySize.toDouble) / count(lit(1)) *
        sum((col("v_anom") - col("cv")) * (col("v_anom") - col("cv")))).as("d"))
    val wNear = Window.partitionBy("series", "win").orderBy(col("d"), col("cwin"))
    val nbrs = dists.withColumn("rn", row_number().over(wNear)).filter(col("rn") <= k)
    anomW.filter(col("is_anom") === 1).select("series", "win", "pos")
      .join(nbrs.select("series", "win", "cwin"), Seq("series", "win"))
      .join(cleanW, Seq("series", "cwin", "pos"))
      .groupBy("series", "win", "pos")
      .agg(Num.r4(avg("cv")).as("v_imp"))
  }
}
