package graft.timeseries

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Num

/** q26: MLlib pipeline forecast — the same lag-feature regression as the
  * closed-form q22, but trained through spark.ml (VectorAssembler +
  * LinearRegression with the deterministic "normal" solver), one model
  * per series. Demonstrates the MLlib-pipeline capability of the
  * reference's forecasting module (seq2seq/SCINet training loop →
  * estimator/transformer pipeline); coefficients agree with q22's
  * normal equations (asserted in ForecastImputeSpec).
  *
  * The per-series model loop is a driver loop over a handful of dim-table
  * entries; each fit is a distributed normal-equations solve.
  */
object MllibForecast {

  def mllibForecast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy("series").orderBy("t")
    val base = TsCore.filled(spark, sfDir)
      .select(col("series"), col("t"), col("v_filled").as("y"))
      .withColumn("x1", lag("y", 1).over(w))
      .withColumn("x2", lag("y", TsCore.DaySize).over(w))
      .withColumn("x3", lag("y", TsCore.WeekLag).over(w))
      .join(broadcast(TsCore.splitBoundary(spark, sfDir)
        .select(col("series"), (col("mwin") * TsCore.DaySize).as("tsplit"))), "series")
      .filter(col("y").isNotNull && col("x1").isNotNull &&
              col("x2").isNotNull && col("x3").isNotNull)
      .localCheckpoint() // materialize once, up front, for the concurrent fits
    val assembler = new VectorAssembler()
      .setInputCols(Array("x1", "x2", "x3")).setOutputCol("features")
    val lr = new LinearRegression()
      .setFeaturesCol("features").setLabelCol("y")
      .setSolver("normal").setRegParam(0.0).setStandardization(false)
    val seriesList = base.select("series").distinct().as[String].collect().sorted
    // Concurrent driver loop: each per-series fit is an independent set
    // of Spark jobs over the checkpointed base — running them in
    // parallel overlaps their scheduling + aggregation latency (the
    // normal-solver fit is 2-3 small jobs each).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val rows = seriesList.map { s =>
      Future {
        val train = assembler.transform(base.filter(col("series") === s && col("t") < col("tsplit")))
        val test = assembler.transform(base.filter(col("series") === s && col("t") >= col("tsplit")))
        val model = lr.fit(train)
        val pred = model.transform(test)
        val err = pred.agg(
          avg(abs(col("y") - col("prediction"))).as("mae"),
          sqrt(avg((col("y") - col("prediction")) * (col("y") - col("prediction")))).as("rmse"))
          .head()
        (s, model.intercept, model.coefficients(0), model.coefficients(1), model.coefficients(2),
          err.getDouble(0), err.getDouble(1))
      }
    }.map(Await.result(_, Duration.Inf))
    rows.toSeq.toDF("series", "b0", "b1", "b2", "b3", "mae", "rmse")
      .select(col("series"), Num.r4(col("b0")).as("b0"), Num.r4(col("b1")).as("b1"),
        Num.r4(col("b2")).as("b2"), Num.r4(col("b3")).as("b3"),
        Num.r4(col("mae")).as("mae"), Num.r4(col("rmse")).as("rmse"))
  }
}
