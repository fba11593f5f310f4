package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

class VectorExprSpec extends SparkSuite {

  test("native graft_dot equals the higher-order-function fold exactly") {
    VectorExprs.register(spark)
    val e = spark.read.parquet(s"$Sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      expr("graft_dot(v, v)").as("native"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)").as("hof"))
    // bit-identical: same ascending-index accumulation order
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("graft_dot participates in whole-stage codegen") {
    VectorExprs.register(spark)
    val e = spark.read.parquet(s"$Sf001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val plan = e.select(expr("graft_dot(v, v)")).queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage;
    // the expression must sit inside one, not fall back to interpreted eval
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.trim.startsWith("*(")),
      plan.take(500))
  }

  test("extensions class registers the function at session level") {
    val ext = new GraftExtensions()
    // structural smoke: applying to a fresh extensions object must not throw
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
