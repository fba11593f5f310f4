package graft

import org.apache.spark.sql.functions._
import graft.analytics.Relational
import graft.util.Tables

/** Physical-plan quality gates: the properties that keep these plans
  * viable at 100 TB, asserted against explain output so regressions
  * (a lost broadcast, a widened scan) fail loudly.
  */
class PlanSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("star join broadcasts the dimension tables (no sort-merge join)") {
    val p = plan(Relational.revenueByNation(spark, Sf01))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join in:\n$p")
  }

  test("parquet scan prunes to the referenced columns only") {
    val p = plan(Tables.events(spark, Sf01)
      .select(col("event_type"), col("value"))
      .groupBy("event_type").agg(sum("value")))
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("props"), "unreferenced column must not be read")
    assert(!p.contains("user_id"), "unreferenced column must not be read")
  }

  test("filters push down to the parquet scan") {
    val p = plan(Tables.lineitem(spark, Sf01)
      .filter(col("l_quantity") < 5.0).select("l_orderkey"))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)]"),
      s"expected pushdown in:\n$p")
  }

  test("grouped aggregation is whole-stage codegen'd with partial agg") {
    val df = Tables.lineitem(spark, Sf01)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    // map-side combine: a partial_sum before the exchange
    assert(plan(df).contains("partial_sum"), plan(df))
    val cg = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen"), cg.take(2000))
  }
}
