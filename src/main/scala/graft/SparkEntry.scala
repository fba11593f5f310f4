package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.Relational

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every implemented operator registers a `queries` entry; every
  * SQL-expressible one also registers a DuckDB oracle in `oracleSql`
  * with IDENTICAL column names/types (floats rounded to 4 dp).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qa1_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "qa2_revenue_join" -> ((s, d) => Relational.revenueByNation(s, d)),
    "qa3_top_n" -> ((s, d) => Relational.topCustomersPerSegment(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "qa1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
         round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "qa2_revenue_join" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "qa3_top_n" ->
      """SELECT c_mktsegment, rnk, c_custkey, c_name, total_spend FROM (
           SELECT c_mktsegment, c_custkey, c_name,
                  round(sum(o_totalprice), 4) AS total_spend,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY round(sum(o_totalprice), 4) DESC, c_custkey) AS rnk
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment, c_custkey, c_name
         ) WHERE rnk <= 3""",
  )
}
