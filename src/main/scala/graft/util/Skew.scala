package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. A hot grouping key
  * (one series with 100× the traffic of the rest) turns a single
  * reducer into the stage's straggler; salting splits each key into
  * `buckets` sub-keys for the first (map-heavy) aggregation, then a
  * second tiny aggregation merges the partials. Works for any
  * algebraic aggregate (sum/count/min/max — here sum+count+min+max,
  * enough to rebuild avg).
  */
object Skew {

  def saltedStats(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  buckets: Int = 16): DataFrame = {
    val keyed = df.withColumn("_salt",
      pmod(xxhash64(col(valueCol), monotonically_increasing_id()), lit(buckets.toLong)))
    val partial = keyed
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_s"), count(valueCol).as("_n"),
        min(valueCol).as("_mn"), max(valueCol).as("_mx"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum("_s").as("sum_v"), sum("_n").as("n"),
        min("_mn").as("min_v"), max("_mx").as("max_v"))
      .withColumn("avg_v", col("sum_v") / col("n"))
  }
}
