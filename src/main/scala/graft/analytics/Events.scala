package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Event-stream analytics over the per-user axis — the dimension that
  * grows with data volume (users scale with sf; the time range does
  * not). Both operators shuffle once on user_id and are embarrassingly
  * parallel across users at 100 TB.
  */
object Events {

  private def epochSec(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.events(spark, sfDir)
    val sec = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _ => col("ts").cast("long")
    }
    raw.select(col("event_id"), col("user_id"), col("event_type"), sec.as("tsec"))
  }

  /** qe1: sessionization — gaps-and-islands: a new session starts after
    * `gapSec` of inactivity; session stats per (user, session).
    */
  def sessionize(spark: SparkSession, sfDir: String, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    epochSec(spark, sfDir)
      .withColumn("prev", lag("tsec", 1).over(w))
      .withColumn("newsess",
        when(col("prev").isNull || col("tsec") - col("prev") > gapSec, 1).otherwise(0))
      .withColumn("session_id", sum("newsess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("tsec").as("start_epoch"), max("tsec").as("end_epoch"),
        (max("tsec") - min("tsec")).as("duration_s"))
  }

  /** qp1: column profiling — per-column null count, distinct count,
    * min/max in ONE pass over the table (conditional aggregates, no
    * per-column re-scan; the lake-health primitive).
    */
  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.util.Num
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables.lineitem(spark, sfDir).select(cols.map(col): _*)
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        Num.r4(min(col(c))).as(s"${c}_min"), Num.r4(max(col(c))).as(s"${c}_max"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"), col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_min").as("min_v"), col(s"${c}_max").as("max_v"))): _*)).as("p"))
      .select("p.*")
  }

  /** qe2: ordered funnel — users reaching each stage strictly after the
    * previous stage's first occurrence. ONE shuffle: events group to a
    * per-user array, and the stage chain is a per-row scalar fold
    * (filter/min HOFs referencing the previous stage's time) — no
    * per-stage join or action. Funnel events per user are bounded, so
    * the array is safe at 100 TB; other event types are filtered before
    * the shuffle.
    */
  def funnel(spark: SparkSession, sfDir: String,
             stages: Seq[String] = Seq("signup", "view", "click", "purchase")): DataFrame = {
    val perUser = epochSec(spark, sfDir)
      .filter(col("event_type").isin(stages: _*))
      .groupBy("user_id")
      .agg(collect_list(struct(col("tsec"), col("event_type"))).as("evs"))
    val withTimes = stages.zipWithIndex.foldLeft(perUser) { case (acc, (st, i)) =>
      val cond =
        if (i == 0) s"x.event_type = '$st'"
        else s"x.event_type = '$st' AND t${i - 1} IS NOT NULL AND x.tsec > t${i - 1}"
      acc.withColumn(s"t$i",
        expr(s"array_min(transform(filter(evs, x -> $cond), x -> x.tsec))"))
    }
    val aggs = stages.indices.map(i => count(col(s"t$i")).as(s"n$i"))
    withTimes.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).as("stage"), lit(st).as("event_type"), col(s"n$i").as("n_users"))
      }: _*)).as("r"))
      .select("r.*")
  }
}
