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
    * previous stage's first occurrence. Each stage is one conditional
    * aggregation; the stage chain is a sequence of per-user joins on an
    * already-partitioned frame.
    */
  def funnel(spark: SparkSession, sfDir: String,
             stages: Seq[String] = Seq("signup", "view", "click", "purchase")): DataFrame = {
    val ev = epochSec(spark, sfDir).cache()
    var reached = ev.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("tsec").as("t0"))
    val counts = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    counts += stages.head -> reached.count()
    for (st <- stages.tail) {
      reached = ev.filter(col("event_type") === st)
        .join(reached, "user_id")
        .filter(col("tsec") > col("t0"))
        .groupBy("user_id").agg(min("tsec").as("t0"))
      counts += st -> reached.count()
    }
    import ev.sparkSession.implicits._
    counts.zipWithIndex.map { case ((st, n), i) => (i + 1, st, n) }.toSeq
      .toDF("stage", "event_type", "n_users")
  }
}
