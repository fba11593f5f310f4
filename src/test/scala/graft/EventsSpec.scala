package graft

import org.apache.spark.sql.functions._
import graft.analytics.Events

class EventsSpec extends SparkSuite {

  test("sessions have nonnegative durations and consecutive ids per user") {
    val s = Events.sessionize(spark, Sf001).cache()
    assert(s.count() > 0)
    assert(s.filter(col("duration_s") < 0).count() === 0)
    val maxVsCount = s.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
    assert(maxVsCount.filter(col("mx") =!= col("n")).count() === 0,
      "session ids must be 1..n per user")
  }

  test("funnel stage counts are monotonically non-increasing") {
    val f = Events.funnel(spark, Sf001).orderBy("stage").collect()
    assert(f.length === 4)
    val ns = f.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a }, ns.mkString(","))
    assert(ns.head > 0)
  }

  test("profile covers every requested column with sane bounds") {
    val p = Events.profile(spark, Sf001).cache()
    assert(p.count() === 4)
    assert(p.filter(col("min_v") > col("max_v")).count() === 0)
    assert(p.filter(col("n_distinct") <= 0).count() === 0)
  }
}
