package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cache of shared pipeline stages, keyed by
  * (session, input dir, stage name). Queries compose the same upstream
  * stages (grid→fill→inject→features for time series, shingle→minhash
  * for dedup); materializing each stage once per session turns the
  * multi-pass pipelines into cache hits — the DataFrame analogue of a
  * staged intermediate table.
  *
  * The outer map holds the SparkSession weakly: when a session is
  * GC'd its stage entries (and their localCheckpoint RDDs) go with it,
  * and a fresh session can never collide with a dead one's key — the
  * two failure modes of an identityHashCode-keyed flat map.
  */
object StageCache {

  private val sessions =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  private def forSession(spark: SparkSession) = sessions.synchronized {
    var m = sessions.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
      sessions.put(spark, m)
    }
    m
  }

  def cached(spark: SparkSession, sfDir: String, name: String)
            (build: => DataFrame): DataFrame = {
    val cache = forSession(spark)
    // get/putIfAbsent (not computeIfAbsent): stage builders nest, and
    // computeIfAbsent forbids reentrant updates.
    val key = (sfDir, name)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      // localCheckpoint (not persist): materializes the stage AND
      // truncates lineage, so downstream plans reference a flat
      // LogicalRDD instead of re-embedding the whole upstream tree —
      // without this, multi-self-join queries (pipeline, LOF) blow up
      // Catalyst plan size (explainString OOMs before any task runs).
      // On a cluster this would be a reliable checkpoint / staged table.
      cache.putIfAbsent(key, build.localCheckpoint())
      cache.get(key)
    }
  }
}
