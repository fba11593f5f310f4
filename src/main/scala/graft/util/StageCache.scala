package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cache of shared pipeline stages, keyed by
  * (session, input dir, stage name). Queries compose the same upstream
  * stages (grid→fill→inject→features for time series, shingle→minhash
  * for dedup); materializing each stage once per session turns the
  * multi-pass pipelines into cache hits — the DataFrame analogue of a
  * staged intermediate table.
  *
  * Lifecycle: the key holds the SparkSession REFERENCE (identity
  * equality — unlike a bare identityHashCode, two live sessions can
  * never collide), and every `cached` call sweeps entries whose
  * SparkContext has stopped, releasing their localCheckpoint RDD
  * graphs. A cached DataFrame strongly references its own session, so
  * weak-reference schemes cannot reclaim anything while entries are
  * held — explicit eviction on session stop is the only correct
  * collection point. Sessions abandoned without stop() keep their
  * entries until the JVM exits; that is the cost of caching their
  * frames at all.
  */
object StageCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def sweepStopped(): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      if (it.next()._1.sparkContext.isStopped) it.remove()
    }
  }

  /** Test probe: has this stage been built in this session? Lets specs
    * assert NEGATIVE structure — e.g. that the default cluster chain
    * never builds the clique pair stage — which a plan string cannot
    * show once stages checkpoint to LogicalRDDs.
    */
  private[graft] def contains(spark: SparkSession, sfDir: String, name: String): Boolean =
    cache.containsKey((spark, sfDir, name))

  def cached(spark: SparkSession, sfDir: String, name: String)
            (build: => DataFrame): DataFrame = {
    sweepStopped()
    // get/putIfAbsent (not computeIfAbsent): stage builders nest, and
    // computeIfAbsent forbids reentrant updates.
    val key = (spark, sfDir, name)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      // localCheckpoint (not persist): materializes the stage AND
      // truncates lineage, so downstream plans reference a flat
      // LogicalRDD instead of re-embedding the whole upstream tree —
      // without this, multi-self-join queries (pipeline, LOF) blow up
      // Catalyst plan size (explainString OOMs before any task runs).
      // LAZY (eager = false): the first consumer's job computes and
      // persists the stage inline instead of each stage launching its
      // own materialization job — one scheduler round-trip per stage
      // saved, same total compute, and the plan is a flat LogicalRDD
      // either way. On a cluster this would be a reliable checkpoint /
      // staged table.
      cache.putIfAbsent(key, build.localCheckpoint(eager = false))
      cache.get(key)
    }
  }
}
