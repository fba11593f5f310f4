package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-aware dimension-join policy — the one place that decides how a
  * per-key "model frame" (scale bounds, split boundaries, fitted
  * coefficients) joins back onto row-scale data.
  *
  * Two cardinality classes, two strategies:
  *
  *   - STRUCTURALLY BOUNDED dims (≤ 24 patch positions, |event_types|,
  *     nBins histogram rows): the caller states the bound and the join
  *     broadcasts unconditionally — the bound is a property of the
  *     operator, not the data, so it holds at any scale.
  *
  *   - DATA-SCALED dims (one row per series / meter / label): at test SF
  *     these are 5 rows, at 100 TB they are millions — a hard-coded
  *     `broadcast()` would ship tens-to-hundreds of MB to every executor
  *     and OOM the driver first. These joins carry NO static hint: the
  *     planner + AQE pick the strategy from the RUNTIME size of the dim
  *     stage — broadcast-hash below `spark.sql.autoBroadcastJoinThreshold`
  *     (10 MB default; AQE re-plans after the dim's shuffle stage
  *     materializes, so the big side's exchange is elided exactly as with
  *     a static hint), shuffled join above it, where both sides hash on
  *     the join key. That is the size gate the hard-coded hint lacked,
  *     evaluated against real bytes instead of a guess.
  *
  * PlanSpec gates both behaviors.
  */
object Joins {

  /** Row bound under which a dimension may be declared broadcastable by
    * construction: 64 Ki rows × a few hundred bytes/row stays ≲ 10 MB —
    * inside the default autoBroadcastJoinThreshold with slack. Callers
    * pass `Some(bound)` only for dims whose cardinality is fixed by the
    * OPERATOR (positions, event types, bins, folds), never for per-key
    * frames that grow with the data.
    */
  val BroadcastRowBound: Long = 1L << 16

  /** Join `big` against dimension frame `dim` on `keys`.
    *
    * @param boundedRows `Some(n)`: the dim is structurally bounded by n
    *   rows (must be ≤ [[BroadcastRowBound]]) — broadcast outright.
    *   `None`: the dim scales with the data (|series|, |users|, …) —
    *   leave the strategy to the planner + AQE's runtime size gate.
    */
  def dimJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
              boundedRows: Option[Long], joinType: String = "inner"): DataFrame =
    boundedRows match {
      case Some(n) =>
        require(n > 0 && n <= BroadcastRowBound,
          s"boundedRows=$n exceeds BroadcastRowBound=$BroadcastRowBound: " +
            "a dim this large must use the size-aware (None) path")
        big.join(broadcast(dim), keys, joinType)
      case None => big.join(dim, keys, joinType)
    }
}
