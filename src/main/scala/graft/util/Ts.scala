package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr, floor}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Normalization of the events `ts` column across the physical encodings
  * the driver's generator has shipped over rounds:
  *
  *   - TIMESTAMP(NANOS) surfaced as raw nanos `long` (the
  *     `spark.sql.legacy.parquet.nanosAsLong` path Spark 4 requires for
  *     nanosecond parquet),
  *   - TIMESTAMP (tz-aware, micros),
  *   - TIMESTAMP_NTZ (pandas-written `timestamp[us]` without a zone —
  *     what the current testdata carries).
  *
  * All sessions here run with `spark.sql.session.timeZone=UTC`, so the
  * NTZ wall-clock IS the UTC instant and `cast(ntz → timestamp → long)`
  * yields the same truncated epoch seconds DuckDB's
  * `CAST(floor(epoch(ts)) AS BIGINT)` computes in the oracles.
  *
  * Every operator that reads events derives time through these two
  * helpers, so a future encoding change is a one-file fix.
  */
object Ts {

  /** Truncated epoch seconds of `ts`. */
  def sec(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType           => expr("ts div 1000000000")
    case _: TimestampNTZType => col("ts").cast(TimestampType).cast("long")
    case _                  => col("ts").cast("long")
  }

  /** Absolute hour bucket of `ts` (epoch seconds div 3600). */
  def hour(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 3600000000000")
    case _        => floor(sec(df) / 3600L).cast("long")
  }
}
