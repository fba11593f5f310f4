package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Engine-agnostic 4-dp quantization. `round()` semantics differ between
  * Spark (BigDecimal HALF_UP on the decimal expansion) and DuckDB
  * (multiply + C round), which flips the last digit when a value lands on
  * a .00005 boundary. floor(x*1e4 + 0.5)/1e4 runs the identical IEEE ops
  * in both engines, so identical inputs give identical outputs.
  */
object Num {
  def r4(c: Column): Column = floor(c * 10000d + 0.5d) / 10000d

  /** SQL form for the DuckDB oracle — must mirror r4 exactly. */
  def r4sql(e: String): String = s"floor(($e)*10000 + 0.5)/10000"

  /** Order-independent float sum: quantize each element to the 1e-4
    * grid, accumulate as exact integers, scale back. A raw float
    * `sum()` depends on partition/accumulation order and can flip the
    * 4th decimal between engines or between identical runs; this form
    * is bit-deterministic whenever the per-element values are
    * (fixed-point money arithmetic, in effect). Keep |Σ|·1e4 < 2^63.
    */
  def sumQ4(c: Column): Column =
    org.apache.spark.sql.functions.sum(floor(c * 10000d + 0.5d).cast("long")) / 10000d

  /** SQL form for the DuckDB oracle — must mirror sumQ4 exactly
    * (the BIGINT cast also defuses DuckDB's SUM→HUGEINT widening).
    */
  def sumQ4sql(e: String): String =
    s"sum(CAST(floor(($e)*10000 + 0.5) AS BIGINT)) / 10000.0"

  /** Deterministic hashed uniform in [−0.5, 0.5): Knuth multiplicative
    * hash of an integer key, scaled. Pure int64 arithmetic with the
    * product kept < 2^63 for any |key| < 2^31, so the DuckDB mirror
    * `(((1 + key*2654435761) % 2147483648)::DOUBLE / 2147483648.0) - 0.5`
    * is exact. Every pseudo-random weight family in the engine (LSH
    * hyperplanes, JL projections) derives from this ONE formula —
    * change it here and in the oracle together.
    */
  def hashedUniform(key: Long): Double =
    ((1L + key * 2654435761L) % 2147483648L).toDouble / 2147483648.0 - 0.5
}
