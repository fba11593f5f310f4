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
}
