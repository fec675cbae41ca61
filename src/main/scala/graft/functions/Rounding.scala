package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Oracle-mirrored rounding.
  *
  * Spark's `round` (BigDecimal HALF_UP on the exact binary value) and
  * DuckDB's `round` (scale-multiply then round) can disagree by one final
  * digit when a result lands exactly on a rounding boundary — which
  * small-denominator rationals (token ratios, Jaccard k/m) do
  * systematically. Both sides of such queries therefore use the SAME
  * explicit formula, floor(x * 10^n + 0.5) / 10^n (positive inputs), so
  * the float ops — and the result — are identical everywhere.
  */
object Rounding {

  def mirrorRound(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** DuckDB fragment with the identical operations. */
  def sqlMirrorRound(e: String, n: Int): String = {
    val f = s"1${"0" * n}.0"
    s"(floor(($e) * $f + 0.5) / $f)"
  }
}
