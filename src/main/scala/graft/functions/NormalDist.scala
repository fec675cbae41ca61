package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Standard-normal tail probability as ONE fixed double expression,
  * mirrored verbatim by the oracle (the [[Rounding]] contract applied to
  * a special function): neither Spark nor DuckDB ships an erf/Φ built-in
  * both engines agree on bitwise, so both sides evaluate the SAME
  * Abramowitz & Stegun 26.2.17 rational approximation (|ε| < 7.5e-8,
  * far inside the 6-dp mirror-round every consumer applies) — identical
  * literals, identical op order (Horner), only IEEE correctly-rounded
  * ops (*, +, /, exp), so the doubles match bit for bit cross-engine.
  *
  * Used by the multiple-testing family (q115): a p-value's ABSOLUTE
  * accuracy matters less than every engine agreeing on it — the BH
  * ordering and running-min downstream are decided on these exact bits.
  */
object NormalDist {

  private val InvSqrt2Pi = "0.3989422804014327"
  private val T0 = "0.2316419"
  private val B = Seq("0.319381530", "-0.356563782", "1.781477937",
    "-1.821255978", "1.330274429")

  /** Two-sided p-value for a z-score: p = min(1, 2·P(Z > |z|)). */
  def twoSidedP(z: Column): Column = {
    val x = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(T0.toDouble) * x)
    val pdf = lit(InvSqrt2Pi.toDouble) * exp(lit(-0.5) * x * x)
    val horner = B.reverse.tail.foldLeft(lit(B.last.toDouble): Column)(
      (acc, b) => lit(b.toDouble) + t * acc)
    least(lit(2.0) * pdf * (t * horner), lit(1.0))
  }

  /** DuckDB fragment with the identical operations (Horner, same
    * literals, same order) — `e` must be the z expression.
    */
  def sqlTwoSidedP(e: String): String = {
    val x = s"abs($e)"
    val t = s"(1.0 / (1.0 + $T0 * $x))"
    val horner = B.reverse.tail.foldLeft(B.last)((acc, b) => s"($b + $t * $acc)")
    s"least(2.0 * ($InvSqrt2Pi * exp(-0.5 * $x * $x)) * ($t * $horner), 1.0)"
  }
}
