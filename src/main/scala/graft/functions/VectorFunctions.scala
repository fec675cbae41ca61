package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector primitives over `array<float>` embedding columns.
  *
  * Everything is higher-order-function composition (zip_with/aggregate/
  * transform) so semantics are exactly mirrorable in DuckDB list lambdas
  * for the oracle. All arithmetic is promoted to double elementwise, and
  * reductions are sequential left folds — deterministic on both engines.
  *
  * Scale note: for the 100 TB hot path these have a codegen'd
  * `Expression` twin (see graft.functions.expressions) — same semantics,
  * primitive loops inside whole-stage codegen.
  */
object VectorFunctions {

  /** Elementwise cast to double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** L2-normalized copy of a float vector, as doubles. */
  def normalize(v: Column): Column = {
    val d = toDouble(v)
    transform(d, x => x / sqrt(aggregate(d, lit(0.0), (acc, y) => acc + y * y)))
  }

  /** Cosine similarity of two float vectors. */
  def cosine(a: Column, b: Column): Column = {
    val (da, db) = (toDouble(a), toDouble(b))
    dot(da, db) / (norm(da) * norm(db))
  }

  // --------------------------------------------------------------- DuckDB

  /** DuckDB mirror of a sequential left-fold sum over a list expression. */
  def sqlFoldSum(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $listExpr), (acc, x) -> acc + x)"

  /** DuckDB mirror of dot(toDouble(a), toDouble(b)) — same fold order, so
    * results are bit-identical to [[GraftExpressions.CosineSim]]'s loop.
    */
  def sqlDot(a: String, b: String): String =
    sqlFoldSum(s"""list_transform(range(1, least(len($a), len($b)) + 1),
       | i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))""".stripMargin.replace("\n", ""))

  /** DuckDB mirror of cosine(a, b). */
  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"
}
