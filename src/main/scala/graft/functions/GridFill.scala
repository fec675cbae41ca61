package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, SpecificInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Dense-grid fill GENERATOR over one entity's SORTED observation array —
  * the single-pass twin of the gapFill/interpolate window plans: input is
  * `array<struct<b: long, v: double>>` (ascending b, b unique — the
  * per-entity collect of the deduplicated observation table), output is
  * one row per bucket of [min b, max b]:
  *
  *   bucket, value, observed
  *
  * `interp = false` (gapFill): value = last non-null v at bucket ≤ b
  * (LOCF; null before the first non-null observation), observed =
  * current bucket has a non-null observation — EXACTLY the
  * `last(v, ignoreNulls) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)`
  * running frame it replaces, including the observed-bucket-with-null-v
  * case (counts as a gap).
  *
  * `interp = true` (linear interpolation): gaps fill with
  * `pv + (nv - pv) * (b - pb) / (nb - pb)` over the bracketing non-null
  * observations — the IDENTICAL IEEE op sequence of the two-running-
  * frame window form (left-assoc multiply-then-divide, long subtractions
  * promoted to double), so values are bit-identical; a missing bracket
  * (leading/trailing null runs) yields null exactly like the window
  * expression's null propagation.
  *
  * Why a generator: the window form pays a grid-sized exchange + two
  * in-partition sorts (and a grid⋈obs join to build its input); this
  * emits the grid lazily from the obs array with two cursors — the
  * whole fill is per-row compute after ONE per-entity aggregation
  * exchange. Per-entity memory is the OBSERVATION count (never the
  * grid), the same per-group bound every basket operator carries.
  */
case class GridFillGen(obs: Expression, interpExpr: Expression)
    extends BinaryExpression with Generator with CodegenFallback {
  override def left: Expression = obs
  override def right: Expression = interpExpr

  override def elementSchema: StructType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("observed", BooleanType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (obs.dataType, interpExpr.dataType) match {
    case (ArrayType(st: StructType, _), BooleanType)
        if st.fields.length == 2 && st.fields(0).dataType == LongType &&
          st.fields(1).dataType == DoubleType =>
      if (interpExpr.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal interp flag")
    case (o, f) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<bigint,double>>, boolean literal), " +
        s"got ${o.sql} and ${f.sql}")
  }

  @transient private lazy val interp: Boolean =
    interpExpr.eval(null).asInstanceOf[Boolean]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val o = obs.eval(input)
    if (o == null) return Iterator.empty
    val ad = o.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (n == 0) return Iterator.empty
    val bs = new Array[Long](n)
    val vs = new Array[Double](n)
    val isNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val st = ad.getStruct(i, 2)
      bs(i) = st.getLong(0)
      if (st.isNullAt(1)) isNull(i) = true else vs(i) = st.getDouble(1)
      i += 1
    }
    // nnAfter(k) = first index >= k with a non-null value (n if none)
    val nnAfter = new Array[Int](n + 1)
    nnAfter(n) = n
    i = n - 1
    while (i >= 0) {
      nnAfter(i) = if (!isNull(i)) i else nnAfter(i + 1)
      i -= 1
    }
    val doInterp = interp
    new Iterator[InternalRow] {
      private val row = new SpecificInternalRow(
        Seq[DataType](LongType, DoubleType, BooleanType))
      private var b = bs(0)
      private var k = 0       // bs(k) <= b (current observation cursor)
      private var lastNN = -1 // last non-null obs index with bs(idx) <= b
      override def hasNext: Boolean = b <= bs(n - 1)
      override def next(): InternalRow = {
        row.setLong(0, b)
        if (b == bs(k) && !isNull(k)) {
          lastNN = k
          row.setDouble(1, vs(k))
          row.setBoolean(2, true)
        } else {
          // gap, or an observed bucket whose value is null — both fill
          row.setBoolean(2, false)
          if (doInterp) {
            val na = nnAfter(k + 1)
            if (lastNN < 0 || na >= n) row.setNullAt(1)
            else {
              val pv = vs(lastNN); val pb = bs(lastNN)
              val nv = vs(na); val nb = bs(na)
              // same IEEE sequence as the window expression:
              // ((nv - pv) * (b - pb)) / (nb - pb), then pv + …
              row.setDouble(1, pv + (nv - pv) * (b - pb) / (nb - pb))
            }
          } else {
            if (lastNN < 0) row.setNullAt(1) else row.setDouble(1, vs(lastNN))
          }
        }
        b += 1
        if (k < n - 1 && b == bs(k + 1)) k += 1
        row
      }
    }
  }

  override def prettyName: String = "graft_grid_fill"

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GridFillGen =
    copy(obs = l, interpExpr = r)
}

object GridFillGen {
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft-grid-fill") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_grid_fill", { es: Seq[Expression] => GridFillGen(es(0), es(1)) },
        "built-in")
    }

  /** Grid rows (bucket, value, observed) for one entity's sorted
    * (b, v) observation array.
    */
  def gridFill(obs: Column, interp: Boolean): Column =
    call_function("graft_grid_fill", obs, lit(interp))
}
