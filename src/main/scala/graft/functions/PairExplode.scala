package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, SpecificInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native unordered-pair GENERATOR over a (sorted) array column — the
  * one-pass twin of the basket family's
  * `explode(flatten(transform(sequence(0, n-2), i => transform(sequence(i+1,
  * n-1), j => struct(items[i], items[j])))))` expansion, emitting the
  * SAME (a, b) rows (all i < j index pairs, same enumeration order).
  *
  * Why: the HOF chain is CodegenFallback with per-ELEMENT interpreted
  * lambda dispatch — for a 40-item basket that is ~780 closure frames,
  * two nested lambda arrays and a flatten copy before the explode even
  * sees the data, and the basket family feeds it ~13M pairs at sf0.1
  * (q81/q92's dominant stage). This generator walks the array once per
  * row with two integer cursors and allocates exactly one 2-field row
  * per pair — no intermediate arrays, nothing interpreted per element
  * (the generate node itself stays outside whole-stage codegen either
  * way). Null/short arrays generate nothing, exactly like the HOF chain
  * (sequence(0, n-2) is empty-guarded by the callers' size >= 2 filter).
  */
case class PairExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pair_explode requires an array argument, got ${t.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elemType, nullable = true),
    StructField("b", elemType, nullable = true)))

  // Per-pair cost is the whole game here (~13M pairs at sf0.1 on the
  // q81/q92 stage): long/int baskets take a PRIMITIVE fast path —
  // ArrayData.toLongArray/toIntArray (one bulk copy, no element boxing)
  // plus a single REUSED SpecificInternalRow whose mutable fields are
  // set without boxing. Reuse is safe for a non-codegen Generator:
  // GenerateExec streams each emitted row straight through JoinedRow
  // into an UnsafeProjection, which copies the values before next() is
  // called — the same buffer-reuse contract UnsafeProjection itself
  // relies on. The generic path keeps toObjectArray but reuses its
  // output row the same way.
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val ad = v.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (n < 2) return Iterator.empty
    if (!elemNullable && elemType == LongType) {
      val elems = ad.toLongArray()
      val row = new SpecificInternalRow(Seq(LongType, LongType))
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          row.setLong(0, elems(i))
          row.setLong(1, elems(j))
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          row
        }
      }
    } else if (!elemNullable && elemType == IntegerType) {
      val elems = ad.toIntArray()
      val row = new SpecificInternalRow(Seq(IntegerType, IntegerType))
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          row.setInt(0, elems(i))
          row.setInt(1, elems(j))
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          row
        }
      }
    } else {
      val elems = ad.toObjectArray(elemType)
      val values = new Array[Any](2)
      val row = new GenericInternalRow(values)
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          values(0) = elems(i)
          values(1) = elems(j)
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override def prettyName: String = "graft_pair_explode"

  override protected def withNewChildInternal(newChild: Expression): PairExplode =
    copy(child = newChild)
}

object PairExplode {
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft-pair-explode") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_pair_explode", { es: Seq[Expression] => PairExplode(es.head) },
        "built-in")
    }

  /** All unordered pairs of `items` as two columns (a, b) — alias with
    * `.as(Seq("a", "b"))` or address the default names directly.
    */
  def pairExplode(items: Column): Column = call_function("graft_pair_explode", items)
}
