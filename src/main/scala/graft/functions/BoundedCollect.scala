package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Size-capped `collect_list` as a mergeable aggregate — the scale-safe
  * building block for "enumerate within-key groups, but refuse hot
  * keys". `collect_list` buffers a key's WHOLE group before any
  * downstream size filter can drop it (the count-window hazard in
  * aggregate form); a count + semi-join pass avoids the buffering but
  * pays a second full pass and exchange over the (often expensive)
  * keyed stream. This aggregate does it in ONE exchange with bounded
  * state everywhere: each map task retains at most `cap` values per
  * key (partial-agg collapse — a degenerate key ships ≤ cap values per
  * task, never its row count), merges append-up-to-cap, and a group
  * that REACHED the cap is thereby marked (its true size is
  * indistinguishable at ≥ cap, by design). Call with cap = maxDf + 1
  * and keep groups with `size(out) <= maxDf`: exact retention below
  * the cap, exact refusal at or above it.
  *
  * Retained values below the cap are the complete group, so the result
  * is order-nondeterministic but SET-deterministic — `array_sort` the
  * output when a deterministic order matters. Nulls are ignored (SQL
  * aggregate convention). Generic over the child type (longs, strings,
  * structs); used by the banded-LSH dedup family to collect bucket
  * members and enumerate pairs in-place (Dedup.embeddingPairsLsh /
  * simhashPairs, round 12).
  */
object BoundedCollect {

  case class BoundedCollectAgg(child: Expression, capExpr: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

    @transient private lazy val cap: Int = {
      val v = capExpr.eval(null)
      require(v != null && v.asInstanceOf[Number].intValue() > 0,
        "graft_bounded_collect: cap must be a positive literal")
      v.asInstanceOf[Number].intValue()
    }

    override def children: Seq[Expression] = Seq(child, capExpr)
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (!capExpr.foldable ||
          !Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(capExpr.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_bounded_collect: cap must be a foldable integral literal")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
    override def prettyName: String = "graft_bounded_collect"

    override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
      mutable.ArrayBuffer.empty[Any]

    override def update(b: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
      if (b.length < cap) {
        val v = child.eval(input)
        // copy: eval may return a reused mutable buffer (UnsafeRow slice,
        // UTF8String over a shared byte array)
        if (v != null) b += InternalRow.copyValue(v)
      }
      b
    }

    override def merge(b: mutable.ArrayBuffer[Any],
        other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
      var i = 0
      while (b.length < cap && i < other.length) { b += other(i); i += 1 }
      b
    }

    override def eval(b: mutable.ArrayBuffer[Any]): Any =
      new GenericArrayData(b.toArray)

    // serde: one UnsafeRow holding the whole buffer as an array column —
    // generic over the child type with zero per-element format code
    @transient private lazy val ser =
      UnsafeProjection.create(Array[DataType](dataType))
    override def serialize(b: mutable.ArrayBuffer[Any]): Array[Byte] = {
      val row = new GenericInternalRow(1)
      row.update(0, new GenericArrayData(b.toArray))
      ser(row).getBytes
    }
    override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
      val row = new UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      val arr = row.getArray(0)
      val out = mutable.ArrayBuffer.empty[Any]
      arr.foreach(child.dataType, (_, v) =>
        if (v != null) out += InternalRow.copyValue(v))
      out
    }

    override def withNewMutableAggBufferOffset(o: Int): BoundedCollectAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BoundedCollectAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): BoundedCollectAgg =
      copy(child = cs(0), capExpr = cs(1))
  }

  /** Size-capped `collect_set`: retains at most `cap` DISTINCT non-null
    * values per group — the skew-safe basket builder. `collect_set` +
    * size filter buffers a hot entity's whole distinct-item set in one
    * reduce task before the filter can drop it; here every buffer
    * (map-side partial included) holds ≤ cap values, duplicates of a
    * hot item collapse at first touch, and a group whose distinct count
    * reaches the cap is thereby marked. Call with cap = maxBasket + 1
    * and keep `size(out) <= maxBasket`: complete distinct set below the
    * cap, exact refusal at it. Atomic element types only (set equality
    * of struct InternalRows is not defined).
    */
  case class BoundedCollectSetAgg(child: Expression, capExpr: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.LinkedHashSet[Any]] {

    @transient private lazy val cap: Int = {
      val v = capExpr.eval(null)
      require(v != null && v.asInstanceOf[Number].intValue() > 0,
        "graft_bounded_collect_set: cap must be a positive literal")
      v.asInstanceOf[Number].intValue()
    }

    override def children: Seq[Expression] = Seq(child, capExpr)
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (!capExpr.foldable ||
          !Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(capExpr.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_bounded_collect_set: cap must be a foldable integral literal")
      else if (child.dataType.isInstanceOf[StructType] ||
          child.dataType.isInstanceOf[ArrayType] || child.dataType.isInstanceOf[MapType])
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_bounded_collect_set: element type must be atomic (set equality " +
            "of nested Catalyst values is not defined)")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
    override def prettyName: String = "graft_bounded_collect_set"

    override def createAggregationBuffer(): mutable.LinkedHashSet[Any] =
      mutable.LinkedHashSet.empty[Any]

    override def update(b: mutable.LinkedHashSet[Any], input: InternalRow): mutable.LinkedHashSet[Any] = {
      if (b.size < cap) {
        val v = child.eval(input)
        if (v != null) b += InternalRow.copyValue(v)
      }
      b
    }

    override def merge(b: mutable.LinkedHashSet[Any],
        other: mutable.LinkedHashSet[Any]): mutable.LinkedHashSet[Any] = {
      val it = other.iterator
      while (b.size < cap && it.hasNext) b += it.next()
      b
    }

    override def eval(b: mutable.LinkedHashSet[Any]): Any =
      new GenericArrayData(b.toArray)

    @transient private lazy val ser =
      UnsafeProjection.create(Array[DataType](dataType))
    override def serialize(b: mutable.LinkedHashSet[Any]): Array[Byte] = {
      val row = new GenericInternalRow(1)
      row.update(0, new GenericArrayData(b.toArray))
      ser(row).getBytes
    }
    override def deserialize(bytes: Array[Byte]): mutable.LinkedHashSet[Any] = {
      val row = new UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      val out = mutable.LinkedHashSet.empty[Any]
      row.getArray(0).foreach(child.dataType, (_, v) =>
        if (v != null) out += InternalRow.copyValue(v))
      out
    }

    override def withNewMutableAggBufferOffset(o: Int): BoundedCollectSetAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BoundedCollectSetAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): BoundedCollectSetAgg =
      copy(child = cs(0), capExpr = cs(1))
  }

  /** Idempotently register `graft_bounded_collect(value, cap)` and
    * `graft_bounded_collect_set(value, cap)`.
    */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft-bounded-collect") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bounded_collect",
        { es: Seq[Expression] =>
          require(es.length == 2, "graft_bounded_collect(value, cap)")
          BoundedCollectAgg(es(0), es(1))
        }, "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bounded_collect_set",
        { es: Seq[Expression] =>
          require(es.length == 2, "graft_bounded_collect_set(value, cap)")
          BoundedCollectSetAgg(es(0), es(1))
        }, "built-in")
    }

  def boundedCollect(value: Column, cap: Column): Column =
    call_function("graft_bounded_collect", value, cap)

  def boundedCollectSet(value: Column, cap: Column): Column =
    call_function("graft_bounded_collect_set", value, cap)
}
