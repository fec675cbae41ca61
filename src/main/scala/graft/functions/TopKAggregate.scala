package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Exact top-k per group as a MERGEABLE bounded-heap aggregate — the
  * scale path for "k best rows per key" that the window formulation
  * (q08: `row_number() over (partition by g order by s desc) <= k`)
  * cannot take. The window plan shuffles and SORTS every row of every
  * group; its parallelism is capped at |groups| and its shuffle volume
  * is the whole table. This aggregate rides ObjectHashAggregateExec's
  * partial/final split instead: each map task keeps one k-bounded
  * min-heap per group, the shuffle carries at most k (score, id) pairs
  * per group per task — at 100 TB with k=2 that is the difference
  * between exchanging the table and exchanging kilobytes. Same
  * output, verified row-identical to the window form by oracle (q96).
  *
  * Ordering is (score, id) lexicographic DESCENDING — id is the
  * deterministic tie-break, so results are stable run-to-run and
  * engine-to-engine (the oracle mirrors `ORDER BY s DESC, id DESC`).
  * Matches the reference's pull of ranked winners per key (e.g.
  * attention-ranked sample selection) re-expressed Spark-first; cf.
  * cosmos-xenna's ranked-selection pipelines (pipelines/v1 examples).
  */
object TopKAggregate {

  /** One retained candidate: ordered by (score, id) ascending so the
    * heap head is always the weakest kept pair.
    */
  final case class Cand(score: Double, id: Long)
  private val candOrd: Ordering[Cand] =
    Ordering.by((c: Cand) => (c.score, c.id))

  /** Bounded buffer: a min-heap on (score, id) capped at k entries. */
  final class Heap(val k: Int) {
    // PriorityQueue dequeues the LARGEST under its ordering; reverse so
    // the head is the smallest retained candidate (the eviction target)
    private[TopKAggregate] val q = mutable.PriorityQueue.empty[Cand](candOrd.reverse)
    def offer(score: Double, id: Long): Unit = {
      // normalize -0.0 to 0.0: Spark's sort treats them EQUAL (primitive
      // compare), Ordering[Double] ranks 0.0 > -0.0 — without the snap
      // the heap and the window formulation disagree on signed-zero ties
      val s = if (score == 0.0d) 0.0d else score
      if (q.size < k) q.enqueue(Cand(s, id))
      else if (candOrd.compare(Cand(s, id), q.head) > 0) {
        q.dequeue(); q.enqueue(Cand(s, id))
      }
    }
    def mergeIn(other: Heap): Unit = other.q.foreach(c => offer(c.score, c.id))
    def sortedDesc: Seq[Cand] = q.toSeq.sorted(candOrd.reverse)
  }

  val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** `graft_topk(score, id, k)` → array<struct<score,id>> of the k
    * largest (score, id) pairs in descending order. Null scores/ids are
    * ignored (SQL aggregate convention); k must be a foldable positive
    * int, checked at ANALYSIS time (a SQL-surface function must fail in
    * the analyzer, not as a per-task executor crash). Input types coerce
    * via ImplicitCastInputTypes, so int scores / int ids work from SQL.
    */
  case class TopKByScore(score: Expression, id: Expression, kExpr: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Heap]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

    @transient private lazy val k: Int = {
      val v = kExpr.eval(null)
      require(v != null && v.asInstanceOf[Number].intValue() > 0,
        "graft_topk: k must be a positive literal")
      v.asInstanceOf[Number].intValue()
    }

    override def children: Seq[Expression] = Seq(score, id, kExpr)
    override def inputTypes: Seq[DataType] =
      Seq(DoubleType, LongType, IntegerType)
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val base = super.checkInputDataTypes()
      if (!base.isSuccess) base
      else if (!kExpr.foldable)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_topk: k must be a foldable literal")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
    override def nullable: Boolean = false
    override def dataType: DataType = outType
    override def prettyName: String = "graft_topk"

    override def createAggregationBuffer(): Heap = new Heap(k)

    override def update(b: Heap, input: InternalRow): Heap = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
      b
    }

    override def merge(b: Heap, other: Heap): Heap = { b.mergeIn(other); b }

    override def eval(b: Heap): Any =
      new GenericArrayData(b.sortedDesc.map { c =>
        val r = new GenericInternalRow(2)
        r.setDouble(0, c.score); r.setLong(1, c.id); r
      }.toArray[Any])

    override def serialize(b: Heap): Array[Byte] = {
      val cands = b.q.toSeq
      val buf = ByteBuffer.allocate(8 + 16 * cands.size)
      buf.putInt(b.k).putInt(cands.size)
      cands.foreach { c => buf.putDouble(c.score); buf.putLong(c.id) }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): Heap = {
      val buf = ByteBuffer.wrap(bytes)
      val h = new Heap(buf.getInt())
      var n = buf.getInt()
      while (n > 0) { h.offer(buf.getDouble(), buf.getLong()); n -= 1 }
      h
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKByScore =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): TopKByScore =
      copy(score = cs(0), id = cs(1), kExpr = cs(2))
  }

  /** Idempotently register `graft_topk`; the analyzer wraps the
    * AggregateFunction into an AggregateExpression at resolution.
    */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft-topk") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_topk",
        { es: Seq[Expression] =>
          require(es.length == 3, "graft_topk(score, id, k)")
          TopKByScore(es(0), es(1), es(2))
        }, "built-in")
    }

  def topK(score: Column, id: Column, k: Column): Column =
    call_function("graft_topk", score, id, k)
}
