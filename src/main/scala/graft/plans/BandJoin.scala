package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Keyed BAND join as a first-class Catalyst operator — the second rung
  * of the [[GraftAsofJoin]] extension ladder, generalizing "the last
  * right row at or before" to "EVERY right row within a window": for
  * each left row, all right rows with equal keys and
  * `rightTs ∈ [leftTs + lower, leftTs + upper]` (closed band, epoch-ms
  * longs). This is the keyed time-correlation join — "errors within
  * ±5 s of a purchase BY THE SAME SESSION", readings around an event,
  * message/ack pairing.
  *
  * Spark plans the raw predicate `rTs BETWEEN lTs+lower AND lTs+upper`
  * as a broadcast-nested-loop (or sort-merge on the keys with a
  * post-filter that still buffers EVERY right row of a key): the
  * existing composition, [[graft.operators.Relational.rangeJoin]], fixes
  * the asymptotics by binning both sides at the band width — correct
  * and scale-safe, but it pays a ≤2× left-row explode, carries the bin
  * column through the shuffle, and re-checks the band per candidate.
  * This exec pays exactly the lower bound instead: one hash exchange
  * per side on the equality keys (co-partitioned by EnsureRequirements,
  * AQE-visible like any join), one in-partition sort per side, then a
  * single forward-only merge pass whose state is a ring buffer of the
  * right rows currently inside the band — size = band occupancy (band
  * width × per-key right rate), the natural contract of a
  * time-correlation join, NEVER the whole key group. A 100 TB left side
  * streams through with zero fan-out.
  *
  * Null keys and null timestamps never match (SQL semantics); `outer`
  * keeps unmatched left rows with null right columns. Timestamps must
  * be LongType on both sides (epoch millis, the repo-wide convention) —
  * the band arithmetic is primitive-long, checked loud at construction.
  */
case class GraftBandJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    lower: Long, upper: Long, outer: Boolean,
    broadcastHint: Option[Boolean] = None,
    maxBandRows: Int = GraftBandJoin.DefaultMaxBandRows) extends BinaryNode {

  require(lower <= upper, s"empty band [$lower, $upper]")
  require(maxBandRows >= 1, "maxBandRows must be >= 1")
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "band join needs one or more equality key pairs (keyless bands: bin first — Relational.rangeJoin)")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "band join key types must match pairwise: left " +
      s"${leftKeys.map(_.dataType.simpleString).mkString("(", ", ", ")")} vs right " +
      s"${rightKeys.map(_.dataType.simpleString).mkString("(", ", ", ")")} — cast one side")
  require(leftTs.dataType == LongType && rightTs.dataType == LongType,
    s"band join timestamps must be LongType epoch units; got left ${leftTs.dataType.simpleString}, " +
      s"right ${rightTs.dataType.simpleString} — cast both sides (unix_millis for timestamps)")
  // Float/double keys would need Spark's NormalizeFloatingNumbers pass:
  // without it -0.0 vs 0.0 diverges from equi-join semantics (ordering
  // says unequal, byte-equality hashing misses) and the two physical
  // plans can even disagree on NaN. Equality keys should be discrete
  // anyway — fail loud, the same discipline as the ts type guard.
  require(!leftKeys.exists(k => k.dataType == org.apache.spark.sql.types.DoubleType ||
      k.dataType == org.apache.spark.sql.types.FloatType),
    "band join equality keys must not be float/double (−0.0/NaN equality diverges " +
      "from equi-join semantics) — cast to a discrete type or quantize first")

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftBandJoin =
    copy(left = newLeft, right = newRight)
}

object GraftBandJoin {
  /** Ring-buffer occupancy cap (the maxBasket discipline): a band join
    * whose per-key right-row density × band width reaches millions of
    * buffered rows is a disguised cross join — per-task memory AND the
    * |L|·occupancy output both explode. Fail loud with the knobs named
    * rather than OOM an executor. 4M rows ≈ hundreds of MB of buffered
    * UnsafeRows — beyond any intentional time-correlation workload.
    */
  val DefaultMaxBandRows: Int = 4 << 20

  /** Saturating band-edge addition: an extreme band (|lower|/|upper|
    * near Long.MaxValue) or an extreme timestamp must CLAMP, never wrap —
    * a wrapped edge silently corrupts band membership in both physical
    * plans. Clamping is exact for membership: an edge past the Long
    * range admits/excludes exactly the rows a true ±∞ edge would.
    */
  def satAdd(a: Long, b: Long): Long = {
    val s = a + b
    // overflow iff both operands share a sign that differs from the sum's
    if (((a ^ s) & (b ^ s)) < 0) { if (a > 0) Long.MaxValue else Long.MinValue } else s
  }

  /** DataFrame-level entry: `bandJoinMerge(purchases, errors,
    * Seq("session"), Seq("session"), "pt", "et", -5000, 5000)` pairs
    * each purchase with every same-session error inside ±5 s.
    * Registers [[GraftStrategy]] on `experimental.extraStrategies` if
    * no extension did (the [[GraftAsofJoin.asofJoinMerge]] contract).
    * Pre-project the inputs: Catalyst cannot prune columns THROUGH a
    * node type it doesn't know.
    */
  def bandJoinMerge(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String,
      lower: Long, upper: Long, outer: Boolean = false,
      broadcast: Option[Boolean] = None,
      maxBandRows: Int = DefaultMaxBandRows): DataFrame = {
    val spark = left.sparkSession
    val exp = spark.experimental
    if (!exp.extraStrategies.exists(_.isInstanceOf[GraftStrategy]))
      exp.extraStrategies = exp.extraStrategies :+ new GraftStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // same self-join hazard as asofJoinMerge: overlapping exprIds bind
    // right attributes to left ordinals — fail loud, alias one side
    val overlap = lp.outputSet.intersect(rp.outputSet)
    require(overlap.isEmpty,
      "band join sides share attributes (self-join of the same DataFrame?): " +
        overlap.toSeq.map(_.name).mkString(", ") +
        " — alias one side first, e.g. df.alias(\"r\").select(...) or re-create it via toDF()")
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$name' (has: ${plan.output.map(_.name).mkString(", ")})"))
    Bridge.ofRows(spark, GraftBandJoin(lp, rp,
      leftKeys.map(attr(lp, _, "left")), rightKeys.map(attr(rp, _, "right")),
      attr(lp, leftTs, "left"), attr(rp, rightTs, "right"),
      lower, upper, outer, broadcast, maxBandRows))
  }
}

/** Sort-merge band join. Children arrive co-hash-partitioned on the
  * equality keys and sorted by (keys, ts); the merge holds a ring
  * buffer of the right rows currently inside the band. Because left ts
  * is non-decreasing within a key, the band's lower edge only advances
  * — a right row evicted at the front can never match a later left row,
  * and a right row beyond `lts + upper` stays unconsumed for the next
  * left row. Per-partition state = max band occupancy; both inputs
  * stream exactly once.
  */
case class BandMergeJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    lower: Long, upper: Long, outer: Boolean, maxBandRows: Int,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  // emission order IS the left child's (keys, ts) order — declare it so a
  // downstream merge-join/sort-agg on the same keys skips its SortExec
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandMergeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKeysB, rKeysB, lTsB, rTsB) = (leftKeys, rightKeys, leftTs, rightTs)
    val keyTypes = leftKeys.map(_.dataType)
    val (lo, hi) = (lower, upper)
    val (isOuter, outAttrs) = (outer, output)
    val maxBand = maxBandRows

    left.execute().zipPartitions(right.execute()) { (lIter, rIterRaw) =>
      def ordFor(types: Seq[DataType]) = {
        val attrs = types.map(t => AttributeReference("c", t)())
        GenerateOrdering.generate(attrs.map(SortOrder(_, Ascending)), attrs)
      }
      val keyOrd = ordFor(keyTypes)
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val bufKeyProj = UnsafeProjection.create(rKeysB, rOut) // separate buffer for buffered rows' key
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      val rBind = if (isOuter) rOut.map(_.withNullability(true)) else rOut
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rBind)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rIter = rIterRaw.buffered

      new Iterator[InternalRow] {
        // right rows (copied) with the CURRENT key, ts ascending, all
        // ≤ the last left row's upper edge; fronts evict as lts advances
        private val band = new java.util.ArrayDeque[InternalRow]()
        private var emitIdx = 0
        private var emitting: Array[InternalRow] = Array.empty
        private var emitLeft: InternalRow = _
        private var pendingNull: InternalRow = _ // outer: unmatched left

        private def refill(): Unit = {
          emitIdx = 0
          emitting = Array.empty
          emitLeft = null
          pendingNull = null
          while (emitting.isEmpty && pendingNull == null && lIter.hasNext) {
            val l = lIter.next()
            val lKeyRow = lKeyProj(l)
            val lTsRow = lTsProj(l)
            if (lKeyRow.anyNull || lTsRow.isNullAt(0)) {
              if (isOuter) pendingNull = resultProj(joined(l, nullRight)).copy()
            } else {
              val lts = lTsRow.getLong(0)
              val loEdge = GraftBandJoin.satAdd(lts, lo)
              val hiEdge = GraftBandJoin.satAdd(lts, hi)
              // key change: the buffered band belongs to an earlier key
              if (!band.isEmpty &&
                  keyOrd.compare(bufKeyProj(band.peekFirst()), lKeyRow) != 0)
                band.clear()
              // advance the right side: drop keys behind, absorb this
              // key's rows up to the upper edge (rows below the lower
              // edge can never match a later, larger lts — skip them)
              var scanning = true
              while (scanning && rIter.hasNext) {
                val rKeyRow = rKeyProj(rIter.head)
                val c = if (rKeyRow.anyNull) -1 else keyOrd.compare(rKeyRow, lKeyRow)
                if (c < 0) rIter.next()
                else if (c > 0) scanning = false
                else {
                  val rTsRow = rTsProj(rIter.head)
                  if (rTsRow.isNullAt(0)) rIter.next() // null ts never matches
                  else {
                    val rts = rTsRow.getLong(0)
                    if (rts > hiEdge) scanning = false // beyond the band: keep for later lefts
                    else {
                      val row = rIter.next()
                      if (rts >= loEdge) {
                        band.addLast(row.copy())
                        // a band holding millions of rows is a disguised
                        // cross join (hot key × wide band): fail loud with
                        // the knobs, never OOM the executor
                        if (band.size() > maxBand)
                          throw new IllegalStateException(
                            s"band join buffer exceeded maxBandRows=$maxBand for one key — " +
                              "per-key density × band width is cross-join-shaped; shrink the " +
                              "band, add a key column, or raise maxBandRows deliberately")
                      }
                      // else: below every future band — drop
                    }
                  }
                }
              }
              // evict fronts that fell out of the (advanced) lower edge
              while (!band.isEmpty && rTsProj(band.peekFirst()).getLong(0) < loEdge)
                band.pollFirst()
              if (!band.isEmpty) {
                emitting = band.toArray(new Array[InternalRow](band.size()))
                emitLeft = l.copy()
              } else if (isOuter) {
                pendingNull = resultProj(joined(l, nullRight)).copy()
              }
            }
          }
        }

        override def hasNext: Boolean = {
          if (pendingNull == null && emitIdx >= emitting.length) refill()
          pendingNull != null || emitIdx < emitting.length
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          if (pendingNull != null) {
            val out = pendingNull; pendingNull = null; out
          } else {
            val out = resultProj(joined(emitLeft, emitting(emitIdx)))
            emitIdx += 1
            out
          }
        }
      }
    }
  }
}

/** Broadcast band join — the plan when the right side is a small
  * dimension: per-key ts-sorted buckets build once per partition from
  * the broadcast array, and the at-scale left side passes through
  * NARROWLY (no exchange, no sort — partitioning/ordering preserved)
  * with one hash lookup + two binary searches per row, emitting the
  * [first ≥ lts+lower, last ≤ lts+upper] slice. Semantics identical to
  * [[BandMergeJoinExec]]; [[GraftStrategy]] picks on right-side size.
  */
case class BroadcastBandJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    lower: Long, upper: Long, outer: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastBandJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKeysB, rKeysB, lTsB, rTsB) = (leftKeys, rightKeys, leftTs, rightTs)
    val (lo, hi) = (lower, upper)
    val (isOuter, outAttrs) = (outer, output)
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      val rBind = if (isOuter) rOut.map(_.withNullability(true)) else rOut
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rBind)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // per-key buckets: (ts array, row array) sorted by ts ascending
      val index = new java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])]()
      locally {
        val grouping = new java.util.HashMap[InternalRow, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        broadcastRows.value.foreach { r =>
          val k = rKeyProj(r)
          val tsRow = rTsProj(r)
          if (!k.anyNull && !tsRow.isNullAt(0)) {
            var b = grouping.get(k)
            if (b == null) {
              b = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]
              grouping.put(k.copy(), b)
            }
            b += ((tsRow.getLong(0), r)) // broadcast rows are stable copies
          }
        }
        grouping.forEach { (k, b) =>
          val sorted = b.sortInPlace()(Ordering.by(_._1))
          index.put(k, (sorted.iterator.map(_._1).toArray, sorted.iterator.map(_._2).toArray))
        }
      }

      lIter.flatMap { l =>
        val lKeyRow = lKeyProj(l)
        val lTsRow = lTsProj(l)
        var from = 0
        var until = 0
        var bucket: (Array[Long], Array[InternalRow]) = null
        if (!lKeyRow.anyNull && !lTsRow.isNullAt(0)) {
          bucket = index.get(lKeyRow)
          if (bucket != null) {
            val ts = bucket._1
            val lts = lTsRow.getLong(0)
            val loEdge = GraftBandJoin.satAdd(lts, lo)
            val hiEdge = GraftBandJoin.satAdd(lts, hi)
            // first index with ts >= lts + lo
            var a = 0; var b = ts.length
            while (a < b) { val m = (a + b) >>> 1; if (ts(m) < loEdge) a = m + 1 else b = m }
            from = a
            // first index with ts > lts + hi
            a = from; b = ts.length
            while (a < b) { val m = (a + b) >>> 1; if (ts(m) <= hiEdge) a = m + 1 else b = m }
            until = a
          }
        }
        if (bucket != null && from < until) {
          val rows = bucket._2
          val lCopy = l.copy()
          (from until until).iterator.map(i => resultProj(joined(lCopy, rows(i))))
        } else if (isOuter) Iterator.single(resultProj(joined(l, nullRight)))
        else Iterator.empty
      }
    }
  }
}
