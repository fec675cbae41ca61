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

/** Keyed INTERVAL-OVERLAP join as a first-class Catalyst operator — the
  * third rung of the [[GraftAsofJoin]] → [[GraftBandJoin]] extension
  * ladder, generalizing the band's point-in-window to interval-meets-
  * interval: for each left row, every right row with equal keys whose
  * CLOSED span `[rStart, rEnd]` intersects `[lStart, lEnd]`
  * (`lStart <= rEnd && rStart <= lEnd` — the Allen overlaps/during/
  * meets family). This is the keyed co-occurrence join — "view sessions
  * active while the SAME USER's click session ran", reservation
  * conflicts, on-call overlap.
  *
  * Spark plans the raw predicate as a sort-merge on the keys with a
  * post-filter that buffers EVERY right row of a key (or a broadcast
  * nested loop). The existing composition,
  * [[graft.operators.Relational.intervalOverlapJoin]], fixes the
  * asymptotics by exploding both sides to grid cells — correct and
  * scale-safe, but it pays interval-length/cellWidth fan-out on BOTH
  * sides, carries the cell key through the shuffle, and re-checks the
  * overlap plus an exactly-once reporting-cell predicate per candidate.
  * This exec pays the lower bound instead: one hash exchange per side
  * on the equality keys, one in-partition sort per side by (keys,
  * start), then a single forward-only merge whose state is the set of
  * right intervals still ACTIVE (`rEnd >=` the current left start) —
  * size = max concurrent right intervals per key, the natural contract
  * of an overlap join, never the whole key group and never a per-row
  * explode. Each matching pair is emitted exactly once, so no
  * post-join distinct exchange either.
  *
  * Correctness of the merge: left rows arrive with `lStart`
  * non-decreasing within a key, so a right interval with
  * `rEnd < lStart` can never match ANY later left row — eviction is
  * final. A right row enters the active set only once its `rStart`
  * passes `<= lEnd` of some left row; rows beyond stay unconsumed (a
  * later left with a larger end may still need them). Because `lEnd`
  * is NOT monotone, membership re-checks `rStart <= lEnd` per left row
  * — active-set rows are candidates, not guaranteed matches.
  *
  * Null keys and null boundaries never match (SQL semantics); `outer`
  * keeps unmatched left rows with null right columns. Boundaries must
  * be LongType on both sides (epoch millis, the repo-wide convention).
  */
case class GraftIntervalJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression,
    outer: Boolean,
    broadcastHint: Option[Boolean] = None,
    maxActiveRows: Int = GraftIntervalJoin.DefaultMaxActiveRows) extends BinaryNode {

  require(maxActiveRows >= 1, "maxActiveRows must be >= 1")
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "interval join needs one or more equality key pairs (keyless overlap: grid-cell " +
      "composition — Relational.intervalOverlapJoin)")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "interval join key types must match pairwise: left " +
      s"${leftKeys.map(_.dataType.simpleString).mkString("(", ", ", ")")} vs right " +
      s"${rightKeys.map(_.dataType.simpleString).mkString("(", ", ", ")")} — cast one side")
  require(Seq(leftStart, leftEnd, rightStart, rightEnd).forall(_.dataType == LongType),
    "interval join boundaries must be LongType epoch units; got " +
      s"(${leftStart.dataType.simpleString}, ${leftEnd.dataType.simpleString}) / " +
      s"(${rightStart.dataType.simpleString}, ${rightEnd.dataType.simpleString}) — " +
      "cast all four (unix_millis for timestamps)")
  // same float-key hazard as the band join: -0.0/NaN equality diverges
  // from equi-join semantics without NormalizeFloatingNumbers
  require(!leftKeys.exists(k => k.dataType == org.apache.spark.sql.types.DoubleType ||
      k.dataType == org.apache.spark.sql.types.FloatType),
    "interval join equality keys must not be float/double (−0.0/NaN equality diverges " +
      "from equi-join semantics) — cast to a discrete type or quantize first")

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftIntervalJoin =
    copy(left = newLeft, right = newRight)
}

object GraftIntervalJoin {
  /** Active-set occupancy cap (the maxBandRows discipline): an overlap
    * join whose per-key concurrent-interval count reaches millions is a
    * disguised cross join — per-task memory AND the |L|·occupancy output
    * both explode. Fail loud with the knobs named rather than OOM an
    * executor.
    */
  val DefaultMaxActiveRows: Int = 4 << 20

  /** DataFrame-level entry: `intervalJoinMerge(clickSessions,
    * viewSessions, Seq("a_user"), Seq("b_user"), "a_s", "a_e", "b_s",
    * "b_e")` pairs each click session with every same-user view session
    * it overlaps. Registers [[GraftStrategy]] on
    * `experimental.extraStrategies` if no extension did (the
    * [[GraftAsofJoin.asofJoinMerge]] contract). Pre-project the inputs:
    * Catalyst cannot prune columns THROUGH a node type it doesn't know.
    */
  def intervalJoinMerge(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      outer: Boolean = false,
      broadcast: Option[Boolean] = None,
      maxActiveRows: Int = DefaultMaxActiveRows): DataFrame = {
    val spark = left.sparkSession
    val exp = spark.experimental
    if (!exp.extraStrategies.exists(_.isInstanceOf[GraftStrategy]))
      exp.extraStrategies = exp.extraStrategies :+ new GraftStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val overlap = lp.outputSet.intersect(rp.outputSet)
    require(overlap.isEmpty,
      "interval join sides share attributes (self-join of the same DataFrame?): " +
        overlap.toSeq.map(_.name).mkString(", ") +
        " — alias one side first, e.g. df.alias(\"r\").select(...) or re-create it via toDF()")
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$name' (has: ${plan.output.map(_.name).mkString(", ")})"))
    Bridge.ofRows(spark, GraftIntervalJoin(lp, rp,
      leftKeys.map(attr(lp, _, "left")), rightKeys.map(attr(rp, _, "right")),
      attr(lp, leftStart, "left"), attr(lp, leftEnd, "left"),
      attr(rp, rightStart, "right"), attr(rp, rightEnd, "right"),
      outer, broadcast, maxActiveRows))
  }
}

/** Sort-merge interval-overlap join. Children arrive co-hash-partitioned
  * on the equality keys and sorted by (keys, start); the merge keeps the
  * right intervals still active for the current left start (`rEnd >=
  * lStart` — eviction is final because left starts are non-decreasing
  * within a key) and re-checks `rStart <= lEnd` per left row (left ends
  * are not monotone). Both inputs stream exactly once; per-partition
  * state = max concurrent right intervals of one key.
  */
case class IntervalMergeJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression,
    outer: Boolean, maxActiveRows: Int,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftStart, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightStart, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  // emission order IS the left child's (keys, start) order — declare it so
  // a downstream merge-join/sort-agg on the same keys skips its SortExec
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalMergeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKeysB, rKeysB) = (leftKeys, rightKeys)
    val (lsB, leB, rsB, reB) = (leftStart, leftEnd, rightStart, rightEnd)
    val keyTypes = leftKeys.map(_.dataType)
    val (isOuter, outAttrs) = (outer, output)
    val maxActive = maxActiveRows

    left.execute().zipPartitions(right.execute()) { (lIter, rIterRaw) =>
      def ordFor(types: Seq[DataType]) = {
        val attrs = types.map(t => AttributeReference("c", t)())
        GenerateOrdering.generate(attrs.map(SortOrder(_, Ascending)), attrs)
      }
      val keyOrd = ordFor(keyTypes)
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val bufKeyProj = UnsafeProjection.create(rKeysB, rOut) // separate buffer for buffered rows' key
      val lBoundsProj = UnsafeProjection.create(Seq(lsB, leB), lOut)
      val rBoundsProj = UnsafeProjection.create(Seq(rsB, reB), rOut)
      val rBind = if (isOuter) rOut.map(_.withNullability(true)) else rOut
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rBind)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rIter = rIterRaw.buffered

      new Iterator[InternalRow] {
        // right rows (copied) of the CURRENT key, rStart ascending, all
        // candidates (rEnd >= the last left start); dead rows compact out
        // during each left row's scan
        private val active = new scala.collection.mutable.ArrayBuffer[InternalRow]
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
            val lBounds = lBoundsProj(l)
            if (lKeyRow.anyNull || lBounds.isNullAt(0) || lBounds.isNullAt(1)) {
              if (isOuter) pendingNull = resultProj(joined(l, nullRight)).copy()
            } else {
              val ls = lBounds.getLong(0)
              val le = lBounds.getLong(1)
              // key change: the active set belongs to an earlier key
              if (active.nonEmpty &&
                  keyOrd.compare(bufKeyProj(active.head), lKeyRow) != 0)
                active.clear()
              // advance the right side: drop keys behind, absorb this
              // key's rows with rStart <= le (rows starting later stay for
              // lefts with larger ends; rows already over before ls can
              // never match this or any later left — skip them)
              var scanning = true
              while (scanning && rIter.hasNext) {
                val rKeyRow = rKeyProj(rIter.head)
                val c = if (rKeyRow.anyNull) -1 else keyOrd.compare(rKeyRow, lKeyRow)
                if (c < 0) rIter.next()
                else if (c > 0) scanning = false
                else {
                  val rBounds = rBoundsProj(rIter.head)
                  if (rBounds.isNullAt(0) || rBounds.isNullAt(1)) rIter.next() // null bounds never match
                  else {
                    val rs = rBounds.getLong(0)
                    if (rs > le) scanning = false // starts beyond this left's end: keep for later lefts
                    else {
                      val row = rIter.next()
                      if (rBounds.getLong(1) >= ls) {
                        active += row.copy()
                        // an active set holding millions of intervals is a
                        // disguised cross join (hot key × dense overlap):
                        // fail loud with the knobs, never OOM the executor
                        if (active.length > maxActive)
                          throw new IllegalStateException(
                            s"interval join active set exceeded maxActiveRows=$maxActive for one " +
                              "key — per-key concurrent-interval density is cross-join-shaped; " +
                              "split the key, shorten the intervals, or raise maxActiveRows " +
                              "deliberately")
                      }
                      // else: already ended before every future left start — drop
                    }
                  }
                }
              }
              // one pass: evict rows dead for ALL later lefts (rEnd < ls —
              // final, ls only advances) and collect this left's matches
              // (rStart <= le re-checked per row: le is not monotone)
              val matches = Array.newBuilder[InternalRow]
              var i = 0
              var w = 0
              while (i < active.length) {
                val row = active(i)
                val bounds = rBoundsProj(row)
                if (bounds.getLong(1) >= ls) {
                  active(w) = row
                  w += 1
                  if (bounds.getLong(0) <= le) matches += row
                }
                i += 1
              }
              active.takeInPlace(w)
              val m = matches.result()
              if (m.nonEmpty) {
                emitting = m
                emitLeft = l.copy()
              } else if (isOuter) {
                pendingNull = resultProj(joined(l, nullRight)).copy()
              }
            }
          }
        }

        override def hasNext: Boolean = {
          if (emitIdx >= emitting.length && pendingNull == null) refill()
          emitIdx < emitting.length || pendingNull != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty interval join iterator")
          if (pendingNull != null) {
            val out = pendingNull
            pendingNull = null
            out
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

/** Broadcast interval-overlap join: the right side (a dimension-sized
  * interval table — maintenance windows, campaign spans) builds per-key
  * rStart-sorted arrays from the broadcast, and the at-scale left side
  * passes through NARROWLY (no exchange, no sort — partitioning and
  * ordering preserved) with one hash lookup + one binary search per row,
  * scanning only the `rStart <= lEnd` prefix. Semantics identical to
  * [[IntervalMergeJoinExec]]; [[GraftStrategy]] picks on right-side size.
  */
case class BroadcastIntervalJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression,
    outer: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKeysB, rKeysB) = (leftKeys, rightKeys)
    val (lsB, leB, rsB, reB) = (leftStart, leftEnd, rightStart, rightEnd)
    val (isOuter, outAttrs) = (outer, output)
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val lBoundsProj = UnsafeProjection.create(Seq(lsB, leB), lOut)
      val rBoundsProj = UnsafeProjection.create(Seq(rsB, reB), rOut)
      val rBind = if (isOuter) rOut.map(_.withNullability(true)) else rOut
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rBind)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // per-key buckets: (rStart array, rEnd array, row array) sorted by
      // rStart ascending
      val index = new java.util.HashMap[InternalRow, (Array[Long], Array[Long], Array[InternalRow])]()
      locally {
        val grouping = new java.util.HashMap[InternalRow, scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]()
        broadcastRows.value.foreach { r =>
          val k = rKeyProj(r)
          val bounds = rBoundsProj(r)
          if (!k.anyNull && !bounds.isNullAt(0) && !bounds.isNullAt(1)) {
            var b = grouping.get(k)
            if (b == null) {
              b = new scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]
              grouping.put(k.copy(), b)
            }
            b += ((bounds.getLong(0), bounds.getLong(1), r)) // broadcast rows are stable copies
          }
        }
        grouping.forEach { (k, b) =>
          val sorted = b.sortInPlace()(Ordering.by(_._1))
          index.put(k, (sorted.iterator.map(_._1).toArray,
            sorted.iterator.map(_._2).toArray,
            sorted.iterator.map(_._3).toArray))
        }
      }

      lIter.flatMap { l =>
        val lKeyRow = lKeyProj(l)
        val lBounds = lBoundsProj(l)
        var matched: List[InternalRow] = Nil
        if (!lKeyRow.anyNull && !lBounds.isNullAt(0) && !lBounds.isNullAt(1)) {
          val bucket = index.get(lKeyRow)
          if (bucket != null) {
            val (rs, re, rows) = bucket
            val ls = lBounds.getLong(0)
            val le = lBounds.getLong(1)
            // first index with rStart > le — candidates live before it
            var a = 0; var b = rs.length
            while (a < b) { val m = (a + b) >>> 1; if (rs(m) <= le) a = m + 1 else b = m }
            val until = a
            var i = until - 1
            while (i >= 0) { // reverse so the emitted list is rStart-ascending
              if (re(i) >= ls) matched = rows(i) :: matched
              i -= 1
            }
          }
        }
        if (matched.nonEmpty) {
          val lCopy = l.copy()
          matched.iterator.map(r => resultProj(joined(lCopy, r)))
        } else if (isOuter) Iterator.single(resultProj(joined(l, nullRight)))
        else Iterator.empty
      }
    }
  }
}
