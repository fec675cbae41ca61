package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, ExpressionInfo, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** AS-OF join as a first-class Catalyst operator — the full extension
  * ladder: a logical [[GraftAsofJoin]] node, a planner [[GraftStrategy]]
  * (registered via [[GraftExtensions]] / `spark.sql.extensions` or
  * self-registered through `experimental.extraStrategies`), and a
  * physical [[AsofMergeJoinExec]] that merge-joins two sorted streams.
  *
  * Spark has no physical as-of operator: its own `AsOfJoin` logical node
  * (the pandas-on-Spark `merge_asof` entry) is REWRITTEN by
  * `RewriteAsOfJoin` into joinWith + aggregation, and graft's
  * [[graft.operators.Relational.asofJoin]] uses the union+window trick —
  * both correct, but both pay for machinery beyond the semantics: the
  * rewrite materializes every (left, candidate-right) pair into a
  * struct-min aggregation; the union trick runs a window function over
  * the MIXED row stream and carries both sides' columns on every row.
  *
  * The merge exec pays exactly the lower bound: one hash exchange per
  * side on the equality keys (co-partitioned by `EnsureRequirements`,
  * exactly like SortMergeJoin), one in-partition sort per side, then a
  * single forward-only merge pass holding ONE buffered right row of
  * state per partition — no pair blow-up, no mixed-stream window, no
  * per-group buffering, so a 100 TB left side streams through at scan
  * speed regardless of how many right rows share a key.
  *
  * Semantics (backward as-of, the common "latest reading at or before
  * the event" enrichment): for each left row, the LAST right row with
  * equal keys and `rightTs <= leftTs`, "last" under (rightTs, tieBreak)
  * ascending — i.e. the max-(ts, tie) qualifying right row,
  * deterministic when tieBreak breaks ts ties. `outer = false` drops
  * unmatched left rows (inner as-of); `outer = true` keeps them with
  * null right columns. Null keys and null timestamps never match (SQL
  * comparison semantics), mirroring the reference pipeline's join
  * stages (cosmos_xenna/pipelines/v1/planning.py builds equivalent
  * enrichment joins declaratively).
  */
case class GraftAsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression], outer: Boolean,
    broadcastHint: Option[Boolean] = None) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs one or more equality key pairs")
  // Both physical plans compare raw UnsafeRow projections across sides
  // (merge: keyOrd/tsOrd generated from the LEFT types; broadcast: HashMap
  // over UnsafeRow bytes), so an int-vs-long key or ts pair would yield
  // silently empty/garbage matches, never an analysis error. Fail loud at
  // construction instead — the same discipline as the shared-name and
  // reserved-column guards.
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise: left " +
      s"${leftKeys.map(_.dataType.simpleString).mkString("(", ", ", ")")} vs right " +
      s"${rightKeys.map(_.dataType.simpleString).mkString("(", ", ", ")")} — cast one side")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of join timestamp types must match: left ${leftTs.dataType.simpleString} " +
      s"vs right ${rightTs.dataType.simpleString} — cast one side")

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftAsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[GraftAsofJoin]] cost-based, the same decision Spark's
  * JoinSelection makes for equi-joins: a right side whose estimated size
  * fits under `spark.sql.autoBroadcastJoinThreshold` plans to
  * [[BroadcastAsofJoinExec]] — the (100 TB) left side then NEVER
  * shuffles or sorts, it streams narrowly against a per-executor sorted
  * index of the small side — while a large right side plans to the
  * co-partitioned [[AsofMergeJoinExec]]. `broadcastHint` overrides in
  * either direction (the `broadcast()`-hint analogue for a node type
  * Spark's hint resolution doesn't know). Everything else falls through
  * to Spark's built-in strategies.
  */
class GraftStrategy extends SparkStrategy {
  private def broadcastable(r: LogicalPlan, hint: Option[Boolean]): Boolean = {
    val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    hint.getOrElse(
      threshold > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold)
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftAsofJoin(l, r, lk, rk, lts, rts, tie, outer, hint) =>
      if (broadcastable(r, hint))
        BroadcastAsofJoinExec(lk, rk, lts, rts, tie, outer, planLater(l), planLater(r)) :: Nil
      else
        AsofMergeJoinExec(lk, rk, lts, rts, tie, outer, planLater(l), planLater(r)) :: Nil
    case GraftBandJoin(l, r, lk, rk, lts, rts, lo, hi, outer, hint, maxBand) =>
      if (broadcastable(r, hint))
        BroadcastBandJoinExec(lk, rk, lts, rts, lo, hi, outer, planLater(l), planLater(r)) :: Nil
      else
        BandMergeJoinExec(lk, rk, lts, rts, lo, hi, outer, maxBand,
          planLater(l), planLater(r)) :: Nil
    case GraftIntervalJoin(l, r, lk, rk, ls, le, rs, re, outer, hint, maxActive) =>
      if (broadcastable(r, hint))
        BroadcastIntervalJoinExec(lk, rk, ls, le, rs, re, outer,
          planLater(l), planLater(r)) :: Nil
      else
        IntervalMergeJoinExec(lk, rk, ls, le, rs, re, outer, maxActive,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wires the engine
  * into ANY session declaratively (spark-submit clusters, notebooks):
  * the as-of planner strategy plus graft's codegen expressions as SQL
  * functions (`graft_poly_hash`, usable from pure-SQL pipelines).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.functions.{GraftExpressions => GE, SignatureExpressions => SE}

  private def fn(e: SparkSessionExtensions, name: String, arity: Int,
      implClass: Class[_])(builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(implClass.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name takes $arity argument(s)")
        builder(args)
      }))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => new GraftStrategy)
    // the full codegen-expression surface, SQL-callable (same names the
    // imperative register() helpers install per-session); each
    // ExpressionInfo carries the REAL implementation class so
    // `DESCRIBE FUNCTION EXTENDED` traces back to code
    fn(e, "graft_poly_hash", 1, classOf[GE.PolyHash])(a => GE.PolyHash(a.head))
    fn(e, "graft_cosine", 2, classOf[GE.CosineSim])(a => GE.CosineSim(a(0), a(1)))
    fn(e, "graft_hyperplane_bands", 3, classOf[GE.HyperplaneBandKeys])(a =>
      GE.HyperplaneBandKeys(a(0), a(1), a(2)))
    fn(e, "graft_shingle_hash", 1, classOf[SE.ShingleHash])(a => SE.ShingleHash(a.head))
    fn(e, "graft_minhash_bands", 1, classOf[SE.MinhashBandKeys])(a =>
      SE.MinhashBandKeys(a.head))
    fn(e, "graft_simhash", 1, classOf[SE.Simhash])(a => SE.Simhash(a.head))
    fn(e, "graft_shingle_count", 1, classOf[SE.DistinctShingleCount])(a =>
      SE.DistinctShingleCount(a.head))
    fn(e, "graft_topk", 3, classOf[graft.functions.TopKAggregate.TopKByScore])(a =>
      graft.functions.TopKAggregate.TopKByScore(a(0), a(1), a(2)))
  }
}

object GraftAsofJoin {
  /** DataFrame-level entry: `asofJoinMerge(purchases, clicks,
    * Seq("user"), Seq("user"), "p_ms", "c_ms", tieBreak = Seq("c_id"))`.
    * Registers [[GraftStrategy]] on the session's public
    * `experimental.extraStrategies` hook if no extension did, so the
    * operator works without session-construction-time config. Inputs
    * should be pre-projected to needed columns: Catalyst cannot prune
    * columns THROUGH a node type it doesn't know.
    */
  def asofJoinMerge(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String,
      tieBreak: Seq[String] = Nil, outer: Boolean = false,
      broadcast: Option[Boolean] = None): DataFrame = {
    val spark = left.sparkSession
    val exp = spark.experimental
    if (!exp.extraStrategies.exists(_.isInstanceOf[GraftStrategy]))
      exp.extraStrategies = exp.extraStrategies :+ new GraftStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // This builds the node directly from the two analyzed plans, so no
    // DeduplicateRelations pass runs: a self-as-of-join of one unaliased
    // DataFrame gives the sides overlapping exprIds, and the exec's
    // resultProj binds right attributes to LEFT ordinals by exprId —
    // silently wrong columns. Fail loud; aliasing either side mints
    // fresh exprIds.
    val overlap = lp.outputSet.intersect(rp.outputSet)
    require(overlap.isEmpty,
      "as-of join sides share attributes (self-join of the same DataFrame?): " +
        overlap.toSeq.map(_.name).mkString(", ") +
        " — alias one side first, e.g. df.alias(\"r\").select(...) or re-create it via toDF()")
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$name' (has: ${plan.output.map(_.name).mkString(", ")})"))
    Bridge.ofRows(spark, GraftAsofJoin(lp, rp,
      leftKeys.map(attr(lp, _, "left")), rightKeys.map(attr(rp, _, "right")),
      attr(lp, leftTs, "left"), attr(rp, rightTs, "right"),
      tieBreak.map(attr(rp, _, "right")), outer, broadcast))
  }

  /** FORWARD as-of (pandas `merge_asof(direction="forward")`): for each
    * left row, the EARLIEST right row with equal keys and
    * `rightTs >= leftTs`; ts ties break by MIN tieBreak (the mirror of
    * backward's max). Composed over the native backward operator by
    * ts/tie NEGATION — forward on t is exactly backward on -t — so it
    * inherits the merge/broadcast physical plans, cost-based selection
    * and O(1)-state merge for free (preference (a): compose before
    * building a second exec). Requires numeric ts and tie columns
    * (timestamps-as-epoch longs/doubles; Long.MinValue excluded).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String,
      tieBreak: Seq[String] = Nil, outer: Boolean = false,
      broadcast: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    def requireNumeric(df: DataFrame, name: String): Unit = {
      val dt = df.schema(name).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"asofJoinForward needs numeric ts/tie columns (negation trick); '$name' is $dt")
    }
    requireNumeric(left, leftTs)
    (rightTs +: tieBreak).foreach(requireNumeric(right, _))
    val lN = "__graft_fwd_lts"
    val rN = "__graft_fwd_rts"
    val tN = tieBreak.indices.map(i => s"__graft_fwd_tie$i")
    require(!(left.columns ++ right.columns).exists(x => x == lN || x == rN || tN.contains(x)),
      "asofJoinForward: reserved __graft_fwd_* column names present")
    val l2 = left.withColumn(lN, -c(leftTs))
    val r2 = tieBreak.zip(tN).foldLeft(right.withColumn(rN, -c(rightTs))) {
      case (df, (tie, tmp)) => df.withColumn(tmp, -c(tie))
    }
    asofJoinMerge(l2, r2, leftKeys, rightKeys, lN, rN, tN, outer, broadcast)
      .drop((lN +: rN +: tN): _*)
  }

  /** NEAREST as-of (pandas `merge_asof(direction="nearest")`): per left
    * row, whichever of the backward and forward winners is closer in
    * ts; equal distance prefers BACKWARD (pandas' rule). Two native
    * as-of passes plus one equi-join on `leftId` (caller-guaranteed
    * unique per left row) — still shuffle-bounded, never a pair
    * blow-up. `outer = false` drops left rows with no match either way.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String, leftId: String,
      tieBreak: Seq[String] = Nil, outer: Boolean = false,
      broadcast: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.functions.{abs, col => c, when}
    // the choose step resolves columns BY NAME across the two pass
    // outputs, so shared names would hit ambiguous-reference errors deep
    // in the select — fail loud at the API boundary instead (the
    // intervalOverlapJoin discipline; asofJoinMerge alone, being
    // attribute-based, does tolerate shared names)
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"asofJoinNearest sides must not share column names: ${shared.mkString(", ")}")
    val b = asofJoinMerge(left, right, leftKeys, rightKeys, leftTs, rightTs,
      tieBreak, outer = true, broadcast)
    val f = asofJoinForward(left, right, leftKeys, rightKeys, leftTs, rightTs,
      tieBreak, outer = true, broadcast)
    val sfx = "__graft_near_fwd"
    val fR = f.select((c(leftId).as(s"$leftId$sfx") +:
      right.columns.map(x => c(x).as(s"$x$sfx"))): _*)
    val j = b.join(fR, c(leftId) === c(s"$leftId$sfx"), "left")
    val bDist = when(c(rightTs).isNotNull, abs(c(leftTs) - c(rightTs)))
    val fDist = when(c(s"$rightTs$sfx").isNotNull, abs(c(s"$rightTs$sfx") - c(leftTs)))
    val useB = c(rightTs).isNotNull && (fDist.isNull || bDist <= fDist)
    val chosen = right.columns.map(x =>
      when(useB, c(x)).otherwise(c(s"$x$sfx")).as(x))
    val out = j.select(left.columns.map(c) ++ chosen: _*)
    if (outer) out else out.filter(c(rightTs).isNotNull)
  }
}

/** Sort-merge backward as-of join. Children arrive co-hash-partitioned
  * on the equality keys and sorted by (keys, ts) — `EnsureRequirements`
  * inserts the exchanges/sorts from the declared requirements below, so
  * AQE still coalesces/re-plans them like any join's. The merge itself
  * is a forward-only two-pointer pass: per left row, consume right rows
  * while behind, remember the latest qualifying one (O(1) state — ONE
  * copied row), emit. Both inputs stream; neither side is ever
  * collected, buffered per group, or re-scanned.
  */
case class AsofMergeJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression], outer: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +: rightTieBreak.map(SortOrder(_, Ascending))))

  // one output row per (surviving) left row, in the left child's layout
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    // capture plain vals — the closure must not drag the SparkPlan along
    val (lOut, rOut) = (left.output, right.output)
    val (lKeysB, rKeysB, lTsB, rTsB) = (leftKeys, rightKeys, leftTs, rightTs)
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val (isOuter, outAttrs) = (outer, output)

    left.execute().zipPartitions(right.execute()) { (lIter, rIterRaw) =>
      def ordFor(types: Seq[DataType]) = {
        val attrs = types.map(t => AttributeReference("c", t)())
        GenerateOrdering.generate(attrs.map(SortOrder(_, Ascending)), attrs)
      }
      val keyOrd = ordFor(keyTypes)
      val tsOrd = ordFor(Seq(tsType))
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lmKeyProj = UnsafeProjection.create(rKeysB, rOut) // separate buffer for lastMatch's key
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      // in outer mode the null-filled right row must bind as NULLABLE, or
      // the bound references skip the null check and read zeros
      val rBind = if (isOuter) rOut.map(_.withNullability(true)) else rOut
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rBind)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rIter = rIterRaw.buffered

      new Iterator[InternalRow] {
        private var lastMatch: InternalRow = _ // latest qualifying right row (copied)
        private var ready: InternalRow = _

        private def advance(): Unit = {
          ready = null
          while (ready == null && lIter.hasNext) {
            val l = lIter.next()
            val lKeyRow = lKeyProj(l)
            val lTsRow = lTsProj(l)
            if (lKeyRow.anyNull || lTsRow.isNullAt(0)) {
              if (isOuter) ready = resultProj(joined(l, nullRight))
            } else {
              if (lastMatch != null && keyOrd.compare(lmKeyProj(lastMatch), lKeyRow) != 0)
                lastMatch = null
              var scanning = true
              while (scanning && rIter.hasNext) {
                val rKeyRow = rKeyProj(rIter.head)
                val c = if (rKeyRow.anyNull) -1 else keyOrd.compare(rKeyRow, lKeyRow)
                if (c < 0) rIter.next() // key behind every remaining left row's
                else if (c > 0) scanning = false
                else {
                  val rTsRow = rTsProj(rIter.head)
                  if (rTsRow.isNullAt(0)) rIter.next() // null ts never matches
                  else if (tsOrd.compare(rTsRow, lTsRow) <= 0) lastMatch = rIter.next().copy()
                  else scanning = false // sorted: no earlier right ts remains
                }
              }
              if (lastMatch != null) ready = resultProj(joined(l, lastMatch))
              else if (isOuter) ready = resultProj(joined(l, nullRight))
            }
          }
        }

        override def hasNext: Boolean = { if (ready == null) advance(); ready != null }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          val out = ready; ready = null; out
        }
      }
    }
  }
}

/** Broadcast backward as-of join — the plan when the right side is a
  * small dimension (sensor calibration tables, price books, config
  * snapshots): the right side broadcasts once (IdentityBroadcastMode →
  * one torrent-broadcast array per executor), each partition groups it
  * into per-key (ts, tieBreak)-sorted buckets, and the left side — the
  * at-scale fact stream — passes through NARROWLY: no exchange, no
  * sort, partitioning and ordering preserved, one hash lookup + binary
  * search per row. The per-partition index build is O(|R| log |R|) on
  * the broadcast-small side, the same trade Spark's own
  * BroadcastHashJoin makes rebuilding its HashedRelation per task.
  * Semantics are identical to [[AsofMergeJoinExec]] (same tie rule,
  * null rules, inner/outer) — [[GraftStrategy]] picks between them on
  * right-side size alone, and the A7 spec holds them equal row-for-row.
  */
case class BroadcastAsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression], outer: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // narrow over the left: everything the left child guarantees survives
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKeysB, rKeysB, lTsB, rTsB, tieB) = (leftKeys, rightKeys, leftTs, rightTs, rightTieBreak)
    val tsType = leftTs.dataType
    val (isOuter, outAttrs) = (outer, output)
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val tsAttr = Seq(AttributeReference("c", tsType)())
      val tsOrd = GenerateOrdering.generate(tsAttr.map(SortOrder(_, Ascending)), tsAttr)
      // sort candidates by (ts, tieBreak) over full right rows — "last
      // at-or-before" is then the rightmost binary-search hit
      val bucketOrd = GenerateOrdering.generate(
        SortOrder(rTsB, Ascending) +: tieB.map(SortOrder(_, Ascending)), rOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      val rBind = if (isOuter) rOut.map(_.withNullability(true)) else rOut
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rBind)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      val index = new java.util.HashMap[InternalRow, Array[InternalRow]]()
      locally {
        val grouping = new java.util.HashMap[InternalRow, scala.collection.mutable.ArrayBuffer[InternalRow]]()
        broadcastRows.value.foreach { r =>
          val k = rKeyProj(r)
          if (!k.anyNull && !rTsProj(r).isNullAt(0)) {
            var b = grouping.get(k)
            if (b == null) { b = new scala.collection.mutable.ArrayBuffer[InternalRow]; grouping.put(k.copy(), b) }
            b += r // broadcast rows are already stable copies
          }
        }
        grouping.forEach { (k, b) => index.put(k, b.sortInPlace()(bucketOrd).toArray) }
      }

      lIter.flatMap { l =>
        val lKeyRow = lKeyProj(l)
        val lTsRow = lTsProj(l)
        var matched: InternalRow = null
        if (!lKeyRow.anyNull && !lTsRow.isNullAt(0)) {
          val bucket = index.get(lKeyRow)
          if (bucket != null) {
            // rightmost row with rts <= lts
            var lo = 0
            var hi = bucket.length - 1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsOrd.compare(rTsProj(bucket(mid)), lTsRow) <= 0) { matched = bucket(mid); lo = mid + 1 }
              else hi = mid - 1
            }
          }
        }
        if (matched != null) Iterator.single(resultProj(joined(l, matched)))
        else if (isOuter) Iterator.single(resultProj(joined(l, nullRight)))
        else Iterator.empty
      }
    }
  }
}
