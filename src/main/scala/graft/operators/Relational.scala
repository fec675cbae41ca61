package graft.operators

import graft.operators.Ckpt._
import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Generic relational operators Spark lacks as single calls, composed from
  * Catalyst primitives so pushdown/AQE still apply (SURVEY.md §2b).
  */
/** [[Relational.theilSen]]'s per-basket result (top level for the UDF
  * product encoder).
  */
case class TheilSenFit(nPoints: Long, nSlopes: Long, slope: Double, intercept: Double)

object Relational {

  /** The exact-integer snapping rule shared by the moment/statistics
    * family (q44/q52/q55…q65): floor(v·scale + 0.5) — round-half-up in
    * units of 1/scale, bit-identical on any engine because both the
    * multiply and the floor are single IEEE-correctly-rounded ops.
    * Every oracle mirrors this expression verbatim; changing it here
    * changes the contract everywhere at once.
    */
  private def snap(c: Column, scale: Long): Column =
    floor(c * lit(scale.toDouble) + lit(0.5)).cast("long")

  /** Top-k rows per group by `order`, with a deterministic rank column.
    * `dense` switches row_number → dense_rank (k then bounds rank values,
    * not row count). One shuffle on the partition columns.
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String], order: Seq[Column],
      k: Int, rankName: String = "rn", dense: Boolean = false): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    val rank = (if (dense) dense_rank() else row_number()).over(w).cast("long")
    df.withColumn(rankName, rank).filter(col(rankName) <= k)
  }

  /** Gap-based sessionization: marks session starts (`new_session`) and
    * assigns a per-entity `session_id` (running count of starts). One
    * shuffle on the entity column; state is a single lag per row.
    */
  def sessionize(df: DataFrame, entityCol: String, tsMillis: Column,
      tieBreak: Column, gapMillis: Long): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(tsMillis, tieBreak)
    val prev = lag(tsMillis, 1).over(w)
    val marked = df.withColumn("new_session",
      when(prev.isNull || tsMillis - prev > gapMillis, 1L).otherwise(0L))
    marked.withColumn("session_id",
      sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Exact per-group discrete percentiles (value at rank ceil(p*n)) that
    * stay PARALLEL under low-cardinality groups. `row_number over
    * (partition by group order by value)` caps parallelism at the number
    * of groups — with 3 groups, 3 tasks sort everything no matter how big
    * the cluster is. Here the data is RANGE-partitioned on (group, value)
    * — Spark's sampling range partitioner balances rows across ALL
    * partitions regardless of group skew — sorted within partitions, then
    * two cheap metadata passes select the target ranks: (1) per-partition
    * per-group counts (|partitions|×|groups| rows to the driver) yield
    * each partition's starting rank per group; (2) each partition scans
    * once, emitting only rows whose global in-group rank is a target.
    * Ties are safe: equal values share a value, so any rank in a tie run
    * selects the same answer. Runs its Spark jobs EAGERLY (the selection
    * needs the count metadata) and returns a tiny local result — one row
    * per group: (groupCol, p<label>...).
    *
    * DRIVER-METADATA COST: the count pass ships |partitions| × |groups|
    * (group, count) entries to the driver — metadata-sized at the design
    * point (few groups, many partitions), but 10⁶ groups × 10⁴ partitions
    * would be 10¹⁰ rows. When any partition sees more than
    * `maxExactGroups` distinct groups, the operator AUTO-FALLS-BACK to
    * the plain `row_number` window plan over the same (g, v)
    * projection — rebuilt from source, NOT from the persisted sort,
    * whose range shuffle the window plan has no use for: with many
    * groups that plan is already parallel (its weakness — parallelism
    * capped at |groups| — only bites when groups are few, exactly when
    * the range-partitioned path is safe). Null values AND null groups
    * are filtered (a percentile over nulls is undefined; both paths
    * agree).
    */
  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)], partitions: Int = 0,
      maxExactGroups: Int = 4096): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0 && p <= 1 })
    val spark = df.sparkSession
    import spark.implicits._
    val par = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val gv = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val sorted = gv
      .repartitionByRange(par, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .as[(String, Double)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    var bc: org.apache.spark.broadcast.Broadcast[
      (Map[(Int, String), Long], Map[String, Seq[(String, Long)]])] = null
    try {
      // per-partition group counts; a partition that sees too many groups
      // truncates its map and raises the overflow flag instead of
      // shipping an unbounded map to the driver
      val perPart: Array[(Int, Map[String, Long], Boolean)] = sorted.mapPartitions { it =>
        val counts = mutable.LinkedHashMap.empty[String, Long]
        var overflow = false
        it.foreach { case (g, _) =>
          if (!overflow) {
            counts.update(g, counts.getOrElse(g, 0L) + 1)
            if (counts.size > maxExactGroups) { overflow = true; counts.clear() }
          }
        }
        Iterator.single((TaskContext.getPartitionId(), counts.toMap, overflow))
      }.collect()
      val distinctGroups = perPart.iterator.flatMap(_._2.keysIterator).toSet
      if (perPart.exists(_._3) || distinctGroups.size > maxExactGroups)
        return windowPercentiles(gv, groupCol, ps)
      val totals: Map[String, Long] = perPart.iterator.flatMap(_._2)
        .toSeq.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
      val targets: Map[String, Seq[(String, Long)]] = totals.map { case (g, n) =>
        g -> ps.map { case (label, p) => label -> math.max(1L, math.ceil(p * n).toLong) }
      }
      val offsets: Map[(Int, String), Long] = {
        val running = mutable.Map.empty[String, Long]
        perPart.sortBy(_._1).flatMap { case (pid, counts, _) =>
          counts.map { case (g, c) =>
            val start = running.getOrElse(g, 0L)
            running.update(g, start + c)
            (pid, g) -> start
          }
        }.toMap
      }
      bc = spark.sparkContext.broadcast((offsets, targets))
      val picked: Array[(String, String, Double)] = sorted.mapPartitions { it =>
        val (offs, tgts) = bc.value
        val pid = TaskContext.getPartitionId()
        var curG: String = null
        var rank = 0L
        var curTargets: Seq[(String, Long)] = Nil
        val out = mutable.ArrayBuffer.empty[(String, String, Double)]
        it.foreach { case (g, v) =>
          if (g != curG) {
            curG = g
            rank = offs.getOrElse((pid, g), 0L)
            curTargets = tgts.getOrElse(g, Nil)
          }
          rank += 1
          curTargets.foreach { case (label, t) => if (t == rank) out += ((g, label, v)) }
        }
        out.iterator
      }.collect()
      val byGroup = picked.groupBy(_._1)
      val rows = totals.keys.toSeq.sorted.map { g =>
        val vals = byGroup.getOrElse(g, Array.empty)
        Row.fromSeq(g +: ps.map { case (label, _) =>
          vals.find(_._2 == label).map(x => x._3: java.lang.Double).orNull
        })
      }
      val schema = StructType(StructField(groupCol, StringType) +:
        ps.map { case (label, _) => StructField(s"p$label", DoubleType) })
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    } finally {
      if (bc != null) bc.destroy() // a broadcast per call would otherwise accumulate
      sorted.unpersist()
    }
  }

  /** The plain window percentile plan — `row_number` per group, pick rank
    * ceil(p*n). Parallelism is capped at |groups|, which is exactly why
    * [[exactPercentiles]] uses it only as the HIGH-cardinality fallback
    * (many groups = many window partitions = parallel). Input: (g, v)
    * with non-null v; output schema matches the range-partitioned path.
    */
  private def windowPercentiles(gv: DataFrame, groupCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy("g").orderBy("v")
    val ranked = gv
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
    val aggs = ps.map { case (label, p) =>
      val target = greatest(lit(1L), ceil(col("n") * p).cast("long"))
      max(when(col("rn") === target, col("v"))).as(s"p$label")
    }
    ranked.groupBy(col("g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(groupCol)
  }

  /** Cohort retention matrix: entities are cohorted by the period of
    * their FIRST event; each (cohort, periods-since) cell counts the
    * distinct entities active in that later period. Two aggregations —
    * first-event per entity (map-side partial min), then the
    * cohort×offset distinct count — joined through a broadcast-friendly
    * per-entity table; the analytics backbone behind every retention
    * dashboard. `periodMs` is the bucket (week = 7*86400*1000).
    * Output: cohort (period index of first event), offset (periods
    * since cohort), n_active (distinct entities).
    */
  def retention(df: DataFrame, entityCol: String, tsMillis: Column,
      periodMs: Long): DataFrame = {
    require(periodMs > 0)
    // floor, not cast-truncate: the oracle mirrors `floor(t / p)` textually
    // (DuckDB CAST rounds half-even; floor agrees across engines)
    val period = floor(tsMillis / periodMs).cast("long")
    val e = df.select(col(entityCol).as("_e"), period.as("_p"))
    val firsts = e.groupBy("_e").agg(min("_p").as("_cohort"))
    e.join(firsts, "_e")
      .groupBy(col("_cohort").as("cohort"), (col("_p") - col("_cohort")).as("offset"))
      .agg(countDistinct("_e").as("n_active"))
  }

  /** Range join on a numeric key: pairs every left row with the right
    * rows whose key falls in [leftKey + lower, leftKey + upper] (the
    * time-correlation join — "errors within ±5 s of a purchase").
    * Spark plans a raw inequality join as a broadcast-nested-loop —
    * O(|L|·|R|) comparisons, the classic 100 TB cartesian trap. Here
    * both sides are BINNED at the window width, so candidates meet in a
    * hash EQUI-join on the bin id: each left row explodes to the ≤ 2
    * bins its window overlaps, each right row lands in exactly one, and
    * the exact range predicate then keeps true matches. Shuffle key =
    * bin id; fan-out is bounded by rows-per-bin (pick the window, and
    * therefore the bin width, for the correlation you mean — a window
    * spanning half the corpus is a cross join no matter the plan).
    * `leftKey`/`rightKey` must reference distinctly-named columns.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, lower: Long, upper: Long): DataFrame = {
    require(upper >= lower, s"empty range [$lower, $upper]")
    // shared names make 'rightKey >= leftKey + lower' ambiguous; with
    // failAmbiguousSelfJoin disabled Spark silently resolves both refs to
    // one side and the range predicate degrades to always-true — fail loud
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"rangeJoin sides must not share column names (ambiguous key refs): ${shared.mkString(", ")}")
    val w = math.max(1L, upper - lower + 1)
    def binOf(x: Column) = ((x - pmod(x, lit(w))) / w).cast("long") // floor div, exact for |x| < 2^53
    val l = left.withColumn("_bin",
      explode(sequence(binOf(leftKey + lower), binOf(leftKey + upper))))
    val r = right.withColumn("_rbin", binOf(rightKey))
    l.join(r, col("_bin") === col("_rbin") &&
        rightKey >= leftKey + lower && rightKey <= leftKey + upper)
      .drop("_bin", "_rbin")
  }

  /** Interval × interval overlap join (Allen "overlaps/during/meets"
    * family, CLOSED intervals): pairs (l, r) sharing a key whose spans
    * [lStart,lEnd] and [rStart,rEnd] intersect, without the
    * broadcast-nested-loop a raw inequality join plans to. Both sides
    * explode to the GRID CELLS their interval covers (width `cellWidth`)
    * and candidates meet in a hash equi-join on (key, cell). A pair
    * overlapping k shared cells would surface k times; instead of a
    * post-join `distinct` — a second full exchange of the matched
    * stream — each pair is emitted EXACTLY ONCE, in the one cell
    * containing `greatest(lStart, rStart)` (that instant lies in both
    * intervals whenever they overlap, so both sides are guaranteed to
    * have exploded that cell). Shuffle key = (key, cell); fan-out is
    * interval-length / cellWidth per row, so pick cellWidth near the
    * typical interval length (cells ~rows stay constant as data
    * grows — the 100 TB knob is the cell, not the plan). Sides must
    * not share column names (same loud guard as rangeJoin — silent
    * self-join resolution would degrade the predicate).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      lStart: Column, lEnd: Column, rStart: Column, rEnd: Column,
      cellWidth: Long): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive: $cellWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"intervalOverlapJoin sides must not share column names: ${shared.mkString(", ")}")
    require(!(left.columns ++ right.columns).exists(x => x == "_lcell" || x == "_rcell"),
      "intervalOverlapJoin: reserved column names _lcell/_rcell present on an input")
    def cellOf(x: Column) =
      ((x - pmod(x, lit(cellWidth))) / cellWidth).cast("long") // floor div, exact for |x| < 2^53
    val l = left.withColumn("_lcell", explode(sequence(cellOf(lStart), cellOf(lEnd))))
    val r = right.withColumn("_rcell", explode(sequence(cellOf(rStart), cellOf(rEnd))))
    l.join(r, col("_lcell") === col("_rcell") && leftKey === rightKey &&
        lStart <= rEnd && rStart <= lEnd &&
        col("_lcell") === cellOf(greatest(lStart, rStart)))
      .drop("_lcell", "_rcell")
  }

  /** Sequential conversion funnel (the ClickHouse `windowFunnel` shape):
    * for each entity, greedily match `steps` in order — step k+1 must
    * occur STRICTLY after the matched step k, earliest-first (so the
    * result is deterministic and independent of tie order). One shuffle
    * on the entity; each entity's events are scanned once in ts order
    * inside `mapGroups` (state = one timestamp per step — events per
    * entity are bounded in practice, the same contract every funnel
    * engine makes). Entities appear even when they complete 0 steps.
    * `windowMs` is windowFunnel's completion window: with Some(w), a
    * step only matches within w ms of the matched FIRST step; on
    * expiry the scan restarts the chain at the current event if it is a
    * first-step event (the greedy sliding restart), so a conversion
    * beginning later than the first attempt is still found; the longest
    * chain across restarts is reported. Greedy caveat: a chain
    * OVERLAPPING a live one (a second step-1 event before the live
    * chain expires) is not tracked — exact multi-chain tracking costs
    * per-window state; the greedy answer is the standard funnel trade.
    * Output: entityCol (long), reached (steps completed), t1..tk
    * epoch-ms (null where not reached).
    */
  def funnel(df: DataFrame, entityCol: String, tsMillis: Column,
      stepCol: String, steps: Seq[String], windowMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMs.forall(_ > 0), "completion window must be positive")
    // a silent long-cast would merge fractional ids and null out strings
    // (crashing deep in the encoder) — same guard as packSequences
    require(Seq(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
        .contains(df.schema(entityCol).dataType),
      s"funnel groups by an integral entity id; '$entityCol' is " +
        s"${df.schema(entityCol).dataType.simpleString} — map other id types to a " +
        "stable numeric surrogate (e.g. polyHash) first")
    val spark = df.sparkSession
    import spark.implicits._
    val n = steps.length
    val packed = df
      .select(col(entityCol).cast("long").as("e"), tsMillis.cast("long").as("t"),
        col(stepCol).cast("string").as("s"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (e, it) =>
        val evs = it.toArray.sortBy(_._2)
        var best = (0, Array.fill[Option[Long]](n)(None))
        var times = Array.fill[Option[Long]](n)(None)
        var k = 0
        evs.foreach { case (_, t, s) =>
          val expired = windowMs.exists(w => k > 0 && t - times(0).get > w)
          if (expired) {
            if (k > best._1) best = (k, times)
            times = Array.fill[Option[Long]](n)(None)
            k = 0
          }
          if (k < n && s == steps(k) && (k == 0 || t > times(k - 1).get)) {
            times(k) = Some(t)
            k += 1
          }
        }
        if (k > best._1) best = (k, times)
        (e, best._1.toLong, best._2.toSeq)
      }
    val outCols = col("_1").as(entityCol) +: col("_2").as("reached") +:
      (0 until n).map(i => col("_3").getItem(i).as(s"t${i + 1}"))
    packed.select(outCols: _*)
  }

  /** AS-OF join: for each left row, the single most-recent right row with
    * rightTs <= leftTs on the same key (ties on rightTs broken by max
    * rightId). Spark has no native ASOF operator; a join + argmax would
    * materialize every (left × all-prior-right) pair before aggregating —
    * quadratic under a heavy-tail key. Instead: union both sides, one
    * window per key ordered by (ts, side, rightId) with a running
    * `last(rightId) ignore nulls` — right rows sort before left rows at
    * equal ts, so each left row reads its match off the running value.
    * ONE shuffle on the key, zero fan-out, ids never packed/bounded.
    * Left rows with no prior right row are dropped (inner-asof semantics).
    * Output: one row per left row — leftId, asof_<rightId>.
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, leftId: String, rightId: String): DataFrame = {
    val lidT = left.schema(leftId).dataType
    val ridT = right.schema(rightId).dataType
    val r = right.select(col(rightKey).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"), lit(null).cast(lidT).as("_lid"), col(rightId).as("_rid"))
    val l = left.select(col(leftKey).as("_k"), col(leftTs).as("_ts"),
      lit(1).as("_side"), col(leftId).as("_lid"), lit(null).cast(ridT).as("_rid"))
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_asof", last(col("_rid"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_asof").isNotNull)
      .select(col("_lid").as(leftId), col("_asof").as("asof_" + rightId))
  }

  /** Time-series gap fill (forward fill / LOCF): every entity gets a
    * DENSE bucket grid from its first to its last observation, missing
    * buckets carry the last observed value forward, and `observed` marks
    * real vs filled rows — the resample-then-fill step of feature
    * pipelines and dashboards. Within-bucket conflicts resolve
    * deterministically to the observation with the greatest `tie`
    * (pass struct(ts, id): latest event wins, id breaks exact ties) via
    * a `max_by` partial aggregation — no within-bucket sort.
    *
    * Scale shape: the grid explode is bounded by each entity's own span
    * (`sequence(b0, b1)` — never a global calendar cross join); the fill
    * window partitions per ENTITY, parallel across entities (entity
    * cardinality is the parallelism, the safe direction — contrast the
    * corpusReport median note, where groups are FEW and windows would
    * serialize). Output: entityCol, bucket, value (filled), observed.
    */
  def gapFill(df: DataFrame, entityCol: String, bucket: Column,
      value: Column, tie: Column): DataFrame =
    denseGridFill(df, entityCol, bucket, value, tie, interp = false)

  /** Shared engine of [[gapFill]] / [[interpolate]] (r14). Double-typed
    * values take the single-pass NATIVE path: the deduplicated
    * observation table collapses to one sorted (b, v) array per entity
    * and `graft_grid_fill` emits the dense grid directly — TWO exchanges
    * total ((entity, bucket) dedup, then the per-entity collect) and
    * zero joins, where the window form paid the span aggregation, the
    * grid⋈obs join and a grid-sized window exchange + two in-partition
    * sorts (q101 3.75 → ~1.9 s, q36 2.79 → ~1.5 s solo at sf0.1). Fill
    * values are bit-identical by construction (LOCF copies; the interp
    * expression replays the same IEEE op sequence — see GridFillGen).
    * Rows whose entity is NULL keep the window plan's exact join-miss
    * behavior (a null key never equi-joins: every bucket unobserved,
    * every value null) via a tiny dedicated union arm. Non-double value
    * types keep the window plan unchanged (the interp arithmetic is
    * type-sensitive — integer division differs from double division).
    */
  private def denseGridFill(df: DataFrame, entityCol: String, bucket: Column,
      value: Column, tie: Column, interp: Boolean): DataFrame = {
    val base = df.select(col(entityCol).as("_e"), bucket.as("_b"),
      value.as("_v"), tie.as("_t"))
    val obs = base.groupBy("_e", "_b").agg(max_by(col("_v"), col("_t")).as("_v"))
    // native path needs exactly (bigint bucket, double value) — the
    // generator reads primitive slots; any other input shape keeps the
    // window plan (including int buckets, which the sequence() form
    // accepted)
    if (base.schema("_v").dataType == DoubleType &&
        base.schema("_b").dataType == LongType) {
      graft.functions.GridFillGen.register(df.sparkSession)
      val series = obs.filter(col("_e").isNotNull && col("_b").isNotNull)
        .groupBy("_e")
        .agg(sort_array(collect_list(struct(col("_b"), col("_v")))).as("_s"))
      val filled = series.select(col("_e").as(entityCol),
        graft.functions.GridFillGen.gridFill(col("_s"), interp))
      // the null-entity grid: the window form's grid⋈obs equi-join can
      // never match a null key, so those buckets all emit (null value,
      // observed = false) — reproduce that contract exactly
      val nullE = obs.filter(col("_e").isNull)
        .groupBy("_e").agg(min("_b").as("_b0"), max("_b").as("_b1"))
        .select(col("_e").as(entityCol),
          explode(sequence(col("_b0"), col("_b1"))).as("bucket"))
        .withColumn("value", lit(null).cast(DoubleType))
        .withColumn("observed", lit(false))
      filled.unionByName(nullE)
    } else if (!interp) {
      val span = obs.groupBy("_e").agg(min("_b").as("_b0"), max("_b").as("_b1"))
      val grid = span.select(col("_e"), explode(sequence(col("_b0"), col("_b1"))).as("_b"))
      val w = Window.partitionBy("_e").orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("_e", "_b"), "left")
        .select(col("_e").as(entityCol), col("_b").as("bucket"),
          last(col("_v"), ignoreNulls = true).over(w).as("value"),
          col("_v").isNotNull.as("observed"))
    } else {
      val span = obs.groupBy("_e").agg(min("_b").as("_b0"), max("_b").as("_b1"))
      val grid = span.select(col("_e"), explode(sequence(col("_b0"), col("_b1"))).as("_b"))
      val wPrev = Window.partitionBy("_e").orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the forward neighbor as a RUNNING frame over DESCENDING order —
      // never `currentRow → unboundedFollowing`, whose WindowFunctionFrame
      // recomputes the aggregate per row (O(n²) per partition; measured
      // 35 s vs 2 s on the 1M-row sf0.1 grid). Two orderings = two O(n)
      // in-partition sorts over ONE exchange.
      val wNext = Window.partitionBy("_e").orderBy(col("_b").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pv = last(col("_v"), ignoreNulls = true).over(wPrev)
      val pb = last(when(col("_v").isNotNull, col("_b")), ignoreNulls = true).over(wPrev)
      val nv = last(col("_v"), ignoreNulls = true).over(wNext)
      val nb = last(when(col("_v").isNotNull, col("_b")), ignoreNulls = true).over(wNext)
      grid.join(obs, Seq("_e", "_b"), "left")
        .select(col("_e").as(entityCol), col("_b").as("bucket"),
          when(col("_v").isNotNull, col("_v"))
            .otherwise(pv + (nv - pv) * (col("_b") - pb) / (nb - pb)).as("value"),
          col("_v").isNotNull.as("observed"))
    }
  }

  /** Dense-grid LINEAR interpolation (pandas `interpolate(method=
    * "linear")` over a resampled series): [[gapFill]]'s grid with each
    * missing bucket filled by the LINE between its bracketing
    * observations instead of the last one carried forward — the right
    * fill for continuously-varying signals (sensor readings, prices)
    * where LOCF introduces staircase bias. The grid spans min..max
    * OBSERVED bucket per entity, so every gap is interior and both
    * neighbors always exist (no edge policy needed). Same scale shape
    * as gapFill: one shuffle on the entity; the backward and forward
    * neighbor scans are two RUNNING frames (ascending and descending
    * order) over that one exchange; parallelism grows with entities
    * (the safe direction).
    * Per-row IEEE arithmetic (no aggregation-order dependence) — the
    * oracle states the identical expression shape.
    */
  def interpolate(df: DataFrame, entityCol: String, bucket: Column,
      value: Column, tie: Column): DataFrame =
    denseGridFill(df, entityCol, bucket, value, tie, interp = true)

  /** CDC log compaction / upsert materialization: the LATEST row per key,
    * where latest = lexicographic max of `orderCols` (pass a trailing
    * unique column — a sequence number, an id — to break order ties
    * deterministically). One `max_by` partial aggregation: the map side
    * keeps ONE candidate row per key per partition, so the shuffle
    * carries |keys| rows regardless of change-log depth — the reason
    * this is a groupBy and not the `row_number() = 1` window plan, which
    * ships every version of every key to its key's partition before
    * discarding all but one. `payloadCols` must be aliased to their
    * output names.
    */
  def latestByKey(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      payloadCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty && payloadCols.nonEmpty)
    df.groupBy(col(keyCol))
      .agg(max_by(struct(payloadCols: _*), struct(orderCols: _*)).as("_p"))
      .select(col(keyCol), col("_p.*"))
  }

  /** Sketch-based distinct counts — the 100 TB replacement for exact
    * `count(distinct)`: a Datasketches HLL sketch per group (`lgK`
    * buckets → ~1.6%/√2^lgK relative error), built with partial (map-
    * side) aggregation, so the shuffle carries one ≤2^lgK-byte sketch
    * per group per partition instead of every distinct value. Exact
    * q09-style distinct counts shuffle the full value set; this never
    * does. `valueCol` must be int/bigint/string/binary (the Datasketches
    * HLL input domain — doubles fail at analysis; cast or hash first).
    * Output: groupCols..., distinct_est (long).
    */
  def sketchDistinct(df: DataFrame, valueCol: String, groupCols: Seq[String],
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
        .as("distinct_est"))

  /** The reusable-sketch half of [[sketchDistinct]]: materialize one HLL
    * sketch per group (e.g. per ingest day/shard) as a binary column —
    * store these instead of re-scanning raw data for every distinct
    * question. Output: groupCols..., sketch (binary).
    */
  def sketchBuild(df: DataFrame, valueCol: String, groupCols: Seq[String],
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll stored sketches up WITHOUT re-reading raw data:
    * `hll_union_agg` merges sketches losslessly (the union of HLL
    * registers), so a year of daily sketches answers "distinct users
    * this year" from ~365 tiny rows per group. The rolled-up estimate
    * carries the same ~1.6%/√2^lgK error bound as a direct sketch of
    * the concatenated raw data (it is not bit-identical — Datasketches
    * unions merge through a common HLL_8 gadget, so mode-transition
    * history can nudge the registers; the spec bounds both against the
    * exact count).
    */
  def sketchRollup(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("distinct_est"))

  /** Explicit salted join for skewed keys: replicates the (small but not
    * broadcast-able) `dim` side `salts`× and scatters each hot fact key
    * across `salts` shuffle partitions, bounding any single task at
    * 1/salts of the hottest key. Use when AQE's skew-join split can't
    * apply (it only rewrites sort-merge joins whose partitions it can
    * split — aggregated-upstream exchanges and some outer shapes stay
    * skewed). The fact-side salt is a HASH of the fact row's columns
    * (`saltSrc`, default all columns) — deterministic, layout-
    * independent, never an RNG. Result is EXACTLY the plain inner
    * join's (spec-asserted); only the physical distribution changes.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String, salts: Int,
      saltSrc: Seq[Column] = Nil, dimHint: Option[String] = None): DataFrame = {
    require(salts > 0, "salts must be positive")
    val src = if (saltSrc.nonEmpty) saltSrc else fact.columns.toSeq.map(col)
    val f = fact.withColumn("_salt", pmod(hash(src: _*), lit(salts)))
    val d0 = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // A caller-side hint sits below the salt explode where the planner
    // loses it; applied here it wraps the immediate join child. Pass
    // "shuffle_hash" when a broadcast of the dim would defeat the
    // point of the salt (skew demos, medium dims).
    val d = dimHint.fold(d0)(d0.hint(_))
    f.join(d, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** Item-item co-occurrence: for every unordered item pair, the number
    * of entities whose basket (distinct item set) contains both — the
    * candidate-generation core of co-purchase / co-click analysis.
    * Plan discipline at scale: ONE corpus scan, two shuffles. Baskets
    * form by `collect_set` (map-side partial sets — raw event
    * multiplicity collapses before the shuffle); entities with more
    * than `maxBasket` distinct items are dropped whole (the
    * d02/d04/d05 hot-key cap — a bot touching every item contributes
    * n² pairs and no signal); pair generation is a NARROW array
    * expansion of each sorted basket (≤ maxBasket²/2 rows per entity —
    * the self-join formulation this replaced re-scanned and
    * re-shuffled the basket table twice more, 5 corpus scans in the
    * audited plan); pair counts partial-agg down to ≤|items|² rows.
    * Per-entity distinct sets must fit a task (inherent to any basket
    * model; `maxBasket` is also that guard). Output: item_a < item_b,
    * n_entities.
    */
  /** Pin a small fan-out source at full shuffle parallelism. AQE rightly
    * coalesces a few-MB basket/neighbor-list exchange down to 1–5
    * partitions — but the NEXT stage explodes every row quadratically, so
    * those few tasks inherit the entire pair expansion single-threaded
    * (measured 3–4× on q81/q92 at sf0.1). An explicit-count round-robin
    * repartition is exempt from AQE coalescing and costs one exchange of
    * the SMALL aggregated table, not the expansion.
    */
  private[operators] def fanoutRepartition(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** The shared skew-safe basket builder of the whole basket family
    * (cooccurrence / associationRules / itemSimilarity / setOverlap):
    * per-entity SORTED distinct-item arrays, hot entities refused at
    * `maxBasket` via the bounded collect-set aggregate — `collect_set`
    * + size filter would buffer a degenerate entity's whole item set in
    * one reduce task before the filter could drop it (the count-window
    * hazard in aggregate form); here every buffer holds ≤ maxBasket+1
    * distinct items, duplicates collapse map-side at first touch, and a
    * basket that reached the cap is dropped exactly. Output: (_e,
    * _items) with size(_items) ≤ maxBasket, complete and sorted.
    */
  private def cappedBaskets(df: DataFrame, entityCol: String, itemCol: String,
      maxBasket: Int): DataFrame = {
    require(maxBasket >= 1 && maxBasket < Int.MaxValue,
      s"maxBasket out of range: $maxBasket")
    graft.functions.BoundedCollect.register(df.sparkSession)
    df.groupBy(col(entityCol).as("_e"))
      .agg(sort_array(graft.functions.BoundedCollect.boundedCollectSet(
        col(itemCol), lit(maxBasket + 1))).as("_items"))
      .filter(size(col("_items")) <= maxBasket)
  }

  def cooccurrence(df: DataFrame, entityCol: String, itemCol: String,
      maxBasket: Int = 1000): DataFrame = {
    graft.functions.PairExplode.register(df.sparkSession)
    val baskets = fanoutRepartition(cappedBaskets(df, entityCol, itemCol, maxBasket)
      .filter(size(col("_items")) >= 2))
    // native one-pass pair generator (same (i < j) rows as the nested
    // transform/flatten HOF chain it replaced — see PairExplode)
    baskets.select(graft.functions.PairExplode.pairExplode(col("_items")))
      .groupBy(col("a").as("item_a"), col("b").as("item_b"))
      .agg(count(lit(1)).cast("long").as("n_entities"))
  }

  /** Association rules over entity baskets (market-basket / term-affinity
    * mining, the Agrawal–Srikant Apriori output at pair length): for every
    * DIRECTED item pair (ante → cons) co-occurring in ≥ `minBoth` baskets
    * with confidence ≥ `minConf`, emit support counts, confidence
    * P(cons|ante) and lift. Plan discipline: the capped distinct-basket
    * table materializes ONCE (localCheckpoint) and feeds all three
    * readers — the basket count (a driver scalar, q16's metadata
    * discipline), per-item counts, and the narrow pair expansion shared
    * with [[cooccurrence]]; the per-item count table is vocabulary-sized,
    * so both enrichment joins BROADCAST. Cross-engine determinism: every
    * score is ONE division of exact integer products (confidence =
    * n_both/n_ante; lift = n·n_both / (n_ante·n_cons)) — int→double
    * conversion and a single divide are correctly rounded IEEE ops, so
    * the values and the `minConf` threshold row SET are bit-identical on
    * any engine (integer products must fit a long — guaranteed when
    * basket count < 2^31, document the shard-and-sum path beyond).
    * Output: ante, cons, n_both, n_ante, n_cons, confidence, lift.
    */
  def associationRules(df: DataFrame, entityCol: String, itemCol: String,
      minBoth: Long, minConf: Double, maxBasket: Int = 1000): DataFrame = {
    require(minBoth >= 1, "minBoth must be at least 1")
    require(minConf >= 0.0 && minConf <= 1.0, "minConf must be in [0, 1]")
    graft.functions.PairExplode.register(df.sparkSession)
    val baskets = fanoutRepartition(cappedBaskets(df, entityCol, itemCol, maxBasket)
      .filter(size(col("_items")) >= 2))
      .eagerPin()
    val nBaskets = baskets.count()
    val items = baskets.select(explode(col("_items")).as("item"))
      .groupBy("item").agg(count(lit(1)).cast("long").as("n_item"))
    // the pair table is the expensive subtree (native one-pass pair
    // generator — see PairExplode — + one shuffle) and the directed
    // union below reads it TWICE — materialize the small post-threshold
    // set or the whole expansion re-runs per arm
    val pairs = baskets.select(graft.functions.PairExplode.pairExplode(col("_items")))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n_both"))
      .filter(col("n_both") >= minBoth)
      .eagerPin()
    val directed = pairs.select(col("a").as("ante"), col("b").as("cons"), col("n_both"))
      .union(pairs.select(col("b").as("ante"), col("a").as("cons"), col("n_both")))
    directed
      .join(broadcast(items.select(col("item").as("ante"), col("n_item").as("n_ante"))), Seq("ante"))
      .join(broadcast(items.select(col("item").as("cons"), col("n_item").as("n_cons"))), Seq("cons"))
      .withColumn("confidence", col("n_both").cast("double") / col("n_ante").cast("double"))
      .withColumn("lift", (lit(nBaskets) * col("n_both")).cast("double") /
        (col("n_ante") * col("n_cons")).cast("double"))
      .filter(col("confidence") >= minConf)
      .select("ante", "cons", "n_both", "n_ante", "n_cons", "confidence", "lift")
  }

  /** Per-group ordinary-least-squares linear trend (slope + intercept of
    * value over an integer x such as a day index) — the metric-drift /
    * seasonality-direction detector, built on the q44 exact-integer
    * moment discipline: values snap to integer units (`scale`, default
    * cents) and x casts to long, so ALL five sufficient statistics
    * (n, Σx, Σy, Σx², Σxy) are EXACT integer sums — identical in any
    * accumulation order on any engine. The closed form then evaluates as
    * a FIXED double expression tree over those exact sums (each cast and
    * arithmetic op individually IEEE-correctly-rounded), so slope and
    * intercept are bit-identical cross-engine even when a sum exceeds
    * 2^53 (both engines round the same integer the same way). ONE
    * partial-agg pass; output is |groups| rows. Rows with a null x or
    * value drop WHOLE before aggregation (a half-null row would
    * desynchronize n from the sums). Groups with n < 2 or zero
    * x-variance are dropped — no slope exists. Integer-range bound:
    * Σ(x·y_scaled) must fit a long (~9.2·10¹⁸); with day-index x and
    * cent values that holds through ~10⁹ rows/group — shard-and-sum
    * beyond, as q44. Output: groupCols, n, slope (units/x-step at
    * `scale`), intercept.
    */
  def linearTrend(df: DataFrame, groupCols: Seq[String], xCol: Column,
      valueCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    val x = xCol.cast("long")
    val y = snap(valueCol, scale)
    val pts = df.select(gcols :+ x.as("_x") :+ y.as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
    val s = pts.groupBy(gcols: _*).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("_x")).cast("double").as("_sx"),
      sum(col("_y")).cast("double").as("_sy"),
      sum(col("_x") * col("_x")).cast("double").as("_sxx"),
      sum(col("_x") * col("_y")).cast("double").as("_sxy"))
    val nd = col("n").cast("double")
    s.withColumn("_den", nd * col("_sxx") - col("_sx") * col("_sx"))
      .filter(col("n") >= 2 && col("_den") > 0)
      .withColumn("slope", (nd * col("_sxy") - col("_sx") * col("_sy")) / col("_den"))
      .withColumn("intercept", (col("_sy") - col("slope") * col("_sx")) / nd)
      .select(gcols :+ col("n") :+ col("slope") :+ col("intercept"): _*)
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences (the "what happens next" of product/path analysis, and
    * the training counts of a sequence model): for each ordered pair of
    * consecutive events within an entity, the transition count and the
    * conditional probability P(to | from). One entity-keyed shuffle for
    * the `lead` window (parallelism = entities — the safe window
    * direction; never a global order), then the (from, to) counts
    * partial-agg down to ≤ |event types|² rows, and the row-count table
    * they imply is tiny, so the normalizing join BROADCASTS. Each
    * entity's LAST event has no successor and contributes no row.
    * (ts, tie) must be unique per entity for a deterministic sequence —
    * same contract as q07/q39. prob is ONE division of exact longs —
    * bit-identical cross-engine. Output: from_event, to_event, n_trans,
    * n_from, prob.
    */
  def eventTransitions(df: DataFrame, entityCol: String, eventCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val trans = df
      .select(col(eventCol).as("from_event"),
        lead(col(eventCol), 1).over(w).as("to_event"))
      .filter(col("to_event").isNotNull)
      .groupBy("from_event", "to_event")
      .agg(count(lit(1)).cast("long").as("n_trans"))
    val fromTotals = trans.groupBy("from_event")
      .agg(sum("n_trans").cast("long").as("n_from"))
    trans.join(broadcast(fromTotals), Seq("from_event"))
      .withColumn("prob", col("n_trans").cast("double") / col("n_from").cast("double"))
      .select("from_event", "to_event", "n_trans", "n_from", "prob")
  }

  /** Running interval concurrency ("how many are open at each moment" —
    * in-transit shipments, live sessions, concurrent calls) as a
    * PARALLEL PREFIX SUM. The textbook plan — `sum(delta) over (order
    * by t rows unbounded preceding)` with no partition key — collapses
    * to ONE task sorting the entire corpus on any engine; this operator
    * keeps the d16/q16 range-partition discipline instead: ±1 event
    * points are range-partitioned and sorted on the total order
    * (t, delta, id), each partition's delta sum (one long per
    * partition) comes back as metadata, the driver prefix-sums those
    * into per-partition offsets (broadcast), and one map-side pass
    * emits offset + local running sum. Output VALUES are partition-
    * count-independent (the offsets absorb wherever the sampling range
    * partitioner cut), so correctness is invariant while parallelism
    * scales with the cluster. Equal-timestamp policy is half-open
    * [start, end): ends (-1) sort before starts (+1) at the same t, so
    * a back-to-back handoff never double-counts. Ties broken by id —
    * any orderable type, kept NATIVE (a numeric cast would null out
    * string keys and silently drop their rows); (t, delta, id) must be
    * unique for a deterministic series. Intervals with a null endpoint
    * or id are dropped WHOLE — filtering the point table element-wise
    * would strand the partner ±1 and corrupt every count after it.
    * Output: t, delta, id, concurrency (the running count AFTER this
    * event point).
    */
  def runningConcurrency(df: DataFrame, idCol: Column, startMillis: Column,
      endMillis: Column, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val par = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val iv = df.filter(startMillis.isNotNull && endMillis.isNotNull && idCol.isNotNull)
    val pts = iv.select(startMillis.cast("long").as("t"), lit(1).as("delta"),
        idCol.as("id"))
      .unionAll(iv.select(endMillis.cast("long").as("t"), lit(-1).as("delta"),
        idCol.as("id")))
    // materialize the sorted layout ONCE: the partial-sum pass and the
    // emit pass must see the SAME partitioning (a re-run of a sampling
    // range partitioner could cut elsewhere and misalign the offsets)
    val sorted = pts.repartitionByRange(par, col("t"), col("delta"), col("id"))
      .sortWithinPartitions("t", "delta", "id")
      .eagerPin()
    val dIdx = sorted.schema.fieldIndex("delta")
    val partials = sorted.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _.getInt(dIdx))
      Iterator.single((TaskContext.getPartitionId(), s))
    }.collect().sortBy(_._1) // |partitions| longs — metadata, like q16's counts
    val offsets: Map[Int, Long] =
      partials.map(_._1).zip(partials.scanLeft(0L)(_ + _._2)).toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = sorted.schema
      .add(StructField("concurrency", org.apache.spark.sql.types.LongType, nullable = false))
    sorted.mapPartitions({ it =>
      val pid = TaskContext.getPartitionId()
      var run = bc.value.getOrElse(pid, 0L)
      it.map { r => run += r.getInt(dIdx); Row.fromSeq(r.toSeq :+ run) }
    })(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Per-group z-score outlier detection over a fixed-point value column
    * (the anomaly gate of a metrics/quality pipeline), built for
    * CROSS-ENGINE determinism: the value is first snapped to integer
    * `scale`-ths (floor(v*scale + 0.5), the shared rounding formula), so
    * the group moment sums are INTEGER sums — exact in doubles below
    * 2^53 in ANY accumulation order — and mean/variance/z come out
    * bit-identical on every engine that mirrors the formula, making the
    * |z| >= threshold row SET reproducible (a float-summed mean differs
    * in the last ulp per engine and can flip boundary rows). Two
    * narrow-ish passes: a partial-agg groupBy for (n, Σc, Σc²) — output
    * is |groups| rows, broadcast back — then a map-side filter. No
    * window, no per-group sort, so parallelism never caps at |groups|.
    * Groups with n < 2 or zero variance produce no rows (z undefined).
    * Domain bound: Σc and Σc² accumulate as LONG (the external mirror
    * sums exactly too, e.g. 128-bit) and the final sums must also sit
    * below 2^53 so the closing double cast is exact — size `scale` to
    * the value domain (cents over ~10⁹ rows/group of ~10⁵-cent values
    * is inside the bound; raise-scale-at-will is not free).
    * Output: groupCols, payloadCols, z (unrounded — round at the
    * binding).
    */
  def zscoreOutliers(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      threshold: Double, payloadCols: Seq[Column], scale: Long = 100L): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    require(scale >= 1, "scale must be >= 1")
    val c = snap(valueCol, scale)
    val withC = df.withColumn("_c", c)
    val gcols = groupCols.map(col)
    val stats = withC.groupBy(gcols: _*).agg(
      count(lit(1)).as("_n"), sum(col("_c")).as("_s"),
      sum(col("_c") * col("_c")).as("_ss"))
    val n = col("_n").cast("double")
    val mean = col("_s").cast("double") / n
    val variance = (col("_ss").cast("double") - col("_s").cast("double") * col("_s") / n) /
      (n - lit(1.0))
    val ready = stats.filter(col("_n") >= 2)
      .withColumn("_mean", mean).withColumn("_sd", sqrt(variance))
      .filter(col("_sd") > 0)
      .select(gcols :+ col("_mean") :+ col("_sd"): _*)
    val z = (col("_c").cast("double") - col("_mean")) / col("_sd")
    withC.join(broadcast(ready), groupCols)
      .withColumn("z", z)
      .filter(abs(col("z")) >= threshold)
      .select(gcols ++ payloadCols :+ col("z"): _*)
  }

  /** Per-group Pearson correlation between two metrics (the feature-pair
    * dependence scan of data profiling), built for CROSS-ENGINE
    * determinism like q44/q52: both values snap to integer units
    * (floor(v·scale + 0.5)), so all five sufficient statistics are EXACT
    * integer sums — order-independent in any accumulation — and
    * r = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²)) is a fixed
    * double expression tree (each op, including sqrt, IEEE
    * correctly-rounded ⇒ bit-identical on any engine). ONE partial-agg
    * pass, |groups| output rows, no window, no second scan. Rows where
    * either value is null drop WHOLE (a half-pair would skew both
    * marginals); groups with n < 2 or zero variance on either side are
    * dropped (r undefined). Overflow contract as q44: Σx² must fit a
    * long — cents over ~10⁹ rows/group of ~10⁵-cent values is inside the
    * bound. Output: groupCols, n, corr.
    */
  def pearsonCorr(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, scaleX: Long = 1L, scaleY: Long = 100L): DataFrame = {
    require(scaleX >= 1 && scaleY >= 1, "scales must be >= 1")
    val gcols = groupCols.map(col)
    val x = snap(xCol, scaleX)
    val y = snap(yCol, scaleY)
    val pts = df.select(gcols :+ x.as("_x") :+ y.as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
    val s = pts.groupBy(gcols: _*).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("_x")).cast("double").as("_sx"),
      sum(col("_y")).cast("double").as("_sy"),
      sum(col("_x") * col("_x")).cast("double").as("_sxx"),
      sum(col("_y") * col("_y")).cast("double").as("_syy"),
      sum(col("_x") * col("_y")).cast("double").as("_sxy"))
    val nd = col("n").cast("double")
    s.withColumn("_dx", nd * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_dy", nd * col("_syy") - col("_sy") * col("_sy"))
      .filter(col("n") >= 2 && col("_dx") > 0 && col("_dy") > 0)
      .withColumn("corr",
        (nd * col("_sxy") - col("_sx") * col("_sy")) / (sqrt(col("_dx")) * sqrt(col("_dy"))))
      .select(gcols :+ col("n") :+ col("corr"): _*)
  }

  /** Per-group Gini coefficient over per-entity totals (the inequality /
    * concentration metric of spend, contribution and token-budget
    * analysis): G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) with x₍ᵢ₎ the
    * group's values ascending. Values snap to integer units so both
    * aggregate sums are EXACT integers; the rank product i·x is a long
    * product of exact longs, and the final expression is one fixed
    * double tree — bit-identical cross-engine. The within-group ranking
    * is a window partitioned by the GROUP columns (parallelism = groups;
    * the per-group sort is inherent to Gini's order statistic — there is
    * no sort-free formulation), with `tieCol` completing a total order so
    * ranks are deterministic under equal values. Negative totals are
    * out of Gini's domain and rejected by filter; n = 0 groups vanish,
    * all-zero groups are dropped (0/0). Output: groupCols, n, total,
    * gini.
    */
  def giniIndex(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      tieCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    val v = snap(valueCol, scale)
    val rows = df.select(gcols :+ v.as("_v") :+ tieCol.as("_tie"): _*)
      .filter(col("_v").isNotNull && col("_v") >= 0)
    val w = Window.partitionBy(gcols: _*).orderBy(col("_v"), col("_tie"))
    val ranked = rows.withColumn("_i", row_number().over(w).cast("long"))
    val s = ranked.groupBy(gcols: _*).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("_v")).cast("long").as("total"),
      sum(col("_i") * col("_v")).cast("double").as("_siv"))
    val nd = col("n").cast("double")
    val sx = col("total").cast("double")
    s.filter(col("total") > 0)
      .withColumn("gini",
        (lit(2.0) * col("_siv") - (nd + lit(1.0)) * sx) / (nd * sx))
      .select(gcols :+ col("n") :+ col("total") :+ col("gini"): _*)
  }

  /** Chi-squared independence scan between two categorical columns (the
    * drift / association detector of dataset profiling: is label
    * distribution independent of source, language of license, …):
    * per-cell contributions (O−E)²/E over the COMPLETE contingency grid —
    * zero-observed cells included; they carry the dependence signal when
    * a combination never occurs. Plan: one partial-agg pass builds the
    * |A|×|B| cell table; marginals derive from it (tiny — never a second
    * corpus scan) and BROADCAST onto the completed grid (marginal ×
    * marginal cross join, both vocabulary-sized). N enters as a driver
    * scalar (the t18/q16 metadata discipline). Determinism: counts and
    * the rowTotal·colTotal products are exact longs; expected and the
    * contribution are one fixed double tree each — bit-identical
    * cross-engine. NO float total is emitted (a cross-engine float SUM
    * has no deterministic order — t18's contract): downstream sums the
    * terms when the scalar statistic is wanted. Null categories are
    * real categories ("missing" is often the interesting level) —
    * represented via a sentinel the caller can pre-map; rows with null
    * in either column are dropped here to keep the grid well-defined.
    * Output: aCol, bCol, observed, expected, chi2_term.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .filter(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy("_a", "_b").agg(count(lit(1)).cast("long").as("observed"))
      .eagerPin()
    val rowT = cells.groupBy("_a").agg(sum("observed").cast("long").as("_ra"))
    val colT = cells.groupBy("_b").agg(sum("observed").cast("long").as("_cb"))
    val nRow = cells.agg(sum("observed")).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    if (n == 0L) { // empty input: an empty grid, not a 0/0 expression
      return cells.select(col("_a").as(aCol), col("_b").as(bCol), col("observed"),
        lit(0.0).as("expected"), lit(0.0).as("chi2_term"))
    }
    val grid = rowT.crossJoin(colT)
      .join(cells, Seq("_a", "_b"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
    val expected = col("_ra").cast("double") * col("_cb").cast("double") / lit(n.toDouble)
    val od = col("observed").cast("double")
    grid.withColumn("expected", expected)
      .withColumn("chi2_term",
        (od - col("expected")) * (od - col("expected")) / col("expected"))
      .select(col("_a").as(aCol), col("_b").as(bCol),
        col("observed"), col("expected"), col("chi2_term"))
  }

  /** Pointwise mutual-information scan between two categorical columns —
    * the information-theoretic companion to [[chiSquare]] (chi² asks "is
    * there dependence?", MI asks "how many bits/nats does knowing A give
    * about B?", and the per-cell terms localize WHICH combinations carry
    * it): for each observed (a, b) cell, pmi = ln(N·n_ab / (n_a·n_b))
    * and the MI contribution (n_ab/N)·pmi. Same plan as chiSquare — one
    * partial-agg cell pass, marginals DERIVED from the cell table (never
    * a second corpus scan), N a driver scalar — but over the OBSERVED
    * support only: a zero cell's MI contribution is exactly 0 (x·ln x →
    * 0), so the grid completion chi² needs would only add zero rows
    * here. Counts are exact longs; pmi and the contribution are fixed
    * double trees (casts exact below 2^53, ln shared by engines — the
    * t17/t18 precedent), and NO float total is emitted (t18's contract:
    * downstream sums mi_term when the scalar MI is wanted; Σ is ≥ 0 by
    * Gibbs even though individual pmi terms are signed). Output: aCol,
    * bCol, n_ab, pmi, mi_term.
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .filter(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy("_a", "_b").agg(count(lit(1)).cast("long").as("n_ab"))
      .eagerPin()
    val rowT = cells.groupBy("_a").agg(sum("n_ab").cast("long").as("_na"))
    val colT = cells.groupBy("_b").agg(sum("n_ab").cast("long").as("_nb"))
    val nRow = cells.agg(sum("n_ab")).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    if (n == 0L) {
      return cells.select(col("_a").as(aCol), col("_b").as(bCol), col("n_ab"),
        lit(0.0).as("pmi"), lit(0.0).as("mi_term"))
    }
    val nd = lit(n.toDouble)
    val pmi = log(nd * col("n_ab").cast("double") /
      (col("_na").cast("double") * col("_nb").cast("double")))
    cells
      .join(broadcast(rowT), "_a")
      .join(broadcast(colT), "_b")
      .withColumn("pmi", pmi)
      .withColumn("mi_term", col("n_ab").cast("double") / nd * col("pmi"))
      .select(col("_a").as(aCol), col("_b").as(bCol), col("n_ab"),
        col("pmi"), col("mi_term"))
  }

  /** Per-group Herfindahl–Hirschman concentration index over per-entity
    * totals (market/supplier concentration; in pipeline terms, "is this
    * slice dominated by one source?"): HHI = Σ sᵢ² = Σxᵢ² / (Σxᵢ)². The
    * per-entity totals are exact long sums of integer units; their
    * SQUARES can exceed a long at scale (a 10¹⁰-cent entity squares to
    * 10²⁰), so the squared sum accumulates in DECIMAL(38,0) — exact and
    * order-independent, the mirror of DuckDB's int128 — and doubles
    * appear only in the final fixed expression. Two partial-agg passes
    * (entity totals, then group rollup), no window, no sort; |groups|
    * output rows. Output: groupCols, n (entities), hhi ∈ (0, 1].
    */
  def herfindahl(df: DataFrame, groupCols: Seq[String], entityCol: Column,
      valueCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    val v = snap(valueCol, scale)
    val perEntity = df.select(gcols :+ entityCol.as("_e") :+ v.as("_v"): _*)
      .filter(col("_v").isNotNull)
      .groupBy(gcols :+ col("_e"): _*)
      .agg(sum(col("_v")).cast("long").as("_x"))
    val xd = col("_x").cast("decimal(19,0)")
    val s = perEntity.groupBy(gcols: _*).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("_x")).cast("long").as("_sx"),
      sum(xd * xd).cast("decimal(38,0)").as("_sxx"))
    s.filter(col("_sx") > 0)
      .withColumn("hhi",
        col("_sxx").cast("double") / (col("_sx").cast("double") * col("_sx").cast("double")))
      .select(gcols :+ col("n") :+ col("hhi"): _*)
  }

  /** Time-series downsampling to OHLC bars (the resample/rollup step of
    * metric and market-data pipelines): per (group, fixed time bucket),
    * the first/highest/lowest/last value plus count and an exact total.
    * Everything is ONE partial-agg groupBy — open/close are `min`/`max`
    * over a (ts, value) STRUCT (lexicographic, so the map side keeps one
    * candidate per bar per partition and ties at equal timestamps break
    * on the value — a total order over the snapped units, deterministic
    * on any engine), high/low are plain min/max, and the total is an
    * exact long sum of integer units. No window, no sort; the shuffle
    * carries |bars| rows regardless of points-per-bar — the reason this
    * is aggregation and not the `first_value` window plan, which ships
    * every tick to its bar's partition. Bucket is emitted as the bar's
    * START MILLIS (ts − pmod(ts, bucketMillis) — pure long arithmetic;
    * floor semantics for negative ts too since pmod is non-negative).
    * Rows with a null group/ts/value drop before aggregation. Output:
    * groupCols, bucket_ms, n, open, high, low, close, total — all value
    * fields in snapped integer units (divide by `scale` downstream when
    * display units are wanted; emitting the exact longs keeps the bars
    * engine-portable).
    */
  def resample(df: DataFrame, groupCols: Seq[String], tsMillis: Column,
      valueCol: Column, bucketMillis: Long, scale: Long = 100L): DataFrame = {
    require(bucketMillis >= 1, "bucketMillis must be >= 1")
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    val t = tsMillis.cast("long")
    val v = snap(valueCol, scale)
    val pts = df.select(gcols :+ t.as("_t") :+ v.as("_v"): _*)
      .filter(col("_t").isNotNull && col("_v").isNotNull &&
        gcols.map(_.isNotNull).reduceOption(_ && _).getOrElse(lit(true)))
      .withColumn("_b", col("_t") - pmod(col("_t"), lit(bucketMillis)))
    pts.groupBy(gcols :+ col("_b").as("bucket_ms"): _*).agg(
        count(lit(1)).cast("long").as("n"),
        min(struct(col("_t"), col("_v"))).getField("_v").as("open"),
        max(col("_v")).as("high"),
        min(col("_v")).as("low"),
        max(struct(col("_t"), col("_v"))).getField("_v").as("close"),
        sum(col("_v")).cast("long").as("total"))
  }

  /** Equal-frequency binning (quantile bucketing — the feature-
    * discretization / stratification step of dataset curation): assigns
    * every row the index of its quantile bucket. The 100 TB point is the
    * PLAN: the obvious `ntile(k)` window is one global sort of the
    * corpus on a single partition chain; this instead computes the k−1
    * exact cutpoints from a value HISTOGRAM (values snap to integer
    * units, so the histogram is |distinct units| rows — bounded by the
    * metric's domain, not the corpus; its cumulative window orders
    * distinct values only), collects them as driver metadata (k−1
    * longs), and assigns bins in a NARROW broadcast-literal pass over
    * the corpus — no shuffle of the data at all when the source is
    * already partitioned. Cutpoint c_p = smallest value whose cumulative
    * count ≥ ceil(p·n) (the q16 inclusive criterion over exact integers
    * — engine-portable, no interpolation); bin(v) = #{cutpoints < v} ∈
    * [0, k−1], so each bucket holds its cutpoint's ties entirely (equal
    * values NEVER split across bins — the property ntile lacks). Null
    * values get a null bin and don't count toward n. Output: the input
    * columns + `bin` (int) + `value_units` (the snapped long).
    */
  def quantileBins(df: DataFrame, valueCol: Column, probs: Seq[Double],
      scale: Long = 100L, binName: String = "bin"): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      "interior probabilities only (0 < p < 1)")
    require(scale >= 1, "scale must be >= 1")
    val v = snap(valueCol, scale)
    val withV = df.withColumn("value_units", v)
    val cuts = histogramCutpoints(withV, probs)
    withV.withColumn(binName, binAssign(valueCol, cuts, scale))
  }

  /** The ONE definition of the bin-assignment criterion shared by
    * [[quantileBins]] and external cutpoint appliers (q62's RFM binding
    * applies [[multiQuantileCuts]] results itself): bin =
    * #{cutpoints < snapped value}, null in → null out. Inlined copies of
    * the snap + criterion silently drift when either changes (ADVICE
    * r13) — state it once.
    */
  def binAssign(valueCol: Column, cuts: Seq[Long], scale: Long = 100L): Column = {
    require(scale >= 1, "scale must be >= 1")
    require(cuts.nonEmpty, "binAssign needs at least one cutpoint")
    val v = snap(valueCol, scale)
    val bin = cuts.map(c => when(v > c, 1).otherwise(0)).reduce(_ + _)
    when(v.isNotNull, bin).cast("int")
  }

  /** Shared cutpoint engine of [[quantileBins]] / [[winsorize]]: exact
    * rank-selection cutpoints (c_p = smallest value with cumulative
    * count ≥ max(1, ceil(p·n)) — the q16 inclusive criterion) computed
    * from the `value_units` HISTOGRAM, |distinct units| rows; the
    * cumulative window orders distinct values, never the corpus. One
    * final agg picks EVERY cutpoint in a single pass; k longs return as
    * driver metadata.
    */
  private def histogramCutpoints(withV: DataFrame, probs: Seq[Double]): Seq[Long] = {
    require(probs == probs.sorted && probs.distinct.size == probs.size,
      s"probabilities must be strictly increasing: $probs")
    // materialize once: the count action and the cutpoint agg both read
    // it (the chiSquare cell-table discipline — without this the source
    // corpus aggregates twice per call)
    val hist = withV.filter(col("value_units").isNotNull)
      .groupBy("value_units").agg(count(lit(1)).cast("long").as("_c"))
      .eagerPin()
    val nRow = hist.agg(sum("_c")).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(n > 0, "no non-null values")
    val wc = Window.orderBy("value_units")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum("_c").over(wc))
    val targets = probs.map(p => math.max(1L, math.ceil(p * n).toLong))
    val exprs = targets.zipWithIndex.map { case (t, i) =>
      min(when(col("_cum") >= t, col("value_units"))).as(s"_q$i")
    }
    val agg = cum.agg(exprs.head, exprs.tail: _*).head()
    targets.indices.map(agg.getLong)
  }

  /** Multi-metric sibling of [[histogramCutpoints]]: the SAME exact
    * rank-selection cutpoints (c_p = smallest snapped value with
    * cumulative count ≥ max(1, ceil(p·n)), n = that metric's non-null
    * count) for SEVERAL metrics of one table, computed from ONE
    * unpivoted histogram pass — one materialization + two driver
    * actions total, where per-metric [[quantileBins]] calls pay three
    * driver jobs EACH (q62's three metrics measured 26 driver jobs per
    * run; barrier count is what co-tenant contention multiplies). The
    * cumulative window orders distinct (metric, value) rows only —
    * |metrics| × |distinct units| rows, never the corpus. Returns
    * metric name → cutpoints, to be applied with the same
    * `#{cutpoints < v}` narrow pass quantileBins uses.
    */
  def multiQuantileCuts(df: DataFrame, metrics: Seq[(String, Column)],
      probs: Seq[Double], scale: Long = 100L): Map[String, Seq[Long]] = {
    require(metrics.nonEmpty && metrics.map(_._1).distinct.size == metrics.size,
      "metrics must be non-empty with distinct names")
    require(probs == probs.sorted && probs.distinct.size == probs.size &&
      probs.forall(p => p > 0 && p < 1),
      s"strictly increasing interior probabilities required: $probs")
    require(scale >= 1, "scale must be >= 1")
    val unpiv = df.select(explode(array(metrics.map { case (name, c) =>
        struct(lit(name).as("_m"), snap(c, scale).as("_v")) }: _*)).as("_mv"))
      .select(col("_mv._m").as("_m"), col("_mv._v").as("_v"))
      .filter(col("_v").isNotNull)
    val hist = unpiv.groupBy("_m", "_v").agg(count(lit(1)).cast("long").as("_c"))
      .eagerPin()
    val ns = hist.groupBy("_m").agg(sum("_c").as("_n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    metrics.foreach { case (name, _) =>
      require(ns.getOrElse(name, 0L) > 0L, s"no non-null values for metric $name") }
    val wc = Window.partitionBy("_m").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum("_c").over(wc))
    val exprs = metrics.flatMap { case (name, _) =>
      val n = ns(name)
      probs.zipWithIndex.map { case (p, i) =>
        val t = math.max(1L, math.ceil(p * n).toLong)
        min(when(col("_m") === name && col("_cum") >= t, col("_v")))
          .as(s"${name}_q$i")
      }
    }
    val row = cum.agg(exprs.head, exprs.tail: _*).head()
    metrics.zipWithIndex.map { case ((name, _), mi) =>
      name -> probs.indices.map(i => row.getLong(mi * probs.size + i))
    }.toMap
  }

  /** Percentile winsorization (outlier clipping — the robust-statistics
    * data-cleaning staple: cap a heavy-tailed metric at its p-lo/p-hi
    * quantiles instead of dropping rows): exact cutpoints from the
    * value histogram ([[histogramCutpoints]] — never a corpus sort),
    * then a NARROW clamp pass, greatest(lo, least(hi, v)) over exact
    * integer units — no floats anywhere, so the clip boundary is
    * decided identically on any engine. Null values pass through with a
    * null clipped column and don't count toward n. Output: the input
    * columns + `value_units` + `clipped` (both snapped longs).
    */
  def winsorize(df: DataFrame, valueCol: Column, pLo: Double, pHi: Double,
      scale: Long = 100L): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi,
      s"need 0 < pLo < pHi < 1, got ($pLo, $pHi)")
    require(scale >= 1, "scale must be >= 1")
    val v = snap(valueCol, scale)
    val withV = df.withColumn("value_units", v)
    val Seq(lo, hi) = histogramCutpoints(withV, Seq(pLo, pHi))
    // explicit null gate: Spark's greatest/least IGNORE nulls (a null
    // value would clamp to [lo, hi] instead of passing through)
    withV.withColumn("clipped",
      when(col("value_units").isNotNull,
        greatest(lit(lo), least(lit(hi), col("value_units")))))
  }

  /** Two-sample A/B comparison per group (the experiment-readout /
    * slice-drift primitive): Welch's unequal-variance t statistic
    * between arms A and B of `armCol`, from exact integer moments — the
    * q55 discipline at two arms: values snap to integer units, each
    * arm's n/Σy/Σy² accumulate as exact long CONDITIONAL sums in ONE
    * partial-agg pass (never one pass per arm), and every derived
    * quantity — means, unbiased variances, the standard error, t — is a
    * fixed double expression tree over those exact sums, bit-identical
    * on any engine. Σy² accumulates in DECIMAL(38,0) (the herfindahl
    * discipline — a cent-scale metric squares past long range at ~4k
    * rows/group; decimal is exact, order-independent, and mirrors
    * DuckDB's int128). Groups missing
    * two observations on either arm, or with zero variance on both,
    * are dropped (no t exists). Rows on other arms are filtered before
    * aggregation. Output: groupCols, n_a, n_b, mean_a, mean_b (in
    * `scale` units), t.
    */
  def abTest(df: DataFrame, groupCols: Seq[String], armCol: Column,
      valueCol: Column, armA: String, armB: String,
      scale: Long = 100L): DataFrame = {
    require(armA != armB, "arms must differ")
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    val y = snap(valueCol, scale)
    val pts = df.select(gcols :+ armCol.as("_arm") :+ y.as("_y"): _*)
      .filter(col("_y").isNotNull && col("_arm").isin(armA, armB))
    val yd = col("_y").cast("decimal(19,0)")
    def armSum(arm: String, e: Column): Column =
      sum(when(col("_arm") === arm, e))
    val s = pts.groupBy(gcols: _*).agg(
      sum(when(col("_arm") === armA, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(col("_arm") === armB, 1L).otherwise(0L)).cast("long").as("n_b"),
      armSum(armA, col("_y")).cast("double").as("_sa"),
      armSum(armB, col("_y")).cast("double").as("_sb"),
      armSum(armA, yd * yd).cast("decimal(38,0)").cast("double").as("_ssa"),
      armSum(armB, yd * yd).cast("decimal(38,0)").cast("double").as("_ssb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    s.filter(col("n_a") >= 2 && col("n_b") >= 2)
      .withColumn("mean_a", col("_sa") / na)
      .withColumn("mean_b", col("_sb") / nb)
      .withColumn("_va", (col("_ssa") - col("_sa") * col("_sa") / na) / (na - lit(1.0)))
      .withColumn("_vb", (col("_ssb") - col("_sb") * col("_sb") / nb) / (nb - lit(1.0)))
      .withColumn("_se2", col("_va") / na + col("_vb") / nb)
      .filter(col("_se2") > 0)
      .withColumn("t", (col("mean_a") - col("mean_b")) / sqrt(col("_se2")))
      .select(gcols ++ Seq(col("n_a"), col("n_b"), col("mean_a"),
        col("mean_b"), col("t")): _*)
  }

  /** Pareto concentration rank per group (the "how many suppliers make
    * 80% of revenue" / "how many domains make 80% of the corpus"
    * question of source analysis): the smallest number of entities,
    * taken largest-first, whose cumulative value reaches num/den of the
    * group total. ENTIRELY integer arithmetic — the crossing test is
    * den·cumsum ≥ num·total over exact longs, so there is NO float
    * threshold to disagree across engines (0.8·total as a double would).
    * Entity totals are exact long sums of snapped units; the
    * largest-first ranking is a window partitioned by the GROUP columns
    * with (value desc, entity) total order — parallelism = groups, and
    * the per-group sort is inherent to the order statistic. One agg
    * closes it: n_entities, total, and the min crossing rank. Product
    * bound: den·total must fit a long (den ≤ 10 and cent totals ≤ 10¹⁷
    * hold everywhere sane). Output: groupCols, n_entities, total,
    * n_to_threshold.
    */
  def paretoRank(df: DataFrame, groupCols: Seq[String], entityCol: Column,
      valueCol: Column, num: Long = 4L, den: Long = 5L,
      scale: Long = 100L): DataFrame = {
    require(num >= 1 && num < den, s"need 0 < num/den < 1, got $num/$den")
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    val v = snap(valueCol, scale)
    val perEntity = df.select(gcols :+ entityCol.as("_e") :+ v.as("_v"): _*)
      .filter(col("_v").isNotNull && col("_v") >= 0)
      .groupBy(gcols :+ col("_e"): _*)
      .agg(sum(col("_v")).cast("long").as("_x"))
    val w = Window.partitionBy(gcols: _*)
      .orderBy(col("_x").desc, col("_e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.partitionBy(gcols: _*).orderBy(col("_x").desc, col("_e"))
    val wAll = Window.partitionBy(gcols: _*)
    val ranked = perEntity
      .withColumn("_cum", sum(col("_x")).over(w).cast("long"))
      .withColumn("_tot", sum(col("_x")).over(wAll).cast("long"))
      .withColumn("_rk", row_number().over(wr).cast("long"))
    ranked.groupBy(gcols: _*).agg(
        count(lit(1)).cast("long").as("n_entities"),
        max(col("_tot")).as("total"),
        min(when(col("_cum") * lit(den) >= col("_tot") * lit(num), col("_rk")))
          .as("n_to_threshold"))
      .filter(col("total") > 0)
  }

  /** Per-entity exponentially weighted moving average — the time-decay
    * smoother of monitoring/finance (y₀ = x₀, yₜ = α·xₜ + (1−α)·yₜ₋₁),
    * inherently SEQUENTIAL per entity, so the scale question is how to
    * run a million independent folds without a global sort: the
    * secondary-sort pattern — ONE shuffle on the entity key, an
    * external (spill-safe) sortWithinPartitions on (entity, order,
    * tie), then a single mapPartitions pass that resets the fold on
    * every entity change. No window, no per-group in-memory
    * materialization (the iterator streams), parallelism = shuffle
    * partitions. Cross-engine determinism comes from the ORDER, not
    * from algebra: both engines fold the same rows in the same (order,
    * tie) total order with the same two-multiply-one-add step, and
    * values enter as exact snapped longs, so every intermediate double
    * is bit-identical (the oracle replays the fold as a recursive CTE).
    * Entity/order/tie must be long-typed (cast upstream); rows with a
    * null in any of the four inputs drop whole. Output: entity, ord,
    * tie, value_units, ewma.
    */
  /** Shared scaffold of the sequential-fold family (ewma/cusum/holt):
    * numeric-cast keys, null-row drop, one entity shuffle, spill-safe
    * (entity, order, tie) secondary sort — ONE definition so the fold
    * discipline cannot silently diverge between members.
    */
  private def entitySortedUnits(df: DataFrame, entityCol: Column,
      orderCol: Column, tieCol: Column, valueCol: Column,
      scale: Long): Dataset[(Long, Long, Long, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(entityCol.cast("long").as("e"),
        orderCol.cast("long").as("o"), tieCol.cast("long").as("tie"),
        snap(valueCol, scale).as("c"))
      .filter(col("e").isNotNull && col("o").isNotNull &&
        col("tie").isNotNull && col("c").isNotNull)
      .repartition(col("e"))
      .sortWithinPartitions(col("e"), col("o"), col("tie"))
      .as[(Long, Long, Long, Long)]
  }

  def ewma(df: DataFrame, entityCol: Column, orderCol: Column, tieCol: Column,
      valueCol: Column, alpha: Double, scale: Long = 100L): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    require(scale >= 1, "scale must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = entitySortedUnits(df, entityCol, orderCol, tieCol, valueCol, scale)
    val oneMinus = 1.0 - alpha
    sorted.mapPartitions { it =>
      var cur = 0L
      var started = false
      var y = 0.0
      it.map { case (e, o, tie, c) =>
        if (!started || e != cur) { cur = e; started = true; y = c.toDouble }
        else y = alpha * c.toDouble + oneMinus * y
        (e, o, tie, c, y)
      }
    }.toDF("entity", "ord", "tie", "value_units", "ewma")
  }

  /** Per-group robust outliers by median absolute deviation — the
    * heavy-tail-safe companion to [[zscoreOutliers]] (a single extreme
    * value inflates mean AND sd, masking its neighbors; the median and
    * MAD have a 50% breakdown point, so the fences hold on exactly the
    * skewed distributions where z-scores fail). Built so the flagged
    * row SET is decided in PURE INTEGER arithmetic: values snap to
    * integer units, the group median is the smallest unit m with
    * 2·cum(m) ≥ n (the lower median — the exact rank-⌊(n+1)/2⌋ order
    * statistic, t13's criterion, integer test only), deviations
    * |c − m| are exact longs, the MAD is the same rank selection over
    * the deviation histogram, and a row is an outlier iff
    * dev > k·MAD — a long comparison, never a float threshold (q63's
    * crossing-test discipline).
    *
    * Plan (the q60 histogram shape, twice): each median comes from a
    * per-group HISTOGRAM partial agg — the cumulative window orders
    * each group's DISTINCT units (domain-bounded, never the corpus;
    * parallelism = groups) — and the |groups|-row median/MAD tables
    * BROADCAST back, so the corpus is never sorted and never shuffled
    * on a window: two partial-agg passes + two broadcast joins + a
    * map-side filter. Null values drop (no rank). Groups with MAD = 0
    * (over half the mass on one unit — spread undefined) are dropped
    * whole, mirroring q44's sd > 0 gate. `robust_z` =
    * dev / (1.4826·MAD) — the Gaussian-consistency-scaled score, a
    * fixed double tree over exact longs (reporting only; the flag never
    * reads it). Output: groupCols, payloadCols, dev_units, mad_units,
    * robust_z (unrounded — round at the binding).
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      k: Long, payloadCols: Seq[Column], scale: Long = 100L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)

    // rank-⌊(n+1)/2⌋ selection over a (group, unit) histogram: smallest
    // unit whose cumulative count crosses half the group — shared by
    // both median passes
    def groupMedian(pts: DataFrame, unit: String, out: String): DataFrame = {
      val hist = pts.groupBy(gcols :+ col(unit): _*)
        .agg(count(lit(1)).cast("long").as("_cnt"))
      val wc = Window.partitionBy(gcols: _*).orderBy(col(unit))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(gcols: _*)
      hist.withColumn("_cum", sum("_cnt").over(wc))
        .withColumn("_n", sum("_cnt").over(wn))
        .groupBy(gcols: _*)
        .agg(min(when(col("_cum") * lit(2L) >= col("_n"), col(unit))).as(out))
    }

    val pts = df.withColumn("_c", snap(valueCol, scale))
      .filter(col("_c").isNotNull)
    val med = groupMedian(pts.select(gcols :+ col("_c"): _*), "_c", "_med")
    val withDev = pts.join(broadcast(med), groupCols)
      .withColumn("_dev", abs(col("_c") - col("_med")))
    val mad = groupMedian(withDev.select(gcols :+ col("_dev"): _*), "_dev", "_mad")
    withDev.join(broadcast(mad), groupCols)
      .filter(col("_mad") > 0 && col("_dev") > col("_mad") * lit(k))
      .select(gcols ++ payloadCols
        :+ col("_dev").as("dev_units") :+ col("_mad").as("mad_units")
        :+ (col("_dev").cast("double") / (lit(1.4826) * col("_mad").cast("double")))
          .as("robust_z"): _*)
  }

  /** Type-2 slowly-changing-dimension historization of a change log —
    * the warehouse primitive that turns an event stream ("user U was in
    * state S at time T") into validity intervals ("U held S over
    * [from, to)"), collapsing consecutive equal states into one run.
    * The CDC counterpart of `latestByKey` (which keeps only the final
    * version; this keeps the full history as intervals).
    *
    * Plan: ONE shuffle on the entity, then two within-partition window
    * passes — a lag to flag run starts (null-safe `<=>`, so the first
    * row of each entity always starts a run and a NULL state is a state
    * like any other), a filter to run starts (narrow, distribution-
    * preserving: the lead window reuses the same exchange and only
    * re-sorts), and a lead for the successor's start = this run's
    * exclusive end (NULL = still current). Order ties are broken by
    * `tieCol` — (orderCol, tieCol) must be unique per entity for a
    * deterministic history. No driver state, no join: history length
    * per entity is unbounded but the state is one row of lookahead.
    *
    * Output: entity, state, valid_from, valid_to (both in `orderCol`'s
    * units; valid_to NULL for the current run), run_seq (1-based run
    * index per entity).
    */
  def scd2(df: DataFrame, entityCol: Column, stateCol: Column,
      orderCol: Column, tieCol: Column): DataFrame = {
    val wOrd = Window.partitionBy(entityCol).orderBy(orderCol, tieCol)
    val starts = df
      .withColumn("_prev", lag(stateCol, 1).over(wOrd))
      .withColumn("_rn", row_number().over(wOrd))
      // run start = first row of the entity, or a null-safe state change.
      // lag alone cannot express this: it returns NULL both for "no
      // predecessor" and "predecessor in state NULL", so an entity whose
      // FIRST state is NULL would lose its opening run under a bare
      // `!(_prev <=> state)` — the explicit row_number disambiguates
      .filter(col("_rn") === 1 || !(col("_prev") <=> stateCol))
      .select(entityCol.as("entity"), stateCol.as("state"),
        orderCol.as("valid_from"), tieCol.as("_tie"))
    val wRun = Window.partitionBy(col("entity"))
      .orderBy(col("valid_from"), col("_tie"))
    starts
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("run_seq", row_number().over(wRun).cast("long"))
      .drop("_tie")
  }

  /** Trailing-window distinct count per period — "7-day active users by
    * day", the retention-adjacent reach metric. Spark has no
    * `COUNT(DISTINCT) OVER (RANGE …)` (distinct aggregates are not
    * supported in windows at all), and the self-join formulation
    * (`days × facts ON fact.day BETWEEN d-6 AND d`) is a range join
    * that degenerates to broadcast-nested-loop. This operator instead
    * EXPLODES each (period, key) fact to the `window` target periods it
    * is visible in — a narrow map-side expansion bounded by the window
    * length — then runs one distinct partial-agg per target period.
    * Shuffle volume is window × |distinct (period, key)|, independent
    * of row count (facts dedupe per period FIRST); parallelism is by
    * (period, key), never a per-period sort.
    *
    * At very large windows (90-day reach over billions of keys) the
    * explode factor dominates — switch to the sketch path
    * ([[sketchBuild]] per day + [[sketchRollup]] over the trailing
    * window: fixed-size HLL merges, approximate) — this operator is the
    * exact small-window form. Only periods observed in the data are
    * reported (compose with [[gapFill]] for calendar-dense output).
    *
    * `periodCol` must be a DATE (the visibility explode is
    * `sequence`/`date_add` day stepping); for non-date periods (hour
    * buckets etc.) convert to a date-like grid or explode integer
    * buckets by hand. Output: period (DATE), distinct_keys.
    */
  def rollingDistinct(df: DataFrame, periodCol: Column, keyCol: Column,
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val facts = df.select(periodCol.as("_p"), keyCol.as("_k")).distinct()
    val periods = facts.select(col("_p")).distinct()
    val contrib = facts.select(
        explode(sequence(col("_p"), date_add(col("_p"), window - 1))).as("_t"),
        col("_k"))
    // keep only target periods that actually occur (the explode also
    // emits up to window-1 phantom periods past each fact's day)
    contrib.join(periods.withColumnRenamed("_p", "_t"), Seq("_t"), "left_semi")
      .groupBy(col("_t").as("period"))
      .agg(countDistinct(col("_k")).as("distinct_keys"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per segment — the
    * drift-detection gate (did this batch's value distribution move vs
    * the reference corpus?). D = max over values of |F_a(v) − F_b(v)|,
    * computed EXACTLY in integers: values snap to units of 1/scale
    * (the shared q44 rule), per-(segment, unit) counts partial-agg
    * map-side, one within-segment window pass accumulates the two
    * CDFs, and the sup statistic is the max of
    * |cum_a·n_b − cum_b·n_a| — cross-multiplied so the comparison
    * never touches a float; the closing d = d_num/(n_a·n_b) is one
    * exact division. Parallelism: the window sorts |distinct units|
    * rows per segment (bounded by the value domain, not row count);
    * segments with an empty side report no row (D undefined).
    * Output: segmentCols, n_a, n_b, d_num, d (unrounded — round at the
    * binding).
    */
  def ksTest(df: DataFrame, segmentCols: Seq[String], valueCol: Column,
      isACol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val gcols = segmentCols.map(col)
    val pts = df.withColumn("_c", snap(valueCol, scale))
      .filter(col("_c").isNotNull && isACol.isNotNull)
      .withColumn("_a", isACol)
    val hist = pts.groupBy(gcols :+ col("_c"): _*).agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("_ca"),
      sum(when(col("_a"), 0L).otherwise(1L)).as("_cb"))
    val wc = Window.partitionBy(gcols: _*).orderBy(col("_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(gcols: _*)
    hist
      .withColumn("_cuma", sum("_ca").over(wc))
      .withColumn("_cumb", sum("_cb").over(wc))
      .withColumn("_na", sum("_ca").over(wn))
      .withColumn("_nb", sum("_cb").over(wn))
      .groupBy(gcols: _*)
      .agg(
        max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        max(abs(col("_cuma") * col("_nb") - col("_cumb") * col("_na"))).as("d_num"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("d",
        col("d_num").cast("double") / (col("n_a") * col("n_b")).cast("double"))
  }

  /** Per-entity Holt double-exponential smoothing — level + trend
    * tracking (the forecasting step up from [[ewma]], which assumes a
    * level-only series and lags behind any drift):
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1});
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1};  l_1 = x_1, b_1 = 0.
    * `forecast1` = l_t + b_t, the one-step-ahead prediction. Same
    * execution as q69: one entity shuffle, spill-safe secondary sort,
    * one streaming pass, O(1) state (two doubles) per entity. Choose
    * BINARY-EXACT α/β (0.5, 0.25, …): inputs are snapped longs and
    * both recurrences are then fixed IEEE double trees, so an external
    * engine replaying the fold (recursive CTE) matches bit for bit —
    * the q69 determinism contract extended to two coupled states.
    * Entity/order/tie must be numeric-castable (ewma's contract); rows
    * with null keys/values drop. Output: entity, ord, tie,
    * value_units, level, trend, forecast1.
    */
  def holt(df: DataFrame, entityCol: Column, orderCol: Column, tieCol: Column,
      valueCol: Column, alpha: Double, beta: Double,
      scale: Long = 100L): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0, 1), got $beta")
    require(scale >= 1, "scale must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = entitySortedUnits(df, entityCol, orderCol, tieCol, valueCol, scale)
    val oneMinusA = 1.0 - alpha
    val oneMinusB = 1.0 - beta
    sorted.mapPartitions { it =>
      var cur = 0L
      var started = false
      var l = 0.0
      var b = 0.0
      it.map { case (e, o, tie, c) =>
        if (!started || e != cur) { cur = e; started = true; l = c.toDouble; b = 0.0 }
        else {
          val lPrev = l
          l = alpha * c.toDouble + oneMinusA * (lPrev + b)
          b = beta * (l - lPrev) + oneMinusB * b
        }
        (e, o, tie, c, l, b, l + b)
      }
    }.toDF("entity", "ord", "tie", "value_units", "level", "trend", "forecast1")
  }

  /** Per-entity Holt–Winters additive seasonal smoothing — [[holt]] plus
    * an m-slot seasonal state (Winters 1960): with p = (rn−1) mod m and
    * sₚ the stored seasonal for this phase,
    *   l ← α(x − sₚ) + (1−α)(l + b);  b ← β(l − lPrev) + (1−β)b;
    *   sₚ ← γ(x − l) + (1−γ)sₚ,
    * seasonals ZERO-initialized (the recurrence itself learns the
    * profile — no init phase, so the fold stays a single uniform rule an
    * external engine can replay; the first row per entity sets l = x,
    * b = 0 exactly as [[holt]]). forecast1 = l + b + s_next where s_next
    * is the NEXT phase's stored seasonal after this row's update.
    *
    * Same execution discipline as q69/q77: one entity shuffle,
    * spill-safe secondary sort, one streaming pass, O(m) doubles of
    * state per entity — never a driver loop. Choose BINARY-EXACT
    * α/β/γ (0.5, 0.25, …): inputs are snapped longs and every
    * recurrence is a fixed IEEE double tree, so a recursive-CTE replay
    * matches bit for bit. Output: entity, ord, tie, value_units,
    * level, trend, seasonal (this row's updated sₚ), forecast1.
    */
  def holtWinters(df: DataFrame, entityCol: Column, orderCol: Column,
      tieCol: Column, valueCol: Column, alpha: Double, beta: Double,
      gamma: Double, period: Int, scale: Long = 100L): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0, 1), got $beta")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0, 1), got $gamma")
    require(period >= 2, s"seasonal period must be >= 2, got $period")
    require(scale >= 1, "scale must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = entitySortedUnits(df, entityCol, orderCol, tieCol, valueCol, scale)
    val oneMinusA = 1.0 - alpha
    val oneMinusB = 1.0 - beta
    val oneMinusG = 1.0 - gamma
    val m = period
    sorted.mapPartitions { it =>
      var cur = 0L
      var started = false
      var l = 0.0
      var b = 0.0
      var rn = 0
      val s = new Array[Double](m)
      it.map { case (e, o, tie, c) =>
        val x = c.toDouble
        if (!started || e != cur) {
          cur = e; started = true; rn = 1
          l = x; b = 0.0
          java.util.Arrays.fill(s, 0.0)
        } else {
          rn += 1
          val p = (rn - 1) % m
          val sp = s(p)
          val lPrev = l
          l = alpha * (x - sp) + oneMinusA * (lPrev + b)
          b = beta * (l - lPrev) + oneMinusB * b
          s(p) = gamma * (x - l) + oneMinusG * sp
        }
        // rn == 1: l = x makes the uniform seasonal update a no-op
        // (γ(x − l) + (1−γ)·0 = 0), so only (l, b) need the special case
        val p = (rn - 1) % m
        (e, o, tie, c, l, b, s(p), l + b + s(rn % m))
      }
    }.toDF("entity", "ord", "tie", "value_units", "level", "trend",
      "seasonal", "forecast1")
  }

  /** Theil–Sen robust trend per group (Theil 1950, Sen 1968): slope = the
    * MEDIAN of all C(n,2) pairwise slopes (yⱼ−yᵢ)/(xⱼ−xᵢ), intercept =
    * the median residual y − slope·x — the 29%-breakdown-point line fit
    * that one wild outlier cannot move (q52's OLS trend breaks at one).
    *
    * Determinism: x/y snap to exact long units, every slope is ONE
    * division of exact longs (IEEE-correct, bit-identical cross-engine),
    * medians select by rank — value(s) at positions ⌊(n+1)/2⌋ and
    * ⌊n/2⌋+1 averaged, the local `medianOf`'s exact rule — so tie order never
    * matters. Execution: points collect per group into a capped basket
    * (`maxN` guards the quadratic work in-plan — a too-big group raises
    * a clear error rather than silently exploding), baskets spread
    * round-robin ([[fanoutRepartition]]), and the WHOLE fit — pair
    * slopes, slope median, residuals, intercept median — runs as one
    * tight local loop per basket. An earlier revision expanded the
    * C(n,2) pairs into DataFrame rows and took the medians with rank
    * windows: at n=2000 that is ~2M interpreted-higher-order-function
    * struct materializations per group and a 300M-row shuffle, 13× the
    * wall-clock of sorting the same doubles in a local array. The pair
    * set never needs to be distributed — the basket cap that makes the
    * expansion safe also makes it LOCAL; parallelism comes from groups.
    * Pairs with equal x are skipped (the standard Theil–Sen rule);
    * groups with no finite slope drop. Output: groupCols, n_points,
    * n_slopes, slope, intercept.
    */
  def theilSen(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, maxN: Int = 5000, scaleX: Long = 1L,
      scaleY: Long = 100L,
      onOversize: OversizeMode = OversizeMode.Fail): DataFrame =
    onOversize match {
      case OversizeMode.Fail =>
        theilSenExact(df, groupCols, xCol, yCol, maxN, scaleX, scaleY)
      case OversizeMode.Bucket(b) =>
        theilSenEscalated(df, groupCols, xCol, yCol, maxN, scaleX, scaleY, b)
    }

  /** What [[theilSen]] does when a group exceeds `maxN` (the quadratic
    * guard). `Fail` (the default) keeps the fail-loud contract: a
    * too-big group raises with a clear message. `Bucket(n)` degrades
    * THAT GROUP ONLY to the [[theilSenBucketed]] median-of-buckets
    * estimator (n hash buckets) so a pipeline survives one oversized
    * group mid-run instead of dying — in-guard groups still get the
    * exact fit, bit for bit.
    */
  sealed trait OversizeMode
  object OversizeMode {
    case object Fail extends OversizeMode
    final case class Bucket(buckets: Int) extends OversizeMode {
      require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    }
  }

  /** The Bucket(n) escalation path: one extra partial-agg pass counts
    * group sizes (|groups| rows — the only added shuffle), oversized
    * groups split into n deterministic x-unit hash buckets while
    * in-guard groups keep a single bucket 0, the exact fit runs per
    * (group, bucket), and the outer rank-rule medians collapse the
    * buckets — for a single-bucket (in-guard) group the medians are the
    * identity, so those groups return [[theilSenExact]]'s numbers
    * unchanged (spec-asserted). A bucket that STILL exceeds maxN fails
    * loud — escalation degrades precision once, never silently twice.
    */
  private def theilSenEscalated(df: DataFrame, groupCols: Seq[String],
      xCol: Column, yCol: Column, maxN: Int, scaleX: Long, scaleY: Long,
      buckets: Int): DataFrame = {
    val parts = groupCols.map(col)
    val pts = df.select(parts :+ snap(xCol, scaleX).as("_cx") :+
        snap(yCol, scaleY).as("_cy"): _*)
      .filter(col("_cx").isNotNull && col("_cy").isNotNull)
    // NULL-SAFE size join: groupBy treats null group keys as a real
    // group, so the routing join must too — a plain equi-join would
    // silently drop null-keyed groups that the Fail path fits
    val sizes = pts.groupBy(parts: _*)
      .agg(count(lit(1)).as("_gn"))
      .select(groupCols.map(c => col(c).as(s"_s_$c")) :+ col("_gn"): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"_s_$c")).reduce(_ && _)
    val routed = pts.join(sizes, cond)
      .drop(groupCols.map(c => s"_s_$c"): _*)
      .withColumn("_bkt",
        when(col("_gn") > maxN, pmod(col("_cx"), lit(buckets.toLong)))
          .otherwise(lit(0L)))
    // scales 1: _cx/_cy are already snapped units; re-snapping is identity
    // (|values| < 2^53, the snap contract)
    val fits = theilSenExact(routed, groupCols :+ "_bkt", col("_cx"),
      col("_cy"), maxN, 1L, 1L)
    def rankMedian(sorted: Column, cnt: Column): Column =
      (element_at(sorted, ((cnt + 1) / 2).cast("int")) +
        element_at(sorted, (cnt / 2 + 1).cast("int"))) / 2.0
    val cnt = count(lit(1))
    fits.groupBy(parts: _*)
      .agg(sum(col("n_points")).as("n_points"),
        sum(col("n_slopes")).as("n_slopes"),
        sort_array(collect_list(col("slope"))).as("_s"),
        sort_array(collect_list(col("intercept"))).as("_i"),
        cnt.as("_nb"))
      .withColumn("slope", rankMedian(col("_s"), col("_nb")))
      .withColumn("intercept", rankMedian(col("_i"), col("_nb")))
      .select(parts ++ Seq(col("n_points"), col("n_slopes"), col("slope"),
        col("intercept")): _*)
  }

  private def theilSenExact(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, maxN: Int, scaleX: Long,
      scaleY: Long): DataFrame = {
    require(maxN >= 2, s"maxN must be >= 2, got $maxN")
    require(scaleX >= 1 && scaleY >= 1, "scales must be >= 1")
    val parts = groupCols.map(col)
    val pts0 = df.select(parts :+ snap(xCol, scaleX).as("_cx") :+
        snap(yCol, scaleY).as("_cy"): _*)
      .filter(col("_cx").isNotNull && col("_cy").isNotNull)
    val baskets = fanoutRepartition(pts0.groupBy(parts: _*)
        .agg(sort_array(collect_list(struct(col("_cx").as("x"),
          col("_cy").as("y")))).as("_pts")))
      .withColumn("_pts",
        when(size(col("_pts")) <= maxN, col("_pts"))
          .otherwise(raise_error(concat(lit("theilSen: group size "),
            size(col("_pts")).cast("string"),
            lit(s" exceeds maxN=$maxN — pre-bucket the group or raise maxN")))))
      .filter(size(col("_pts")) >= 2)
    // median by groupMedian's rank rule: sum of the selected rank(s) over
    // their count — IEEE-identical to the rank-window formulation
    def medianOf(a: Array[Double], len: Int): Double = {
      val lower = (len + 1) / 2
      val upper = len / 2 + 1
      if (lower == upper) a(lower - 1) / 1.0
      else (a(lower - 1) + a(upper - 1)) / 2.0
    }
    val fit = udf { (xs: Seq[Long], ys: Seq[Long]) =>
      val n = xs.length
      // unbox ONCE: the O(n²) loop over Seq[Long] pays boxed access +
      // megamorphic dispatch per element (~150 ns/pair measured, 5 s at
      // 33M pairs); over primitive arrays it is ~3 ns/pair
      val xa = new Array[Long](n)
      val ya = new Array[Long](n)
      var i = 0
      while (i < n) { xa(i) = xs(i); ya(i) = ys(i); i += 1 }
      val slopes = new Array[Double](n * (n - 1) / 2)
      var m = 0
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          if (xa(i) != xa(j)) {
            slopes(m) = (ya(j) - ya(i)).toDouble / (xa(j) - xa(i)).toDouble
            m += 1
          }
          j += 1
        }
        i += 1
      }
      if (m == 0) None
      else {
        java.util.Arrays.sort(slopes, 0, m)
        val slope = medianOf(slopes, m)
        val res = new Array[Double](n)
        i = 0
        while (i < n) { res(i) = ya(i).toDouble - slope * xa(i).toDouble; i += 1 }
        java.util.Arrays.sort(res)
        Some(TheilSenFit(n.toLong, m.toLong, slope, medianOf(res, n)))
      }
      // .asNondeterministic() is a REWRITE FENCE, not a semantics claim:
      // the fit is pure, but a "deterministic" UDF gets inlined into
      // every use site (the null filter pushes through the Project, the
      // four field extractions collapse onto it) and the O(n²) loop runs
      // 5× per basket — measured as a q94 timeout at sf0.1.
    }.asNondeterministic()
    baskets
      .withColumn("_fit", fit(
        transform(col("_pts"), p => p("x")), transform(col("_pts"), p => p("y"))))
      .filter(col("_fit").isNotNull) // all-equal-x groups have no slope
      .select(parts ++ Seq(col("_fit.nPoints").as("n_points"),
        col("_fit.nSlopes").as("n_slopes"), col("_fit.slope"),
        col("_fit.intercept")): _*)
  }

  /** Median-of-buckets Theil–Sen — [[theilSen]]'s guard escape hatch as
    * a first-class operator. [[theilSen]] fails loud past `maxN` because
    * the pairwise fit is quadratic; groups BIGGER than the guard split
    * into `buckets` deterministic hash buckets (bucket key = snapped x
    * units mod `buckets` — pure integer arithmetic, so any external
    * engine replays the split verbatim), the EXACT fit runs per bucket,
    * and the group's slope/intercept are the MEDIANS of the bucket
    * fits — the standard sub-sample aggregation whose error shrinks as
    * per-bucket n grows (each bucket is already a 29%-breakdown robust
    * estimate; the outer median keeps that breakdown across buckets).
    * Both outer medians use theilSen's exact rank rule (values at ranks
    * ⌊(n+1)/2⌋ and ⌊n/2⌋+1 averaged), so the whole result stays
    * deterministic and cross-engine replayable. Buckets with <2 points
    * or no finite slope drop from the medians and the n_points/n_slopes
    * sums, exactly as such groups drop from [[theilSen]].
    *
    * Sizing: choose `buckets ≥ maxGroupRows / maxN` so every bucket
    * passes the guard; the quadratic work stays LOCAL per basket and
    * parallelism becomes |groups|·buckets. `buckets = 1` degenerates to
    * the exact [[theilSen]] bit for bit (one bucket, identity medians).
    * Output: groupCols, n_buckets, n_points, n_slopes, slope, intercept.
    */
  def theilSenBucketed(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, buckets: Int, maxN: Int = 5000, scaleX: Long = 1L,
      scaleY: Long = 100L): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val fits = theilSen(
      df.withColumn("_bkt", pmod(snap(xCol, scaleX), lit(buckets.toLong))),
      groupCols :+ "_bkt", xCol, yCol, maxN, scaleX, scaleY)
    // medianOf's rank rule over the (≤ buckets)-sized fit lists: the
    // (a+a)/2 = a identity makes the odd case the same expression
    def rankMedian(sorted: Column, cnt: Column): Column =
      (element_at(sorted, ((cnt + 1) / 2).cast("int")) +
        element_at(sorted, (cnt / 2 + 1).cast("int"))) / 2.0
    val cnt = col("n_buckets")
    fits.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n_points")).as("n_points"),
        sum(col("n_slopes")).as("n_slopes"),
        sort_array(collect_list(col("slope"))).as("_s"),
        sort_array(collect_list(col("intercept"))).as("_i"))
      .withColumn("slope", rankMedian(col("_s"), cnt))
      .withColumn("intercept", rankMedian(col("_i"), cnt))
      .drop("_s", "_i")
  }

  /** Mann–Whitney U rank-sum test per group (Mann & Whitney 1947) — the
    * DISTRIBUTION-FREE A/B test next to q61's parametric t-test: does
    * sample A stochastically dominate sample B? No normality assumption,
    * immune to the wild outliers that move a mean (the q94-vs-q52
    * robustness story applied to hypothesis testing — exactly what
    * quality-score or latency distributions need, where t-tests lie).
    *
    * Determinism is the q44/q94 discipline — EVERYTHING up to the final
    * z is exact integer arithmetic: values snap to long units, tie
    * groups get average ranks carried as 2·rank (an integer: a tie run
    * starting at rank s of length t has average rank s + (t−1)/2, so
    * 2·R_A = Σ t_A·(2s + t − 1) stays in longs), U enters as the exact
    * long u2 = 2·U_A, and the tie-corrected normal approximation
    *   z = (u2 − n_a·n_b) / (2·√(n_a·n_b/12·((n+1) − Στ/(n(n−1)))))
    * (τ = t³−t per tie group) is ONE fixed double expression — an
    * external engine replays it bit for bit before any rounding.
    *
    * Plan: one partial-agg groupBy to the tie table (group, value) —
    * hot values combine map-side — then ONE window over the tie table
    * (rows = |distinct values| per group, NOT |rows|: ties collapse
    * before the sort) for the cumulative start ranks, then a partial-agg
    * reduce to one row per group. Groups need both samples non-empty
    * and n ≥ 2 with at least one untied pair (variance > 0) — others
    * drop, like theilSen's degenerate groups. Output: groupCols, n_a,
    * n_b, u2 (= 2·U_A, exact), z.
    */
  def mannWhitney(df: DataFrame, groupCols: Seq[String], isA: Column,
      valueCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val parts = groupCols.map(col)
    val pts = df.select(parts :+ isA.cast("boolean").as("_a") :+
        snap(valueCol, scale).as("_v"): _*)
      .filter(col("_a").isNotNull && col("_v").isNotNull)
    val ties = pts.groupBy(parts :+ col("_v"): _*)
      .agg(count(lit(1)).as("_t"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("_ta"))
    val w = Window.partitionBy(parts: _*).orderBy(col("_v"))
    val ranked = ties.withColumn("_cum", sum(col("_t")).over(w))
      .withColumn("_s", col("_cum") - col("_t") + lit(1L))
    val agg = ranked.groupBy(parts: _*)
      .agg(sum(col("_ta") * (lit(2L) * col("_s") + col("_t") - lit(1L))).as("_r2a"),
        sum(col("_ta")).as("n_a"),
        sum(col("_t") - col("_ta")).as("n_b"),
        sum(col("_t") * col("_t") * col("_t") - col("_t")).as("_tau"),
        max(col("_t")).as("_tmax"))
      // exactness guard (fail loud, never wrap): t³ in the tie
      // correction overflows long past t ≈ 2M identical values, and
      // 2·R_A past n ≈ 2·10⁹ rows per group — Spark long arithmetic
      // wraps SILENTLY where DuckDB errors. Woven into a USED column
      // (the theilSen guard pattern): a dropped guard column would be
      // pruned by the optimizer and never evaluate.
      .withColumn("n_a",
        when(col("_tmax") > 2000000L || col("n_a") + col("n_b") > 2000000000L,
          raise_error(lit("mannWhitney: tie run > 2e6 or group > 2e9 rows — " +
            "the exact long rank arithmetic would overflow; pre-aggregate " +
            "or subsample the group")).cast("long"))
          .otherwise(col("n_a")))
      .drop("_tmax")
    val n = col("n_a") + col("n_b")
    val u2 = (col("_r2a") - col("n_a") * (col("n_a") + lit(1L))).as("u2")
    val varU = col("n_a").cast("double") * col("n_b").cast("double") / 12.0 *
      ((n + lit(1L)).cast("double") -
        col("_tau").cast("double") / (n.cast("double") * (n - lit(1L)).cast("double")))
    val z = (col("u2") - col("n_a") * col("n_b")).cast("double") /
      (lit(2.0) * sqrt(col("_varU")))
    agg.filter(col("n_a") > 0 && col("n_b") > 0 && n >= 2)
      .withColumn("u2", u2)
      .withColumn("_varU", varU)
      .filter(col("_varU") > 0.0) // all-tied groups have no test
      .select(parts ++ Seq(col("n_a"), col("n_b"), col("u2"), z.as("z")): _*)
  }

  /** ROC-AUC per group from scores + binary labels — the evaluation a
    * corpus-scale quality classifier (t12) actually gets: AUC is EXACTLY
    * the Mann–Whitney statistic U/(n₊·n₋) (the probability a random
    * positive outranks a random negative, ties at ½), so it inherits
    * [[mannWhitney]]'s exact integer rank arithmetic wholesale — u2 is
    * a long, and auc = u2/(2·n₊·n₋) is ONE division, bit-identical
    * cross-engine. No sampling, no sklearn-on-the-driver: the corpus
    * never leaves the cluster. Output: groupCols, n_pos, n_neg, u2,
    * auc. Groups missing a class drop (AUC undefined), like
    * mannWhitney's degenerate groups — but all-tied groups are KEPT
    * (AUC ½ is well-defined where a z-test is not).
    */
  def aucScore(df: DataFrame, groupCols: Seq[String], isPositive: Column,
      scoreCol: Column, scale: Long = 1000000L): DataFrame = {
    val parts = groupCols.map(col)
    val pts = df.select(parts :+ isPositive.cast("boolean").as("_a") :+
        snap(scoreCol, scale).as("_v"): _*)
      .filter(col("_a").isNotNull && col("_v").isNotNull)
    val ties = pts.groupBy(parts :+ col("_v"): _*)
      .agg(count(lit(1)).as("_t"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("_ta"))
    val w = Window.partitionBy(parts: _*).orderBy(col("_v"))
    val ranked = ties.withColumn("_cum", sum(col("_t")).over(w))
      .withColumn("_s", col("_cum") - col("_t") + lit(1L))
    ranked.groupBy(parts: _*)
      .agg(sum(col("_ta") * (lit(2L) * col("_s") + col("_t") - lit(1L))).as("_r2a"),
        sum(col("_ta")).as("n_pos"),
        sum(col("_t") - col("_ta")).as("n_neg"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      // exactness guard, woven into a used column (see mannWhitney):
      // 2·R overflows long past n ≈ 2·10⁹ rows per group
      .withColumn("n_pos",
        when(col("n_pos") + col("n_neg") > 2000000000L,
          raise_error(lit("aucScore: group > 2e9 rows — the exact long " +
            "rank arithmetic would overflow; pre-aggregate or subsample"))
            .cast("long"))
          .otherwise(col("n_pos")))
      .withColumn("u2", col("_r2a") - col("n_pos") * (col("n_pos") + lit(1L)))
      .select(parts ++ Seq(col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc")): _*)
  }

  /** Calibration table (reliability-diagram bins) per group: scores in
    * [0, 1] bin into `bins` equal-width buckets, each reporting its row
    * count, mean score, and positive rate — "does a 0.8 score mean 80%
    * positive?", the question an AUC alone can't answer and the standard
    * companion diagnostic before a classifier gates a corpus. Exact
    * arithmetic: bins by integer unit floor (score 1.0 clamps into the
    * top bin), counts are longs, mean score is an exact-unit sum over a
    * count, so both doubles are single divisions of exact longs. One
    * partial-agg groupBy — at 100 TB the table is |groups|·bins rows.
    * Output: groupCols, bin (0-based), n, mean_score, pos_rate.
    */
  def calibrationBins(df: DataFrame, groupCols: Seq[String],
      isPositive: Column, scoreCol: Column, bins: Int,
      scale: Long = 1000000L): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val parts = groupCols.map(col)
    val pts = df.select(parts :+ isPositive.cast("boolean").as("_a") :+
        snap(scoreCol, scale).as("_v"): _*)
      .filter(col("_a").isNotNull && col("_v").isNotNull)
    // scores must be in [0, 1] (the probability contract): out-of-range
    // input fails LOUD — a silent clamp would fold bad scores into the
    // edge bins and corrupt exactly the diagnostic this table exists for
    val checked = when(col("_v") < 0L || col("_v") > scale,
      raise_error(concat(lit("calibrationBins: score outside [0, 1]: "),
        (col("_v").cast("double") / scale).cast("string"))).cast("long"))
      .otherwise(col("_v"))
    val bin = least(floor(checked * bins / lit(scale.toDouble)).cast("long"),
      lit(bins - 1L))
    pts.withColumn("bin", bin)
      .groupBy(parts :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"),
        (sum(col("_v")).cast("double") / (count(lit(1)) * lit(scale)).cast("double"))
          .as("mean_score"),
        (sum(when(col("_a"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("pos_rate"))
  }

  /** Two-proportion z-test per group — the CONVERSION-RATE A/B test
    * completing the testing trio (q61's t compares means, q109's
    * rank-sum compares distributions; this compares binary success
    * rates, the shape most product experiments actually have): with
    * pooled p̂ = (s_a+s_b)/(n_a+n_b),
    *   z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)).
    * EVERYTHING aggregates to four exact longs per group (ONE
    * partial-agg groupBy, no window at all — counts don't need ranks),
    * and z is one fixed double expression over them — bit-identical
    * cross-engine before any rounding. Groups missing a sample, or
    * with a degenerate pooled rate (p̂ ∈ {0, 1}: all successes or all
    * failures — no variance, no test), drop. Output: groupCols, n_a,
    * s_a, n_b, s_b, z.
    */
  def twoProportionZ(df: DataFrame, groupCols: Seq[String], isA: Column,
      isSuccess: Column): DataFrame = {
    val parts = groupCols.map(col)
    val pts = df.select(parts :+ isA.cast("boolean").as("_a") :+
        isSuccess.cast("boolean").as("_s"): _*)
      .filter(col("_a").isNotNull && col("_s").isNotNull)
    val agg = pts.groupBy(parts: _*)
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("_a") && col("_s"), 1L).otherwise(0L)).as("s_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("_a") && col("_s"), 1L).otherwise(0L)).as("s_b"))
    val pa = col("s_a").cast("double") / col("n_a").cast("double")
    val pb = col("s_b").cast("double") / col("n_b").cast("double")
    val pp = (col("s_a") + col("s_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val z = (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    agg.filter(col("n_a") > 0 && col("n_b") > 0 &&
        col("s_a") + col("s_b") > 0 &&
        col("s_a") + col("s_b") < col("n_a") + col("n_b"))
      .select(parts ++ Seq(col("n_a"), col("s_a"), col("n_b"), col("s_b"),
        z.as("z")): _*)
  }

  /** Kaplan–Meier survival estimator per group (Kaplan & Meier 1958) —
    * right-censored time-to-event curves: at each distinct event time t,
    * S(t) = Π_{t_i ≤ t} (1 − d_i/n_i), where n_i counts subjects still
    * AT RISK (neither failed nor censored before t_i). Censoring is what
    * makes this an estimator and not a q26-style empirical CDF: subjects
    * still alive at the analysis cutoff reduce the risk set when they
    * leave, but never count as deaths — dropping them (or counting them
    * as events) biases retention/lifetime curves, the classic churn
    * mistake.
    *
    * Determinism: durations and event flags are exact longs; d_i/n_i is
    * one exact division; the running product is exp of a RUNNING SUM of
    * ln(1 − d/n) over the per-group time order — a sequential
    * left-to-right fold both engines replay in the same order (the q69
    * fold discipline applied to a window), so the only float ops are
    * ln/exp on identical inputs in identical order. A time where the
    * whole risk set fails yields ln(0) = −∞ and survival exactly 0 —
    * well-defined in both engines.
    *
    * Plan: one partial-agg groupBy to the (group, duration) event table,
    * ONE window over it (|distinct durations| rows per group, ties
    * collapsed before the sort) for risk sets and the running product.
    * Output (event times only, the standard KM table): groupCols, t,
    * n_risk, d_events, n_censored_at_t, survival.
    */
  def kaplanMeier(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column): DataFrame = {
    val parts = groupCols.map(col)
    val pts = df.select(parts :+ durationCol.cast("long").as("_d") :+
        eventCol.cast("long").as("_e"): _*)
      .filter(col("_d").isNotNull && col("_e").isNotNull)
      .withColumn("_e", when(col("_e") =!= 0L, 1L).otherwise(0L))
    val byT = pts.groupBy(parts :+ col("_d"): _*)
      .agg(sum("_e").as("d_events"), count(lit(1)).as("_tot"))
    val w = Window.partitionBy(parts: _*).orderBy(col("_d"))
    val grp = Window.partitionBy(parts: _*)
    // d == n (the whole risk set fails) is an explicit −∞ branch:
    // Spark's `log` returns NULL on 0 (a silent row-drop in the window
    // sum), so the survival-0 case must not reach it — exp(−∞) = 0.0
    // exactly in both engines
    val term = when(col("d_events") > 0 && col("d_events") < col("n_risk"),
      log(lit(1.0) - col("d_events").cast("double") / col("n_risk").cast("double")))
      .when(col("d_events") > 0, lit(Double.NegativeInfinity))
      .otherwise(lit(0.0))
    byT.withColumn("_cum", sum(col("_tot")).over(w))
      .withColumn("n_risk", sum(col("_tot")).over(grp) - col("_cum") + col("_tot"))
      .withColumn("survival", exp(sum(term).over(w)))
      .filter(col("d_events") > 0)
      .select(parts ++ Seq(col("_d").as("t"), col("n_risk"), col("d_events"),
        (col("_tot") - col("d_events")).as("n_censored_at_t"),
        col("survival")): _*)
  }

  /** Per-entity CUSUM changepoint detection — the sequential
    * mean-shift monitor (Page 1954): s⁺ accumulates positive deviations
    * past an allowance, s⁻ the negative ones, and a flag raises the
    * moment either side crosses the decision threshold, resetting after
    * each alarm (the standard restart form, so repeated shifts all
    * flag). EVERYTHING is integer arithmetic: values snap to units
    * (the shared q44 rule), `targetUnits`/`kUnits`/`hUnits` are caller
    * integers, and the recurrences
    *   s⁺ = max(0, s⁺ + (c − target − k)),  s⁻ = max(0, s⁻ − (c − target + k))
    * stay in longs — no float ANYWHERE, so an external engine replaying
    * the fold (recursive CTE) matches bit for bit, with none of the
    * q69-style IEEE-literal care.
    *
    * Execution is the q69 secondary-sort discipline: one entity
    * shuffle, spill-safe within-partition (entity, ord, tie) sort, one
    * streaming pass with O(1) state per entity — the fold is inherently
    * sequential per entity, parallel across entities (never a driver
    * loop, never a window-function rewrite that would ship every row
    * through one task for a global order). Entity/order/tie columns
    * must be numeric-castable (the q69 ewma contract — the typed
    * secondary sort rides long keys); rows where any of them casts to
    * NULL are dropped with the null filter, so map string entities to
    * a surrogate id first. Output: entity, ord, tie, value_units,
    * s_plus, s_minus, flag (±1 for the crossing side — +1 wins if both
    * cross in one step — else 0).
    */
  def cusum(df: DataFrame, entityCol: Column, orderCol: Column, tieCol: Column,
      valueCol: Column, targetUnits: Long, kUnits: Long, hUnits: Long,
      scale: Long = 100L): DataFrame = {
    require(kUnits >= 0, "allowance k must be >= 0")
    require(hUnits > 0, "decision threshold h must be > 0")
    require(scale >= 1, "scale must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = entitySortedUnits(df, entityCol, orderCol, tieCol, valueCol, scale)
    sorted.mapPartitions { it =>
      var cur = 0L
      var started = false
      var sp = 0L
      var sn = 0L
      it.map { case (e, o, tie, c) =>
        if (!started || e != cur) { cur = e; started = true; sp = 0L; sn = 0L }
        sp = math.max(0L, sp + (c - targetUnits - kUnits))
        sn = math.max(0L, sn - (c - targetUnits + kUnits))
        val flag = if (sp > hUnits) 1 else if (sn > hUnits) -1 else 0
        val out = (e, o, tie, c, sp, sn, flag)
        if (flag != 0) { sp = 0L; sn = 0L } // restart after alarm
        out
      }
    }.toDF("entity", "ord", "tie", "value_units", "s_plus", "s_minus", "flag")
  }

  /** Rule-based data expectations — the validation half of the quality
    * gate ([[profile]] describes, this JUDGES): each rule is a named
    * boolean predicate over the row, and the report counts its
    * violations in ONE aggregation pass over one scan (a conditional
    * sum per rule — no per-rule scans, no explode of the corpus). A
    * NULL predicate result counts as a violation (`coalesce(p, false)`
    * — an expectation that cannot be evaluated is not met; write
    * `isNull`-tolerant predicates to opt out per rule). The single
    * result row unpivots to one row per rule via a narrow explode.
    * Rules are data (name → Column), so policy lives at the caller and
    * an external engine mirrors each predicate verbatim. Output: rule,
    * n_rows, violations, violation_frac (unrounded — round at the
    * binding).
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    // internal aliases are INDEX-based: interpolating caller-supplied rule
    // names into column names lets a rule named "n" collide with the
    // count alias and a dotted name break col() resolution — names only
    // ever appear as literals in the output struct
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__r$i")
    }
    val row = df.agg(count(lit(1)).cast("long").as("__n"), aggs: _*)
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        col(s"__r$i").cast("long").as("violations"),
        (col(s"__r$i").cast("double") / col("__n").cast("double"))
          .as("violation_frac"))
    }
    row.select(explode(array(entries: _*)).as("_e")).select(col("_e.*"))
  }

  /** Column-level data profile — the data-quality / expectation gate of
    * an ingest pipeline (row count, null count, exact distinct count,
    * numeric range per column), computed in ONE aggregation pass: all
    * per-column aggregates land in a single `agg` (the multi-distinct
    * plan is Catalyst's Expand — one scan, |cols| row expansion into
    * partial aggs, never |cols| scans), and the single result row
    * unpivots to one row per column via a narrow explode. Distinct
    * counts are EXACT (nulls excluded, both engines' semantics) — for
    * very wide tables swap in the [[sketchDistinct]] HLL path per
    * column. min/max report only for NUMERIC columns (cast to double
    * AFTER the native-type extrema — casting first would compare
    * lexically); string extrema are deliberately absent: lexicographic
    * order is collation-dependent and does not reproduce across
    * engines. Output: col_name, n_rows, n_null, n_distinct, min_num,
    * max_num (nulls for non-numeric).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val numeric = df.schema.fields
      .map(f => f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .toMap
    val nullDouble = min(when(lit(false), lit(0.0d))) // typed NULL via an agg expr
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nulls"),
        countDistinct(col(c)).as(s"__${c}__distinct")) ++
      (if (numeric(c))
        Seq(min(col(c)).cast("double").as(s"__${c}__min"),
          max(col(c)).cast("double").as(s"__${c}__max"))
      else Seq(nullDouble.as(s"__${c}__min"), nullDouble.as(s"__${c}__max")))
    }
    val row = df.agg(count(lit(1)).cast("long").as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__${c}__nulls").cast("long").as("n_null"),
        col(s"__${c}__distinct").cast("long").as("n_distinct"),
        col(s"__${c}__min").as("min_num"), col(s"__${c}__max").as("max_num"))
    }
    row.select(explode(array(entries: _*)).as("_p")).select(col("_p.*"))
  }

  /** Lag-k autocorrelation of a bucketed event-count series per group —
    * the seasonality detector (lag 24 on hourly buckets ⇒ daily rhythm;
    * lag 7 on daily ⇒ weekly). The series never materializes on the
    * driver: counts are one partial-agg groupBy (exact longs), the
    * k-shifted pairing is a self-equi-join on (group, bucket) after
    * subtracting the lag from one side — never an inequality/range
    * join — and the correlation rides [[pearsonCorr]]'s exact-integer
    * moment machinery (counts are already integers: scale 1). Buckets
    * where either end of the pair is unobserved produce no pair (the
    * well-defined gap semantics an external engine mirrors trivially);
    * groups need ≥ 2 pairs and nonzero variance on both ends or they
    * vanish. Bucketing is FLOOR division (explicit `floor`, matching an
    * oracle's integer `//` for pre-epoch timestamps too — a bare long
    * division would truncate toward zero and give bucket 0 double
    * width around the epoch). Output: groupCols, n (pairs), corr
    * (unrounded).
    */
  def autocorrelation(df: DataFrame, groupCols: Seq[String], tsMillis: Column,
      bucketMillis: Long, lagBuckets: Int): DataFrame = {
    require(bucketMillis >= 1, "bucketMillis must be >= 1")
    require(lagBuckets >= 1, "lagBuckets must be >= 1")
    val gcols = groupCols.map(col)
    val base = df.filter(tsMillis.isNotNull)
      .withColumn("_bk", floor(tsMillis.cast("long") / lit(bucketMillis)).cast("long"))
      .groupBy(gcols :+ col("_bk"): _*).agg(count(lit(1)).cast("long").as("_c0"))
    val ahead = base
      .withColumn("_bk", col("_bk") - lit(lagBuckets.toLong))
      .withColumnRenamed("_c0", "_c1")
    base.join(ahead, groupCols :+ "_bk")
      .transform(j => pearsonCorr(j, groupCols, col("_c0"), col("_c1"),
        scaleX = 1L, scaleY = 1L))
  }

  /** Snapshot diff / table reconciliation — the CDC-on-snapshots and
    * migration-validation primitive ("what changed between yesterday's
    * and today's extract", "does the new pipeline's output match the
    * old's"): classifies every key present in either snapshot as
    * `insert` (new only), `delete` (old only) or `update` (both sides,
    * any compare column differs), with unchanged keys DROPPED by
    * default — at 100 TB the unchanged bulk is the whole table and
    * carries no signal; the diff output is change-sized. Plan: project
    * each side to key + compare columns FIRST (column pruning reaches
    * the scans), one full-outer shuffle join on the key — no window, no
    * sort, no driver traffic. Column comparison is null-safe (`<=>`):
    * null → value and value → null both count as changes, null → null
    * does not. Contract: `keyCols` uniquely identify a row within each
    * snapshot (a snapshot IS a keyed state — compact a change log with
    * [[latestByKey]] first); duplicate keys would fan out the join.
    * Rows with a null in any key column are dropped on both sides (a
    * null key identifies nothing). Output: keyCols, change_type,
    * n_changed (count of differing compare columns; 0 for
    * insert/delete — the column set differs, not columns).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    Seq(oldDf, newDf).foreach { d =>
      (keyCols ++ compareCols).foreach(c =>
        require(d.columns.contains(c), s"no such column: $c"))
    }
    def side(d: DataFrame, tag: String) = d
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"__${tag}_$c")) :+
        lit(1).as(s"__${tag}_present"): _*)
    val joined = side(oldDf, "o").join(side(newDf, "n"), keyCols, "full_outer")
    val nChanged = compareCols
      .map(c => when(col(s"__o_$c") <=> col(s"__n_$c"), 0L).otherwise(1L))
      .reduce(_ + _)
    val classified = joined.withColumn("change_type",
        when(col("__o_present").isNull, lit("insert"))
          .when(col("__n_present").isNull, lit("delete"))
          .when(nChanged > 0, lit("update"))
          .otherwise(lit("unchanged")))
      .withColumn("n_changed",
        when(col("change_type") === "update", nChanged).otherwise(lit(0L)))
    val out = if (includeUnchanged) classified
      else classified.filter(col("change_type") =!= "unchanged")
    out.select(keyCols.map(col) :+ col("change_type") :+ col("n_changed"): _*)
  }

  /** Per-group Spearman rank correlation — [[pearsonCorr]]'s monotone /
    * outlier-robust sibling (the q67-vs-q44 relationship at the
    * correlation level): Pearson over the values' AVERAGE ranks.
    * Exactness trick: the average rank of a tie run is
    * minRank + (cnt−1)/2, which is fractional — so both rank vectors are
    * DOUBLED (2·avgrank = 2·minRank + cnt − 1, an exact integer) and fed
    * to the exact-integer Pearson machinery; rho is invariant under the
    * ×2 affine scale, and every sufficient statistic stays an exact long
    * sum (order-independent on any engine, fixed double tree at the
    * end — the family discipline). The within-group ranking is two
    * windows over ONE group shuffle (rank + tie-run count per metric;
    * the per-group sort is inherent to any rank statistic — parallelism
    * = groups). Rows with either value null drop WHOLE. Groups with
    * n < 2 or a constant metric (zero rank variance) are dropped.
    * Overflow bound: Σ(2r)² ≤ 4n³ must fit a long ⇒ n ≲ 1.3·10⁶ rows
    * per group; shard-and-sum beyond. Output: groupCols, n, rho.
    */
  def spearmanCorr(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, scaleX: Long = 100L, scaleY: Long = 100L): DataFrame = {
    require(scaleX >= 1 && scaleY >= 1, "scales must be >= 1")
    val gcols = groupCols.map(col)
    val pts = df.select(gcols :+ snap(xCol, scaleX).as("_x") :+ snap(yCol, scaleY).as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
    def ranked2(vc: String): Column = {
      // 2·average-rank of the value within the group: 2·rank + tieCnt − 1
      val wr = Window.partitionBy(gcols: _*).orderBy(col(vc))
      val wt = Window.partitionBy(gcols :+ col(vc): _*)
      lit(2L) * rank().over(wr).cast("long") + count(lit(1)).over(wt) - lit(1L)
    }
    val rr = pts.withColumn("_rx", ranked2("_x")).withColumn("_ry", ranked2("_y"))
    pearsonCorr(rr, groupCols, col("_rx"), col("_ry"), scaleX = 1L, scaleY = 1L)
      .withColumnRenamed("corr", "rho")
  }

  /** Per-group Kendall tau-b rank correlation (Kendall 1938; tau-b per
    * Kendall 1945 handles ties on BOTH axes) — the third member of the
    * correlation family: [[pearsonCorr]] measures linearity,
    * [[spearmanCorr]] monotonicity via ranks, tau-b the PROBABILITY
    * SCALE of concordance (P[concordant] − P[discordant]) — directly
    * interpretable and still meaningful when either axis is coarsely
    * binned (quality buckets, star ratings) where Spearman's rank
    * variance deflates. Scale path: the corpus reduces to the 2D VALUE
    * HISTOGRAM first (one partial-agg pass, hot cells combine
    * map-side), and the quadratic concordance enumeration runs over
    * HISTOGRAM CELLS (pairs weighted by cᵃ·cᵇ), guarded at maxN
    * DISTINCT cells per group — fail-loud, woven into a used column
    * (the mannKendall discipline). Everything before the final divide
    * is exact integer arithmetic in decimal(38,0) (DuckDB int128):
    * working DOUBLED to avoid /2 —
    *   C−D folded as Σ sign·cᵃ·cᵇ over cell pairs with xa<xb (each
    *   unordered pair enumerated exactly once),
    *   d1 = n(n−1) − Σtₓ(tₓ−1) = 2(n0−n1),  d2 likewise for y,
    *   tau = 2(C−D) / √(d1·d2)   (the 2 cancels d1·d2's doubling).
    * Groups with either axis constant (d ≤ 0) drop. Output: groupCols,
    * n, tau.
    */
  def kendallTau(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, maxN: Int = 5000, scaleX: Long = 100L,
      scaleY: Long = 100L): DataFrame = {
    require(maxN >= 2, s"maxN must be >= 2, got $maxN")
    require(scaleX >= 1 && scaleY >= 1, "scales must be >= 1")
    val gcols = groupCols.map(col)
    val hist = df.select(gcols :+ snap(xCol, scaleX).as("_x")
        :+ snap(yCol, scaleY).as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy(gcols :+ col("_x") :+ col("_y"): _*)
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cells", count(lit(1)).over(Window.partitionBy(gcols: _*)))
      .withColumn("_c",
        when(col("_cells") > maxN, raise_error(lit(
          s"kendallTau: group exceeds maxN=$maxN distinct (x,y) cells — " +
            "the cell-pair join is quadratic; coarsen the value scales"))
          .cast("long"))
          .otherwise(col("_c")))
      .drop("_cells").eagerPin()
    val dec = "decimal(38,0)"
    val a = hist.select(gcols :+ col("_x").as("_xa") :+ col("_y").as("_ya")
      :+ col("_c").as("_ca"): _*)
    val b = hist.select(gcols :+ col("_x").as("_xb") :+ col("_y").as("_yb")
      :+ col("_c").as("_cb"): _*)
    val cd = a.join(b, groupCols).filter(col("_xa") < col("_xb"))
      .groupBy(gcols: _*)
      .agg(sum(when(col("_yb") > col("_ya"), 1L)
          .when(col("_yb") < col("_ya"), -1L).otherwise(0L).cast(dec) *
          col("_ca").cast(dec) * col("_cb").cast(dec))
        .cast(dec).as("_cd2"))
    def margin(vc: String, out: String): DataFrame =
      hist.groupBy(gcols :+ col(vc): _*).agg(sum(col("_c")).as("_t"))
        .groupBy(gcols: _*)
        .agg(sum(col("_t").cast(dec) * (col("_t") - 1L).cast(dec))
          .cast(dec).as(out), sum(col("_t")).as(s"${out}_n"))
    val xm = margin("_x", "_tx")
    val ym = margin("_y", "_ty")
    val n0 = col("_tx_n").cast(dec) * (col("_tx_n") - 1L).cast(dec)
    xm.join(ym, groupCols).join(cd, groupCols)
      .withColumn("_d1", (n0 - col("_tx")).cast("double"))
      .withColumn("_d2", (n0 - col("_ty")).cast("double"))
      .filter(col("_d1") > 0.0 && col("_d2") > 0.0)
      .withColumn("tau", lit(2.0) * col("_cd2").cast("double") /
        sqrt(col("_d1") * col("_d2")))
      .select(gcols ++ Seq(col("_tx_n").as("n"), col("tau")): _*)
  }

  /** Benford first-significant-digit scan — the fabricated-data /
    * corrupted-feed detector of financial and metric auditing (Benford
    * 1938; Nigrini's forensic-accounting standard): for each group, the
    * observed first-digit distribution of positive amounts against the
    * Benford expectation p(d) = ln(1 + 1/d)/ln(10), with the per-digit
    * chi-squared contribution (O − E)²/E. The COMPLETE digit grid 1–9
    * reports for every group — a digit that never occurs is the
    * strongest signal (q58's zero-cell principle). Plan: amounts snap to
    * integer units (the family rule), the first digit is the leading
    * character of the integer's decimal string (exact — never float
    * log10, whose boundary cases diverge cross-engine), counts are ONE
    * partial-agg pass, the grid is groups × 9 built from the tiny count
    * table, group totals derive from the same table and BROADCAST.
    * Counts exact longs; frac/expected/chi2_term fixed double trees
    * (ln and the divisions IEEE-correctly-rounded ⇒ bit-identical). NO
    * float total is emitted (t18's contract — sum chi2_term downstream
    * for the scalar statistic; df = 8 per group). Zero and negative
    * amounts are out of Benford's domain and excluded by filter.
    * Output: groupCols, digit, n, frac, expected_frac, chi2_term.
    */
  def benfordScan(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    val counts = df.select(gcols :+ snap(valueCol, scale).as("_u"): _*)
      .filter(col("_u") >= 1)
      .withColumn("_d", substring(col("_u").cast("string"), 1, 1).cast("long"))
      .groupBy(gcols :+ col("_d"): _*).agg(count(lit(1)).cast("long").as("_n"))
    val totals = counts.groupBy(gcols: _*).agg(sum("_n").cast("long").as("_tot"))
    val grid = totals.select(gcols :+ explode(sequence(lit(1L), lit(9L))).as("digit")
        :+ col("_tot"): _*)
    val nd = col("n").cast("double")
    val td = col("_tot").cast("double")
    val expected = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    val joined = grid.join(
      counts.withColumnRenamed("_d", "digit"), groupCols :+ "digit", "left_outer")
    joined
      .withColumn("n", coalesce(col("_n"), lit(0L)))
      .withColumn("frac", nd / td)
      .withColumn("expected_frac", expected)
      .withColumn("chi2_term", {
        val e = td * col("expected_frac")
        (nd - e) * (nd - e) / e
      })
      .select(gcols ++ Seq(col("digit"), col("n"), col("frac"),
        col("expected_frac"), col("chi2_term")): _*)
  }

  /** Key-distribution skew report — the pre-join diagnostic every 100 TB
    * shuffle plan needs ("is this key safe to join on, and which keys
    * need the salt"): the top-N hottest keys with their row counts,
    * corpus share and ratio to the mean key load, plus the global
    * denominators on every row. A hot key's ratio_to_mean IS the skew
    * factor AQE's skew-join split and [[saltedJoin]]'s salt count are
    * sized from. Plan: per-key counts are ONE partial-agg pass (|keys|
    * rows — never the corpus — on the shuffle); the summary row derives
    * from that table (no second scan) and broadcasts; top-N is
    * orderBy+limit = TakeOrdered (per-partition top-N to the driver, no
    * global sort), with rank assigned AFTER the limit on the N-row
    * result (one tiny task — the q16 metadata discipline). Counts exact
    * longs; share and ratio fixed double trees. Ties at equal count
    * break on the key columns ascending — deterministic cross-engine.
    * Output: rank, keyCols, n_rows, share, ratio_to_mean, n_rows_total,
    * n_keys.
    */
  def keySkewReport(df: DataFrame, keyCols: Seq[String], topN: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "keySkewReport needs at least one key column")
    require(topN >= 1, "topN must be >= 1")
    val kcols = keyCols.map(col)
    // the count table feeds BOTH the summary row and the top-N — without
    // materialization the corpus scans twice in one DAG (|keys| rows,
    // cheap to pin; the associationRules discipline)
    val counts = df
      .filter(kcols.map(_.isNotNull).reduce(_ && _))
      .groupBy(kcols: _*).agg(count(lit(1)).cast("long").as("n_rows"))
      .eagerPin()
    val summary = counts.agg(
      sum("n_rows").cast("long").as("n_rows_total"),
      count(lit(1)).cast("long").as("n_keys"))
    val top = counts
      .orderBy(col("n_rows").desc +: kcols: _*)
      .limit(topN)
    val w = Window.orderBy(col("n_rows").desc +: kcols: _*)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(summary))
      .withColumn("share", col("n_rows").cast("double") / col("n_rows_total").cast("double"))
      .withColumn("ratio_to_mean", col("n_rows").cast("double") /
        (col("n_rows_total").cast("double") / col("n_keys").cast("double")))
      .select(col("rank") +: kcols ++: Seq(col("n_rows"), col("share"),
        col("ratio_to_mean"), col("n_rows_total"), col("n_keys")): _*)
  }

  /** Item-item cosine similarity over entity baskets — the neighborhood
    * model of collaborative filtering ("customers who bought X also
    * bought Y", Sarwar et al. 2001) on the binary incidence matrix:
    * sim(i, j) = n_both / (√n_i · √n_j), top-k neighbors per item.
    * Rides the [[cooccurrence]] basket machinery with the
    * [[associationRules]] materialization discipline: the capped
    * distinct-basket table builds ONCE (localCheckpoint) and feeds both
    * the per-item counts and the narrow sorted-array pair expansion
    * (never a corpus self-join); pair counts partial-agg to ≤|items|²
    * rows, the vocabulary-sized item-count table BROADCASTS onto the
    * directed expansion, and the top-k window partitions by the item
    * (parallelism = items). Cross-engine determinism: counts are exact
    * longs, sim is one fixed double tree (divide + two IEEE sqrts), and
    * rank ties break (sim desc, neighbor asc) — total order. `minBoth`
    * prunes the long pair tail before the window (the support knob —
    * 1-entity co-occurrences are noise at any scale); `maxBasket` is
    * the hot-entity cap shared with the whole basket family. Output:
    * item, neighbor, n_both, n_item, n_neighbor, sim, rank.
    */
  def itemSimilarity(df: DataFrame, entityCol: String, itemCol: String,
      topK: Int, minBoth: Long = 2L, maxBasket: Int = 1000): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    require(minBoth >= 1, "minBoth must be >= 1")
    graft.functions.PairExplode.register(df.sparkSession)
    val baskets = fanoutRepartition(cappedBaskets(df, entityCol, itemCol, maxBasket)
      .filter(size(col("_items")) >= 2))
      .eagerPin()
    val items = baskets.select(explode(col("_items")).as("item"))
      .groupBy("item").agg(count(lit(1)).cast("long").as("n_item"))
    // the pair table is the expensive subtree (native one-pass pair
    // generator — see PairExplode — + one shuffle) and the directed
    // union below reads it TWICE — materialize the small post-threshold
    // set or the whole expansion re-runs per arm.
    // persist, not localCheckpoint: measured identical at sf0.1 (r11
    // drift profile, BASELINE.md), and persist keeps lineage — an
    // executor loss recomputes the partition instead of failing the job
    // the way a truncated local checkpoint must
    val pairs = baskets.select(graft.functions.PairExplode.pairExplode(col("_items")))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n_both"))
      .filter(col("n_both") >= minBoth)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // force-populate the cache before the union reads it twice: inside one
    // job, concurrent tasks of the two arms can race a LAZY cache and each
    // recompute the expansion subtree. One count() over the small
    // post-threshold pair set pins the compute-once guarantee while
    // keeping lineage for executor-loss recovery.
    pairs.count()
    val directed = pairs.select(col("a").as("item"), col("b").as("neighbor"), col("n_both"))
      .union(pairs.select(col("b").as("item"), col("a").as("neighbor"), col("n_both")))
    val enriched = directed
      .join(broadcast(items.select(col("item"), col("n_item"))), Seq("item"))
      .join(broadcast(items.select(col("item").as("neighbor"),
        col("n_item").as("n_neighbor"))), Seq("neighbor"))
      .withColumn("sim", col("n_both").cast("double") /
        (sqrt(col("n_item").cast("double")) * sqrt(col("n_neighbor").cast("double"))))
    val w = Window.partitionBy(col("item")).orderBy(col("sim").desc, col("neighbor"))
    enriched.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("item", "neighbor", "n_both", "n_item", "n_neighbor", "sim", "rank")
  }

  /** Order-independent table checksum — the "did the migration copy
    * every row" validation that never moves data: each row folds to a
    * polynomial fingerprint of its canonical string, fingerprints SUM
    * per group (commutative — any row order, any partitioning, any
    * engine yields the same total), and two tables compare by |groups|
    * scalar rows instead of a 100 TB diff join. [[snapshotDiff]] is the
    * row-level follow-up WHEN a group's checksum disagrees — run the
    * diff on the one disagreeing partition/group, not the corpus.
    * Exactness: the per-row hash is the t04 codegen fold (< 2³⁰), the
    * sum accumulates in DECIMAL(38,0) (q57's discipline — a long wraps
    * silently past ~10⁹ rows/group; decimal is exact and mirrors
    * DuckDB's int128), and only the final mod collapses to a long.
    * Caller contract: `cols` must stringify identically on both engines
    * — integers/strings are safe, doubles must be SNAPPED to integer
    * units first (float formatting is engine-specific); null columns
    * render as empty (concat_ws skips them — mirror with coalesce).
    * Output: groupCols, n_rows, checksum.
    */
  def tableChecksum(df: DataFrame, groupCols: Seq[String],
      cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum needs at least one column")
    graft.functions.GraftExpressions.register(df.sparkSession)
    val gcols = groupCols.map(col)
    val rowStr = concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*)
    val fp = graft.functions.GraftExpressions.polyHash(rowStr)
    val p = graft.functions.Signatures.P
    df.select(gcols :+ fp.as("_fp"): _*)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        (sum(col("_fp").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          % lit(p)).cast("long").as("checksum"))
  }

  /** Most-common session journeys — "what do the first `pathLen` steps
    * of a session look like" (the user-journey / funnel-discovery scan):
    * gap-sessionize ([[sessionize]]'s exact semantics), rank events
    * within each session by (ts, tie), keep the first `pathLen`, fold
    * them into a `a>b>c` path string by CONDITIONAL AGGREGATION (max of
    * the rank-i event per session — exactly one non-null, so no
    * collect_list ordering hazard and no per-session array state), count
    * sessions per path, top-N by (count desc, path asc). Plan: ONE
    * entity shuffle carries sessionize + the in-session rank (same
    * partitioning, two sorts), the path fold and path counts are partial
    * aggs, top-N is orderBy+limit (TakeOrdered) with rank assigned after
    * the limit (the q85/q16 metadata discipline). Sessions shorter than
    * `pathLen` produce their shorter path (concat_ws skips the missing
    * ranks — both engines' semantics). Output: rank, path, n_sessions.
    */
  def sessionPaths(df: DataFrame, entityCol: String, tsMillis: Column,
      tieCol: Column, eventCol: Column, gapMillis: Long,
      pathLen: Int = 3, topN: Int = 20): DataFrame = {
    require(pathLen >= 1, "pathLen must be >= 1")
    require(topN >= 1, "topN must be >= 1")
    val base = df.select(col(entityCol).as("_e"), tsMillis.as("_ts"),
      tieCol.as("_tie"), eventCol.cast("string").as("_ev"))
    val sess = sessionize(base, "_e", col("_ts"), col("_tie"), gapMillis)
    val w = Window.partitionBy(col("_e"), col("session_id"))
      .orderBy(col("_ts"), col("_tie"))
    val ranked = sess.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= pathLen)
    val steps = (1 to pathLen).map(i => max(when(col("_rn") === i, col("_ev"))))
    val paths = ranked.groupBy(col("_e"), col("session_id"))
      .agg(concat_ws(">", steps: _*).as("path"))
    val counts = paths.groupBy("path")
      .agg(count(lit(1)).cast("long").as("n_sessions"))
    val top = counts.orderBy(col("n_sessions").desc, col("path")).limit(topN)
    val wr = Window.orderBy(col("n_sessions").desc, col("path"))
    top.withColumn("rank", row_number().over(wr).cast("long"))
      .select("rank", "path", "n_sessions")
  }

  /** Near-time duplicate detection — the double-charge / replayed-event
    * audit (same entity, same snapped amount, within `windowMillis`):
    * pairs of rows agreeing on (entity, amount units) whose timestamps
    * differ by at most the window, each pair once (ordered by (ts, id)).
    * Plan: the (entity, units) EQUI-join does the heavy lifting — the
    * candidate space is per-(entity, amount) groups, never per entity —
    * and the window test is a residual filter on the joined row; rows
    * shuffle ONCE on the compound key, and a same-key self-join after
    * one shuffle is co-partitioned (no second exchange). Hot (entity,
    * amount) keys (a subscription charging 10⁶ users $9.99 is fine —
    * the ENTITY is in the key; one entity replaying one amount 10⁵
    * times is the pathological case) are capped by `maxPerKey`,
    * mirroring the d02/q41 hot-key discipline: groups over the cap drop
    * WHOLE (they are systematic, not fraud — route them to [[keySkewReport]]).
    * All comparisons exact integers. Output: entity, amount_units,
    * id_a, id_b, ts_a, ts_b, gap_ms (0 ≤ gap ≤ window; (ts_a, id_a) <
    * (ts_b, id_b)).
    */
  def nearTimeDuplicates(df: DataFrame, entityCol: String, tsMillis: Column,
      idCol: Column, valueCol: Column, windowMillis: Long,
      scale: Long = 100L, maxPerKey: Int = 1000): DataFrame = {
    require(windowMillis >= 0, "windowMillis must be >= 0")
    require(scale >= 1 && maxPerKey >= 2, "scale >= 1, maxPerKey >= 2")
    val base = df.select(col(entityCol).as("entity"), snap(valueCol, scale).as("amount_units"),
        tsMillis.cast("long").as("_ts"), idCol.as("_id"))
      .filter(col("entity").isNotNull && col("amount_units").isNotNull &&
        col("_ts").isNotNull && col("_id").isNotNull)
    val keyCount = base.groupBy("entity", "amount_units")
      .agg(count(lit(1)).as("_kc"))
    val capped = base.join(keyCount.filter(col("_kc") <= maxPerKey)
      .select("entity", "amount_units"), Seq("entity", "amount_units"), "left_semi")
    val a = capped.select(col("entity"), col("amount_units"),
      col("_ts").as("ts_a"), col("_id").as("id_a"))
    val b = capped.select(col("entity"), col("amount_units"),
      col("_ts").as("ts_b"), col("_id").as("id_b"))
    a.join(b, Seq("entity", "amount_units"))
      .filter(struct(col("ts_a"), col("id_a")) < struct(col("ts_b"), col("id_b")) &&
        col("ts_b") - col("ts_a") <= windowMillis)
      .select(col("entity"), col("amount_units"), col("id_a"), col("id_b"),
        col("ts_a"), col("ts_b"), (col("ts_b") - col("ts_a")).as("gap_ms"))
  }

  /** Pairwise set overlap between item audiences — "how much do the
    * audiences of X and Y overlap" (segment dedup, campaign reach,
    * co-consumption): for every unordered item pair sharing ≥ `minBoth`
    * entities, the intersection size and the three standard
    * normalizations — jaccard (∩/∪), overlap coefficient (∩/min — the
    * containment detector: 1.0 means one audience is a subset), and
    * cosine (∩/√(n_a·n_b), [[itemSimilarity]]'s score). Same plan as
    * the basket family: capped distinct baskets materialize once, the
    * narrow pair expansion + one partial agg produce ≤|items|² rows,
    * item counts broadcast. All three scores are single divisions of
    * exact longs (jaccard's union = n_a + n_b − n_both, an exact
    * integer) — bit-identical cross-engine. Output: item_a < item_b,
    * n_both, n_a, n_b, jaccard, overlap, cosine.
    */
  def setOverlap(df: DataFrame, entityCol: String, itemCol: String,
      minBoth: Long = 1L, maxBasket: Int = 1000): DataFrame = {
    require(minBoth >= 1, "minBoth must be >= 1")
    // the hot-entity cap drops an entity EVERYWHERE (counts and pairs —
    // the candidate bound requires it), but single-item entities only
    // skip pair GENERATION: they still count toward their item's
    // audience size, or every denominator would understate reach
    val all = fanoutRepartition(cappedBaskets(df, entityCol, itemCol, maxBasket))
      .eagerPin()
    val items = all.select(explode(col("_items")).as("item"))
      .groupBy("item").agg(count(lit(1)).cast("long").as("n_item"))
    val baskets = all.filter(size(col("_items")) >= 2)
    graft.functions.PairExplode.register(df.sparkSession)
    val pairs = baskets.select(graft.functions.PairExplode.pairExplode(col("_items")))
      .groupBy(col("a").as("item_a"), col("b").as("item_b"))
      .agg(count(lit(1)).cast("long").as("n_both"))
      .filter(col("n_both") >= minBoth)
    pairs
      .join(broadcast(items.select(col("item").as("item_a"), col("n_item").as("n_a"))), Seq("item_a"))
      .join(broadcast(items.select(col("item").as("item_b"), col("n_item").as("n_b"))), Seq("item_b"))
      .withColumn("jaccard", col("n_both").cast("double") /
        (col("n_a") + col("n_b") - col("n_both")).cast("double"))
      .withColumn("overlap", col("n_both").cast("double") /
        least(col("n_a"), col("n_b")).cast("double"))
      .withColumn("cosine", col("n_both").cast("double") /
        (sqrt(col("n_a").cast("double")) * sqrt(col("n_b").cast("double"))))
      .select("item_a", "item_b", "n_both", "n_a", "n_b", "jaccard", "overlap", "cosine")
  }

  /** Per-group aggregate STATE — the incremental-view-maintenance
    * primitive of a 100 TB lambda/batch-layer pipeline: instead of
    * re-scanning all of history for tonight's dashboard numbers, keep
    * one state row per key (n, sum, min, max over exact snapped units)
    * and fold each day's delta in with [[mergeAggStates]]. Every field
    * is a COMMUTATIVE MONOID over exact integers, so
    * merge(state(A), state(B)) ≡ state(A ∪ B) bit-for-bit in any merge
    * order and any partitioning — the algebraic fact an external oracle
    * verifies directly (and the same decomposition Spark's own partial
    * aggregation performs within one job, lifted to CROSS-JOB lifetime:
    * materialize the state, never the history). Derive mean =
    * sum/n downstream; variance needs Σx² — add it via the q61
    * DECIMAL(38,0) pattern when needed; exact distincts do NOT fold
    * (use the q31 HLL sketch state). Null values drop. Output:
    * groupCols, n, sum_units, min_units, max_units.
    */
  def aggState(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    df.select(gcols :+ snap(valueCol, scale).as("_u"): _*)
      .filter(col("_u").isNotNull)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("_u")).cast("long").as("sum_units"),
        min(col("_u")).cast("long").as("min_units"),
        max(col("_u")).cast("long").as("max_units"))
  }

  /** Fold two [[aggState]] tables (FULL OUTER on the keys — a key seen
    * only on one side passes through unchanged). One keyed shuffle of
    * two |keys|-sized tables; history never re-reads. */
  def mergeAggStates(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val stateCols = Seq("n", "sum_units", "min_units", "max_units")
    Seq(a, b).foreach(d => (groupCols ++ stateCols).foreach(c =>
      require(d.columns.contains(c), s"not an aggState table: missing $c")))
    val bR = stateCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"_b_$c"))
    a.join(bR, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("_b_n"), lit(0L))).as("n"),
        (coalesce(col("sum_units"), lit(0L)) + coalesce(col("_b_sum_units"), lit(0L)))
          .as("sum_units"),
        least(col("min_units"), col("_b_min_units")).as("min_units"),
        greatest(col("max_units"), col("_b_max_units")).as("max_units")): _*)
  }

  /** Per-group WEIGHTED percentiles — the order statistic under row
    * weights (revenue-weighted median price, token-weighted median doc
    * score): value at the smallest unit whose cumulative weight reaches
    * p of the total, with BOTH the weights and the crossing test in
    * pure integer arithmetic (q63's discipline: `den·cum ≥ num·total`
    * over exact longs — no float threshold to disagree cross-engine,
    * and exact-boundary cases decided correctly). Probs are RATIONALS
    * (num, den) for exactly that reason. Plan: the q60/q67 histogram
    * shape — (group, unit) weight sums by partial agg (the corpus never
    * sorts; the cumulative window orders |distinct units| rows per
    * group), group totals derive from the histogram, each prob selects
    * by one conditional min. Zero/negative weights are out of domain
    * and dropped (a zero-weight row cannot carry an order statistic);
    * null value/weight rows drop. Overflow: den·cum must fit a long —
    * den ≤ 10⁴ with ≤ 10¹⁴ total weight units is safe. Output:
    * groupCols, p_num, p_den, value_units.
    */
  def weightedPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      weightCol: Column, probs: Seq[(Int, Int)], valueScale: Long = 100L,
      weightScale: Long = 1L): DataFrame = {
    require(probs.nonEmpty, "at least one (num, den) prob required")
    probs.foreach { case (n, d) =>
      require(d >= 1 && n >= 1 && n <= d, s"prob must satisfy 0 < num/den <= 1: ($n, $d)")
    }
    require(valueScale >= 1 && weightScale >= 1, "scales must be >= 1")
    val gcols = groupCols.map(col)
    val hist = df.select(gcols :+ snap(valueCol, valueScale).as("_u")
        :+ snap(weightCol, weightScale).as("_w"): _*)
      .filter(col("_u").isNotNull && col("_w").isNotNull && col("_w") > 0)
      .groupBy(gcols :+ col("_u"): _*).agg(sum(col("_w")).cast("long").as("_wsum"))
    val wc = Window.partitionBy(gcols: _*).orderBy(col("_u"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum(col("_wsum")).over(wc))
    val totals = hist.groupBy(gcols: _*).agg(sum(col("_wsum")).cast("long").as("_tot"))
    // |groups × distinct units| rows, read once PER PROB — materialize
    // (the q62 discipline; without it each prob re-runs the histogram,
    // window and join)
    val withTot = cum.join(totals, groupCols).eagerPin()
    val selections = probs.map { case (num, den) =>
      withTot
        .filter(col("_cum") * lit(den.toLong) >= col("_tot") * lit(num.toLong))
        .groupBy(gcols: _*)
        .agg(min(col("_u")).as("value_units"))
        .select(gcols ++ Seq(lit(num.toLong).as("p_num"), lit(den.toLong).as("p_den"),
          col("value_units")): _*)
    }
    selections.reduce(_.unionByName(_))
  }

  /** Mann–Kendall trend test per group (Mann 1945, Kendall 1975) — the
    * NONPARAMETRIC "is this series trending?" next to q52's parametric
    * slope and q94/q105's robust slope: S = Σ_{i<j} sgn(y_j − y_i) over
    * the time-ordered series asks only "do later points tend to be
    * larger?", immune to outliers and to any monotone transform of y —
    * the standard drift detector for daily metric series (exactly what
    * a corpus-health dashboard runs per metric per segment).
    *
    * Determinism is the q44/q94 discipline end to end: x and y snap to
    * longs, S and the tie-corrected variance numerator
    *   var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)   (t = y-tie run sizes)
    * are EXACT integer sums in any accumulation order, and the
    * continuity-corrected z = (S∓1)/√(var18/18) is ONE fixed double
    * expression replayed verbatim by an external engine.
    *
    * Plan: groups shuffle once on groupCols; the pair set is a
    * self-join within the group (quadratic — the theilSen trade), so
    * `maxN` fails loud in-plan before a big group detonates: the caller
    * pre-aggregates to a coarser time grain (daily → weekly), which is
    * the statistically right move anyway. Duplicate x within a group
    * also fails loud — MK is defined on a series, and silently averaging
    * would change the test. Groups with var18 ≤ 0 (all-tied y) drop.
    * Output: groupCols, n, s, var18, z.
    */
  def mannKendall(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, maxN: Int = 5000, scaleX: Long = 1L,
      scaleY: Long = 1L): DataFrame = {
    require(maxN >= 2 && maxN <= 1600000,
      s"maxN must be in [2, 1.6e6] (n(n-1)(2n+5) must fit a long), got $maxN")
    require(scaleX >= 1 && scaleY >= 1, "scales must be >= 1")
    val gcols = groupCols.map(col)
    val pts = df.select(gcols :+ snap(xCol, scaleX).as("_x")
        :+ snap(yCol, scaleY).as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      // both guards woven into a USED column (the mannWhitney pattern):
      // duplicate x is a definition error, an over-maxN group is a
      // quadratic detonation — neither may run silently
      .withColumn("_dup", count(lit(1))
        .over(Window.partitionBy(gcols :+ col("_x"): _*)))
      .withColumn("_gn", count(lit(1)).over(Window.partitionBy(gcols: _*)))
      .withColumn("_y",
        when(col("_dup") > 1L, raise_error(lit(
          "mannKendall: duplicate x within a group — pre-aggregate to one " +
            "row per time point")).cast("long"))
          .when(col("_gn") > maxN, raise_error(lit(
            s"mannKendall: group exceeds maxN=$maxN — the pair join is " +
              "quadratic; pre-aggregate to a coarser time grain")).cast("long"))
          .otherwise(col("_y")))
      .drop("_dup").eagerPin()
    val a = pts.select(gcols :+ col("_x").as("_xa") :+ col("_y").as("_ya"): _*)
    val b = pts.select(gcols :+ col("_x").as("_xb") :+ col("_y").as("_yb"): _*)
    val sTab = a.join(b, groupCols).filter(col("_xa") < col("_xb"))
      .groupBy(gcols: _*)
      .agg(sum(when(col("_yb") > col("_ya"), 1L)
        .when(col("_yb") < col("_ya"), -1L).otherwise(0L)).as("s"))
    val ties = pts.groupBy(gcols :+ col("_y"): _*).agg(count(lit(1)).as("_t"))
      .groupBy(gcols: _*)
      .agg(sum(col("_t") * (col("_t") - 1L) * (lit(2L) * col("_t") + 5L)).as("_tau"),
        sum(col("_t")).as("n"))
    val nL = col("n")
    val var18 = (nL * (nL - 1L) * (lit(2L) * nL + 5L) - col("_tau")).as("var18")
    val sd = sqrt(col("var18").cast("double") / lit(18.0))
    val z = when(col("s") > 0L, (col("s") - 1L).cast("double") / sd)
      .when(col("s") < 0L, (col("s") + 1L).cast("double") / sd)
      .otherwise(lit(0.0))
    ties.join(sTab, groupCols)
      .withColumn("var18", var18)
      .filter(col("var18") > 0L)
      .select(gcols ++ Seq(col("n"), col("s"), col("var18"), z.as("z")): _*)
  }

  /** Kruskal–Wallis H test per group (Kruskal & Wallis 1952) — the
    * k-sample extension of [[mannWhitney]]: do the value distributions
    * differ across k treatment levels? Rank-based, so no normality
    * assumption and outlier-immune — "does quality differ by source?" /
    * "does latency differ by weekday?" at corpus scale.
    *
    * The integer rank discipline is mannWhitney's wholesale: tie groups
    * carry average ranks as the exact long 2·rank, each treatment's rank
    * sum enters as 2·R_i (exact), and only the final
    *   H = 3·Σ(2R_i)²/n_i / (n(n+1)) − 3(n+1),  H_adj = H / C,
    *   C = 1 − Στ/(n³−n)   (τ = t³−t per tie run)
    * touches doubles. Σ(2R_i)²/n_i is a sum of k DOUBLES, so it folds on
    * an ORDERED window over the treatment levels — the q110/q69
    * sequential-fold discipline: both engines add the same terms in the
    * same left-to-right order, bit-identical.
    *
    * Plan: one partial-agg pass to the (group, treat, value) tie table
    * (hot values combine map-side), ONE window over |distinct values|
    * rows per group for start ranks, partial-agg to k rows per group,
    * ONE window over those k rows for the fold — never a corpus sort.
    * Overflow guards mirror mannWhitney's (fail loud, woven into a used
    * column). Groups need k ≥ 2 treatments and an untied pair (C > 0).
    * Output: groupCols, k, n, h, h_adj.
    */
  def kruskalWallis(df: DataFrame, groupCols: Seq[String], treatCol: Column,
      valueCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val parts = groupCols.map(col)
    val pts = df.select(parts :+ treatCol.as("_k") :+
        snap(valueCol, scale).as("_v"): _*)
      .filter(col("_k").isNotNull && col("_v").isNotNull)
    val tt = pts.groupBy(parts :+ col("_k") :+ col("_v"): _*)
      .agg(count(lit(1)).as("_tc"))
    val tv = tt.groupBy(parts :+ col("_v"): _*).agg(sum(col("_tc")).as("_t"))
    val wv = Window.partitionBy(parts: _*).orderBy(col("_v"))
    val ranked = tv.withColumn("_cum", sum(col("_t")).over(wv))
      // average rank of the tie run, carried exactly as 2·rank
      .withColumn("_r2", lit(2L) * (col("_cum") - col("_t") + 1L) + col("_t") - 1L)
    val perTreat = tt
      .join(ranked.select(parts :+ col("_v") :+ col("_r2"): _*),
        groupCols :+ "_v")
      .groupBy(parts :+ col("_k"): _*)
      .agg(sum(col("_tc") * col("_r2")).as("_r2a"), sum(col("_tc")).as("_ni"))
    val wk = Window.partitionBy(parts: _*).orderBy(col("_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // terms are ≥ 0, so the ordered running sum is monotone and its max
    // IS the deterministically-folded total
    val folded = perTreat
      .withColumn("_term", col("_r2a").cast("double") * col("_r2a").cast("double")
        / col("_ni").cast("double"))
      .withColumn("_run", sum(col("_term")).over(wk))
      .groupBy(parts: _*)
      .agg(count(lit(1)).as("k"), max(col("_run")).as("_h4"))
    val perGroup = ranked.groupBy(parts: _*)
      .agg(sum(col("_t")).as("n"),
        sum(col("_t") * col("_t") * col("_t") - col("_t")).as("_tau"),
        max(col("_t")).as("_tmax"))
      .withColumn("n",
        when(col("_tmax") > 2000000L || col("n") > 2000000000L,
          raise_error(lit("kruskalWallis: tie run > 2e6 or group > 2e9 rows — " +
            "the exact long rank arithmetic would overflow; pre-aggregate " +
            "or subsample the group")).cast("long"))
          .otherwise(col("n")))
      .drop("_tmax")
    val nD = col("n").cast("double")
    val h = lit(3.0) * col("_h4") / (nD * (nD + lit(1.0))) -
      lit(3.0) * (nD + lit(1.0))
    val c = lit(1.0) - col("_tau").cast("double") / (nD * nD * nD - nD)
    folded.join(perGroup, groupCols)
      .filter(col("k") >= 2 && col("n") > col("k"))
      .withColumn("h", h)
      .withColumn("_c", c)
      .filter(col("_c") > 0.0)
      .select(parts ++ Seq(col("k"), col("n"), col("h"),
        (col("h") / col("_c")).as("h_adj")): _*)
  }

  /** Benjamini–Hochberg step-up FDR adjustment (Benjamini & Hochberg
    * 1995) — the multiple-testing control every per-group scan in this
    * family NEEDS once it emits hundreds of p-values (q44's outlier
    * scan, q115's daily anomaly sweep): at α=0.05, a 1000-hypothesis
    * sweep hands back ~50 false positives under the null; BH caps the
    * FALSE DISCOVERY RATE instead, the standard for anomaly triage.
    *
    * adj_i = min_{j ≥ i} (p_(j) · m / j), capped at 1 — computed as a
    * suffix-min window over the p-ascending ranking. The ranking
    * tie-breaks on `keyCols` so it is TOTAL (equal p-values get a
    * deterministic order — the adjusted values are identical either way,
    * but the emitted rank column must be reproducible cross-engine).
    *
    * Scale CONTRACT (default plan): a hypothesis table is per-GROUP test
    * results — thousands of rows, not the corpus — so the
    * single-partition ranking window is a driver-sized sort by
    * construction (the q53 contract: the corpus never sorts; only the
    * reduced statistic table does). A caller that CANNOT promise a
    * reduced table must pass `distributed = true`: the ranking then
    * range-partitions by the (p, keys) total order with exact
    * count-offset ranks and a split suffix-min — bit-identical rows
    * (spec-proven), parallelism scaling with the hypothesis count.
    * Output: input columns + bh_rank, m, p_adj, discovery.
    */
  def bhAdjust(df: DataFrame, pCol: Column, keyCols: Seq[Column],
      alpha: Double = 0.05, distributed: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(keyCols.nonEmpty, "keyCols must make the p-ordering total")
    // Two plans, caller-declared (r14; VERDICT r13 item 5). DEFAULT: the
    // single global rank/suffix-min window — correct ONLY under the
    // documented contract that `df` is a REDUCED hypothesis table (per-
    // group test results, thousands of rows; every declared caller).
    // An unreduced caller single-tasks the sort — that caller must pass
    // `distributed = true` for the range-partitioned two-pass form
    // below, whose parallelism scales with the hypothesis count. The
    // gate is a parameter and not a runtime row count DELIBERATELY:
    // auto-gating needs a pin + count before planning, measured at
    // +3 jobs / +0.25 s on q115's 0.3 s profile (and the
    // always-distributed variant measured 6 → 17 driver jobs) — a pure
    // barrier tax on every contract-sized caller to save a misuse the
    // contract already names. Both forms are bit-identical row for row
    // (spec-proven): ranks are exact longs, every combined quantity is
    // a MIN of doubles (exact in any grouping).
    if (!distributed) {
      val ranked = df.filter(pCol.isNotNull)
        .withColumn("_p", pCol.cast("double"))
        .withColumn("bh_rank",
          row_number().over(Window.orderBy(col("_p") +: keyCols: _*)).cast("long"))
        .withColumn("m", count(lit(1)).over(
          Window.partitionBy().rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      val wSuffix = Window.orderBy(col("bh_rank"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      return ranked
        .withColumn("p_adj", least(
          min(col("_p") * col("m").cast("double") / col("bh_rank").cast("double"))
            .over(wSuffix), lit(1.0)))
        .withColumn("discovery", col("p_adj") <= lit(alpha))
        .drop("_p")
    }
    // Distributed two-pass form: RANGE-partition by the total (p, keys)
    // order; the global rank is the per-partition row_number plus a
    // partition-count prefix offset, and the BH suffix-min splits into a
    // per-partition RUNNING min (descending rank — never an O(n²)
    // following frame) combined with the min over all LATER partitions.
    // Two partition-count-sized driver collects (the q16 metadata
    // discipline) replace the single-task sort; parallelism scales with
    // the hypothesis count.
    val ordCols = col("_p") +: keyCols
    val parted = df.filter(pCol.isNotNull)
      .withColumn("_p", pCol.cast("double"))
      .repartitionByRange(ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
      .withColumn("_pid", spark_partition_id())
      .eagerPin() // both passes + the output read this
    val statsRows = parted.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val m = statsRows.map(_._2).sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      statsRows.map { case (pid, n) => val o = pid -> acc; acc += n; o }.toMap
    }
    val wLocal = Window.partitionBy(col("_pid")).orderBy(ordCols: _*)
    val ranked = parted
      .withColumn("bh_rank",
        (element_at(typedlit(offsets), col("_pid")) +
          row_number().over(wLocal).cast("long")))
      .withColumn("m", lit(m))
      .withColumn("_f",
        col("_p") * col("m").cast("double") / col("bh_rank").cast("double"))
      .eagerPin() // the tail collect + the output read this
    // min of _f over all partitions AFTER each pid (suffix across the
    // range order); null when none — least() below ignores it
    val minF = ranked.groupBy("_pid").agg(min(col("_f")).as("_mf"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(-_._1)
    val tails: Map[Int, Double] = {
      // Double.compare ordering = Spark's min over doubles (NaN sorts
      // greatest), so the driver fold can never diverge from the
      // in-engine per-partition mins it combines
      var best: Option[Double] = None
      minF.flatMap { case (pid, mf) =>
        val t = best.map(pid -> _)
        best = Some(best.fold(mf)(b =>
          if (java.lang.Double.compare(mf, b) < 0) mf else b))
        t
      }.toMap
    }
    val wSuffixLocal = Window.partitionBy(col("_pid"))
      .orderBy(col("bh_rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("p_adj", least(
        least(min(col("_f")).over(wSuffixLocal),
          element_at(typedlit(tails), col("_pid"))), lit(1.0)))
      .withColumn("discovery", col("p_adj") <= lit(alpha))
      .drop("_p", "_pid", "_f")
  }

  /** Cramér's V effect size + scalar chi² (Cramér 1946) — what [[q58]]'s
    * per-cell chi² table deliberately does NOT emit (the no-cross-engine-
    * float-sum contract): the scalar χ² folded DETERMINISTICALLY (ordered
    * window over the grid cells — the q110/q69 sequential-fold
    * discipline, both engines add the same doubles left to right) plus
    * V = √(χ² / (n·(min(r,c)−1))) ∈ [0,1], the sample-size-free
    * dependence strength a 10⁹-row contingency needs (χ² alone grows
    * with n; V answers "how strong", comparable across corpora).
    * One row out: n, r, c, chi2, v. Degenerate grids (min(r,c) < 2)
    * produce no row — V is undefined, not zero.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val grid = chiSquare(df, aCol, bCol)
    val w = Window.orderBy(col(aCol), col(bCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("_run", sum(col("chi2_term")).over(w))
      .agg(sum(col("observed")).cast("long").as("n"),
        countDistinct(col(aCol)).as("r"),
        countDistinct(col(bCol)).as("c"),
        max(col("_run")).as("chi2"))
      .filter(least(col("r"), col("c")) >= 2L && col("n") > 0L)
      .withColumn("v", sqrt(col("chi2") /
        (col("n").cast("double") * (least(col("r"), col("c")) - 1L).cast("double"))))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test (Cochran 1954, Mantel &
    * Haenszel 1959) — "is the arm associated with the outcome AFTER
    * controlling for the strata?", the Simpson's-paradox guard a pooled
    * 2×2 (q58/q112) cannot give: aggregating over strata can reverse the
    * direction of an association entirely; CMH tests the common effect
    * within strata. Per stratum the four margins are exact longs from
    * ONE partial-agg pass; the per-stratum
    *   num_i = a_i − n1_i·m1_i/n_i,   den_i = n1_i·n0_i·m1_i·m0_i /
    *     (n_i²·(n_i−1))
    * are fixed double trees, and the two cross-strata double sums fold
    * on an ORDERED window over the strata (the q110 sequential-fold
    * discipline — num_i is SIGNED, so the fold takes the value at the
    * LAST stratum, not a max). CMH = (Σnum)²/Σden ~ χ²(1); the p-value
    * is the shared [[graft.functions.NormalDist]] polynomial on √CMH
    * (χ²(1) = Z²). No continuity correction (both engines would have to
    * agree on its arbitrary 0.5 — omitted, documented). Zero-margin
    * strata contribute exactly 0 to both sums; strata with n < 2 drop
    * (den undefined). Output one row per group: n_strata, cmh, p.
    */
  def cmhTest(df: DataFrame, groupCols: Seq[String], strataCol: Column,
      armCol: Column, successCol: Column): DataFrame = {
    val parts = groupCols.map(col)
    val cells = df.select(parts :+ strataCol.as("_s") :+
        armCol.cast("boolean").as("_arm") :+
        successCol.cast("boolean").as("_succ"): _*)
      .filter(col("_s").isNotNull && col("_arm").isNotNull && col("_succ").isNotNull)
      .groupBy(parts :+ col("_s"): _*)
      .agg(count(lit(1)).as("_n"),
        sum(when(col("_arm") && col("_succ"), 1L).otherwise(0L)).as("_a"),
        sum(when(col("_arm"), 1L).otherwise(0L)).as("_n1"),
        sum(when(col("_succ"), 1L).otherwise(0L)).as("_m1"))
      .filter(col("_n") >= 2)
    val nD = col("_n").cast("double")
    val n1 = col("_n1").cast("double")
    val n0 = (col("_n") - col("_n1")).cast("double")
    val m1 = col("_m1").cast("double")
    val m0 = (col("_n") - col("_m1")).cast("double")
    val w = Window.partitionBy(parts: _*).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = cells
      .withColumn("_num", col("_a").cast("double") - n1 * m1 / nD)
      .withColumn("_den", n1 * n0 * m1 * m0 / (nD * nD * (nD - lit(1.0))))
      .withColumn("_rnum", sum(col("_num")).over(w))
      .withColumn("_rden", sum(col("_den")).over(w))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(parts: _*).orderBy(col("_s"))))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(parts: _*)))
      .filter(col("_rk") === col("_cnt")) // the completed fold, signed-safe
    folded.filter(col("_rden") > 0.0)
      .withColumn("cmh", col("_rnum") * col("_rnum") / col("_rden"))
      .select(parts ++ Seq(col("_cnt").as("n_strata"), col("cmh"),
        graft.functions.NormalDist.twoSidedP(sqrt(col("cmh"))).as("p")): _*)
  }

  /** Delta-method standard error of a per-group RATIO metric (Cochran
    * 1977 §6.4, the survey-sampling ratio estimator; fpc omitted) — the
    * honest error bar for revenue-per-unit / tokens-per-doc / CTR-style
    * metrics, where naive per-row averaging is a DIFFERENT (wrong)
    * estimand and a jackknife would need a float sum over n rows (which
    * has no deterministic cross-engine order — rejected). Everything
    * reduces to SIX moment sums in ONE windowless partial-agg pass: n,
    * Σy, Σw exact longs; Σy², Σw², Σyw in decimal(38,0) (the q61
    * discipline — cent squares overflow longs at corpus scale; decimal
    * accumulation is exact in any order, the single terminal cast to
    * double is one shared rounding). Then
    *   R = Σy/Σw,  Σe² = Σy² − 2R·Σyw + R²·Σw²,
    *   se = √( n/(Σw)² · Σe²/(n−1) )
    * is a fixed double tree, with Σe² clamped at 0 (it is ≥ 0
    * analytically; the clamp kills the one-ulp negative both engines
    * would share anyway). Output: groupCols, n, ratio, se, ci_lo, ci_hi
    * (±1.96·se).
    */
  def ratioSE(df: DataFrame, groupCols: Seq[String], yCol: Column,
      wCol: Column, scaleY: Long = 100L, scaleW: Long = 1L): DataFrame = {
    require(scaleY >= 1 && scaleW >= 1, "scales must be >= 1")
    val gcols = groupCols.map(col)
    val pts = df.select(gcols :+ snap(yCol, scaleY).as("_y")
        :+ snap(wCol, scaleW).as("_w"): _*)
      .filter(col("_y").isNotNull && col("_w").isNotNull)
    val yd = col("_y").cast("decimal(19,0)")
    val wd = col("_w").cast("decimal(19,0)")
    val s = pts.groupBy(gcols: _*).agg(
      count(lit(1)).as("n"),
      sum(col("_y")).cast("double").as("_sy"),
      sum(col("_w")).cast("double").as("_sw"),
      sum(yd * yd).cast("decimal(38,0)").cast("double").as("_syy"),
      sum(wd * wd).cast("decimal(38,0)").cast("double").as("_sww"),
      sum(yd * wd).cast("decimal(38,0)").cast("double").as("_syw"))
    val nD = col("n").cast("double")
    val r = col("_sy") / col("_sw")
    s.filter(col("n") >= 2 && col("_sw") =!= 0.0)
      .withColumn("ratio", r)
      .withColumn("_ss", greatest(
        col("_syy") - lit(2.0) * col("ratio") * col("_syw") +
          col("ratio") * col("ratio") * col("_sww"), lit(0.0)))
      .withColumn("se", sqrt(nD / (col("_sw") * col("_sw")) *
        (col("_ss") / (nD - lit(1.0)))))
      .select(gcols ++ Seq(col("n"), col("ratio"), col("se"),
        (col("ratio") - lit(1.96) * col("se")).as("ci_lo"),
        (col("ratio") + lit(1.96) * col("se")).as("ci_hi")): _*)
  }

  /** Population Stability Index per group (the credit-scoring /
    * model-monitoring drift standard; see also t23's JS divergence for
    * token distributions) — "has this metric's DISTRIBUTION shifted
    * between the reference and current populations?": the reference
    * half's deciles define the bins (so under no drift every bin holds
    * ~10% by construction), both halves' bin shares are compared via
    * PSI = Σ (p−q)·ln(p/q); the folk thresholds (0.1 watch, 0.25 act)
    * only mean anything because the binning is fixed this way.
    *
    * Scale discipline: cutpoints come from the VALUE HISTOGRAM (q60 —
    * |distinct units| rows per group, never a corpus sort), the
    * crossing rule is pure integer (cum·bins ≥ k·n, exact ceil
    * semantics with no float rank), bin assignment joins the HISTOGRAM
    * against the ≤ bins−1 cutpoints (rows never fan out), counts are
    * exact longs on the COMPLETED bin grid, and the +1-Laplace-smoothed
    * shares (empty bins must not produce ln 0 — standard practice,
    * shared with the oracle) make each term (p−q)ln(p/q) ≥ 0, so the
    * ordered-window fold's running max IS the deterministic total.
    * Groups with no reference rows have no bins and drop. Output:
    * groupCols, n_ref, n_cur, psi.
    */
  def psiDrift(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      isRefCol: Column, bins: Int = 10, scale: Long = 100L): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000], got $bins")
    require(scale >= 1, "scale must be >= 1")
    val gcols = groupCols.map(col)
    val pts = df.select(gcols :+ isRefCol.cast("boolean").as("_ref")
        :+ snap(valueCol, scale).as("_v"): _*)
      .filter(col("_ref").isNotNull && col("_v").isNotNull)
    // value histogram per (group, half) — everything downstream runs on
    // |distinct units| rows, never the corpus
    val hist = pts.groupBy(gcols :+ col("_ref") :+ col("_v"): _*)
      .agg(count(lit(1)).as("_c")).eagerPin()
    val refHist = hist.filter(col("_ref")).drop("_ref")
    val wv = Window.partitionBy(gcols: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val refCum = refHist.withColumn("_cum", sum(col("_c")).over(wv))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(gcols: _*)))
    // cut k (1..bins−1) = min unit whose cum reaches ceil(k·n/bins):
    // cum·bins ≥ k·n is that exact integer crossing (q63's discipline)
    val cuts = refCum
      .withColumn("_k", explode(lit((1 until bins).toArray)))
      .filter(col("_cum") * lit(bins.toLong) >= col("_k").cast("long") * col("_n"))
      .groupBy(gcols :+ col("_k"): _*).agg(min(col("_v")).as("_cut"))
    // bin of a unit = how many cuts lie strictly below it
    val binned = hist.join(cuts, groupCols)
      .groupBy(gcols :+ col("_ref") :+ col("_v") :+ col("_c"): _*)
      .agg(sum(when(col("_v") > col("_cut"), 1L).otherwise(0L)).as("_bin"))
      .groupBy(gcols :+ col("_ref") :+ col("_bin"): _*)
      .agg(sum(col("_c")).as("_bc"))
    val grid = binned.select(gcols: _*).distinct()
      .withColumn("_bin", explode(lit((0L until bins.toLong).toArray)))
    val wide = grid
      .join(binned.filter(col("_ref")).select(gcols :+ col("_bin") :+
        col("_bc").as("_cr"): _*), groupCols :+ "_bin", "left")
      .join(binned.filter(!col("_ref")).select(gcols :+ col("_bin") :+
        col("_bc").as("_cc"): _*), groupCols :+ "_bin", "left")
      .withColumn("_cr", coalesce(col("_cr"), lit(0L)))
      .withColumn("_cc", coalesce(col("_cc"), lit(0L)))
      .withColumn("_nr", sum(col("_cr")).over(Window.partitionBy(gcols: _*)))
      .withColumn("_nc", sum(col("_cc")).over(Window.partitionBy(gcols: _*)))
      .filter(col("_nr") > 0L)
    val p = (col("_cr") + lit(1L)).cast("double") /
      (col("_nr") + lit(bins.toLong)).cast("double")
    val q = (col("_cc") + lit(1L)).cast("double") /
      (col("_nc") + lit(bins.toLong)).cast("double")
    val wb = Window.partitionBy(gcols: _*).orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wide.withColumn("_term", (p - q) * log(p / q))
      .withColumn("_run", sum(col("_term")).over(wb))
      .groupBy(gcols: _*)
      .agg(max(col("_nr")).as("n_ref"), max(col("_nc")).as("n_cur"),
        max(col("_run")).as("psi"))
  }

  /** Brown–Forsythe test for equal variances per group (Levene 1960 with
    * Brown & Forsythe 1974's median centering — the robust standard) —
    * "do the k treatment levels have equal SPREAD?", the prerequisite
    * check behind every pooled-variance test (q61's t assumes it) and a
    * drift signal in its own right (a metric whose variance explodes by
    * weekday is broken even when its means agree). Median-centered, so
    * heavy tails don't masquerade as variance differences.
    *
    * The whole statistic reduces to exact arithmetic on the VALUE
    * HISTOGRAM (never the corpus): per-treatment medians come from the
    * cent histogram by the q60 rank rule, carried doubled (2·median =
    * lower + upper order stat — an exact long, no .5 float), absolute
    * deviations z₂ = |2v − 2·med| are exact longs weighted by the
    * histogram counts, Σc·z₂ stays long, Σc·z₂² accumulates in
    * decimal(38,0) (the q61 discipline), and the k-term Σsᵢ²/nᵢ folds
    * on an ORDERED window over treatments (the q114 shape). W is scale-
    * invariant, so the doubling cancels:
    *   W = (N−k)/(k−1) · (Σsᵢ²/nᵢ − S²/N) / (Σc·z₂² − Σsᵢ²/nᵢ).
    * Groups need k ≥ 2, N > k, and a positive within-treatment spread
    * (B > 0). Output: groupCols, k, n, w.
    */
  def brownForsythe(df: DataFrame, groupCols: Seq[String], treatCol: Column,
      valueCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val parts = groupCols.map(col)
    val hist = df.select(parts :+ treatCol.as("_k") :+
        snap(valueCol, scale).as("_v"): _*)
      .filter(col("_k").isNotNull && col("_v").isNotNull)
      .groupBy(parts :+ col("_k") :+ col("_v"): _*)
      .agg(count(lit(1)).as("_c")).eagerPin()
    val wv = Window.partitionBy(parts :+ col("_k"): _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(wv))
      .withColumn("_n", sum(col("_c")).over(
        Window.partitionBy(parts :+ col("_k"): _*)))
    // 2·median = lower + upper order statistic (exact long; q60 rank rule)
    val med2 = cum.groupBy(parts :+ col("_k"): _*)
      .agg((min(when(col("_cum") >= ((col("_n") + 1L) / lit(2.0)).cast("long"),
          col("_v"))) +
        min(when(col("_cum") >= (col("_n") / lit(2.0)).cast("long") + 1L,
          col("_v")))).as("_med2"))
    val z = hist.join(broadcast(med2), groupCols :+ "_k")
      .withColumn("_z2", abs(lit(2L) * col("_v") - col("_med2")))
    val zd = col("_z2").cast("decimal(19,0)")
    val perTreat = z.groupBy(parts :+ col("_k"): _*)
      .agg(sum(col("_c")).as("_ni"),
        sum(col("_c") * col("_z2")).as("_si"),
        // stays DECIMAL here: a per-treatment double would make the
        // k-term group sum below an unordered float sum
        sum(col("_c").cast("decimal(19,0)") * zd * zd)
          .cast("decimal(38,0)").as("_szzi"))
    val wk = Window.partitionBy(parts: _*).orderBy(col("_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = perTreat
      .withColumn("_term", col("_si").cast("double") * col("_si").cast("double")
        / col("_ni").cast("double"))
      .withColumn("_run", sum(col("_term")).over(wk))
      .groupBy(parts: _*)
      .agg(count(lit(1)).as("k"), sum(col("_ni")).as("n"),
        sum(col("_si")).as("_s"),
        sum(col("_szzi")).cast("decimal(38,0)").cast("double").as("_szz"),
        max(col("_run")).as("_a4")) // terms >= 0: running max = ordered total
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val a = col("_a4") - col("_s").cast("double") * col("_s").cast("double") / nD
    val b = col("_szz") - col("_a4")
    folded.filter(col("k") >= 2 && col("n") > col("k"))
      .withColumn("_b", b)
      .filter(col("_b") > 0.0)
      .withColumn("w", (nD - kD) / (kD - lit(1.0)) * (a / col("_b")))
      .select(parts ++ Seq(col("k"), col("n"), col("w")): _*)
  }

  /** One-way ANOVA F test (Fisher) — "do the k treatment MEANS differ?",
    * the parametric member completing the k-sample family: q61 compares
    * two means, q112 two rates, q114 (Kruskal–Wallis) compares k
    * distributions rank-free, q120 (Brown–Forsythe) compares k spreads;
    * this is the classical k-mean test an experiment report leads with
    * when the values are roughly normal. Values snap to exact long
    * units; per treatment ONE partial-agg pass yields n_i (long),
    * s_i = Σv (long) and ss_i = Σv² in decimal(38,0) (the q61
    * discipline — DuckDB sums the same integers in int128). The k-term
    * Σ sᵢ²/nᵢ folds on an ORDERED window (terms ≥ 0 ⇒ the running max
    * IS the deterministic total — the q114/q120 discipline); the rest is
    * a fixed double tree:
    *   SSB = Σ sᵢ²/nᵢ − S²/N,  SSW = Σ ssᵢ − Σ sᵢ²/nᵢ,
    *   F = (SSB/(k−1)) / (SSW/(N−k)).
    * F is scale-invariant (SSB and SSW both carry scale², which
    * cancels), so the snap never moves it. Degenerate groups drop:
    * k < 2, N ≤ k, or SSW ≤ 0 (every treatment internally constant — F
    * undefined). Output per group: k, n, ssb, ssw, f (ssb/ssw in
    * snapped-unit² — divide by scale² for value units).
    */
  def anovaF(df: DataFrame, groupCols: Seq[String], treatCol: Column,
      valueCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val parts = groupCols.map(col)
    val vd = col("_v").cast("decimal(19,0)")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val perTreat = df.select(parts :+ treatCol.as("_k") :+
        snap(valueCol, scale).as("_v"): _*)
      .filter(col("_k").isNotNull && col("_v").isNotNull)
      .groupBy(parts :+ col("_k"): _*)
      .agg(count(lit(1)).as("_ni"), sum(col("_v")).as("_si"),
        sum(vd * vd).cast("decimal(38,0)").as("_ssi"))
      // a null here means Σv² overflowed decimal(38,0): fail LOUD (the
      // welchAnova discipline) — sum() skips nulls, so a null _ssi would
      // silently drop one treatment's squares from _ss below while k/n
      // still count it, emitting a wrong-but-plausible F (or, all-null,
      // silently dropping the whole group while the DuckDB oracle's
      // int128 still emits a row)
      .withColumn("_ssi", when(col("_ssi").isNull, raise_error(lit(
        "anovaF: sum of squares overflowed decimal(38,0) — rescale " +
          "the value units")).cast(dec38)).otherwise(col("_ssi")))
    val wk = Window.partitionBy(parts: _*).orderBy(col("_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = perTreat
      .withColumn("_term", col("_si").cast("double") * col("_si").cast("double")
        / col("_ni").cast("double"))
      .withColumn("_run", sum(col("_term")).over(wk))
      .groupBy(parts: _*)
      .agg(count(lit(1)).as("k"), sum(col("_ni")).as("n"),
        sum(col("_si")).as("_s"),
        sum(col("_ssi")).cast("decimal(38,0)").as("_ssd"),
        max(col("_run")).as("_a")) // terms >= 0: running max = ordered total
      // the k-treatment fold can overflow too; same fail-loud contract
      .withColumn("_ss", when(col("_ssd").isNull, raise_error(lit(
        "anovaF: group sum of squares overflowed decimal(38,0) — " +
          "rescale the value units")).cast(dec38))
        .otherwise(col("_ssd")).cast("double"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    folded.filter(col("k") >= 2 && col("n") > col("k"))
      .withColumn("ssb",
        col("_a") - col("_s").cast("double") * col("_s").cast("double") / nD)
      .withColumn("ssw", col("_ss") - col("_a"))
      .filter(col("ssw") > 0.0)
      .withColumn("f", (col("ssb") / (kD - lit(1.0))) / (col("ssw") / (nD - kD)))
      .select(parts ++ Seq(col("k"), col("n"), col("ssb"), col("ssw"),
        col("f")): _*)
  }

  /** Welch's heteroscedastic one-way ANOVA (Welch 1951) — [[anovaF]]
    * WITHOUT the equal-variance assumption that [[brownForsythe]]
    * exists to test: when spreads differ across treatments (they
    * usually do in metric data), classical F's size is wrong and Welch
    * is the standard repair; at k = 2 the statistic reduces exactly to
    * Welch's t² (q61's test — spec-asserted). Per treatment the exact
    * integer moments (n_i, Σv longs, Σv² decimal(38,0) vs int128) give
    *   s²_i = (n_i·Σv² − (Σv)²) / (n_i(n_i−1))   (numerator exact in
    *   decimal, ONE double division),  w_i = n_i/s²_i,
    * then TWO ordered k-row window folds (the q117 signed-safe
    * take-at-last-row discipline — Σw_i·x̄_i carries sign, so no
    * running-max shortcut): fold 1 accumulates W = Σw and M = Σw·x̄ to
    * get x̄_w = M/W; the group scalars broadcast-join back and fold 2
    * accumulates A = Σw(x̄ − x̄_w)² and Λ4 = Σ(1 − w/W)²/(n_i − 1);
    *   F_w = (A/(k−1)) / (1 + 2(k−2)/(k²−1)·Λ4),
    *   df2 = (k²−1)/(3·Λ4).
    * Both engines add the same doubles in the same treatment order, so
    * the result is bit-stable. A group containing ANY unusable
    * treatment (n_i < 2, or zero within-treatment variance ⇒ w = ∞)
    * emits no row — conservative and explicit, never a silent
    * reshaping of k. Output: groupCols, k, n, f_w, df2.
    */
  def welchAnova(df: DataFrame, groupCols: Seq[String], treatCol: Column,
      valueCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val parts = groupCols.map(col)
    val dec = "decimal(38,0)"
    val vd = col("_v").cast("decimal(19,0)")
    val perTreat = df.select(parts :+ treatCol.as("_k") :+
        snap(valueCol, scale).as("_v"): _*)
      .filter(col("_k").isNotNull && col("_v").isNotNull)
      .groupBy(parts :+ col("_k"): _*)
      .agg(count(lit(1)).as("_ni"), sum(col("_v")).as("_si"),
        sum(vd * vd).cast(dec).as("_ssi"))
      .withColumn("_s2num", col("_ni").cast(dec) * col("_ssi") -
        col("_si").cast(dec) * col("_si").cast(dec))
      // a null here means Σv² overflowed decimal(38,0): fail LOUD (the
      // mannKendall discipline) — a null would otherwise slip past the
      // _bad gate and silently drop one treatment from the folds while
      // k still counts it, emitting a wrong-but-plausible F_w
      .withColumn("_s2num", when(col("_s2num").isNull, raise_error(lit(
        "welchAnova: sum of squares overflowed decimal(38,0) — rescale " +
          "the value units")).cast(dec)).otherwise(col("_s2num")))
      .withColumn("_bad",
        when(col("_ni") < 2L || col("_s2num") <= lit(0L).cast(dec), 1L)
          .otherwise(0L))
      // placeholder on bad treatments: the whole group dies via _rbad,
      // but ANSI division must not fire before the filter can act.
      // The denominator multiplies in the DOUBLE domain: n(n−1) passes
      // 2^63 at ~3e9 rows per treatment, inside the design envelope
      .withColumn("_s2", when(col("_bad") === 1L, lit(1.0))
        .otherwise(col("_s2num").cast("double") /
          (col("_ni").cast("double") * (col("_ni") - 1L).cast("double"))))
      .withColumn("_w", col("_ni").cast("double") / col("_s2"))
      .withColumn("_xb", col("_si").cast("double") / col("_ni").cast("double"))
    val wk = Window.partitionBy(parts: _*).orderBy(col("_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(parts: _*).orderBy(col("_k"))
    // fold 1: W and M, signed-safe (take the completed fold's last row)
    val f1 = perTreat
      .withColumn("_rw", sum(col("_w")).over(wk))
      .withColumn("_rm", sum(col("_w") * col("_xb")).over(wk))
      .withColumn("_rbad", sum(col("_bad")).over(
        Window.partitionBy(parts: _*)))
      .withColumn("_rk", row_number().over(wg))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(parts: _*)))
      .filter(col("_rk") === col("_cnt") && col("_rbad") === 0L &&
        col("_cnt") >= 2L)
      .select(parts ++ Seq(col("_rw").as("_bw"), (col("_rm") / col("_rw"))
        .as("_xw"), col("_cnt").as("k")): _*)
    // fold 2: A and Λ4 against the broadcast group scalars
    val f2 = perTreat.join(broadcast(f1), groupCols)
      .withColumn("_ra", sum(col("_w") * (col("_xb") - col("_xw")) *
        (col("_xb") - col("_xw"))).over(wk))
      .withColumn("_rl", sum((lit(1.0) - col("_w") / col("_bw")) *
        (lit(1.0) - col("_w") / col("_bw")) /
        (col("_ni") - 1L).cast("double")).over(wk))
      .withColumn("_rn", sum(col("_ni")).over(wk))
      .withColumn("_rk", row_number().over(wg))
      .filter(col("_rk") === col("k"))
    val kD = col("k").cast("double")
    f2.filter(col("_rl") > 0.0)
      .withColumn("f_w", (col("_ra") / (kD - lit(1.0))) /
        (lit(1.0) + lit(2.0) * (kD - lit(2.0)) / (kD * kD - lit(1.0)) *
          col("_rl")))
      .withColumn("df2", (kD * kD - lit(1.0)) / (lit(3.0) * col("_rl")))
      .select(parts ++ Seq(col("k"), col("_rn").as("n"), col("f_w"),
        col("df2")): _*)
  }

  /** Single change-point locator (the CUSUM contrast of Page 1954 /
    * binary segmentation's first split) — WHERE did the daily metric
    * level-shift? q113 (Mann–Kendall) answers "is there a monotone
    * drift?"; q119 (PSI) and E22 (JS) answer "did the distribution
    * move?"; this names the DAY the level jumped — the triage step
    * after any of those gates fires. The corpus pre-aggregates to the
    * per-group DAILY TOTAL series (|groups|·|days| rows — a statistic
    * table, never a corpus sort); for each interior split after day
    * index t the CUSUM contrast C_t = S_t − (t/T)·S_T is scaled by T
    * into the EXACT integer D_t = T·S_t − t·S_T, computed in
    * decimal(38,0) (at 100 TB, T·S_t passes 2⁶³), so the argmax is
    * decided on exact integer comparisons with a deterministic
    * earliest-day tie-break — no float enters the RANKING anywhere.
    * |D_t| also IS the mean gap: mean_right − mean_left =
    * −D_t/(t·(T−t)), so the reported shift = |D_t|/(t·(T−t))/scale is
    * the absolute between-segment mean difference in value units, and
    * mean_left/mean_right are each ONE division of exact integers.
    * Groups with < 2 distinct days drop (no interior split exists).
    * Output per group: day (last day of the left segment), t (days
    * left), t_days (T), mean_left, mean_right, shift.
    *
    * Sizing bound: the daily totals and their prefix sums are LONGS —
    * Σ|v|·scale per group must stay under 2⁶³ (≈9.2·10¹⁸; at cent
    * scale that is ~10¹⁷ dollars of group total, far past any real
    * corpus). Only the T·S_t products, which DO pass 2⁶³ earlier, are
    * lifted to decimal(38,0).
    */
  /** Shared daily pre-agg of [[changePoint]] / [[seasonalNaiveEval]]:
    * (groupCols..., _day, _sv) — the per-group daily TOTAL of the
    * snapped value, null day/value rows dropped whole. The contract
    * both operators' oracles replay; change it here or nowhere.
    */
  private def dailyTotals(df: DataFrame, parts: Seq[Column], dayCol: Column,
      valueCol: Column, scale: Long): DataFrame =
    df.select(parts :+ dayCol.as("_day") :+
        snap(valueCol, scale).as("_v"): _*)
      .filter(col("_day").isNotNull && col("_v").isNotNull)
      .groupBy(parts :+ col("_day"): _*)
      .agg(sum(col("_v")).as("_sv"))

  def changePoint(df: DataFrame, groupCols: Seq[String], dayCol: Column,
      valueCol: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val parts = groupCols.map(col)
    val daily = dailyTotals(df, parts, dayCol, valueCol, scale)
    val wd = Window.partitionBy(parts: _*).orderBy(col("_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(parts: _*)
    val cum = daily
      .withColumn("_t", count(lit(1)).over(wd))
      .withColumn("_st", sum(col("_sv")).over(wd))
      .withColumn("_tt", count(lit(1)).over(wg))
      .withColumn("_stot", sum(col("_sv")).over(wg))
      .filter(col("_t") < col("_tt")) // interior splits only
      .withColumn("_d",
        col("_tt").cast("decimal(38,0)") * col("_st").cast("decimal(38,0)") -
          col("_t").cast("decimal(38,0)") * col("_stot").cast("decimal(38,0)"))
      .withColumn("_absd", abs(col("_d")))
    // argmax on the exact |D_t|, earliest day on ties: a rank window over
    // the |groups|·|days| statistic table (never the corpus)
    val wr = Window.partitionBy(parts: _*)
      .orderBy(col("_absd").desc, col("_day").asc)
    val top = cum.withColumn("_rk", row_number().over(wr))
      .filter(col("_rk") === 1)
    val sD = lit(scale.toDouble)
    top
      .withColumn("mean_left",
        col("_st").cast("double") / col("_t").cast("double") / sD)
      .withColumn("mean_right",
        (col("_stot") - col("_st")).cast("double") /
          (col("_tt") - col("_t")).cast("double") / sD)
      .withColumn("shift", col("_absd").cast("double") /
        (col("_t").cast("double") * (col("_tt") - col("_t")).cast("double")) / sD)
      .select(parts ++ Seq(col("_day").as("day"), col("_t").as("t"),
        col("_tt").as("t_days"), col("mean_left"), col("mean_right"),
        col("shift")): _*)
  }

  /** Seasonal-naive forecast evaluation (the MASE scaling of Hyndman &
    * Koehler 2006, applied to the period-m naive forecaster) — "does
    * weekly structure explain this series?" as ONE number per group:
    * the period-m naive forecast (ŷ_t = y_{t−m}) is evaluated against
    * the one-step naive baseline (ŷ_t = y_{t−1}),
    *   mase = MAE_seasonal / MAE_naive,
    * < 1 ⇒ the seasonal lag predicts better than persistence — the
    * cheap pre-check before fitting anything like [[holtWinters]], and
    * the standard scale-free way to compare forecast error across
    * groups of different magnitude. The corpus pre-aggregates to the
    * per-group DAILY TOTAL series (|groups|·|days| rows); lags are m
    * STEPS of the observed series (gaps are not imputed — run
    * [[gapFill]] first if calendar-true lags matter; the step contract
    * is documented, not hidden). Every error is an exact long
    * |y_t − y_lag|; the two sums and counts are exact longs; the two
    * MAEs are one division each, and mase cross-multiplies in
    * decimal(38,0) (sum_s·cnt_n can pass 2⁶³) before its single double
    * division, so no intermediate float ever feeds another. Groups
    * need > period observed days and a non-constant series
    * (MAE_naive > 0) — else no row. Output: groupCols, n_days,
    * mae_seasonal, mae_naive, mase (MAEs in value units).
    */
  def seasonalNaiveEval(df: DataFrame, groupCols: Seq[String], dayCol: Column,
      valueCol: Column, period: Int = 7, scale: Long = 100L): DataFrame = {
    require(period >= 2, s"seasonal period must be >= 2, got $period")
    require(scale >= 1, "scale must be >= 1")
    val parts = groupCols.map(col)
    val daily = dailyTotals(df, parts, dayCol, valueCol, scale)
    val w = Window.partitionBy(parts: _*).orderBy(col("_day"))
    val lagged = daily
      .withColumn("_e1", abs(col("_sv") - lag(col("_sv"), 1).over(w)))
      .withColumn("_em", abs(col("_sv") - lag(col("_sv"), period).over(w)))
    val dec = "decimal(38,0)"
    val g = lagged.groupBy(parts: _*)
      .agg(count(lit(1)).as("n_days"),
        count(col("_em")).as("_cs"), sum(col("_em")).as("_ss"),
        count(col("_e1")).as("_cn"), sum(col("_e1")).as("_sn"))
    val sD = lit(scale.toDouble)
    g.filter(col("_cs") > 0L && col("_sn") > 0L)
      .withColumn("mae_seasonal",
        col("_ss").cast("double") / col("_cs").cast("double") / sD)
      .withColumn("mae_naive",
        col("_sn").cast("double") / col("_cn").cast("double") / sD)
      .withColumn("mase",
        (col("_ss").cast(dec) * col("_cn").cast(dec)).cast("double") /
          (col("_sn").cast(dec) * col("_cs").cast(dec)).cast("double"))
      .select(parts ++ Seq(col("n_days"), col("mae_seasonal"),
        col("mae_naive"), col("mase")): _*)
  }

  /** Cohen's kappa inter-rater agreement (Cohen 1960) — do two binary
    * labelers agree BEYOND CHANCE? The evaluation a curation pipeline
    * owes every pair of quality gates (t03's stopword gate vs a length
    * gate, a model classifier vs a rule): raw agreement p_o is inflated
    * when both raters mostly say "keep"; kappa subtracts the chance
    * agreement p_e implied by the marginals. All four contingency counts
    * are exact longs in ONE partial-agg pass (no grid, no join);
    *   p_o = (n − n_a − n_b + 2·n_both)/n,
    *   p_e = (n_a·n_b + (n−n_a)(n−n_b))/n²,  κ = (p_o − p_e)/(1 − p_e)
    * is one fixed double tree. Rows where either label is null drop
    * whole; p_e = 1 (both raters constant) has no kappa — no row.
    * Output one row: n, n_a, n_b, n_both, po, pe, kappa.
    */
  def agreementKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val counts = df
      .select(aCol.cast("boolean").as("_a"), bCol.cast("boolean").as("_b"))
      .filter(col("_a").isNotNull && col("_b").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("_b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("_a") && col("_b"), 1L).otherwise(0L)).as("n_both"))
    val nD = col("n").cast("double")
    val po = (col("n") - col("n_a") - col("n_b") + lit(2L) * col("n_both"))
      .cast("double") / nD
    val pe = (col("n_a").cast("double") * col("n_b").cast("double") +
      (nD - col("n_a").cast("double")) * (nD - col("n_b").cast("double"))) / (nD * nD)
    counts.filter(col("n") > 0L)
      .withColumn("po", po).withColumn("pe", pe)
      .filter(col("pe") < 1.0)
      .withColumn("kappa", (col("po") - col("pe")) / (lit(1.0) - col("pe")))
  }
}
