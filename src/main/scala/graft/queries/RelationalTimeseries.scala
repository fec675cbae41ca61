package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.sources.Tables

/** Time-series / temporal query family (split from Relational.scala in
  * round 7): gap-fill, resampling, EWMA, rolling distinct, SCD2, CUSUM,
  * Holt smoothing, snapshot diff, session paths, duplicate-charge
  * windows, incremental aggregation, Holt-Winters, the native as-of
  * family (backward/forward/nearest), interval overlap, TWAP and linear
  * interpolation. Every windowed scan uses running frames (never
  * currentRow-to-unboundedFollowing, which is O(n^2) per partition).
  */
object RelationalTimeseries {

  /** q36: time-series gap fill — per-user HOURLY grid with forward fill
    * ([[graft.operators.Relational.gapFill]]): dense buckets from each
    * user's first to last event, last observed value carried forward,
    * real vs filled rows flagged. Within-hour conflicts resolve to the
    * latest (ts, event_id) on both engines (max_by struct ↔ row_number
    * DESC), and the floor-hour arithmetic is shared textually (the q26
    * precedent).
    */
  val q36 = QueryDef(
    "q36_gapfill",
    s"""WITH e AS (SELECT user_id,
       |             CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS b,
       |             value, ts, event_id FROM events),
       |o AS (SELECT user_id, b, value AS v FROM (
       |        SELECT *, row_number() OVER (PARTITION BY user_id, b
       |          ORDER BY ts DESC, event_id DESC) AS rn FROM e)
       |      WHERE rn = 1),
       |sp AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM o GROUP BY 1),
       |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS b FROM sp),
       |f AS (SELECT g.user_id, g.b, o.v FROM g LEFT JOIN o USING (user_id, b))
       |SELECT user_id, b AS bucket,
       |  ${mr("last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b ROWS UNBOUNDED PRECEDING)", 2)} AS value,
       |  (v IS NOT NULL) AS observed
       |FROM f ORDER BY user_id, bucket""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    graft.operators.Relational.gapFill(ev, "user_id",
        bucket = floor(unix_millis(col("ts")) / 3600000.0).cast("long"),
        value = col("value"),
        tie = struct(col("ts"), col("event_id")))
      .withColumn("value", graft.functions.Rounding.mirrorRound(col("value"), 2))
      .orderBy("user_id", "bucket")
  }

  /** q59: hourly OHLC bars of event value per event type via
    * [[graft.operators.Relational.resample]] — ONE partial-agg groupBy:
    * open/close are min/max over a (ts, value) struct (lexicographic ⇒
    * deterministic at tied timestamps), high/low plain min/max, total an
    * exact long sum of micro-units (value ≤ ~561 in this corpus, so
    * 10⁶-unit snapping keeps every sum far inside long range). The
    * shuffle carries |bars| rows, never the tick stream — the window
    * plan this replaces ships every event to its bar's partition.
    */
  val q59 = QueryDef(
    "q59_resample",
    """WITH e AS (SELECT event_type, epoch_ms(ts) AS tms,
      |  CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vu
      |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL),
      |b AS (SELECT event_type,
      |  tms - ((tms % 3600000) + 3600000) % 3600000 AS bucket_ms, tms, vu FROM e)
      |SELECT event_type, bucket_ms, CAST(count(*) AS BIGINT) AS n,
      |  (min({'t': tms, 'v': vu})).v AS open,
      |  max(vu) AS high, min(vu) AS low,
      |  (max({'t': tms, 'v': vu})).v AS close,
      |  CAST(sum(vu) AS BIGINT) AS total
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.operators.Relational.resample(Tables.events(s, dir),
        Seq("event_type"), unix_millis(col("ts")), col("value"),
        bucketMillis = 3600000L, scale = 1000000L)
      .orderBy("event_type", "bucket_ms")
  }

  /** q69: per-user EWMA of event values
    * ([[graft.operators.Relational.ewma]]) — the sequential fold run as
    * secondary sort (one entity shuffle, spill-safe within-partition
    * sort, one streaming pass), while the oracle replays the identical
    * fold as a RECURSIVE CTE stepping rank-by-rank within each user.
    * α = 0.25 and 1−α = 0.75 are binary-exact literals and values enter
    * as exact snapped longs, so every intermediate double of the
    * recurrence is bit-identical cross-engine — no rounding anywhere.
    */
  val q69 = QueryDef(
    "q69_ewma",
    """WITH RECURSIVE s AS (
      |  SELECT user_id AS entity, epoch_ms(ts) AS ord, event_id AS tie,
      |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY epoch_ms(ts), event_id) AS rn
      |  FROM events
      |  WHERE value IS NOT NULL AND ts IS NOT NULL
      |    AND user_id IS NOT NULL AND event_id IS NOT NULL),
      |r AS (
      |  SELECT entity, ord, tie, c, rn, CAST(c AS DOUBLE) AS ewma
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.entity, s.ord, s.tie, s.c, s.rn,
      |         CAST(0.25 AS DOUBLE) * CAST(s.c AS DOUBLE)
      |           + CAST(0.75 AS DOUBLE) * r.ewma
      |  FROM r JOIN s ON s.entity = r.entity AND s.rn = r.rn + 1)
      |SELECT entity, ord, tie, c AS value_units, ewma
      |FROM r ORDER BY entity, ord, tie""".stripMargin) { (s, dir) =>
    graft.operators.Relational.ewma(Tables.events(s, dir),
        entityCol = col("user_id"), orderCol = unix_millis(col("ts")),
        tieCol = col("event_id"), valueCol = col("value"), alpha = 0.25)
      .orderBy("entity", "ord", "tie")
  }

  /** q70: trailing 7-day distinct active users by day
    * ([[graft.operators.Relational.rollingDistinct]]) — the reach metric
    * Spark's window frame cannot express (no DISTINCT aggregates over
    * windows): each (day, user) fact explodes to the 7 target days it is
    * visible in (narrow, bounded by the window), then one distinct
    * partial-agg per target day. The oracle states the same semantics as
    * the textbook range self-join. Days out as strings so the DATE type
    * never round-trips through two engines' calendars.
    */
  val q70 = QueryDef(
    "q70_rolling_distinct",
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |w AS (SELECT d.day, du.user_id FROM days d
      |      JOIN du ON du.day BETWEEN d.day - 6 AND d.day)
      |SELECT strftime(day, '%Y-%m-%d') AS period,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_keys
      |FROM w GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    graft.operators.Relational.rollingDistinct(ev, col("day"), col("user_id"), 7)
      .select(date_format(col("period"), "yyyy-MM-dd").as("period"),
        col("distinct_keys"))
      .orderBy("period")
  }

  /** q71: type-2 SCD historization of the event log
    * ([[graft.operators.Relational.scd2]]) — consecutive equal
    * event_type runs per user collapse to validity intervals
    * [valid_from, valid_to) in epoch millis (valid_to NULL = current).
    * One entity shuffle, two window passes; the oracle replays the
    * identical lag-filter-lead chain.
    */
  val q71 = QueryDef(
    "q71_scd2",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
      |           FROM events),
      |m AS (SELECT user_id, event_type, tms, event_id,
      |        lag(event_type) OVER wo AS prev,
      |        row_number() OVER wo AS rn
      |      FROM e WINDOW wo AS (PARTITION BY user_id ORDER BY tms, event_id)),
      |st AS (SELECT user_id, event_type AS state, tms AS valid_from, event_id
      |       FROM m WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
      |SELECT user_id, state, valid_from,
      |  lead(valid_from) OVER w AS valid_to,
      |  CAST(row_number() OVER w AS BIGINT) AS run_seq
      |FROM st WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
      |ORDER BY user_id, run_seq""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tms"))
    graft.operators.Relational.scd2(ev, col("user_id"), col("event_type"),
        col("tms"), col("event_id"))
      .select(col("entity").as("user_id"), col("state"),
        col("valid_from"), col("valid_to"), col("run_seq"))
      .orderBy("user_id", "run_seq")
  }

  private val CusumTarget = 5000L // cents: 50.00 nominal level
  private val CusumK = 2000L      // allowance: only deviations past 20.00 count
  private val CusumH = 20000L     // decision threshold: 200.00 accumulated

  /** q76: per-user CUSUM changepoint flags over event values
    * ([[graft.operators.Relational.cusum]]) — the sequential mean-shift
    * monitor run as q69's secondary-sort fold, but with a stronger
    * exactness story: the whole recurrence (two max(0, ·) accumulators,
    * restart after alarm) is INTEGER arithmetic end to end, so the
    * recursive-CTE oracle matches bit for bit with no IEEE-literal care
    * at all.
    */
  val q76 = QueryDef(
    "q76_cusum",
    s"""WITH RECURSIVE s AS (
       |  SELECT user_id AS entity, epoch_ms(ts) AS ord, event_id AS tie,
       |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY epoch_ms(ts), event_id) AS rn
       |  FROM events
       |  WHERE value IS NOT NULL AND ts IS NOT NULL
       |    AND user_id IS NOT NULL AND event_id IS NOT NULL),
       |r AS (
       |  SELECT entity, ord, tie, c, rn,
       |         greatest(0, c - $CusumTarget - $CusumK) AS sp,
       |         greatest(0, -(c - $CusumTarget + $CusumK)) AS sn
       |  FROM s WHERE rn = 1
       |  UNION ALL
       |  SELECT s.entity, s.ord, s.tie, s.c, s.rn,
       |         greatest(0, (CASE WHEN r.sp > $CusumH OR r.sn > $CusumH
       |                           THEN 0 ELSE r.sp END)
       |                     + (s.c - $CusumTarget - $CusumK)),
       |         greatest(0, (CASE WHEN r.sp > $CusumH OR r.sn > $CusumH
       |                           THEN 0 ELSE r.sn END)
       |                     - (s.c - $CusumTarget + $CusumK))
       |  FROM r JOIN s ON s.entity = r.entity AND s.rn = r.rn + 1)
       |SELECT entity, ord, tie, c AS value_units, sp AS s_plus, sn AS s_minus,
       |  CASE WHEN sp > $CusumH THEN 1 WHEN sn > $CusumH THEN -1 ELSE 0 END AS flag
       |FROM r ORDER BY entity, ord, tie""".stripMargin) { (s, dir) =>
    graft.operators.Relational.cusum(Tables.events(s, dir),
        entityCol = col("user_id"), orderCol = unix_millis(col("ts")),
        tieCol = col("event_id"), valueCol = col("value"),
        targetUnits = CusumTarget, kUnits = CusumK, hUnits = CusumH)
      .orderBy("entity", "ord", "tie")
  }

  /** q77: per-user Holt level+trend smoothing over event values
    * ([[graft.operators.Relational.holt]]) — q69's secondary-sort fold
    * with TWO coupled recurrences: α = 0.5 and β = 0.25 are
    * binary-exact, inputs are snapped longs, so every (level, trend)
    * double of the fold is bit-identical to the oracle's recursive CTE
    * carrying both states rank by rank.
    */
  val q77 = QueryDef(
    "q77_holt",
    """WITH RECURSIVE s AS (
      |  SELECT user_id AS entity, epoch_ms(ts) AS ord, event_id AS tie,
      |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY epoch_ms(ts), event_id) AS rn
      |  FROM events
      |  WHERE value IS NOT NULL AND ts IS NOT NULL
      |    AND user_id IS NOT NULL AND event_id IS NOT NULL),
      |r AS (
      |  SELECT entity, ord, tie, c, rn,
      |         CAST(c AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.entity, s.ord, s.tie, s.c, s.rn,
      |         CAST(0.5 AS DOUBLE) * CAST(s.c AS DOUBLE)
      |           + CAST(0.5 AS DOUBLE) * (r.l + r.b),
      |         CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * CAST(s.c AS DOUBLE)
      |             + CAST(0.5 AS DOUBLE) * (r.l + r.b)) - r.l)
      |           + CAST(0.75 AS DOUBLE) * r.b
      |  FROM r JOIN s ON s.entity = r.entity AND s.rn = r.rn + 1)
      |SELECT entity, ord, tie, c AS value_units, l AS level, b AS trend,
      |  l + b AS forecast1
      |FROM r ORDER BY entity, ord, tie""".stripMargin) { (s, dir) =>
    graft.operators.Relational.holt(Tables.events(s, dir),
        entityCol = col("user_id"), orderCol = unix_millis(col("ts")),
        tieCol = col("event_id"), valueCol = col("value"),
        alpha = 0.5, beta = 0.25)
      .orderBy("entity", "ord", "tie")
  }

  /** q79: snapshot diff / table reconciliation
    * ([[graft.operators.Relational.snapshotDiff]]) — two deterministic
    * key-bucket "extracts" of orders (bucket 1 appears only in the new
    * snapshot, bucket 2 only in the old, bucket 3 changes status AND
    * price) diffed into the change-sized insert/delete/update output;
    * the oracle is the textbook FULL OUTER JOIN with IS DISTINCT FROM
    * per compare column — the operator's null-safe `<=>` semantics
    * verbatim. Unchanged keys (the 100 TB bulk) never leave the join.
    */
  val q79 = QueryDef(
    "q79_snapshot_diff",
    """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS op
      |  FROM orders WHERE o_orderkey % 10 <> 1),
      |n AS (SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 10 = 3 THEN 'X' ELSE o_orderstatus END AS st,
      |  CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1.0 ELSE o_totalprice END AS tp,
      |  1 AS np FROM orders WHERE o_orderkey % 10 <> 2),
      |j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |  CASE WHEN o.op IS NULL THEN 'insert' WHEN n.np IS NULL THEN 'delete'
      |       WHEN (o.o_orderstatus IS DISTINCT FROM n.st)
      |         OR (o.o_totalprice IS DISTINCT FROM n.tp) THEN 'update'
      |       ELSE 'unchanged' END AS change_type,
      |  CAST(o.o_orderstatus IS DISTINCT FROM n.st AS BIGINT)
      |    + CAST(o.o_totalprice IS DISTINCT FROM n.tp AS BIGINT) AS nch
      |  FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
      |SELECT o_orderkey, change_type,
      |  CASE WHEN change_type = 'update' THEN nch ELSE CAST(0 AS BIGINT) END
      |    AS n_changed
      |FROM j WHERE change_type <> 'unchanged'
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val orders = Tables(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oldSnap = orders.filter(col("o_orderkey") % 10 =!= 1)
    val bucket3 = col("o_orderkey") % 10 === 3
    val newSnap = orders.filter(col("o_orderkey") % 10 =!= 2)
      .select(col("o_orderkey"),
        when(bucket3, lit("X")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(bucket3, col("o_totalprice") + lit(1.0)).otherwise(col("o_totalprice"))
          .as("o_totalprice"))
    graft.operators.Relational.snapshotDiff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** q87: most-common session journeys over the event stream
    * ([[graft.operators.Relational.sessionPaths]]) — q11's sessionize
    * semantics verbatim, the first 3 steps folded to a path string by
    * conditional aggregation (one non-null per rank — no collect_list
    * order hazard), counts partial-agg, top-20 by (count desc, path
    * asc); one user shuffle carries both windows.
    */
  val q87 = QueryDef(
    "q87_session_paths",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
      |  FROM events),
      |d AS (SELECT user_id, event_id, event_type, tms,
      |  CASE WHEN lag(tms) OVER w IS NULL
      |         OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
      |sx AS (SELECT user_id, event_id, event_type, tms,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d),
      |r AS (SELECT user_id, sid, event_type,
      |  row_number() OVER (PARTITION BY user_id, sid ORDER BY tms, event_id) AS rn
      |  FROM sx),
      |p AS (SELECT user_id, sid,
      |  concat_ws('>', max(CASE WHEN rn = 1 THEN event_type END),
      |                 max(CASE WHEN rn = 2 THEN event_type END),
      |                 max(CASE WHEN rn = 3 THEN event_type END)) AS path
      |  FROM r WHERE rn <= 3 GROUP BY 1, 2),
      |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY 1),
      |t AS (SELECT path, n_sessions,
      |  CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
      |  FROM c)
      |SELECT rank, path, n_sessions FROM t WHERE rank <= 20
      |ORDER BY rank""".stripMargin) { (s, dir) =>
    graft.operators.Relational.sessionPaths(Tables.events(s, dir),
        "user_id", unix_millis(col("ts")), col("event_id"), col("event_type"),
        gapMillis = 1800000L, pathLen = 3, topN = 20)
      .orderBy("rank")
  }

  private val DupWindowMs = 3600000L
  private val DupMaxPerKey = 1000

  /** q88: near-time duplicate charges over the event stream
    * ([[graft.operators.Relational.nearTimeDuplicates]]) — q82's
    * transactional-audit sibling: same user, same whole-unit amount,
    * within an hour. The (entity, units) equi-join bounds candidates to
    * per-key groups; the hot-key cap (mirrored in the oracle's HAVING)
    * drops systematic repeats whole; all comparisons exact integers and
    * the (ts, id) lexicographic order makes each pair appear exactly
    * once on both engines.
    */
  val q88 = QueryDef(
    "q88_double_charge",
    s"""WITH b AS (SELECT user_id AS entity,
       |  CAST(floor(value * 1.0 + 0.5) AS BIGINT) AS amount_units,
       |  epoch_ms(ts) AS tms, event_id
       |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
       |    AND ts IS NOT NULL AND event_id IS NOT NULL),
       |k AS (SELECT entity, amount_units FROM b GROUP BY 1, 2
       |  HAVING count(*) <= $DupMaxPerKey),
       |c AS (SELECT b.entity, b.amount_units, b.tms, b.event_id
       |  FROM b JOIN k USING (entity, amount_units))
       |SELECT a.entity, a.amount_units, a.event_id AS id_a, c2.event_id AS id_b,
       |  a.tms AS ts_a, c2.tms AS ts_b, c2.tms - a.tms AS gap_ms
       |FROM c a JOIN c c2 ON a.entity = c2.entity
       |  AND a.amount_units = c2.amount_units
       |  AND ((a.tms < c2.tms) OR (a.tms = c2.tms AND a.event_id < c2.event_id))
       |  AND c2.tms - a.tms <= $DupWindowMs
       |ORDER BY a.entity, id_a, id_b""".stripMargin) { (s, dir) =>
    graft.operators.Relational.nearTimeDuplicates(Tables.events(s, dir),
        "user_id", unix_millis(col("ts")), col("event_id"), col("value"),
        windowMillis = DupWindowMs, scale = 1L, maxPerKey = DupMaxPerKey)
      .orderBy("entity", "id_a", "id_b")
  }

  /** q90: incremental aggregate-state maintenance
    * ([[graft.operators.Relational.aggState]] /
    * [[graft.operators.Relational.mergeAggStates]]) — the batch-layer
    * primitive: the engine computes the state of two date SPLITS and
    * folds them, the oracle computes the full-table state directly, and
    * their equality IS the algebraic claim (every field a commutative
    * monoid over exact snapped units — merge(state(A), state(B)) ≡
    * state(A ∪ B) in any order). History never re-reads.
    */
  val q90 = QueryDef(
    "q90_incremental_agg",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS sum_units,
      |  CAST(min(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS min_units,
      |  CAST(max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS max_units
      |FROM orders WHERE o_totalprice IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val orders = Tables(s, dir, "orders")
    val cutoff = lit("1996-01-01").cast("timestamp")
    val hist = graft.operators.Relational.aggState(
      orders.filter(col("o_orderdate") < cutoff), Seq("o_orderpriority"),
      col("o_totalprice"))
    val delta = graft.operators.Relational.aggState(
      orders.filter(col("o_orderdate") >= cutoff), Seq("o_orderpriority"),
      col("o_totalprice"))
    graft.operators.Relational.mergeAggStates(hist, delta, Seq("o_orderpriority"))
      .orderBy("o_orderpriority")
  }

  private val HwPeriod = 4

  /** q93: Holt–Winters additive seasonal smoothing per user over the
    * event stream ([[graft.operators.Relational.holtWinters]], α = 0.5,
    * β = γ = 0.25 — all dyadic, so every recurrence is a fixed IEEE
    * double tree) — the oracle replays the fold with a recursive CTE
    * carrying level, trend AND the m-slot seasonal LIST (rebuilt by
    * slicing around the updated phase each step), the q77 determinism
    * contract extended to m + 2 coupled states.
    */
  val q93 = QueryDef(
    "q93_holt_winters", {
      val m = HwPeriod
      val A = "CAST(0.5 AS DOUBLE)"
      val B = "CAST(0.25 AS DOUBLE)"
      val B1 = "CAST(0.75 AS DOUBLE)"
      val G = "CAST(0.25 AS DOUBLE)"
      val G1 = "CAST(0.75 AS DOUBLE)"
      val X = "CAST(s.c AS DOUBLE)"
      val p0 = s"((s.rn - 1) % $m)"
      val sp = s"r.sl[$p0 + 1]"
      val lNew = s"($A * ($X - $sp) + $A * (r.l + r.b))"
      val bNew = s"($B * ($lNew - r.l) + $B1 * r.b)"
      val sVal = s"($G * ($X - $lNew) + $G1 * $sp)"
      val slNew = s"(r.sl[1:$p0] || [$sVal] || r.sl[$p0 + 2:$m])"
      val zeros = Seq.fill(m)("CAST(0.0 AS DOUBLE)").mkString("[", ", ", "]")
      s"""WITH RECURSIVE s AS (
         |  SELECT user_id AS entity, epoch_ms(ts) AS ord, event_id AS tie,
         |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
         |         row_number() OVER (PARTITION BY user_id
         |           ORDER BY epoch_ms(ts), event_id) AS rn
         |  FROM events
         |  WHERE value IS NOT NULL AND ts IS NOT NULL
         |    AND user_id IS NOT NULL AND event_id IS NOT NULL),
         |r AS (
         |  SELECT entity, ord, tie, c, rn,
         |         CAST(c AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b,
         |         $zeros AS sl
         |  FROM s WHERE rn = 1
         |  UNION ALL
         |  SELECT s.entity, s.ord, s.tie, s.c, s.rn,
         |         $lNew, $bNew, $slNew
         |  FROM r JOIN s ON s.entity = r.entity AND s.rn = r.rn + 1)
         |SELECT entity, ord, tie, c AS value_units, l AS level, b AS trend,
         |  sl[((rn - 1) % $m) + 1] AS seasonal,
         |  l + b + sl[(rn % $m) + 1] AS forecast1
         |FROM r ORDER BY entity, ord, tie""".stripMargin
    }) { (s, dir) =>
    graft.operators.Relational.holtWinters(Tables.events(s, dir),
        entityCol = col("user_id"), orderCol = unix_millis(col("ts")),
        tieCol = col("event_id"), valueCol = col("value"),
        alpha = 0.5, beta = 0.25, gamma = 0.25, period = HwPeriod)
      .orderBy("entity", "ord", "tie")
  }

  /** q95: q12's as-of enrichment through the NATIVE Catalyst operator —
    * [[graft.plans.GraftAsofJoin]] logical node planned to
    * `AsofMergeJoinExec` (SMJ-style co-partitioned merge, no union+window
    * machinery). Same oracle as q12: the two must agree row for row.
    */
  val q95 = QueryDef(
    "q95_asof_native",
    """WITH p AS (SELECT event_id AS p_event_id, user_id, epoch_ms(ts) AS p_ms
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_event_id, user_id, epoch_ms(ts) AS c_ms
      |      FROM events WHERE event_type = 'click'),
      |j AS (SELECT p_event_id, c_event_id, row_number() OVER (
      |        PARTITION BY p_event_id ORDER BY c_ms DESC, c_event_id DESC) AS rn
      |      FROM p JOIN c ON p.user_id = c.user_id AND c_ms <= p_ms)
      |SELECT p_event_id, CAST(c_event_id AS BIGINT) AS click_event_id
      |FROM j WHERE rn = 1 ORDER BY p_event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        unix_millis(col("ts")).as("p_ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id").as("c_user"),
        unix_millis(col("ts")).as("c_ms"))
    graft.plans.GraftAsofJoin.asofJoinMerge(p, c,
        leftKeys = Seq("p_user"), rightKeys = Seq("c_user"),
        leftTs = "p_ms", rightTs = "c_ms", tieBreak = Seq("c_event_id"))
      .select(col("p_event_id"), col("c_event_id").as("click_event_id"))
      .orderBy("p_event_id")
  }

  /** q126: the keyed time-correlation join through the NATIVE band
    * operator ([[graft.plans.GraftBandJoin]] →
    * BandMergeJoinExec/BroadcastBandJoinExec): every error within ±1 h
    * of a purchase BY THE SAME USER. q25 is the keyless version
    * (binned equi-join composition, the right shape when no key
    * exists); with a key the native exec does strictly better — one
    * hash exchange per side on the key, no ≤2× bin explode, a
    * ring-buffer merge whose state is the band occupancy. The oracle
    * states the same semantics as a raw inequality join (fine for
    * DuckDB at sf0.01; the merge is the scale-safe side).
    */
  val q126 = QueryDef(
    "q126_band_native",
    """WITH p AS (SELECT event_id AS p_event_id, user_id, epoch_ms(ts) AS p_ms
      |           FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT event_id AS e_event_id, user_id, epoch_ms(ts) AS e_ms
      |      FROM events WHERE event_type = 'error')
      |SELECT p_event_id, e_event_id, CAST(e_ms - p_ms AS BIGINT) AS delta_ms
      |FROM p JOIN e ON p.user_id = e.user_id
      |  AND e_ms BETWEEN p_ms - 3600000 AND p_ms + 3600000
      |ORDER BY p_event_id, e_event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        unix_millis(col("ts")).as("p_ms"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_event_id"), col("user_id").as("e_user"),
        unix_millis(col("ts")).as("e_ms"))
    graft.plans.GraftBandJoin.bandJoinMerge(p, e,
        leftKeys = Seq("p_user"), rightKeys = Seq("e_user"),
        leftTs = "p_ms", rightTs = "e_ms",
        lower = -3600000L, upper = 3600000L)
      .select(col("p_event_id"), col("e_event_id"),
        (col("e_ms") - col("p_ms")).as("delta_ms"))
      .orderBy("p_event_id", "e_event_id")
  }

  /** q97: interval-overlap join between each user's CLICK sessions and
    * VIEW sessions ("was the user browsing while clicking") through the
    * NATIVE [[graft.plans.GraftIntervalJoin]] exec (round 12, the third
    * Catalyst rung): one hash exchange per side on the user key, sorted
    * merge with an active-interval set, each pair emitted exactly once —
    * no grid-cell explode, no post-join distinct, and the broadcast
    * variant picks itself when one side is dimension-sized. The grid
    * composition ([[graft.operators.Relational.intervalOverlapJoin]])
    * remains for the keyless case. The oracle states the same semantics
    * as a raw inequality join (fine for DuckDB at sf0.01; the merge is
    * the scale-safe side).
    */
  val q97 = QueryDef(
    "q97_interval_overlap",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms FROM events),
      |am AS (SELECT user_id, event_id, tms,
      |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 86400000
      |       THEN 1 ELSE 0 END AS new_s
      |  FROM e WHERE event_type = 'click'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
      |a1 AS (SELECT user_id, tms, sum(new_s) OVER
      |  (PARTITION BY user_id ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM am),
      |a AS (SELECT user_id, CAST(sid AS BIGINT) AS sid,
      |       min(tms) AS s, max(tms) AS e FROM a1 GROUP BY 1, 2),
      |bm AS (SELECT user_id, event_id, tms,
      |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 86400000
      |       THEN 1 ELSE 0 END AS new_s
      |  FROM e WHERE event_type = 'view'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
      |b1 AS (SELECT user_id, tms, sum(new_s) OVER
      |  (PARTITION BY user_id ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM bm),
      |b AS (SELECT user_id, CAST(sid AS BIGINT) AS sid,
      |       min(tms) AS s, max(tms) AS e FROM b1 GROUP BY 1, 2)
      |SELECT a.user_id AS user_id, a.sid AS a_sid, b.sid AS b_sid,
      |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_ms
      |FROM a JOIN b ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
      |ORDER BY user_id, a_sid, b_sid""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), unix_millis(col("ts")).as("tms"))
    def sessions(tpe: String, p: String) =
      graft.operators.Relational.sessionize(
          e.filter(col("event_type") === tpe), "user_id", col("tms"),
          col("event_id"), gapMillis = 86400000L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(min("tms").as(s"${p}_s"), max("tms").as(s"${p}_e"))
        .select(col("user_id").as(s"${p}_user"), col("session_id").as(s"${p}_sid"),
          col(s"${p}_s"), col(s"${p}_e"))
    graft.plans.GraftIntervalJoin.intervalJoinMerge(
        sessions("click", "a"), sessions("view", "b"),
        Seq("a_user"), Seq("b_user"), "a_s", "a_e", "b_s", "b_e")
      .select(col("a_user").as("user_id"), col("a_sid").as("a_sid"),
        col("b_sid").as("b_sid"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("overlap_ms"))
      .orderBy("user_id", "a_sid", "b_sid")
  }

  /** q98: FORWARD as-of — each purchase matched to the EARLIEST click
    * at-or-after it (follow-on behavior enrichment), ts ties by MIN
    * click id. Runs through [[graft.plans.GraftAsofJoin.asofJoinForward]]
    * (the negation composition over the native merge exec).
    */
  val q98 = QueryDef(
    "q98_asof_forward",
    """WITH p AS (SELECT event_id AS p_event_id, user_id, epoch_ms(ts) AS p_ms
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_event_id, user_id, epoch_ms(ts) AS c_ms
      |      FROM events WHERE event_type = 'click'),
      |j AS (SELECT p_event_id, c_event_id, row_number() OVER (
      |        PARTITION BY p_event_id ORDER BY c_ms ASC, c_event_id ASC) AS rn
      |      FROM p JOIN c ON p.user_id = c.user_id AND c_ms >= p_ms)
      |SELECT p_event_id, CAST(c_event_id AS BIGINT) AS click_event_id
      |FROM j WHERE rn = 1 ORDER BY p_event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        unix_millis(col("ts")).as("p_ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id").as("c_user"),
        unix_millis(col("ts")).as("c_ms"))
    graft.plans.GraftAsofJoin.asofJoinForward(p, c,
        leftKeys = Seq("p_user"), rightKeys = Seq("c_user"),
        leftTs = "p_ms", rightTs = "c_ms", tieBreak = Seq("c_event_id"))
      .select(col("p_event_id"), col("c_event_id").as("click_event_id"))
      .orderBy("p_event_id")
  }

  /** q99: NEAREST as-of — each purchase to its temporally closest click
    * either side, equal distance preferring the backward (at-or-before)
    * match, per-side ties by the side's own rule (backward max id,
    * forward min id) — the oracle's ORDER BY states exactly that
    * preference chain.
    */
  val q99 = QueryDef(
    "q99_asof_nearest",
    """WITH p AS (SELECT event_id AS p_event_id, user_id, epoch_ms(ts) AS p_ms
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_event_id, user_id, epoch_ms(ts) AS c_ms
      |      FROM events WHERE event_type = 'click'),
      |j AS (SELECT p_event_id, c_event_id, row_number() OVER (
      |        PARTITION BY p_event_id ORDER BY abs(c_ms - p_ms) ASC,
      |          CASE WHEN c_ms <= p_ms THEN 0 ELSE 1 END ASC,
      |          CASE WHEN c_ms <= p_ms THEN -c_event_id ELSE c_event_id END ASC) AS rn
      |      FROM p JOIN c ON p.user_id = c.user_id)
      |SELECT p_event_id, CAST(c_event_id AS BIGINT) AS click_event_id
      |FROM j WHERE rn = 1 ORDER BY p_event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        unix_millis(col("ts")).as("p_ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id").as("c_user"),
        unix_millis(col("ts")).as("c_ms"))
    graft.plans.GraftAsofJoin.asofJoinNearest(p, c,
        leftKeys = Seq("p_user"), rightKeys = Seq("c_user"),
        leftTs = "p_ms", rightTs = "c_ms", leftId = "p_event_id",
        tieBreak = Seq("c_event_id"))
      .select(col("p_event_id"), col("c_event_id").as("click_event_id"))
      .orderBy("p_event_id")
  }

  /** q100: per-user TIME-WEIGHTED average of `value` (TWAP) — each
    * reading holds (LOCF) until the next one, weight = hold duration,
    * normalized over the user's observed span; the last reading and
    * single-reading users carry no duration (the latter drop — zero
    * denominator). One shuffle: the lead window and the groupBy share
    * the user_id partitioning, so the aggregation reuses the window's
    * exchange. The plain mean treats a 1-second spike and a week-long
    * plateau identically; TWAP is the integral the monitoring/pricing
    * reading of "average level" means. The numerator snaps value to
    * exact centi-units BEFORE summing (the q94 discipline): long sums
    * are order-independent, so the result is bit-identical across
    * engines and partitionings where a double sum would drift with
    * aggregation order (bound: 56k x 2.6e9 ms x 100 rows/user ~ 1.5e16
    * << 2^63).
    */
  val q100 = QueryDef(
    "q100_twap",
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms, value FROM events
      |           WHERE ts IS NOT NULL AND event_id IS NOT NULL),
      |w AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v100, tms,
      |        lead(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) AS nxt
      |      FROM e),
      |a AS (SELECT user_id, sum(v100 * (nxt - tms)) AS num,
      |        max(tms) - min(tms) AS den
      |      FROM w GROUP BY user_id)
      |SELECT user_id, CAST(num AS DOUBLE) / (100.0 * den) AS twap
      |FROM a WHERE den > 0
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    // null ts/event_id rows are dropped on BOTH sides: the lead() window
    // orders by (tms, event_id), and Spark sorts nulls first while DuckDB
    // sorts them last, so a null in either sort column could silently
    // reorder ties and diverge nxt cross-engine (the q101 discipline)
    val e = Tables.events(s, dir)
      .filter(col("ts").isNotNull && col("event_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("tms"), col("value"))
    val w = Window.partitionBy("user_id").orderBy(col("tms"), col("event_id"))
    e.withColumn("nxt", lead("tms", 1).over(w))
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long") * (col("nxt") - col("tms"))).as("num"),
        (max("tms") - min("tms")).as("den"))
      .filter(col("den") > 0)
      .select(col("user_id"),
        (col("num").cast("double") / (col("den") * lit(100.0))).as("twap"))
      .orderBy("user_id")
  }

  /** q101: q36's hourly grid with missing buckets LINEARLY interpolated
    * between the bracketing observations (pandas interpolate) instead of
    * carried forward — [[graft.operators.Relational.interpolate]]. The
    * value expression shape is stated identically in both engines
    * (per-row IEEE ops, no aggregation-order dependence), mirror-rounded
    * like every float surface.
    */
  val q101 = QueryDef(
    "q101_interpolate",
    s"""WITH e AS (SELECT user_id,
       |             CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS b,
       |             value, ts, event_id FROM events),
       |o AS (SELECT user_id, b, value AS v FROM (
       |        SELECT *, row_number() OVER (PARTITION BY user_id, b
       |          ORDER BY ts DESC, event_id DESC) AS rn FROM e)
       |      WHERE rn = 1),
       |sp AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM o GROUP BY 1),
       |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS b FROM sp),
       |f AS (SELECT g.user_id, g.b, o.v FROM g LEFT JOIN o USING (user_id, b)),
       |x AS (SELECT user_id, b, v,
       |  last_value(v IGNORE NULLS) OVER wp AS pv,
       |  last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER wp AS pb,
       |  first_value(v IGNORE NULLS) OVER wn AS nv,
       |  first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER wn AS nb
       |  FROM f WINDOW
       |    wp AS (PARTITION BY user_id ORDER BY b ROWS UNBOUNDED PRECEDING),
       |    wn AS (PARTITION BY user_id ORDER BY b
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT user_id, b AS bucket,
       |  ${mr("CASE WHEN v IS NOT NULL THEN v ELSE pv + (nv - pv) * (b - pb) / (nb - pb) END", 4)} AS value,
       |  (v IS NOT NULL) AS observed
       |FROM x ORDER BY user_id, bucket""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    graft.operators.Relational.interpolate(ev, "user_id",
        bucket = floor(unix_millis(col("ts")) / 3600000.0).cast("long"),
        value = col("value"),
        tie = struct(col("ts"), col("event_id")))
      .withColumn("value", graft.functions.Rounding.mirrorRound(col("value"), 4))
      .orderBy("user_id", "bucket")
  }


  val queries: Seq[QueryDef] = Seq(q36, q59, q69, q70, q71, q76, q77, q79, q87, q88, q90, q93, q95, q97, q98, q99, q100, q101, q126)
}
