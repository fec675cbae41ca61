package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.sources.Tables

/** Relational query suite (Q1–Q15) over the TPC-H-ish star schema.
  *
  * These exercise the engine surface the pipeline operators build on:
  * scan → filter → project with pushdown, hash aggregation, broadcast vs
  * shuffle joins, semi/anti joins, window functions, rollup/cube, set ops,
  * event-time windows, sessionization and an as-of join composed from
  * Spark primitives.
  *
  * Scale notes (100 TB): dimension tables (region/nation/supplier/part) are
  * explicitly `broadcast()`; fact-fact joins shuffle only after projection;
  * every aggregate is partial-aggregation friendly (sum/count/min/max).
  */
object Relational {

  private val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val q01 = QueryDef(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity),2) AS sum_qty,
      |  round(sum(l_extendedprice),2) AS sum_base_price,
      |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      |  round(avg(l_quantity),4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(revenue), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q02 = QueryDef(
    "q02_revenue_filter",
    """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
  }

  val q03 = QueryDef(
    "q03_top_orders",
    """SELECT l_orderkey, o_orderdate,
      |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cust = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(round(sum(revenue), 2).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  val q04 = QueryDef(
    "q04_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val hits = Tables(s, dir, "lineitem")
      .filter(col("l_quantity") > 45).select("l_orderkey")
    Tables(s, dir, "orders")
      .join(hits, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q05 = QueryDef(
    "q05_local_supplier",
    """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val region = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables(s, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    val supplier = Tables(s, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(revenue), 2).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val q06 = QueryDef(
    "q06_agg_rollup",
    """SELECT coalesce(l_returnflag,'ALL') AS flag, coalesce(l_linestatus,'ALL') AS status,
      |  count(*) AS n, round(sum(l_quantity),2) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy("flag", "status")
  }

  val q07 = QueryDef(
    "q07_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    graft.operators.Relational.topKPerGroup(
      Tables(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(desc("o_totalprice"), col("o_orderkey")), k = 3)
      .orderBy("o_custkey", "rn")
  }

  val q08 = QueryDef(
    "q08_topk_per_group",
    """SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    CAST(dense_rank() OVER (PARTITION BY p_brand
      |      ORDER BY p_retailprice DESC) AS BIGINT) AS rnk
      |  FROM part) t
      |WHERE rnk <= 2 ORDER BY p_brand, p_retailprice DESC, p_partkey""".stripMargin) { (s, dir) =>
    graft.operators.Relational.topKPerGroup(
      Tables(s, dir, "part").select("p_brand", "p_partkey", "p_retailprice"),
      Seq("p_brand"), Seq(desc("p_retailprice")), k = 2, rankName = "rnk", dense = true)
      .orderBy(col("p_brand"), desc("p_retailprice"), col("p_partkey"))
  }

  val q09 = QueryDef(
    "q09_distinct_agg",
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_part, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_suppkey").as("n_supp"),
        countDistinct("l_partkey").as("n_part"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val q10 = QueryDef(
    "q10_events_hourly",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  count(*) AS n, round(sum(value),2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")
  }

  val q11 = QueryDef(
    "q11_sessionize",
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
      |d AS (SELECT user_id,
      |  CASE WHEN lag(tms) OVER w IS NULL
      |         OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id))
      |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tms"))
    graft.operators.Relational
      .sessionize(e, "user_id", col("tms"), col("event_id"), gapMillis = 1800000L)
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  // AS-OF join: each purchase matched to the most recent click at-or-before
  // it by the same user (ties by max click id). The Spark side is the
  // union + per-user window plan (one shuffle, no pair fan-out, no id
  // bounds); the oracle states the same semantics as a join + row_number
  // argmax — DuckDB at sf0.01 doesn't need the scale-safe plan.
  val q12 = QueryDef(
    "q12_asof_join",
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
    graft.operators.Relational
      .asofJoin(p, c, leftKey = "p_user", rightKey = "c_user",
        leftTs = "p_ms", rightTs = "c_ms", leftId = "p_event_id", rightId = "c_event_id")
      .withColumnRenamed("asof_c_event_id", "click_event_id")
      .orderBy("p_event_id")
  }

  val q13 = QueryDef(
    "q13_cube",
    """SELECT coalesce(lang,'ALL') AS lang_g, coalesce(source,'ALL') AS source_g,
      |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY CUBE(lang, source) ORDER BY lang_g, source_g""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .cube("lang", "source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang_g"),
        coalesce(col("source"), lit("ALL")).as("source_g"),
        col("n"), col("chars"))
      .orderBy("lang_g", "source_g")
  }

  val q14 = QueryDef(
    "q14_set_ops",
    """SELECT DISTINCT l_partkey AS partkey FROM lineitem
      |INTERSECT
      |SELECT p_partkey AS partkey FROM part WHERE p_size > 25
      |ORDER BY partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem").select(col("l_partkey").as("partkey")).distinct()
      .intersect(
        Tables(s, dir, "part").filter(col("p_size") > 25).select(col("p_partkey").as("partkey")))
      .orderBy("partkey")
  }

  val q15 = QueryDef(
    "q15_anti_join",
    """SELECT c_nationkey, count(*) AS n_cust FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    val big = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000).select("o_custkey")
    Tables(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("c_nationkey")
  }

  // Discrete percentiles (k-th smallest, k = ceil(p*n)): element selection
  // rather than interpolation, so both engines return the identical stored
  // value — engine-specific interpolation ulps would otherwise flip a
  // rounding boundary. At very high cardinality swap for approx_percentile
  // with a bounded error.
  private val q16Ps = Seq("50" -> 0.5, "90" -> 0.9, "99" -> 0.99)

  val q16 = QueryDef(
    "q16_percentiles",
    s"""WITH r AS (SELECT l_returnflag, l_extendedprice,
       |  row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
       |  count(*) OVER (PARTITION BY l_returnflag) AS n FROM lineitem)
       |SELECT l_returnflag,
       |  ${q16Ps.map { case (l, p) =>
             s"max(CASE WHEN rn = CAST(ceil($p * n) AS BIGINT) THEN l_extendedprice END) AS p$l"
           }.mkString(",\n  ")}
       |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    // NOT the oracle's window plan: partitionBy(l_returnflag) would cap
    // the sort at 3-way parallelism forever. The operator range-partitions
    // on (group, value) and selects ranks via two metadata passes — same
    // exact answer, parallel at any scale (see Relational.exactPercentiles).
    graft.operators.Relational.exactPercentiles(
        Tables(s, dir, "lineitem"), "l_returnflag", "l_extendedprice", q16Ps)
      .orderBy("l_returnflag")
  }

  val q17 = QueryDef(
    "q17_moving_avg",
    s"""SELECT o_custkey, o_orderkey,
       |  ${graft.functions.Rounding.sqlMirrorRound(
             """avg(o_totalprice) OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""", 2)} AS ma3
       |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    // frame-bounded window aggregate: per customer, 3-order moving average
    // in order-date order (frames evaluate in frame order on both engines)
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-2, Window.currentRow)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        graft.functions.Rounding.mirrorRound(avg("o_totalprice").over(w), 2).as("ma3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q18: arbitrary per-group logic via `mapGroups` — the typed analogue of
    * the reference's "any code over a group of samples". Each user's events
    * are sorted in memory (groups are small; the shuffle is on user_id) and
    * a custom gap scan runs imperatively.
    */
  val q18 = QueryDef(
    "q18_group_apply",
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_id FROM events),
      |d AS (SELECT user_id, t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
      |      FROM e)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_ms
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("t"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (user, it) =>
        val ts = it.map(e => (e._2, e._3)).toArray.sortBy(identity)
        var maxGap = 0L
        var i = 1
        while (i < ts.length) {
          maxGap = math.max(maxGap, ts(i)._1 - ts(i - 1)._1)
          i += 1
        }
        (user, ts.length.toLong, maxGap)
      }
      .toDF("user_id", "n_events", "max_gap_ms")
      .orderBy("user_id")
  }

  /** q24: sequential conversion funnel view → click → purchase
    * ([[graft.operators.Relational.funnel]]). The oracle expresses the
    * same greedy earliest-chain as chained mins: t1 = earliest view,
    * t2 = earliest click strictly after t1, t3 = earliest purchase
    * strictly after t2 — provably the greedy match.
    */
  val q24 = QueryDef(
    "q24_funnel",
    """WITH e AS (SELECT user_id AS e, epoch_ms(ts) AS t, event_type AS s FROM events),
      |u1 AS (SELECT e, min(t) AS t1 FROM e WHERE s = 'view' GROUP BY e),
      |u2 AS (SELECT e.e, min(t) AS t2 FROM e JOIN u1 USING (e)
      |       WHERE s = 'click' AND t > t1 GROUP BY e.e),
      |u3 AS (SELECT e.e, min(t) AS t3 FROM e JOIN u2 USING (e)
      |       WHERE s = 'purchase' AND t > t2 GROUP BY e.e)
      |SELECT u.e AS user_id,
      |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached,
      |  t1, t2, t3
      |FROM (SELECT DISTINCT e FROM e) u
      |LEFT JOIN u1 USING (e) LEFT JOIN u2 USING (e) LEFT JOIN u3 USING (e)
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    graft.operators.Relational.funnel(Tables.events(s, dir), "user_id", unix_millis(col("ts")),
        "event_type", Seq("view", "click", "purchase"))
      .orderBy("user_id")
  }

  /** q25: time-correlation range join — errors within ±5 s of any
    * purchase ([[graft.operators.Relational.rangeJoin]]: binned hash
    * equi-join, never the nested-loop plan a raw BETWEEN join gets).
    */
  val q25 = QueryDef(
    "q25_range_join",
    """WITH e AS (SELECT event_id, epoch_ms(ts) AS t, event_type AS s FROM events),
      |p AS (SELECT event_id AS purchase_id, t AS pt FROM e WHERE s = 'purchase'),
      |c AS (SELECT event_id AS error_id, t AS et FROM e WHERE s = 'error')
      |SELECT purchase_id, error_id, CAST(et - pt AS BIGINT) AS delta_ms
      |FROM p JOIN c ON et BETWEEN pt - 5000 AND pt + 5000
      |ORDER BY purchase_id, error_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), unix_millis(col("ts")).as("pt"))
    val c = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), unix_millis(col("ts")).as("et"))
    graft.operators.Relational.rangeJoin(p, c, col("pt"), col("et"), -5000, 5000)
      .select(col("purchase_id"), col("error_id"), (col("et") - col("pt")).as("delta_ms"))
      .orderBy("purchase_id", "error_id")
  }

  /** q26: weekly cohort retention over events
    * ([[graft.operators.Relational.retention]]).
    */
  val q26 = QueryDef(
    "q26_retention",
    """WITH e AS (SELECT user_id,
      |    CAST(floor(epoch_ms(ts) / 604800000.0) AS BIGINT) AS p FROM events),
      |f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY user_id)
      |SELECT cohort, p - cohort AS offset,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.operators.Relational.retention(Tables.events(s, dir), "user_id",
        unix_millis(col("ts")), periodMs = 604800000L)
      .orderBy("cohort", "offset")
  }

  private val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q33: PIVOT — per-user wide metrics table (avg value per event type).
    * The pivot VALUES are passed explicitly: at scale the implicit form
    * first runs a collect-distinct over the pivot column (an extra
    * corpus pass + a driver-sized value list); with explicit values the
    * whole pivot is ONE partial-aggregated groupBy, each cell a
    * conditional aggregate — exactly the CASE WHEN plan the oracle
    * spells out. Missing (user, type) cells are null on both engines.
    */
  val q33 = QueryDef(
    "q33_pivot", {
      val cells = PivotTypes.map(t =>
        s"${mr(s"avg(CASE WHEN event_type = '$t' THEN value END)", 4)} AS ${t}_avg")
      s"""SELECT user_id, ${cells.mkString(", ")}
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    }) { (s, dir) =>
    val p = Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", PivotTypes)
      .agg(avg(col("value")))
    PivotTypes.foldLeft(p) { (df, t) =>
        df.withColumn(s"${t}_avg",
          graft.functions.Rounding.mirrorRound(col(t), 4)).drop(t)
      }
      .orderBy("user_id")
  }

  /** q34: UNPIVOT (melt) — the inverse reshape of q33: a wide per-item
    * metrics row unfolds to long (metric, value) rows. Spark's native
    * `unpivot` is a narrow one-pass expansion (no shuffle, no UDF) that
    * KEEPS null cells (verified on 4.1.2), so null rows are dropped with
    * an EXPLICIT filter matching the oracle's `IS NOT NULL` — never rely
    * on an engine's implicit null contract in a mirrored query.
    */
  val q34 = QueryDef(
    "q34_unpivot", {
      val cols = Seq("p_retailprice" -> "retailprice", "p_size" -> "size")
      cols.map { case (c, m) =>
        s"""SELECT p_partkey, '$m' AS metric, CAST($c AS DOUBLE) AS value
           |FROM part WHERE $c IS NOT NULL""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY p_partkey, metric")
    }) { (s, dir) =>
    Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retailprice"), col("size")),
        "metric", "value")
      .filter(col("value").isNotNull)
      .orderBy("p_partkey", "metric")
  }

  /** q35: semi-structured JSON extraction — event properties travel as a
    * JSON string column; `from_json` parses each row ONCE into a typed
    * struct (schema declared, so Catalyst prunes and codegens the
    * access) — the scale rule vs per-field `get_json_object`, which
    * re-parses the document for every field extracted. Null-safe: rows
    * whose JSON lacks the field aggregate as null (skipped by avg/max,
    * counted by n_events).
    */
  val q35 = QueryDef(
    "q35_json_props",
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       |  ${mr("avg(CAST(json_extract_string(props, '$.k') AS BIGINT))", 4)} AS avg_k,
       |  CAST(max(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS max_k
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
      .getField("k")
    Tables.events(s, dir)
      .select(col("event_type"), k.as("_k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("_k").as("sum_k"),
        graft.functions.Rounding.mirrorRound(avg("_k"), 4).as("avg_k"),
        max("_k").as("max_k"))
      .orderBy("event_type")
  }

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

  /** Shared ANSI SQL text run VERBATIM by both engines — these two
    * queries exercise the `spark.sql` entrypoint itself (the north-star
    * API surface next to the DataFrame DSL): the engines' dialects agree
    * on the full text, so the oracle IS the Spark query string.
    */
  private val GroupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  private val CorrelatedSql =
    """SELECT n.n_name,
      |  CAST((SELECT count(*) FROM supplier s
      |        WHERE s.s_nationkey = n.n_nationkey) AS BIGINT) AS n_suppliers
      |FROM nation n ORDER BY n.n_name""".stripMargin

  /** q37: GROUPING SETS — the irregular multi-level aggregate between
    * ROLLUP (q06) and CUBE (q13), through `spark.sql`. One shuffle; each
    * grouping set is a partial-agg expansion, not a re-scan.
    */
  val q37 = QueryDef("q37_grouping_sets", GroupingSetsSql) { (s, dir) =>
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(GroupingSetsSql)
  }

  /** q38: correlated scalar subquery — Catalyst DECORRELATES it into an
    * aggregate + left join (verify with explain: no per-row subquery
    * execution exists in the plan), the transformation that makes
    * naively-written analyst SQL scale.
    */
  val q38 = QueryDef("q38_correlated_subquery", CorrelatedSql) { (s, dir) =>
    Tables(s, dir, "nation").createOrReplaceTempView("nation")
    Tables(s, dir, "supplier").createOrReplaceTempView("supplier")
    s.sql(CorrelatedSql)
  }

  private val NtileSql =
    """SELECT c_nationkey, c_custkey,
      |  CAST(ntile(4) OVER (PARTITION BY c_nationkey
      |                      ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
      |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin

  /** q39: NTILE bucketing — equal-frequency quartiles per group (the
    * per-cohort banding step of feature pipelines), verbatim-shared SQL
    * (deterministic under the total (acctbal, custkey) order — ntile
    * without a tie-broken ORDER BY is engine-dependent). Per-group
    * windows, parallel across the nation key.
    */
  val q39 = QueryDef("q39_ntile", NtileSql) { (s, dir) =>
    Tables(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(NtileSql)
  }

  /** q40: CDC log compaction — the latest event per user
    * ([[graft.operators.Relational.latestByKey]]: a `max_by` partial
    * aggregation, so the shuffle carries one candidate row per key per
    * partition, never the full change log the oracle's window plan
    * ships). Order is (ts, event_id) — event_id breaks timestamp ties
    * deterministically.
    */
  val q40 = QueryDef(
    "q40_latest_by_key",
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_id, event_type, value
      |           FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY t DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, t AS last_ts, event_id AS last_event_id,
      |  event_type AS last_type, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val t = unix_millis(col("ts"))
    graft.operators.Relational.latestByKey(Tables.events(s, dir), "user_id",
        orderCols = Seq(t, col("event_id")),
        payloadCols = Seq(t.as("last_ts"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value")))
      .orderBy("user_id")
  }

  // q41's basket cap — deliberately BINDING at every test sf (docs with
  // 29–31 distinct tokens are dropped whole; the per-doc distinct-token
  // range is 6–31, median 25), so the oracle proves the capped path
  private val CoocMaxBasket = 28

  /** q41: term co-occurrence matrix over documents
    * ([[graft.operators.Relational.cooccurrence]]) — entities are docs,
    * items their distinct tokens: distinct baskets by partial agg, the
    * hot-basket cap mirrored in the oracle (a doc touching the whole
    * vocabulary contributes |V|² pairs and no signal), pair counts
    * partial-agg down to at most |V|² rows.
    */
  val q41 = QueryDef(
    "q41_cooccurrence",
    s"""WITH b AS (SELECT DISTINCT doc_id AS e, unnest(string_split(text, ' ')) AS i
       |           FROM documents),
       |k AS (SELECT e FROM b GROUP BY e HAVING count(*) <= $CoocMaxBasket),
       |kb AS (SELECT b.e, b.i FROM b JOIN k USING (e))
       |SELECT x.i AS item_a, y.i AS item_b, CAST(count(*) AS BIGINT) AS n_entities
       |FROM kb x JOIN kb y ON x.e = y.e AND x.i < y.i
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    graft.operators.Relational.cooccurrence(toks, "doc_id", "token",
        maxBasket = CoocMaxBasket)
      .orderBy("item_a", "item_b")
  }

  /** q42: fact-fact join THROUGH bucketed tables ([[graft.sources
    * .Sinks.bucketed]]) — the co-located-join path in the VERIFIED
    * lane, not just the plan spec: both sides land bucketed on the
    * join key (the write-once shuffle), the join reads them back from
    * the catalog, and the oracle computes the same result from the raw
    * parquet — bucketing must change the PLAN (zero Exchange of either
    * side, spec-asserted in SinksSuite), never the ANSWER. At sf0.1
    * the write cost is billed to this query in the bench — the
    * pay-at-ingest half of the amortization story.
    */
  val q42 = QueryDef(
    "q42_bucketed_join",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      |  round(sum(l_extendedprice), 2) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.sources.Sinks.bucketed(
      Tables(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
      "bq42_orders", "o_orderkey", 8, sortCols = Seq("o_orderkey"))
    graft.sources.Sinks.bucketed(
      Tables(s, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
      "bq42_lineitem", "l_orderkey", 8, sortCols = Seq("l_orderkey"))
    s.table("bq42_orders")
      .join(s.table("bq42_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  // q43's 3 unrolled PageRank iterations as CTE pairs (contribution join
  // + rank refresh) — generated, not hand-copied, so the oracle and the
  // iteration count can never drift
  private def prIterSql(k: Int): String = {
    val prev = if (k == 1) "p0" else s"p${k - 1}"
    s"""c$k AS (SELECT e.dst AS node, sum(p.pr / d.deg) AS inflow
       |  FROM ed e JOIN $prev p ON p.node = e.src JOIN dg d ON d.src = e.src
       |  GROUP BY e.dst),
       |p$k AS (SELECT no.node, (1 - 0.85) / nn.n + 0.85 * coalesce(c.inflow, 0) AS pr
       |  FROM no CROSS JOIN nn LEFT JOIN c$k c ON c.node = no.node)""".stripMargin
  }

  /** q43: PageRank over the q41 term co-occurrence graph
    * ([[graft.operators.Graph.pageRank]]) — iterative graph analytics
    * in the VERIFIED lane: 3 fixed iterations, damping 0.85, the
    * oracle unrolls the same contribution-join + rank-refresh rounds
    * as CTEs. Damping constants evaluate IN-ENGINE on both sides
    * (`1 - 0.85` as expressions), so the doubles are bit-identical;
    * inflow sums are ≤|V| short double sums, exact at 6 dp.
    */
  val q43 = QueryDef(
    "q43_pagerank",
    s"""WITH b AS (SELECT DISTINCT doc_id AS e, unnest(string_split(text, ' ')) AS i
       |           FROM documents),
       |k AS (SELECT e FROM b GROUP BY e HAVING count(*) <= $CoocMaxBasket),
       |kb AS (SELECT b.e, b.i FROM b JOIN k USING (e)),
       |pe AS (SELECT x.i AS pa, y.i AS pb FROM kb x JOIN kb y
       |       ON x.e = y.e AND x.i < y.i GROUP BY 1, 2),
       |ed AS (SELECT pa AS src, pb AS dst FROM pe
       |       UNION ALL SELECT pb, pa FROM pe),
       |no AS (SELECT DISTINCT src AS node FROM ed),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM no),
       |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
       |p0 AS (SELECT node, 1.0 / nn.n AS pr FROM no CROSS JOIN nn),
       |${(1 to 3).map(prIterSql).mkString(",\n")}
       |SELECT node, ${mr("pr", 6)} AS pr FROM p3 ORDER BY node""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    val pairs = graft.operators.Relational.cooccurrence(toks, "doc_id", "token",
      maxBasket = CoocMaxBasket)
    val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"))
      .union(pairs.select(col("item_b").as("src"), col("item_a").as("dst")))
    graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3, damping = 0.85)
      .select(col("node"), Rounding.mirrorRound(col("pr"), 6).as("pr"))
      .orderBy("node")
  }

  private val OutlierZ = 3.0

  /** q44: per-group z-score anomaly detection over the event stream
    * ([[graft.operators.Relational.zscoreOutliers]]) — values snap to
    * integer cents first, so the group moment sums are EXACT in any
    * accumulation order and the |z| >= 3 row set is bit-reproducible
    * across engines (a float-summed mean flips boundary rows). Stats
    * are a |groups|-row partial agg broadcast back; no window, no
    * per-group sort — parallelism never caps at |groups|.
    */
  val q44 = QueryDef(
    "q44_outliers",
    s"""WITH e AS (SELECT event_type, event_id, user_id, value,
       |             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
       |           FROM events),
       |s AS (SELECT event_type, count(*) AS n, sum(c) AS s, sum(c * c) AS ss
       |      FROM e GROUP BY 1 HAVING count(*) >= 2),
       |r AS (SELECT event_type,
       |        CAST(s AS DOUBLE) / n AS m,
       |        sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
       |             / (n - CAST(1 AS DOUBLE))) AS sd
       |      FROM s)
       |SELECT e.event_type, e.event_id, e.user_id, e.value,
       |  ${mr("(CAST(e.c AS DOUBLE) - r.m) / r.sd", 4)} AS z
       |FROM e JOIN r USING (event_type)
       |WHERE r.sd > 0 AND abs((CAST(e.c AS DOUBLE) - r.m) / r.sd) >= $OutlierZ
       |ORDER BY event_type, event_id""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.zscoreOutliers(Tables.events(s, dir),
        groupCols = Seq("event_type"), valueCol = col("value"),
        threshold = OutlierZ,
        payloadCols = Seq(col("event_id"), col("user_id"), col("value")))
      .withColumn("z", Rounding.mirrorRound(col("z"), 4))
      .orderBy("event_type", "event_id")
  }

  /** q45: per-node triangle counts over the q41 term co-occurrence
    * graph ([[graft.operators.Graph.triangleCounts]]) — the operator
    * orients edges by (degree, id) so wedges form only at each
    * triangle's LOW-degree corner (hub-safe at scale); the oracle uses
    * plain id-ordering, legal because the triangle SET is invariant
    * under any total orientation order.
    */
  val q45 = QueryDef(
    "q45_triangles",
    s"""WITH b AS (SELECT DISTINCT doc_id AS e, unnest(string_split(text, ' ')) AS i
       |           FROM documents),
       |k AS (SELECT e FROM b GROUP BY e HAVING count(*) <= $CoocMaxBasket),
       |kb AS (SELECT b.e, b.i FROM b JOIN k USING (e)),
       |pe AS (SELECT x.i AS pa, y.i AS pb FROM kb x JOIN kb y
       |       ON x.e = y.e AND x.i < y.i GROUP BY 1, 2),
       |tri AS (SELECT e1.pa AS a, e1.pb AS b2, e2.pb AS c
       |        FROM pe e1 JOIN pe e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
       |        JOIN pe e3 ON e3.pa = e1.pb AND e3.pb = e2.pb)
       |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM (SELECT a AS node FROM tri UNION ALL SELECT b2 FROM tri
       |      UNION ALL SELECT c FROM tri)
       |GROUP BY node ORDER BY node""".stripMargin) { (s, dir) =>
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    val pairs = graft.operators.Relational.cooccurrence(toks, "doc_id", "token",
      maxBasket = CoocMaxBasket)
    graft.operators.Graph.triangleCounts(pairs, "item_a", "item_b")
      .orderBy("node")
  }

  private val SaltCount = 8

  /** q46: the salted skew join in the VERIFIED lane (the q42 move, for
    * skew instead of bucketing): per-doc corpus-frequency "commonness"
    * score — token occurrences (genuinely Zipf-skewed: the hot stopword
    * keys are exactly what melts an unsalted shuffle partition) join the
    * vocabulary counts through [[graft.operators.Relational.saltedJoin]],
    * which splits each hot key across `SaltCount` partitions (fact rows
    * hash-salted, dim rows replicated ×salts). The dim side carries a
    * shuffle hint so the demo stays a real shuffle join at bench scale
    * rather than collapsing to broadcast. Salting changes the PLAN,
    * never the ANSWER — the oracle is the plain join.
    */
  val q46 = QueryDef(
    "q46_salted_join",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |              FROM documents),
      |v AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(v.freq) AS BIGINT) AS commonness
      |FROM toks JOIN v USING (token)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("freq"))
    graft.operators.Relational.saltedJoin(
        toks, vocab, "token", salts = SaltCount,
        saltSrc = Seq(col("doc_id")), dimHint = Some("shuffle_hash"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum("freq").cast("long").as("commonness"))
      .orderBy("doc_id")
  }

  /** q47: in-transit concurrency over [ship, ship + quantity days) intervals
    * ([[graft.operators.Relational.runningConcurrency]]) — the running
    * count of open intervals as a PARALLEL PREFIX SUM (range-partition
    * + per-partition partials + driver offsets + map-side emit), where
    * the oracle's textbook `sum() over (order by …)` with no partition
    * key is the one-task-sorts-everything plan the operator exists to
    * replace. Output values are partition-count-invariant.
    */
  val q47 = QueryDef(
    "q47_concurrency",
    """WITH iv AS (SELECT l_orderkey * 100 + l_linenumber AS id,
      |              epoch_ms(l_shipdate) AS s,
      |              epoch_ms(l_shipdate) + CAST(l_quantity AS BIGINT) * 86400000 AS e
      |            FROM lineitem),
      |pts AS (SELECT s AS t, 1 AS delta, id FROM iv
      |        UNION ALL SELECT e, -1, id FROM iv)
      |SELECT t, delta, id,
      |  CAST(sum(delta) OVER (ORDER BY t, delta, id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS concurrency
      |FROM pts ORDER BY t, delta, id""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
      .select((col("l_orderkey") * 100 + col("l_linenumber")).as("iid"),
        // NTZ parquet dates: cast through TIMESTAMP in the UTC session so
        // epoch_ms(naive) on the DuckDB side sees the same instant; the
        // synthetic schema has no receipt date, so transit time derives
        // from quantity in pure integer millis (exact on both engines)
        unix_millis(col("l_shipdate").cast("timestamp")).as("s"),
        (unix_millis(col("l_shipdate").cast("timestamp")) +
          col("l_quantity").cast("long") * lit(86400000L)).as("e"))
    graft.operators.Relational.runningConcurrency(li, col("iid"), col("s"), col("e"))
      .orderBy("t", "delta", "id")
  }

  /** q48: local clustering coefficient over the co-occurrence graph
    * ([[graft.operators.Graph.clusteringCoefficient]]) — the community-
    * density metric completing the graph family (components/PageRank/
    * triangles): 2T/(deg·(deg−1)) per node, EVERY node present
    * (zero-triangle nodes are the signal), deg<2 ⇒ 0. One exact-integer
    * division — bit-identical cross-engine.
    */
  val q48 = QueryDef(
    "q48_clustering_coeff",
    s"""WITH b AS (SELECT DISTINCT doc_id AS e, unnest(string_split(text, ' ')) AS i
       |           FROM documents),
       |k AS (SELECT e FROM b GROUP BY e HAVING count(*) <= $CoocMaxBasket),
       |kb AS (SELECT b.e, b.i FROM b JOIN k USING (e)),
       |pe AS (SELECT x.i AS pa, y.i AS pb FROM kb x JOIN kb y
       |       ON x.e = y.e AND x.i < y.i GROUP BY 1, 2),
       |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |       (SELECT pa AS node FROM pe UNION ALL SELECT pb FROM pe) GROUP BY 1),
       |tri AS (SELECT e1.pa AS a, e1.pb AS b2, e2.pb AS c
       |        FROM pe e1 JOIN pe e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
       |        JOIN pe e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
       |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
       |       FROM (SELECT a AS node FROM tri UNION ALL SELECT b2 FROM tri
       |             UNION ALL SELECT c FROM tri) GROUP BY 1)
       |SELECT dg.node, dg.deg, coalesce(tc.n_triangles, 0) AS n_triangles,
       |  CASE WHEN dg.deg >= 2 THEN
       |    ${mr("2.0 * coalesce(tc.n_triangles, 0) / CAST(dg.deg * (dg.deg - 1) AS DOUBLE)", 4)}
       |  ELSE 0.0 END AS coeff
       |FROM dg LEFT JOIN tc USING (node) ORDER BY dg.node""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    val pairs = graft.operators.Relational.cooccurrence(toks, "doc_id", "token",
      maxBasket = CoocMaxBasket)
    graft.operators.Graph.clusteringCoefficient(pairs, "item_a", "item_b")
      .withColumn("coeff", Rounding.mirrorRound(col("coeff"), 4))
      .orderBy("node")
  }

  private val CoreK = 80
  private val CoreRounds = 3
  private val CoreMaxBasket = 8

  // generated per-round peel CTEs (degree -> survivors -> edge filter) —
  // the q43 template discipline: oracle and round count cannot drift.
  // Every CTE is MATERIALIZED: each e{r} is referenced twice (d{r+1} and
  // e{r+1}), so DuckDB's default inlining re-expands the whole chain per
  // reference — exponential plan growth that spilled >80 GB at sf0.1;
  // materialized, the same query runs in ~1 s
  private def corePeelSql(r: Int): String = {
    val prev = s"e${r - 1}"
    s"""d$r AS MATERIALIZED (SELECT node, count(*) AS deg FROM
       |  (SELECT u AS node FROM $prev UNION ALL SELECT v FROM $prev) GROUP BY 1),
       |n$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $CoreK),
       |e$r AS MATERIALIZED (SELECT p.u, p.v FROM $prev p JOIN n$r a ON p.u = a.node
       |        JOIN n$r b2 ON p.v = b2.node)""".stripMargin
  }

  /** q49: fixed-round k-core peeling of the part co-purchase graph
    * ([[graft.operators.Graph.kCorePeel]]) — graph denoising in the
    * VERIFIED lane: orders are baskets, parts their items (the q41
    * machinery builds the edges), then 3 peel rounds at k=80 with the
    * oracle's rounds GENERATED from the same template as q43's, so the
    * iteration count can never drift. All-integer semantics.
    */
  val q49 = QueryDef(
    "q49_kcore",
    s"""WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS e, l_partkey AS i FROM lineitem),
       |kk AS MATERIALIZED (SELECT e FROM b GROUP BY e
       |       HAVING count(*) BETWEEN 2 AND $CoreMaxBasket),
       |kb AS MATERIALIZED (SELECT b.e, b.i FROM b JOIN kk USING (e)),
       |e0 AS MATERIALIZED (SELECT x.i AS u, y.i AS v FROM kb x JOIN kb y
       |       ON x.e = y.e AND x.i < y.i GROUP BY 1, 2),
       |${(1 to CoreRounds).map(corePeelSql).mkString(",\n")}
       |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |  (SELECT u AS node FROM e$CoreRounds UNION ALL SELECT v FROM e$CoreRounds)
       |GROUP BY node ORDER BY node""".stripMargin) { (s, dir) =>
    val baskets = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = graft.operators.Relational.cooccurrence(baskets,
      "l_orderkey", "l_partkey", maxBasket = CoreMaxBasket)
    graft.operators.Graph.kCorePeel(pairs, "item_a", "item_b",
        k = CoreK, rounds = CoreRounds)
      .orderBy("node")
  }

  private val RuleMinBoth = 5
  // p90 of the corpus confidence distribution — selective but nonempty
  // at every test sf (max confidence at sf0.01 is 0.821)
  private val RuleMinConf = 0.8

  private val BfsRounds = 3
  private val BfsSeedMod = 500

  private def bfsRoundSql(r: Int): String =
    s"""f$r AS MATERIALIZED (SELECT node FROM d${r - 1} WHERE dist = ${r - 1}),
       |c$r AS MATERIALIZED (SELECT DISTINCT adj.v AS node
       |       FROM f$r JOIN adj ON f$r.node = adj.u),
       |d$r AS MATERIALIZED (SELECT node, min(dist) AS dist FROM
       |  (SELECT node, dist FROM d${r - 1}
       |   UNION ALL SELECT node, $r AS dist FROM c$r) GROUP BY 1)""".stripMargin

  /** q68: fixed-round BFS hop distances from a seed set over the part
    * co-purchase graph ([[graft.operators.Graph.bfsHops]]) — the
    * link-distance / TrustRank-reach primitive on the q49 edge
    * machinery. Delta iteration: each round joins ONLY the frontier to
    * the adjacency and min-merges, and the oracle unrolls the same
    * rounds as GENERATED (materialized) CTEs so the iteration count
    * cannot drift. Every distance is an exact integer; the third round
    * provably adds nothing on this graph (diameter-2 from the seeds) —
    * the fixed-round contract, not a fixpoint.
    */
  val q68 = QueryDef(
    "q68_bfs_hops",
    s"""WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS e, l_partkey AS i FROM lineitem),
       |kk AS MATERIALIZED (SELECT e FROM b GROUP BY e
       |       HAVING count(*) BETWEEN 2 AND $CoreMaxBasket),
       |kb AS MATERIALIZED (SELECT b.e, b.i FROM b JOIN kk USING (e)),
       |e0 AS MATERIALIZED (SELECT x.i AS u, y.i AS v FROM kb x JOIN kb y
       |       ON x.e = y.e AND x.i < y.i GROUP BY 1, 2),
       |adj AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
       |d0 AS MATERIALIZED (SELECT DISTINCT p_partkey AS node, CAST(0 AS BIGINT) AS dist
       |       FROM part WHERE p_partkey % $BfsSeedMod = 0),
       |${(1 to BfsRounds).map(bfsRoundSql).mkString(",\n")}
       |SELECT node, dist FROM d$BfsRounds ORDER BY node""".stripMargin) { (s, dir) =>
    val baskets = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = graft.operators.Relational.cooccurrence(baskets,
      "l_orderkey", "l_partkey", maxBasket = CoreMaxBasket)
    val seeds = Tables(s, dir, "part")
      .filter(col("p_partkey") % BfsSeedMod === 0)
      .select(col("p_partkey"))
    graft.operators.Graph.bfsHops(pairs, "item_a", "item_b",
        seeds, "p_partkey", rounds = BfsRounds)
      .orderBy("node")
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

  /** q50: association rules over document token baskets
    * ([[graft.operators.Relational.associationRules]]) — the Apriori
    * pair-rule output (support / confidence / lift) on the q41 basket
    * machinery, same binding cap. Every score is ONE division of exact
    * integer products, so the confidence-threshold row SET is
    * bit-identical cross-engine; the basket count enters as a driver
    * scalar on the Spark side and a scalar subquery in the oracle.
    */
  val q50 = QueryDef(
    "q50_assoc_rules",
    s"""WITH b AS (SELECT DISTINCT doc_id AS e, unnest(string_split(text, ' ')) AS i
       |           FROM documents),
       |k AS (SELECT e FROM b GROUP BY e HAVING count(*) BETWEEN 2 AND $CoocMaxBasket),
       |kb AS (SELECT b.e, b.i FROM b JOIN k USING (e)),
       |nb AS (SELECT count(*) AS n FROM k),
       |it AS (SELECT i AS item, CAST(count(*) AS BIGINT) AS n_item FROM kb GROUP BY 1),
       |p AS (SELECT x.i AS a, y.i AS b2, CAST(count(*) AS BIGINT) AS n_both
       |      FROM kb x JOIN kb y ON x.e = y.e AND x.i < y.i GROUP BY 1, 2
       |      HAVING count(*) >= $RuleMinBoth),
       |d AS (SELECT a AS ante, b2 AS cons, n_both FROM p
       |      UNION ALL SELECT b2, a, n_both FROM p)
       |SELECT ante, cons, n_both, ia.n_item AS n_ante, ic.n_item AS n_cons,
       |  CAST(n_both AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS confidence,
       |  CAST((SELECT n FROM nb) * n_both AS DOUBLE)
       |    / CAST(ia.n_item * ic.n_item AS DOUBLE) AS lift
       |FROM d JOIN it ia ON d.ante = ia.item JOIN it ic ON d.cons = ic.item
       |WHERE CAST(n_both AS DOUBLE) / CAST(ia.n_item AS DOUBLE) >= $RuleMinConf
       |ORDER BY ante, cons""".stripMargin) { (s, dir) =>
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    graft.operators.Relational.associationRules(toks, "doc_id", "token",
        minBoth = RuleMinBoth, minConf = RuleMinConf, maxBasket = CoocMaxBasket)
      .orderBy("ante", "cons")
  }

  /** q51: first-order Markov transition matrix over per-user event
    * sequences ([[graft.operators.Relational.eventTransitions]]) — the
    * "what happens next" path analysis: one user-keyed window shuffle,
    * (from, to) counts partial-agg to ≤ |types|² rows, probability one
    * exact-integer division. (ts, event_id) is the q11 tie-broken total
    * order per user.
    */
  val q51 = QueryDef(
    "q51_transitions",
    """WITH s AS (SELECT event_type AS f,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
      |  FROM events),
      |tr AS (SELECT f, t, CAST(count(*) AS BIGINT) AS n_trans FROM s
      |       WHERE t IS NOT NULL GROUP BY 1, 2),
      |fr AS (SELECT f, CAST(sum(n_trans) AS BIGINT) AS n_from FROM tr GROUP BY 1)
      |SELECT tr.f AS from_event, tr.t AS to_event, n_trans, n_from,
      |  CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE) AS prob
      |FROM tr JOIN fr ON tr.f = fr.f ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.operators.Relational.eventTransitions(Tables.events(s, dir),
        "user_id", "event_type", "ts", "event_id")
      .orderBy("from_event", "to_event")
  }

  /** q52: per-priority OLS revenue trend
    * ([[graft.operators.Relational.linearTrend]]) — slope/intercept of
    * order value (cents) over the day index since the corpus epoch: the
    * five sufficient statistics are EXACT integer sums (q44 discipline),
    * the closed form a shared double expression tree, so both engines
    * produce bit-identical doubles. One partial-agg pass, |groups| rows.
    */
  val q52 = QueryDef(
    "q52_trend",
    """WITH pts AS (SELECT o_orderpriority AS grp,
      |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS x,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
      |  FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
      |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |  CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(x*y) AS DOUBLE) AS sxy
      |  FROM pts GROUP BY 1),
      |t AS (SELECT grp, n, sx, sy, (CAST(n AS DOUBLE)*sxx - sx*sx) AS den,
      |  (CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx) AS slope
      |  FROM s)
      |SELECT grp AS o_orderpriority, n, slope,
      |  (sy - slope*sx) / CAST(n AS DOUBLE) AS intercept
      |FROM t WHERE n >= 2 AND den > 0 ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.operators.Relational.linearTrend(Tables(s, dir, "orders"),
        Seq("o_orderpriority"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")),
        col("o_totalprice"))
      .orderBy("o_orderpriority")
  }

  private val HhMinEst = 100L

  /** q53: heavy hitters via the frequent-items SKETCH in the VERIFIED
    * lane ([[graft.operators.Sketches.heavyHitters]]): the map (128) is
    * sized above the 31-token vocabulary, so the sketch provably never
    * purges and its estimates — AND its lower/upper bounds — are the
    * exact counts (lb = ub = est), which is exactly what the plain
    * GROUP BY oracle computes. At real scale the same code undersizes
    * the map and degrades to the bounded-error no-false-negatives
    * contract (spec-tested); the shuffle carries ≤ maxMapSize entries
    * per partition either way, never the token stream.
    */
  val q53 = QueryDef(
    "q53_heavy_hitters",
    s"""SELECT token, CAST(count(*) AS BIGINT) AS est,
       |  CAST(count(*) AS BIGINT) AS lb, CAST(count(*) AS BIGINT) AS ub
       |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
       |GROUP BY token HAVING count(*) >= $HhMinEst
       |ORDER BY token""".stripMargin) { (s, dir) =>
    val toks = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ", -1)).as("token"))
    graft.operators.Sketches.heavyHitters(toks, "token", Nil,
        maxMapSize = 128, minEst = HhMinEst)
      .withColumnRenamed("item", "token")
      .orderBy("token")
  }

  /** q55: per-supplier Pearson correlation between quantity and line
    * price via [[graft.operators.Relational.pearsonCorr]] — the q44/q52
    * exact-integer-moment discipline extended to five sufficient
    * statistics: quantity snaps at scale 1, price to cents, so every sum
    * is an exact long and r is one fixed double expression (sqrt is
    * IEEE correctly-rounded — bit-identical cross-engine). ONE
    * partial-agg pass, |suppliers| rows, no window.
    */
  val q55 = QueryDef(
    "q55_correlation",
    """WITH pts AS (SELECT l_suppkey,
      |  CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT) AS x,
      |  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
      |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |s AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |  CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(y*y) AS DOUBLE) AS syy,
      |  CAST(sum(x*y) AS DOUBLE) AS sxy
      |  FROM pts GROUP BY 1),
      |t AS (SELECT l_suppkey, n,
      |  (CAST(n AS DOUBLE)*sxx - sx*sx) AS dx,
      |  (CAST(n AS DOUBLE)*syy - sy*sy) AS dy,
      |  (CAST(n AS DOUBLE)*sxy - sx*sy) AS num
      |  FROM s)
      |SELECT l_suppkey, n, num / (sqrt(dx) * sqrt(dy)) AS corr
      |FROM t WHERE n >= 2 AND dx > 0 AND dy > 0 ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.operators.Relational.pearsonCorr(Tables(s, dir, "lineitem"),
        Seq("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        scaleX = 1L, scaleY = 100L)
      .orderBy("l_suppkey")
  }

  /** q56: Gini coefficient of customer spend per market segment via
    * [[graft.operators.Relational.giniIndex]]. Per-customer totals are
    * built EXACTLY before the operator — each order snaps to cents, the
    * customer total is a long sum (a double pre-sum would be
    * order-dependent and break the oracle) — then the segment-partitioned
    * rank window (total order (spend, custkey)) and one agg produce the
    * order statistic. The customer join is key-keyed (both sides
    * corpus-sized at scale — deliberately NOT broadcast).
    */
  val q56 = QueryDef(
    "q56_gini",
    """WITH spend AS (SELECT o_custkey,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
      |j AS (SELECT c_mktsegment, c_custkey, cents FROM spend
      |      JOIN customer ON o_custkey = c_custkey),
      |r AS (SELECT c_mktsegment, cents,
      |  CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents, c_custkey) AS BIGINT) AS i
      |  FROM j),
      |s AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS total,
      |  CAST(sum(i * cents) AS DOUBLE) AS siv
      |  FROM r GROUP BY 1)
      |SELECT c_mktsegment, n, total,
      |  (2.0 * siv - (CAST(n AS DOUBLE) + 1.0) * CAST(total AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) AS gini
      |FROM s WHERE total > 0 ORDER BY 1""".stripMargin) { (s, dir) =>
    val spend = Tables(s, dir, "orders")
      .filter(col("o_totalprice").isNotNull)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("_cents"))
      .groupBy("o_custkey").agg(sum("_cents").cast("long").as("cents"))
    val joined = spend.join(Tables(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
    graft.operators.Relational.giniIndex(joined, Seq("c_mktsegment"),
        col("cents"), col("c_custkey"), scale = 1L)
      .orderBy("c_mktsegment")
  }

  /** q57: supplier revenue concentration per nation via
    * [[graft.operators.Relational.herfindahl]] — two partial-agg passes
    * (per-supplier cents, then the nation rollup), squares accumulated
    * in DECIMAL(38,0) against DuckDB's int128 (a long would overflow at
    * scale), the nation dim join BROADCAST.
    */
  val q57 = QueryDef(
    "q57_hhi",
    """WITH x AS (SELECT s_nationkey, l_suppkey,
      |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
      |s AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(v) AS BIGINT) AS sx,
      |  sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS sxx
      |  FROM x GROUP BY 1)
      |SELECT n_name, n, CAST(sxx AS DOUBLE) / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS hhi
      |FROM s JOIN nation ON s_nationkey = n_nationkey
      |WHERE sx > 0 ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
    graft.operators.Relational.herfindahl(li, Seq("s_nationkey"),
        col("l_suppkey"), col("l_extendedprice"), scale = 100L)
      .join(broadcast(Tables(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select("n_name", "n", "hhi")
      .orderBy("n_name")
  }

  /** q58: chi-squared independence scan (priority × status) via
    * [[graft.operators.Relational.chiSquare]] — per-cell (O−E)²/E over
    * the COMPLETE grid (zero cells included), marginals derived from the
    * one-pass cell table, N as a driver scalar / oracle scalar subquery,
    * and NO float total emitted (t18's no-cross-engine-sum contract).
    */
  val q58 = QueryDef(
    "q58_chi2",
    """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
      |  CAST(count(*) AS BIGINT) AS observed FROM orders
      |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL GROUP BY 1, 2),
      |rt AS (SELECT a, CAST(sum(observed) AS BIGINT) AS ra FROM cells GROUP BY 1),
      |ct AS (SELECT b, CAST(sum(observed) AS BIGINT) AS cb FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(observed) AS DOUBLE) AS nd FROM cells),
      |grid AS (SELECT rt.a, ct.b, ra, cb,
      |  CAST(coalesce(cells.observed, 0) AS BIGINT) AS observed
      |  FROM rt CROSS JOIN ct LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
      |e AS (SELECT a, b, observed,
      |  CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / tot.nd AS expected
      |  FROM grid CROSS JOIN tot)
      |SELECT a AS o_orderpriority, b AS o_orderstatus, observed, expected,
      |  (CAST(observed AS DOUBLE) - expected) * (CAST(observed AS DOUBLE) - expected)
      |    / expected AS chi2_term
      |FROM e ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.operators.Relational.chiSquare(Tables(s, dir, "orders"),
        "o_orderpriority", "o_orderstatus")
      .orderBy("o_orderpriority", "o_orderstatus")
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

  /** q60: quartile binning of order totals via
    * [[graft.operators.Relational.quantileBins]] — cutpoints from the
    * cent-value histogram (|distinct cents| rows, never a corpus sort),
    * then a NARROW broadcast-literal bin assignment; the oracle mirrors
    * the same inclusive rank criterion with scalar subqueries. The probs
    * (.25/.5/.75) are exactly binary-representable, so ceil(p·n) is the
    * same integer on both engines.
    */
  val q60 = QueryDef(
    "q60_bins",
    """WITH v AS (SELECT o_orderkey,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS vu
      |  FROM orders WHERE o_totalprice IS NOT NULL),
      |h AS (SELECT vu, count(*) AS c FROM v GROUP BY 1),
      |cum AS (SELECT vu, sum(c) OVER (ORDER BY vu) AS cum FROM h),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      |cuts AS (SELECT
      |  (SELECT min(vu) FROM cum WHERE cum >= (SELECT greatest(1, CAST(ceil(0.25 * n) AS BIGINT)) FROM nn)) AS c0,
      |  (SELECT min(vu) FROM cum WHERE cum >= (SELECT greatest(1, CAST(ceil(0.5 * n) AS BIGINT)) FROM nn)) AS c1,
      |  (SELECT min(vu) FROM cum WHERE cum >= (SELECT greatest(1, CAST(ceil(0.75 * n) AS BIGINT)) FROM nn)) AS c2)
      |SELECT o_orderkey, vu AS value_units,
      |  CAST((CASE WHEN vu > c0 THEN 1 ELSE 0 END)
      |     + (CASE WHEN vu > c1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN vu > c2 THEN 1 ELSE 0 END) AS INTEGER) AS bin
      |FROM v CROSS JOIN cuts ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    graft.operators.Relational.quantileBins(
        Tables(s, dir, "orders").filter(col("o_totalprice").isNotNull),
        col("o_totalprice"), Seq(0.25, 0.5, 0.75), scale = 100L)
      .select("o_orderkey", "value_units", "bin")
      .orderBy("o_orderkey")
  }

  /** q61: Welch's t between fulfilled ('F') and open ('O') orders per
    * priority via [[graft.operators.Relational.abTest]] — exact
    * conditional integer moments in ONE partial-agg pass (Σy² in
    * DECIMAL(38,0) against DuckDB's int128 — cent totals square past
    * long range), then one fixed double tree for means/variances/t.
    */
  val q61 = QueryDef(
    "q61_ab_test",
    """WITH p AS (SELECT o_orderpriority AS prio, o_orderstatus AS arm,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
      |  FROM orders WHERE o_totalprice IS NOT NULL AND o_orderstatus IN ('F','O')),
      |s AS (SELECT prio,
      |  CAST(sum(CASE WHEN arm = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |  CAST(sum(CASE WHEN arm = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |  CAST(sum(CASE WHEN arm = 'F' THEN y END) AS DOUBLE) AS sa,
      |  CAST(sum(CASE WHEN arm = 'O' THEN y END) AS DOUBLE) AS sb,
      |  CAST(sum(CASE WHEN arm = 'F' THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT) END) AS DOUBLE) AS ssa,
      |  CAST(sum(CASE WHEN arm = 'O' THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT) END) AS DOUBLE) AS ssb
      |  FROM p GROUP BY 1),
      |t AS (SELECT prio, n_a, n_b,
      |  sa / CAST(n_a AS DOUBLE) AS mean_a, sb / CAST(n_b AS DOUBLE) AS mean_b,
      |  (ssa - sa * sa / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS va,
      |  (ssb - sb * sb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS vb
      |  FROM s WHERE n_a >= 2 AND n_b >= 2),
      |u AS (SELECT prio, n_a, n_b, mean_a, mean_b,
      |  va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) AS se2 FROM t)
      |SELECT prio AS o_orderpriority, n_a, n_b, mean_a, mean_b,
      |  (mean_a - mean_b) / sqrt(se2) AS t
      |FROM u WHERE se2 > 0 ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.operators.Relational.abTest(Tables(s, dir, "orders"),
        Seq("o_orderpriority"), col("o_orderstatus"), col("o_totalprice"),
        armA = "F", armB = "O", scale = 100L)
      .orderBy("o_orderpriority")
  }

  /** q62: RFM customer scoring — the classic curation/marketing
    * stratification, here to prove [[graft.operators.Relational.quantileBins]]
    * COMPOSES: one partial-agg pass builds per-customer recency (days
    * before the corpus max order day — a driver scalar / oracle scalar
    * subquery, the t18 pattern), frequency and exact cent spend, the
    * base materializes ONCE (localCheckpoint — three binning passes and
    * the final projection all read it), and each metric gets quintile
    * bins from its value histogram + a narrow broadcast-literal pass —
    * never an ntile corpus sort. The quintile probs aren't binary-exact,
    * so the oracle forces CAST(p AS DOUBLE) to make ceil(p·n) the same
    * IEEE product on both engines.
    */
  val q62 = QueryDef(
    "q62_rfm",
    """WITH day0 AS (SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01',
      |    max(o_orderdate)) AS BIGINT) AS ref FROM orders WHERE o_orderdate IS NOT NULL
      |    AND o_totalprice IS NOT NULL),
      |base AS (SELECT o_custkey,
      |  (SELECT ref FROM day0)
      |    - max(CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)) AS r_days,
      |  CAST(count(*) AS BIGINT) AS f,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS m_cents
      |  FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      |  GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
      |rh AS (SELECT r_days AS vu, count(*) AS c FROM base GROUP BY 1),
      |rc AS (SELECT vu, sum(c) OVER (ORDER BY vu) AS cum FROM rh),
      |fh AS (SELECT f AS vu, count(*) AS c FROM base GROUP BY 1),
      |fc AS (SELECT vu, sum(c) OVER (ORDER BY vu) AS cum FROM fh),
      |mh AS (SELECT m_cents AS vu, count(*) AS c FROM base GROUP BY 1),
      |mc AS (SELECT vu, sum(c) OVER (ORDER BY vu) AS cum FROM mh),
      |cuts AS (SELECT
      |  (SELECT min(vu) FROM rc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.2 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS r0,
      |  (SELECT min(vu) FROM rc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.4 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS r1,
      |  (SELECT min(vu) FROM rc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.6 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS r2,
      |  (SELECT min(vu) FROM rc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.8 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS r3,
      |  (SELECT min(vu) FROM fc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.2 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS f0,
      |  (SELECT min(vu) FROM fc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.4 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS f1,
      |  (SELECT min(vu) FROM fc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.6 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS f2,
      |  (SELECT min(vu) FROM fc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.8 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS f3,
      |  (SELECT min(vu) FROM mc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.2 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS m0,
      |  (SELECT min(vu) FROM mc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.4 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS m1,
      |  (SELECT min(vu) FROM mc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.6 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS m2,
      |  (SELECT min(vu) FROM mc WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.8 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS m3)
      |SELECT o_custkey, r_days, f, m_cents,
      |  CAST((CASE WHEN r_days > r0 THEN 1 ELSE 0 END) + (CASE WHEN r_days > r1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN r_days > r2 THEN 1 ELSE 0 END) + (CASE WHEN r_days > r3 THEN 1 ELSE 0 END) AS INTEGER) AS r_bin,
      |  CAST((CASE WHEN f > f0 THEN 1 ELSE 0 END) + (CASE WHEN f > f1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN f > f2 THEN 1 ELSE 0 END) + (CASE WHEN f > f3 THEN 1 ELSE 0 END) AS INTEGER) AS f_bin,
      |  CAST((CASE WHEN m_cents > m0 THEN 1 ELSE 0 END) + (CASE WHEN m_cents > m1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN m_cents > m2 THEN 1 ELSE 0 END) + (CASE WHEN m_cents > m3 THEN 1 ELSE 0 END) AS INTEGER) AS m_bin
      |FROM base CROSS JOIN cuts ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val day = datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp"))
      .cast("long")
    val orders = Tables(s, dir, "orders")
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
    val refDay = orders.agg(max(day)).head().getLong(0)
    val base = orders.groupBy("o_custkey").agg(
        (lit(refDay) - max(day)).as("r_days"),
        count(lit(1)).cast("long").as("f"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .cast("long").as("m_cents"))
      .localCheckpoint()
    val ps = Seq(0.2, 0.4, 0.6, 0.8)
    val binned = Seq(("r_days", "r_bin"), ("f", "f_bin"), ("m_cents", "m_bin"))
      .foldLeft(base) { case (df, (metric, bin)) =>
        graft.operators.Relational.quantileBins(df, col(metric), ps,
          scale = 1L, binName = bin).drop("value_units")
      }
    binned.select("o_custkey", "r_days", "f", "m_cents", "r_bin", "f_bin", "m_bin")
      .orderBy("o_custkey")
  }

  /** q63: Pareto concentration per nation via
    * [[graft.operators.Relational.paretoRank]] — the 80/20 readout "how
    * many suppliers make 80% of revenue", with the crossing test in PURE
    * integer arithmetic (5·cumsum ≥ 4·total over exact longs — no float
    * threshold to disagree across engines); per-supplier totals exact
    * cents, ranking largest-first within nation ((revenue desc, suppkey)
    * total order, parallelism = nations), nation dim join BROADCAST.
    */
  val q63 = QueryDef(
    "q63_pareto",
    """WITH x AS (SELECT s_nationkey, l_suppkey,
      |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE l_extendedprice IS NOT NULL
      |    AND CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) >= 0
      |  GROUP BY 1, 2),
      |r AS (SELECT s_nationkey, v,
      |  CAST(sum(v) OVER (PARTITION BY s_nationkey ORDER BY v DESC, l_suppkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |  CAST(sum(v) OVER (PARTITION BY s_nationkey) AS BIGINT) AS tot,
      |  CAST(row_number() OVER (PARTITION BY s_nationkey ORDER BY v DESC, l_suppkey) AS BIGINT) AS rk
      |  FROM x),
      |s AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_entities,
      |  max(tot) AS total,
      |  min(CASE WHEN cum * 5 >= tot * 4 THEN rk END) AS n_to_threshold
      |  FROM r GROUP BY 1)
      |SELECT n_name, n_entities, total, n_to_threshold
      |FROM s JOIN nation ON s_nationkey = n_nationkey
      |WHERE total > 0 ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
    graft.operators.Relational.paretoRank(li, Seq("s_nationkey"),
        col("l_suppkey"), col("l_extendedprice"), num = 4L, den = 5L,
        scale = 100L)
      .join(broadcast(Tables(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select("n_name", "n_entities", "total", "n_to_threshold")
      .orderBy("n_name")
  }

  /** q64: pointwise mutual information (returnflag × linestatus) via
    * [[graft.operators.Relational.mutualInfo]] — the chiSquare plan
    * (one cell pass, derived marginals, scalar N) over the observed
    * support, per-cell pmi + MI contribution as fixed double trees,
    * no float total (t18's contract).
    */
  val q64 = QueryDef(
    "q64_mutual_info",
    """WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b,
      |  CAST(count(*) AS BIGINT) AS n_ab FROM lineitem
      |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL GROUP BY 1, 2),
      |rt AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS na FROM cells GROUP BY 1),
      |ct AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS nb FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_ab) AS DOUBLE) AS nd FROM cells),
      |e AS (SELECT a, b, n_ab,
      |  ln(nd * CAST(n_ab AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS pmi,
      |  nd FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot)
      |SELECT a AS l_returnflag, b AS l_linestatus, n_ab, pmi,
      |  CAST(n_ab AS DOUBLE) / nd * pmi AS mi_term
      |FROM e ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.operators.Relational.mutualInfo(Tables(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus")
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q65: percentile winsorization of the heavy-tailed event value via
    * [[graft.operators.Relational.winsorize]] — exact histogram
    * cutpoints (cent precision bounds the histogram by the value
    * DOMAIN, not the corpus), then a narrow integer clamp; no floats
    * anywhere in the clip decision.
    */
  val q65 = QueryDef(
    "q65_winsorize",
    """WITH v AS (SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vu
      |  FROM events WHERE value IS NOT NULL),
      |h AS (SELECT vu, count(*) AS c FROM v GROUP BY 1),
      |cum AS (SELECT vu, sum(c) OVER (ORDER BY vu) AS cum FROM h),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      |cuts AS (SELECT
      |  (SELECT min(vu) FROM cum WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.05 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS lo,
      |  (SELECT min(vu) FROM cum WHERE cum >= (SELECT greatest(1, CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT)) FROM nn)) AS hi)
      |SELECT event_id, vu AS value_units, greatest(lo, least(hi, vu)) AS clipped
      |FROM v CROSS JOIN cuts ORDER BY event_id""".stripMargin) { (s, dir) =>
    graft.operators.Relational.winsorize(
        Tables.events(s, dir).filter(col("value").isNotNull)
          .select("event_id", "value"),
        col("value"), pLo = 0.05, pHi = 0.95, scale = 100L)
      .select("event_id", "value_units", "clipped")
      .orderBy("event_id")
  }

  /** q66: pivoted revenue matrix (priority × status) — the DataFrame
    * `pivot` API in the verified lane with an EXPLICIT column list (an
    * inferred pivot would scan once just to learn the columns, and
    * column ORDER would depend on data); cells are exact cent sums, a
    * combination that never occurs is a null cell on both engines.
    */
  val q66 = QueryDef(
    "q66_pivot",
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS F,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS O,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS P
      |FROM orders WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .filter(col("o_totalprice").isNotNull && col("o_orderpriority").isNotNull)
      .withColumn("_cents",
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum("_cents").cast("long"))
      .orderBy("o_orderpriority")
  }

  private val MadK = 5L

  /** q67: MAD robust outliers per event type
    * ([[graft.operators.Relational.madOutliers]]) — the flag decision is
    * dev > k·MAD over exact longs (median = rank-⌊(n+1)/2⌋ selection on
    * the unit histogram, both engines run the identical integer test);
    * robust_z is reporting only, rounded at the binding.
    */
  val q67 = QueryDef(
    "q67_mad_outliers",
    s"""WITH e AS (SELECT event_type, event_id, user_id, value,
       |             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
       |           FROM events WHERE value IS NOT NULL),
       |n AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1),
       |h1 AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
       |c1 AS (SELECT event_type, c,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum
       |       FROM h1),
       |med AS (SELECT c1.event_type, min(c) AS med
       |        FROM c1 JOIN n USING (event_type)
       |        WHERE 2 * cum >= n GROUP BY 1),
       |d AS (SELECT e.event_type, e.event_id, e.user_id, e.value,
       |        abs(e.c - med.med) AS dev
       |      FROM e JOIN med USING (event_type)),
       |h2 AS (SELECT event_type, dev, count(*) AS cnt FROM d GROUP BY 1, 2),
       |c2 AS (SELECT event_type, dev,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cum
       |       FROM h2),
       |mad AS (SELECT c2.event_type, min(dev) AS mad
       |        FROM c2 JOIN n USING (event_type)
       |        WHERE 2 * cum >= n GROUP BY 1)
       |SELECT d.event_type, d.event_id, d.user_id, d.value,
       |  d.dev AS dev_units, mad.mad AS mad_units,
       |  ${mr("CAST(d.dev AS DOUBLE) / (1.4826 * CAST(mad.mad AS DOUBLE))", 4)} AS robust_z
       |FROM d JOIN mad USING (event_type)
       |WHERE mad.mad > 0 AND d.dev > $MadK * mad.mad
       |ORDER BY event_type, event_id""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.madOutliers(Tables.events(s, dir),
        groupCols = Seq("event_type"), valueCol = col("value"), k = MadK,
        payloadCols = Seq(col("event_id"), col("user_id"), col("value")))
      .withColumn("robust_z", Rounding.mirrorRound(col("robust_z"), 4))
      .orderBy("event_type", "event_id")
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

  /** q72: two-sample KS drift statistic per order status
    * ([[graft.operators.Relational.ksTest]]) — urgent-priority order
    * totals vs the rest: the sup-CDF-gap computed entirely in integers
    * (cents histogram, cross-multiplied cumulative gap), with one exact
    * closing division mirrored to 6 dp. The window sorts |distinct
    * cents| rows per segment, never the raw orders.
    */
  val q72 = QueryDef(
    "q72_ks_test",
    s"""WITH p AS (SELECT o_orderstatus AS seg,
       |             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c,
       |             (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS a
       |           FROM orders),
       |h AS (SELECT seg, c, sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
       |        sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
       |      FROM p GROUP BY 1, 2),
       |w AS (SELECT seg, c,
       |        sum(ca) OVER (PARTITION BY seg ORDER BY c
       |          ROWS UNBOUNDED PRECEDING) AS cuma,
       |        sum(cb) OVER (PARTITION BY seg ORDER BY c
       |          ROWS UNBOUNDED PRECEDING) AS cumb,
       |        sum(ca) OVER (PARTITION BY seg) AS na,
       |        sum(cb) OVER (PARTITION BY seg) AS nb
       |      FROM h),
       |g AS (SELECT seg AS o_orderstatus,
       |        CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
       |        CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num
       |      FROM w GROUP BY 1
       |      HAVING max(na) > 0 AND max(nb) > 0)
       |SELECT o_orderstatus, n_a, n_b, d_num,
       |  ${mr("CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)", 6)} AS d
       |FROM g ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.ksTest(Tables(s, dir, "orders"),
        Seq("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .withColumn("d", Rounding.mirrorRound(col("d"), 6))
      .orderBy("o_orderstatus")
  }

  private val HitsIters = 3

  private def hitsIterSql(r: Int): String =
    s"""ar$r AS MATERIALIZED (SELECT e.v, sum(h.h) AS ar FROM e
       |         JOIN h${r - 1} h ON e.u = h.u GROUP BY 1),
       |a$r AS MATERIALIZED (SELECT v, ar / (SELECT sum(ar) FROM ar$r) AS a
       |         FROM ar$r),
       |hr$r AS MATERIALIZED (SELECT e.u, sum(a.a) AS hr FROM e
       |         JOIN a$r a ON e.v = a.v GROUP BY 1),
       |h$r AS MATERIALIZED (SELECT u, hr / (SELECT sum(hr) FROM hr$r) AS h
       |         FROM hr$r)""".stripMargin

  /** q73: HITS hubs & authorities over the supplier→part supply graph
    * ([[graft.operators.Graph.hits]]) — suppliers are hubs (they stock
    * influential parts), parts are authorities (stocked by influential
    * suppliers). Fixed 3 iterations, L1-normalized each half-step, the
    * oracle unrolling the identical iterations as MATERIALIZED CTEs
    * (the q49 lesson: inlined, the state CTE re-expands exponentially).
    */
  val q73 = QueryDef(
    "q73_hits",
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS u, l_partkey AS v
       |         FROM lineitem),
       |u0 AS MATERIALIZED (SELECT DISTINCT u FROM e),
       |h0 AS MATERIALIZED (SELECT u, 1.0 / (SELECT count(*) FROM u0) AS h
       |         FROM u0),
       |${(1 to HitsIters).map(hitsIterSql).mkString(",\n")}
       |SELECT side, node, score FROM (
       |  SELECT 'hub' AS side, u AS node, ${mr("h", 6)} AS score FROM h$HitsIters
       |  UNION ALL
       |  SELECT 'auth', v, ${mr("a", 6)} FROM a$HitsIters)
       |ORDER BY side, node""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val edges = Tables(s, dir, "lineitem").select("l_suppkey", "l_partkey")
    graft.operators.Graph.hits(edges, "l_suppkey", "l_partkey", iters = HitsIters)
      .select(col("side"), col("node"),
        Rounding.mirrorRound(col("score"), 6).as("score"))
      .orderBy("side", "node")
  }

  /** q74: lag-24 autocorrelation of hourly event counts per type
    * ([[graft.operators.Relational.autocorrelation]]) — the daily-
    * seasonality detector: hourly buckets pair with the bucket 24 hours
    * ahead via a subtract-the-lag equi-join (never a range join), and
    * the correlation runs over exact integer counts (q55's moment
    * machinery at scale 1). Gap semantics: a pair exists only when both
    * hours are observed.
    */
  val q74 = QueryDef(
    "q74_autocorr",
    """WITH b AS (SELECT event_type, epoch_ms(ts) // 3600000 AS bk,
      |             CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type, a.c AS x, f.c AS y FROM b a
      |      JOIN b f ON f.event_type = a.event_type AND f.bk = a.bk + 24),
      |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |  CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(y*y) AS DOUBLE) AS syy,
      |  CAST(sum(x*y) AS DOUBLE) AS sxy
      |  FROM p GROUP BY 1),
      |t AS (SELECT event_type, n,
      |  (CAST(n AS DOUBLE)*sxx - sx*sx) AS dx,
      |  (CAST(n AS DOUBLE)*syy - sy*sy) AS dy,
      |  (CAST(n AS DOUBLE)*sxy - sx*sy) AS num
      |  FROM s)
      |SELECT event_type, n, num / (sqrt(dx) * sqrt(dy)) AS corr
      |FROM t WHERE n >= 2 AND dx > 0 AND dy > 0
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    graft.operators.Relational.autocorrelation(Tables.events(s, dir),
        Seq("event_type"), unix_millis(col("ts")),
        bucketMillis = 3600000L, lagBuckets = 24)
      .orderBy("event_type")
  }

  /** q75: column-level data profile of lineitem
    * ([[graft.operators.Relational.profile]]) — the ingest-gate quality
    * report (rows, nulls, exact distincts, numeric ranges) in ONE
    * aggregation pass (Catalyst Expand for the multi-distinct — one
    * scan, never |cols| scans); string extrema deliberately absent
    * (collation does not reproduce across engines). The oracle is the
    * per-column UNION ALL a human would write.
    */
  val q75 = QueryDef(
    "q75_profile", {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num
           |FROM lineitem""".stripMargin
      def str(c: String) =
        s"""SELECT '$c', CAST(count(*) AS BIGINT),
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  CAST(count(DISTINCT $c) AS BIGINT),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
           |FROM lineitem""".stripMargin
      s"""${num("l_partkey")}
         |UNION ALL ${num("l_quantity")}
         |UNION ALL ${num("l_extendedprice")}
         |UNION ALL ${str("l_returnflag")}
         |UNION ALL ${str("l_shipdate")}
         |ORDER BY col_name""".stripMargin
    }) { (s, dir) =>
    graft.operators.Relational.profile(Tables(s, dir, "lineitem"),
        Seq("l_partkey", "l_quantity", "l_extendedprice", "l_returnflag",
          "l_shipdate"))
      .orderBy("col_name")
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

  /** q78: rule-based data expectations over lineitem
    * ([[graft.operators.Relational.expectations]]) — the validation
    * half of q75's quality gate: five named predicates judged in one
    * conditional-aggregation pass (one scan), NULL predicate = not met;
    * the oracle is the per-rule UNION ALL with each predicate mirrored
    * verbatim.
    */
  val q78 = QueryDef(
    "q78_expectations", {
      val rules = Seq(
        "quantity_in_range" -> "l_quantity BETWEEN 1 AND 50",
        "discount_in_policy" -> "l_discount BETWEEN 0.0 AND 0.10",
        "shipdate_present" -> "l_shipdate IS NOT NULL",
        "price_positive" -> "l_extendedprice > 0",
        "returnflag_known" -> "l_returnflag IN ('A', 'N', 'R')")
      rules.map { case (n, p) =>
        s"""SELECT '$n' AS rule, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN coalesce($p, FALSE) THEN 0 ELSE 1 END) AS BIGINT)
           |    AS violations,
           |  ${mr(s"sum(CASE WHEN coalesce($p, FALSE) THEN 0 ELSE 1 END) * 1.0 / count(*)", 6)}
           |    AS violation_frac
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL ", "\nORDER BY rule")
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.expectations(Tables(s, dir, "lineitem"), Seq(
        "quantity_in_range" -> col("l_quantity").between(1, 50),
        "discount_in_policy" -> col("l_discount").between(0.0, 0.10),
        "shipdate_present" -> col("l_shipdate").isNotNull,
        "price_positive" -> (col("l_extendedprice") > 0),
        "returnflag_known" -> col("l_returnflag").isin("A", "N", "R")))
      .withColumn("violation_frac", Rounding.mirrorRound(col("violation_frac"), 6))
      .orderBy("rule")
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

  private val LpaRounds = 2

  // generated per-round LPA CTEs (neighbor label histogram -> argmax by
  // (count desc, label asc)) — the q43/q49 template discipline, every
  // CTE MATERIALIZED against DuckDB's exponential re-inlining
  private def lpaRoundSql(r: Int): String =
    s"""h$r AS MATERIALIZED (SELECT adj.u AS node, l.label, count(*) AS c
       |  FROM adj JOIN lb${r - 1} l ON adj.v = l.node GROUP BY 1, 2),
       |lb$r AS MATERIALIZED (SELECT node, label FROM
       |  (SELECT node, label,
       |     row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
       |   FROM h$r) WHERE rn = 1)""".stripMargin

  /** q80: label-propagation communities over the part co-purchase graph
    * ([[graft.operators.Graph.labelPropagation]]) — the q49 edge
    * machinery, then 2 fixed synchronous rounds with the deterministic
    * (count desc, label asc) tie-break; the oracle unrolls the same
    * rounds as GENERATED materialized CTEs (histogram + row_number
    * argmax), so the iteration count and the tie rule cannot drift.
    * All-integer semantics end to end.
    */
  val q80 = QueryDef(
    "q80_communities",
    s"""WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS e, l_partkey AS i FROM lineitem),
       |kk AS MATERIALIZED (SELECT e FROM b GROUP BY e
       |       HAVING count(*) BETWEEN 2 AND $CoreMaxBasket),
       |kb AS MATERIALIZED (SELECT b.e, b.i FROM b JOIN kk USING (e)),
       |e0 AS MATERIALIZED (SELECT x.i AS u, y.i AS v FROM kb x JOIN kb y
       |       ON x.e = y.e AND x.i < y.i GROUP BY 1, 2),
       |adj AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
       |lb0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM adj),
       |${(1 to LpaRounds).map(lpaRoundSql).mkString(",\n")}
       |SELECT node, label FROM lb$LpaRounds ORDER BY node""".stripMargin) { (s, dir) =>
    val baskets = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = graft.operators.Relational.cooccurrence(baskets,
      "l_orderkey", "l_partkey", maxBasket = CoreMaxBasket)
    graft.operators.Graph.labelPropagation(pairs, "item_a", "item_b",
        rounds = LpaRounds)
      .orderBy("node")
  }

  private val RecsTopK = 10
  private val RecsMinBoth = 2L
  private val RecsMaxBasket = 60

  /** q81: item-item cosine recommendations over customer purchase
    * baskets ([[graft.operators.Relational.itemSimilarity]]) — the
    * Sarwar-style neighborhood model in the VERIFIED lane: customers'
    * distinct part sets (capped — the hot-entity discipline, mirrored
    * in the oracle's HAVING), pair counts by the q41 narrow expansion,
    * sim = n_both/(√n_i·√n_j) one fixed double tree, top-10 neighbors
    * per part with (sim desc, neighbor asc) total-order ties. Ranks
    * computed on UNROUNDED sims on both engines; output rounds at 6 dp.
    */
  val q81 = QueryDef(
    "q81_item_recs",
    s"""WITH b AS MATERIALIZED (SELECT DISTINCT o_custkey AS e, l_partkey AS i
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |k AS MATERIALIZED (SELECT e FROM b GROUP BY e
       |  HAVING count(*) BETWEEN 2 AND $RecsMaxBasket),
       |kb AS MATERIALIZED (SELECT b.e, b.i FROM b JOIN k USING (e)),
       |ni AS MATERIALIZED (SELECT i AS item, CAST(count(*) AS BIGINT) AS n_item
       |  FROM kb GROUP BY 1),
       |pr AS MATERIALIZED (SELECT x.i AS a, y.i AS b2, CAST(count(*) AS BIGINT) AS n_both
       |  FROM kb x JOIN kb y ON x.e = y.e AND x.i < y.i
       |  GROUP BY 1, 2 HAVING count(*) >= $RecsMinBoth),
       |d AS (SELECT a AS item, b2 AS neighbor, n_both FROM pr
       |  UNION ALL SELECT b2, a, n_both FROM pr),
       |enr AS (SELECT d.item, d.neighbor, d.n_both,
       |  i1.n_item AS n_item, i2.n_item AS n_neighbor,
       |  CAST(d.n_both AS DOUBLE)
       |    / (sqrt(CAST(i1.n_item AS DOUBLE)) * sqrt(CAST(i2.n_item AS DOUBLE))) AS s
       |  FROM d JOIN ni i1 ON d.item = i1.item JOIN ni i2 ON d.neighbor = i2.item),
       |r AS (SELECT item, neighbor, n_both, n_item, n_neighbor, s,
       |  CAST(row_number() OVER (PARTITION BY item ORDER BY s DESC, neighbor) AS BIGINT)
       |    AS rank FROM enr)
       |SELECT item, neighbor, n_both, n_item, n_neighbor,
       |  ${mr("s", 6)} AS sim, rank
       |FROM r WHERE rank <= $RecsTopK ORDER BY item, rank""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val baskets = Tables(s, dir, "orders")
      .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    graft.operators.Relational.itemSimilarity(baskets, "o_custkey", "l_partkey",
        topK = RecsTopK, minBoth = RecsMinBoth, maxBasket = RecsMaxBasket)
      .withColumn("sim", Rounding.mirrorRound(col("sim"), 6))
      .orderBy("item", "rank")
  }

  /** q82: Benford first-digit audit of line prices per return flag
    * ([[graft.operators.Relational.benfordScan]]) — amounts snap to
    * cents, the first digit is the leading character of the exact
    * integer's decimal string (never float log10), the COMPLETE 1–9
    * grid reports per group (q58's zero-cell principle) and the
    * expected fraction ln(1+1/d)/ln 10 plus the per-digit chi²
    * contribution evaluate as fixed double trees on both engines.
    */
  val q82 = QueryDef(
    "q82_benford",
    """WITH u AS (SELECT l_returnflag,
      |  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS u
      |  FROM lineitem),
      |c AS (SELECT l_returnflag,
      |  CAST(substr(CAST(u AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM u WHERE u >= 1 GROUP BY 1, 2),
      |t AS (SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
      |g AS (SELECT t.l_returnflag, d.digit, t.tot
      |  FROM t CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7,8,9]::BIGINT[]) AS digit) d),
      |j AS (SELECT g.l_returnflag, g.digit, coalesce(c.n, 0) AS n, g.tot,
      |  ln(1.0 + 1.0 / CAST(g.digit AS DOUBLE)) / ln(10.0) AS ef
      |  FROM g LEFT JOIN c ON g.l_returnflag = c.l_returnflag AND g.digit = c.digit)
      |SELECT l_returnflag, digit, CAST(n AS BIGINT) AS n,
      |  (floor((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
      |    AS frac,
      |  (floor(ef * 1000000.0 + 0.5) / 1000000.0) AS expected_frac,
      |  (floor(((CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * ef)
      |          * (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * ef)
      |          / (CAST(tot AS DOUBLE) * ef)) * 1000000.0 + 0.5) / 1000000.0)
      |    AS chi2_term
      |FROM j ORDER BY l_returnflag, digit""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.benfordScan(Tables(s, dir, "lineitem"),
        Seq("l_returnflag"), col("l_extendedprice"), scale = 100L)
      .withColumn("frac", Rounding.mirrorRound(col("frac"), 6))
      .withColumn("expected_frac", Rounding.mirrorRound(col("expected_frac"), 6))
      .withColumn("chi2_term", Rounding.mirrorRound(col("chi2_term"), 6))
      .orderBy("l_returnflag", "digit")
  }

  /** q83: Spearman rank correlation between account balance and total
    * spend per market segment ([[graft.operators.Relational
    * .spearmanCorr]]) — [[graft.operators.Relational.pearsonCorr]] over
    * DOUBLED average ranks (2·rank + tieCount − 1, an exact integer for
    * tie runs), so every sufficient statistic stays an exact long sum
    * and rho is scale-invariant under the ×2; per-customer spend builds
    * EXACTLY upstream as cent-long sums (the q56 discipline). Oracle
    * mirrors the rank windows (DuckDB rank() = min rank, same as Spark)
    * and the Pearson closed form verbatim.
    */
  val q83 = QueryDef(
    "q83_spearman",
    """WITH spend AS (SELECT o_custkey,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
      |j AS (SELECT c_mktsegment,
      |  CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS xu, cents AS yu
      |  FROM spend JOIN customer ON o_custkey = c_custkey
      |  WHERE c_acctbal IS NOT NULL AND cents IS NOT NULL),
      |r AS (SELECT c_mktsegment,
      |  2 * rank() OVER (PARTITION BY c_mktsegment ORDER BY xu)
      |    + count(*) OVER (PARTITION BY c_mktsegment, xu) - 1 AS rx,
      |  2 * rank() OVER (PARTITION BY c_mktsegment ORDER BY yu)
      |    + count(*) OVER (PARTITION BY c_mktsegment, yu) - 1 AS ry
      |  FROM j),
      |s AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(rx) AS DOUBLE) AS sx, CAST(sum(ry) AS DOUBLE) AS sy,
      |  CAST(sum(rx*rx) AS DOUBLE) AS sxx, CAST(sum(ry*ry) AS DOUBLE) AS syy,
      |  CAST(sum(rx*ry) AS DOUBLE) AS sxy
      |  FROM r GROUP BY 1),
      |t AS (SELECT c_mktsegment, n,
      |  (CAST(n AS DOUBLE)*sxx - sx*sx) AS dx,
      |  (CAST(n AS DOUBLE)*syy - sy*sy) AS dy,
      |  (CAST(n AS DOUBLE)*sxy - sx*sy) AS num
      |  FROM s)
      |SELECT c_mktsegment, n,
      |  (floor((num / (sqrt(dx) * sqrt(dy))) * 1000000.0 + 0.5) / 1000000.0) AS rho
      |FROM t WHERE n >= 2 AND dx > 0 AND dy > 0
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val spend = Tables(s, dir, "orders")
      .filter(col("o_totalprice").isNotNull)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("_c"))
      .groupBy("o_custkey").agg(sum("_c").cast("long").as("cents"))
    val joined = spend.join(Tables(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
    graft.operators.Relational.spearmanCorr(joined, Seq("c_mktsegment"),
        col("c_acctbal"), col("cents"), scaleX = 100L, scaleY = 1L)
      .withColumn("rho", Rounding.mirrorRound(col("rho"), 6))
      .orderBy("c_mktsegment")
  }

  private val SsspRounds = 3
  private val SsspSeedMod = 20

  // generated Bellman-Ford relaxation rounds — full relaxation per round
  // is provably round-equivalent to the engine's frontier delta iteration
  // (an unimproved node re-sends values that cannot win a min)
  private def ssspRoundSql(r: Int): String =
    s"""s$r AS MATERIALIZED (SELECT node, min(dist) AS dist FROM
       |  (SELECT node, dist FROM s${r - 1}
       |   UNION ALL SELECT e.v AS node, d.dist + e.w AS dist
       |   FROM s${r - 1} d JOIN e ON d.node = e.u) GROUP BY 1)""".stripMargin

  /** q84: weighted shortest paths over the supplier—part supply graph
    * ([[graft.operators.Graph.shortestPaths]]) — Bellman-Ford with 3
    * fixed relaxation rounds from the mod-20 supplier seed set; node
    * ids are namespaced strings ('s'||key, 'p'||key — the two key
    * spaces collide numerically), weights are snapped integer
    * quantities (min over parallel edges on entry), every distance an
    * exact long. The oracle unrolls the same rounds as GENERATED
    * materialized CTEs; the engine's frontier delta iteration is
    * round-equivalent to the oracle's full relaxation by the min-merge
    * argument in the operator's contract.
    */
  val q84 = QueryDef(
    "q84_shortest_paths",
    s"""WITH e0 AS MATERIALIZED (SELECT
       |  's' || CAST(l_suppkey AS VARCHAR) AS u,
       |  'p' || CAST(l_partkey AS VARCHAR) AS v,
       |  CAST(min(CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT)) AS BIGINT) AS w
       |  FROM lineitem
       |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
       |    AND l_quantity IS NOT NULL
       |  GROUP BY 1, 2),
       |e AS MATERIALIZED (SELECT u, v, w FROM e0
       |  UNION ALL SELECT v AS u, u AS v, w FROM e0),
       |s0 AS MATERIALIZED (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node,
       |  CAST(0 AS BIGINT) AS dist FROM supplier WHERE s_suppkey % $SsspSeedMod = 0),
       |${(1 to SsspRounds).map(ssspRoundSql).mkString(",\n")}
       |SELECT node, dist FROM s$SsspRounds ORDER BY node""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("u"),
        concat(lit("p"), col("l_partkey").cast("string")).as("v"),
        floor(col("l_quantity") * lit(1.0) + lit(0.5)).cast("long").as("w"))
    val sym = li.union(li.select(col("v").as("u"), col("u").as("v"), col("w")))
    val seeds = Tables(s, dir, "supplier")
      .filter(col("s_suppkey") % SsspSeedMod === 0)
      .select(concat(lit("s"), col("s_suppkey").cast("string")).as("seed"))
    graft.operators.Graph.shortestPaths(sym, "u", "v", "w",
        seeds, "seed", rounds = SsspRounds)
      .orderBy("node")
  }

  private val SkewTopN = 20

  /** q85: join-key skew report over lineitem's part key
    * ([[graft.operators.Relational.keySkewReport]]) — the pre-join
    * diagnostic that sizes AQE skew splits and [[graft.operators
    * .Relational.saltedJoin]] salt counts: top-20 hottest keys with
    * share and ratio-to-mean (the skew factor), global denominators on
    * every row; counts exact longs, the two ratios fixed double trees,
    * ties at equal count broken on the key — total order, so the top-20
    * SET is bit-identical cross-engine.
    */
  val q85 = QueryDef(
    "q85_skew_report",
    s"""WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows
       |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
       |s AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
       |  CAST(count(*) AS BIGINT) AS n_keys FROM c),
       |t AS (SELECT l_partkey, n_rows,
       |  CAST(row_number() OVER (ORDER BY n_rows DESC, l_partkey) AS BIGINT) AS rank
       |  FROM c)
       |SELECT rank, l_partkey, n_rows,
       |  (floor((CAST(n_rows AS DOUBLE) / CAST(n_rows_total AS DOUBLE)) * 1000000.0 + 0.5)
       |    / 1000000.0) AS share,
       |  (floor((CAST(n_rows AS DOUBLE)
       |          / (CAST(n_rows_total AS DOUBLE) / CAST(n_keys AS DOUBLE))) * 1000000.0 + 0.5)
       |    / 1000000.0) AS ratio_to_mean,
       |  n_rows_total, n_keys
       |FROM t CROSS JOIN s WHERE rank <= $SkewTopN ORDER BY rank""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.keySkewReport(Tables(s, dir, "lineitem"),
        Seq("l_partkey"), topN = SkewTopN)
      .withColumn("share", Rounding.mirrorRound(col("share"), 6))
      .withColumn("ratio_to_mean", Rounding.mirrorRound(col("ratio_to_mean"), 6))
      .orderBy("rank")
  }

  /** q86: order-independent table checksum per order status
    * ([[graft.operators.Relational.tableChecksum]]) — the
    * migration-validation primitive that pairs with q79: each row folds
    * to the t04 polynomial fingerprint of its canonical string (key,
    * status, snapped cents — doubles never stringify), fingerprints SUM
    * per group in DECIMAL(38,0) (exact in any order — DuckDB's HUGEINT
    * mirror), one mod at the end. Two engines computing the same
    * checksum from independently-stored copies IS the verification
    * story, run here as the oracle lane.
    */
  val q86 = QueryDef(
    "q86_table_checksum",
    s"""WITH s AS (SELECT o_orderstatus,
       |  coalesce(CAST(o_orderkey AS VARCHAR), '') || '|' ||
       |  coalesce(o_orderstatus, '') || '|' ||
       |  coalesce(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), '')
       |    AS rs
       |  FROM orders),
       |h AS (SELECT o_orderstatus,
       |  ${graft.functions.Signatures.sqlPolyHashStr("rs")} AS fp FROM s)
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CAST(fp AS HUGEINT)) % 1000000007 AS BIGINT) AS checksum
       |FROM h GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.operators.Relational.tableChecksum(Tables(s, dir, "orders"),
        Seq("o_orderstatus"),
        Seq(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")))
      .orderBy("o_orderstatus")
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

  /** q89: audience overlap matrix between event types
    * ([[graft.operators.Relational.setOverlap]]) — jaccard / overlap
    * coefficient / cosine per type pair from the capped basket
    * machinery; single-type users still count toward audience sizes
    * (only pair GENERATION needs ≥ 2), which the oracle's self-join
    * reproduces structurally. All scores single divisions of exact
    * longs, rounded 6 dp both sides.
    */
  val q89 = QueryDef(
    "q89_audience_overlap",
    s"""WITH b AS (SELECT DISTINCT user_id AS e, event_type AS i FROM events
       |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |bk AS (SELECT e FROM b GROUP BY e HAVING count(*) <= 1000),
       |kb AS (SELECT b.e, b.i FROM b JOIN bk USING (e)),
       |ni AS (SELECT i AS item, CAST(count(*) AS BIGINT) AS n FROM kb GROUP BY 1),
       |pr AS (SELECT x.i AS item_a, y.i AS item_b, CAST(count(*) AS BIGINT) AS n_both
       |  FROM kb x JOIN kb y ON x.e = y.e AND x.i < y.i GROUP BY 1, 2)
       |SELECT item_a, item_b, n_both, na.n AS n_a, nb.n AS n_b,
       |  ${mr("CAST(n_both AS DOUBLE) / CAST(na.n + nb.n - n_both AS DOUBLE)", 6)} AS jaccard,
       |  ${mr("CAST(n_both AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE)", 6)} AS overlap,
       |  ${mr("CAST(n_both AS DOUBLE) / (sqrt(CAST(na.n AS DOUBLE)) * sqrt(CAST(nb.n AS DOUBLE)))", 6)} AS cosine
       |FROM pr JOIN ni na ON pr.item_a = na.item JOIN ni nb ON pr.item_b = nb.item
       |ORDER BY item_a, item_b""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.setOverlap(Tables.events(s, dir),
        "user_id", "event_type", minBoth = 1L, maxBasket = 1000)
      .withColumn("jaccard", Rounding.mirrorRound(col("jaccard"), 6))
      .withColumn("overlap", Rounding.mirrorRound(col("overlap"), 6))
      .withColumn("cosine", Rounding.mirrorRound(col("cosine"), 6))
      .orderBy("item_a", "item_b")
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

  private val WpProbs = Seq((1, 2), (9, 10), (99, 100))

  /** q91: quantity-weighted price percentiles per return flag
    * ([[graft.operators.Relational.weightedPercentiles]]) — the
    * weighted order statistic with q63's pure-integer crossing test
    * (den·cum ≥ num·tot over exact longs; probs are RATIONALS so no
    * float threshold exists to disagree), selected from the q60/q67
    * histogram shape: the corpus never sorts, the cumulative window
    * orders |distinct cents| rows per group.
    */
  val q91 = QueryDef(
    "q91_weighted_median",
    s"""WITH h AS (SELECT l_returnflag,
       |  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS u,
       |  CAST(sum(CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT)) AS BIGINT) AS w
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
       |    AND CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT) > 0
       |  GROUP BY 1, 2),
       |c AS (SELECT l_returnflag, u,
       |  sum(w) OVER (PARTITION BY l_returnflag ORDER BY u
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM h),
       |t AS (SELECT l_returnflag, CAST(sum(w) AS BIGINT) AS tot FROM h GROUP BY 1),
       |p AS (SELECT * FROM (VALUES ${WpProbs.map(p => s"(${p._1}, ${p._2})").mkString(", ")})
       |      pp(p_num, p_den))
       |SELECT c.l_returnflag, CAST(p_num AS BIGINT) AS p_num,
       |  CAST(p_den AS BIGINT) AS p_den, CAST(min(u) AS BIGINT) AS value_units
       |FROM c JOIN t USING (l_returnflag) CROSS JOIN p
       |WHERE c.cum * p_den >= t.tot * p_num
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
    graft.operators.Relational.weightedPercentiles(Tables(s, dir, "lineitem"),
        Seq("l_returnflag"), col("l_extendedprice"), col("l_quantity"),
        WpProbs, valueScale = 100L, weightScale = 1L)
      .orderBy("l_returnflag", "p_num", "p_den")
  }

  private val AaMaxCenterDeg = 60
  private val AaMinCommon = 2L

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

  /** q92: Adamic–Adar link prediction over the q81 co-purchase item graph
    * ([[graft.operators.Graph.adamicAdar]]) — non-adjacent part pairs
    * sharing >= `AaMinCommon` co-purchase neighbors, scored by
    * Σ 1/ln(deg z). Wedge centers are degree-capped at `AaMaxCenterDeg`
    * (the operator's hub/skew guard), mirrored in the oracle so the
    * verified equality holds exactly as computed.
    */
  val q92 = QueryDef(
    "q92_link_prediction",
    s"""WITH b AS MATERIALIZED (SELECT DISTINCT o_custkey AS e, l_partkey AS i
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |k AS (SELECT e FROM b GROUP BY e
       |  HAVING count(*) BETWEEN 2 AND $RecsMaxBasket),
       |kb AS MATERIALIZED (SELECT b.e, b.i FROM b JOIN k USING (e)),
       |pr AS MATERIALIZED (SELECT x.i AS pa, y.i AS pb
       |  FROM kb x JOIN kb y ON x.e = y.e AND x.i < y.i
       |  GROUP BY 1, 2 HAVING count(*) >= $RecsMinBoth),
       |und AS MATERIALIZED (SELECT pa AS z, pb AS n FROM pr
       |  UNION ALL SELECT pb, pa FROM pr),
       |deg AS MATERIALIZED (SELECT z, count(*) AS d FROM und GROUP BY 1),
       |ctr AS (SELECT und.z, und.n, deg.d FROM und JOIN deg USING (z)
       |  WHERE deg.d BETWEEN 2 AND $AaMaxCenterDeg),
       |w AS (SELECT e1.n AS node_a, e2.n AS node_b, e1.d AS dz
       |  FROM ctr e1 JOIN ctr e2 ON e1.z = e2.z AND e1.n < e2.n),
       |s AS (SELECT node_a, node_b, CAST(count(*) AS BIGINT) AS n_common,
       |  sum(1.0 / ln(CAST(dz AS DOUBLE))) AS aa
       |  FROM w GROUP BY 1, 2 HAVING count(*) >= $AaMinCommon)
       |SELECT node_a, node_b, n_common, ${mr("aa", 6)} AS aa_score
       |FROM s WHERE NOT EXISTS (SELECT 1 FROM pr
       |  WHERE pr.pa = s.node_a AND pr.pb = s.node_b)
       |ORDER BY node_a, node_b""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val baskets = Tables(s, dir, "orders")
      .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    val edges = graft.operators.Relational.cooccurrence(baskets, "o_custkey",
        "l_partkey", maxBasket = RecsMaxBasket)
      .filter(col("n_entities") >= RecsMinBoth)
    graft.operators.Graph.adamicAdar(edges, "item_a", "item_b",
        maxCenterDeg = AaMaxCenterDeg, minCommon = AaMinCommon)
      .withColumn("aa_score", Rounding.mirrorRound(col("aa_score"), 6))
      .orderBy("node_a", "node_b")
  }

  /** q94: Theil–Sen robust daily trend per event type
    * ([[graft.operators.Relational.theilSen]]) — median pairwise slope +
    * median residual intercept, every slope ONE division of exact longs
    * and both medians rank-selected, so the result is BIT-exact
    * cross-engine with no rounding anywhere (the q69/q77 contract on an
    * order statistic). The oracle replays pair generation as a rank
    * self-join (the slope multiset is symmetric, so any pair enumeration
    * agrees) and both rank selections verbatim.
    */
  val q94 = QueryDef(
    "q94_theil_sen", {
      val lower = "CAST(floor((cnt + 1) / 2.0) AS BIGINT)"
      val upper = "CAST(floor(cnt / 2.0) AS BIGINT) + 1"
      s"""WITH p AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, epoch_ms(ts) AS cx,
         |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cy
         |  FROM events
         |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL),
         |r AS (SELECT p.*, row_number() OVER (PARTITION BY event_type, day
         |        ORDER BY cx, cy) AS prn FROM p),
         |sl AS (SELECT a.event_type, a.day,
         |         CAST(b.cy - a.cy AS DOUBLE) / CAST(b.cx - a.cx AS DOUBLE) AS s
         |       FROM r a JOIN r b ON a.event_type = b.event_type
         |         AND a.day = b.day AND a.prn < b.prn
         |       WHERE a.cx <> b.cx),
         |sr AS (SELECT sl.*, row_number() OVER (PARTITION BY event_type, day
         |         ORDER BY s) AS rn,
         |         count(*) OVER (PARTITION BY event_type, day) AS cnt FROM sl),
         |med AS (SELECT event_type, day, CAST(max(cnt) AS BIGINT) AS n_slopes,
         |          sum(CASE WHEN rn = $lower OR rn = $upper THEN s END)
         |            / CAST(sum(CASE WHEN rn = $lower OR rn = $upper
         |                THEN 1 ELSE 0 END) AS DOUBLE) AS slope
         |        FROM sr GROUP BY 1, 2),
         |res AS (SELECT p.event_type, p.day, med.slope, med.n_slopes,
         |          CAST(p.cy AS DOUBLE) - med.slope * CAST(p.cx AS DOUBLE) AS rr
         |        FROM p JOIN med USING (event_type, day)),
         |rr2 AS (SELECT res.*, row_number() OVER (PARTITION BY event_type, day
         |          ORDER BY rr) AS rn,
         |          count(*) OVER (PARTITION BY event_type, day) AS cnt FROM res),
         |fin AS (SELECT event_type, day, CAST(max(cnt) AS BIGINT) AS n_points,
         |          CAST(max(n_slopes) AS BIGINT) AS n_slopes,
         |          max(slope) AS slope,
         |          sum(CASE WHEN rn = $lower OR rn = $upper THEN rr END)
         |            / CAST(sum(CASE WHEN rn = $lower OR rn = $upper
         |                THEN 1 ELSE 0 END) AS DOUBLE) AS intercept
         |        FROM rr2 GROUP BY 1, 2)
         |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
         |  n_points, n_slopes, slope, intercept
         |FROM fin ORDER BY event_type, day""".stripMargin
    }) { (s, dir) =>
    graft.operators.Relational.theilSen(
        Tables.events(s, dir)
          .filter(col("event_type").isNotNull)
          .withColumn("day", to_date(col("ts"))),
        groupCols = Seq("event_type", "day"),
        xCol = unix_millis(col("ts")), yCol = col("value"),
        maxN = 2000, scaleX = 1L, scaleY = 100L)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .orderBy("event_type", "day")
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

  /** q96: q08's top-k-per-group through the MERGEABLE bounded-heap
    * aggregate ([[graft.functions.TopKAggregate]]) instead of the
    * window sort — ObjectHashAggregate partial/final, shuffle carries
    * ≤ k pairs per (group, map task), no per-group full sort. The
    * oracle is the window formulation with the aggregate's
    * deterministic (score, id) DESC tie-break: both must agree row
    * for row.
    */
  val q96 = QueryDef(
    "q96_topk_heap",
    """SELECT p_brand, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY p_retailprice DESC, p_partkey DESC) AS rn
      |  FROM part) t
      |WHERE rn <= 3 ORDER BY p_brand, p_retailprice DESC, p_partkey""".stripMargin) { (s, dir) =>
    graft.functions.TopKAggregate.register(s)
    Tables(s, dir, "part")
      .groupBy("p_brand")
      .agg(graft.functions.TopKAggregate.topK(
        col("p_retailprice"), col("p_partkey"), lit(3)).as("top"))
      .select(col("p_brand"), explode(col("top")).as("e"))
      .select(col("p_brand"), col("e.id").as("p_partkey"),
        col("e.score").as("p_retailprice"))
      .orderBy(col("p_brand"), desc("p_retailprice"), col("p_partkey"))
  }

  /** q97: interval-overlap join between each user's CLICK sessions and
    * VIEW sessions ("was the user browsing while clicking") through
    * [[graft.operators.Relational.intervalOverlapJoin]] — grid-cell
    * equi-join + exactly-once reporting-cell emission, no nested loop,
    * no post-join distinct. The oracle states the same semantics as a
    * raw inequality join (fine for DuckDB at sf0.01; the cell plan is
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
    graft.operators.Relational.intervalOverlapJoin(
        sessions("click", "a"), sessions("view", "b"),
        col("a_user"), col("b_user"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"),
        cellWidth = 86400000L)
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

  val queries: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15, q16,
      q17, q18, q24, q25, q26, q33, q34, q35, q36, q37, q38, q39, q40, q41, q42, q43,
      q44, q45, q46, q47, q48, q49, q50, q51, q52, q53, q55, q56, q57, q58, q59, q60,
      q61, q62, q63, q64, q65, q66, q67, q68, q69, q70, q71, q72, q73, q74, q75, q76,
      q77, q78, q79, q80, q81, q82, q83, q84, q85, q86, q87, q88, q89, q90, q91, q92,
      q93, q94, q95, q96, q97, q98, q99, q100, q101)
}
