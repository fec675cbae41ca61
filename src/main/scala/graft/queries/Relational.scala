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


  /** q107: cohort retention matrix (Q95) — the classic product-analytics
    * triangle: customers grouped by FIRST-ORDER month (the cohort), and
    * for every (cohort, months-since) cell the count of distinct
    * customers active in that month, plus the retention fraction
    * against the cohort's size (its months_since = 0 cell, where every
    * member appears by construction). ALL calendar arithmetic is exact
    * integers — ym = year·12 + (month−1), cohort = min(ym) per
    * customer, months_since = ym − cohort — so the only float is the
    * final mirror-rounded ratio. Scale shape: one (custkey, ym)
    * partial-agg dedup, a custkey-keyed join of per-customer cohorts
    * (both sides corpus-keyed — the standard shuffle), a
    * (cohort, months_since) partial agg over ALREADY-DEDUPED pairs
    * (countDistinct would re-shuffle; distinct-then-count keeps the
    * cell agg a plain count), and a broadcast of the \|cohorts\|-row
    * size table.
    */
  val q107 = QueryDef(
    "q107_cohort_retention",
    s"""WITH o AS (SELECT DISTINCT o_custkey,
       |    year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS ym
       |  FROM orders),
       |c AS (SELECT o_custkey, min(ym) AS cym FROM o GROUP BY 1),
       |cell AS (SELECT cym, ym - cym AS months_since,
       |    count(*) AS n_customers
       |  FROM o JOIN c USING (o_custkey) GROUP BY 1, 2),
       |sz AS (SELECT cym, n_customers AS n_cohort FROM cell
       |       WHERE months_since = 0)
       |SELECT CAST(cym // 12 AS BIGINT) AS cohort_year,
       |  CAST(cym % 12 + 1 AS BIGINT) AS cohort_month,
       |  CAST(months_since AS BIGINT) AS months_since,
       |  CAST(n_customers AS BIGINT) AS n_customers,
       |  CAST(n_cohort AS BIGINT) AS n_cohort,
       |  ${mr("n_customers * 1.0 / n_cohort", 4)} AS retention
       |FROM cell JOIN sz USING (cym)
       |ORDER BY cohort_year, cohort_month, months_since""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir, "orders").select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("ym"))
      .distinct()
    val c = o.groupBy("o_custkey").agg(min("ym").as("cym"))
    val cell = o.join(c, "o_custkey")
      .groupBy(col("cym"), (col("ym") - col("cym")).as("months_since"))
      .agg(count(lit(1)).as("n_customers"))
    val size = cell.filter(col("months_since") === 0)
      .select(col("cym"), col("n_customers").as("n_cohort"))
    cell.join(broadcast(size), "cym")
      .select(expr("cym div 12").cast("long").as("cohort_year"),
        (col("cym") % 12 + 1).cast("long").as("cohort_month"),
        col("months_since").cast("long").as("months_since"),
        col("n_customers"), col("n_cohort"),
        graft.functions.Rounding.mirrorRound(
          col("n_customers") * 1.0 / col("n_cohort"), 4).as("retention"))
      .orderBy("cohort_year", "cohort_month", "months_since")
  }

  /** Full relational registry: this file's core queries plus the family
    * files the round-7 split moved out (RelationalGraph / RelationalStats
    * / RelationalTimeseries). Same QueryDef set as before the split.
    */
  val queries: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15, q16, q17, q18, q24, q25, q26, q33, q34, q35, q37, q38, q39, q40, q42, q46, q47, q51, q89, q96, q107) ++
      RelationalGraph.queries ++ RelationalStats.queries ++
      RelationalTimeseries.queries
}
