package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.sources.Tables

/** Statistics query family (split from Relational.scala in round 7):
  * outliers, trend, heavy hitters, correlation, Gini/HHI, chi-square,
  * bins, A/B tests, RFM, Pareto, mutual information, winsorize, MAD,
  * KS test, autocorrelation, profiling, expectations, Benford, Spearman,
  * skew report, checksums, weighted median, Theil-Sen. One-pass partial
  * aggregations wherever the statistic allows; exact rank selection where
  * it does not (medians/percentile surfaces), always tie-order free.
  */
object RelationalStats {

  private val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

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
    // all three metrics' quintile cutpoints from ONE unpivoted histogram
    // pass (multiQuantileCuts) instead of three sequential quantileBins
    // calls — same exact cut values (same snap, same inclusive rank
    // criterion), 3 driver actions instead of 9 (26 → ~13 driver jobs).
    // The bin assignment below is quantileBins' own #{cutpoints < v}
    // narrow pass, stated inline over the same snapped units.
    val cuts = graft.operators.Relational.multiQuantileCuts(base,
      Seq("r_days" -> col("r_days"), "f" -> col("f"), "m_cents" -> col("m_cents")),
      ps, scale = 1L)
    // bin assignment via the operator's OWN shared criterion (ADVICE
    // r13: the inlined snap/criterion copy could drift silently)
    val binned = Seq(("r_days", "r_bin"), ("f", "f_bin"), ("m_cents", "m_bin"))
      .foldLeft(base) { case (df, (metric, bin)) =>
        df.withColumn(bin, graft.operators.Relational.binAssign(
          col(metric), cuts(metric), scale = 1L))
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
      // onOversize = Bucket(16) (VERDICT r12 item 7): groups inside the
      // quadratic guard get the EXACT fit, bit for bit (their single
      // bucket makes the outer rank medians an IEEE identity — (x+x)/2
      // = x); groups past it auto-degrade to the q105 median-of-buckets
      // estimator instead of failing, which is what makes this query
      // sf1-GREEN on both sides: the operator no longer raises, and the
      // oracle's pairwise self-join is bounded per (group, bucket)
      // instead of quadratic in a 6.9k-point group.
      val lower = "CAST(floor((cnt + 1) / 2.0) AS BIGINT)"
      val upper = "CAST(floor(cnt / 2.0) AS BIGINT) + 1"
      val blower = "CAST(floor((bc + 1) / 2.0) AS BIGINT)"
      val bupper = "CAST(floor(bc / 2.0) AS BIGINT) + 1"
      s"""WITH p0 AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, epoch_ms(ts) AS cx,
         |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cy
         |  FROM events
         |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL),
         |gs AS (SELECT event_type, day, count(*) AS gn FROM p0 GROUP BY 1, 2),
         |p AS (SELECT p0.*, CASE WHEN gs.gn > 2000 THEN p0.cx % 16 ELSE 0 END AS bkt
         |      FROM p0 JOIN gs USING (event_type, day)),
         |r AS (SELECT p.*, row_number() OVER (PARTITION BY event_type, day, bkt
         |        ORDER BY cx, cy) AS prn FROM p),
         |sl AS (SELECT a.event_type, a.day, a.bkt,
         |         CAST(b.cy - a.cy AS DOUBLE) / CAST(b.cx - a.cx AS DOUBLE) AS s
         |       FROM r a JOIN r b ON a.event_type = b.event_type
         |         AND a.day = b.day AND a.bkt = b.bkt AND a.prn < b.prn
         |       WHERE a.cx <> b.cx),
         |sr AS (SELECT sl.*, row_number() OVER (PARTITION BY event_type, day, bkt
         |         ORDER BY s) AS rn,
         |         count(*) OVER (PARTITION BY event_type, day, bkt) AS cnt FROM sl),
         |med AS (SELECT event_type, day, bkt, CAST(max(cnt) AS BIGINT) AS n_slopes,
         |          sum(CASE WHEN rn = $lower OR rn = $upper THEN s END)
         |            / CAST(sum(CASE WHEN rn = $lower OR rn = $upper
         |                THEN 1 ELSE 0 END) AS DOUBLE) AS slope
         |        FROM sr GROUP BY 1, 2, 3),
         |res AS (SELECT p.event_type, p.day, p.bkt, med.slope, med.n_slopes,
         |          CAST(p.cy AS DOUBLE) - med.slope * CAST(p.cx AS DOUBLE) AS rr
         |        FROM p JOIN med USING (event_type, day, bkt)),
         |rr2 AS (SELECT res.*, row_number() OVER (PARTITION BY event_type, day, bkt
         |          ORDER BY rr) AS rn,
         |          count(*) OVER (PARTITION BY event_type, day, bkt) AS cnt FROM res),
         |bfin AS (SELECT event_type, day, bkt, CAST(max(cnt) AS BIGINT) AS n_points,
         |          CAST(max(n_slopes) AS BIGINT) AS n_slopes,
         |          max(slope) AS slope,
         |          sum(CASE WHEN rn = $lower OR rn = $upper THEN rr END)
         |            / CAST(sum(CASE WHEN rn = $lower OR rn = $upper
         |                THEN 1 ELSE 0 END) AS DOUBLE) AS intercept
         |        FROM rr2 GROUP BY 1, 2, 3),
         |bs AS (SELECT bfin.*,
         |         row_number() OVER (PARTITION BY event_type, day ORDER BY slope) AS srn,
         |         row_number() OVER (PARTITION BY event_type, day ORDER BY intercept) AS irn,
         |         count(*) OVER (PARTITION BY event_type, day) AS bc FROM bfin),
         |fin AS (SELECT event_type, day,
         |          CAST(sum(n_points) AS BIGINT) AS n_points,
         |          CAST(sum(n_slopes) AS BIGINT) AS n_slopes,
         |          (sum(CASE WHEN srn = $blower THEN slope END)
         |            + sum(CASE WHEN srn = $bupper THEN slope END)) / 2.0 AS slope,
         |          (sum(CASE WHEN irn = $blower THEN intercept END)
         |            + sum(CASE WHEN irn = $bupper THEN intercept END)) / 2.0 AS intercept
         |        FROM bs GROUP BY 1, 2)
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
        maxN = 2000, scaleX = 1L, scaleY = 100L,
        onOversize = graft.operators.Relational.OversizeMode.Bucket(16))
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .orderBy("event_type", "day")
  }

  /** q105: median-of-buckets Theil–Sen
    * ([[graft.operators.Relational.theilSenBucketed]]) — q94's shape
    * made sf1-SAFE: past the quadratic-fit guard the group splits into
    * 16 deterministic hash buckets (snapped-x mod 16, pure integer
    * arithmetic), the exact fit runs per bucket, and the group's
    * slope/intercept are the rank-rule medians of the bucket fits. The
    * oracle replays the bucket split, every per-bucket pair join, and
    * BOTH outer rank medians verbatim — so this stays value-exact
    * cross-engine at every SF, including the decade where q94's guard
    * fires by design.
    */
  val q105 = QueryDef(
    "q105_theil_sen_bucketed", {
      val lower = "CAST(floor((cnt + 1) / 2.0) AS BIGINT)"
      val upper = "CAST(floor(cnt / 2.0) AS BIGINT) + 1"
      val blower = "CAST(floor((bc + 1) / 2.0) AS BIGINT)"
      val bupper = "CAST(floor(bc / 2.0) AS BIGINT) + 1"
      s"""WITH p AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, epoch_ms(ts) AS cx,
         |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cy,
         |         epoch_ms(ts) % 16 AS bkt
         |  FROM events
         |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL),
         |r AS (SELECT p.*, row_number() OVER (PARTITION BY event_type, day, bkt
         |        ORDER BY cx, cy) AS prn FROM p),
         |sl AS (SELECT a.event_type, a.day, a.bkt,
         |         CAST(b.cy - a.cy AS DOUBLE) / CAST(b.cx - a.cx AS DOUBLE) AS s
         |       FROM r a JOIN r b ON a.event_type = b.event_type
         |         AND a.day = b.day AND a.bkt = b.bkt AND a.prn < b.prn
         |       WHERE a.cx <> b.cx),
         |sr AS (SELECT sl.*, row_number() OVER (PARTITION BY event_type, day, bkt
         |         ORDER BY s) AS rn,
         |         count(*) OVER (PARTITION BY event_type, day, bkt) AS cnt FROM sl),
         |med AS (SELECT event_type, day, bkt, CAST(max(cnt) AS BIGINT) AS n_slopes,
         |          sum(CASE WHEN rn = $lower OR rn = $upper THEN s END)
         |            / CAST(sum(CASE WHEN rn = $lower OR rn = $upper
         |                THEN 1 ELSE 0 END) AS DOUBLE) AS slope
         |        FROM sr GROUP BY 1, 2, 3),
         |res AS (SELECT p.event_type, p.day, p.bkt, med.slope, med.n_slopes,
         |          CAST(p.cy AS DOUBLE) - med.slope * CAST(p.cx AS DOUBLE) AS rr
         |        FROM p JOIN med USING (event_type, day, bkt)),
         |rr2 AS (SELECT res.*, row_number() OVER (PARTITION BY event_type, day, bkt
         |          ORDER BY rr) AS rn,
         |          count(*) OVER (PARTITION BY event_type, day, bkt) AS cnt FROM res),
         |bfin AS (SELECT event_type, day, bkt, CAST(max(cnt) AS BIGINT) AS n_points,
         |          CAST(max(n_slopes) AS BIGINT) AS n_slopes,
         |          max(slope) AS slope,
         |          sum(CASE WHEN rn = $lower OR rn = $upper THEN rr END)
         |            / CAST(sum(CASE WHEN rn = $lower OR rn = $upper
         |                THEN 1 ELSE 0 END) AS DOUBLE) AS intercept
         |        FROM rr2 GROUP BY 1, 2, 3),
         |bs AS (SELECT bfin.*,
         |         row_number() OVER (PARTITION BY event_type, day ORDER BY slope) AS srn,
         |         row_number() OVER (PARTITION BY event_type, day ORDER BY intercept) AS irn,
         |         count(*) OVER (PARTITION BY event_type, day) AS bc FROM bfin),
         |fin AS (SELECT event_type, day, CAST(max(bc) AS BIGINT) AS n_buckets,
         |          CAST(sum(n_points) AS BIGINT) AS n_points,
         |          CAST(sum(n_slopes) AS BIGINT) AS n_slopes,
         |          (sum(CASE WHEN srn = $blower THEN slope END)
         |            + sum(CASE WHEN srn = $bupper THEN slope END)) / 2.0 AS slope,
         |          (sum(CASE WHEN irn = $blower THEN intercept END)
         |            + sum(CASE WHEN irn = $bupper THEN intercept END)) / 2.0 AS intercept
         |        FROM bs GROUP BY 1, 2)
         |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
         |  n_buckets, n_points, n_slopes, slope, intercept
         |FROM fin ORDER BY event_type, day""".stripMargin
    }) { (s, dir) =>
    graft.operators.Relational.theilSenBucketed(
        Tables.events(s, dir)
          .filter(col("event_type").isNotNull)
          .withColumn("day", to_date(col("ts"))),
        groupCols = Seq("event_type", "day"),
        xCol = unix_millis(col("ts")), yCol = col("value"),
        buckets = 16, maxN = 2000, scaleX = 1L, scaleY = 100L)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .orderBy("event_type", "day")
  }

  private val KAnon = 5L

  /** q108: k-anonymity audit (Q96) — the privacy release gate a corpus
    * passes before leaving the curation pipeline: every combination of
    * quasi-identifiers (here nation × market segment) must cover at
    * least k individuals, or the rows in that cell are re-identifiable
    * by joining public attributes (Sweeney 2002). Per cell: the count,
    * the flag, and each cell's share of the total population — so the
    * release decision ("0.4% of rows are at risk") is one SUM over the
    * flagged rows. Everything is ONE partial-agg groupBy over exact
    * longs plus a broadcast total; the only float is the mirror-rounded
    * share.
    */
  val q108 = QueryDef(
    "q108_k_anonymity",
    s"""WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
       |  FROM customer GROUP BY 1, 2),
       |t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
       |SELECT c_nationkey, c_mktsegment, CAST(n AS BIGINT) AS n,
       |  n >= $KAnon AS k_anonymous,
       |  ${mr("n / total", 6)} AS pop_share
       |FROM c CROSS JOIN t
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, dir) =>
    val cells = Tables(s, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
    val total = cells.agg(sum("n")).head().getLong(0).toDouble
    cells.select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        (col("n") >= KAnon).as("k_anonymous"),
        graft.functions.Rounding.mirrorRound(col("n") / lit(total), 6)
          .as("pop_share"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** q109: Mann–Whitney U rank-sum test (open vs fulfilled orders'
    * totalprice per priority) — the distribution-free A/B test next to
    * q61's parametric t: values snap to cents, tie groups carry average
    * ranks as the exact integer 2·R_A, u2 = 2·U_A stays a long, and the
    * tie-corrected normal z is ONE fixed double expression replayed
    * verbatim by the oracle (the q94 exact-integer discipline applied to
    * hypothesis testing). Plan: partial-agg tie table → one window over
    * |distinct prices| rows per group (ties collapse BEFORE the sort) →
    * partial-agg reduce.
    */
  val q109 = QueryDef(
    "q109_mann_whitney", {
      val varu = "CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * " +
        "(CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tau AS DOUBLE) / " +
        "(CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))"
      val z = mr(s"CAST(u2 - n_a * n_b AS DOUBLE) / (2.0 * sqrt($varu))", 6)
      s"""WITH p AS (SELECT o_orderpriority AS grp, o_orderstatus = 'O' AS a,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM orders WHERE o_orderstatus IN ('O', 'F')
         |    AND o_totalprice IS NOT NULL),
         |t AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS t,
         |        CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ta
         |      FROM p GROUP BY 1, 2),
         |r AS (SELECT t.*, CAST(sum(t) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum
         |      FROM t),
         |g AS (SELECT grp,
         |        CAST(sum(ta * (2 * (cum - t + 1) + t - 1)) AS BIGINT) AS r2a,
         |        CAST(sum(ta) AS BIGINT) AS n_a,
         |        CAST(sum(t - ta) AS BIGINT) AS n_b,
         |        CAST(sum(t * t * t - t) AS BIGINT) AS tau
         |      FROM r GROUP BY 1),
         |f AS (SELECT grp, n_a, n_b, tau,
         |        CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2
         |      FROM g WHERE n_a > 0 AND n_b > 0 AND n_a + n_b >= 2)
         |SELECT grp AS o_orderpriority, n_a, n_b, u2, $z AS z,
         |  abs($z) > 1.96 AS significant
         |FROM f WHERE $varu > 0.0
         |ORDER BY o_orderpriority""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    val o = Tables(s, dir, "orders")
      .filter(col("o_orderstatus").isin("O", "F") && col("o_totalprice").isNotNull)
    graft.operators.Relational.mannWhitney(o, Seq("o_orderpriority"),
        isA = col("o_orderstatus") === "O", valueCol = col("o_totalprice"),
        scale = 100L)
      .withColumn("z", Rounding.mirrorRound(col("z"), 6))
      .withColumn("significant", abs(col("z")) > lit(1.96))
      .orderBy("o_orderpriority")
  }

  private val KmCensorDays = 60

  /** q110: Kaplan–Meier survival per market segment — customer
    * "lifetime" is first→last order span in days; customers whose last
    * order falls within the final $KmCensorDays days of the dataset are
    * CENSORED (still active), not churned — the estimator's whole point:
    * counting them as events biases every retention curve downward (the
    * classic churn mistake), dropping them wastes their at-risk time.
    * All risk-set arithmetic is exact longs; the running product is exp
    * of a running ln sum in per-group time order — the same sequential
    * fold in both engines (the q69 discipline on a window), so only
    * ln/exp touch floats, on identical inputs in identical order.
    */
  val q110 = QueryDef(
    "q110_kaplan_meier",
    s"""WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
       |life AS (SELECT o_custkey,
       |    CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
       |      max(CAST(o_orderdate AS DATE))) AS BIGINT) AS dur,
       |    CASE WHEN max(CAST(o_orderdate AS DATE)) <
       |      (SELECT md FROM mx) - INTERVAL $KmCensorDays DAY THEN 1 ELSE 0 END AS ev
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |j AS (SELECT c.c_mktsegment AS seg, l.dur, l.ev
       |      FROM life l JOIN customer c ON l.o_custkey = c.c_custkey),
       |byt AS (SELECT seg, dur, CAST(sum(ev) AS BIGINT) AS d_events,
       |          CAST(count(*) AS BIGINT) AS tot
       |        FROM j GROUP BY 1, 2),
       |r AS (SELECT byt.*,
       |        CAST(sum(tot) OVER (PARTITION BY seg ORDER BY dur) AS BIGINT) AS cum,
       |        CAST(sum(tot) OVER (PARTITION BY seg) AS BIGINT) AS gtot
       |      FROM byt),
       |k AS (SELECT seg, dur, d_events, tot, gtot - cum + tot AS n_risk,
       |        exp(sum(CASE WHEN d_events > 0 AND d_events < gtot - cum + tot
       |            THEN ln(1.0 - CAST(d_events AS DOUBLE) /
       |              CAST(gtot - cum + tot AS DOUBLE))
       |            WHEN d_events > 0 THEN CAST('-infinity' AS DOUBLE)
       |            ELSE 0.0 END) OVER (PARTITION BY seg ORDER BY dur)) AS surv
       |      FROM r)
       |SELECT seg AS c_mktsegment, dur AS t, CAST(n_risk AS BIGINT) AS n_risk,
       |  d_events, CAST(tot - d_events AS BIGINT) AS n_censored_at_t,
       |  ${mr("surv", 6)} AS survival
       |FROM k WHERE d_events > 0
       |ORDER BY c_mktsegment, t""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val o = Tables(s, dir, "orders").filter(col("o_orderdate").isNotNull)
    val maxD = o.agg(max(to_date(col("o_orderdate")))).head().getDate(0)
    val life = o.groupBy("o_custkey")
      .agg(datediff(max(to_date(col("o_orderdate"))),
          min(to_date(col("o_orderdate")))).cast("long").as("dur"),
        when(max(to_date(col("o_orderdate"))) <
          date_sub(lit(maxD), KmCensorDays), 1L).otherwise(0L).as("ev"))
    val df = life.join(Tables(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
    graft.operators.Relational.kaplanMeier(df, Seq("c_mktsegment"),
        col("dur"), col("ev"))
      .withColumn("survival", Rounding.mirrorRound(col("survival"), 6))
      .orderBy("c_mktsegment", "t")
  }

  /** q112: two-proportion z-test per priority ([[graft.operators.Relational.twoProportionZ]])
    * — the conversion-rate A/B shape: arm A = even customer keys (a
    * deterministic experiment split), success = a fulfilled order.
    * Four exact longs per group from ONE windowless partial-agg
    * groupBy; z is a single fixed double expression over them, so only
    * the final 6 dp mirror-round touches floats.
    */
  val q112 = QueryDef(
    "q112_two_proportion", {
      val pa = "CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
      val pb = "CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)"
      val pp = "CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)"
      val z = mr(s"($pa - $pb) / sqrt($pp * (1.0 - $pp) * " +
        s"(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))", 6)
      s"""WITH p AS (SELECT o_orderpriority AS grp,
         |    o_custkey % 2 = 0 AS a, o_orderstatus = 'F' AS s
         |  FROM orders WHERE o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL),
         |g AS (SELECT grp,
         |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN a AND s THEN 1 ELSE 0 END) AS BIGINT) AS s_a,
         |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN NOT a AND s THEN 1 ELSE 0 END) AS BIGINT) AS s_b
         |  FROM p GROUP BY 1)
         |SELECT grp AS o_orderpriority, n_a, s_a, n_b, s_b, $z AS z,
         |  abs($z) > 1.96 AS significant
         |FROM g WHERE n_a > 0 AND n_b > 0
         |  AND s_a + s_b > 0 AND s_a + s_b < n_a + n_b
         |ORDER BY o_orderpriority""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    val o = Tables(s, dir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderstatus").isNotNull)
    graft.operators.Relational.twoProportionZ(o, Seq("o_orderpriority"),
        isA = col("o_custkey") % 2 === 0, isSuccess = col("o_orderstatus") === "F")
      .withColumn("z", Rounding.mirrorRound(col("z"), 6))
      .withColumn("significant", abs(col("z")) > lit(1.96))
      .orderBy("o_orderpriority")
  }

  /** q113: Mann–Kendall trend test per event type over the DAILY total
    * series ([[graft.operators.Relational.mannKendall]]) — the
    * nonparametric "is this metric drifting?" companion to q52's
    * parametric slope and q105's robust slope: S and the tie-corrected
    * variance numerator are exact longs (order-free), the
    * continuity-corrected z one fixed double tree. The daily pre-agg is
    * the operator's scale contract: the corpus reduces to ≤ |types|·|days|
    * rows BEFORE the quadratic pair join (guarded at maxN).
    */
  val q113 = QueryDef(
    "q113_mann_kendall", {
      val sd = "sqrt(CAST(var18 AS DOUBLE) / 18.0)"
      val z = s"CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / $sd " +
        s"WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / $sd ELSE 0.0 END"
      s"""WITH d AS (SELECT event_type,
         |    CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
         |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL GROUP BY 1, 2),
         |s AS (SELECT a.event_type,
         |    CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
         |      ELSE 0 END) AS BIGINT) AS s
         |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x
         |  GROUP BY 1),
         |t AS (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
         |      FROM d GROUP BY 1, 2),
         |g AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n,
         |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tau
         |  FROM t GROUP BY 1),
         |f AS (SELECT g.event_type, n, s.s,
         |    CAST(n * (n - 1) * (2 * n + 5) - tau AS BIGINT) AS var18
         |  FROM g JOIN s ON g.event_type = s.event_type)
         |SELECT event_type, n, s, var18, ${mr(z, 6)} AS z
         |FROM f WHERE var18 > 0 ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    val daily = Tables.events(s, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1995-01-01").cast("date")).as("x"))
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("y"))
    graft.operators.Relational.mannKendall(daily, Seq("event_type"),
        col("x"), col("y"), maxN = 5000, scaleX = 1L, scaleY = 1L)
      .withColumn("z", Rounding.mirrorRound(col("z"), 6))
      .orderBy("event_type")
  }

  /** q114: Kruskal–Wallis H per event type across day-of-week treatments
    * ([[graft.operators.Relational.kruskalWallis]]) — "does the value
    * distribution differ by weekday?" without a normality assumption:
    * exact long 2·rank arithmetic end to end, the k-term Σ(2Rᵢ)²/nᵢ
    * folded on an ORDERED window (both engines add the same doubles left
    * to right), H and the tie-corrected H_adj fixed double trees. DOW is
    * Sunday=0 on both engines (Spark dayofweek−1 = DuckDB dow).
    */
  val q114 = QueryDef(
    "q114_kruskal_wallis", {
      val nD = "CAST(n AS DOUBLE)"
      val h = s"(3.0 * h4 / ($nD * ($nD + 1.0)) - 3.0 * ($nD + 1.0))"
      val c = s"(1.0 - CAST(tau AS DOUBLE) / ($nD * $nD * $nD - $nD))"
      s"""WITH p AS (SELECT event_type,
         |    CAST(date_part('dow', ts) AS BIGINT) AS dw,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |tt AS (SELECT event_type, dw, v, CAST(count(*) AS BIGINT) AS tc
         |       FROM p GROUP BY 1, 2, 3),
         |tv AS (SELECT event_type, v, CAST(sum(tc) AS BIGINT) AS t
         |       FROM tt GROUP BY 1, 2),
         |r AS (SELECT tv.*, CAST(sum(t) OVER (PARTITION BY event_type
         |        ORDER BY v) AS BIGINT) AS cum FROM tv),
         |rr AS (SELECT event_type, v,
         |       2 * (cum - t + 1) + t - 1 AS r2 FROM r),
         |pt AS (SELECT tt.event_type, tt.dw,
         |    CAST(sum(tc * r2) AS BIGINT) AS r2a, CAST(sum(tc) AS BIGINT) AS ni
         |  FROM tt JOIN rr ON tt.event_type = rr.event_type AND tt.v = rr.v
         |  GROUP BY 1, 2),
         |fold AS (SELECT event_type,
         |    sum(CAST(r2a AS DOUBLE) * CAST(r2a AS DOUBLE) / CAST(ni AS DOUBLE))
         |      OVER (PARTITION BY event_type ORDER BY dw
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         |  FROM pt),
         |fg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
         |       max(run) AS h4 FROM fold GROUP BY 1),
         |gg AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n,
         |    CAST(sum(t * t * t - t) AS BIGINT) AS tau FROM tv GROUP BY 1)
         |SELECT fg.event_type, k, n, ${mr(h, 6)} AS h,
         |  ${mr(s"$h / $c", 6)} AS h_adj
         |FROM fg JOIN gg ON fg.event_type = gg.event_type
         |WHERE k >= 2 AND n > k AND $c > 0.0
         |ORDER BY fg.event_type""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.kruskalWallis(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("event_type").isNotNull),
        Seq("event_type"),
        (dayofweek(col("ts")) - 1).cast("long"), col("value"), scale = 100L)
      .withColumn("h", Rounding.mirrorRound(col("h"), 6))
      .withColumn("h_adj", Rounding.mirrorRound(col("h_adj"), 6))
      .orderBy("event_type")
  }

  /** q115: Benjamini–Hochberg FDR over the daily anomaly sweep
    * ([[graft.operators.Relational.bhAdjust]]) — each (type, day) tests
    * its daily mean against the type's overall mean (q44's exact integer
    * moments), the z→p map is the SHARED A&S 26.2.17 polynomial
    * ([[graft.functions.NormalDist]] — both engines evaluate identical
    * IEEE ops, so the BH ordering is decided on identical bits), and the
    * step-up suffix-min runs on the |types|·|days| hypothesis table —
    * driver-sized by construction, never the corpus.
    */
  val q115 = QueryDef(
    "q115_bh_fdr", {
      import graft.functions.NormalDist
      val p = NormalDist.sqlTwoSidedP("z")
      s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss
         |  FROM e GROUP BY 1),
         |gs AS (SELECT event_type,
         |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |    sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
         |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS sd
         |  FROM g WHERE n >= 2),
         |d AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_day,
         |    CAST(sum(c) AS BIGINT) AS sc FROM e GROUP BY 1, 2),
         |zt AS (SELECT d.event_type, d.day, n_day,
         |    (CAST(sc AS DOUBLE) / CAST(n_day AS DOUBLE) - mean)
         |      / (sd / sqrt(CAST(n_day AS DOUBLE))) AS z
         |  FROM d JOIN gs ON d.event_type = gs.event_type WHERE sd > 0.0),
         |pt AS (SELECT *, $p AS p FROM zt),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p, event_type, day)
         |      AS BIGINT) AS bh_rank,
         |    CAST(count(*) OVER () AS BIGINT) AS m FROM pt),
         |adj AS (SELECT *, least(min(p * CAST(m AS DOUBLE)
         |      / CAST(bh_rank AS DOUBLE)) OVER (ORDER BY bh_rank
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0) AS p_adj
         |  FROM r)
         |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_day,
         |  ${mr("z", 6)} AS z, bh_rank, m, ${mr("p_adj", 8)} AS p_adj,
         |  p_adj <= 0.05 AS discovery
         |FROM adj ORDER BY bh_rank""".stripMargin
    }) { (s, dir) =>
    import graft.functions.{NormalDist, Rounding}
    val e = Tables.events(s, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
    val g = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("ss"))
      .filter(col("n") >= 2)
    val nD = col("n").cast("double")
    val gs = g.select(col("event_type"),
        (col("s").cast("double") / nD).as("mean"),
        sqrt((col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") / nD) /
          (nD - lit(1.0))).as("sd"))
      .filter(col("sd") > 0.0)
    val d = e.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_day"), sum("c").as("sc"))
    val zt = d.join(broadcast(gs), "event_type")
      .withColumn("z",
        (col("sc").cast("double") / col("n_day").cast("double") - col("mean"))
          / (col("sd") / sqrt(col("n_day").cast("double"))))
      .select(col("event_type"), col("day"), col("n_day"), col("z"))
    val pt = zt.withColumn("p", NormalDist.twoSidedP(col("z")))
    graft.operators.Relational.bhAdjust(pt, col("p"),
        Seq(col("event_type"), col("day")), alpha = 0.05)
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_day"), Rounding.mirrorRound(col("z"), 6).as("z"),
        col("bh_rank").cast("long").as("bh_rank"), col("m"),
        Rounding.mirrorRound(col("p_adj"), 8).as("p_adj"), col("discovery"))
      .orderBy("bh_rank")
  }

  /** q116: Cramér's V on the event-type × day-of-week contingency
    * ([[graft.operators.Relational.cramersV]]) — the scalar strength
    * q58's per-cell table refuses to sum cross-engine, made safe here by
    * the ordered-window fold (q110's sequential-fold discipline over the
    * completed grid, zero cells included). One row out.
    */
  val q116 = QueryDef(
    "q116_cramers_v", {
      s"""WITH cells AS (SELECT event_type AS a,
         |    CAST(date_part('dow', ts) AS BIGINT) AS b,
         |    CAST(count(*) AS BIGINT) AS observed
         |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
         |  GROUP BY 1, 2),
         |rt AS (SELECT a, CAST(sum(observed) AS BIGINT) AS ra FROM cells GROUP BY 1),
         |ct AS (SELECT b, CAST(sum(observed) AS BIGINT) AS cb FROM cells GROUP BY 1),
         |tot AS (SELECT CAST(sum(observed) AS DOUBLE) AS nd,
         |        CAST(sum(observed) AS BIGINT) AS ntot FROM cells),
         |grid AS (SELECT rt.a, ct.b, ra, cb,
         |    CAST(coalesce(cells.observed, 0) AS BIGINT) AS observed
         |  FROM rt CROSS JOIN ct
         |  LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
         |t AS (SELECT a, b, observed,
         |    (CAST(observed AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / tot.nd)
         |      * (CAST(observed AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / tot.nd)
         |      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / tot.nd) AS term
         |  FROM grid CROSS JOIN tot),
         |run AS (SELECT sum(term) OVER (ORDER BY a, b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum FROM t),
         |agg AS (SELECT (SELECT ntot FROM tot) AS n,
         |    (SELECT CAST(count(DISTINCT a) AS BIGINT) FROM cells) AS r,
         |    (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM cells) AS c,
         |    max(rsum) AS chi2 FROM run)
         |SELECT n, r, c, ${mr("chi2", 6)} AS chi2,
         |  ${mr("sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE)))", 6)} AS v
         |FROM agg WHERE least(r, c) >= 2 AND n > 0""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.cramersV(
        Tables.events(s, dir)
          .filter(col("event_type").isNotNull && col("ts").isNotNull)
          .select(col("event_type").as("a"),
            (dayofweek(col("ts")) - 1).cast("long").as("b")),
        "a", "b")
      .select(col("n"), col("r"), col("c"),
        Rounding.mirrorRound(col("chi2"), 6).as("chi2"),
        Rounding.mirrorRound(col("v"), 6).as("v"))
  }

  /** q117: Cochran–Mantel–Haenszel across market-segment strata
    * ([[graft.operators.Relational.cmhTest]]) — is order status (open vs
    * fulfilled) associated with high priority AFTER controlling for
    * segment? The Simpson's-paradox guard q58/q112's pooled tables
    * cannot give. Exact long margins per stratum, signed cross-strata
    * sums folded on an ordered window taken at the LAST stratum, χ²(1)
    * p via the shared NormalDist polynomial on √CMH.
    */
  val q117 = QueryDef(
    "q117_cmh", {
      import graft.functions.NormalDist
      val p = NormalDist.sqlTwoSidedP("sqrt(cmh)")
      s"""WITH j AS (SELECT c.c_mktsegment AS s, o.o_orderstatus = 'O' AS arm,
         |    o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS succ
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  WHERE o.o_orderstatus IN ('O', 'F') AND o.o_orderpriority IS NOT NULL
         |    AND c.c_mktsegment IS NOT NULL),
         |cells AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN arm AND succ THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN succ THEN 1 ELSE 0 END) AS BIGINT) AS m1
         |  FROM j GROUP BY 1 HAVING count(*) >= 2),
         |t AS (SELECT s,
         |    CAST(a AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE)
         |      / CAST(n AS DOUBLE) AS num,
         |    CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) * CAST(m1 AS DOUBLE)
         |      * CAST(n - m1 AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS den
         |  FROM cells),
         |f AS (SELECT sum(num) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rnum,
         |    sum(den) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rden,
         |    row_number() OVER (ORDER BY s) AS rk,
         |    CAST(count(*) OVER () AS BIGINT) AS cnt FROM t),
         |g AS (SELECT cnt AS n_strata, rnum * rnum / rden AS cmh
         |      FROM f WHERE rk = cnt AND rden > 0.0)
         |SELECT n_strata, ${mr("cmh", 6)} AS cmh, ${mr(p, 8)} AS p FROM g""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    val j = Tables(s, dir, "orders")
      .filter(col("o_orderstatus").isin("O", "F") &&
        col("o_orderpriority").isNotNull)
      .join(broadcast(Tables(s, dir, "customer")
        .filter(col("c_mktsegment").isNotNull)),
        col("o_custkey") === col("c_custkey"))
    graft.operators.Relational.cmhTest(j, Nil, col("c_mktsegment"),
        col("o_orderstatus") === "O",
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("n_strata"), Rounding.mirrorRound(col("cmh"), 6).as("cmh"),
        Rounding.mirrorRound(col("p"), 8).as("p"))
  }

  /** q118: delta-method SE of revenue-per-quantity-unit per return flag
    * ([[graft.operators.Relational.ratioSE]]) — the honest error bar for
    * a RATIO metric (Cochran's ratio estimator): six moment sums in one
    * pass (squares in decimal(38,0) against DuckDB's int128 — the q61
    * discipline), then ratio/SE/CI as one fixed double tree.
    */
  val q118 = QueryDef(
    "q118_ratio_se", {
      val ss = "greatest(syy - 2.0 * (sy / sw) * syw + " +
        "(sy / sw) * (sy / sw) * sww, 0.0)"
      val se = s"sqrt(CAST(n AS DOUBLE) / (sw * sw) * ($ss / (CAST(n AS DOUBLE) - 1.0)))"
      s"""WITH p AS (SELECT l_returnflag AS g,
         |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y,
         |    CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT) AS w
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL
         |    AND l_quantity IS NOT NULL),
         |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(w) AS DOUBLE) AS sw,
         |    CAST(sum(y * y) AS DOUBLE) AS syy,
         |    CAST(sum(w * w) AS DOUBLE) AS sww,
         |    CAST(sum(y * w) AS DOUBLE) AS syw
         |  FROM p GROUP BY 1 HAVING count(*) >= 2)
         |SELECT g AS l_returnflag, n, ${mr("sy / sw", 6)} AS ratio,
         |  ${mr(se, 8)} AS se,
         |  ${mr(s"sy / sw - 1.96 * $se", 6)} AS ci_lo,
         |  ${mr(s"sy / sw + 1.96 * $se", 6)} AS ci_hi
         |FROM s WHERE sw <> 0.0 ORDER BY g""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.ratioSE(
        Tables(s, dir, "lineitem")
          .filter(col("l_extendedprice").isNotNull && col("l_quantity").isNotNull),
        Seq("l_returnflag"), col("l_extendedprice"), col("l_quantity"),
        scaleY = 100L, scaleW = 1L)
      .select(col("l_returnflag"), col("n"),
        Rounding.mirrorRound(col("ratio"), 6).as("ratio"),
        Rounding.mirrorRound(col("se"), 8).as("se"),
        Rounding.mirrorRound(col("ci_lo"), 6).as("ci_lo"),
        Rounding.mirrorRound(col("ci_hi"), 6).as("ci_hi"))
      .orderBy("l_returnflag")
  }

  /** q119: PSI drift per event type, first half vs second half of the
    * stream's time range ([[graft.operators.Relational.psiDrift]]) — the
    * model-monitoring drift standard: reference-decile bins from the
    * exact cent histogram (integer crossing cum·10 ≥ k·n), +1-smoothed
    * shares, Σ(p−q)ln(p/q) folded on an ordered window (terms ≥ 0 ⇒ the
    * running max is the deterministic total). The midpoint is exact
    * integer millis, a driver scalar mirrored by a scalar subquery.
    */
  val q119 = QueryDef(
    "q119_psi", {
      val p = "CAST(cr + 1 AS DOUBLE) / CAST(nr + 10 AS DOUBLE)"
      val q = "CAST(cc + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE)"
      s"""WITH b AS (SELECT (min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2 AS mid
         |  FROM events WHERE ts IS NOT NULL),
         |pts AS (SELECT event_type AS g,
         |    epoch_ms(ts) < (SELECT mid FROM b) AS ref,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |hist AS (SELECT g, ref, v, CAST(count(*) AS BIGINT) AS c
         |         FROM pts GROUP BY 1, 2, 3),
         |rc AS (SELECT g, v,
         |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
         |  FROM hist WHERE ref),
         |cuts AS (SELECT g, k, min(v) AS cut
         |  FROM rc CROSS JOIN (SELECT unnest(range(1, 10)) AS k) ks
         |  WHERE cum * 10 >= k * n GROUP BY 1, 2),
         |bn AS (SELECT hist.g, hist.ref, hist.v, hist.c,
         |    CAST(sum(CASE WHEN hist.v > cuts.cut THEN 1 ELSE 0 END) AS BIGINT) AS bin
         |  FROM hist JOIN cuts ON hist.g = cuts.g GROUP BY 1, 2, 3, 4),
         |bc AS (SELECT g, ref, bin, CAST(sum(c) AS BIGINT) AS bc
         |       FROM bn GROUP BY 1, 2, 3),
         |grid AS (SELECT g, unnest(range(0, 10)) AS bin
         |         FROM (SELECT DISTINCT g FROM bc)),
         |wide AS (SELECT grid.g, grid.bin,
         |    CAST(coalesce(r.bc, 0) AS BIGINT) AS cr,
         |    CAST(coalesce(c2.bc, 0) AS BIGINT) AS cc
         |  FROM grid
         |  LEFT JOIN (SELECT * FROM bc WHERE ref) r
         |    ON grid.g = r.g AND grid.bin = r.bin
         |  LEFT JOIN (SELECT * FROM bc WHERE NOT ref) c2
         |    ON grid.g = c2.g AND grid.bin = c2.bin),
         |tot AS (SELECT wide.*,
         |    CAST(sum(cr) OVER (PARTITION BY g) AS BIGINT) AS nr,
         |    CAST(sum(cc) OVER (PARTITION BY g) AS BIGINT) AS nc FROM wide),
         |terms AS (SELECT g, bin, nr, nc,
         |    ($p - $q) * ln(($p) / ($q)) AS term FROM tot WHERE nr > 0),
         |runs AS (SELECT g, nr, nc, sum(term) OVER (PARTITION BY g ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM terms)
         |SELECT g AS event_type, max(nr) AS n_ref, max(nc) AS n_cur,
         |  ${mr("max(run)", 6)} AS psi
         |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
    // midpoint over the SAME population as the oracle's scalar subquery:
    // ts-notNull only (value/type filters do not shrink the time range)
    val Array(mn, mx) = Tables.events(s, dir).filter(col("ts").isNotNull)
      .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts")))).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = (mn + mx) / 2
    graft.operators.Relational.psiDrift(ev, Seq("event_type"), col("value"),
        unix_millis(col("ts")) < lit(mid), bins = 10, scale = 100L)
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        Rounding.mirrorRound(col("psi"), 6).as("psi"))
      .orderBy("event_type")
  }

  /** q120: Brown–Forsythe equal-variance test per event type across
    * day-of-week treatments ([[graft.operators.Relational.brownForsythe]])
    * — the variance-homogeneity companion to q114's location test (and
    * the assumption check behind q61's pooled t): medians from the exact
    * cent histogram carried DOUBLED (2·med = lower+upper order stat, an
    * exact long), |2v − 2med| deviations exact longs, Σc·z² in decimal
    * vs DuckDB's int128, the k-term Σsᵢ²/nᵢ folded on an ordered window.
    * W is scale-invariant so the doubling cancels exactly.
    */
  val q120 = QueryDef(
    "q120_brown_forsythe", {
      val w = "(CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)" +
        " * ((a4 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))" +
        " / (szz - a4))"
      s"""WITH p AS (SELECT event_type AS g,
         |    CAST(date_part('dow', ts) AS BIGINT) AS k,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |hist AS (SELECT g, k, v, CAST(count(*) AS BIGINT) AS c
         |         FROM p GROUP BY 1, 2, 3),
         |cum AS (SELECT hist.*,
         |    CAST(sum(c) OVER (PARTITION BY g, k ORDER BY v) AS BIGINT) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY g, k) AS BIGINT) AS n FROM hist),
         |med AS (SELECT g, k,
         |    min(CASE WHEN cum >= CAST(floor((n + 1) / 2.0) AS BIGINT)
         |        THEN v END)
         |      + min(CASE WHEN cum >= CAST(floor(n / 2.0) AS BIGINT) + 1
         |        THEN v END) AS med2
         |  FROM cum GROUP BY 1, 2),
         |z AS (SELECT hist.g, hist.k, c, abs(2 * v - med2) AS z2
         |      FROM hist JOIN med ON hist.g = med.g AND hist.k = med.k),
         |pt AS (SELECT g, k, CAST(sum(c) AS BIGINT) AS ni,
         |    CAST(sum(c * z2) AS BIGINT) AS si, sum(c * z2 * z2) AS szzi
         |  FROM z GROUP BY 1, 2),
         |fold AS (SELECT g, ni, si, szzi,
         |    sum(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE))
         |      OVER (PARTITION BY g ORDER BY k
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         |  FROM pt),
         |fg AS (SELECT g, CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(ni) AS BIGINT) AS n, CAST(sum(si) AS BIGINT) AS s,
         |    CAST(sum(szzi) AS DOUBLE) AS szz, max(run) AS a4
         |  FROM fold GROUP BY 1)
         |SELECT g AS event_type, k, n, ${mr(w, 6)} AS w
         |FROM fg WHERE k >= 2 AND n > k AND (szz - a4) > 0.0
         |ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.brownForsythe(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("event_type").isNotNull),
        Seq("event_type"),
        (dayofweek(col("ts")) - 1).cast("long"), col("value"), scale = 100L)
      .withColumn("w", Rounding.mirrorRound(col("w"), 6))
      .orderBy("event_type")
  }

  /** q121: single change-point locator per event type on the daily value
    * series ([[graft.operators.Relational.changePoint]]) — the day the
    * daily total LEVEL-SHIFTED, located by the maximal CUSUM contrast
    * |T·S_t − t·S_T| decided on EXACT integers (decimal(38,0) vs DuckDB
    * int128 — the ranking never touches a float), earliest day breaking
    * ties; the reported shift is the exact between-segment mean gap
    * |D_t|/(t·(T−t)) in value units.
    */
  val q121 = QueryDef(
    "q121_changepoint", {
      s"""WITH e AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |d AS (SELECT g, day, CAST(sum(v) AS BIGINT) AS sv
         |      FROM e GROUP BY 1, 2),
         |c AS (SELECT g, day,
         |    CAST(count(*) OVER (PARTITION BY g ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS t,
         |    CAST(sum(sv) OVER (PARTITION BY g ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS st,
         |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS tt,
         |    CAST(sum(sv) OVER (PARTITION BY g) AS BIGINT) AS stot
         |  FROM d),
         |i AS (SELECT *, abs(CAST(tt AS HUGEINT) * CAST(st AS HUGEINT)
         |        - CAST(t AS HUGEINT) * CAST(stot AS HUGEINT)) AS absd
         |      FROM c WHERE t < tt),
         |r AS (SELECT *, row_number() OVER (PARTITION BY g
         |        ORDER BY absd DESC, day ASC) AS rk FROM i)
         |SELECT g AS event_type, strftime(day, '%Y-%m-%d') AS day, t,
         |  tt AS t_days,
         |  ${mr("CAST(st AS DOUBLE) / CAST(t AS DOUBLE) / 100.0", 6)} AS mean_left,
         |  ${mr("CAST(stot - st AS DOUBLE) / CAST(tt - t AS DOUBLE) / 100.0", 6)}
         |    AS mean_right,
         |  ${mr("CAST(absd AS DOUBLE) / (CAST(t AS DOUBLE) * CAST(tt - t AS DOUBLE)) / 100.0", 6)}
         |    AS shift
         |FROM r WHERE rk = 1
         |ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.changePoint(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("event_type").isNotNull),
        Seq("event_type"), to_date(col("ts")), col("value"), scale = 100L)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .withColumn("mean_left", Rounding.mirrorRound(col("mean_left"), 6))
      .withColumn("mean_right", Rounding.mirrorRound(col("mean_right"), 6))
      .withColumn("shift", Rounding.mirrorRound(col("shift"), 6))
      .orderBy("event_type")
  }

  /** q122: one-way ANOVA F per event type across day-of-week treatments
    * ([[graft.operators.Relational.anovaF]]) — the parametric k-mean
    * companion to q114's rank test and q120's spread test on the
    * identical question: per-treatment moment sums exact (longs +
    * decimal vs int128), the k-term Σsᵢ²/nᵢ folded on an ordered
    * window, SSB/SSW/F fixed double trees. F is scale-invariant so the
    * cent snap cancels exactly.
    */
  val q122 = QueryDef(
    "q122_anova", {
      val ssb = "(a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
      val ssw = "(ss - a)"
      val f = s"($ssb / (CAST(k AS DOUBLE) - 1.0)) / ($ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))"
      s"""WITH p AS (SELECT event_type AS g,
         |    CAST(date_part('dow', ts) AS BIGINT) AS k,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |pt AS (SELECT g, k, CAST(count(*) AS BIGINT) AS ni,
         |    CAST(sum(v) AS BIGINT) AS si,
         |    sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS ssi
         |  FROM p GROUP BY 1, 2),
         |fold AS (SELECT g, ni, si, ssi,
         |    sum(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE))
         |      OVER (PARTITION BY g ORDER BY k
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         |  FROM pt),
         |fg AS (SELECT g, CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(ni) AS BIGINT) AS n, CAST(sum(si) AS BIGINT) AS s,
         |    CAST(sum(ssi) AS DOUBLE) AS ss, max(run) AS a
         |  FROM fold GROUP BY 1)
         |SELECT g AS event_type, k, n, ${mr(ssb, 6)} AS ssb,
         |  ${mr(ssw, 6)} AS ssw, ${mr(f, 6)} AS f
         |FROM fg WHERE k >= 2 AND n > k AND $ssw > 0.0
         |ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.anovaF(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("event_type").isNotNull),
        Seq("event_type"),
        (dayofweek(col("ts")) - 1).cast("long"), col("value"), scale = 100L)
      .withColumn("ssb", Rounding.mirrorRound(col("ssb"), 6))
      .withColumn("ssw", Rounding.mirrorRound(col("ssw"), 6))
      .withColumn("f", Rounding.mirrorRound(col("f"), 6))
      .orderBy("event_type")
  }

  /** q123: Kendall tau-b per event type between the DAILY event count
    * and the DAILY value total ([[graft.operators.Relational.kendallTau]])
    * — "are busier days also higher-value days?" on the probability
    * scale of concordance: the corpus reduces to the daily series, the
    * concordance enumeration runs over 2D histogram CELLS (guarded at
    * maxN), C−D and both tie margins exact in decimal(38,0) vs DuckDB
    * int128, tau ONE fixed double tree.
    */
  val q123 = QueryDef(
    "q123_kendall_tau", {
      s"""WITH e AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |d AS (SELECT g, day, CAST(count(*) AS BIGINT) AS x,
         |      CAST(sum(v) AS BIGINT) AS y FROM e GROUP BY 1, 2),
         |h AS (SELECT g, x, y, CAST(count(*) AS BIGINT) AS c
         |      FROM d GROUP BY 1, 2, 3),
         |cd AS (SELECT a.g, CAST(sum((CASE WHEN b.y > a.y THEN 1
         |        WHEN b.y < a.y THEN -1 ELSE 0 END)
         |        * CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS HUGEINT) AS cd2
         |  FROM h a JOIN h b ON a.g = b.g AND a.x < b.x GROUP BY 1),
         |xm AS (SELECT g, CAST(sum(t * (t - 1)) AS HUGEINT) AS tx,
         |    CAST(sum(t) AS BIGINT) AS n
         |  FROM (SELECT g, x, CAST(sum(c) AS BIGINT) AS t FROM h GROUP BY 1, 2)
         |  GROUP BY 1),
         |ym AS (SELECT g, CAST(sum(t * (t - 1)) AS HUGEINT) AS ty
         |  FROM (SELECT g, y, CAST(sum(c) AS BIGINT) AS t FROM h GROUP BY 1, 2)
         |  GROUP BY 1),
         |f AS (SELECT xm.g, n,
         |    CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) - tx AS DOUBLE) AS d1,
         |    CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) - ty AS DOUBLE) AS d2,
         |    CAST(cd2 AS DOUBLE) AS cdd
         |  FROM xm JOIN ym ON xm.g = ym.g JOIN cd ON xm.g = cd.g)
         |SELECT g AS event_type, n,
         |  ${mr("2.0 * cdd / sqrt(d1 * d2)", 6)} AS tau
         |FROM f WHERE d1 > 0.0 AND d2 > 0.0
         |ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    val daily = Tables.events(s, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
    graft.operators.Relational.kendallTau(daily, Seq("event_type"),
        col("x"), col("y"), maxN = 5000, scaleX = 1L, scaleY = 1L)
      .withColumn("tau", Rounding.mirrorRound(col("tau"), 6))
      .orderBy("event_type")
  }

  /** q124: seasonal-naive forecast evaluation per event type on the
    * daily value series
    * ([[graft.operators.Relational.seasonalNaiveEval]]) — MASE of the
    * lag-7 forecaster scaled by one-step persistence: every error an
    * exact long, the two MAEs one division each, mase cross-multiplied
    * in decimal(38,0) vs DuckDB int128 before its single double
    * division.
    */
  val q124 = QueryDef(
    "q124_seasonal_naive", {
      val mase = "CAST(CAST(ss AS HUGEINT) * CAST(cn AS HUGEINT) AS DOUBLE)" +
        " / CAST(CAST(sn AS HUGEINT) * CAST(cs AS HUGEINT) AS DOUBLE)"
      s"""WITH e AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |d AS (SELECT g, day, CAST(sum(v) AS BIGINT) AS sv
         |      FROM e GROUP BY 1, 2),
         |l AS (SELECT g,
         |    abs(sv - lag(sv, 1) OVER (PARTITION BY g ORDER BY day)) AS e1,
         |    abs(sv - lag(sv, 7) OVER (PARTITION BY g ORDER BY day)) AS em
         |  FROM d),
         |gg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(count(em) AS BIGINT) AS cs, CAST(sum(em) AS BIGINT) AS ss,
         |    CAST(count(e1) AS BIGINT) AS cn, CAST(sum(e1) AS BIGINT) AS sn
         |  FROM l GROUP BY 1)
         |SELECT g AS event_type, n_days,
         |  ${mr("CAST(ss AS DOUBLE) / CAST(cs AS DOUBLE) / 100.0", 6)} AS mae_seasonal,
         |  ${mr("CAST(sn AS DOUBLE) / CAST(cn AS DOUBLE) / 100.0", 6)} AS mae_naive,
         |  ${mr(mase, 6)} AS mase
         |FROM gg WHERE cs > 0 AND sn > 0
         |ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.seasonalNaiveEval(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("event_type").isNotNull),
        Seq("event_type"), to_date(col("ts")), col("value"),
        period = 7, scale = 100L)
      .withColumn("mae_seasonal", Rounding.mirrorRound(col("mae_seasonal"), 6))
      .withColumn("mae_naive", Rounding.mirrorRound(col("mae_naive"), 6))
      .withColumn("mase", Rounding.mirrorRound(col("mase"), 6))
      .orderBy("event_type")
  }

  /** q125: Welch's heteroscedastic ANOVA per event type across
    * day-of-week treatments
    * ([[graft.operators.Relational.welchAnova]]) — q122's classical F
    * without the equal-variance assumption q120 tests: exact integer
    * moments per treatment, s² one double division of exact ints, TWO
    * ordered k-row folds (signed-safe take-at-last-row — Σw·x̄ carries
    * sign), F_w and df2 fixed double trees replayed term for term.
    */
  val q125 = QueryDef(
    "q125_welch_anova", {
      val kD = "CAST(k AS DOUBLE)"
      val f = s"(ra / ($kD - 1.0)) / (1.0 + 2.0 * ($kD - 2.0) / ($kD * $kD - 1.0) * rl)"
      s"""WITH p AS (SELECT event_type AS g,
         |    CAST(date_part('dow', ts) AS BIGINT) AS k,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |    AND event_type IS NOT NULL),
         |pt AS (SELECT g, k, CAST(count(*) AS BIGINT) AS ni,
         |    CAST(sum(v) AS BIGINT) AS si,
         |    sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS ssi
         |  FROM p GROUP BY 1, 2),
         |m AS (SELECT g, k, ni,
         |    CASE WHEN ni < 2 OR CAST(ni AS HUGEINT) * ssi
         |        - CAST(si AS HUGEINT) * CAST(si AS HUGEINT) <= 0
         |      THEN 1 ELSE 0 END AS bad,
         |    CASE WHEN ni < 2 OR CAST(ni AS HUGEINT) * ssi
         |        - CAST(si AS HUGEINT) * CAST(si AS HUGEINT) <= 0 THEN 1.0
         |      ELSE CAST(CAST(ni AS HUGEINT) * ssi
         |          - CAST(si AS HUGEINT) * CAST(si AS HUGEINT) AS DOUBLE)
         |        / (CAST(ni AS DOUBLE) * CAST(ni - 1 AS DOUBLE)) END AS s2,
         |    CAST(si AS DOUBLE) / CAST(ni AS DOUBLE) AS xb
         |  FROM pt),
         |mm AS (SELECT m.*, CAST(ni AS DOUBLE) / s2 AS w FROM m),
         |r1 AS (SELECT g, sum(w) OVER wkk AS rw, sum(w * xb) OVER wkk AS rm,
         |    sum(bad) OVER (PARTITION BY g) AS rbad,
         |    row_number() OVER (PARTITION BY g ORDER BY k) AS rk,
         |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS cnt
         |  FROM mm WINDOW wkk AS (PARTITION BY g ORDER BY k
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f1 AS (SELECT g, rw AS bw, rm / rw AS xw, cnt AS k FROM r1
         |  WHERE rk = cnt AND rbad = 0 AND cnt >= 2),
         |f2 AS (SELECT mm.g, f1.k,
         |    sum(w * (xb - xw) * (xb - xw)) OVER wkk AS ra,
         |    sum((1.0 - w / bw) * (1.0 - w / bw)
         |      / CAST(ni - 1 AS DOUBLE)) OVER wkk AS rl,
         |    CAST(sum(ni) OVER wkk AS BIGINT) AS rn,
         |    row_number() OVER (PARTITION BY mm.g ORDER BY mm.k) AS rk
         |  FROM mm JOIN f1 ON mm.g = f1.g
         |  WINDOW wkk AS (PARTITION BY mm.g ORDER BY mm.k
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT g AS event_type, k, rn AS n, ${mr(f, 6)} AS f_w,
         |  ${mr(s"($kD * $kD - 1.0) / (3.0 * rl)", 6)} AS df2
         |FROM f2 WHERE rk = k AND rl > 0.0
         |ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Rounding
    graft.operators.Relational.welchAnova(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("event_type").isNotNull),
        Seq("event_type"),
        (dayofweek(col("ts")) - 1).cast("long"), col("value"), scale = 100L)
      .withColumn("f_w", Rounding.mirrorRound(col("f_w"), 6))
      .withColumn("df2", Rounding.mirrorRound(col("df2"), 6))
      .orderBy("event_type")
  }

  val queries: Seq[QueryDef] = Seq(q44, q52, q53, q55, q56, q57, q58, q60, q61, q62, q63, q64, q65, q66, q67, q72, q74, q75, q78, q82, q83, q85, q86, q91, q94, q105, q108, q109, q110, q112, q113, q114, q115, q116, q117, q118, q119, q120, q121, q122, q123, q124, q125)
}
