package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.sources.Tables

/** Graph-algorithm query family (split from Relational.scala in round 7):
  * co-occurrence, PageRank, triangles, clustering coefficient, k-core,
  * association rules, BFS hops, HITS, label-propagation communities,
  * item-item recommendations, shortest paths, link prediction. All are
  * fixed-round join + partial-agg iterations with per-round
  * localCheckpoint lineage truncation and hot-key caps (see each query's
  * doc); the bucketed-never-all-pairs discipline holds throughout.
  */
object RelationalGraph {

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
    val seeds = Tables(s, dir, "supplier")
      .filter(col("s_suppkey") % SsspSeedMod === 0)
      .select(concat(lit("s"), col("s_suppkey").cast("string")).as("seed"))
    // directed edges in, symmetrize = true: the operator collapses the
    // parallel edges FIRST (one lineitem scan + partial agg) and only
    // then emits both orientations — the caller-side union scanned the
    // corpus twice (r14; the graph is bipartite, so the adjacency rows
    // are exactly the oracle's `e` CTE either way)
    graft.operators.Graph.shortestPaths(li, "u", "v", "w",
        seeds, "seed", rounds = SsspRounds, symmetrize = true)
      .orderBy("node")
  }

  private val AaMaxCenterDeg = 60
  private val AaMinCommon = 2L

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


  val queries: Seq[QueryDef] = Seq(q41, q43, q45, q48, q49, q68, q50, q73, q80, q81, q84, q92)
}
