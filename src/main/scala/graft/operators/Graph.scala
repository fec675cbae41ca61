package graft.operators

import graft.operators.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based graph analytics over edge DataFrames — the d06-clusters
  * discipline (never a driver-side graph): each iteration is an
  * edges⋈ranks join + per-node partial-agg sum, so one round shuffles
  * |edges| contribution rows and |nodes| rank rows regardless of graph
  * shape, and lineage is truncated per round exactly like
  * [[Dedup.clusters]] / [[Similarity.kmeans]].
  */
object Graph {

  /** Pin a STATIC per-round relation for an iteration loop: hash-partition
    * on `key` and persist (eagerly materialized, matching
    * `localCheckpoint(true)`'s blocking contract). `localCheckpoint` erases
    * the SQL output partitioning (the checkpointed RDD scans as
    * unknown-partitioned), so every round re-shuffles the static side;
    * a persisted `repartition(key)` keeps `HashPartitioning(key)` visible
    * to EnsureRequirements, and a round shaped as
    * broadcast-join → aggregate-by-`key` then plans with ZERO Exchange
    * (alias-aware propagation carries the partitioning through renames).
    *
    * Use it ONLY where the per-round AGGREGATE is the dominant shuffle
    * (q80's neighbor histogram 5.2 → 3.1 s, q84's relaxation min, q49's
    * degrees, all at sf0.1). Where the round's shuffle is a JOIN against
    * the small iterated state, AQE already wins with the checkpointed
    * form — runtime stats convert the join to broadcast and a local
    * shuffle reader, skipping the static side's exchange — and pinning
    * REGRESSES (pageRank 2.1 → 3.8 s, HITS 3.4 → 5.5 s measured: the
    * columnar cache build + per-round cache scans cost more than the
    * local-mode exchange they replace; those stay on localCheckpoint).
    * The pinned blocks release in the harness's per-query cleanup
    * (Bench/Verify unpersist-all), the same lifetime localCheckpoint
    * RDDs had.
    */
  private def pinByKey(df: DataFrame, key: String): DataFrame = {
    val pinned = df.repartition(col(key)).persist()
    pinned.count()
    pinned
  }

  /** PageRank, fixed iterations (the deterministic fixed-round form an
    * external SQL oracle can unroll — convergence-threshold stopping
    * would make row content depend on float comparison order).
    * `edges` must carry (src, dst) one row per DIRECTED edge —
    * symmetrize first for undirected graphs. Nodes are defined by edge
    * endpoints (an isolated node has no edges to define it). Dangling
    * nodes cannot exist under that definition: every node has at least
    * one out-edge after symmetrization; for directed inputs with
    * sinks, their mass leaks per the simplified formulation — document
    * at the call site. The damping constants are computed IN-ENGINE
    * (`lit(1.0) - lit(damping)`) so an external oracle writing
    * `1 - 0.85` gets bit-identical doubles.
    * Output: node, pr (unrounded — round at the binding).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      checkpoint: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    // The edge list (often an expensive subtree — q43 feeds a whole
    // co-occurrence build here) is referenced by EVERY iteration plus
    // the node/degree prep; materialize once or the plan re-runs it
    // ~(iters + 3) times. Same for the per-round reuse of nodes/outdeg.
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = if (checkpoint) e0.eagerPin() else e0
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nodes = if (checkpoint) nodes0.eagerPin() else nodes0
    val n = nodes.count() // one metadata scalar to the driver
    val outdeg0 = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val outdeg = if (checkpoint) outdeg0.eagerPin() else outdeg0
    val base = (lit(1.0) - lit(damping)) / lit(n.toDouble)
    var pr = nodes.withColumn("pr", lit(1.0) / lit(n.toDouble))
    for (_ <- 1 to iters) {
      val contrib = e.join(pr, col("src") === col("node")).join(outdeg, "src")
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      pr = if (checkpoint) next.eagerPin() else next
    }
    pr
  }

  /** Per-node triangle counts (each triangle credits all three corners)
    * over an undirected edge list — the clustering-coefficient /
    * community-density primitive. Input rows may be directed duplicates
    * or self-loops; edges are canonicalized first. The join is
    * DEGREE-ORDERED (each edge oriented from its lower-(degree, id)
    * endpoint): wedges form only at the LOW-degree corner of each
    * triangle, so the candidate count is Σ min-side deg² instead of
    * Σ deg² — the difference between a star hub generating O(deg²)
    * wedges and generating zero. The triangle SET is orientation-
    * invariant (any total order finds each triangle exactly once), so
    * an external oracle may use plain id-ordering and still match.
    * Three shuffles: degree agg, wedge self-join on the anchor, closing
    * edge equi-join. Output: node, n_triangles (nodes in no triangle
    * absent — left-join against your node table to zero-fill).
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String,
      checkpoint: Boolean = true): DataFrame =
    degreesAndTriangles(edges, srcCol, dstCol, checkpoint)._2

  /** Local clustering coefficient per node: 2·T / (deg·(deg−1)) — the
    * fraction of a node's neighbor pairs that are themselves connected
    * (community density; a star hub scores 0, a clique corner 1).
    * Rides the same degree-ordered triangle machinery; EVERY node of
    * the graph appears (zero-triangle nodes 0-filled — those are the
    * interesting ones). deg < 2 defines coeff = 0 (no neighbor pairs).
    * The single division is over exact integers — bit-identical on any
    * IEEE engine. Output: node, deg, n_triangles, coeff (unrounded).
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String, dstCol: String,
      checkpoint: Boolean = true): DataFrame = {
    val (deg, tris) = degreesAndTriangles(edges, srcCol, dstCol, checkpoint)
    deg.join(tris, Seq("node"), "left")
      .select(col("node"), col("deg").cast("long").as("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("deg") * (col("deg") - lit(1L))).cast("double"))
          .otherwise(lit(0.0)).as("coeff"))
  }

  /** Fixed-round k-core peeling — the graph-denoising primitive (keep
    * only nodes embedded in dense neighborhoods; fringe nodes and their
    * cascading dependents drop): each round computes degrees over the
    * SURVIVING edge set, drops nodes with deg < k, and removes their
    * incident edges — so a node that only met the bar through
    * now-removed neighbors dies next round. FIXED rounds, not
    * fixpoint — the q43/pageRank discipline that an external oracle can
    * unroll as generated CTEs (fixpoint stopping would make row content
    * depend on convergence detection); run more rounds for a deeper
    * approximation of the true k-core (equal when a round removes
    * nothing). Output: node, deg (within the final surviving subgraph —
    * may dip below k for nodes whose neighbors died in the LAST round,
    * by fixed-round semantics).
    *
    * Plan shape — ONE declarative plan, zero materialization barriers
    * (VERDICT r12: the old per-round localCheckpoint + two semi-joins
    * made this the most barrier-heavy query in the registry, 26 driver
    * jobs; barriers are what co-tenant contention multiplies): on the
    * SYMMETRIZED adjacency (both twins of an edge survive or drop
    * together, so every degree matches peeling the canonical list),
    * deg(u) is a count window over the u-clustering the previous round
    * already left behind — no exchange — and deg(v) costs the round's
    * ONE exchange (repartition by v). The round then filters both
    * endpoints and SWAPS column roles: the output is v-clustered, and
    * because the list is symmetric, relabeling (u,v)→(v,u) is the same
    * edge set — so next round's u-window again needs no exchange.
    * 1 + rounds exchanges total, |E_surviving| rows each; the final
    * degree aggregate reuses the last round's clustering. Hot-node skew
    * lands one window group on one task — the same co-location the old
    * semi-join probe forced, without its second full shuffle.
    */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int, checkpoint: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
    // symmetrize, then dedup ON TOP of the u-partitioning every later
    // stage reuses (HashPartitioning(u) satisfies the (u,v) grouping —
    // the dedup aggregate adds no exchange of its own)
    var adj = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .repartition(col("u"))
      .dropDuplicates("u", "v")
    for (_ <- 1 to rounds) {
      adj = adj
        .withColumn("_du", count(lit(1)).over(w.partitionBy("u")))
        .repartition(col("v"))
        .withColumn("_dv", count(lit(1)).over(w.partitionBy("v")))
        .filter(col("_du") >= k && col("_dv") >= k)
        .select(col("v").as("u"), col("u").as("v")) // swap: stay clustered
    }
    adj.groupBy(col("u").as("node")).agg(count(lit(1)).cast("long").as("deg"))
  }

  /** Weakly connected components over an undirected edge list — the
    * graph-facing name for the fixpoint min-label propagation that
    * powers near-dup clustering ([[Dedup.clusters]], d06: one
    * join + one aggregation per round, lineage checkpointed, fixpoint
    * witness riding the update aggregation, THROWS rather than silently
    * truncating if `maxRounds` is hit). Nodes are defined by edge
    * endpoints; self-loops collapse; ids may be any orderable type.
    * Output: node, component (min id in the component).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 20): DataFrame = {
    val pairs = edges.select(col(srcCol).as("id_a"), col(dstCol).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct()
    Dedup.clusters(nodes, "id", pairs, maxRounds, checkIds = false)
      .select(col("id").as("node"), col("cluster").as("component"))
  }

  /** Fixed-round breadth-first hop distances from a seed set over an
    * undirected edge list — the link-distance primitive of web-graph
    * curation (hops-from-trusted-seeds is the TrustRank signal, and
    * "within R links of a known-good domain" is a standard crawl-scope
    * gate). Returns every node REACHED within `rounds` hops with its
    * exact BFS level; unreached nodes are absent (absence = "farther
    * than R or disconnected", the d06 convention).
    *
    * Delta iteration, never re-expansion: round r expands ONLY the
    * frontier (nodes at distance r−1) — one equi-join frontier×adjacency
    * + one partial-agg min-merge per round, the d06/q43 discipline (the
    * naive variant re-joins the whole settled set every round and does
    * rounds× the work). The min-merge makes levels exact: a node first
    * reached at round r merges to min(existing, r), so earlier
    * discoveries always win and each node's level is its true shortest
    * hop count. Fixed `rounds`, not a fixpoint — the oracle unrolls the
    * same rounds as generated CTEs (q49's contract: iteration count
    * cannot drift between engines). Distance state is materialized
    * every `checkpointEvery` rounds (periodic lineage truncation — see
    * the adjacency note below); seeds dedupe on entry and seed nodes
    * absent from the graph still emit dist 0 (a seed is at distance 0
    * of itself by definition). Output: node, dist.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int,
      checkpoint: Boolean = true, checkpointEvery: Int = 4): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val canon0 = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // the adjacency is probed EVERY round — always materialize it; the
    // distance state only needs periodic truncation (each eager
    // checkpoint is a full blocking job: at 3 rounds, per-round dist
    // checkpoints measured 6.0 → 4.2 s at sf0.1 for zero lineage
    // benefit — the plan is still shallow; at 50 rounds, unbounded
    // lineage would swamp the planner, so truncate every few rounds)
    val canon = if (checkpoint) canon0.eagerPin() else canon0
    val adj = canon.union(canon.select(col("v"), col("u")))
      .toDF("u", "v")
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
    if (checkpoint) dist = dist.eagerPin()
    for (r <- 1 to rounds) {
      val frontier = dist.filter(col("dist") === (r - 1).toLong).select("node")
      // no distinct() on the candidates (r14): the min-merge below
      // collapses duplicate discoveries map-side in its own partial
      // aggregation, so the old distinct was a second full exchange of
      // the same rows for zero dedup the merge wasn't already doing
      val cand = frontier.join(adj, col("node") === col("u"))
        .select(col("v").as("node"), lit(r.toLong).as("dist"))
      val merged = dist.union(cand).groupBy("node")
        .agg(min("dist").as("dist"))
      dist = if (checkpoint && r % checkpointEvery == 0 && r < rounds)
        merged.eagerPin()
      else merged
    }
    dist
  }

  /** Shared core: canonical degrees + per-node triangle counts. */
  private def degreesAndTriangles(edges: DataFrame, srcCol: String,
      dstCol: String, checkpoint: Boolean): (DataFrame, DataFrame) = {
    val canon0 = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // canon feeds deg + orientation, oriented feeds e1/e2/closing —
    // materialize both or the upstream (possibly expensive) edge
    // subtree re-evaluates up to 5 times.
    val canon = if (checkpoint) canon0.eagerPin() else canon0
    // deg stays LAZY (r14): its consumers (both orientation joins, and
    // for the coefficient the final join) all sit in one physical plan
    // over the CHECKPOINTED canon, so the degree aggregation's exchange
    // canonicalizes identically under each reference and is built once
    // (ReusedExchange; only the vocab-sized final agg re-runs per
    // reference). The old eager checkpoint here was one more blocking
    // driver job per query — the quantity co-tenant contention
    // multiplies — for lineage the shallow plan never needed.
    val deg = canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // Orient each edge from the smaller (deg, id) endpoint.
    val uKey = struct(col("du").as("d"), col("u").as("n"))
    val vKey = struct(col("dv").as("d"), col("v").as("n"))
    val uFirst = uKey < vKey
    val oriented0 = canon
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("lo"),
        when(uFirst, col("v")).otherwise(col("u")).as("hi"),
        when(uFirst, vKey).otherwise(uKey).as("hiKey"))
    val oriented = if (checkpoint) oriented0.eagerPin() else oriented0
    val e1 = oriented.select(col("lo").as("a"), col("hi").as("b"), col("hiKey").as("bKey"))
    val e2 = oriented.select(col("lo").as("a2"), col("hi").as("c"), col("hiKey").as("cKey"))
    // Wedges at the anchor a, the pair (b, c) ordered by the SAME total
    // order as the orientation, so the closing edge is exactly (b -> c).
    val wedges = e1.join(e2, col("a") === col("a2") && col("bKey") < col("cKey"))
      .select(col("a"), col("b"), col("c"))
    val closing = oriented.select(col("lo").as("b"), col("hi").as("c"))
    val tris = wedges.join(closing, Seq("b", "c"))
    val counts = tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("long").as("n_triangles"))
    (deg, counts)
  }

  /** HITS hubs & authorities over a DIRECTED edge list (Kleinberg 1999) —
    * the bipartite-influence counterpart of [[pageRank]]: a node is a
    * good hub if it points at good authorities and a good authority if
    * good hubs point at it. Fixed `iters` (the q43/q49 contract: an
    * external oracle unrolls the same count), L1 normalization each
    * half-step so scores are comparable across engines without an
    * eigenvalue solve.
    *
    * Plan per iteration: two equi-join + partial-agg passes (auth from
    * hubs, hubs from auths); each L1 norm is a one-row aggregate
    * broadcast back via crossJoin — NO driver-side collect, the whole
    * iteration stays one lazy DAG. The score state is materialized
    * every iteration: each state feeds BOTH the next propagation join
    * and its own norm sum, so the un-materialized plan doubles per
    * half-step — 2^(2·iters) subtree expansion (the exponential-CTE
    * failure q49's oracle hit, on the Spark side). The edge list is
    * materialized once and probed 2·iters times.
    *
    * Output: side ('hub' = src nodes, 'auth' = dst nodes), node, score
    * (unrounded; each side sums to 1).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      checkpoint: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull).distinct()
    val e = if (checkpoint) e0.eagerPin() else e0
    // srcs materializes ONCE and serves both the metadata count and the
    // initial state (r14): the old shape ran the distinct twice — once
    // under count(), once re-evaluated under h's own eager checkpoint —
    // three barrier jobs where one suffices. The initial h is a narrow
    // projection over the checkpointed distinct, so iteration 1 reads it
    // without any extra materialization.
    val srcs = if (checkpoint) e.select("u").distinct().eagerPin()
      else e.select("u").distinct()
    val nU = srcs.count() // one metadata scalar (q43's n)
    var h = srcs.withColumn("h", lit(1.0) / lit(nU.toDouble))
    var a = e.sparkSession.emptyDataFrame
    for (_ <- 1 to iters) {
      val aRaw = e.join(h, "u").groupBy("v").agg(sum("h").as("_ar"))
      // a is NOT separately materialized: with h truncated each full
      // iteration, a's subtree is one join+agg off a materialized state —
      // its two consumers (h's propagation, the final output) re-run at
      // most that, while a second eager checkpoint per iteration is a
      // second blocking job (measured 5.9 → 4.3 s at sf0.1)
      a = aRaw.crossJoin(broadcast(aRaw.agg(sum("_ar").as("_as"))))
        .select(col("v"), (col("_ar") / col("_as")).as("a"))
      val hRaw = e.join(a, "v").groupBy("u").agg(sum("a").as("_hr"))
      val hN = hRaw.crossJoin(broadcast(hRaw.agg(sum("_hr").as("_hs"))))
        .select(col("u"), (col("_hr") / col("_hs")).as("h"))
      h = if (checkpoint) hN.eagerPin() else hN
    }
    h.select(lit("hub").as("side"), col("u").as("node"), col("h").as("score"))
      .unionByName(
        a.select(lit("auth").as("side"), col("v").as("node"), col("a").as("score")))
  }

  /** Fixed-round synchronous label propagation — community detection
    * (Raghavan et al. 2007) in the deterministic form an external
    * oracle can unroll: labels initialize to the node id; each round
    * EVERY node simultaneously adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label (the classic
    * algorithm breaks ties randomly — unverifiable; the (count desc,
    * label asc) total order makes every round a pure function of the
    * previous one, so the oracle replays rounds as generated CTEs and
    * cannot drift, the q43/q49 contract). Synchronous update (all nodes
    * from the round-(r−1) state) — label oscillation on bipartite
    * structures is possible and is part of the defined semantics at a
    * fixed round count. Per round: one adjacency⋈labels equi-join, one
    * (node, label) partial-agg count, one per-node min-struct argmax —
    * |edges| rows on the shuffle, never a driver-side graph; label
    * state checkpoints per round (the d06 lineage discipline). Node ids
    * must be numeric or string (min-struct orders them); isolated nodes
    * don't exist (nodes are edge endpoints). Output: node, label
    * (community id = some member's node id).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, checkpoint: Boolean = true): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val canon0 = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val canon = if (checkpoint) canon0.eagerPin() else canon0
    val adj0 = canon.union(canon.select(col("v"), col("u"))).toDF("u", "v")
    // pinned on u: with the (checkpointed, known-small) label state
    // broadcasting into the neighbor join, BOTH per-round aggregates —
    // the (u, label) histogram and the per-u argmax — cluster by u and
    // plan with zero Exchange; so does the initial node distinct
    val adj = if (checkpoint) pinByKey(adj0, "u") else adj0
    var labels = adj.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    if (checkpoint) labels = labels.eagerPin()
    for (_ <- 1 to rounds) {
      // neighbor label histogram, then argmax by (count desc, label asc):
      // min of struct(-count, label) — one aggregation, no window
      val hist = adj.join(labels, col("v") === col("node"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("_c"))
      val next = hist
        .groupBy(col("u").as("node"))
        .agg(min(struct((-col("_c")).as("_nc"), col("label").as("_l"))).as("_best"))
        .select(col("node"), col("_best._l").as("label"))
      labels = if (checkpoint) next.eagerPin() else next
    }
    labels
  }

  /** Fixed-round single-source(-set) shortest paths over WEIGHTED edges
    * (Bellman-Ford relaxation) — [[bfsHops]]' weighted sibling: the
    * cheapest-route primitive (logistics cost, latency, transfer-count ×
    * weight). Weights must be non-negative INTEGERS (snap currency to
    * cents upstream — exact long additions and min-merges are
    * order-independent on any engine; float path sums are not). After
    * round r every node holds the exact minimum-cost path using ≤ r
    * edges — the textbook Bellman-Ford invariant — so `rounds` bounds
    * path LENGTH, not cost, and an oracle unrolls the same rounds as
    * generated CTEs (fixed-round contract; run |V|−1 rounds for the
    * full fixpoint on any non-negative graph). Delta iteration: round r
    * expands only the frontier (nodes improved in round r−1) — provably
    * equivalent to full relaxation (an unimproved node re-sends values
    * that cannot win a min) with frontier-sized instead of graph-sized
    * join input; one frontier⋈adjacency join + one min partial-agg +
    * one improvement join per round, state checkpointed per round.
    * Edges are DIRECTED (symmetrize for undirected); parallel edges
    * collapse to their min weight on entry. Seeds dedupe; a seed absent
    * from the graph still reports dist 0. Unreached nodes are absent
    * (the d06/bfsHops convention). Output: node, dist.
    */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String, rounds: Int,
      checkpoint: Boolean = true, symmetrize: Boolean = false): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val dir = edges.select(col(srcCol).as("u"), col(dstCol).as("v"),
        col(weightCol).cast("long").as("w"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("w").isNotNull)
      .groupBy("u", "v").agg(min("w").as("w"))
    // Undirected graphs: symmetrize INSIDE, after the dedup aggregation
    // (r14). The caller-side `e.union(e.swap)` form read the raw edge
    // source twice (two corpus scans in q84's audited plan) and shuffled
    // 2× the rows into the min-collapse; aggregating the DIRECTED input
    // first and exploding both orientations of the collapsed edge table
    // scans once and shuffles half. Where both directions exist in the
    // raw input, the adjacency then carries one row per direction
    // instead of one cross-direction min row — harmless under
    // min-relaxation (cand takes min(dist + w) over ALL adjacency rows,
    // so a dominated duplicate can never win), proven output-identical
    // by the operator spec.
    val adj0 =
      if (!symmetrize) dir
      else dir
        .select(explode(array(
            struct(col("u").as("a"), col("v").as("b")),
            struct(col("v").as("a"), col("u").as("b")))).as("_e"), col("w"))
        .select(col("_e.a").as("u"), col("_e.b").as("v"), col("w"))
    // pinned on v: the frontier broadcasts into the relaxation join, so
    // the per-round candidate min-aggregate (groupBy v) needs no Exchange
    val adj = if (checkpoint) pinByKey(adj0, "v") else adj0
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
    if (checkpoint) dist = dist.eagerPin()
    var frontier = dist
    for (r <- 1 to rounds) {
      val cand = frontier.join(adj, col("node") === col("u"))
        .groupBy(col("v").as("node"))
        .agg(min(col("dist") + col("w")).as("_cd"))
      // Merge candidate mins into the state AND compute the next frontier
      // (strictly-improved nodes) in one pass — the d06 fixpoint-witness-
      // rides-the-update discipline — via ONE tagged union + min
      // aggregation (r14; the full-outer join this replaces planned two
      // Exchanges plus sort-merge sorts per round: both state and
      // candidates re-shuffled and sorted on node; the union form is a
      // single exchange with map-side partial aggregation and no sort).
      // State nodes are unique per round by construction, so
      // min(when(_self, dist)) recovers exactly the old full-outer's
      // state value, and the improvement witness is the same expression.
      val merged0 = dist
        .select(col("node"), col("dist"), lit(true).as("_self"))
        .unionByName(cand.select(col("node"), col("_cd").as("dist"),
          lit(false).as("_self")))
        .groupBy("node")
        .agg(min(when(col("_self"), col("dist"))).as("_old"),
          min(when(!col("_self"), col("dist"))).as("_cd"))
        .select(col("node"),
          least(coalesce(col("_old"), col("_cd")), coalesce(col("_cd"), col("_old")))
            .as("dist"),
          (col("_cd").isNotNull && (col("_old").isNull || col("_cd") < col("_old")))
            .as("_improved"))
      val merged = if (checkpoint) merged0.eagerPin() else merged0
      frontier = merged.filter(col("_improved")).select("node", "dist")
      dist = merged.select("node", "dist")
    }
    dist
  }

  /** Adamic–Adar link prediction: score every NON-adjacent pair (a, b)
    * that shares at least `minCommon` neighbors by
    * Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z) — rare shared neighbors weigh more
    * than hubs (Adamic & Adar 2003, "Friends and neighbors on the Web").
    *
    * Scale design: wedges are generated by a self-equi-join of the
    * undirected edge list on the CENTER node, so the per-key fan-out is
    * C(deg z, 2) — bounded by `maxCenterDeg`, the skew guard that keeps a
    * hub with 10⁶ neighbors from emitting 10¹² wedge rows. Dropping
    * high-degree centers is the standard LP approximation (a hub
    * contributes only 1/ln(deg) per pair — the least-informative signal
    * goes first), and the cap is mirrored in the verified oracle so
    * correctness holds exactly as computed. Existing edges leave by a
    * broadcast-eligible anti-join on the canonical pair. Centers of
    * degree < 2 form no wedge (and ln 1 = 0 never divides).
    *
    * Output: node_a < node_b, n_common, aa_score (unrounded).
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      maxCenterDeg: Int, minCommon: Long = 1L,
      checkpoint: Boolean = true): DataFrame = {
    require(maxCenterDeg >= 2, s"maxCenterDeg must be >= 2, got $maxCenterDeg")
    require(minCommon >= 1L, s"minCommon must be >= 1, got $minCommon")
    val canon0 = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // canon feeds the wedge baskets and the anti-join — materialize once
    // or the upstream edge subtree re-evaluates 3×
    val canon = if (checkpoint) canon0.eagerPin() else canon0
    val und = canon.select(col("u").as("z"), col("v").as("n"))
      .union(canon.select(col("v").as("z"), col("u").as("n")))
    // One groupBy collects each center's FULL (distinct, sorted) neighbor
    // list, so deg z = size of the list and wedge pairs explode NARROWLY
    // from it (the cooccurrence basket pattern) — no degree join, no
    // edge self-join shuffle. The cap drops hot centers WHOLE (never a
    // truncated neighbor list, which would silently change scores) and
    // is the BOUNDED collect (r12): a celebrity center's neighbor list
    // collapses map-side at <= cap+1 entries per task instead of
    // buffering its whole degree in one reduce task before the filter;
    // (z, n) rows are distinct by construction (canon is distinct), so
    // the capped list below the cap is the complete neighbor set.
    graft.functions.BoundedCollect.register(edges.sparkSession)
    require(maxCenterDeg < Int.MaxValue, s"maxCenterDeg out of range: $maxCenterDeg")
    val baskets = Relational.fanoutRepartition(und.groupBy("z")
      .agg(sort_array(graft.functions.BoundedCollect.boundedCollect(
        col("n"), lit(maxCenterDeg + 1))).as("_ns"))
      .filter(size(col("_ns")) >= 2 && size(col("_ns")) <= maxCenterDeg))
    graft.functions.PairExplode.register(edges.sparkSession)
    val nn = size(col("_ns"))
    // native one-pass wedge-pair generator (same (i < j) rows as the
    // nested transform/flatten HOF chain it replaced — see PairExplode)
    baskets
      .select((lit(1.0) / log(nn.cast("double"))).as("_w"),
        graft.functions.PairExplode.pairExplode(col("_ns")))
      .groupBy(col("a").as("node_a"), col("b").as("node_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("_w")).as("aa_score"))
      .filter(col("n_common") >= minCommon)
      .join(canon,
        col("node_a") === col("u") && col("node_b") === col("v"), "left_anti")
  }
}
