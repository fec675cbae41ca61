package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.{col, countDistinct, hash, lit, pmod, struct}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.operators.Relational

/** Generic-surface behaviors of the relational operators beyond the oracle
  * bindings — in particular the asofJoin hazards the round-1 review called
  * out: ids past any packing bound, heavy-tail keys, tie semantics.
  */
class RelationalOpsSuite extends SparkSpec {

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val l = left.toDF("k", "ts", "lid")
    val r = right.toDF("k", "ts", "rid")
    Relational.asofJoin(l, r, leftKey = "k", rightKey = "k",
      leftTs = "ts", rightTs = "ts", leftId = "lid", rightId = "rid")
  }

  test("asofJoin picks most-recent-prior right row, ids far beyond 1e6") {
    import spark.implicits._
    val big = 7_000_000_123L // would alias under the old ts*1e6+id packing
    val left = Seq((1L, 100L, 10L), (1L, 205L, 11L), (2L, 50L, 20L))
    val right = Seq(
      (1L, 90L, big), (1L, 100L, big + 1), (1L, 200L, big + 2),
      (2L, 60L, 1L)) // after the only left row of user 2 → no match
    val got = asof(left, right).orderBy("lid").as[(Long, Long)].collect().toSeq
    // lid=10 at ts=100: right rows at 90 and 100 qualify; ties-by-ts are not
    // in play — most recent is ts=100 → big+1. lid=11 at 205 → ts=200.
    assert(got == Seq((10L, big + 1), (11L, big + 2)))
  }

  test("asofJoin breaks rightTs ties by max rightId") {
    import spark.implicits._
    val left = Seq((1L, 100L, 1L))
    val right = Seq((1L, 100L, 3L), (1L, 100L, 9L), (1L, 100L, 5L))
    val got = asof(left, right).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 9L)))
  }

  test("asofJoin heavy-tail key: linear rows, no pair fan-out, one shuffle") {
    import spark.implicits._
    // one user with 20k clicks and 200 purchases: the old join-then-argmax
    // plan would materialize 20k×200 = 4M intermediate rows; the window
    // plan processes 20.2k rows once.
    val clicks = (0 until 20000).map(i => (1L, i.toLong * 10, 1_000_000_000L + i))
    val purchases = (0 until 200).map(i => (1L, i.toLong * 1000 + 5, 2_000_000_000L + i))
    val df = asof(purchases, clicks)
    val plan = df.queryExecution.executedPlan
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val nodes = collectAll(plan)
    assert(!nodes.exists(n =>
      n.isInstanceOf[BroadcastNestedLoopJoinExec] || n.isInstanceOf[CartesianProductExec]),
      "asofJoin must not produce a pair join")
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) <= 1,
      "asofJoin should shuffle once, on the key")
    val got = df.orderBy("lid").as[(Long, Long)].collect()
    assert(got.length == 200)
    // purchase i at ts = 1000*i+5 → latest click at ts <= that is click
    // index (1000*i+5)/10 = 100*i (ts = 1000*i), id = 1e9 + 100*i
    got.zipWithIndex.foreach { case ((lid, rid), i) =>
      assert(lid == 2_000_000_000L + i)
      assert(rid == 1_000_000_000L + 100L * i)
    }
  }

  test("asofJoin drops left rows with no prior right row") {
    import spark.implicits._
    val got = asof(Seq((5L, 10L, 1L)), Seq((5L, 11L, 2L))).count()
    assert(got == 0)
  }

  test("exactPercentiles matches the naive per-group rank selection") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // heavy duplicates + lopsided group sizes + a singleton group
    val data = Seq.fill(3000)(("a", (rnd.nextInt(40) * 25).toDouble)) ++
      Seq.fill(500)(("b", rnd.nextDouble() * 100)) ++
      Seq(("c", 42.0))
    val df = rnd.shuffle(data).toDF("g", "v").repartition(13)
    val ps = Seq("50" -> 0.5, "90" -> 0.9, "99" -> 0.99)
    val got = Relational.exactPercentiles(df, "g", "v", ps, partitions = 7)
      .orderBy("g").as[(String, Double, Double, Double)].collect().toSeq
    val expected = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, xs) =>
      val sortedVs = xs.map(_._2).sorted
      def at(p: Double) = sortedVs(math.max(1, math.ceil(p * sortedVs.size).toInt) - 1)
      (g, at(0.5), at(0.9), at(0.99))
    }
    assert(got == expected)
  }

  test("rangeJoin: matches the naive inequality join, without its nested-loop plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val l = (1L to 400L).map(i => (i, rnd.nextInt(100000).toLong)).toDF("lid", "lt")
    val r = (1L to 400L).map(i => (i, rnd.nextInt(100000).toLong)).toDF("rid", "rt")
    val got = Relational.rangeJoin(l, r, col("lt"), col("rt"), -250, 250)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = l.join(r, col("rt") >= col("lt") - 250 && col("rt") <= col("lt") + 250)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == naive, "binned join must find exactly the naive matches")
    assert(got.nonEmpty)
    // asymmetric window too (strictly-after correlation)
    val asym = Relational.rangeJoin(l, r, col("lt"), col("rt"), 1, 500)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val asymNaive = l.join(r, col("rt") >= col("lt") + 1 && col("rt") <= col("lt") + 500)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(asym == asymNaive)
    // the plan is a hash equi-join on the bin — never the O(n^2) fallback
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: collectAll(q.plan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val df = Relational.rangeJoin(l, r, col("lt"), col("rt"), -250, 250)
    df.collect()
    val nodes = collectAll(df.queryExecution.executedPlan)
    assert(!nodes.exists(n =>
      n.isInstanceOf[BroadcastNestedLoopJoinExec] || n.isInstanceOf[CartesianProductExec]),
      "rangeJoin must bin into an equi-join, not a nested-loop scan")
    val naiveDf = l.join(r, col("rt") >= col("lt") - 250 && col("rt") <= col("lt") + 250)
    naiveDf.collect()
    val naiveNodes = collectAll(naiveDf.queryExecution.executedPlan)
    assert(naiveNodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"sanity: raw inequality join plan was ${naiveNodes.map(_.getClass.getSimpleName)}")
  }

  test("funnel: greedy earliest chain, strict-after, partial completion") {
    import spark.implicits._
    val events = Seq(
      // user 1 completes A->B->C, with decoys: the B BEFORE the first A
      // must not count; the chain takes the EARLIEST valid each step
      (1L, 5L, "B"), (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "B"), (1L, 40L, "C"),
      // user 2: A and B at the SAME ts — strict-after rejects the B
      (2L, 10L, "A"), (2L, 10L, "B"),
      // user 3: only decoy steps
      (3L, 10L, "X"),
      // user 4: steps arrive out of order in the input (shuffled rows)
      (4L, 300L, "C"), (4L, 100L, "A"), (4L, 200L, "B")
    ).toDF("u", "ts", "step").repartition(5)
    val got = Relational.funnel(events, "u", col("ts"), "step", Seq("A", "B", "C"))
      .orderBy("u")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, Some(10L), Some(20L), Some(40L)),
      (2L, 1L, Some(10L), None, None),
      (3L, 0L, None, None, None),
      (4L, 3L, Some(100L), Some(200L), Some(300L))))
  }

  test("funnel: completion window expires stale chains; restart finds later conversions") {
    import spark.implicits._
    val events = Seq(
      // user 1: first chain expires after 2 steps (C arrives past the
      // window); a complete conversion starts later and must be found
      (1L, 0L, "A"), (1L, 100L, "B"), (1L, 5000L, "C"),
      (1L, 6000L, "A"), (1L, 6100L, "B"), (1L, 6200L, "C"),
      // user 2: all steps inside the window -> complete on the first try
      (2L, 0L, "A"), (2L, 400L, "B"), (2L, 900L, "C")
    ).toDF("u", "ts", "step")
    val got = Relational.funnel(events, "u", col("ts"), "step", Seq("A", "B", "C"),
        windowMs = Some(1000L))
      .orderBy("u").as[(Long, Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, Some(6000L), Some(6100L), Some(6200L)),
      (2L, 3L, Some(0L), Some(400L), Some(900L))))
    // without a window, user 1's first chain completes at the late C
    val unbounded = Relational.funnel(events, "u", col("ts"), "step", Seq("A", "B", "C"))
      .orderBy("u").as[(Long, Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(unbounded.head == (1L, 3L, Some(0L), Some(100L), Some(5000L)))
  }

  test("exactPercentiles: high-cardinality groups fall back to the window plan, same answers") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 60 groups of varied sizes, plus null values that must be ignored
    val data = (0 until 60).flatMap { g =>
      Seq.fill(20 + g)((f"g$g%02d", rnd.nextDouble() * 100))
    }
    val withNulls = data.map { case (g, v) => (g, v: java.lang.Double) } ++
      Seq(("g00", null: java.lang.Double), ("g59", null: java.lang.Double))
    val df = rnd.shuffle(withNulls).toDF("g", "v").repartition(9)
    val ps = Seq("50" -> 0.5, "90" -> 0.9)
    // maxExactGroups below |groups| → window fallback; default → exact path
    val fallback = Relational.exactPercentiles(df, "g", "v", ps, partitions = 7, maxExactGroups = 10)
      .orderBy("g").as[(String, Double, Double)].collect().toSeq
    val exact = Relational.exactPercentiles(df, "g", "v", ps, partitions = 7)
      .orderBy("g").as[(String, Double, Double)].collect().toSeq
    val expected = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, xs) =>
      val sortedVs = xs.map(_._2).sorted
      def at(p: Double) = sortedVs(math.max(1, math.ceil(p * sortedVs.size).toInt) - 1)
      (g, at(0.5), at(0.9))
    }
    assert(fallback == expected, "window-fallback path must match the naive selection")
    assert(exact == expected, "range-partitioned path must ignore nulls and match")
  }

  test("gapFill: dense per-entity grid, forward fill, deterministic conflicts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // entity 1: observations at buckets 10 (v=1.0) and 13 (two events in
    // the bucket: tie resolves to the later (t, id) -> v=5.0); entity 2:
    // a single observation (span of one bucket, nothing filled)
    val df = Seq(
      (1L, 10L, 1.0, 100L, 1L),
      (1L, 13L, 4.0, 200L, 2L),
      (1L, 13L, 5.0, 200L, 3L), // same t as id=2 -> id breaks the tie
      (2L, 7L, 9.0, 50L, 4L)
    ).toDF("e", "b", "v", "t", "id")
    val got = graft.operators.Relational.gapFill(df, "e",
        bucket = col("b"), value = col("v"), tie = struct(col("t"), col("id")))
      .orderBy("e", "bucket")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, 1.0, true),
      (1L, 11L, 1.0, false), // filled from bucket 10
      (1L, 12L, 1.0, false),
      (1L, 13L, 5.0, true),  // max (t, id) observation wins
      (2L, 7L, 9.0, true)))
  }

  test("latestByKey keeps the max-(order, tie) row per key") {
    import spark.implicits._
    val df = Seq(
      ("a", 10L, 1L, "v1"),
      ("a", 20L, 2L, "v2"),
      ("a", 20L, 3L, "v3"), // ts tie -> higher id wins
      ("b", 5L, 4L, "w1")
    ).toDF("k", "ts", "id", "payload")
    val got = Relational.latestByKey(df, "k",
        orderCols = Seq(col("ts"), col("id")),
        payloadCols = Seq(col("ts").as("last_ts"), col("id").as("last_id"),
          col("payload").as("last_payload")))
      .orderBy("k").as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(("a", 20L, 3L, "v3"), ("b", 5L, 4L, "w1")))
  }

  test("latestByKey plan is an aggregate (map-side candidate), not a window sort") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L)).toDF("k", "ts", "id")
    val plan = Relational.latestByKey(df, "k", Seq(col("ts")),
      Seq(col("id").as("last_id"))).queryExecution.executedPlan
    def collect(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collect(a.executedPlan)
      case other => other +: other.children.flatMap(collect)
    }
    val nodes = collect(plan).map(_.getClass.getSimpleName)
    assert(!nodes.exists(_.contains("Window")), s"window in plan: $nodes")
    assert(nodes.exists(_.contains("Aggregate")), s"no aggregate in plan: $nodes")
  }

  test("cooccurrence counts entities sharing both items; duplicates collapse") {
    import spark.implicits._
    // entity 1 sees x twice (multiplicity must not inflate counts)
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "y"), (3L, "z")).toDF("e", "i")
    val got = Relational.cooccurrence(df, "e", "i")
      .orderBy("item_a", "item_b").as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("x", "y", 2L), ("x", "z", 1L), ("y", "z", 2L)))
  }

  test("pageRank: mass conserved on symmetric graphs; star center dominates") {
    import spark.implicits._
    import graft.operators.Graph
    // undirected star: center 0 <-> leaves 1..6 (symmetrized edges)
    val star = ((1L to 6L).map(l => (0L, l)) ++ (1L to 6L).map(l => (l, 0L))).toDF("src", "dst")
    val pr = Graph.pageRank(star, "src", "dst", iters = 10).as[(Long, Double)].collect().toMap
    // no dangling nodes -> total mass stays 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass ${pr.values.sum}")
    assert((1L to 6L).forall(l => pr(0L) > pr(l) * 2), s"center must dominate: $pr")
    // leaves are symmetric -> identical ranks
    assert((2L to 6L).forall(l => math.abs(pr(l) - pr(1L)) < 1e-12))
    // ring: perfectly regular -> uniform 1/n at any iteration count
    val ring = (0L until 5L).flatMap(i =>
      Seq((i, (i + 1) % 5), ((i + 1) % 5, i))).toDF("src", "dst")
    val rpr = Graph.pageRank(ring, "src", "dst", iters = 3).as[(Long, Double)].collect()
    rpr.foreach { case (n, p) => assert(math.abs(p - 0.2) < 1e-12, s"node $n: $p") }
  }

  test("ewma: exact fold per entity, order/tie respected, reset across entities, null drop") {
    import spark.implicits._
    // entity 1: values 100, 200, 400 in ts order (tie breaks the equal ts)
    // entity 2 single row; a null value row drops whole
    val df = Seq(
      (1L, 10L, 1L, Some(1.0)),
      (1L, 20L, 3L, Some(4.0)),
      (1L, 20L, 2L, Some(2.0)), // same ts as tie=3 but lower tie -> folds first
      (2L, 5L, 4L, Some(9.0)),
      (1L, 30L, 5L, None)
    ).map { case (e, o, t, v) => (e, o, t, v.map(Double.box).orNull) }
      .toDF("e", "o", "t", "v")
    val got = Relational.ewma(df, col("e"), col("o"), col("t"), col("v"), alpha = 0.25)
      .orderBy("entity", "ord", "tie")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val y1 = 100.0
    val y2 = 0.25 * 200.0 + 0.75 * y1 // tie=2 folds before tie=3
    val y3 = 0.25 * 400.0 + 0.75 * y2
    assert(got == Seq(
      (1L, 10L, 1L, 100L, y1),
      (1L, 20L, 2L, 200L, y2),
      (1L, 20L, 3L, 400L, y3),
      (2L, 5L, 4L, 900L, 900.0)), got.toString)
    intercept[IllegalArgumentException] {
      Relational.ewma(df, col("e"), col("o"), col("t"), col("v"), alpha = 1.0)
    }
  }

  test("bfsHops: exact levels on a path, min-merge across seeds, isolated seed, unreached absent") {
    import spark.implicits._
    import graft.operators.Graph
    // path 1-2-3-4-5-6 declared one-directionally with a duplicate edge
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 1L))
      .toDF("src", "dst")
    val one = Graph.bfsHops(path, "src", "dst",
        Seq(1L).toDF("seed"), "seed", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), one.toString)
    // two seeds: node 4 is 3 hops from seed 1 but 2 from seed 6 -> min wins
    val two = Graph.bfsHops(path, "src", "dst",
        Seq(1L, 6L).toDF("seed"), "seed", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 0L), two.toString)
    // a seed absent from the edge list is still at distance 0 of itself
    val iso = Graph.bfsHops(path, "src", "dst",
        Seq(99L).toDF("seed"), "seed", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(iso == Map(99L -> 0L), iso.toString)
    intercept[IllegalArgumentException] {
      Graph.bfsHops(path, "src", "dst", Seq(1L).toDF("seed"), "seed", rounds = 0)
    }
  }

  test("triangleCounts: K4 credits every node 3; square has none; direction/dups collapse") {
    import spark.implicits._
    import graft.operators.Graph
    // K4 (complete on 4 nodes) = 4 triangles, each node in exactly 3;
    // fed as DIRECTED duplicates + a self-loop to prove canonicalization
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)) :+ (2L, 2L)
    val got = Graph.triangleCounts(k4.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"$got")
    // 4-cycle: wedges exist but no closing edge -> empty result
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    assert(Graph.triangleCounts(sq, "src", "dst").count() == 0)
    // star + one leaf-leaf edge: exactly one triangle, hub NOT a wedge
    // anchor under degree ordering yet still credited
    val star = ((1L to 5L).map(l => (0L, l)) :+ (1L, 2L)).toDF("src", "dst")
    val sg = Graph.triangleCounts(star, "src", "dst").as[(Long, Long)].collect().toMap
    assert(sg == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"$sg")
  }

  test("adamicAdar: hand path scores, existing edges excluded, hub cap drops centers") {
    import spark.implicits._
    import graft.operators.Graph
    // path 1-2-3-4: predictions (1,3) via center 2 (deg 2), (2,4) via 3
    // (deg 2); (1,4) shares no neighbor. Score = 1/ln(2). Directed dup +
    // self-loop exercise canonicalization.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 2L), (1L, 1L))
      .toDF("src", "dst")
    val got = Graph.adamicAdar(path, "src", "dst", maxCenterDeg = 10)
      .orderBy("node_a", "node_b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val s = 1.0 / math.log(2.0)
    assert(got.map(g => (g._1, g._2, g._3)) == Seq((1L, 3L, 1L), (2L, 4L, 1L)), s"$got")
    assert(got.forall(g => math.abs(g._4 - s) < 1e-12), s"$got")
    // triangle 1-2-3: every wedge pair is already an edge -> no predictions
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.adamicAdar(tri, "src", "dst", maxCenterDeg = 10).count() == 0)
    // star hub with 5 leaves: cap 4 < deg 5 removes the only center ->
    // nothing predicted; cap 5 predicts all C(5,2) leaf pairs at 1/ln 5
    val star = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    assert(Graph.adamicAdar(star, "src", "dst", maxCenterDeg = 4).count() == 0)
    val capped = Graph.adamicAdar(star, "src", "dst", maxCenterDeg = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(capped.length == 10 &&
      capped.forall(g => math.abs(g._4 - 1.0 / math.log(5.0)) < 1e-12), s"${capped.toSeq}")
    // minCommon filters single-neighbor pairs: 4-cycle's opposite corners
    // share TWO centers (score 2/ln 2) and survive minCommon = 2
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val two = Graph.adamicAdar(cyc, "src", "dst", maxCenterDeg = 10, minCommon = 2L)
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(two.map(g => (g._1, g._2, g._3)) == Seq((1L, 3L, 2L), (2L, 4L, 2L)), s"$two")
    assert(two.forall(g => math.abs(g._4 - 2.0 / math.log(2.0)) < 1e-12))
    intercept[IllegalArgumentException] {
      Graph.adamicAdar(cyc, "src", "dst", maxCenterDeg = 1)
    }
  }

  test("connectedComponents: separate components, chains, self-loops, string ids") {
    import spark.implicits._
    import graft.operators.Graph
    // two components: chain 1-2-3-4 and pair 10-11; self-loop 20-20
    // defines a singleton node
    val g = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (20L, 20L))
      .toDF("src", "dst")
    val r = Graph.connectedComponents(g, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L), s"$r")
    // string ids: min label is lexicographic
    val s = Seq(("b", "c"), ("a", "b")).toDF("src", "dst")
    val rs = Graph.connectedComponents(s, "src", "dst")
      .as[(String, String)].collect().toMap
    assert(rs == Map("a" -> "a", "b" -> "a", "c" -> "a"), s"$rs")
  }

  test("kCorePeel: cascade peels dependents round by round; core is stable") {
    import spark.implicits._
    import graft.operators.Graph
    // triangle 1-2-3 with a pendant chain 3-4-5: k=2 round 1 drops 5
    // (deg 1); round 2 drops 4 (its neighbor died); the triangle stands
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    def nodes(rounds: Int) = Graph.kCorePeel(g, "src", "dst", k = 2, rounds = rounds)
      .as[(Long, Long)].collect().toMap
    assert(nodes(1).keySet == Set(1L, 2L, 3L, 4L), s"round 1: ${nodes(1)}")
    assert(nodes(2).keySet == Set(1L, 2L, 3L), s"cascade must reach 4: ${nodes(2)}")
    // stable core: more rounds change nothing, triangle degrees all 2
    assert(nodes(4) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the densest core empties the graph
    assert(Graph.kCorePeel(g, "src", "dst", k = 3, rounds = 3).count() == 0)
  }

  test("associationRules: hand-computed confidence/lift, direction asymmetry, thresholds") {
    import spark.implicits._
    import graft.operators.Relational
    // 4 baskets: {a,b} ×2, {a,b,c}, {a,c}. n=4; a in 4, b in 3, c in 2;
    // ab=3, ac=2, bc=1. Raw event multiplicity (dup a in e1) collapses.
    val ev = Seq(
      (1, "a"), (1, "a"), (1, "b"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "b"), (3, "c"),
      (4, "a"), (4, "c")).toDF("e", "i")
    val r = Relational.associationRules(ev, "e", "i", minBoth = 1, minConf = 0.0)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(r.size == 6, s"${r.keySet}")
    val ab = r(("a", "b")); val ba = r(("b", "a"))
    assert(ab._3 == 3 && ab._4 == 4 && ab._5 == 3)
    assert(ab._6 == 3.0 / 4.0 && ba._6 == 1.0, s"$ab $ba") // asymmetric confidence
    assert(ab._7 == (4.0 * 3.0) / (4.0 * 3.0) && ba._7 == ab._7) // lift symmetric
    assert(r(("b", "c"))._7 == (4.0 * 1.0) / (3.0 * 2.0))
    // thresholds: minBoth=2 kills bc both directions; minConf=0.9 keeps
    // only rules whose antecedent nearly always implies the consequent
    val r2 = Relational.associationRules(ev, "e", "i", minBoth = 2, minConf = 0.0)
    assert(r2.count() == 4)
    val r3 = Relational.associationRules(ev, "e", "i", minBoth = 1, minConf = 0.9)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(t => (t._1, t._2)).toSet
    assert(r3 == Set(("b", "a"), ("c", "a")), s"$r3")
    // basket cap drops oversized entities WHOLE (item counts included):
    // capping at 2 removes basket 3 — ab drops to 2 co-occurrences, bc
    // vanishes, and a's item count falls to 3 (n is now 3 baskets)
    val r4 = Relational.associationRules(ev, "e", "i", minBoth = 1, minConf = 0.0,
      maxBasket = 2).as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(r4.keySet == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")))
    val ab4 = r4(("a", "b"))
    assert(ab4._3 == 2 && ab4._4 == 3 && ab4._5 == 2, s"$ab4")
    assert(ab4._7 == (3.0 * 2.0) / (3.0 * 2.0), s"$ab4")
  }

  test("eventTransitions: per-entity chains, last event dropped, exact probs") {
    import spark.implicits._
    import graft.operators.Relational
    // u1: a->b->a->c ; u2: b->a. No cross-user transition (u1's c never
    // links to u2's b); each user's last event emits nothing.
    val ev = Seq(
      (1, 10L, 1L, "a"), (1, 20L, 2L, "b"), (1, 30L, 3L, "a"), (1, 40L, 4L, "c"),
      (2, 15L, 5L, "b"), (2, 25L, 6L, "a")).toDF("u", "ts", "id", "e")
    val r = Relational.eventTransitions(ev, "u", "e", "ts", "id")
      .as[(String, String, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(r.keySet == Set(("a", "b"), ("a", "c"), ("b", "a")), s"${r.keySet}")
    assert(r(("a", "b")) == (("a", "b", 1L, 2L, 0.5)))
    assert(r(("a", "c")) == (("a", "c", 1L, 2L, 0.5)))
    assert(r(("b", "a")) == (("b", "a", 2L, 2L, 1.0)))
    // tie at equal ts resolves by the tie column: (ts=30,id=3,a) before
    // (ts=30,id=9,d) — swap id order and the chain changes
    val tie = Seq((1, 10L, 1L, "a"), (1, 10L, 2L, "b")).toDF("u", "ts", "id", "e")
    val rt = Relational.eventTransitions(tie, "u", "e", "ts", "id")
      .as[(String, String, Long, Long, Double)].collect()
    assert(rt.toSeq == Seq(("a", "b", 1L, 1L, 1.0)), s"${rt.toSeq}")
  }

  test("linearTrend: exact fit, flat line, guards, paired null drop") {
    import spark.implicits._
    import graft.operators.Relational
    // g1: y = 2x + 1 exactly (slope 2, intercept 1 — in cent units ×100);
    // g2: flat y=5 (slope 0); g3: single point (dropped, n<2);
    // g4: zero x-variance (dropped); null x or y rows drop whole
    val df = Seq(
      ("g1", Some(0L), Some(1.0)), ("g1", Some(1L), Some(3.0)), ("g1", Some(2L), Some(5.0)),
      ("g1", None, Some(99.0)), ("g1", Some(9L), None),
      ("g2", Some(0L), Some(5.0)), ("g2", Some(4L), Some(5.0)),
      ("g3", Some(1L), Some(1.0)),
      ("g4", Some(7L), Some(1.0)), ("g4", Some(7L), Some(2.0))
    ).toDF("g", "x", "y")
    val r = Relational.linearTrend(df, Seq("g"), col("x"), col("y"))
      .as[(String, Long, Double, Double)].collect().map(t => t._1 -> t).toMap
    assert(r.keySet == Set("g1", "g2"), s"${r.keySet}")
    assert(r("g1") == (("g1", 3L, 200.0, 100.0)), s"${r("g1")}") // cents: 2.0 → 200/x-step
    assert(r("g2") == (("g2", 2L, 0.0, 500.0)), s"${r("g2")}")
  }

  test("clusteringCoefficient: clique=1, hub~0, every node present, deg<2 zero") {
    import spark.implicits._
    import graft.operators.Graph
    // star 0-(1..4) + edge (1,2) + pendant (5,6): hub 0 has 1 closed
    // pair of 6 -> 1/6; leaves 1,2 have deg 2, their one pair closed -> 1;
    // leaves 3,4 deg 1 -> 0 but PRESENT; pendant nodes deg 1 -> 0
    val edges = ((1L to 4L).map(l => (0L, l)) ++ Seq((1L, 2L), (5L, 6L))).toDF("src", "dst")
    val got = Graph.clusteringCoefficient(edges, "src", "dst")
      .orderBy("node").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == (0L to 6L), s"every node must appear: $got")
    val byNode = got.map(r => r._1 -> r).toMap
    assert(math.abs(byNode(0L)._4 - 1.0 / 6) < 1e-12, s"hub: ${byNode(0L)}")
    assert(byNode(1L)._4 == 1.0 && byNode(2L)._4 == 1.0)
    assert(Seq(3L, 4L, 5L, 6L).forall(n => byNode(n)._4 == 0.0 && byNode(n)._3 == 0L))
    // clique: every corner fully closed
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)).toDF("src", "dst")
    assert(Graph.clusteringCoefficient(k4, "src", "dst")
      .as[(Long, Long, Long, Double)].collect().forall(r => r._4 == 1.0 && r._2 == 3L))
  }

  test("zscoreOutliers flags the planted spike, exact-integer stats, no window in plan") {
    import spark.implicits._
    // 40 values at ~10.00 plus one planted 99.00 spike per group g1;
    // g2 is constant (zero variance -> no rows); g3 has n=1 -> no rows
    val base = (1 to 40).map(i => ("g1", 10.0 + (i % 3) * 0.01))
    val df = (base :+ (("g1", 99.0)) :+ (("g2", 5.0)) :+ (("g2", 5.0)) :+ (("g3", 7.0)))
      .toDF("g", "v")
    val out = Relational.zscoreOutliers(df, Seq("g"), col("v"), 3.0,
      payloadCols = Seq(col("v")))
    val rows = out.as[(String, Double, Double)].collect().toSeq
    assert(rows.map(r => (r._1, r._2)) == Seq(("g1", 99.0)), s"$rows")
    assert(rows.head._3 > 6.0, s"z was ${rows.head._3}")
    // the plan must be agg + broadcast-join + filter — never a window
    val plan = out.queryExecution.optimizedPlan
    def collect(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
      p +: p.children.flatMap(collect)
    assert(!collect(plan).map(_.getClass.getSimpleName).exists(_.contains("Window")))
  }

  test("runningConcurrency: exact series, half-open handoff, partition-invariant") {
    import spark.implicits._
    // intervals: A[0,10) B[5,15) C[10,20) — C starts exactly when A ends
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 15L), (3L, 10L, 20L)).toDF("id", "s", "e")
    def series(parts: Int) = Relational
      .runningConcurrency(iv, col("id"), col("s"), col("e"), partitions = parts)
      .orderBy("t", "delta", "id").as[(Long, Int, Long, Long)].collect().toSeq
    val got = series(2)
    // at t=10 the end (-1) applies before the start (+1): no phantom 3
    assert(got.map(_._4).max == 2, s"max concurrency must be 2: $got")
    assert(got == Seq((0L, 1, 1L, 1L), (5L, 1, 2L, 2L), (10L, -1, 1L, 1L),
      (10L, 1, 3L, 2L), (15L, -1, 2L, 1L), (20L, -1, 3L, 0L)), got.toString)
    // the offsets absorb wherever the range partitioner cuts
    assert(series(5) == got && series(1) == got, "values must not depend on partitioning")
    // ids stay NATIVE: string keys must work (a numeric cast would null
    // them out and silently drop every row)
    val siv = Seq(("a", 0L, 10L), ("b", 5L, 15L)).toDF("id", "s", "e")
    val sgot = Relational.runningConcurrency(siv, col("id"), col("s"), col("e"))
      .orderBy("t", "delta", "id")
      .select("id", "concurrency").as[(String, Long)].collect().toSeq
    assert(sgot == Seq(("a", 1L), ("b", 2L), ("a", 1L), ("b", 0L)), sgot.toString)
    // a null endpoint drops the WHOLE interval — a stranded partner ±1
    // would corrupt every count after it (and could go negative)
    val niv = Seq((Some(1L), Some(0L), None), (Some(2L), Some(5L), Some(15L)))
      .toDF("id", "s", "e")
    val ngot = Relational.runningConcurrency(niv, col("id"), col("s"), col("e"))
      .orderBy("t").select("id", "concurrency").as[(Long, Long)].collect().toSeq
    assert(ngot == Seq((2L, 1L), (2L, 0L)), s"null-endpoint interval must vanish whole: $ngot")
  }

  test("approx_percentile brackets exactPercentiles within accuracy bound") {
    import spark.implicits._
    // at 100 TB q16's exact rank selection gives way to approx_percentile
    // (fixed-size t-digest-style state, partial agg); this pins the two
    // surfaces together: approx with accuracy A has rank error <= n/A
    import org.apache.spark.sql.functions.{approx_percentile => ap, lit => l, expr}
    val n = 10000
    val df = (1 to n).map(i => ("g", i.toDouble)).toDF("g", "v")
    val exact = Relational.exactPercentiles(df, "g", "v",
      Seq("50" -> 0.5, "99" -> 0.99)).select("p50", "p99")
      .as[(Double, Double)].head()
    val acc = 1000 // rank error <= n/acc = 10
    val approx = df.groupBy("g").agg(
        ap(col("v"), l(0.5), l(acc)).as("a50"),
        ap(col("v"), l(0.99), l(acc)).as("a99"))
      .select("a50", "a99").as[(Double, Double)].head()
    assert(math.abs(approx._1 - exact._1) <= n / acc + 1, s"$approx vs $exact")
    assert(math.abs(approx._2 - exact._2) <= n / acc + 1, s"$approx vs $exact")
  }

  test("sketchDistinct tracks exact distinct within HLL error; rollup equals direct") {
    import spark.implicits._
    // 3 groups × overlapping value ranges; exact distincts 2000/1000/500
    val df = ((0 until 2000).map(i => ("a", s"u$i")) ++
      (500 until 1500).map(i => ("b", s"u$i")) ++
      (0 until 500).map(i => ("c", s"u$i"))).toDF("g", "u")
    val est = Relational.sketchDistinct(df, "u", Seq("g"))
      .as[(String, Long)].collect().toMap
    val exact = Map("a" -> 2000L, "b" -> 1000L, "c" -> 500L)
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= n * 0.05, s"group $g: est ${est(g)} vs exact $n")
    }
    // shard the corpus, build per-shard sketches, roll up: the rolled-up
    // estimate carries the same error bound vs the EXACT count (union is
    // not bit-identical to a direct sketch — Datasketches merges through
    // an HLL_8 gadget — but the bound holds)
    val sharded = df.withColumn("shard", pmod(hash(col("u")), lit(4)))
    val parts = Relational.sketchBuild(sharded, "u", Seq("g", "shard"))
    val rolled = Relational.sketchRollup(parts, Seq("g"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(rolled(g) - n) <= n * 0.05, s"rollup $g: ${rolled(g)} vs exact $n")
    }
  }

  test("saltedJoin returns exactly the plain join's rows") {
    import spark.implicits._
    // skewed fact: key 1 carries 90% of rows
    val fact = ((1 to 90).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (2L, 100L + i))).toDF("k", "fv")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "unmatched")).toDF("k", "dv")
    val plain = fact.join(dim, "k").select("k", "fv", "dv")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Relational.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "fv", "dv").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    // the salt actually spreads the hot key: >1 distinct salt on key 1
    val salts = fact.withColumn("_salt", pmod(hash(col("k"), col("fv")), lit(8)))
      .filter(col("k") === 1).select(countDistinct(col("_salt"))).as[Long].head()
    assert(salts > 1, "hot key must scatter across salts")
    // with a shuffle_hash-hinted dim (the q46 binding's shape) the join
    // must stay a SHUFFLED hash join keyed on (k, _salt) — broadcast
    // would silently defeat the skew split
    val hinted = Relational.saltedJoin(fact, dim, "k", salts = 8,
      dimHint = Some("shuffle_hash"))
    hinted.collect()
    def phys(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan +: phys(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: phys(q.plan)
      case _ => p +: p.children.flatMap(phys)
    }
    val joins = phys(hinted.queryExecution.executedPlan)
      .filter(_.getClass.getSimpleName.contains("ShuffledHashJoin"))
    assert(joins.nonEmpty, "salted+hinted join must be ShuffledHashJoin")
    assert(joins.head.toString.contains("_salt"), "join keys must include the salt")
  }

  test("cooccurrence maxBasket drops oversized baskets whole") {
    import spark.implicits._
    val hot = (1 to 10).map(i => (99L, s"i$i")) // basket of 10
    val df = (Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")) ++ hot).toDF("e", "i")
    val got = Relational.cooccurrence(df, "e", "i", maxBasket = 5)
      .as[(String, String, Long)].collect().toSeq
    // entity 99 contributes nothing — not even its (a-ish) pairs
    assert(got == Seq(("a", "b", 2L)))
  }

  test("pearsonCorr: perfect fits, sign, guards, paired null drop") {
    import spark.implicits._
    // g1: y = 2x exactly -> r = 1; g2: y = -x -> r = -1;
    // g3: single point (n<2, dropped); g4: zero x-variance (dropped);
    // null on either side drops the whole pair
    val df = Seq(
      ("g1", Some(1.0), Some(2.0)), ("g1", Some(2.0), Some(4.0)), ("g1", Some(3.0), Some(6.0)),
      ("g1", None, Some(9.0)), ("g1", Some(9.0), None),
      ("g2", Some(1.0), Some(3.0)), ("g2", Some(2.0), Some(2.0)), ("g2", Some(3.0), Some(1.0)),
      ("g3", Some(1.0), Some(1.0)),
      ("g4", Some(5.0), Some(1.0)), ("g4", Some(5.0), Some(2.0))
    ).toDF("g", "x", "y")
    val r = Relational.pearsonCorr(df, Seq("g"), col("x"), col("y"), 1L, 1L)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r.keySet == Set("g1", "g2"), s"${r.keySet}")
    // sqrt(dx)*sqrt(dy) != sqrt(dx*dy) in float: perfect fits land within
    // an ulp of ±1, not exactly on it (deterministically so on any engine)
    assert(r("g1")._2 == 3L && math.abs(r("g1")._3 - 1.0) < 1e-12, s"${r("g1")}")
    assert(r("g2")._2 == 3L && math.abs(r("g2")._3 + 1.0) < 1e-12, s"${r("g2")}")
    // uncorrelated square: the four corners give r = 0 exactly
    val sq = Seq(("u", 0.0, 0.0), ("u", 0.0, 1.0), ("u", 1.0, 0.0), ("u", 1.0, 1.0))
      .toDF("g", "x", "y")
    val u = Relational.pearsonCorr(sq, Seq("g"), col("x"), col("y"), 1L, 1L)
      .as[(String, Long, Double)].head()
    assert(u == (("u", 4L, 0.0)), s"$u")
  }

  test("giniIndex: equality=0, full concentration, hand value, negatives rejected") {
    import spark.implicits._
    // equal values -> G = 0; one-holder (0,0,0,10) -> G = (n-1)/n = 0.75;
    // hand case (1,2,3,4): G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
    val df = Seq(
      ("eq", 1L, 5.0), ("eq", 2L, 5.0), ("eq", 3L, 5.0), ("eq", 4L, 5.0),
      ("one", 1L, 0.0), ("one", 2L, 0.0), ("one", 3L, 0.0), ("one", 4L, 10.0),
      ("h", 1L, 1.0), ("h", 2L, 2.0), ("h", 3L, 3.0), ("h", 4L, 4.0),
      ("z", 1L, 0.0), ("z", 2L, 0.0) // all-zero total -> dropped (0/0)
    ).toDF("g", "id", "v")
    val r = Relational.giniIndex(df, Seq("g"), col("v"), col("id"), scale = 1L)
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r.keySet == Set("eq", "one", "h"), s"${r.keySet}")
    assert(r("eq")._4 == 0.0, s"${r("eq")}")
    assert(r("one")._4 == 0.75, s"${r("one")}")
    assert(r("h") == (("h", 4L, 10L, 0.25)), s"${r("h")}")
    // a negative value is out of domain — the row is excluded, not folded in
    val neg = Seq(("n", 1L, -5.0), ("n", 2L, 5.0), ("n", 3L, 5.0)).toDF("g", "id", "v")
    val rn = Relational.giniIndex(neg, Seq("g"), col("v"), col("id"), scale = 1L)
      .as[(String, Long, Long, Double)].head()
    assert(rn._2 == 2L && rn._4 == 0.0, s"$rn")
  }

  test("herfindahl: monopoly=1, uniform=1/n, pre-agg across rows, decimal squares") {
    import spark.implicits._
    // g1: one entity holds everything -> HHI = 1; g2: 4 equal entities -> 0.25;
    // g3: entity totals build from MULTIPLE rows (2+3 vs 5) -> shares 0.5/0.5
    val df = Seq(
      ("g1", "a", 7.0), ("g1", "a", 3.0),
      ("g2", "a", 5.0), ("g2", "b", 5.0), ("g2", "c", 5.0), ("g2", "d", 5.0),
      ("g3", "a", 2.0), ("g3", "a", 3.0), ("g3", "b", 5.0)
    ).toDF("g", "e", "v")
    val r = Relational.herfindahl(df, Seq("g"), col("e"), col("v"), scale = 1L)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r("g1") == (("g1", 1L, 1.0)), s"${r("g1")}")
    assert(r("g2") == (("g2", 4L, 0.25)), s"${r("g2")}")
    assert(r("g3") == (("g3", 2L, 0.5)), s"${r("g3")}")
    // squares that overflow a long stay exact in decimal: two entities at
    // 4e9 units (x^2 = 1.6e19 > Long.MaxValue) in one group -> HHI = 0.5
    val big = Seq(("b", "a", 4.0e9), ("b", "b", 4.0e9)).toDF("g", "e", "v")
    val rb = Relational.herfindahl(big, Seq("g"), col("e"), col("v"), scale = 1L)
      .as[(String, Long, Double)].head()
    assert(rb == (("b", 2L, 0.5)), s"$rb")
  }

  test("chiSquare: hand 2x2, zero cells present, independence=0, null rows dropped") {
    import spark.implicits._
    // 2x2: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=30 -> N=80, all marginals 40,
    // every expected = 20, every term = 100/20 = 5
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val r = Relational.chiSquare(rows.toDF("a", "b"), "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(r.size == 4)
    assert(r(("x", "p")) == (("x", "p", 30L, 20.0, 5.0)), s"${r(("x", "p"))}")
    assert(r(("y", "p")) == (("y", "p", 10L, 20.0, 5.0)), s"${r(("y", "p"))}")
    // a never-observed combination appears with observed=0 and positive term
    val sparse = (Seq.fill(8)(("x", "p")) ++ Seq.fill(8)(("y", "q")) ++
      Seq.fill(4)(("y", "p")) ++ Seq(("z", null: String))).toDF("a", "b")
    val rs = Relational.chiSquare(sparse, "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(rs.size == 4, s"grid must complete (null-b row dropped): ${rs.keySet}")
    val zc = rs(("x", "q"))
    val e = 8.0 * 8.0 / 20.0 // the operator's exact float expression shape
    assert(zc._3 == 0L && zc._4 == e && zc._5 == (0.0 - e) * (0.0 - e) / e, s"$zc")
    // perfectly proportional table -> every term exactly 0
    val ind = (Seq.fill(6)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
      Seq.fill(3)(("y", "p")) ++ Seq.fill(1)(("y", "q"))).toDF("a", "b")
    assert(Relational.chiSquare(ind, "a", "b")
      .as[(String, String, Long, Double, Double)].collect().forall(_._5 == 0.0))
  }

  test("resample: hand bars, tied-ts tie-break, negative-ts floor, null drops") {
    import spark.implicits._
    // bucket=10ms; group g: bar 0 has ticks (1,5),(3,2),(7,9); bar 10 has (12,4)
    def jl(x: Long): java.lang.Long = x
    val df = Seq[(String, java.lang.Long, Double)](
      ("g", jl(1), 5.0), ("g", jl(3), 2.0), ("g", jl(7), 9.0), ("g", jl(12), 4.0),
      ("h", jl(5), 1.0), (null, jl(2), 3.0), ("g", null, 8.0)).toDF("g", "t", "v")
    val r = Relational.resample(df, Seq("g"), col("t"), col("v"),
        bucketMillis = 10L, scale = 1L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    assert(r.size == 3) // null group and null ts dropped
    assert(r(("g", 0L)) == (("g", 0L, 3L, 5L, 9L, 2L, 9L, 16L)))
    assert(r(("g", 10L)) == (("g", 10L, 1L, 4L, 4L, 4L, 4L, 4L)))
    assert(r(("h", 0L)) == (("h", 0L, 1L, 1L, 1L, 1L, 1L, 1L)))
    // ties at the same ts: open takes the SMALLER value, close the LARGER
    // (lexicographic struct order) — deterministic, engine-portable
    val tied = Seq(("g", 5L, 7.0), ("g", 5L, 3.0)).toDF("g", "t", "v")
    val rt = Relational.resample(tied, Seq("g"), col("t"), col("v"), 10L, 1L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(rt._4 == 3L && rt._7 == 7L, s"tie-break open/close: $rt")
    // negative ts floors to the bar BELOW (pmod is non-negative)
    val neg = Seq(("g", -3L, 1.0)).toDF("g", "t", "v")
    val rn = Relational.resample(neg, Seq("g"), col("t"), col("v"), 10L, 1L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(rn._2 == -10L, s"negative floor: $rn")
  }

  test("quantileBins: hand quartiles, tie clustering, null bin, validation") {
    import spark.implicits._
    // 1..8 at quartiles: cuts at ranks 2/4/6 -> values 2/4/6; bins 0..3
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val r = Relational.quantileBins(df, col("v"), Seq(0.25, 0.5, 0.75), scale = 1L)
      .select("value_units", "bin").as[(Long, Int)].collect().toMap
    assert(r == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 2,
      7L -> 3, 8L -> 3))
    // equal values never split across bins: all ties land in bin 0
    val flat = Seq.fill(100)(5.0).toDF("v")
    val rf = Relational.quantileBins(flat, col("v"), Seq(0.5), scale = 1L)
      .select("bin").as[Int].collect()
    assert(rf.forall(_ == 0) && rf.length == 100)
    // null values pass through with a null bin and don't count toward n
    val withNull = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null).toDF("v")
    val rWithNull = Relational.quantileBins(withNull, col("v"), Seq(0.5), scale = 1L)
      .select("bin").collect().map(row => Option(row.get(0)))
    assert(rWithNull.count(_.isEmpty) == 1 && rWithNull.count(_.isDefined) == 4)
    intercept[IllegalArgumentException] {
      Relational.quantileBins(df, col("v"), Seq(0.5, 1.0), scale = 1L)
    }
  }

  test("multiQuantileCuts: per-metric cuts equal sequential quantileBins cuts") {
    import spark.implicits._
    // three metrics with different distributions; the fused one-pass cuts
    // must reproduce exactly what per-metric quantileBins assigns
    val df = (1 to 97).map(i => (i.toLong, (i % 7).toLong, (i * i % 31).toLong))
      .toDF("x", "y", "z")
    val ps = Seq(0.2, 0.4, 0.6, 0.8)
    val fused = Relational.multiQuantileCuts(df,
      Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")), ps, scale = 1L)
    for (m <- Seq("x", "y", "z")) {
      // recover quantileBins' cut decisions from its bin assignment: the
      // fused cuts applied with #{cuts < v} must give the same bins
      val viaBins = Relational.quantileBins(df, col(m), ps, scale = 1L)
        .select(col(m), col("bin")).as[(Long, Int)].collect().toMap
      val cuts = fused(m)
      val mine = df.select(col(m)).as[Long].collect()
        .map(v => v -> cuts.count(_ < v)).toMap
      assert(viaBins == mine, s"metric $m: fused cuts $cuts diverge from quantileBins")
    }
    intercept[IllegalArgumentException] {
      Relational.multiQuantileCuts(df, Seq("x" -> col("x"), "x" -> col("y")), ps)
    }
  }

  test("abTest: hand t, zero-variance pair dropped, small arms dropped, arm filter") {
    import spark.implicits._
    // A: 10,12,14 (mean 12, var 4); B: 10,10,10 (var 0) -> se2=4/3,
    // t = 2 / sqrt(4/3); a third arm C must not contaminate the moments
    val df = Seq(("g", "A", 10.0), ("g", "A", 12.0), ("g", "A", 14.0),
      ("g", "B", 10.0), ("g", "B", 10.0), ("g", "B", 10.0),
      ("g", "C", 999.0)).toDF("grp", "arm", "v")
    val r = Relational.abTest(df, Seq("grp"), col("arm"), col("v"),
        "A", "B", scale = 1L)
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(r._2 == 3L && r._3 == 3L && r._4 == 12.0 && r._5 == 10.0)
    assert(r._6 == 2.0 / math.sqrt(4.0 / 3.0), s"t: $r")
    // both arms zero variance -> se2 = 0 -> no t, group dropped
    val zv = Seq(("g", "A", 5.0), ("g", "A", 5.0), ("g", "B", 7.0),
      ("g", "B", 7.0)).toDF("grp", "arm", "v")
    assert(Relational.abTest(zv, Seq("grp"), col("arm"), col("v"), "A", "B",
      scale = 1L).count() == 0)
    // an arm with n < 2 drops the group
    val small = Seq(("g", "A", 1.0), ("g", "B", 2.0), ("g", "B", 3.0))
      .toDF("grp", "arm", "v")
    assert(Relational.abTest(small, Seq("grp"), col("arm"), col("v"), "A", "B",
      scale = 1L).count() == 0)
  }

  test("paretoRank: hand crossing, exact-boundary integer test, uniform group, zero total") {
    import spark.implicits._
    // g: values 50,30,10,10 (total 100); 80% crossing: 50 no (250<400),
    // 50+30=80 -> 5*80=400 >= 4*100 EXACTLY -> n_to_threshold=2 (the
    // integer form gets the boundary right; 0.8*100 as a float might not)
    val df = Seq(("g", "e1", 50.0), ("g", "e2", 30.0), ("g", "e3", 10.0),
      ("g", "e4", 10.0), ("u", "e1", 5.0), ("u", "e2", 5.0), ("u", "e3", 5.0),
      ("z", "e1", 0.0)).toDF("grp", "e", "v")
    val r = Relational.paretoRank(df, Seq("grp"), col("e"), col("v"),
        num = 4L, den = 5L, scale = 1L)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r.size == 2, s"zero-total group must drop: ${r.keySet}")
    assert(r("g") == (("g", 4L, 100L, 2L)), s"${r("g")}")
    // uniform: 3 entities of 5 -> cum 10/15 at rank 2 is 66% < 80%, rank 3
    assert(r("u") == (("u", 3L, 15L, 3L)), s"${r("u")}")
    // per-row negative values are out of domain and dropped pre-agg
    val neg = Seq(("g", "e1", 10.0), ("g", "e1", -4.0), ("g", "e2", 2.0))
      .toDF("grp", "e", "v")
    val rn = Relational.paretoRank(neg, Seq("grp"), col("e"), col("v"),
      num = 1L, den = 2L, scale = 1L).as[(String, Long, Long, Long)].head()
    assert(rn == (("g", 2L, 12L, 1L)), s"$rn")
    intercept[IllegalArgumentException] {
      Relational.paretoRank(df, Seq("grp"), col("e"), col("v"), num = 5L, den = 5L)
    }
  }

  test("mutualInfo: independence=0, deterministic coupling=ln2, signed pmi, null drops") {
    import spark.implicits._
    // perfectly proportional table -> every pmi and mi_term exactly 0
    // (the ratio N*n_ab/(n_a*n_b) is exactly 1 -> ln(1.0) == 0.0)
    val ind = (Seq.fill(6)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
      Seq.fill(3)(("y", "p")) ++ Seq.fill(1)(("y", "q"))).toDF("a", "b")
    val ri = Relational.mutualInfo(ind, "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
    assert(ri.length == 4 && ri.forall(r => r._4 == 0.0 && r._5 == 0.0),
      ri.mkString(","))
    // deterministic coupling over two equiprobable symbols: MI = ln 2,
    // each of the two observed cells contributes exactly ln(2)/2
    val det = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q")) ++
      Seq(("z", null: String))).toDF("a", "b")
    val rd = Relational.mutualInfo(det, "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
    assert(rd.length == 2, s"null-b row must drop: ${rd.mkString(",")}")
    assert(rd.forall(r => r._4 == math.log(2.0) && r._5 == 0.5 * math.log(2.0)),
      rd.mkString(","))
    // anti-associated observed cell: pmi < 0 while total MI stays >= 0
    val skew = (Seq.fill(8)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
      Seq.fill(2)(("y", "p")) ++ Seq.fill(8)(("y", "q"))).toDF("a", "b")
    val rs = Relational.mutualInfo(skew, "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
    assert(rs.find(r => r._1 == "x" && r._2 == "q").get._4 < 0.0)
    assert(rs.map(_._5).sum > 0.0)
  }

  test("winsorize: hand clip bounds, interior untouched, nulls pass through, validation") {
    import spark.implicits._
    // 1..20 at (0.1, 0.9): cuts at ranks 2/18 -> lo=2, hi=18
    val df = (1 to 20).map(_.toDouble).toDF("v")
    val r = Relational.winsorize(df, col("v"), 0.1, 0.9, scale = 1L)
      .select("value_units", "clipped").as[(Long, Long)].collect().toMap
    assert(r(1L) == 2L && r(2L) == 2L && r(3L) == 3L)
    assert(r(18L) == 18L && r(19L) == 18L && r(20L) == 18L)
    assert((3 to 18).forall(i => r(i.toLong) == i.toLong))
    // null values keep a null clipped column and don't count toward n
    val withNull = Seq[java.lang.Double](1.0, 2.0, 3.0, null).toDF("v")
    val rn = Relational.winsorize(withNull, col("v"), 0.3, 0.7, scale = 1L)
      .select("clipped").collect().map(row => Option(row.get(0)))
    assert(rn.count(_.isEmpty) == 1 && rn.count(_.isDefined) == 3)
    intercept[IllegalArgumentException] {
      Relational.winsorize(df, col("v"), 0.9, 0.1, scale = 1L)
    }
  }

  test("madOutliers: hand median/MAD, integer flag, MAD=0 drop, null drop, validation") {
    import spark.implicits._
    // g1: 1..9 + spike 100 (n=10): median = rank-5 value = 5,
    // devs sorted 0,1,1,2,2,3,3,4,4,95 -> MAD = rank-5 = 2; k=3 flags dev > 6
    // g3: 7,7,7,100: MAD = 0 -> group dropped whole (even the 93 spike)
    val rows = ((1 to 9).map(i => ("g1", i.toDouble)) :+ ("g1", 100.0)) ++
      Seq(("g3", 7.0), ("g3", 7.0), ("g3", 7.0), ("g3", 100.0))
    val df = rows.toDF("g", "v")
    val out = Relational.madOutliers(df, Seq("g"), col("v"), k = 3L,
        payloadCols = Seq(col("v")), scale = 1L)
      .select("g", "v", "dev_units", "mad_units", "robust_z")
      .as[(String, Double, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4)) == Seq(("g1", 100.0, 95L, 2L)), s"$out")
    assert(math.abs(out.head._5 - 95.0 / (1.4826 * 2.0)) < 1e-12)
    // even count: 1,2,3,4 -> lower median = rank-2 = 2; devs 0,1,1,2 -> MAD = 1
    val even = Seq(("e", 1.0), ("e", 2.0), ("e", 3.0), ("e", 4.0)).toDF("g", "v")
    val eo = Relational.madOutliers(even, Seq("g"), col("v"), k = 1L,
        payloadCols = Seq(col("v")), scale = 1L)
      .select("v", "dev_units", "mad_units").as[(Double, Long, Long)].collect().toSeq
    assert(eo == Seq((4.0, 2L, 1L)), s"$eo")
    // null values drop before ranking (else they'd shift the median rank)
    val withNull = (Seq[java.lang.Double](1.0, 2.0, 3.0, 100.0, null))
      .map(v => ("n", v)).toDF("g", "v")
    val no = Relational.madOutliers(withNull, Seq("g"), col("v"), k = 3L,
        payloadCols = Seq(col("v")), scale = 1L)
      .select("v").as[Double].collect().toSeq
    assert(no == Seq(100.0), s"$no")
    intercept[IllegalArgumentException] {
      Relational.madOutliers(df, Seq("g"), col("v"), k = 0L, payloadCols = Nil)
    }
  }

  test("scd2: runs collapse, first row starts, NULL state is a state, open tail") {
    import spark.implicits._
    // user 1: A A B A -> runs A[10,30) B[30,40) A[40,∞); user 2: null null A
    val rows = Seq(
      (1L, 10L, 100L, Some("A")), (1L, 20L, 101L, Some("A")),
      (1L, 30L, 102L, Some("B")), (1L, 40L, 103L, Some("A")),
      (2L, 10L, 200L, None), (2L, 20L, 201L, None), (2L, 30L, 202L, Some("A")))
      .toDF("u", "t", "eid", "state")
    val out = Relational.scd2(rows, col("u"), col("state"), col("t"), col("eid"))
      .orderBy("entity", "run_seq")
      .as[(Long, Option[String], Long, Option[Long], Long)].collect().toSeq
    assert(out == Seq(
      (1L, Some("A"), 10L, Some(30L), 1L),
      (1L, Some("B"), 30L, Some(40L), 2L),
      (1L, Some("A"), 40L, None, 3L),
      (2L, None, 10L, Some(30L), 1L),
      (2L, Some("A"), 30L, None, 2L)), s"$out")
  }

  test("rollingDistinct: window membership exact, duplicate facts collapse, phantom days absent") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    // users on 01-01: {a,b}; 01-05: {b}; 01-20: {c} (gap > window)
    val facts = Seq(
      ("2024-01-01", "a"), ("2024-01-01", "b"), ("2024-01-01", "b"),
      ("2024-01-05", "b"), ("2024-01-20", "c"))
      .map { case (dt, u) => (d(dt), u) }.toDF("day", "u")
    val out = Relational.rollingDistinct(facts, col("day"), col("u"), 7)
      .orderBy("period").as[(java.sql.Date, Long)].collect().toSeq
    // 01-01 sees {a,b}=2; 01-05 sees 01-01∪01-05 = {a,b}=2; 01-20 sees {c}=1;
    // no rows for unobserved days (01-02..04 etc.)
    assert(out == Seq((d("2024-01-01"), 2L), (d("2024-01-05"), 2L),
      (d("2024-01-20"), 1L)), s"$out")
    intercept[IllegalArgumentException] {
      Relational.rollingDistinct(facts, col("day"), col("u"), 0)
    }
  }

  test("ksTest: hand-computed sup gap, empty-side segment dropped, null drop") {
    import spark.implicits._
    // seg s: A = {1,2}, B = {2,3}: at v=1 |1*2-0*2|=2; v=2 |2*2-1*2|=2; v=3 0
    // -> d_num = 2, d = 2/4 = 0.5
    val df = Seq(("s", 1.0, true), ("s", 2.0, true), ("s", 2.0, false),
      ("s", 3.0, false), ("only_a", 5.0, true)).toDF("seg", "v", "isa")
    val out = Relational.ksTest(df, Seq("seg"), col("v"), col("isa"), scale = 1L)
      .select("seg", "n_a", "n_b", "d_num", "d")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("s", 2L, 2L, 2L, 0.5)), s"$out")
    // null values and null flags drop whole-row
    val withNull = Seq(("s", Some(1.0), Some(true)), ("s", None, Some(false)),
      ("s", Some(2.0), None), ("s", Some(2.0), Some(false)))
      .toDF("seg", "v", "isa")
    val n = Relational.ksTest(withNull, Seq("seg"), col("v"), col("isa"), scale = 1L)
      .select("n_a", "n_b").as[(Long, Long)].collect().toSeq
    assert(n == Seq((1L, 1L)), s"$n")
  }

  test("cusum: integer fold, restart after alarm, both-side flags, isolation") {
    import spark.implicits._
    // T=10, K=2, H=5, scale=1. Entity 1: 20 -> sp=8 flag+1 reset;
    // 20 -> sp=8 flag+1 (restart proves reset); 0 -> sn=8 flag-1 reset;
    // 11 -> sp=0 sn=0 flag 0. Entity 2: 14,14,14 -> sp 2,4,6: third flags.
    val rows = Seq(
      (1L, 1L, 1L, 20.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 0.0), (1L, 4L, 4L, 11.0),
      (2L, 1L, 5L, 14.0), (2L, 2L, 6L, 14.0), (2L, 3L, 7L, 14.0))
      .toDF("e", "o", "id", "v")
    val got = Relational.cusum(rows, col("e"), col("o"), col("id"), col("v"),
        targetUnits = 10L, kUnits = 2L, hUnits = 5L, scale = 1L)
      .orderBy("entity", "ord")
      .select("entity", "ord", "s_plus", "s_minus", "flag")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 8L, 0L, 1), (1L, 2L, 8L, 0L, 1), (1L, 3L, 0L, 8L, -1),
      (1L, 4L, 0L, 0L, 0),
      (2L, 1L, 2L, 0L, 0), (2L, 2L, 4L, 0L, 0), (2L, 3L, 6L, 0L, 1)), s"$got")
    intercept[IllegalArgumentException] {
      Relational.cusum(rows, col("e"), col("o"), col("id"), col("v"),
        targetUnits = 0L, kUnits = 0L, hUnits = 0L)
    }
  }

  test("holt: hand fold of coupled level/trend, per-entity reset, forecast") {
    import spark.implicits._
    // e1: x = 10, 20, 30 with alpha=0.5, beta=0.5, scale=1:
    //  t1: l=10, b=0, f=10
    //  t2: l=.5*20+.5*(10+0)=15, b=.5*(15-10)+.5*0=2.5, f=17.5
    //  t3: l=.5*30+.5*17.5=23.75, b=.5*(23.75-15)+.5*2.5=5.625, f=29.375
    val rows = Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 30.0),
      (2L, 1L, 4L, 7.0)).toDF("e", "o", "id", "v")
    val got = Relational.holt(rows, col("e"), col("o"), col("id"), col("v"),
        alpha = 0.5, beta = 0.5, scale = 1L)
      .orderBy("entity", "ord")
      .select("entity", "level", "trend", "forecast1")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 10.0, 0.0, 10.0), (1L, 15.0, 2.5, 17.5),
      (1L, 23.75, 5.625, 29.375),
      (2L, 7.0, 0.0, 7.0)), s"$got") // entity 2 restarts from its own x1
    intercept[IllegalArgumentException] {
      Relational.holt(rows, col("e"), col("o"), col("id"), col("v"), 0.5, 1.0)
    }
  }

  test("holtWinters: hand fold with m=2 seasonals, per-entity reset, next-phase forecast") {
    import spark.implicits._
    // e1: x = 10, 20, 30, 40; alpha=0.5, beta=0.5, gamma=0.5, m=2, scale=1.
    //  t1 (p=0): l=10, b=0, s=[0,0]; f = l+b+s[1] = 10
    //  t2 (p=1): sp=0; l=.5*20+.5*10=15, b=.5*5+.5*0=2.5,
    //            s1=.5*(20-15)=2.5 -> s=[0,2.5]; f = 17.5+s[0]=17.5
    //  t3 (p=0): sp=0; l=.5*30+.5*17.5=23.75, b=.5*8.75+.5*2.5=5.625,
    //            s0=.5*(30-23.75)=3.125 -> s=[3.125,2.5]; f = 29.375+s[1]=31.875
    //  t4 (p=1): sp=2.5; l=.5*(40-2.5)+.5*29.375=33.4375,
    //            b=.5*(33.4375-23.75)+.5*5.625=7.65625,
    //            s1=.5*(40-33.4375)+.5*2.5=4.53125
    //            f = 41.09375 + s[0] = 44.21875
    val rows = Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 30.0),
      (1L, 4L, 4L, 40.0), (2L, 1L, 5L, 7.0)).toDF("e", "o", "id", "v")
    val got = Relational.holtWinters(rows, col("e"), col("o"), col("id"), col("v"),
        alpha = 0.5, beta = 0.5, gamma = 0.5, period = 2, scale = 1L)
      .orderBy("entity", "ord")
      .select("entity", "level", "trend", "seasonal", "forecast1")
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 10.0, 0.0, 0.0, 10.0),
      (1L, 15.0, 2.5, 2.5, 17.5),
      (1L, 23.75, 5.625, 3.125, 31.875),
      (1L, 33.4375, 7.65625, 4.53125, 44.21875),
      (2L, 7.0, 0.0, 0.0, 7.0)), s"$got")
    // period 1 rejected (seasonal slot would collide with itself)
    intercept[IllegalArgumentException] {
      Relational.holtWinters(rows, col("e"), col("o"), col("id"), col("v"),
        0.5, 0.5, 0.5, period = 1)
    }
    // constant seasonal signal with zero trend: period-m repeat converges
    // toward the alternating profile (forecast error shrinks, not grows)
    val wave = (1L to 12L).map(i => (9L, i, i, if (i % 2 == 0) 100.0 else 0.0))
      .toDF("e", "o", "id", "v")
    val errs = Relational.holtWinters(wave, col("e"), col("o"), col("id"), col("v"),
        0.5, 0.25, 0.5, period = 2, scale = 1L)
      .orderBy("ord")
      .select("value_units", "forecast1")
      .as[(Long, Double)].collect().toSeq
    // compare forecast made at t to the actual at t+1
    val preds = errs.dropRight(1).map(_._2).zip(errs.drop(1).map(_._1.toDouble))
    val early = math.abs(preds(1)._1 - preds(1)._2)
    val late = math.abs(preds.last._1 - preds.last._2)
    assert(late < early / 2, s"late $late vs early $early: ${preds.toSeq}")
  }

  test("theilSen: outlier-immune median slope, equal-x pairs skipped, degenerate groups drop") {
    import spark.implicits._
    // group a: 4 collinear points (slope 1) + one wild outlier — 6 of 10
    // pairwise slopes are clean, so the median stays exactly 1.0 and the
    // median residual 0.0 (OLS would be dragged far off)
    val a = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 400.0))
      .map { case (x, y) => ("a", x, y) }
    // group b: two points sharing x plus one more — the equal-x pair is
    // skipped, leaving 2 finite slopes
    val b = Seq(("b", 0.0, 0.0), ("b", 0.0, 10.0), ("b", 2.0, 4.0))
    // group c: single point; group d: all points at one x — both drop
    val c = Seq(("c", 1.0, 1.0))
    val d = Seq(("d", 3.0, 1.0), ("d", 3.0, 2.0))
    val df = (a ++ b ++ c ++ d).toDF("g", "x", "y")
    val got = graft.operators.Relational.theilSen(df, Seq("g"),
        col("x"), col("y"), maxN = 100, scaleX = 1L, scaleY = 1L)
      .orderBy("g")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("a", "b"), s"$got")
    val ga = got.head
    assert(ga == (("a", 5L, 10L, 1.0, 0.0)), s"$ga")
    // b slopes: (0,0)->(2,4) = 2, (0,10)->(2,4) = -3; median = (−3+2)/2
    val gb = got(1)
    assert(gb._2 == 3L && gb._3 == 2L && gb._4 == -0.5, s"$gb")
    // maxN guard raises in-plan with a clear message
    val err = intercept[Exception] {
      graft.operators.Relational.theilSen(df, Seq("g"), col("x"), col("y"),
        maxN = 3, scaleX = 1L, scaleY = 1L).collect()
    }
    assert(err.getMessage != null)
  }

  test("theilSenBucketed: buckets=1 is the exact fit; bucketed fit bounds the error past the guard") {
    import spark.implicits._
    // noisy line y = 3x + 7 with 10% wild outliers, 600 points/group —
    // the shape that trips theilSen's guard at maxN=100
    val pts = for (g <- Seq("a", "b"); i <- 0 until 600) yield {
      val y = if (i % 10 == 3) 5000.0 else 3.0 * i + 7.0 + (i % 5) * 0.01
      (g, i.toDouble, y)
    }
    val df = pts.toDF("g", "x", "y")
    // buckets=1 degenerates to theilSen bit for bit (modulo the extra
    // n_buckets column)
    val exact = graft.operators.Relational.theilSen(df, Seq("g"),
        col("x"), col("y"), maxN = 1000, scaleX = 1L, scaleY = 100L)
      .orderBy("g").as[(String, Long, Long, Double, Double)].collect().toSeq
    val one = graft.operators.Relational.theilSenBucketed(df, Seq("g"),
        col("x"), col("y"), buckets = 1, maxN = 1000, scaleX = 1L, scaleY = 100L)
      .select("g", "n_points", "n_slopes", "slope", "intercept")
      .orderBy("g").as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(one == exact, s"buckets=1 must be the exact fit: $one vs $exact")
    // 8 buckets passes a guard the exact fit trips, and the
    // median-of-buckets estimate stays within 1% of the exact robust fit
    intercept[Exception] {
      graft.operators.Relational.theilSen(df, Seq("g"), col("x"), col("y"),
        maxN = 100, scaleX = 1L, scaleY = 100L).collect()
    }
    val bucketed = graft.operators.Relational.theilSenBucketed(df, Seq("g"),
        col("x"), col("y"), buckets = 8, maxN = 100, scaleX = 1L, scaleY = 100L)
      .orderBy("g")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(bucketed.map(_._2) == Seq(8L, 8L), s"$bucketed")
    assert(bucketed.map(_._3) == Seq(600L, 600L), "all points accounted")
    exact.zip(bucketed).foreach { case ((g, _, _, es, ei), (_, _, _, _, bs, bi)) =>
      assert(math.abs(bs - es) <= 0.01 * math.abs(es), s"$g slope $bs vs $es")
      assert(math.abs(bi - ei) <= 1.0, s"$g intercept $bi vs $ei")
    }
  }

  test("mannWhitney: hand-computed tie-corrected z; degenerate groups drop") {
    import spark.implicits._
    import graft.operators.Relational
    // group g: A = {1, 2, 3}, B = {2, 4} — tie at 2 gets average rank 2.5
    // R_A = 1 + 2.5 + 4 = 7.5 -> u2 = 2R_A − 2·n_a(n_a+1)/2·... = 15 − 12 = 3
    // varU = 3·2/12·((5+1) − 6/(5·4)) = 2.85; z = (3 − 6)/(2√2.85)
    val g = Seq((true, 1.0), (true, 2.0), (true, 3.0), (false, 2.0), (false, 4.0))
      .map { case (a, v) => ("g", a, v) }
    // group t: ALL values tied -> variance 0 -> no test, drops
    val t = Seq(("t", true, 7.0), ("t", false, 7.0), ("t", true, 7.0))
    // group s: only sample A present -> drops
    val s = Seq(("s", true, 1.0), ("s", true, 2.0))
    val df = (g ++ t ++ s).toDF("grp", "a", "v")
    val got = Relational.mannWhitney(df, Seq("grp"), col("a"), col("v"),
        scale = 1L)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("g"), s"$got")
    val (_, na, nb, u2, z) = got.head
    assert((na, nb, u2) == ((3L, 2L, 3L)))
    val expZ = (3.0 - 6.0) / (2.0 * math.sqrt(2.85))
    assert(math.abs(z - expZ) < 1e-12, s"$z vs $expZ")
    // direction check: A systematically larger than B flips the sign
    val big = (1 to 20).map(i => ("d", true, 100.0 + i)) ++
      (1 to 20).map(i => ("d", false, i.toDouble))
    val zd = Relational.mannWhitney(big.toDF("grp", "a", "v"), Seq("grp"),
        col("a"), col("v"), scale = 1L)
      .as[(String, Long, Long, Long, Double)].head()._5
    assert(zd > 5.0, s"complete separation must give a large positive z: $zd")
  }

  test("twoProportionZ: hand-computed pooled z; degenerate groups drop") {
    import spark.implicits._
    import graft.operators.Relational
    // g: A 6/10 vs B 3/10 -> pooled 0.45, z = 0.3/sqrt(0.45*0.55*0.2)
    val g = (1 to 10).map(i => ("g", true, i <= 6)) ++
      (1 to 10).map(i => ("g", false, i <= 3))
    // h: every trial succeeds -> pooled p = 1, no variance -> drops
    val h = Seq(("h", true, true), ("h", false, true))
    // k: only arm A present -> drops
    val k = Seq(("k", true, true), ("k", true, false))
    val got = Relational.twoProportionZ((g ++ h ++ k).toDF("grp", "a", "s"),
        Seq("grp"), col("a"), col("s"))
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq("g"), s"${got.toSeq}")
    val (_, na, sa, nb, sb, z) = got.head
    assert((na, sa, nb, sb) == ((10L, 6L, 10L, 3L)))
    val exp = 0.3 / math.sqrt(0.45 * 0.55 * 0.2)
    assert(math.abs(z - exp) < 1e-12, s"$z vs $exp")
    // symmetry: swapping arms flips the sign exactly
    val sw = Relational.twoProportionZ(g.toDF("grp", "a", "s"), Seq("grp"),
        !col("a"), col("s"))
      .as[(String, Long, Long, Long, Long, Double)].head()
    assert(sw._6 == -z, s"${sw._6} vs ${-z}")
  }

  test("aucScore: perfect/reversed/all-tied hand cases; one-class groups drop") {
    import spark.implicits._
    import graft.operators.Relational
    val df = (
      // g=sep: positives all above negatives -> AUC exactly 1
      (1 to 5).map(i => ("sep", true, 10.0 + i)) ++
      (1 to 4).map(i => ("sep", false, i.toDouble)) ++
      // g=rev: positives all BELOW -> AUC exactly 0
      (1 to 3).map(i => ("rev", true, i.toDouble)) ++
      (1 to 3).map(i => ("rev", false, 10.0 + i)) ++
      // g=tie: every score equal -> AUC exactly 0.5 (kept, unlike the
      // z-test where variance 0 drops the group)
      Seq(("tie", true, 7.0), ("tie", false, 7.0), ("tie", true, 7.0)) ++
      // g=solo: one class only -> AUC undefined -> drops
      Seq(("solo", true, 1.0), ("solo", true, 2.0))
    ).toDF("g", "pos", "score")
    val got = Relational.aucScore(df, Seq("g"), col("pos"), col("score"), scale = 100L)
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("sep", "rev", "tie"))
    assert(got("sep")._5 == 1.0 && got("sep")._2 == 5L && got("sep")._3 == 4L)
    assert(got("rev")._5 == 0.0)
    assert(got("tie")._5 == 0.5, s"${got("tie")}")
    // AUC is the Mann–Whitney statistic: u2/(2·n+·n−) against q109's op
    val mw = Relational.mannWhitney(df.filter(col("g") === "sep"), Seq("g"),
        col("pos"), col("score"), scale = 100L)
      .as[(String, Long, Long, Long, Double)].head()
    assert(got("sep")._4 == mw._4, "aucScore and mannWhitney must share u2")
  }

  test("calibrationBins: exact bin edges, 1.0 clamps into the top bin, rates exact") {
    import spark.implicits._
    import graft.operators.Relational
    val df = Seq(
      (0.05, false), (0.15, false),            // bin 0 [0, 0.2): rate 0
      (0.45, true), (0.55, false),             // bins 2 : mixed
      (0.55, true),
      (0.95, true), (1.0, true)                // top bin, incl. the clamp
    ).toDF("score", "pos")
    val got = Relational.calibrationBins(df, Seq.empty, col("pos"),
        col("score"), bins = 5, scale = 100L)
      .orderBy("bin").as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 2L, 4L), s"$got")
    val byBin = got.map(r => r._1 -> r).toMap
    assert(byBin(0L)._2 == 2L && byBin(0L)._4 == 0.0)
    assert(byBin(0L)._3 == 0.1, "mean of 0.05 and 0.15 in exact units")
    assert(byBin(2L)._2 == 3L && byBin(2L)._4 == 2.0 / 3.0)
    assert(byBin(4L)._2 == 2L && byBin(4L)._4 == 1.0,
      "score 1.0 must clamp into the last bin, not a phantom bin 5")
    intercept[IllegalArgumentException](
      Relational.calibrationBins(df, Seq.empty, col("pos"), col("score"), 0))
  }

  test("kaplanMeier: hand-computed curve with censoring; whole-risk-set death hits exactly 0") {
    import spark.implicits._
    import graft.operators.Relational
    // subjects: event at 1, censored at 2, event+censor tied at 3,
    // event at 4, censored at 5
    val df = Seq(("g", 1L, 1L), ("g", 2L, 0L), ("g", 3L, 1L), ("g", 3L, 0L),
      ("g", 4L, 1L), ("g", 5L, 0L)).toDF("grp", "dur", "ev")
    val got = Relational.kaplanMeier(df, Seq("grp"), col("dur"), col("ev"))
      .orderBy("t").as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // event-time rows only: t = 1, 3, 4
    assert(got.map(_._2) == Seq(1L, 3L, 4L), s"$got")
    val byT = got.map(r => r._2 -> r).toMap
    assert(byT(1L) == (("g", 1L, 6L, 1L, 0L, byT(1L)._6)))
    assert(math.abs(byT(1L)._6 - 5.0 / 6.0) < 1e-12)
    // at t=3 the risk set lost the t=1 event AND the t=2 censor: n=4;
    // the tied censor at 3 is reported but not an event
    assert(byT(3L)._3 == 4L && byT(3L)._4 == 1L && byT(3L)._5 == 1L)
    assert(math.abs(byT(3L)._6 - (5.0 / 6.0) * (3.0 / 4.0)) < 1e-12)
    assert(byT(4L)._3 == 2L && math.abs(byT(4L)._6 - 0.3125) < 1e-12)
    // censoring matters: counting censored subjects as events would give
    // a different curve — assert the censored variant diverges
    val naive = Relational.kaplanMeier(df.withColumn("ev", lit(1L)),
        Seq("grp"), col("dur"), col("ev"))
      .orderBy("t").as[(String, Long, Long, Long, Long, Double)].collect()
    assert(naive.last._6 < byT(4L)._6, "all-events curve must fall faster")
    // whole risk set dies at the last time: survival exactly 0, no NaN
    val all = Seq(("h", 1L, 1L), ("h", 1L, 1L)).toDF("grp", "dur", "ev")
    val h = Relational.kaplanMeier(all, Seq("grp"), col("dur"), col("ev"))
      .as[(String, Long, Long, Long, Long, Double)].head()
    assert(h._3 == 2L && h._4 == 2L && h._6 == 0.0, s"$h")
  }

  test("theilSen onOversize=Bucket: oversized group degrades, in-guard groups stay bit-exact") {
    import spark.implicits._
    import graft.operators.Relational
    // group "big": 600 points (trips maxN=100); group "small": 40 points
    // (within guard) — a mid-run pipeline must survive "big" WITHOUT
    // changing "small"'s exact fit by one bit
    val pts =
      (0 until 600).map(i => ("big", i.toDouble,
        if (i % 10 == 3) 5000.0 else 3.0 * i + 7.0 + (i % 5) * 0.01)) ++
      (0 until 40).map(i => ("small", i.toDouble, 2.0 * i + 1.0 + (i % 3) * 0.02))
    val df = pts.toDF("g", "x", "y")
    // default mode still fails loud
    intercept[Exception] {
      Relational.theilSen(df, Seq("g"), col("x"), col("y"),
        maxN = 100, scaleX = 1L, scaleY = 100L).collect()
    }
    val got = Relational.theilSen(df, Seq("g"), col("x"), col("y"),
        maxN = 100, scaleX = 1L, scaleY = 100L,
        onOversize = Relational.OversizeMode.Bucket(8))
      .orderBy("g").as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("big", "small"))
    // the in-guard group is BIT-EQUAL to the exact estimator
    val smallExact = Relational.theilSen(df.filter(col("g") === "small"),
        Seq("g"), col("x"), col("y"), maxN = 100, scaleX = 1L, scaleY = 100L)
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(got(1) == smallExact, s"${got(1)} vs $smallExact")
    // the oversized group routes to the bucketed estimator's numbers
    val bigBucketed = Relational.theilSenBucketed(
        df.filter(col("g") === "big"), Seq("g"), col("x"), col("y"),
        buckets = 8, maxN = 100, scaleX = 1L, scaleY = 100L)
      .select("g", "n_points", "n_slopes", "slope", "intercept")
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(got.head == bigBucketed, s"${got.head} vs $bigBucketed")
    // a bucket that STILL trips the guard fails loud (no silent double
    // degradation): 600/2 = 300 > maxN=100
    intercept[Exception] {
      Relational.theilSen(df, Seq("g"), col("x"), col("y"),
        maxN = 100, scaleX = 1L, scaleY = 100L,
        onOversize = Relational.OversizeMode.Bucket(2)).collect()
    }
    // NULL group keys are a real group in groupBy land: the escalation
    // path's size join must keep them (null-safe), matching Fail mode
    val withNull = pts.toDF("g", "x", "y").unionByName(
      (0 until 10).map(i => (null.asInstanceOf[String], i.toDouble, 4.0 * i))
        .toDF("g", "x", "y"))
    val gotN = Relational.theilSen(withNull, Seq("g"), col("x"), col("y"),
        maxN = 100, scaleX = 1L, scaleY = 100L,
        onOversize = Relational.OversizeMode.Bucket(8))
      .as[(String, Long, Long, Double, Double)].collect()
    val nullRow = gotN.filter(_._1 == null)
    assert(nullRow.length == 1 && nullRow.head._4 == 400.0,
      s"null-keyed group must survive escalation: ${gotN.toSeq}")
  }

  test("expectations: one pass, NULL predicate is a violation, unique names enforced") {
    import spark.implicits._
    val df = Seq((Some(5), Some("a")), (Some(500), Some("b")), (None, Some("a")),
      (Some(7), None)).toDF("q", "f")
    val got = Relational.expectations(df, Seq(
        "q_small" -> (col("q") <= 100),   // 500 fails; NULL q -> violation
        "f_known" -> col("f").isin("a", "b"))) // NULL f -> violation
      .orderBy("rule")
      .select("rule", "n_rows", "violations")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("f_known", 4L, 1L), ("q_small", 4L, 2L)), s"$got")
    intercept[IllegalArgumentException] { Relational.expectations(df, Nil) }
    intercept[IllegalArgumentException] {
      Relational.expectations(df, Seq("x" -> lit(true), "x" -> lit(false)))
    }
  }

  test("profile: one pass, exact distincts, nulls counted, numeric-only extrema") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(2.5), Some("x")), (Some(1L), None, Some("y")),
      (Some(3L), Some(-1.0), None), (None, Some(2.5), Some("y")))
      .toDF("k", "v", "s")
    val got = Relational.profile(df, Seq("k", "v", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 2L, Some(1.0), Some(3.0)),
      ("s", 4L, 1L, 2L, None, None),
      ("v", 4L, 1L, 2L, Some(-1.0), Some(2.5))), s"$got")
    intercept[IllegalArgumentException] { Relational.profile(df, Nil) }
    intercept[IllegalArgumentException] { Relational.profile(df, Seq("nope")) }
  }

  test("autocorrelation: perfect period detected, gaps pair-drop, anti-phase negative") {
    import spark.implicits._
    // period-2 series on buckets 0..5: 10,2,10,2,10,2 (counts via row repetition)
    def rows(g: String, perBucket: Seq[Int]): Seq[(String, Long)] =
      perBucket.zipWithIndex.flatMap { case (n, bk) =>
        Seq.fill(n)((g, bk.toLong * 1000L))
      }
    val df = (rows("p", Seq(10, 2, 10, 2, 10, 2)) ++
      rows("anti", Seq(10, 2, 10, 2, 10)))
      .toDF("g", "tms")
    // lag 2 on the period-2 series: pairs (10,10),(2,2),(10,10),(2,2) -> corr 1
    val lag2 = Relational.autocorrelation(df.filter(col("g") === "p"), Seq("g"),
        col("tms"), bucketMillis = 1000L, lagBuckets = 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(lag2 == Seq(("p", 4L, 1.0)), s"$lag2")
    // lag 1 anti-phase: pairs (10,2),(2,10),(10,2),(2,10) -> corr -1
    val lag1 = Relational.autocorrelation(df.filter(col("g") === "anti"), Seq("g"),
        col("tms"), bucketMillis = 1000L, lagBuckets = 1)
      .as[(String, Long, Double)].collect().toSeq
    assert(lag1 == Seq(("anti", 4L, -1.0)), s"$lag1")
    // gap: missing bucket 1 -> lag-1 pairs need both ends observed
    val gappy = (rows("g", Seq(3)) ++ Seq(("g", 2000L), ("g", 2000L), ("g", 3000L)))
      .toDF("g", "tms") // buckets 0 (c=3), 2 (c=2), 3 (c=1): lag-1 pair only (2,3)
    val gp = Relational.autocorrelation(gappy, Seq("g"), col("tms"), 1000L, 1)
      .as[(String, Long, Double)].collect().toSeq
    assert(gp.isEmpty, s"n=1 pair must vanish (needs >= 2): $gp")
    intercept[IllegalArgumentException] {
      Relational.autocorrelation(df, Seq("g"), col("tms"), 1000L, 0)
    }
  }

  test("hits: bipartite star concentrates authority; L1 norms; directed dedup") {
    import spark.implicits._
    import graft.operators.Graph
    // hubs 1,2,3 all point at part 10; hub 1 also at 11 (twice - dedup)
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (1L, 11L))
      .toDF("src", "dst")
    val out = Graph.hits(e, "src", "dst", iters = 3)
      .as[(String, Long, Double)].collect()
    val auth = out.filter(_._1 == "auth").map(r => r._2 -> r._3).toMap
    val hub = out.filter(_._1 == "hub").map(r => r._2 -> r._3).toMap
    // each side sums to 1 (L1 normalized)
    assert(math.abs(auth.values.sum - 1.0) < 1e-12)
    assert(math.abs(hub.values.sum - 1.0) < 1e-12)
    // part 10 (3 hubs) dominates part 11 (1 hub); hub 1 (2 parts) > hubs 2,3
    assert(auth(10L) > auth(11L))
    assert(hub(1L) > hub(2L) && math.abs(hub(2L) - hub(3L)) < 1e-12)
    intercept[IllegalArgumentException] { Graph.hits(e, "src", "dst", iters = 0) }
  }

  test("snapshotDiff: insert/delete/update classified, null-safe compares, null keys dropped") {
    import spark.implicits._
    val old = Seq(
      (1L, Option("a"), Option(10.0)), (2L, Option("b"), Option(20.0)),
      (3L, Option("c"), Option(30.0)), (4L, None: Option[String], Option(40.0)))
      .toDF("id", "s", "v")
    val neu = Seq(
      (2L, Option("b"), Option(20.0)),            // unchanged
      (3L, Option("cc"), Option(30.0)),           // update: s only
      (4L, None: Option[String], Option(45.0)),   // update: v only (null <=> null is no change)
      (5L, Option("e"), Option(50.0)))            // insert
      .toDF("id", "s", "v")
    val got = Relational.snapshotDiff(old, neu, Seq("id"), Seq("s", "v"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "delete", 0L), (3L, "update", 1L), (4L, "update", 1L), (5L, "insert", 0L)))
    val withU = Relational.snapshotDiff(old, neu, Seq("id"), Seq("s", "v"),
      includeUnchanged = true).as[(Long, String, Long)].collect().toSet
    assert(withU == got + ((2L, "unchanged", 0L)))
    // a null key identifies nothing: dropped from both sides, not an insert/delete
    val oldN = old.union(Seq((null.asInstanceOf[java.lang.Long], Option("x"), Option(1.0)))
      .toDF("id", "s", "v"))
    assert(Relational.snapshotDiff(oldN, neu, Seq("id"), Seq("s", "v"))
      .as[(Long, String, Long)].collect().toSet == got)
    intercept[IllegalArgumentException] {
      Relational.snapshotDiff(old, neu, Seq("id"), Seq("nope"))
    }
  }

  test("spearmanCorr: monotone nonlinear=1, ties via doubled average ranks, guards") {
    import spark.implicits._
    // perfectly monotone but nonlinear: Spearman 1 where Pearson < 1
    val mono = Seq(("g", 1.0, 1.0), ("g", 2.0, 4.0), ("g", 3.0, 9.0), ("g", 4.0, 16.0))
      .toDF("g", "x", "y")
    val r1 = Relational.spearmanCorr(mono, Seq("g"), col("x"), col("y"), 1L, 1L)
      .as[(String, Long, Double)].collect().toSeq
    // √dx·√dx can land 1 ulp under dx — deterministic, but not exactly 1.0
    assert(r1.map(t => (t._1, t._2)) == Seq(("g", 4L)) &&
      math.abs(r1.head._3 - 1.0) < 1e-12, s"$r1")
    val p1 = Relational.pearsonCorr(mono, Seq("g"), col("x"), col("y"), 1L, 1L)
      .as[(String, Long, Double)].head()._3
    assert(p1 < 1.0) // the robustness gap spearman exists for
    // reversed: -1
    val rev = Relational.spearmanCorr(
      mono.withColumn("y", -col("y")), Seq("g"), col("x"), col("y"), 1L, 1L)
      .as[(String, Long, Double)].head()._3
    assert(math.abs(rev + 1.0) < 1e-12)
    // ties: x = [1,1,2] -> 2·avgranks [3,3,6]; y = [3,4,5] -> [2,4,6]
    // rho = 6 / (sqrt(6)*sqrt(8)) = 0.866025...
    val tied = Seq(("t", 1.0, 3.0), ("t", 1.0, 4.0), ("t", 2.0, 5.0)).toDF("g", "x", "y")
    val rt = Relational.spearmanCorr(tied, Seq("g"), col("x"), col("y"), 1L, 1L)
      .as[(String, Long, Double)].head()._3
    assert(math.abs(rt - 6.0 / math.sqrt(48.0)) < 1e-12, s"$rt")
    // constant metric: zero rank variance -> dropped; null pair drops whole
    val const = Seq(("c", 5.0, 1.0), ("c", 5.0, 2.0)).toDF("g", "x", "y")
    assert(Relational.spearmanCorr(const, Seq("g"), col("x"), col("y"), 1L, 1L).count() == 0)
    intercept[IllegalArgumentException] {
      Relational.spearmanCorr(mono, Seq("g"), col("x"), col("y"), 0L, 1L)
    }
  }

  test("benfordScan: complete 1-9 grid, exact digit counts, non-positive excluded") {
    import spark.implicits._
    // units: 123, 250, 1999, 30 -> digits 1,2,1,3; 0.001 snaps to 0 (out), -5 out
    val df = Seq(("g", 1.23), ("g", 2.50), ("g", 19.99), ("g", 0.30),
      ("g", 0.001), ("g", -5.0)).toDF("g", "v")
    val out = Relational.benfordScan(df, Seq("g"), col("v"), scale = 100L)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._2 -> r).toMap
    assert(out.size == 9, "all nine digits report")
    assert(out(1L)._3 == 2L && out(2L)._3 == 1L && out(3L)._3 == 1L)
    (4L to 9L).foreach(d => assert(out(d)._3 == 0L, s"digit $d"))
    assert(out(1L)._4 == 0.5 && out(2L)._4 == 0.25)
    assert(math.abs(out(1L)._5 - math.log(2.0) / math.log(10.0)) < 1e-15)
    // zero-observed digit contributes its full expectation: (0-E)^2/E = E
    val e9 = 4.0 * (math.log(1.0 + 1.0 / 9.0) / math.log(10.0))
    assert(math.abs(out(9L)._6 - e9) < 1e-12)
    intercept[IllegalArgumentException] {
      Relational.benfordScan(df, Seq("g"), col("v"), scale = 0L)
    }
  }

  test("keySkewReport: hot keys ranked, shares and skew ratio exact, null keys out") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c") ++
      Seq(null, null).map(_.asInstanceOf[String])).toDF("k")
    val top = Relational.keySkewReport(df, Seq("k"), topN = 2)
      .as[(Long, String, Long, Double, Double, Long, Long)].collect().toSeq
    assert(top.map(t => (t._1, t._2, t._3)) == Seq((1L, "a", 5L), (2L, "b", 3L)))
    val a = top.head
    assert(a._4 == 5.0 / 9.0 && a._5 == 5.0 / (9.0 / 3.0))
    assert(a._6 == 9L && a._7 == 3L)
    // count ties break on the key ascending — deterministic
    val tied = (Seq.fill(3)("d") ++ Seq.fill(3)("b") ++ Seq.fill(4)("a")).toDF("k")
    val tt = Relational.keySkewReport(tied, Seq("k"), topN = 3)
      .as[(Long, String, Long, Double, Double, Long, Long)].collect().toSeq
    assert(tt.map(_._2) == Seq("a", "b", "d"))
    intercept[IllegalArgumentException] { Relational.keySkewReport(df, Seq.empty) }
  }

  test("itemSimilarity: hand cosines, top-k order, minBoth prune, basket cap") {
    import spark.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z"),
      (4L, "w")).toDF("e", "i") // entity 4 has a 1-item basket: dropped
    val got = Relational.itemSimilarity(df, "e", "i", topK = 2, minBoth = 1L)
      .as[(String, String, Long, Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._7) -> r).toMap
    // n_x=3, n_y=2, n_z=1; pairs (x,y)=2, (x,z)=1
    val simXY = 2.0 / (math.sqrt(3.0) * math.sqrt(2.0))
    val simXZ = 1.0 / (math.sqrt(3.0) * math.sqrt(1.0))
    assert(got(("x", 1L))._2 == "y" && got(("x", 1L))._6 == simXY)
    assert(got(("x", 2L))._2 == "z" && got(("x", 2L))._6 == simXZ)
    assert(got(("y", 1L))._2 == "x" && got(("z", 1L))._2 == "x")
    assert(got.size == 4)
    // support prune: minBoth=2 kills the (x,z) pair entirely
    val pruned = Relational.itemSimilarity(df, "e", "i", topK = 2, minBoth = 2L)
      .as[(String, String, Long, Long, Long, Double, Long)].collect()
    assert(pruned.map(r => (r._1, r._2)).toSet == Set(("x", "y"), ("y", "x")))
    // hot-entity cap: basket of 3 dropped whole under maxBasket=2
    val capped = Relational.itemSimilarity(
      df.union(Seq((5L, "p"), (5L, "q"), (5L, "r")).toDF("e", "i")),
      "e", "i", topK = 2, minBoth = 1L, maxBasket = 2)
      .as[(String, String, Long, Long, Long, Double, Long)].collect()
    assert(!capped.exists(r => Set("p", "q", "r")(r._1)))
    intercept[IllegalArgumentException] { Relational.itemSimilarity(df, "e", "i", 0) }
  }

  test("labelPropagation: two communities split, tie goes to min label, K3 collapses") {
    import spark.implicits._
    import graft.operators.Graph
    // two triangles bridged by one edge; duplicates/direction/self-loop collapse
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L), (2L, 1L), (1L, 1L)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L), s"$got")
    // K3 at 2 rounds: every node sees a tie round 1 (min label wins), then agrees
    val k3 = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val g3 = Graph.labelPropagation(k3, "src", "dst", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(g3 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"$g3")
    intercept[IllegalArgumentException] { Graph.labelPropagation(e, "src", "dst", 0) }
  }

  test("shortestPaths: Bellman-Ford rounds bound path length, parallel edges collapse") {
    import spark.implicits._
    import graft.operators.Graph
    val e = Seq((1L, 2L, 5L), (1L, 2L, 7L), (2L, 3L, 1L), (1L, 3L, 10L), (3L, 4L, 2L))
      .toDF("u", "v", "w")
    def run(rounds: Int, seeds: Seq[Long]) =
      Graph.shortestPaths(e, "u", "v", "w", seeds.toDF("s"), "s", rounds)
        .as[(Long, Long)].collect().toMap
    // round 1: only <=1-edge paths (and the parallel 1->2 pair collapses to 5)
    assert(run(1, Seq(1L)) == Map(1L -> 0L, 2L -> 5L, 3L -> 10L))
    // round 2: 1->2->3 = 6 beats direct 10; 4 reached at 12 via the direct edge
    assert(run(2, Seq(1L)) == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 12L))
    // round 3: full fixpoint here — 4 improves to 8 via 1->2->3->4
    assert(run(3, Seq(1L)) == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 8L))
    // multi-seed min-merge + a seed absent from the graph still reports 0
    assert(run(2, Seq(3L, 99L)) == Map(3L -> 0L, 4L -> 2L, 99L -> 0L))
    intercept[IllegalArgumentException] { run(0, Seq(1L)) }
  }

  test("shortestPaths symmetrize=true == caller-side union, incl. asymmetric two-way weights") {
    import spark.implicits._
    import graft.operators.Graph
    // both directions present with DIFFERENT weights (1<->2), parallel
    // edges (1->2 twice), a one-way edge (2->3), a chain continuation —
    // the case where internal symmetrization keeps one row per direction
    // while the union form collapses to the cross-direction min; the
    // relaxation output must be identical anyway (min over adjacency rows)
    val e = Seq((1L, 2L, 5L), (1L, 2L, 9L), (2L, 1L, 3L), (2L, 3L, 1L),
      (3L, 4L, 2L)).toDF("u", "v", "w")
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v"), col("w")))
    for (rounds <- 1 to 3; seeds <- Seq(Seq(1L), Seq(3L), Seq(1L, 4L))) {
      val viaUnion = Graph.shortestPaths(sym, "u", "v", "w",
          seeds.toDF("s"), "s", rounds)
        .as[(Long, Long)].collect().toMap
      val viaFlag = Graph.shortestPaths(e, "u", "v", "w",
          seeds.toDF("s"), "s", rounds, symmetrize = true)
        .as[(Long, Long)].collect().toMap
      assert(viaUnion == viaFlag, s"rounds=$rounds seeds=$seeds")
    }
  }

  test("tableChecksum: order/partitioning-invariant, row-sensitive, per-group") {
    import spark.implicits._
    val a = Seq(("g", 1L, "x"), ("g", 2L, "y"), ("h", 3L, "z")).toDF("g", "id", "s")
    val shuffled = Seq(("h", 3L, "z"), ("g", 2L, "y"), ("g", 1L, "x"))
      .toDF("g", "id", "s").repartition(7)
    def sums(df: org.apache.spark.sql.DataFrame) =
      Relational.tableChecksum(df, Seq("g"), Seq(col("id"), col("s")))
        .as[(String, Long, Long)].collect().toSet
    val base = sums(a)
    assert(base == sums(shuffled), "row order and layout must not matter")
    assert(base.map(_._1) == Set("g", "h") && base.forall(_._2 > 0))
    // one changed cell flips exactly that group's checksum
    val mut = Seq(("g", 1L, "x"), ("g", 2L, "Y"), ("h", 3L, "z")).toDF("g", "id", "s")
    val m = sums(mut).map(t => t._1 -> t._3).toMap
    val b = base.map(t => t._1 -> t._3).toMap
    assert(m("h") == b("h") && m("g") != b("g"))
    intercept[IllegalArgumentException] { Relational.tableChecksum(a, Seq("g"), Nil) }
  }

  test("sessionPaths: gap-split journeys, short sessions, count-then-path order") {
    import spark.implicits._
    val ev = Seq(
      // u1: one session, first three steps a>b>c (d falls past pathLen)
      (1L, 0L, 1L, "a"), (1L, 1L, 2L, "b"), (1L, 2L, 3L, "c"), (1L, 3L, 4L, "d"),
      // u2: gap 100 > 10 splits two singleton sessions x, y
      (2L, 0L, 5L, "x"), (2L, 100L, 6L, "y"),
      // u3: same journey as u1's head -> a>b>c counts twice
      (3L, 0L, 7L, "a"), (3L, 1L, 8L, "b"), (3L, 2L, 9L, "c"))
      .toDF("u", "ts", "id", "ev")
    val got = Relational.sessionPaths(ev, "u", col("ts"), col("id"), col("ev"),
        gapMillis = 10L, pathLen = 3, topN = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a>b>c", 2L), (2L, "x", 1L), (3L, "y", 1L)), got.toString)
    val top1 = Relational.sessionPaths(ev, "u", col("ts"), col("id"), col("ev"),
      gapMillis = 10L, pathLen = 3, topN = 1).count()
    assert(top1 == 1L)
    intercept[IllegalArgumentException] {
      Relational.sessionPaths(ev, "u", col("ts"), col("id"), col("ev"), 10L, 0)
    }
  }

  test("nearTimeDuplicates: window + key semantics, pair order, hot-key cap") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L, 10L, 9.99), (1L, 30L, 11L, 9.99),   // dup pair, gap 30
      (1L, 200L, 12L, 9.99),                        // outside 60ms of both
      (1L, 40L, 13L, 19.99),                        // different amount
      (2L, 35L, 14L, 9.99),                         // different entity
      (3L, 50L, 15L, 5.00), (3L, 50L, 16L, 5.00))   // same-ts tie -> id order
      .toDF("u", "ts", "id", "v")
    val got = Relational.nearTimeDuplicates(rows, "u", col("ts"), col("id"),
        col("v"), windowMillis = 60L, scale = 100L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 999L, 10L, 11L, 0L, 30L, 30L),
      (3L, 500L, 15L, 16L, 50L, 50L, 0L)), got.toString)
    // a key over maxPerKey drops WHOLE (systematic, not fraud): user 4's
    // flood AND user 1's 3-row (1, 999) key both vanish at cap 2
    val hot = rows.union(Seq((4L, 0L, 20L, 1.0), (4L, 1L, 21L, 1.0),
      (4L, 2L, 22L, 1.0)).toDF("u", "ts", "id", "v"))
    val capped = Relational.nearTimeDuplicates(hot, "u", col("ts"), col("id"),
      col("v"), windowMillis = 60L, scale = 100L, maxPerKey = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(capped.map(_._1).toSet == Set(3L), capped.mkString(","))
    intercept[IllegalArgumentException] {
      Relational.nearTimeDuplicates(rows, "u", col("ts"), col("id"), col("v"), -1L)
    }
  }

  test("setOverlap: jaccard/overlap/cosine exact, singletons count, caps") {
    import spark.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (4L, "y"), (4L, "z"))
      .toDF("e", "i")
    val got = Relational.setOverlap(df, "e", "i")
      .as[(String, String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // n_x=3 (entity 3's singleton basket still counts), n_y=3, n_z=1
    val xy = got(("x", "y"))
    assert((xy._3, xy._4, xy._5) == (2L, 3L, 3L))
    assert(xy._6 == 2.0 / 4.0 && xy._7 == 2.0 / 3.0 &&
      xy._8 == 2.0 / (math.sqrt(3.0) * math.sqrt(3.0))) // the sqrt-product path, 1 ulp off 2/3
    val yz = got(("y", "z"))
    assert(yz._7 == 1.0, "z's audience is contained in y's -> overlap 1")
    assert(got.size == 2)
    // minBoth prunes; an over-cap basket drops from counts AND pairs
    assert(Relational.setOverlap(df, "e", "i", minBoth = 2L).count() == 1)
    val capped = Relational.setOverlap(
      df.union(Seq((5L, "x"), (5L, "y"), (5L, "q")).toDF("e", "i")),
      "e", "i", maxBasket = 2)
      .as[(String, String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(capped(("x", "y")) == 3L, "capped entity must not inflate counts")
    intercept[IllegalArgumentException] { Relational.setOverlap(df, "e", "i", 0L) }
  }

  test("aggState/mergeAggStates: merge of splits equals state of the union") {
    import spark.implicits._
    val full = Seq(("g", 1.25), ("g", 2.50), ("g", 0.75), ("h", 9.99), ("k", 1.00))
      .toDF("g", "v")
    val a = Relational.aggState(full.filter(col("v") < 2.0), Seq("g"), col("v"))
    val b = Relational.aggState(full.filter(col("v") >= 2.0), Seq("g"), col("v"))
    val merged = Relational.mergeAggStates(a, b, Seq("g"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val direct = Relational.aggState(full, Seq("g"), col("v"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged == direct, s"$merged vs $direct")
    assert(direct == Set(("g", 3L, 450L, 75L, 250L), ("h", 1L, 999L, 999L, 999L),
      ("k", 1L, 100L, 100L, 100L)))
    // keys present on only one side pass through unchanged (full outer)
    assert(merged.exists(r => r._1 == "h" && r._2 == 1L))
    intercept[IllegalArgumentException] {
      Relational.mergeAggStates(a, full, Seq("g")) // not a state table
    }
  }

  test("weightedPercentiles: integer crossing, exact boundary, zero weights out") {
    import spark.implicits._
    // units 1,2,3 with weights 1,1,2 -> total 4; cum: 1@1, 2@2, 4@3
    // p=1/2: den*cum >= num*tot <=> 2*cum >= 4 -> first at unit 2 (exact boundary)
    // p=3/4: 4*cum >= 12 -> unit 3;  p=1/4: 4*cum >= 4 -> unit 1
    val df = Seq(("g", 0.01, 1.0), ("g", 0.02, 1.0), ("g", 0.03, 2.0),
      ("g", 0.99, 0.0), ("h", 0.05, 5.0)).toDF("g", "v", "w")
    val got = Relational.weightedPercentiles(df, Seq("g"), col("v"), col("w"),
        Seq((1, 4), (1, 2), (3, 4)), valueScale = 100L, weightScale = 1L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("g", 1L, 4L, 1L), ("g", 1L, 2L, 2L), ("g", 3L, 4L, 3L),
      ("h", 1L, 4L, 5L), ("h", 1L, 2L, 5L), ("h", 3L, 4L, 5L)), got.toString)
    intercept[IllegalArgumentException] {
      Relational.weightedPercentiles(df, Seq("g"), col("v"), col("w"), Seq((3, 2)))
    }
    intercept[IllegalArgumentException] {
      Relational.weightedPercentiles(df, Seq("g"), col("v"), col("w"), Nil)
    }
  }

  test("interpolate: linear fill between bracketing observations, LOCF-free") {
    import spark.implicits._
    // entity a: observed at 0 (10.0) and 3 (16.0) -> 1:12.0, 2:14.0;
    // duplicate bucket keeps the max-tie row (t=2 wins at bucket 0);
    // entity b: single observation -> single observed row, no gaps
    val df = Seq(
      ("a", 0L, 4.0, 1L), ("a", 0L, 10.0, 2L), ("a", 3L, 16.0, 3L),
      ("b", 7L, 5.0, 1L))
      .toDF("e", "b", "v", "t")
    val got = Relational.interpolate(df, "e", col("b"), col("v"), col("t"))
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(got == Set(
      ("a", 0L, 10.0, true), ("a", 1L, 12.0, false),
      ("a", 2L, 14.0, false), ("a", 3L, 16.0, true),
      ("b", 7L, 5.0, true)))
    // r14: double-valued series take the single-pass generator path —
    // no window exchange, no grid⋈obs join, the graft_grid_fill
    // generator emits the grid straight from the per-entity array
    val planDf = Relational.interpolate(df, "e", col("b"), col("v"), col("t"))
    planDf.collect()
    val plan = planDf.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("window"), plan)
    assert(plan.toLowerCase.contains("graft_grid_fill"), plan)
  }

  test("gapFill/interpolate native grid == the window form, bit-for-bit, incl. null edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // nulls everywhere the window form has defined behavior: leading /
    // interior / trailing null values (fill or null), a null entity
    // (grid emits, values all null — the join-miss contract), a null
    // bucket (ignored everywhere), plus ties and single-obs entities
    val df = Seq(
      ("a", Option(0L), Option(2.0), 1L), ("a", Option(4L), Option(10.0), 2L),
      ("a", Option(2L), None: Option[Double], 3L), // interior null obs = a gap
      ("c", Option(5L), None: Option[Double], 1L), // leading null
      ("c", Option(7L), Option(3.0), 2L), ("c", Option(9L), None: Option[Double], 3L),
      (null.asInstanceOf[String], Option(1L), Option(8.0), 1L),
      (null.asInstanceOf[String], Option(4L), Option(9.0), 2L),
      ("d", None: Option[Long], Option(7.0), 1L), // null bucket only -> no rows
      ("e", Option(11L), Option(6.0), 1L))
      .toDF("e", "b", "v", "t")
    def windowForm(interp: Boolean): Set[(String, Long, Option[Double], Boolean)] = {
      val base = df.select(col("e").as("_e"), col("b").as("_b"),
        col("v").as("_v"), col("t").as("_t"))
      val obs = base.groupBy("_e", "_b").agg(max_by(col("_v"), col("_t")).as("_v"))
      val span = obs.groupBy("_e").agg(min("_b").as("_b0"), max("_b").as("_b1"))
      val grid = span.select(col("_e"), explode(sequence(col("_b0"), col("_b1"))).as("_b"))
      val wPrev = org.apache.spark.sql.expressions.Window.partitionBy("_e").orderBy("_b")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wNext = org.apache.spark.sql.expressions.Window.partitionBy("_e")
        .orderBy(col("_b").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val pv = last(col("_v"), ignoreNulls = true).over(wPrev)
      val pb = last(when(col("_v").isNotNull, col("_b")), ignoreNulls = true).over(wPrev)
      val nv = last(col("_v"), ignoreNulls = true).over(wNext)
      val nb = last(when(col("_v").isNotNull, col("_b")), ignoreNulls = true).over(wNext)
      val value =
        if (interp) when(col("_v").isNotNull, col("_v"))
          .otherwise(pv + (nv - pv) * (col("_b") - pb) / (nb - pb))
        else last(col("_v"), ignoreNulls = true).over(wPrev)
      grid.join(obs, Seq("_e", "_b"), "left")
        .select(col("_e").as("e"), col("_b").as("bucket"), value.as("value"),
          col("_v").isNotNull.as("observed"))
        .as[(String, Long, Option[Double], Boolean)].collect().toSet
    }
    val gotFill = Relational.gapFill(df, "e", col("b"), col("v"), col("t"))
      .as[(String, Long, Option[Double], Boolean)].collect().toSet
    val gotInterp = Relational.interpolate(df, "e", col("b"), col("v"), col("t"))
      .as[(String, Long, Option[Double], Boolean)].collect().toSet
    assert(gotFill == windowForm(interp = false))
    assert(gotInterp == windowForm(interp = true))
  }

  test("intervalOverlapJoin: exactly the naive matches, exactly once, no nested loop") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // spans up to 12x the cell width force multi-cell explosion; shared
    // keys + touching endpoints force every overlap class
    def mk(n: Int, pre: String) = (1L to n.toLong).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i, "k" + rnd.nextInt(5), s, s + rnd.nextInt(1200).toLong)
    }.toDF(s"${pre}id", s"${pre}k", s"${pre}s", s"${pre}e")
    val l = mk(300, "l"); val r = mk(300, "r")
    val got = Relational.intervalOverlapJoin(l, r, col("lk"), col("rk"),
        col("ls"), col("le"), col("rs"), col("re"), cellWidth = 100L)
      .select("lid", "rid").as[(Long, Long)].collect()
    val naive = l.join(r, col("lk") === col("rk") &&
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(got.toSet == naive.toSet, "cell join must find exactly the naive matches")
    assert(got.length == got.toSet.size, "reporting-cell emission must be exactly-once")
    assert(got.length == naive.length && got.nonEmpty)
    // equi-join on (cell, key) — never the nested-loop fallback
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: collectAll(q.plan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val df = Relational.intervalOverlapJoin(l, r, col("lk"), col("rk"),
      col("ls"), col("le"), col("rs"), col("re"), cellWidth = 100L)
    df.collect()
    val nodes = collectAll(df.queryExecution.executedPlan)
    assert(!nodes.exists(n =>
      n.isInstanceOf[BroadcastNestedLoopJoinExec] || n.isInstanceOf[CartesianProductExec]),
      "intervalOverlapJoin must meet in an equi-join")
    // shared column names fail loud, not silently-degraded predicates
    intercept[IllegalArgumentException] {
      Relational.intervalOverlapJoin(l, l, col("lk"), col("lk"),
        col("ls"), col("le"), col("ls"), col("le"), cellWidth = 100L)
    }
  }

  test("mannKendall: hand-computed S/var18/z; guards fire; all-tied drops") {
    import spark.implicits._
    // g: strictly increasing 1,2,3,4 -> S = 6, no ties: var18 = 4·3·13 = 156
    val g = Seq(1L, 2L, 3L, 4L).zipWithIndex.map { case (y, i) => ("g", i.toLong, y) }
    // h: 1,2,2,3 -> S = 5, tie t=2 -> tau = 2·1·9 = 18, var18 = 138
    val h = Seq(1L, 2L, 2L, 3L).zipWithIndex.map { case (y, i) => ("h", i.toLong, y) }
    // t: all tied -> var18 = 0, drops
    val t = Seq(7L, 7L, 7L).zipWithIndex.map { case (y, i) => ("t", i.toLong, y) }
    val got = Relational.mannKendall((g ++ h ++ t).toDF("grp", "x", "y"),
        Seq("grp"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "h"), s"$got")
    val Seq((_, ng, sg, v18g, zg), (_, nh, sh, v18h, zh)) = got
    assert((ng, sg, v18g) == ((4L, 6L, 156L)))
    assert(math.abs(zg - 5.0 / math.sqrt(156.0 / 18.0)) < 1e-12, s"$zg")
    assert((nh, sh, v18h) == ((4L, 5L, 138L)))
    assert(math.abs(zh - 4.0 / math.sqrt(138.0 / 18.0)) < 1e-12, s"$zh")
    // decreasing series: negative S, continuity correction toward zero
    val d = Seq(4L, 3L, 2L, 1L).zipWithIndex.map { case (y, i) => ("d", i.toLong, y) }
    val zd = Relational.mannKendall(d.toDF("grp", "x", "y"), Seq("grp"),
      col("x"), col("y")).as[(String, Long, Long, Long, Double)].head()
    assert(zd._3 == -6L && math.abs(zd._5 + 5.0 / math.sqrt(156.0 / 18.0)) < 1e-12)
    // duplicate x fails loud (MK is defined on a series)
    val dup = Seq(("e", 1L, 1L), ("e", 1L, 2L), ("e", 2L, 3L)).toDF("grp", "x", "y")
    val e1 = intercept[Exception] {
      Relational.mannKendall(dup, Seq("grp"), col("x"), col("y")).collect()
    }
    assert(e1.getMessage != null)
    // over-maxN group fails loud before the quadratic join detonates
    val big = (1 to 50).map(i => ("f", i.toLong, i.toLong)).toDF("grp", "x", "y")
    intercept[Exception] {
      Relational.mannKendall(big, Seq("grp"), col("x"), col("y"), maxN = 10)
        .collect()
    }
  }

  test("kruskalWallis: hand-computed H with and without ties; degenerates drop") {
    import spark.implicits._
    // g (no ties): a={1,2}, b={3,4} -> ranks 1..4, 2R_a=6, 2R_b=14,
    // Σ(2R)²/n = 36/2 + 196/2 = 116, H = 3·116/(4·5) − 3·5 = 2.4, C = 1
    val g = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "b", 3.0), ("g", "b", 4.0))
    // h (tie at 2): a={1,2}, b={2,3} -> avg rank 2.5 for the tie,
    // 2R_a=7, 2R_b=13, Σ=49/2+169/2=109, H=3·109/20−15=1.35,
    // C = 1 − 6/60 = 0.9 -> H_adj = 1.5
    val h = Seq(("h", "a", 1.0), ("h", "a", 2.0), ("h", "b", 2.0), ("h", "b", 3.0))
    // s: single treatment -> k < 2, drops; t: all values tied -> C = 0, drops
    val s = Seq(("s", "a", 1.0), ("s", "a", 2.0))
    val t = Seq(("t", "a", 5.0), ("t", "b", 5.0), ("t", "a", 5.0))
    val got = Relational.kruskalWallis((g ++ h ++ s ++ t).toDF("grp", "k", "v"),
        Seq("grp"), col("k"), col("v"), scale = 1L)
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "h"), s"$got")
    val Seq((_, kg, ng, hg, hadjg), (_, kh, nh, hh, hadjh)) = got
    assert((kg, ng) == ((2L, 4L)) && math.abs(hg - 2.4) < 1e-12, s"$hg")
    assert(math.abs(hadjg - 2.4) < 1e-12, "no ties: H_adj == H")
    assert((kh, nh) == ((2L, 4L)) && math.abs(hh - 1.35) < 1e-12, s"$hh")
    assert(math.abs(hadjh - 1.5) < 1e-12, s"$hadjh")
  }

  test("bhAdjust: suffix-min step-up, cap at 1, deterministic total order") {
    import spark.implicits._
    // sorted p = .01,.03,.04,.05 (m=4): raw = .04,.06,.0533,.05;
    // suffix-min = .04,.05,.05,.05
    val df = Seq(("w", 0.04), ("x", 0.01), ("y", 0.05), ("z", 0.03))
      .toDF("id", "p")
    val got = Relational.bhAdjust(df, col("p"), Seq(col("id")), alpha = 0.045)
      .select("id", "bh_rank", "p_adj", "discovery")
      .as[(String, Long, Double, Boolean)].collect().sortBy(_._2).toSeq
    assert(got.map(_._1) == Seq("x", "z", "w", "y"), s"$got")
    assert(math.abs(got(0)._3 - 0.04) < 1e-12)
    got.tail.foreach(r => assert(math.abs(r._3 - 0.05) < 1e-12, s"$r"))
    assert(got.map(_._4) == Seq(true, false, false, false))
    // p_adj never exceeds 1 even when p·m/rank does
    val capped = Relational.bhAdjust(Seq(("a", 0.9), ("b", 0.95)).toDF("id", "p"),
        col("p"), Seq(col("id")))
      .select("p_adj").as[Double].collect()
    assert(capped.forall(_ <= 1.0), s"${capped.toSeq}")
  }

  test("bhAdjust distributed rank/suffix-min == the single global window, bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // enough rows to spread across many range partitions, with duplicate
    // p values so the key tie-break decides ranks, and null p's dropped
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map { i =>
      val p = if (i % 97 == 0) None else Some(rnd.nextInt(40) / 40.0 + 0.001)
      (i.toLong, p)
    }.toDF("id", "p").repartition(13)
    val gotRows = Relational.bhAdjust(df, col("p"), Seq(col("id")),
        distributed = true)
      .select("id", "bh_rank", "m", "p_adj", "discovery")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSet
    // reference: the pre-r14 single unpartitioned-window formulation
    val w = org.apache.spark.sql.expressions.Window
    val ranked = df.filter(col("p").isNotNull)
      .withColumn("_p", col("p").cast("double"))
      .withColumn("bh_rank",
        row_number().over(w.orderBy(col("_p"), col("id"))).cast("long"))
      .withColumn("m", count(lit(1)).over(
        w.partitionBy().rowsBetween(w.unboundedPreceding, w.unboundedFollowing)))
    val wSuffix = w.orderBy(col("bh_rank"))
      .rowsBetween(w.currentRow, w.unboundedFollowing)
    val refRows = ranked
      .withColumn("p_adj", least(
        min(col("_p") * col("m").cast("double") / col("bh_rank").cast("double"))
          .over(wSuffix), lit(1.0)))
      .withColumn("discovery", col("p_adj") <= lit(0.05))
      .select("id", "bh_rank", "m", "p_adj", "discovery")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSet
    assert(gotRows == refRows)
    // and the distributed form actually split the ranking work
    assert(gotRows.nonEmpty && gotRows.size == 500 - 500 / 97)
  }

  test("cramersV: perfect association -> 1, independence -> 0") {
    import spark.implicits._
    val perfect = ((1 to 10).map(_ => ("x", "p")) ++ (1 to 10).map(_ => ("y", "q")))
      .toDF("a", "b")
    val v1 = Relational.cramersV(perfect, "a", "b")
      .select("n", "chi2", "v").as[(Long, Double, Double)].head()
    assert(v1._1 == 20L && math.abs(v1._2 - 20.0) < 1e-9 &&
      math.abs(v1._3 - 1.0) < 1e-12, s"$v1")
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val v0 = Relational.cramersV(indep, "a", "b").select("v").as[Double].head()
    assert(math.abs(v0) < 1e-12, s"$v0")
    // a 1×k grid has no V (undefined, not zero)
    val degenerate = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(Relational.cramersV(degenerate, "a", "b").isEmpty)
  }

  test("agreementKappa: perfect=1, chance-level=0, constant raters drop") {
    import spark.implicits._
    val perfect = Seq((true, true), (false, false), (true, true), (false, false))
      .toDF("a", "b")
    val k1 = Relational.agreementKappa(perfect, col("a"), col("b"))
      .select("kappa").as[Double].head()
    assert(math.abs(k1 - 1.0) < 1e-12, s"$k1")
    // independent raters with balanced marginals: po = pe = 0.5 -> kappa 0
    val chance = Seq((true, true), (true, false), (false, true), (false, false))
      .toDF("a", "b")
    val k0 = Relational.agreementKappa(chance, col("a"), col("b"))
      .select("po", "pe", "kappa").as[(Double, Double, Double)].head()
    assert(k0._1 == 0.5 && k0._2 == 0.5 && math.abs(k0._3) < 1e-12, s"$k0")
    // both raters constant-true: pe = 1, kappa undefined -> no row
    val constant = Seq((true, true), (true, true)).toDF("a", "b")
    assert(Relational.agreementKappa(constant, col("a"), col("b")).isEmpty)
  }

  test("cmhTest: hand-computed two-stratum statistic; degenerate strata handled") {
    import spark.implicits._
    // s1: arm 3/5 vs non-arm 1/5 -> a=3,n1=5,m1=4,n=10:
    //   num = 3 − 2 = 1, den = 5·5·4·6/900 = 2/3
    // s2: arm 2/4 vs non-arm 2/4 -> num = 0, den = 256/448 = 4/7
    // CMH = 1² / (2/3 + 4/7) = 21/26
    val s1 = (1 to 5).map(i => ("s1", true, i <= 3)) ++
      (1 to 5).map(i => ("s1", false, i <= 1))
    val s2 = (1 to 4).map(i => ("s2", true, i <= 2)) ++
      (1 to 4).map(i => ("s2", false, i <= 2))
    val got = Relational.cmhTest((s1 ++ s2).toDF("s", "arm", "succ"), Nil,
        col("s"), col("arm"), col("succ"))
      .as[(Long, Double, Double)].head()
    assert(got._1 == 2L)
    assert(math.abs(got._2 - 21.0 / 26.0) < 1e-12, s"${got._2}")
    assert(got._3 > 0.3 && got._3 < 1.0, s"p plausible for cmh<1: ${got._3}")
    // a zero-margin stratum (no successes) contributes 0 to both sums —
    // adding it must not move the statistic
    val s3 = Seq(("s3", true, false), ("s3", false, false), ("s3", true, false))
    val withZero = Relational.cmhTest((s1 ++ s2 ++ s3).toDF("s", "arm", "succ"),
        Nil, col("s"), col("arm"), col("succ"))
      .as[(Long, Double, Double)].head()
    assert(withZero._1 == 3L && math.abs(withZero._2 - got._2) < 1e-12)
    // single-row strata drop (den undefined at n=1); all-degenerate -> empty
    val tiny = Seq(("a", true, true), ("b", false, false)).toDF("s", "arm", "succ")
    assert(Relational.cmhTest(tiny, Nil, col("s"), col("arm"), col("succ")).isEmpty)
  }

  test("ratioSE: hand-computed delta-method SE; exact-ratio groups get se 0") {
    import spark.implicits._
    // g: y=(1,3), w=(1,1) -> R=2, Σe²=2, se = √(2/4 · 2) = 1
    val g = Seq(("g", 1.0, 1.0), ("g", 3.0, 1.0))
    // h: y exactly proportional to w -> residuals 0 -> se = 0
    val h = Seq(("h", 2.0, 1.0), ("h", 4.0, 2.0), ("h", 6.0, 3.0))
    val got = Relational.ratioSE((g ++ h).toDF("grp", "y", "w"), Seq("grp"),
        col("y"), col("w"), scaleY = 1L, scaleW = 1L)
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    val Seq((_, ng, rg, seg, log, hig), (_, nh, rh, seh, _, _)) = got
    assert((ng, rg) == ((2L, 2.0)) && math.abs(seg - 1.0) < 1e-12, s"$got")
    assert(math.abs(log - (2.0 - 1.96)) < 1e-12 && math.abs(hig - 3.96) < 1e-12)
    assert((nh, rh) == ((3L, 2.0)) && seh == 0.0, s"se must be exactly 0: $seh")
    // n = 1 drops (no variance estimate from one row)
    assert(Relational.ratioSE(Seq(("x", 1.0, 1.0)).toDF("grp", "y", "w"),
      Seq("grp"), col("y"), col("w"), 1L, 1L).isEmpty)
  }

  test("psiDrift: identical halves -> 0, shifted half -> large, no-ref drops") {
    import spark.implicits._
    val base = (1 to 100).map(_.toDouble)
    // g: identical ref/cur distributions -> every bin has p = q -> PSI = 0
    val g = base.map(v => ("g", true, v)) ++ base.map(v => ("g", false, v))
    // h: current shifted far above every reference decile -> mass piles
    // into the top bin -> PSI far beyond the 0.25 action threshold
    val h = base.map(v => ("h", true, v)) ++ base.map(v => ("h", false, v + 1000.0))
    // x: no reference rows -> no bins -> group drops
    val x = base.map(v => ("x", false, v))
    val got = Relational.psiDrift((g ++ h ++ x).toDF("grp", "ref", "v"),
        Seq("grp"), col("v"), col("ref"), bins = 10, scale = 1L)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "h"), s"$got")
    val Seq((_, nrg, ncg, psig), (_, nrh, nch, psih)) = got
    assert((nrg, ncg) == ((100L, 100L)) && psig == 0.0, s"identical -> 0: $psig")
    assert((nrh, nch) == ((100L, 100L)) && psih > 0.25, s"shifted -> large: $psih")
  }

  test("brownForsythe: hand-computed W incl. half-integer medians; degenerates drop") {
    import spark.implicits._
    // g: a={1,2,3} (med 2, z=1,0,1), b={10,20,30} (med 20, z=10,0,10)
    // A = 404/3 − 484/6 = 54, B = 202 − 404/3 = 202/3,
    // W = (6−2)/(2−1) · 54/(202/3) = 324/101
    val g = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "b", 10.0), ("g", "b", 20.0), ("g", "b", 30.0))
    // h: even counts exercise the doubled half-integer median (med 2.5):
    // a={1,2,3,4} z=1.5,.5,.5,1.5; b={5,5,5,5} all tied -> W = 12
    val h = Seq(("h", "a", 1.0), ("h", "a", 2.0), ("h", "a", 3.0), ("h", "a", 4.0),
      ("h", "b", 5.0), ("h", "b", 5.0), ("h", "b", 5.0), ("h", "b", 5.0))
    // s: single treatment (k < 2) drops; t: zero spread everywhere (B=0) drops
    val s = Seq(("s", "a", 1.0), ("s", "a", 2.0), ("s", "a", 3.0))
    val t = Seq(("t", "a", 4.0), ("t", "a", 4.0), ("t", "b", 9.0), ("t", "b", 9.0))
    val got = Relational.brownForsythe((g ++ h ++ s ++ t).toDF("grp", "k", "v"),
        Seq("grp"), col("k"), col("v"), scale = 1L)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "h"), s"$got")
    val Seq((_, kg, ng, wg), (_, kh, nh, wh)) = got
    assert((kg, ng) == ((2L, 6L)) && math.abs(wg - 324.0 / 101.0) < 1e-12, s"$wg")
    assert((kh, nh) == ((2L, 8L)) && math.abs(wh - 12.0) < 1e-12, s"$wh")
  }

  test("round-10 stats plan shapes: no pair joins, windows only above aggregates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val data = (1 to 40).map(i => ("g", i % 7, i, i.toDouble * 3 % 11))
      .toDF("grp", "k", "day", "v")
    val plans = Map(
      "anovaF" -> Relational.anovaF(data, Seq("grp"), col("k"), col("v"),
        scale = 1L),
      "welchAnova" -> Relational.welchAnova(data, Seq("grp"), col("k"),
        col("v"), scale = 1L),
      "changePoint" -> Relational.changePoint(data, Seq("grp"), col("day"),
        col("v"), scale = 1L),
      "seasonalNaiveEval" -> Relational.seasonalNaiveEval(data, Seq("grp"),
        col("day"), col("v"), scale = 1L),
      "kendallTau" -> Relational.kendallTau(data, Seq("grp"), col("k"),
        col("v"), maxN = 1000, scaleX = 1L, scaleY = 1L))
    plans.foreach { case (name, df) =>
      // pre-execution plan: the full tree is visible (post-AQE it hides
      // behind query-stage nodes whose children are detached)
      val nodes = collectAll(df.queryExecution.executedPlan)
      // the quadratic surfaces must be equi-joins, never a pair scan
      assert(!nodes.exists(n => n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
        n.isInstanceOf[CartesianProductExec]), s"$name plans a pair join")
      // every window runs over a statistic table (an aggregate sits
      // below it), never the raw corpus
      nodes.collect { case w: WindowExec => w }.foreach { w =>
        assert(collectAll(w).exists(_.isInstanceOf[BaseAggregateExec]),
          s"$name has a Window over the un-aggregated input")
      }
    }
  }

  test("kendallTau: hand-computed tau-b with ties and weights; guards and drops") {
    import spark.implicits._
    // g: one discordant pair among 10 -> tau = (9-1)/10 = 0.8
    val g = Seq(1 -> 1, 2 -> 3, 3 -> 2, 4 -> 4, 5 -> 5).map { case (x, y) =>
      ("g", x.toDouble, y.toDouble) }
    // r: perfectly reversed -> tau = -1
    val r = Seq(("r", 1.0, 4.0), ("r", 2.0, 3.0), ("r", 3.0, 2.0), ("r", 4.0, 1.0))
    // t: balanced ties both axes -> C = D -> tau = 0 (d1 = d2 = 8 > 0)
    val t = Seq(("t", 1.0, 1.0), ("t", 1.0, 2.0), ("t", 2.0, 1.0), ("t", 2.0, 2.0))
    // w: a weighted cell ((1,1) twice) stays perfectly concordant:
    // C-D = 2, d1 = d2 = 3*2 - 2 = 4 -> tau = 2*2/4 = 1
    val w = Seq(("w", 1.0, 1.0), ("w", 1.0, 1.0), ("w", 2.0, 2.0))
    // c: constant y -> d2 = 0 -> drops; s: single point -> drops
    val c = Seq(("c", 1.0, 7.0), ("c", 2.0, 7.0))
    val s = Seq(("s", 1.0, 1.0))
    val got = Relational.kendallTau((g ++ r ++ t ++ w ++ c ++ s)
        .toDF("grp", "x", "y"), Seq("grp"), col("x"), col("y"),
        maxN = 100, scaleX = 1L, scaleY = 1L)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "r", "t", "w"), s"$got")
    val Seq((_, ng, tg), (_, _, tr), (_, _, tt), (_, nw, tw)) = got
    assert(ng == 5L && math.abs(tg - 0.8) < 1e-12, s"$tg")
    assert(tr == -1.0 && tt == 0.0)
    assert(nw == 3L && math.abs(tw - 1.0) < 1e-12, s"weighted cells: $tw")
    // maxN guard fails loud on too many distinct cells
    val ex = intercept[Exception] {
      Relational.kendallTau(g.toDF("grp", "x", "y"), Seq("grp"),
        col("x"), col("y"), maxN = 3, scaleX = 1L, scaleY = 1L).collect()
    }
    assert(ex.getMessage.contains("maxN"), ex.getMessage)
  }

  test("anovaF: hand-computed F, zero-SSB case, scale invariance; degenerates drop") {
    import spark.implicits._
    // g: a={1,2,3}, b={4,5,6} -> sum si^2/ni = 12+75 = 87, S=21, N=6,
    // SSB = 87 - 73.5 = 13.5, SSW = 91 - 87 = 4, F = (13.5/1)/(4/4) = 13.5
    val g = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "b", 4.0), ("g", "b", 5.0), ("g", "b", 6.0))
    // h: equal treatment means -> SSB = 0 exactly -> F = 0
    val h = Seq(("h", "a", 1.0), ("h", "a", 3.0), ("h", "b", 2.0), ("h", "b", 2.0))
    // s: single treatment (k < 2) drops; t: SSW = 0 (constant within) drops
    val s = Seq(("s", "a", 1.0), ("s", "a", 2.0))
    val t = Seq(("t", "a", 5.0), ("t", "a", 5.0), ("t", "b", 7.0), ("t", "b", 7.0))
    val got = Relational.anovaF((g ++ h ++ s ++ t).toDF("grp", "k", "v"),
        Seq("grp"), col("k"), col("v"), scale = 1L)
      .as[(String, Long, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "h"), s"$got")
    val Seq((_, kg, ng, ssbg, sswg, fg), (_, _, _, ssbh, _, fh)) = got
    assert((kg, ng) == ((2L, 6L)))
    assert(math.abs(ssbg - 13.5) < 1e-12 && math.abs(sswg - 4.0) < 1e-12)
    assert(math.abs(fg - 13.5) < 1e-12, s"$fg")
    assert(ssbh == 0.0 && fh == 0.0, s"equal means -> F = 0: $fh")
    // scale invariance: the same g data divided by 100 with scale=100
    // snaps to the identical cents -> identical F
    val g100 = g.map { case (gr, k, v) => (gr, k, v / 100.0) }
    val f100 = Relational.anovaF(g100.toDF("grp", "k", "v"),
      Seq("grp"), col("k"), col("v"), scale = 100L)
      .select("f").as[Double].head()
    assert(math.abs(f100 - fg) < 1e-12, s"scale-invariant: $f100 vs $fg")
    // Σv² past decimal(38,0) fails LOUD (the welchAnova discipline) —
    // under ANSI (the default) the long Σv overflow already throws, but
    // a non-ANSI session turns the decimal overflow into a silent null
    // that sum() skips, dropping the treatment's squares while k/n
    // still count it. Two values at 9e18 square-sum to 1.62e38 >
    // 10^38 − 1; the guard must raise, not drop.
    val big = Seq(("o", "a", 9.0e18), ("o", "a", 9.0e18),
      ("o", "b", 1.0), ("o", "b", 2.0))
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val ex = intercept[Throwable] {
        Relational.anovaF(big.toDF("grp", "k", "v"), Seq("grp"), col("k"),
          col("v"), scale = 1L).collect()
      }
      val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("anovaF: sum of squares overflowed"), msgs)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }

  test("changePoint: hand-located split, earliest-day tie-break, degenerates drop") {
    import spark.implicits._
    // g: daily totals 1,1,1,5,5,5 over days 1..6 -> D_t = 6*S_t - 18t
    // peaks at |D_3| = 36: split after day 3, means 1 vs 5, shift 4
    val g = (1 to 3).map(d => ("g", d, 1.0)) ++ (4 to 6).map(d => ("g", d, 5.0))
    // h: 0,4,4,0 -> |D| ties at t=1 and t=3 (both 8) -> earliest day wins
    val h = Seq(("h", 1, 0.0), ("h", 2, 4.0), ("h", 3, 4.0), ("h", 4, 0.0))
    // s: single day -> no interior split -> drops
    val s = Seq(("s", 1, 9.0), ("s", 1, 1.0))
    val got = Relational.changePoint((g ++ h ++ s).toDF("grp", "day", "v"),
        Seq("grp"), col("day"), col("v"), scale = 1L)
      .as[(String, Int, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "h"), s"$got")
    val Seq((_, dayG, tG, ttG, mlG, mrG, shG), (_, dayH, tH, _, mlH, mrH, shH)) = got
    assert((dayG, tG, ttG) == ((3, 3L, 6L)), s"$got")
    assert(mlG == 1.0 && mrG == 5.0 && shG == 4.0)
    assert((dayH, tH) == ((1, 1L)), "tie at |D|=8 broken to the earliest day")
    assert(mlH == 0.0 && math.abs(mrH - 8.0 / 3.0) < 1e-12 &&
      math.abs(shH - 8.0 / 3.0) < 1e-12)
    // same-day rows pre-aggregate into one daily total (s would otherwise
    // split 9 vs 1): asserted by s dropping above
  }

  test("zipfFit: exact fit on constructed counts; uniform spectrum drops") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // counts a=4, b=2, c=1 -> ranks 1,2,3; expected alpha/r2 from the
    // same closed forms on (ln r, ln f)
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, "text")
      .as[(Long, Long, Double, Double)].head()
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val m = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val cov = m * sxy - sx * sy
    val expAlpha = -(cov / (m * sxx - sx * sx))
    val expR2 = cov * cov / ((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(got._1 == 3L && got._2 == 3L)
    assert(math.abs(got._3 - expAlpha) < 1e-9, s"${got._3} vs $expAlpha")
    assert(math.abs(got._4 - expR2) < 1e-9 && got._4 > 0.9, s"${got._4}")
    assert(got._3 > 0.8 && got._3 < 1.5, "near-Zipfian alpha for a 4/2/1 spectrum")
    // uniform counts: zero y-variance -> no fit row
    val flat = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(TextAnalysis.zipfFit(flat, "text").isEmpty)
  }

  test("welchAnova: k=2 equals Welch t-squared, 3-treatment replay, degenerates drop") {
    import spark.implicits._
    // g: a={1,2,3} (s2=1, w=3), b={10,12,14} (s2=4, w=.75) ->
    // F_w = t_welch^2 = 100 / (1/3 + 4/3) = 60 exactly; df2 = 3/(3*.34)
    val g = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "b", 10.0), ("g", "b", 12.0), ("g", "b", 14.0))
    // h: adds c={5,6,7,8} -> replay the whole formula in key order
    val h = g.map { case (_, k, v) => ("h", k, v) } ++
      Seq(("h", "c", 5.0), ("h", "c", 6.0), ("h", "c", 7.0), ("h", "c", 8.0))
    // d1: a treatment with n=1 -> group drops; d2: constant treatment drops
    val d1 = Seq(("d1", "a", 1.0), ("d1", "a", 2.0), ("d1", "b", 5.0))
    val d2 = Seq(("d2", "a", 1.0), ("d2", "a", 2.0), ("d2", "b", 7.0), ("d2", "b", 7.0))
    val got = Relational.welchAnova((g ++ h ++ d1 ++ d2).toDF("grp", "k", "v"),
        Seq("grp"), col("k"), col("v"), scale = 1L)
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "h"), s"$got")
    val Seq((_, kg, ng, fg, dfg), (_, kh, nh, fh, dfh)) = got
    assert((kg, ng) == ((2L, 6L)))
    assert(math.abs(fg - 60.0) < 1e-9, s"$fg")
    assert(math.abs(dfg - 3.0 / (3.0 * 0.34)) < 1e-9, s"$dfg")
    // replay h with the operator's own fold order (treatments ascending)
    val stats = Seq(("a", 3L, 2.0, 1.0), ("b", 3L, 12.0, 4.0),
      ("c", 4L, 6.5, 5.0 / 3.0))
    val ws = stats.map { case (_, n, _, s2) => n.toDouble / s2 }
    val bw = ws.sum
    val xw = stats.zip(ws).map { case ((_, _, xb, _), w) => w * xb }.sum / bw
    val a = stats.zip(ws).map { case ((_, _, xb, _), w) => w * (xb - xw) * (xb - xw) }.sum
    val l = stats.zip(ws).map { case ((_, n, _, _), w) =>
      (1.0 - w / bw) * (1.0 - w / bw) / (n - 1).toDouble }.sum
    val k3 = 3.0
    val expF = (a / (k3 - 1.0)) / (1.0 + 2.0 * (k3 - 2.0) / (k3 * k3 - 1.0) * l)
    assert((kh, nh) == ((3L, 10L)))
    assert(math.abs(fh - expF) < 1e-9, s"$fh vs $expF")
    assert(math.abs(dfh - (k3 * k3 - 1.0) / (3.0 * l)) < 1e-9, s"$dfh")
  }

  test("seasonalNaiveEval: hand MASE, periodic series scores 0, degenerates drop") {
    import spark.implicits._
    // g: 1..10 linear -> e1 all 1 (mae_naive 1), em = 7,7,7 -> mase 7
    val g = (1 to 10).map(d => ("g", d, d.toDouble))
    // p: period-7 repeating -> em all 0 -> mase exactly 0
    val pat = Seq(5.0, 1.0, 2.0, 1.0, 1.0, 3.0, 5.0)
    val p = (0 until 14).map(d => ("p", d, pat(d % 7)))
    // c: constant (mae_naive 0) drops; s: too short for lag-7 drops
    val c = (1 to 10).map(d => ("c", d, 4.0))
    val s = (1 to 6).map(d => ("s", d, d.toDouble))
    val got = Relational.seasonalNaiveEval((g ++ p ++ c ++ s)
        .toDF("grp", "day", "v"), Seq("grp"), col("day"), col("v"),
        period = 7, scale = 1L)
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("g", "p"), s"$got")
    val Seq((_, ng, msG, mnG, maseG), (_, np, msP, _, maseP)) = got
    assert(ng == 10L && msG == 7.0 && mnG == 1.0 && maseG == 7.0, s"$got")
    assert(np == 14L && msP == 0.0 && maseP == 0.0, s"$got")
    intercept[IllegalArgumentException] {
      Relational.seasonalNaiveEval(g.toDF("grp", "day", "v"), Seq("grp"),
        col("day"), col("v"), period = 1)
    }
  }

  test("readability: hand counts incl. vowel-less word and sentence-less doc") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // a: 7 words, 3 sentence runs, 6 vowel runs + 1 vowel-less word = 7
    val a = ("a", "The cat sat. It ran! Dry pfft?")
    // b: no punctuation -> sentences floor at 1; syllables 1+2+1 = 4;
    // the double space adds an empty token that must NOT count as a
    // word or a vowel-less syllable
    val b = ("b", "spark merge  join")
    // w: whitespace-only and empty docs have zero words -> drop whole
    val w1 = ("w", "   ")
    val w2 = ("w", "")
    val got = TextAnalysis.readability(Seq(a, b, w1, w2).toDF("source", "text"),
        "source", "text")
      .as[(String, Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    def fre(w: Long, s: Long, y: Long): Double =
      206.835 - 1.015 * (w.toDouble / s.toDouble) - 84.6 * (y.toDouble / w.toDouble)
    assert(got == Seq(("a", 1L, 7L, 3L, 7L, fre(7, 3, 7)),
      ("b", 1L, 3L, 1L, 4L, fre(3, 1, 4))), s"$got")
  }

  test("NormalDist.twoSidedP: anchors, cap, symmetry, monotone tail") {
    import spark.implicits._
    import graft.functions.NormalDist
    val zs = Seq(0.0, 0.5, -0.5, 1.0, 1.959964, -1.959964, 3.0).toDF("z")
    val ps = zs.select(col("z"), NormalDist.twoSidedP(col("z")).as("p"))
      .as[(Double, Double)].collect().toMap
    assert(math.abs(ps(0.0) - 1.0) < 1e-8, s"p(0) within A&S error of 1: ${ps(0.0)}")
    assert(ps.values.forall(_ <= 1.0), "cap holds")
    assert(math.abs(ps(1.959964) - 0.05) < 1e-4, s"${ps(1.959964)}")
    assert(math.abs(ps(3.0) - 0.0027) < 1e-4, s"${ps(3.0)}")
    assert(ps(0.5) == ps(-0.5) && ps(1.959964) == ps(-1.959964), "two-sided symmetry")
    assert(ps(0.5) > ps(1.0) && ps(1.0) > ps(1.959964) && ps(1.959964) > ps(3.0))
  }
}
