package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftIntervalJoin

/** The native keyed interval-overlap join (every right interval
  * intersecting the left's closed span, per key) — the third rung of
  * the as-of → band extension ladder. Held equal to a brute-force
  * inequality join on randomized collision-heavy data, across BOTH
  * physical plans.
  */
class IntervalJoinSuite extends SparkSpec {

  private def leftDf(rows: Seq[(Long, String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("l_id", "l_key", "l_s", "l_e")
  }
  private def rightDf(rows: Seq[(Long, String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("r_id", "r_key", "r_s", "r_e")
  }
  private def native(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      bc: Boolean, outer: Boolean = false, maxActive: Int = GraftIntervalJoin.DefaultMaxActiveRows) =
    GraftIntervalJoin.intervalJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
      "l_s", "l_e", "r_s", "r_e", outer = outer, broadcast = Some(bc),
      maxActiveRows = maxActive)

  test("I1: closed intervals — meets, contains, contained, disjoint, point intervals") {
    val l = leftDf(Seq(
      (1L, "a", 100L, 200L),
      (2L, "a", 300L, 300L), // point interval
      (3L, "b", 100L, 200L)))
    val r = rightDf(Seq(
      (10L, "a", 50L, 99L),   // ends just before l1 -> no
      (11L, "a", 50L, 100L),  // meets l1 at its start -> yes
      (12L, "a", 150L, 160L), // inside l1 -> yes
      (13L, "a", 90L, 250L),  // contains l1 -> yes
      (14L, "a", 200L, 400L), // meets l1 at its end; spans l2 -> yes, yes
      (15L, "a", 301L, 310L), // just after l2 -> no
      (16L, "b", 199L, 210L), // overlaps l3 tail -> yes
      (17L, "c", 100L, 200L))) // no left key
    for (bc <- Seq(false, true)) {
      val out = native(l, r, bc)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(out == Set((1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
        (2L, 14L), (3L, 16L)), s"broadcast=$bc: $out")
    }
  }

  test("I2: outer keeps unmatched lefts; null keys/bounds never match") {
    import spark.implicits._
    val l = Seq(
      (1L, Option("a"), Option(100L), Option(200L)),
      (2L, Option("a"), Option(900L), Option(950L)), // no overlap
      (3L, None: Option[String], Option(100L), Option(200L)),
      (4L, Option("a"), None: Option[Long], Option(200L)))
      .toDF("l_id", "l_key", "l_s", "l_e")
    val r = Seq(
      (10L, Option("a"), Option(150L), Option(250L)),
      (11L, Option("a"), Option(120L), None: Option[Long]),
      (12L, None: Option[String], Option(100L), Option(200L)))
      .toDF("r_id", "r_key", "r_s", "r_e")
    for (bc <- Seq(false, true)) {
      val out = native(l, r, bc, outer = true)
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      assert(out == Set((1L, 10L), (2L, -1L), (3L, -1L), (4L, -1L)), s"broadcast=$bc: $out")
      val inner = native(l, r, bc)
        .select("l_id").collect().map(_.getLong(0)).toSeq
      assert(inner == Seq(1L), s"broadcast=$bc")
    }
  }

  test("I3: randomized parity with the brute-force inequality join, both physical plans") {
    val rnd = new scala.util.Random(11)
    // tiny domains force dense overlap, containment both ways, shared
    // boundaries, keys empty on either side; ~half the intervals are
    // points, and ends are drawn INDEPENDENTLY of starts so left end is
    // non-monotone within a key (the case the active set must re-check)
    def mk(n: Int, keys: Int) = (1L to n.toLong).map { i =>
      val s = rnd.nextInt(60).toLong
      (i, "k" + rnd.nextInt(keys), s, s + rnd.nextInt(15).toLong)
    }
    val l = leftDf(mk(400, 10))
    val r = rightDf(mk(400, 12))
    val brute = l.join(r, col("l_key") === col("r_key") &&
        col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val merge = native(l, r, bc = false)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    val bcast = native(l, r, bc = true)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(merge.toSet == brute, s"merge: ${merge.length} vs brute ${brute.size}")
    assert(bcast.toSet == brute, s"broadcast: ${bcast.length} vs brute ${brute.size}")
    // multiplicities too: each overlapping pair exactly once, no dedup pass
    assert(merge.sorted.toSeq == bcast.sorted.toSeq)
    assert(merge.length == brute.size, "native must not duplicate pairs")
    // outer parity: matched pairs identical, plus exactly the unmatched lefts
    val lIds = l.select("l_id").collect().map(_.getLong(0)).toSet
    val unmatched = lIds -- brute.map(_._1)
    for (bc <- Seq(false, true)) {
      val outer = native(l, r, bc, outer = true)
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      assert(outer.filter(_._2 >= 0).toSet == brute, s"broadcast=$bc")
      assert(outer.filter(_._2 < 0).map(_._1).toSet == unmatched, s"broadcast=$bc")
      assert(outer.length == brute.size + unmatched.size, s"broadcast=$bc")
    }
  }

  test("I4: plan shape — merge exec co-partitioned, NO grid explode; broadcast keeps left narrow") {
    val l = leftDf((1L to 50L).map(i => (i, "k" + i % 5, i * 10L, i * 10L + 15)))
    val r = rightDf((1L to 50L).map(i => (i, "k" + i % 5, i * 10L + 3, i * 10L + 9)))
    val mergePlan = native(l, r, bc = false).queryExecution.executedPlan.toString
    assert(mergePlan.contains("IntervalMergeJoin"), mergePlan)
    assert(mergePlan.contains("Exchange hashpartitioning"), mergePlan)
    // the whole point vs the grid-cell composition: no Generate (explode)
    assert(!mergePlan.contains("Generate"), "the native exec must not explode cells:\n" + mergePlan)
    assert(!mergePlan.contains("CartesianProduct") && !mergePlan.contains("BroadcastNestedLoop"),
      mergePlan)
    val bcastPlan = native(l, r, bc = true).queryExecution.executedPlan.toString
    assert(bcastPlan.contains("BroadcastIntervalJoin"), bcastPlan)
    assert(!bcastPlan.contains("Exchange hashpartitioning"),
      "broadcast variant must not shuffle the left:\n" + bcastPlan)
    assert(!bcastPlan.contains("Generate"), bcastPlan)
  }

  test("I5: active set — non-monotone left ends re-checked, eviction is final") {
    // one key; left sorted by start, but l2 has a SHORTER end than l1:
    // r12 (start 40) enters the active set for l1 (end 50) and must NOT
    // match l2 (end 25); r10 dies before l3's start and must be evicted,
    // while r11 spans everything and re-matches all three lefts
    val l = leftDf(Seq((1L, "k", 10L, 50L), (2L, "k", 20L, 25L), (3L, "k", 30L, 45L)))
    val r = rightDf(Seq(
      (10L, "k", 5L, 22L),  // matches l1, l2; dead before l3 (evicted)
      (11L, "k", 0L, 100L), // matches all
      (12L, "k", 40L, 60L))) // matches l1, l3 — NOT l2 (starts after its end)
    for (bc <- Seq(false, true)) {
      val out = native(l, r, bc)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(out == Set((1L, 10L), (1L, 11L), (1L, 12L),
        (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L)), s"broadcast=$bc: $out")
    }
  }

  test("I6: loud guards — non-long bounds, key type mismatch, keyless, self-join attrs") {
    import spark.implicits._
    val l = leftDf(Seq((1L, "k", 1L, 2L)))
    val badBounds = Seq((1L, "k", 1.0, 2.0)).toDF("r_id", "r_key", "r_s", "r_e")
    intercept[IllegalArgumentException] {
      GraftIntervalJoin.intervalJoinMerge(l, badBounds, Seq("l_key"), Seq("r_key"),
        "l_s", "l_e", "r_s", "r_e")
    }
    val badKey = Seq((1L, 7L, 1L, 2L)).toDF("r_id", "r_key", "r_s", "r_e")
    intercept[IllegalArgumentException] {
      GraftIntervalJoin.intervalJoinMerge(l, badKey, Seq("l_key"), Seq("r_key"),
        "l_s", "l_e", "r_s", "r_e")
    }
    intercept[IllegalArgumentException] {
      GraftIntervalJoin.intervalJoinMerge(l, rightDf(Seq((1L, "k", 1L, 2L))),
        Nil, Nil, "l_s", "l_e", "r_s", "r_e")
    }
    intercept[IllegalArgumentException] {
      GraftIntervalJoin.intervalJoinMerge(l, l, Seq("l_key"), Seq("l_key"),
        "l_s", "l_e", "l_s", "l_e")
    }
  }

  test("I7: active-set occupancy cap fails loud on a cross-join-shaped key, never OOMs") {
    // one key, 100 right intervals all alive through every left span:
    // occupancy 100 exceeds maxActiveRows=10 -> the guard must throw
    val l = leftDf(Seq((1L, "k", 100L, 110L)))
    val r = rightDf((1L to 100L).map(i => (i, "k", 90L + i % 3, 200L)))
    val e = intercept[Exception] { native(l, r, bc = false, maxActive = 10).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).mkString(" | ").contains("maxActiveRows"), msgs(e).mkString(" | "))
    // and the same data passes under the default cap
    assert(native(l, r, bc = false).count() == 100L)
  }

  test("I9: the q97 registry query runs through the native exec — no grid explode anywhere") {
    val df = SparkEntry.queries("q97_interval_overlap")(spark, sfDir)
    df.limit(1).collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalMergeJoin") || plan.contains("BroadcastIntervalJoin"), plan)
    assert(!plan.contains("Generate"),
      "q97 must not pay the grid-cell explode now that the native exec exists:\n" + plan)
  }

  test("I8: extreme bounds near the Long range stay exact (no edge arithmetic to wrap)") {
    // the overlap predicate compares raw bounds (no lts+offset addition),
    // so Long extremes must work as-is on both plans
    val l = leftDf(Seq((1L, "k", Long.MinValue, 0L), (2L, "k", 1L, Long.MaxValue)))
    val r = rightDf(Seq((10L, "k", Long.MinValue, Long.MinValue + 5), (11L, "k", Long.MaxValue - 5, Long.MaxValue)))
    for (bc <- Seq(false, true)) {
      val out = native(l, r, bc)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(out == Set((1L, 10L), (2L, 11L)), s"broadcast=$bc: $out")
    }
  }
}
