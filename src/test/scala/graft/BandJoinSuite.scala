package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftBandJoin

/** The native keyed band join (every right row within
  * [leftTs+lower, leftTs+upper] per key) — the second rung of the as-of
  * extension ladder. Held equal to a brute-force inequality join on
  * randomized collision-heavy data, across BOTH physical plans.
  */
class BandJoinSuite extends SparkSpec {

  private def leftDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("l_id", "l_key", "l_ts")
  }
  private def rightDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("r_id", "r_key", "r_ts")
  }

  test("B1: closed band, inclusive both edges, multiple matches per left row") {
    val l = leftDf(Seq((1L, "a", 100L), (2L, "a", 300L), (3L, "b", 100L)))
    val r = rightDf(Seq(
      (10L, "a", 94L),  // below 100-5 -> no
      (11L, "a", 95L),  // == lower edge of l1 -> yes
      (12L, "a", 105L), // == upper edge of l1 -> yes
      (13L, "a", 106L), // above -> no for l1, below l2's band -> no
      (14L, "a", 295L), (15L, "a", 305L), // both edges of l2
      (16L, "b", 100L), // exact ts for l3
      (17L, "c", 100L))) // no left key
    val out = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", lower = -5L, upper = 5L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 11L), (1L, 12L), (2L, 14L), (2L, 15L), (3L, 16L)))
  }

  test("B2: asymmetric band (only lookback), outer keeps unmatched, nulls never match") {
    import spark.implicits._
    val l = Seq((1L, Option("a"), Option(100L)), (2L, Option("a"), Option(500L)),
        (3L, None: Option[String], Option(100L)), (4L, Option("a"), None: Option[Long]))
      .toDF("l_id", "l_key", "l_ts")
    val r = Seq((10L, Option("a"), Option(95L)), (11L, Option("a"), Option(101L)),
        (12L, Option("a"), None: Option[Long]), (13L, None: Option[String], Option(100L)))
      .toDF("r_id", "r_key", "r_ts")
    // band [-10, 0]: lookback only — r10@95 matches l1@100; r11@101 does not
    val out = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", lower = -10L, upper = 0L, outer = true)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, -1L), (3L, -1L), (4L, -1L)))
    val inner = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
      "l_ts", "r_ts", lower = -10L, upper = 0L)
      .select("l_id").collect().map(_.getLong(0)).toSeq
    assert(inner == Seq(1L))
  }

  test("B3: randomized parity with the brute-force inequality join, both physical plans") {
    val rnd = new scala.util.Random(7)
    // tiny domains force band overlaps, ts ties, multi-match fan-out,
    // keys empty on either side
    val l = leftDf((1L to 500L).map(i => (i, "k" + rnd.nextInt(10), rnd.nextInt(60).toLong)))
    val r = rightDf((1L to 500L).map(i => (i, "k" + rnd.nextInt(12), rnd.nextInt(60).toLong)))
    val brute = l.join(r, col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") - 7L && col("r_ts") <= col("l_ts") + 3L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    def native(b: Boolean) = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", lower = -7L, upper = 3L, broadcast = Some(b))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    val merge = native(false)
    val bcast = native(true)
    assert(merge.toSet == brute, s"merge: ${merge.size} vs brute ${brute.size}")
    assert(bcast.toSet == brute, s"broadcast: ${bcast.size} vs brute ${brute.size}")
    // multiplicities too, not just the set: a band join is a bag join
    assert(merge.sorted.toSeq == bcast.sorted.toSeq)
    assert(merge.length == brute.size, "native must not duplicate pairs")
  }

  test("B4: plan shape — merge exec with co-partitioning, no explode; broadcast keeps left narrow") {
    val l = leftDf((1L to 50L).map(i => (i, "k" + i % 5, i * 10L)))
    val r = rightDf((1L to 50L).map(i => (i, "k" + i % 5, i * 10L + 3)))
    val mergePlan = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
      "l_ts", "r_ts", -20L, 20L, broadcast = Some(false))
      .queryExecution.executedPlan.toString
    assert(mergePlan.contains("BandMergeJoin"), mergePlan)
    assert(mergePlan.contains("Exchange hashpartitioning"), mergePlan)
    assert(!mergePlan.contains("Generate"), "the native exec must not explode bins:\n" + mergePlan)
    assert(!mergePlan.contains("CartesianProduct") && !mergePlan.contains("BroadcastNestedLoop"),
      mergePlan)
    val bcastPlan = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
      "l_ts", "r_ts", -20L, 20L, broadcast = Some(true))
      .queryExecution.executedPlan.toString
    assert(bcastPlan.contains("BroadcastBandJoin"), bcastPlan)
    // exactly one exchange — the broadcast of the right; the left is narrow
    assert(!bcastPlan.contains("Exchange hashpartitioning"),
      "broadcast variant must not shuffle the left:\n" + bcastPlan)
    // the merge exec DECLARES its (keys, ts) output order + key
    // partitioning, so a window over the same (key, ts) plans with only
    // the two child sorts — no redundant SortExec above the join
    import org.apache.spark.sql.expressions.Window
    val windowed = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", -20L, 20L, broadcast = Some(false))
      .withColumn("rn", row_number().over(
        Window.partitionBy("l_key").orderBy("l_ts")))
      .queryExecution.executedPlan.toString
    assert(windowed.split("\\bSort \\[").length - 1 == 2,
      "window over the join's own order must reuse it (2 child sorts only):\n" + windowed)
  }

  test("B5: band buffer — rows shared across overlapping left bands, eviction on advance") {
    // one key, left ts ascending; right rows must re-match across
    // multiple left rows (the ring buffer serves them repeatedly) and
    // evict exactly when the lower edge passes them
    val l = leftDf(Seq((1L, "k", 10L), (2L, "k", 12L), (3L, "k", 20L)))
    val r = rightDf(Seq((10L, "k", 9L), (11L, "k", 11L), (12L, "k", 13L), (13L, "k", 18L)))
    val out = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", lower = -2L, upper = 2L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // l1@10: band [8,12] -> r10,r11; l2@12: band [10,14] -> r11,r12 (r10 evicted);
    // l3@20: band [18,22] -> r13
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L)))
  }

  test("B6: loud guards — non-long ts, empty band, key type mismatch, self-join attrs") {
    val l = leftDf(Seq((1L, "a", 1L)))
    val r = rightDf(Seq((1L, "a", 1L)))
    intercept[IllegalArgumentException] { // empty band
      GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"), "l_ts", "r_ts", 5L, -5L)
    }
    intercept[IllegalArgumentException] { // non-long ts
      GraftBandJoin.bandJoinMerge(l.withColumn("l_d", col("l_ts").cast("double")), r,
        Seq("l_key"), Seq("r_key"), "l_d", "r_ts", -1L, 1L)
    }
    intercept[IllegalArgumentException] { // key type mismatch
      GraftBandJoin.bandJoinMerge(l.withColumn("l_k2", lit(1)), r.withColumn("r_k2", lit(1L)),
        Seq("l_k2"), Seq("r_k2"), "l_ts", "r_ts", -1L, 1L)
    }
    intercept[IllegalArgumentException] { // float keys: -0.0/NaN equality hazard
      GraftBandJoin.bandJoinMerge(
        l.withColumn("l_k2", lit(0.0)), r.withColumn("r_k2", lit(-0.0)),
        Seq("l_k2"), Seq("r_k2"), "l_ts", "r_ts", -1L, 1L)
    }
    intercept[IllegalArgumentException] { // shared attributes (unaliased self-join)
      GraftBandJoin.bandJoinMerge(l, l, Seq("l_key"), Seq("l_key"), "l_ts", "l_ts", -1L, 1L)
    }
  }

  test("B7: band occupancy cap fails loud on a cross-join-shaped key, never OOMs") {
    // one key, 100 right rows all inside every left band: occupancy 100
    // exceeds maxBandRows=10 -> the buffer guard must throw with the knobs
    val l = leftDf(Seq((1L, "k", 100L)))
    val r = rightDf((1L to 100L).map(i => (i, "k", 100L + i % 3)))
    val e = intercept[Exception] {
      GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", -50L, 50L, broadcast = Some(false), maxBandRows = 10)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).mkString(" | ").contains("maxBandRows"), msgs(e).mkString(" | "))
    // and the same data passes under the default cap
    val n = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
      "l_ts", "r_ts", -50L, 50L, broadcast = Some(false)).count()
    assert(n == 100L)
  }

  test("B8: extreme band edges saturate, never wrap — both physical plans") {
    // satAdd unit behavior first
    assert(GraftBandJoin.satAdd(Long.MaxValue - 1, 10L) == Long.MaxValue)
    assert(GraftBandJoin.satAdd(Long.MinValue + 1, -10L) == Long.MinValue)
    assert(GraftBandJoin.satAdd(5L, 7L) == 12L)
    assert(GraftBandJoin.satAdd(-5L, 3L) == -2L)
    // upper near Long.MaxValue: lts+hi would wrap NEGATIVE under raw
    // addition, excluding everything; saturation means "band open above"
    // and every same-key right row at ts >= lts+lower matches
    val l = leftDf(Seq((1L, "k", 100L)))
    val r = rightDf(Seq((10L, "k", 50L), (11L, "k", 100L), (12L, "k", Long.MaxValue - 1)))
    for (bc <- Seq(Some(false), Some(true))) {
      val out = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
          "l_ts", "r_ts", lower = 0L, upper = Long.MaxValue - 10, broadcast = bc)
        .select("r_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(11L, 12L), s"broadcast=$bc: $out")
      // and a lower edge past Long.MinValue saturates to an open-below band
      val all = GraftBandJoin.bandJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
          "l_ts", "r_ts", lower = Long.MinValue + 10, upper = Long.MaxValue - 10,
          broadcast = bc)
        .select("r_id").collect().map(_.getLong(0)).toSet
      assert(all == Set(10L, 11L, 12L), s"broadcast=$bc: $all")
    }
  }
}
