package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling/split semantics beyond the oracle bindings. */
class SamplingSuite extends SparkSpec {

  test("split is deterministic, disjoint, exhaustive, and roughly proportional") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val a = Sampling.split(df, "id", splits).as[(Long, String)].collect().toMap
    val b = Sampling.split(df.repartition(7), "id", splits).as[(Long, String)].collect().toMap
    assert(a == b, "membership must not depend on run or partitioning")
    assert(a.size == 1000, "every row gets exactly one split")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("test") > 50)
  }

  test("sample is a subset consistent with the split buckets; salt decorrelates") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val s1 = Sampling.sample(df, "id", pct = 20, salt = "a:").as[Long].collect().toSet
    val s2 = Sampling.sample(df, "id", pct = 20, salt = "a:").as[Long].collect().toSet
    assert(s1 == s2, "same salt → same sample")
    assert(s1.size > 120 && s1.size < 280, s"~20% expected, got ${s1.size}")
    val other = Sampling.sample(df, "id", pct = 20, salt = "b:").as[Long].collect().toSet
    assert(other != s1, "a different salt draws a different sample")
    // nested fractions: a 10% sample with the same salt is inside the 20%
    val inner = Sampling.sample(df, "id", pct = 10, salt = "a:").as[Long].collect().toSet
    assert(inner.subsetOf(s1), "smaller pct with the same salt nests")
  }

  test("group-stable split: hashing an entity key keeps its rows together") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, i % 30)) // 30 users, 10 rows each
    val df = rows.toDF("row_id", "user_id")
    val got = Sampling.split(df, "user_id", Seq("train" -> 90, "test" -> 10))
      .select("user_id", "split").as[(Long, String)].collect().toSeq
    val perUser = got.groupBy(_._1).values
    assert(perUser.forall(_.map(_._2).distinct.size == 1),
      "all rows of a user must land in the same split — the leakage guard")
  }

  test("split validates weights") {
    import spark.implicits._
    val df = (1L to 10L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.split(df, "id", Seq("a" -> 50, "b" -> 40)) // sums to 90, not 100
    }
  }

  test("stratifiedSample: independent deterministic sample inside every stratum") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val got = Sampling.stratifiedSample(df, "id", "lang", pct = 20, salt = "s:")
      .as[(Long, String)].collect().toSeq
    val perStratum = got.groupBy(_._2).view.mapValues(_.size).toMap
    // every stratum sampled at ~20% of its own 1000 rows
    assert(perStratum.keySet == Set("lang0", "lang1", "lang2"))
    perStratum.values.foreach(n => assert(n > 120 && n < 280, s"~200 expected, got $n"))
    // deterministic, and decorrelated across strata: the id sets sampled
    // in different strata differ (the stratum salts the hash)
    val again = Sampling.stratifiedSample(df, "id", "lang", pct = 20, salt = "s:")
      .as[(Long, String)].collect().toSeq
    assert(got.toSet == again.toSet)
    val ids0 = got.filter(_._2 == "lang0").map(_._1 % 1000).toSet
    val ids1 = got.filter(_._2 == "lang1").map(_._1 % 1000).toSet
    assert(ids0 != ids1, "strata draw different hash sequences")
  }

  test("takePerGroup: exactly n per stratum, deterministic, small strata intact") {
    import spark.implicits._
    val df = ((1L to 900L).map(i => (i, s"g${i % 3}")) ++ Seq((1000L, "tiny"), (1001L, "tiny")))
      .toDF("id", "g").repartition(7)
    val got = Sampling.takePerGroup(df, "id", "g", n = 50, salt = "t:")
      .as[(Long, String)].collect().toSeq
    val byG = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(Seq("g0", "g1", "g2").forall(g => byG(g).size == 50), "exactly n per full stratum")
    assert(byG("tiny") == Set(1000L, 1001L), "strata smaller than n are kept whole")
    // deterministic across partitionings
    val again = Sampling.takePerGroup(df.repartition(3), "id", "g", n = 50, salt = "t:")
      .as[(Long, String)].collect().toSet
    assert(again == got.toSet)
    // a different salt draws a different balanced subset
    val other = Sampling.takePerGroup(df, "id", "g", n = 50, salt = "u:")
      .as[(Long, String)].collect().toSet
    assert(other != got.toSet)
  }

  test("packSequences: greedy budget fill, oversized docs, layout independence") {
    import spark.implicits._
    import graft.operators.Packing
    // one shard so the greedy order is fully predictable
    val docs = Seq(
      (1L, 40L), (2L, 50L), (3L, 20L),  // 40+50 fit a 100-budget; +20 overflows
      (4L, 250L),                       // oversized: its own pack
      (5L, 10L)
    ).toDF("doc_id", "n")
    val got = Packing.packSequences(docs, "doc_id", "n", budget = 100, shards = 1)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L), (2L, 0L, 0L, 1L),   // pack 0: 40+50 = 90
      (3L, 0L, 1L, 0L),                      // 90+20 > 100 -> pack 1
      (4L, 0L, 2L, 0L),                      // 20+250 > 100 -> pack 2 (oversized, alone)
      (5L, 0L, 3L, 0L)))                     // 250+10 > 100 -> pack 3
    // same packs regardless of input partitioning (hash shards + id order)
    val big = (1L to 2000L).map(i => (i, 1 + i % 97)).toDF("doc_id", "n")
    val a = Packing.packSequences(big.repartition(3), "doc_id", "n", 512, shards = 8)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.packSequences(big.repartition(17), "doc_id", "n", 512, shards = 8)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "packing is layout-independent")
    // every pack respects the budget unless it is a single oversized doc
    val byPack = a.map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).groupBy(_._1)
    val n = big.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byPack.values.foreach { members =>
      val tot = members.map(m => n(m._2)).sum
      assert(tot <= 512 || members.size == 1, s"overfull pack: $tot tokens")
    }
  }

  test("temperatureSample: alpha=1 no-op, smallest group intact, counts track n^alpha") {
    import spark.implicits._
    import graft.operators.Sampling
    // groups sized 100 / 400 / 1600 (16:4:1)
    val df = ((0 until 100).map(i => (i.toLong, "small")) ++
      (0 until 400).map(i => (1000L + i, "mid")) ++
      (0 until 1600).map(i => (10000L + i, "big"))).toDF("id", "grp")
    assert(Sampling.temperatureSample(df, "id", "grp", alpha = 1.0).count() == 2100,
      "alpha = 1 keeps everything")
    val kept = Sampling.temperatureSample(df, "id", "grp", alpha = 0.5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 100, "the smallest group is never downsampled")
    // expected kept: sqrt(nmin * n) = 200 (mid), 400 (big); hash noise ~ ±1/sqrt(n)
    assert(kept("mid") > 160 && kept("mid") < 240, s"mid kept ${kept("mid")} ~ 200")
    assert(kept("big") > 330 && kept("big") < 470, s"big kept ${kept("big")} ~ 400")
    // membership is permanent and layout-independent
    val a = Sampling.temperatureSample(df, "id", "grp", 0.5).select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(df.repartition(13), "id", "grp", 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("shuffleShards: partition of the input, dense per-shard positions, epoch decorrelation") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (0 until 800).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    val s1 = Sampling.shuffleShards(df, "id", shards = 8, salt = "ep1:")
      .select("id", "shard", "shard_pos").as[(Long, Long, Long)].collect()
    assert(s1.length == 800, "every row is assigned, none duplicated")
    assert(s1.map(_._2).toSet.subsetOf((0L until 8L).toSet))
    // positions are dense 0..n-1 within each shard
    s1.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // contiguous ids spread across shards (the scramble at work)
    val sizes = s1.groupBy(_._2).view.mapValues(_.length).values.toSeq
    assert(sizes.min > 50, s"shards roughly balanced: $sizes")
    // layout independence
    val s1b = Sampling.shuffleShards(df.repartition(11), "id", 8, "ep1:")
      .select("id", "shard", "shard_pos").as[(Long, Long, Long)].collect()
    assert(s1.sortBy(_._1).toSeq == s1b.sortBy(_._1).toSeq)
    // a new salt is a fresh, decorrelated epoch shuffle
    val s2 = Sampling.shuffleShards(df, "id", 8, "ep2:")
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val sameShard = s1.count(r => s2(r._1) == r._2)
    assert(sameShard < 300, s"epochs decorrelated: $sameShard/800 kept their shard")
  }

  test("dsirWeights: target-like docs outrank target-unlike docs") {
    import spark.implicits._
    // target distribution: documents about "spark catalyst plans"
    val target = (0 until 20).map(i => (100L + i, "spark catalyst plans optimize queries"))
      .toDF("id", "text")
    val raw = Seq(
      (1L, "spark catalyst plans optimize queries"), // exactly target-like
      (2L, "spark catalyst tungsten codegen"),       // partially target-like
      (3L, "bananas oranges apples grapes melons")   // disjoint from target
    ).toDF("id", "text")
    val got = Sampling.dsirWeights(raw, target, "id", "text")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    // n_feats = unigrams + bigrams = 2*len - 1
    assert(got.map(_._2) == Seq(9L, 7L, 9L))
    val w = got.map(r => r._1 -> r._3).toMap
    assert(w(1L) > w(2L), s"exact match outranks partial: $w")
    assert(w(2L) > w(3L), s"partial match outranks disjoint: $w")
    // selection is a plain deterministic top-k over the weights
    val top = Sampling.dsirWeights(raw, target, "id", "text")
      .orderBy(org.apache.spark.sql.functions.desc("logw"), $"id")
      .limit(2).select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L))
  }

  test("weightedTake: weight-monotone inclusion, determinism, guards") {
    import spark.implicits._
    // one row with overwhelming weight: ln(u)/w → ~0⁻, the maximum key —
    // it must be in every sample regardless of salt
    val df = (1 to 50).map(i => (i.toLong, if (i == 7) 1e9 else 1.0))
      .toDF("id", "w")
    for (salt <- Seq("", "s1", "s2")) {
      val ids = Sampling.weightedTake(df, "id", col("w"), n = 5, salt = salt)
        .select("id").as[Long].collect().toSet
      assert(ids.contains(7L), s"salt=$salt: $ids")
      assert(ids.size == 5)
    }
    // permanent: same salt → same set; fresh salt → decorrelated set
    val a1 = Sampling.weightedTake(df, "id", col("w"), 5, "e1")
      .select("id").as[Long].collect().toSet
    val a2 = Sampling.weightedTake(df, "id", col("w"), 5, "e1")
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedTake(df, "id", col("w"), 5, "e2")
      .select("id").as[Long].collect().toSet
    assert(a1 == a2)
    assert(a1 != b, "independent salts should draw different samples")
    // null / non-positive weights are excluded, and n caps the take
    val bad = Seq((1L, Some(0.0)), (2L, Some(-3.0)), (3L, None), (4L, Some(2.0)))
      .toDF("id", "w")
    val kept = Sampling.weightedTake(bad, "id", col("w"), 10)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(4L), s"$kept")
    // equal weights degrade to the unweighted hash order (u desc)
    val eq = Sampling.weightedTake(df.withColumn("w", col("w") * 0 + 1.0),
      "id", col("w"), 3, "q")
    val byHand = df.select(col("id"),
        Sampling.scrambledHash(col("id"), "q").as("h"))
      .orderBy(col("h").desc).limit(3).select("id").as[Long].collect().toSet
    assert(eq.select("id").as[Long].collect().toSet == byHand)
  }

  test("takeToBudget: crossing row kept, prefix in hash order, absent group drops, guards") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, if (i <= 20) "a" else "b", 10L + i % 7))
      .toDF("id", "grp", "w")
    val budgets = Map("a" -> 55L, "b" -> 1000000L)
    val got = Sampling.takeToBudget(df, "grp", "w", "id", budgets, salt = "m1")

    // group b: budget exceeds total weight -> contributes WHOLE
    assert(got.filter($"grp" === "b").count() == 20)

    // group a: kept set is exactly the scrambled-hash-order prefix whose
    // preceding cumulative weight < budget (crossing row kept)
    val orderedA = df.filter($"grp" === "a")
      .select($"id", $"w", Sampling.scrambledHash($"id", "m1").as("h"))
      .orderBy($"h", $"id").as[(Long, Long, Long)].collect()
    var cum = 0L
    val expectA = orderedA.takeWhile { case (_, w, _) =>
      val keep = cum < 55L; cum += w; keep
    }.map(_._1).toSet
    val gotA = got.filter($"grp" === "a").select("id").as[Long].collect().toSet
    assert(gotA == expectA)
    val keptW = orderedA.filter(r => expectA(r._1)).map(_._2).sum
    assert(keptW >= 55L, "a rich group must FILL its budget")
    assert(keptW - orderedA.filter(r => expectA(r._1)).map(_._2).last < 55L)

    // absent group drops entirely; null weights excluded
    val g2 = Sampling.takeToBudget(df, "grp", "w", "id", Map("a" -> 55L), salt = "m1")
    assert(g2.filter($"grp" === "b").count() == 0)
    val withNull = df.withColumn("w", when($"id" === 1L, lit(null)).otherwise($"w"))
    val g3 = Sampling.takeToBudget(withNull, "grp", "w", "id", budgets, salt = "m1")
    assert(!g3.filter($"grp" === "a").select("id").as[Long].collect().contains(1L))

    // layout independence + salt decorrelation
    val g4 = Sampling.takeToBudget(df.repartition(7), "grp", "w", "id", budgets, "m1")
      .select("id").as[Long].collect().toSet
    assert(g4 == got.select("id").as[Long].collect().toSet)
    val g5 = Sampling.takeToBudget(df, "grp", "w", "id", budgets, "m2")
      .filter($"grp" === "a").select("id").as[Long].collect().toSet
    assert(g5 != gotA, "a fresh salt draws a fresh prefix")

    // the bucket count is a pure task-sizing knob: membership invariant
    // (the scaladoc's "free to raise with corpus size" claim)
    val g6 = Sampling.takeToBudget(df, "grp", "w", "id", budgets, "m1",
      buckets = 7).select("id").as[Long].collect().toSet
    assert(g6 == got.select("id").as[Long].collect().toSet)

    intercept[IllegalArgumentException](
      Sampling.takeToBudget(df, "grp", "w", "id", Map.empty))
    intercept[IllegalArgumentException](
      Sampling.takeToBudget(df, "grp", "w", "id", Map("a" -> -1L)))
  }

  test("takeToBudget fails loud on a negative weight (no silent corpus shrink)") {
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, "a", if (i == 7) -3L else 5L))
      .toDF("id", "grp", "w")
    val e = intercept[Exception](
      Sampling.takeToBudget(df, "grp", "w", "id", Map("a" -> 20L)).count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("negative w")),
      s"expected the raise_error message, got: ${msgs(e).mkString(" | ")}")
  }

  test("takeToBudget plan: the corpus never enters a per-group sort") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Filter, Join, LeafNode, LogicalPlan, Window => LWindow}
    // file-backed source: over a LocalRelation the optimizer folds the
    // narrow admission filters away entirely (ConvertToLocalRelation),
    // hiding the very plan shape under test
    val pq = java.nio.file.Files.createTempDirectory("graft_ttb").toString
    (1L to 4000L).map(i => (i, s"src${i % 5}", 3L + i % 11))
      .toDF("id", "grp", "w").write.mode("overwrite").parquet(pq)
    val df = spark.read.parquet(pq)
    val out = Sampling.takeToBudget(df, "grp", "w", "id",
      (0 until 5).map(i => s"src$i" -> 200L).toMap, salt = "pl")
    val plan = out.queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.size == 1,
      s"exactly the boundary-bucket residual window, got ${windows.size}")
    // every root-to-leaf path under the residual Window must pass an
    // Aggregate (metadata beyond that point) or the boundary-bucket
    // restriction BEFORE reaching a source relation: the full corpus is
    // never the direct input of a per-group sort. After pushdown the
    // boundary filter reads `hash-bucket expr = element_at(<literal
    // boundary map>, group)` directly over the scan, so detect the
    // ElementAt lookup rather than the pre-optimization column name.
    import org.apache.spark.sql.catalyst.expressions.ElementAt
    def boundaryCond(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.exists(_.isInstanceOf[ElementAt])
    def guarded(node: LogicalPlan): Boolean = node match {
      case _: Aggregate => true
      case f: Filter if boundaryCond(f.condition) => true
      case j: Join if j.condition.exists(boundaryCond) => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        true // the literal budgets table — metadata, not the corpus
      case _: LeafNode => false
      case other => other.children.forall(guarded)
    }
    windows.foreach { w =>
      assert(guarded(w.child),
        s"window over unguarded corpus input:\n${w.treeString.take(2000)}")
    }
    // and the plan is still exact: boundary residual agrees with the
    // definitional per-group running sum
    val ordered = df.select($"id", $"w", $"grp",
        Sampling.scrambledHash($"id", "pl").as("h"))
      .as[(Long, Long, String, Long)].collect()
    val expect = (0 until 5).flatMap { g =>
      val rows = ordered.filter(_._3 == s"src$g").sortBy(r => (r._4, r._1))
      var cum = 0L
      rows.takeWhile { r => val k = cum < 200L; cum += r._2; k }.map(_._1)
    }.toSet
    assert(out.select("id").as[Long].collect().toSet == expect)
    // default-bucket residual bound: each group's boundary bucket holds
    // ~|group|/buckets rows (the scaladoc sizing formula at the 4096
    // default — here 800/4096 per group, so single digits with slack)
    val width = (graft.functions.TextFunctions.P + 4096 - 1) / 4096
    (0 until 5).foreach { g =>
      val rows = ordered.filter(_._3 == s"src$g").sortBy(r => (r._4, r._1))
      var cum = 0L
      val crossing = rows.find { r => cum += r._2; cum >= 200L }.get
      val bstar = crossing._4 / width
      val edgeRows = rows.count(_._4 / width == bstar)
      assert(edgeRows <= 8,
        s"src$g boundary bucket holds $edgeRows rows — residual task " +
          "unbounded vs the |group|/buckets sizing formula")
    }
  }

  test("epochMix: full copies exact, fractional epoch a salted subset, drops, guards") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val mix = Map("a" -> 2500L, "b" -> 1000L) // a: 2.5 epochs, b: exactly 1
    val got = Sampling.epochMix(df, "grp", "id", mix, salt = "e1").cache()

    // b at permille 1000: exactly one copy per row, epoch 0
    assert(got.filter($"grp" === "b").count() == 200)
    assert(got.filter($"grp" === "b" && $"epoch" =!= 0L).count() == 0)

    // a: epochs 0 and 1 are FULL copies; epoch 2 is the ~50% fractional draw
    val aByEpoch = got.filter($"grp" === "a").groupBy("epoch").count()
      .as[(Long, Long)].collect().toMap
    assert(aByEpoch(0L) == 200 && aByEpoch(1L) == 200)
    assert(aByEpoch(2L) > 60 && aByEpoch(2L) < 140, s"frac epoch drew ${aByEpoch(2L)}")

    // fractional membership is the exact permille rule, reproducible by hand
    val expectFrac = df.filter($"grp" === "a")
      .filter(Sampling.scrambledHash(
        concat(lit("ep"), lit(2L), lit(":"), $"id".cast("string")), "e1") % 1000L < 500L)
      .select("id").as[Long].collect().toSet
    val gotFrac = got.filter($"grp" === "a" && $"epoch" === 2L)
      .select("id").as[Long].collect().toSet
    assert(gotFrac == expectFrac)

    // successive fractional epochs of the same group are decorrelated draws
    val frac3 = Sampling.epochMix(df, "grp", "id", Map("a" -> 3500L), salt = "e1")
      .filter($"epoch" === 3L).select("id").as[Long].collect().toSet
    assert(frac3 != gotFrac, "epoch index must salt the fractional draw")

    // absent group drops; permille 0 drops explicitly; layout independence
    assert(Sampling.epochMix(df, "grp", "id", Map("a" -> 1000L), "e1")
      .filter($"grp" === "b").count() == 0)
    assert(Sampling.epochMix(df, "grp", "id", Map("a" -> 1000L, "b" -> 0L), "e1")
      .filter($"grp" === "b").count() == 0)
    val again = Sampling.epochMix(df.repartition(7), "grp", "id", mix, "e1")
      .select("id", "epoch").as[(Long, Long)].collect().toSet
    assert(again == got.select("id", "epoch").as[(Long, Long)].collect().toSet)

    intercept[IllegalArgumentException](Sampling.epochMix(df, "grp", "id", Map.empty))
    intercept[IllegalArgumentException](
      Sampling.epochMix(df, "grp", "id", Map("a" -> -1L)))
    got.unpersist()
  }

  test("annealMix: endpoint phases exact, interpolated rates, phase decorrelation, guards") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "up" else "dn"))
      .toDF("id", "grp")
    val start = Map("up" -> 100L, "dn" -> 1000L)
    val end = Map("up" -> 1000L, "dn" -> 100L)
    val got = Sampling.annealMix(df, "grp", "id", start, end, phases = 4, salt = "a1")
      .cache()

    // permille 1000 endpoints keep the WHOLE group; counts track the schedule
    val counts = got.groupBy("grp", "phase").count()
      .as[(String, Long, Long)].collect().map { case (g, p, n) => (g, p) -> n }.toMap
    assert(counts(("dn", 0L)) == 500, "permille 1000 start keeps every dn row")
    assert(counts(("up", 3L)) == 500, "permille 1000 end keeps every up row")
    // interpolated phases: (100·(3−k) + 1000·k)/3 ‰ of 500, within binomial noise
    for ((k, pm) <- Seq(1L -> 400L, 2L -> 700L)) {
      val exp = 500.0 * pm / 1000.0
      assert(math.abs(counts(("up", k)) - exp) < 70,
        s"up phase $k drew ${counts(("up", k))}, expected ~$exp")
    }

    // membership is the exact phase-salted permille rule, reproducible by hand
    val exp1 = df.filter($"grp" === "up")
      .filter(Sampling.scrambledHash(
        concat(lit("ph"), lit(1L), lit(":"), $"id".cast("string")), "a1") % 1000L < 400L)
      .select("id").as[Long].collect().toSet
    assert(got.filter($"grp" === "up" && $"phase" === 1L)
      .select("id").as[Long].collect().toSet == exp1)

    // a group annealing DOWN sheds a decorrelated subset, not a nested prefix
    val dn1 = got.filter($"grp" === "dn" && $"phase" === 1L)
      .select("id").as[Long].collect().toSet
    val dn2 = got.filter($"grp" === "dn" && $"phase" === 2L)
      .select("id").as[Long].collect().toSet
    assert(!dn1.subsetOf(dn2) && !dn2.subsetOf(dn1),
      "phase draws must be decorrelated, not nested")

    // absent group drops; layout independence
    assert(Sampling.annealMix(df, "grp", "id", Map("up" -> 500L),
      Map("up" -> 500L), 2, "a1").filter($"grp" === "dn").count() == 0)
    val again = Sampling.annealMix(df.repartition(7), "grp", "id", start, end, 4, "a1")
      .select("id", "phase").as[(Long, Long)].collect().toSet
    assert(again == got.select("id", "phase").as[(Long, Long)].collect().toSet)

    intercept[IllegalArgumentException](
      Sampling.annealMix(df, "grp", "id", start, end, phases = 1))
    intercept[IllegalArgumentException](
      Sampling.annealMix(df, "grp", "id", start, Map("up" -> 1L), 4))
    intercept[IllegalArgumentException](
      Sampling.annealMix(df, "grp", "id", Map("up" -> 1001L), Map("up" -> 0L), 4))
    got.unpersist()
  }

  test("epochMix/annealMix plans are shuffle-free: broadcast mix table, narrow membership") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val em = Sampling.epochMix(df, "grp", "id", Map("a" -> 2500L, "b" -> 1000L), "s")
    em.count() // finalize AQE
    assert(!collectAll(em.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"epochMix must not shuffle:\n${em.queryExecution.executedPlan}")
    val am = Sampling.annealMix(df, "grp", "id",
      Map("a" -> 1000L, "b" -> 400L), Map("a" -> 200L, "b" -> 800L), 4, "s")
    am.count()
    assert(!collectAll(am.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"annealMix must not shuffle:\n${am.queryExecution.executedPlan}")
  }

  test("domain-grouped split: one domain never straddles splits, and stays narrow") {
    import spark.implicits._
    import graft.operators.Url
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    // many pages per site across subdomains: every page of a registered
    // domain must land in ONE split (the leakage-safety contract)
    val df = (1L to 300L).map(i =>
      (i, s"https://${Seq("www", "cdn", "shop")((i % 3).toInt)}.site${i % 23}." +
        s"${if (i % 2 == 0) "com" else "co.uk"}/p/$i"))
      .toDF("id", "url")
      .withColumn("domain", Url.registeredDomain(col("url")))
    val got = Sampling.split(df, "domain",
      Seq("train" -> 90, "test" -> 10), salt = "ds:")
    val perDomain = got.groupBy("domain")
      .agg(countDistinct("split").as("n")).as[(String, Long)].collect()
    assert(perDomain.forall(_._2 == 1L),
      s"straddling domains: ${perDomain.filter(_._2 > 1).mkString(",")}")
    // 46 domains, both TLD families present, both splits used
    assert(perDomain.length == 46)
    assert(got.select("split").distinct().count() == 2)
    // subdomain never leaks into the key: no domain value carries one
    assert(got.where(col("domain").rlike("www|cdn|shop")).count() == 0)
    // assignment is narrow — no exchange
    assert(!collectAll(got.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"domain split must not shuffle:\n${got.queryExecution.executedPlan}")
  }

  test("poissonBootstrapMeanCI: CI brackets the mean, constant data collapses, layout-invariant") {
    import spark.implicits._
    import graft.operators.Sampling
    // two groups: a wide-spread one and a constant one
    val rows = (1L to 400L).map(i => ("w", i, (i % 37).toDouble * 3.0 + 10.0)) ++
      (1L to 50L).map(i => ("c", 1000L + i, 42.0))
    val df = rows.toDF("grp", "id", "x")
    val got = Sampling.poissonBootstrapMeanCI(df, Seq("grp"), "id", col("x"),
        b = 100)
      .as[(String, Long, Double, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, nw, mw, repsW, loW, hiW) = got("w")
    assert(nw == 400L && repsW == 100L)
    // a 95% percentile interval around a 400-row mean must bracket it
    assert(loW <= mw && mw <= hiW, s"CI [$loW, $hiW] must contain $mw")
    assert(loW < hiW, "wide-spread data has a non-degenerate interval")
    // the interval is a resampling interval, not the data range: for
    // n=400 the half-width must be well inside one population sd (~32)
    assert(hiW - loW < 32.0, s"implausibly wide bootstrap CI: ${hiW - loW}")
    // constant data: every replicate mean IS the constant — CI collapses
    val (_, nc, mc, _, loC, hiC) = got("c")
    assert(nc == 50L && mc == 42.0 && loC == 42.0 && hiC == 42.0)
    // determinism: identical output under a different layout
    val again = Sampling.poissonBootstrapMeanCI(df.repartition(13), Seq("grp"),
        "id", col("x"), b = 100)
      .as[(String, Long, Double, Long, Double, Double)].collect().toSet
    assert(again == got.values.toSet, "bootstrap must be layout-independent")
    intercept[IllegalArgumentException](
      Sampling.poissonBootstrapMeanCI(df, Seq("grp"), "id", col("x"), b = 1))
    intercept[IllegalArgumentException](
      Sampling.poissonBootstrapMeanCI(df, Seq("grp"), "id", col("x"),
        alphaPct = 600))
  }
}
