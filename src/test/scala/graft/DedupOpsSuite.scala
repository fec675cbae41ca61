package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Generic-surface behaviors of the dedup operators not covered by the
  * oracle queries (which bind numeric ids).
  */
class DedupOpsSuite extends SparkSpec {

  test("clusters ignores pair endpoints absent from the corpus") {
    import spark.implicits._
    // id 0 appears only in the pair set (e.g. pairs computed before a
    // filter pass): it must not become anyone's cluster label
    val all = Seq(1L, 2L, 3L).toDF("id")
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(all, "id", pairs)
      .orderBy("id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 1L, true), (2L, 2L, true), (3L, 2L, false)))
  }

  test("clusters works with string ids and finds components") {
    import spark.implicits._
    val all = Seq("a", "b", "c", "d", "e").toDF("id")
    val pairs = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("id_a", "id_b")
    val got = Dedup.clusters(all, "id", pairs)
      .orderBy("id").as[(String, String, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", "a", true), ("b", "a", false), ("c", "a", false),
      ("d", "d", true), ("e", "d", false)))
  }

  test("embeddingPairsLsh: subset of exact pairs; full recall on true dups") {
    import spark.implicits._
    // 20 base vectors + 5 exact duplicates (cos = 1.0 pairs MUST be found:
    // identical vectors collide in every band)
    val rnd = new scala.util.Random(11)
    val base = Seq.tabulate(20)(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val dups = base.take(5).map { case (i, v) => (100L + i, v.clone()) }
    val df = (base ++ dups).toDF("id", "vec")
    val lsh = Dedup.embeddingPairsLsh(df, "id", "vec", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingPairs(df, "id", "vec", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must never invent pairs")
    val dupPairs = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(dupPairs.subsetOf(lsh), "identical vectors collide in every band")
  }

  test("embeddingPairsLsh hot-bucket cap bounds a degenerate corpus") {
    import spark.implicits._
    // 100 identical vectors collide in EVERY band: one quadratic bucket.
    val df = Seq.tabulate(100)(i => (i.toLong, Array.fill(64)(0.5f))).toDF("id", "vec")
    val uncapped = Dedup.embeddingPairsLsh(df, "id", "vec", 0.9).count()
    assert(uncapped == 100L * 99 / 2) // default cap (1000) doesn't bind
    // a binding cap drops the hot buckets entirely (the d02/d04 DF-cap
    // contract: keys shared too widely carry no dedup signal)
    val capped = Dedup.embeddingPairsLsh(df, "id", "vec", 0.9, maxBandDf = 10).count()
    assert(capped == 0)
  }

  test("embeddingPairs guardrail refuses inputs past maxRows") {
    import spark.implicits._
    val df = Seq.tabulate(10)(i => (i.toLong, Array.fill(4)(1.0f))).toDF("id", "vec")
    val ex = intercept[IllegalArgumentException] {
      Dedup.embeddingPairs(df, "id", "vec", 0.5, maxRows = 5)
    }
    assert(ex.getMessage.contains("embeddingPairsLsh"))
    assert(Dedup.embeddingPairs(df, "id", "vec", 0.5, maxRows = 10).count() == 45)
  }

  test("clusters throws instead of silently truncating at maxRounds") {
    import spark.implicits._
    // a 5-node chain needs 4 propagation hops; 1 round cannot converge
    val all = (1 to 5).map(_.toLong).toDF("id")
    val pairs = (1 to 4).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.clusters(all, "id", pairs, maxRounds = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
    // and with enough rounds the same chain collapses to one component
    val ok = Dedup.clusters(all, "id", pairs, maxRounds = 10)
    assert(ok.filter(col("keep")).count() == 1)
  }

  test("ngramJaccardPairs: df cap is partial-agg + semi-join, never a window over the shingle stream") {
    import spark.implicits._
    val docs = (0 until 30).map(i =>
      (i.toLong, s"alpha beta gamma delta common$i words shared tail")).toDF("id", "text")
    val q = Dedup.ngramJaccardPairs(docs, "id", "text", thr = 0.1, maxDf = 5)
    // the hot-shingle cap must not buffer a boilerplate shingle's whole
    // group in one task: assert zero WindowExec anywhere in the plan
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val nodes = collectAll(q.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "df cap must be a partial-agg count + semi-join (q31/d15 discipline)")
    // semantics unchanged: boilerplate shingles (df > cap) contribute no
    // pairs; docs sharing a low-df shingle pair normally
    val pair = Dedup.ngramJaccardPairs(
      Seq((1L, "x y z unique one"), (2L, "x y z unique two")).toDF("id", "text"),
      "id", "text", thr = 0.1, maxDf = 5)
      .as[(Long, Long, Double)].collect()
    assert(pair.length == 1 && pair.head._1 == 1L && pair.head._2 == 2L)
  }

  test("simhash/contamination/embedding df caps: bounded map-side, never a count window") {
    import spark.implicits._
    // the r11 verdict's four count-window sites, minus annLsh (its spec
    // lives in SimilarityOpsSuite): each capped plan must contain ZERO
    // WindowExec — a count window over the capped key buffers the whole
    // hot group in one task before the filter can drop it. The caps are
    // the bounded-collect aggregate (d04/d05 — hot keys collapse
    // map-side at <= cap+1 members per task) or the d02 partial-agg +
    // semi-join (contamination's shingle stream is too wide to collect).
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    def assertNoWindow(df: org.apache.spark.sql.DataFrame, site: String): Unit =
      assert(!collectAll(df.queryExecution.executedPlan)
          .exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
        s"$site: df cap must be a partial-agg count + semi-join (d02 discipline)")
    val docs = (0 until 20).map(i => (i.toLong, s"alpha beta gamma delta shared tail $i")).toDF("id", "text")
    val vecs = (0 until 20).map(i => (i.toLong, Seq.tabulate(8)(d => (i * 8 + d).toFloat / 160f))).toDF("id", "vec")
    assertNoWindow(Dedup.simhashPairs(docs, "id", "text", maxChunkDf = 5), "simhashPairs")
    assertNoWindow(Dedup.embeddingPairsLsh(vecs, "id", "vec", 0.9, maxBandDf = 5), "embeddingPairsLsh")
    // contaminationPairs (r13) caps df with ONE count window ABOVE the
    // broadcast test-membership prune — the q31 one-exchange trade: the
    // windowed stream is the te-matched sliver, and a hot shingle's
    // occurrences were already co-located by the old semi-join probe, so
    // the skew profile is unchanged while the train shingling runs once.
    // Pin the shape: the window's subtree must contain the broadcast
    // membership join (window AFTER prune, never over the raw stream).
    val contam = Dedup.contaminationPairs(docs, docs.limit(2), "id", "text",
      minOverlap = 1, maxDf = 5)
    val cNodes = collectAll(contam.queryExecution.executedPlan)
    val win = cNodes.collectFirst {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(win.isDefined, "contaminationPairs: df cap must be the one-exchange count window")
    assert(collectAll(win.get).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "contaminationPairs: the count window must sit above the broadcast " +
        "test-membership prune, never over the raw train shingle stream")
  }

  test("duplicate-id inputs never self-pair (simhash + embedding LSH)") {
    import spark.implicits._
    // a batch re-ingested before exact dedup: id 7 appears twice. The
    // positional i<j enumeration over a collected bucket would pair the
    // two copies — the explicit id_a != id_b filter must drop that, the
    // old self-join's a < b contract.
    val docs = Seq(
      (7L, "alpha beta gamma delta epsilon shared tail words"),
      (7L, "alpha beta gamma delta epsilon shared tail words"),
      (9L, "alpha beta gamma delta epsilon shared tail words")
    ).toDF("id", "text")
    val sp = Dedup.simhashPairs(docs, "id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(!sp.contains((7L, 7L)), sp.toString)
    assert(sp.toSet == Set((7L, 9L)), sp.toString)
    val vecs = Seq(
      (7L, Seq.tabulate(8)(_.toFloat / 8f)),
      (7L, Seq.tabulate(8)(_.toFloat / 8f)),
      (9L, Seq.tabulate(8)(_.toFloat / 8f))
    ).toDF("id", "vec")
    val ep = Dedup.embeddingPairsLsh(vecs, "id", "vec", thr = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(!ep.contains((7L, 7L)), ep.toString)
    assert(ep.toSet == Set((7L, 9L)), ep.toString)
  }

  test("contaminationPairs flags train docs overlapping test docs; cap drops boilerplate") {
    import spark.implicits._
    // tokens are 3-gram shingled, so overlap = shared distinct 3-grams
    val test = Seq((100L, "the quick brown fox jumps over the lazy dog today")).toDF("id", "text")
    val train = Seq(
      (1L, "intro words then the quick brown fox jumps over the lazy dog today"), // contains the test passage
      (2L, "quick brown fox something else entirely different here now"),          // 1 shared shingle
      (3L, "completely unrelated text with no shared phrases at all ok")
    ).toDF("id", "text")
    val got = Dedup.contaminationPairs(train, test, "id", "text",
        minOverlap = 5, maxDf = 100)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(x => (x._1, x._2)) == Seq((1L, 100L)),
      "only the doc embedding the test passage is contaminated")
    assert(got.head._3 >= 5)
    // a binding train-side DF cap removes ubiquitous (boilerplate) shingles
    val boiler = (1L to 50L).map(i => (i, s"the quick brown fox jumps over the lazy dog today"))
      .toDF("id", "text")
    val capped = Dedup.contaminationPairs(boiler, test, "id", "text",
      minOverlap = 1, maxDf = 10)
    assert(capped.count() == 0, "shingles in >maxDf train docs carry no signal")
  }

  test("incrementalMinhashPairs: new pairs only, existing×existing excluded, new×new once") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    def nearDup(tag: String) = s"$base extra$tag"
    // 1≈2 both NEW; 3 (new) ≈ 4 (existing); 5≈6 both EXISTING
    val newDf = Seq((1L, nearDup("a")), (2L, nearDup("b")), (3L, nearDup("c")),
      (7L, "totally different content with nothing shared at all here now ok fine"))
      .toDF("id", "text")
    val exDf = Seq((4L, nearDup("d")), (5L, nearDup("e")), (6L, nearDup("f")))
      .toDF("id", "text")
    val got = Dedup.incrementalMinhashPairs(newDf, exDf, "id", "text", thr = 0.5)
      .select("new_id", "other_id").as[(Long, Long)].collect().toSet
    // every pair touches a new doc; new ids are 1, 2, 3, 7
    assert(got.forall { case (n, _) => Set(1L, 2L, 3L, 7L).contains(n) })
    assert(!got.contains((5L, 6L)) && !got.contains((6L, 5L)),
      "existing×existing pairs are structurally excluded")
    assert(got.contains((1L, 2L)) && !got.contains((2L, 1L)), "new×new appears once, ordered")
    // all near-dups of the new docs are found (vs both corpora)
    assert(got == Set((1L, 2L), (1L, 4L), (1L, 5L), (1L, 6L), (2L, 4L), (2L, 5L), (2L, 6L),
      (2L, 3L), (1L, 3L), (3L, 4L), (3L, 5L), (3L, 6L)))
    // overlapping id spaces are rejected (ambiguous verify + suppressed self-pair)
    val clash = intercept[IllegalArgumentException] {
      Dedup.incrementalMinhashPairs(newDf, newDf.limit(1), "id", "text", 0.5)
    }
    assert(clash.getMessage.contains("disjoint"))
  }

  test("decontaminate removes exactly the flagged train docs") {
    import spark.implicits._
    val test = Seq((100L, "the quick brown fox jumps over the lazy dog today")).toDF("id", "text")
    val train = Seq(
      (1L, "intro words then the quick brown fox jumps over the lazy dog today"),
      (2L, "quick brown fox something else entirely different here now"),
      (3L, "completely unrelated text with no shared phrases at all ok")
    ).toDF("id", "text")
    val clean = Dedup.decontaminate(train, test, "id", "text", minOverlap = 5)
    assert(clean.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(clean.columns.toSeq == train.columns.toSeq, "schema passes through")
  }

  test("repetitionStats: exact fractions on known token patterns") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a a a a"),        // 4 tokens, 1 distinct; bigrams: 3 total 1 distinct
      (2L, "a b c d"),        // no repetition
      (3L, "x")               // single token: no bigrams
    ).toDF("id", "text")
    val got = TextAnalysis.repetitionStats(df, "id", "text")
      .orderBy("id").as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0.75, 0.6667, 1.0), // bigrams "a a"×3 -> (3-1)/3 rounded
      (2L, 4L, 0.0, 0.0, 0.25),
      (3L, 1L, 0.0, 0.0, 1.0)))
  }

  test("longestDupSpans: doubling ladder witnesses exact power-of-2 span lengths") {
    import spark.implicits._
    // docs 1 and 2 share an identical 16-token prefix, then diverge:
    // duplicated 8-spans at starts 0..8 of the prefix, a duplicated
    // 16-span at start 0, and NOTHING at 32 (the docs are 20 tokens).
    val shared = (1 to 16).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, shared + " p q r s"),
      (2L, shared + " t u v w"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10") // no duplicates anywhere
    ).toDF("id", "text")
    val got = graft.operators.Dedup.longestDupSpans(df, "id", "text", n = 8, doublings = 2)
      .orderBy("id", "span_len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // level 8: starts 0..8 of the shared prefix are pairwise-duplicated
    // (9 starts per doc); level 16: exactly start 0; level 32: absent
    assert(got == Seq(
      (1L, 8L, 9L, 0L), (1L, 16L, 1L, 0L),
      (2L, 8L, 9L, 0L), (2L, 16L, 1L, 0L)))
  }

  test("longestDupScrub: deepest-level coverage scrubs; clean docs pass through") {
    import spark.implicits._
    // same corpus as the witness spec: docs 1/2's deepest level is 16
    // (one span at start 0), so exactly the 16 shared prefix tokens drop
    // and the 4 unique tail tokens survive; doc 3 is untouched
    val shared = (1 to 16).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, shared + " p q r s"),
      (2L, shared + " t u v w"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    ).toDF("id", "text")
    val got = graft.operators.Dedup.longestDupScrub(df, "id", "text", n = 8, doublings = 2)
      .orderBy("id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 20L, 16L, 16L, "p q r s"),
      (2L, 20L, 16L, 16L, "t u v w"),
      (3L, 10L, 0L, 0L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")))
  }

  test("p18 invariant: the trained-curation gate keeps exactly the positive-margin eval docs") {
    import spark.implicits._
    import graft.operators.{Sampling, TextAnalysis}
    graft.functions.GraftExpressions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val isTr = Sampling.hashBucket(col("doc_id"), 100, "t30:") < 80
    val pos = TextAnalysis.qualityExpr(col("text")) >= 0.79
    val w = TextAnalysis.trainHashedPerceptron(docs.filter(isTr), "doc_id", "text",
      pos, dim = 1024, rounds = 8)
    // hashClassifier's mean-weight score and perceptronScores' raw margin
    // differ by the positive factor n_tokens, so the label gate must keep
    // EXACTLY the positive-margin docs — the t12 drop-in promise
    val viaT12 = TextAnalysis.hashClassifier(docs.filter(!isTr), "doc_id", "text",
        dim = 1024, weights = Some(w.withColumn("weight", col("weight").cast("double"))))
      .filter(col("label")).select("doc_id")
      .as[Long].collect().toSet
    val viaMargin = TextAnalysis.perceptronScores(docs.filter(!isTr), "doc_id", "text",
        pos, w, dim = 1024)
      .filter(col("score") > 0).select("doc_id")
      .as[Long].collect().toSet
    assert(viaT12 == viaMargin && viaT12.nonEmpty)
  }

  test("trainHashedPerceptron: dense profile path == sparse broadcast-join fallback, bit-for-bit") {
    import graft.operators.{Sampling, TextAnalysis}
    graft.functions.GraftExpressions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val isTr = Sampling.hashBucket(col("doc_id"), 100, "t30:") < 80
    val pos = TextAnalysis.qualityExpr(col("text")) >= 0.79
    def weights(denseDimMax: Int): Seq[(Long, Long)] =
      TextAnalysis.trainHashedPerceptron(docs.filter(isTr), "doc_id", "text",
          pos, dim = 256, rounds = 3, denseDimMax = denseDimMax)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dense = weights(denseDimMax = 1 << 16)
    val sparse = weights(denseDimMax = 0) // forces the > denseDimMax branch
    assert(dense == sparse && dense.nonEmpty)
  }

  test("trainHashedPerceptron: trained weights beat t12's deterministic default on eval AUC") {
    import graft.operators.{Relational, Sampling}
    graft.functions.GraftExpressions.register(spark) // hashBucket analyzes eagerly
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val isTr = Sampling.hashBucket(col("doc_id"), 100, "t30:") < 80
    val dim = 1024
    val pos = TextAnalysis.qualityExpr(col("text")) >= 0.79
    val w = TextAnalysis.trainHashedPerceptron(docs.filter(isTr), "doc_id", "text",
      pos, dim = dim, rounds = 8)
    def auc(df: org.apache.spark.sql.DataFrame, score: org.apache.spark.sql.Column,
        scale: Long): Double =
      Relational.aucScore(df.withColumn("_g", lit(1)), Seq("_g"), col("pos"),
        score, scale).head.getAs[Double]("auc")
    val trained = TextAnalysis.perceptronScores(docs.filter(!isTr), "doc_id", "text",
      pos, w, dim = dim)
    val aucTrained = auc(trained, col("score").cast("double"), 1L)
    val dflt = TextAnalysis.hashClassifier(docs.filter(!isTr), "doc_id", "text", dim = dim)
      .drop("n_tokens", "label")
      .join(docs.select(col("doc_id"), pos.as("pos")), "doc_id")
    val aucDefault = auc(dflt, col("score"), 1000000L)
    // the training loop must LEARN: clear separation over the untrained
    // hash table (whose weights are a deterministic pseudo-random draw)
    assert(aucTrained >= 0.85, s"trained AUC $aucTrained")
    assert(aucTrained > aucDefault + 0.2,
      s"trained $aucTrained vs default $aucDefault")
  }

  test("bigramLm: exact smoothed scores; short docs null; unseen floors") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // ref corpus: bigrams (a,b)x2, (b,a)x1; contexts a->2, b->1; V=2
    val ref = Seq((10L, "a b a b")).toDF("id", "text")
    val df = Seq(
      (1L, "a b"),   // seen: ln((2+1)/(2+2))
      (2L, "b a"),   // seen: ln((1+1)/(1+2))
      (3L, "a z"),   // unseen bigram, seen context: ln(1/(2+2))
      (4L, "z q"),   // unseen context: smoothing floor ln(1/(0+2))
      (5L, "x")      // single token: no bigrams -> null score
    ).toDF("id", "text")
    val got = TextAnalysis.bigramLm(df, "id", "text", ref = Some(ref))
      .orderBy("id")
      .select("id", "n_bigrams", "avg_logp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
    assert(got(0) == ((1L, 1L, Some(math.log(3.0 / 4)))))
    assert(got(1) == ((2L, 1L, Some(math.log(2.0 / 3)))))
    assert(got(2) == ((3L, 1L, Some(math.log(1.0 / 4)))))
    assert(got(3) == ((4L, 1L, Some(math.log(1.0 / 2)))))
    assert(got(4) == ((5L, 0L, None)))
    // self-trained scoring: every bigram seen, scores strictly negative
    val self = TextAnalysis.bigramLm(ref, "id", "text")
      .select("avg_logp").as[Double].collect()
    assert(self.length == 1 && self.head < 0)
  }

  test("backoffLm: all three stupid-backoff branches exact; short docs null") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // ref "a b c a b c": trigrams (a,b,c)x2 (b,c,a) (c,a,b); bigrams
    // (a,b)x2 (b,c)x2 (c,a); unigrams a,b,c = 2 each; N=6, V=3
    val ref = Seq((10L, "a b c a b c")).toDF("id", "text")
    val df = Seq(
      (1L, "a b c"), // seen trigram: ln(c123/c12) = ln(2/2) = 0
      (2L, "c b c"), // bigram backoff: (c,b,c) unseen, (b,c) seen -> ln(0.4*2/2)
      (3L, "b c b"), // unigram floor, in-vocab: c3(b)=2 -> ln(aa*3/9)
      (4L, "b c x"), // unigram floor, OOV: c3(x)=0 -> ln(aa*1/9)
      (5L, "x")      // under 3 tokens: no trigrams -> null score
    ).toDF("id", "text")
    val got = TextAnalysis.backoffLm(df, "id", "text", ref = Some(ref))
      .orderBy("id")
      .select("id", "n_trigrams", "avg_logp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
    val aa = 0.4 * 0.4
    assert(got(0) == ((1L, 1L, Some(0.0))), got(0).toString)
    assert(got(1)._3.exists(v => math.abs(v - math.log(0.4 * 2.0 / 2.0)) < 1e-12), got(1).toString)
    assert(got(2)._3.exists(v => math.abs(v - math.log(aa * 3.0 / 9.0)) < 1e-12), got(2).toString)
    assert(got(3)._3.exists(v => math.abs(v - math.log(aa * 1.0 / 9.0)) < 1e-12), got(3).toString)
    assert(got(4) == ((5L, 0L, None)), got(4).toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.backoffLm(df, "id", "text", alpha = 1.0)
    }
  }

  test("blocklist: token-exact hits, sorted distinct matched, keep gate, no substring trips") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "bad worse bad fine"), // bad x2 + worse -> 3 hits, matched sorted
      (2L, "clean text only"),    // zero hits -> keep
      (3L, "badge embedded"),     // substrings must NOT match the "bad" entry
      (4L, "")                    // empty text -> the "" token, not blocked
    ).toDF("id", "text")
    val got = TextAnalysis.blocklist(df, "id", "text", Seq("bad", "worse", "absent"))
      .orderBy("id").as[(Long, Long, String, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "bad,worse", false),
      (2L, 0L, "", true),
      (3L, 0L, "", true),
      (4L, 0L, "", true)), got.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklist(df, "id", "text", Nil)
    }
  }

  test("nearDedup ships the deduplicated corpus: canonical kept, dups dropped") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog today",
      "completely different content about spark and catalyst plans",
      "a third unrelated document mentioning shuffles and joins")
    // ids 10..12 originals; 20 is an exact copy of 10 (near-dup certain)
    val df = (texts.zipWithIndex.map { case (t, i) => (10L + i, t) } :+ (20L, texts.head))
      .toDF("id", "text")
    val out = Dedup.nearDedup(df, "id", "text", thr = 0.5)
      .select("id").as[Long].collect().toSet
    assert(out == Set(10L, 11L, 12L), s"canonical min-id survives, copy dropped: $out")
  }

  test("nearDedupBest keeps the highest-ranked copy per cluster, not min id") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog today"
    val df = Seq(
      (10L, t, 0.2), (20L, t, 0.9),                       // dup cluster: 20 wins on rank
      (30L, "a completely different document entirely", 0.1)) // singleton survives
      .toDF("id", "text", "quality")
    val got = Dedup.nearDedupBest(df, "id", "text", thr = 0.5, rankCol = "quality")
      .select("id").as[Long].collect().toSet
    assert(got == Set(20L, 30L), s"rank beats min-id: $got")
    // rank ties fall back to min id (total, deterministic selection)
    val tied = Seq((10L, t, 0.5), (20L, t, 0.5)).toDF("id", "text", "quality")
    val g2 = Dedup.nearDedupBest(tied, "id", "text", 0.5, "quality")
      .select("id").as[Long].collect().toSet
    assert(g2 == Set(10L))
  }

  test("bloomSeen: no false negatives; novel rows mostly pass") {
    import spark.implicits._
    val ref = (0 until 100).map(i => (i.toLong, s"reference document number $i body"))
      .toDF("id", "text")
    val members = (0 until 50).map(i => (1000L + i, s"reference document number $i body"))
    val novel = (0 until 50).map(i => (2000L + i, s"brand new unseen text $i payload"))
    val got = Dedup.bloomSeen((members ++ novel).toDF("id", "text"), ref, "id", "text")
      .select("id", "probably_seen").as[(Long, Boolean)].collect().toMap
    // bloom contract: every true member IS flagged (no false negatives)
    assert(members.forall { case (id, _) => got(id) }, "false negative!")
    // false positives at ~1%: out of 50 novel docs, ~0 expected
    val fps = novel.count { case (id, _) => got(id) }
    assert(fps <= 5, s"implausible false-positive rate: $fps/50")
  }

  test("bloom gate + exact backstop equals the plain anti-join even at fpp=0.5") {
    import spark.implicits._
    // the d11 composition: definite-novel (unflagged) ∪ backstop-confirmed
    // (flagged minus true members) must equal the exact anti-join for ANY
    // false-positive rate — fpp=0.5 floods the backstop with FPs on purpose
    val ref = (0 until 200).map(i => (i.toLong, s"member $i")).toDF("id", "text")
    val inc = (150 until 350).map(i => (10000L + i, s"member $i")).toDF("id", "text")
    val gated = Dedup.bloomSeen(inc, ref, "id", "text", fpp = 0.5)
    val definite = gated.filter(!col("probably_seen")).select("id")
    val confirmed = gated.filter(col("probably_seen"))
      .join(ref.select("text"), Seq("text"), "left_anti").select("id")
    val got = definite.unionAll(confirmed).as[Long].collect().sorted.toSeq
    val exact = inc.join(ref.select("text"), Seq("text"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == exact && exact == (10200L until 10350L).toSeq, s"${got.size} vs ${exact.size}")
  }

  test("frontierNovel equals the plain anti-join at any fpp; columns intact") {
    import spark.implicits._
    // the packaged d11 composition for crawl frontiers: candidates keep
    // ALL their columns, and the result is EXACTLY candidates ∖ crawled
    // no matter how hard the bloom floods the backstop
    val crawled = (0 until 300).map(i => s"https://h${i % 7}.test/p$i").toDF("url")
    val cand = (200 until 500)
      .map(i => (s"https://h${i % 7}.test/p$i", i.toLong, s"h${i % 7}.test"))
      .toDF("url", "prio", "host")
    val exact = cand.join(crawled, Seq("url"), "left_anti")
      .as[(String, Long, String)].collect().sortBy(_._2).toSeq
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Dedup.frontierNovel(cand, crawled, "url", fpp = fpp)
      assert(got.columns.toSeq == Seq("url", "prio", "host"))
      assert(got.as[(String, Long, String)].collect().sortBy(_._2).toSeq == exact,
        s"fpp=$fpp diverged from the anti-join")
    }
    // a duplicated ledger URL must not duplicate survivors (the distinct
    // inside the gate) and an empty ledger admits everything
    val dupLedger = crawled.unionAll(crawled)
    assert(Dedup.frontierNovel(cand, dupLedger, "url", fpp = 0.5).count() ==
      exact.size)
    assert(Dedup.frontierNovel(cand, crawled.limit(0), "url").count() == cand.count())
  }

  test("hashClassifier: supplied-weights path agrees with the derived table") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "delta"), (3L, "beta beta")).toDF("id", "text")
    val dim = 64
    // materialize the SAME derived weight formula as an explicit table —
    // the broadcast-join inference path must reproduce the narrow path
    val weights = (0 until dim).map { b =>
      (b.toLong, (((b + 1) * 2654435761L) % 1000000007L % 2001 - 1000) / 1000.0)
    }.toDF("bucket", "weight")
    val narrow = TextAnalysis.hashClassifier(df, "id", "text", dim)
      .orderBy("id").as[(Long, Long, Double, Boolean)].collect().toSeq
    val joined = TextAnalysis.hashClassifier(df, "id", "text", dim, Some(weights))
      .orderBy("id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(narrow == joined)
    assert(narrow.map(_._2) == Seq(3L, 1L, 2L)) // n_tokens
    // doc 3 is two copies of one token: score == that token's bucket weight
    val betaScore = narrow(2)._3
    assert(betaScore >= -1.0 && betaScore <= 1.0)
  }

  test("hashClassifier: buckets missing from a supplied table weigh zero") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val empty = Seq.empty[(Long, Double)].toDF("bucket", "weight")
    val got = TextAnalysis.hashClassifier(df, "id", "text", 64, Some(empty))
      .as[(Long, Long, Double, Boolean)].collect().head
    assert(got == ((1L, 3L, 0.0, false)))
  }

  test("bpeTrain learns the classic merges; encode counts subwords; early stop") {
    import spark.implicits._
    val df = Seq((1L, "low low low lower"), (2L, "lowest")).toDF("id", "text")
    // word freqs: low:3, lower:1, lowest:1. Pair counts round 1:
    // (l,o)=5, (o,w)=5 tie -> lexicographic; then (lo,w)=5; then
    // (low,e)=2; every remaining pair occurs once -> early stop.
    val merges = TextAnalysis.bpeTrain(df, "text", numMerges = 10)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(TextAnalysis.bpeSegment("lowly", merges) == Seq("low", "l", "y"))
    assert(TextAnalysis.bpeSegment("lowest", merges) == Seq("lowe", "s", "t"))
    val enc = TextAnalysis.bpeEncode(df, "id", "text", merges)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    // doc 1: low x3 (1 subword each) + lower = [lowe, r] -> 4 words, 5 subwords
    // doc 2: lowest = [lowe, s, t] -> 1 word, 3 subwords
    assert(enc == Seq((1L, 4L, 5L), (2L, 1L, 3L)))
  }

  test("bpeTrain merge batching: equivalent on overlap-free batches; chained divergence documented") {
    import spark.implicits._
    // OVERLAP-FREE corpus: words over pairwise-disjoint alphabets, so no
    // batch pair shares a symbol with another and no merged symbol chains
    // into a new competitive pair — batched must equal sequential exactly
    val free = Seq((1L, "ab ab ab ab ab cd cd cd cd ef ef ef gh gh")).toDF("id", "text")
    val seq1 = TextAnalysis.bpeTrain(free, "text", numMerges = 4) // batchSize = 1
    val seq4 = TextAnalysis.bpeTrain(free, "text", numMerges = 4, batchSize = 4)
    assert(seq1 == Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")))
    assert(seq4 == seq1, "symbol-disjoint batches must preserve the greedy order exactly")
    // CHAINED corpus (the documented divergence): sequentially, merging
    // (l,o) creates (lo,w)=5 which outranks (w,e)=2; a batched pass
    // cannot see the new pair until the next round, so it accepts the
    // symbol-disjoint (w,e) in pass 1 and the orders diverge. This pins
    // the scaladoc's divergence statement — batchSize=1 is the default
    // precisely because character BPE chains like this.
    val chained = Seq((1L, "low low low lower"), (2L, "lowest")).toDF("id", "text")
    val exact = TextAnalysis.bpeTrain(chained, "text", numMerges = 10)
    val batched = TextAnalysis.bpeTrain(chained, "text", numMerges = 10, batchSize = 8)
    assert(exact == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(batched.take(2) == Seq(("l", "o"), ("w", "e")),
      s"pass 1 accepts the disjoint runner-up before the chained pair exists: $batched")
    assert(batched != exact, "chained merges are WHERE batching diverges — by design")
    // overlap rule guards the concatenation too: two splits of one target
    // symbol never enter the same batch (second would double-create it)
    val conc = TextAnalysis.bpeTrain(
      Seq((1L, "xy xy xy zw zw")).toDF("id", "text"), "text",
      numMerges = 2, batchSize = 4)
    assert(conc == Seq(("x", "y"), ("z", "w")))
  }

  test("spanScrub removes exactly the tokens covered by duplicated windows") {
    import spark.implicits._
    // Docs 1 and 2 share the 4-token run "a b c d" (positions 1-4 in doc 1,
    // 0-3 in doc 2); every other token is unique corpus-wide.
    val df = Seq(
      (1L, "u1 a b c d u2 u3"),
      (2L, "a b c d v1 v2"),
      (3L, "w1 w2 w3 w4 w5")
    ).toDF("id", "text")
    val got = Dedup.spanScrub(df, "id", "text", n = 4, minCount = 2)
      .orderBy("id")
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, 7L, 4L, 0.5714, "u1 u2 u3"),
      (2L, 6L, 4L, 0.6667, "v1 v2"),
      (3L, 5L, 0L, 0.0, "w1 w2 w3 w4 w5")))
  }

  test("spanScrub: overlapping duplicated windows merge their coverage") {
    import spark.implicits._
    // Docs share a 5-token run; with n=4 two overlapping windows are
    // duplicated in each doc and their union covers all 5 positions.
    val df = Seq(
      (1L, "a b c d e x1"),
      (2L, "y1 a b c d e")
    ).toDF("id", "text")
    val got = Dedup.spanScrub(df, "id", "text", n = 4, minCount = 2)
      .orderBy("id")
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 5L, 0.8333, "x1"),
      (2L, 6L, 5L, 0.8333, "y1")))
  }

  test("spanScrub counts self-repeats within one document (paper semantics)") {
    import spark.implicits._
    // "a b c d" occurs twice inside doc 1 alone -> both occurrences scrubbed;
    // a fully-covered doc scrubs to the empty string.
    val df = Seq(
      (1L, "a b c d a b c d"),
      (2L, "z1 z2 z3 z4 z5")
    ).toDF("id", "text")
    val got = Dedup.spanScrub(df, "id", "text", n = 4, minCount = 2)
      .orderBy("id")
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, 8L, 8L, 1.0, ""),
      (2L, 5L, 0L, 0.0, "z1 z2 z3 z4 z5")))
  }

  test("spanScrub leaves documents shorter than the window untouched") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("id", "text")
    val got = Dedup.spanScrub(df, "id", "text", n = 4, minCount = 2)
      .orderBy("id")
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    // identical docs, but no length-4 window exists -> nothing flagged
    assert(got == Seq((1L, 3L, 0L, 0.0, "a b c"), (2L, 3L, 0L, 0.0, "a b c")))
  }

  test("chunkDocs: full coverage, exact overlap, short tail") {
    import spark.implicits._
    val text = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, text)).toDF("id", "text")
    val got = graft.operators.TextAnalysis.chunkDocs(df, "id", "text",
        chunkTokens = 4, overlap = 1) // step 3 -> starts 0,3,6,9
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 4L, "w1 w2 w3 w4"),
      (1L, 4L, "w4 w5 w6 w7"),   // w4 shared: overlap 1
      (2L, 4L, "w7 w8 w9 w10"),
      (3L, 1L, "w10")))          // short tail, never dropped
    // reconstruction: de-overlapped concat equals the original
    val rebuilt = got.map(_._3.split(" ").toSeq).reduce((a, b) => a ++ b.drop(1))
    assert(rebuilt.mkString(" ") == text)
  }

  test("lineDedup removes boilerplate lines from every doc; within-doc repeats survive") {
    import spark.implicits._
    val df = Seq(
      (1L, "follow us on social\nunique alpha\nfollow us on social"), // boiler ×2 within ONE doc
      (2L, "follow us on social\nunique beta"),
      (3L, "only here\nonly here too\n\nlast") // blank line never boilerplate
    ).toDF("id", "text")
    val got = Dedup.lineDedup(df, "id", "text", minDf = 2)
      .orderBy("id")
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    // "follow us on social" is in docs 1 AND 2 (df=2) -> removed everywhere,
    // including BOTH copies in doc 1; doc-3 lines are unique -> untouched
    assert(got == Seq(
      (1L, 3L, 2L, 0.6667, "unique alpha"),
      (2L, 2L, 1L, 0.5, "unique beta"),
      (3L, 4L, 0L, 0.0, "only here\nonly here too\n\nlast")))
  }

  test("lineDedup: a line repeated only within one doc is NOT boilerplate") {
    import spark.implicits._
    val df = Seq(
      (1L, "chorus line\nchorus line\nchorus line\nverse"),
      (2L, "something else")
    ).toDF("id", "text")
    val got = Dedup.lineDedup(df, "id", "text", minDf = 2)
      .orderBy("id").select("id", "dup_lines").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 0L)), "df counts DISTINCT docs, not occurrences")
  }

  test("lineDedup sep=' ' + minDfFrac prunes corpus-wide tokens, positions preserved") {
    import spark.implicits._
    // "the" in 3/4 docs (>= ceil(0.7*4)=3 -> pruned); "cat" in 2 (< 3 -> kept)
    val df = Seq(
      (1L, "the cat sat"), (2L, "the dog"), (3L, "the end"), (4L, "cat alone")
    ).toDF("id", "text")
    val got = Dedup.lineDedup(df, "id", "text", sep = " ", minDfFrac = Some(0.7))
      .orderBy("id").select("id", "dup_lines", "cleaned")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 1L, "cat sat"), (2L, 1L, "dog"),
      (3L, 1L, "end"), (4L, 0L, "cat alone")), got.toString)
    // a degenerate fraction CLAMPS to the df>=2 floor instead of
    // crashing (ceil(0.1*4)=1 would drop every token) — and an empty
    // corpus is a no-op batch, not a failed job
    val clamped = Dedup.lineDedup(df, "id", "text", sep = " ", minDfFrac = Some(0.1))
      .orderBy("id").select("id", "cleaned").as[(Long, String)].collect().toSeq
    assert(clamped == Seq((1L, "sat"), (2L, "dog"), (3L, "end"), (4L, "alone")),
      s"df>=2 floor must apply: $clamped")
    val empty = df.filter(col("id") < 0)
    assert(Dedup.lineDedup(empty, "id", "text", minDfFrac = Some(0.7)).count() == 0)
  }

  test("gopherRules: each rule fires on its own violation; keep is the conjunction") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over a lazy dog today"), // 10 words, passes all
      (2L, "the a"),                                           // too few words
      (3L, "the a xx yy zz aa bb cc dd supercalifragilistic"), // mean wlen high? no — word-count rule only
      (4L, "xx yy zz aa bb cc dd ee ff gg")                    // no stopwords
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.gopherRules(df, "doc_id", "text",
        stopwords = Seq("the", "a"), minWords = 5, maxWords = 20,
        minMeanWlen = 1.0, maxMeanWlen = 10.0,
        maxSymbolRatio = 0.5, minAlphaFrac = 0.5, minStopwords = 2)
      .orderBy("doc_id")
      .select("doc_id", "r_words", "r_stop", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, true, true, true),
      (2L, false, true, false),  // 2 words < 5
      (3L, true, true, true),
      (4L, true, false, false))) // zero stopword hits
  }

  test("gopherRules symbol and alpha gates fire on symbol-heavy junk") {
    import spark.implicits._
    val df = Seq(
      (1L, "now ### then ... more ### junk ..."), // 7 words, 4 symbol hits
      (2L, "1 2 3 4 5 6 7 8")                     // digits only -> alpha frac 0
    ).toDF("doc_id", "text")
    // the alphabetic test must see UPPERCASE letters too — the Gopher
    // rule is "has an alphabetic character", and an all-caps headline
    // is 100% alphabetic, not 0%
    val caps = graft.operators.TextAnalysis.gopherRules(
        Seq((9L, "BREAKING NEWS NASA LAUNCH")).toDF("doc_id", "text"),
        "doc_id", "text", stopwords = Seq("the"), minWords = 1, maxWords = 100,
        minMeanWlen = 0.0, maxMeanWlen = 100.0,
        maxSymbolRatio = 1.0, minAlphaFrac = 0.9, minStopwords = 0)
      .select("alpha_frac", "r_alpha").collect().head
    assert(caps.getDouble(0) == 1.0 && caps.getBoolean(1), caps.toString)
    // doc 1: 8 tokens, 8 symbol hits (6 '#', 2 '...') -> ratio 1.0; alpha
    // tokens now/then/more/junk = 4/8 = 0.5
    val out = graft.operators.TextAnalysis.gopherRules(df, "doc_id", "text",
        stopwords = Seq("now"), minWords = 1, maxWords = 100,
        minMeanWlen = 0.0, maxMeanWlen = 100.0,
        maxSymbolRatio = 0.1, minAlphaFrac = 0.4, minStopwords = 0)
      .orderBy("doc_id")
      .select("doc_id", "r_symbol", "r_alpha")
      .as[(Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq((1L, false, true), (2L, true, false)))
  }

  test("tfIdfTopK: corpus-wide terms score zero, rare terms rank first, ties on term") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "the cat sat"),   // "the" in all 3 docs -> idf ln(1) = 0
      (2L, "the dog ran"),
      (3L, "the the fish")   // tf=2 on the zero-idf term still scores 0
    ).toDF("id", "text")
    val got = TextAnalysis.tfIdfTopK(df, "id", "text", 2)
      .orderBy("id", "rk").as[(Long, String, Double, Long)].collect().toSeq
    val idf1 = math.log(3.0) // df=1 terms
    got.foreach { case (_, term, s, _) =>
      if (term == "the") assert(s == 0.0) else assert(math.abs(s - idf1) < 1e-12)
    }
    // doc 1: cat/sat tie at 1*ln3 -> term order breaks the tie
    assert(got.filter(_._1 == 1L).map(_._2) == Seq("cat", "sat"))
    // every doc got exactly k rows with ranks 1..k
    assert(got.groupBy(_._1).forall { case (_, rs) => rs.map(_._4).sorted == Seq(1L, 2L) })
  }

  test("domainShift: zero on identical slices, union vocab, sign of shift, Gibbs >= 0") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val p = Seq("a a b", "a c").toDF("text")
    // identical distributions -> ps == qs for every token -> kl_term 0.0
    val same = TextAnalysis.domainShift(p, p, "text")
      .as[(String, Long, Long, Double)].collect()
    assert(same.length == 3 && same.forall(_._4 == 0.0), s"${same.toSeq}")
    // q has token d that p lacks: union vocab carries it with n_p = 0;
    // a is over-represented in p (positive term), d under (negative)
    val q = Seq("a d d b c").toDF("text")
    val r = TextAnalysis.domainShift(p, q, "text")
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r.keySet == Set("a", "b", "c", "d"), s"${r.keySet}")
    assert(r("d")._2 == 0L && r("d")._3 == 2L)
    assert(r("a")._4 > 0 && r("d")._4 < 0, s"${r.values.toSeq}")
    // smoothed KL total is non-negative (Gibbs' inequality)
    assert(r.values.map(_._4).sum >= 0.0)
    // hand-check one term: a has n_p=3 of 5 (V=4): ps=(3+1)/(5+4)
    val ps = 4.0 / 9.0; val qs = 2.0 / 9.0
    assert(math.abs(r("a")._4 - ps * math.log(ps / qs)) < 1e-15, s"${r("a")}")
  }

  test("jsDivergence: zero on identical slices, symmetric, bounded by ln 2, finite on disjoint support") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val p = Seq("a a b", "a c").toDF("text")
    // identical distributions -> ps == qs -> m == ps -> every term 0.0
    val same = TextAnalysis.jsDivergence(p, p, "text")
      .as[(String, Long, Long, Double)].collect()
    assert(same.length == 3 && same.forall(_._4 == 0.0), s"${same.toSeq}")
    val q = Seq("a d d b c").toDF("text")
    val pq = TextAnalysis.jsDivergence(p, q, "text")
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t._4).toMap
    val qp = TextAnalysis.jsDivergence(q, p, "text")
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t._4).toMap
    // symmetry: JS(P,Q) = JS(Q,P) term by term (the property KL lacks)
    pq.foreach { case (tok, v) => assert(math.abs(v - qp(tok)) < 1e-15, tok) }
    // non-negative terms, total bounded by ln 2
    assert(pq.values.forall(_ >= 0.0), s"$pq")
    assert(pq.values.sum <= math.log(2.0))
    // DISJOINT corpora: KL's per-token terms are large, JS stays finite
    // and the total still respects the ln 2 bound
    val x = Seq("x x y").toDF("text")
    val z = Seq("z w w").toDF("text")
    val dis = TextAnalysis.jsDivergence(x, z, "text")
      .as[(String, Long, Long, Double)].collect()
    assert(dis.forall(t => !t._4.isInfinite && !t._4.isNaN), s"${dis.toSeq}")
    assert(dis.map(_._4).sum <= math.log(2.0) + 1e-12)
    // hand-check one term: token a — n_p=3 of 5 (V=4), n_q=1 of 5 (V=4)
    val ps = 4.0 / 9.0; val qs = 2.0 / 9.0; val ms = (ps + qs) / 2.0
    val expect = (ps * math.log(ps / ms) + qs * math.log(qs / ms)) / 2.0
    val a = TextAnalysis.jsDivergence(p, q, "text")
      .filter(col("token") === "a").as[(String, Long, Long, Double)].head()
    assert(math.abs(a._4 - expect) < 1e-15, s"$a vs $expect")
  }

  test("ppmi: hand-computed directed-window scores; negatives clamp; marginals precede the prune") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "a b a b", window 1: pairs (a,b)x2, (b,a)x1 -> N=3
    // row marginals a=2, b=1; col marginals b=2, a=1
    val got = TextAnalysis.ppmi(Seq("a b a b").toDF("text"), "text", window = 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.keySet == Set(("a", "b"), ("b", "a")))
    assert(got(("a", "b"))._1 == 2L && got(("b", "a"))._1 == 1L)
    assert(math.abs(got(("a", "b"))._2 - math.log(2.0 * 3 / (2 * 2))) < 1e-12)
    assert(math.abs(got(("b", "a"))._2 - math.log(3.0)) < 1e-12)
    // window 2 reaches over one token: "x y z" adds the (x, z) pair
    val w2 = TextAnalysis.ppmi(Seq("x y z").toDF("text"), "text", window = 2)
      .as[(String, String, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(w2 == Set(("x", "y"), ("x", "z"), ("y", "z")))
    // under-associated pairs clamp to 0, never negative: in "a b b a"
    // ppmi(b,b) = ln(1*3/(2*2)) < 0 -> 0.0
    val cl = TextAnalysis.ppmi(Seq("a b b a").toDF("text"), "text", window = 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(cl(("b", "b")) == 0.0, s"$cl")
    assert(cl.values.forall(_ >= 0.0))
    // minPairCount prunes AFTER marginals: surviving scores are identical
    // with and without the pruned tail
    val full = TextAnalysis.ppmi(Seq("a b a b").toDF("text"), "text", 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    val pruned = TextAnalysis.ppmi(Seq("a b a b").toDF("text"), "text", 1,
        minPairCount = 2L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(pruned.keySet == Set(("a", "b")))
    assert(pruned(("a", "b")) == full(("a", "b")),
      "pruning the hapax tail must not move surviving scores")
    intercept[IllegalArgumentException](
      TextAnalysis.ppmi(Seq("a").toDF("text"), "text", 0))
  }

  test("tokenEntropy: uniform=ln(n), constant=0, identity matches direct -sum(p ln p)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a b c d"),   // uniform over 4 -> ln(4)
      (2L, "a a a a"),   // degenerate -> 0
      (3L, "a a b")      // p=(2/3,1/3) -> -sum p ln p
    ).toDF("id", "text")
    val got = TextAnalysis.tokenEntropy(df, "id", "text")
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq((1L, 4L, 4L), (2L, 4L, 1L), (3L, 3L, 2L)))
    assert(math.abs(got(0)._4 - math.log(4.0)) < 1e-12)
    assert(got(1)._4 == 0.0)
    val expected3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(got(2)._4 - expected3) < 1e-12)
  }

  test("tokenBurstiness: Poisson-ish=1 for 0/1 uniform, bursty token high, zeros counted") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 4 docs. "f": counts (1,1,1,0) -> mean .75, var 3/16 -> VMR 0.25.
    // "b" is bursty: counts (4,0,0,0) -> mean 1, var = (16/4 - 1) = 3 -> VMR 3.
    // "h" appears in half: counts (1,1,0,0) -> mean .5, var = .25 -> VMR 0.5.
    // The null-text doc is a genuine zero observation for every token.
    val df = Seq(
      (1L, Some("f b b b b h")),
      (2L, Some("f h")),
      (3L, Some("f")),
      (4L, None: Option[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenBurstiness(df, "doc_id", "text")
      .as[(String, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("f", "b", "h"), s"${got.keySet}")
    assert(got("f") == (("f", 3L, 3L, 0.75, 0.25)), s"${got("f")}")
    assert(got("b") == (("b", 1L, 4L, 1.0, 3.0)), s"${got("b")}")
    assert(got("h") == (("h", 2L, 2L, 0.5, 0.5)), s"${got("h")}")
  }

  private def bruteLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzyNamePairs equals brute force on a randomized small-alphabet set") {
    import spark.implicits._
    import graft.operators.Dedup
    // Fixed-seed names over {a,b,c}, lengths 1..12: a dense edit-distance
    // neighborhood that exercises the gram-prefix path, the low-gram
    // fallback, and the boundary between them. Duplicated rows check cnt.
    val rnd = new scala.util.Random(42)
    val names = (1 to 60).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.distinct
    val rows = names.flatMap(n => Seq.fill(1 + (n.length % 3))(n))
    val k = 2
    val got = Dedup.fuzzyNamePairs(rows.toDF("name"), "name", maxDist = k)
      .as[(String, String, Long, Long, Long)].collect().toSet
    val cnt = rows.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val want = (for {
      a <- names; b <- names
      if a.length < b.length || (a.length == b.length && a < b)
      d = bruteLev(a, b) if d <= k
    } yield (a, b, d.toLong, cnt(a), cnt(b))).toSet
    assert(want.nonEmpty, "degenerate test: no close pairs generated")
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("fuzzyNamePairs: repetitive long names take the fallback (count filter is vacuous)") {
    import spark.implicits._
    import graft.operators.Dedup
    // "aaaaaaaaaa" has ONE distinct 2-gram; a pure gram-prefix scheme with
    // a length-only guard would drop it silently. dist("aaaaaaaaaa",
    // "aaaaaaaaab") = 1 must be found; the unrelated long name must not.
    val df = Seq("aaaaaaaaaa", "aaaaaaaaab", "abcabcabcabc").toDF("name")
    val got = Dedup.fuzzyNamePairs(df, "name", maxDist = 2)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("aaaaaaaaaa", "aaaaaaaaab", 1L, 1L, 1L)), s"$got")
    // equal-length canonical orientation is lexicographic, emitted once
    val eq = Dedup.fuzzyNamePairs(Seq("abcd", "abce").toDF("name"), "name", 1)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(eq == Seq(("abcd", "abce", 1L, 1L, 1L)), s"$eq")
  }

  test("sparseCosinePairs: hand cosines, df<2 excluded from norms, stopword prune empties") {
    import spark.implicits._
    // N=3; df(a)=df(b)=df(c)=2 (kept), df(d)=1 (feeds no pair AND must
    // not enter norms); every doc = two kept tokens of weight ln(1.5)
    // -> each pair shares exactly one token: cos = w^2 / (sqrt2 w)^2 = 0.5
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "b c d d")).toDF("id", "text")
    val got = Dedup.sparseCosinePairs(docs, "id", "text",
        maxDfFrac = 1.0, minCos = 0.4)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Double, Double)].collect().toSeq
    val w2 = math.pow(math.log(1.5), 2)
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)), s"$got")
    got.foreach { p =>
      assert(math.abs(p._3 - w2) < 1e-12 && math.abs(p._4 - 0.5) < 1e-12, s"$p")
    }
    // threshold binds: 0.5 < 0.6 -> empty
    assert(Dedup.sparseCosinePairs(docs, "id", "text", 1.0, 0.6).isEmpty)
    // scale-free stopword prune: ceil(0.33*3)=1 excludes every df>=2 token
    assert(Dedup.sparseCosinePairs(docs, "id", "text", 0.33, 0.0).isEmpty)
    intercept[IllegalArgumentException] {
      Dedup.sparseCosinePairs(docs, "id", "text", maxDfFrac = 0.0)
    }
  }

  test("goldenRecord: fuzzy clusters resolve to min-id canonical, null names stand alone") {
    import spark.implicits._
    val rows = Seq(
      (5L, "alpha"),  // same name as id 1 -> same cluster
      (1L, "alpha"),
      (2L, "alphb"),  // dist 1 from alpha -> same cluster
      (3L, "beta"),   // its own cluster
      (4L, null.asInstanceOf[String])) // no name: own golden record
      .toDF("id", "name")
    val got = Dedup.goldenRecord(rows, "id", "name", maxDist = 1)
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(got == Map(
      1L -> (1L, true), 2L -> (1L, false), 5L -> (1L, false),
      3L -> (3L, true), 4L -> (4L, true)), got.toString)
  }

  test("compressionRatio: templates compress below prose, empty=1.0, UTF-8 bytes, null passthrough") {
    import spark.implicits._
    val template = Seq.fill(50)("click here to win a free prize now").mkString(" ")
    val prose = "the quick brown fox jumps over a lazy dog while seventeen " +
      "musicians rehearse quite different melodies upstairs tonight"
    val docs = Seq((1L, template), (2L, prose), (3L, ""), (4L, null.asInstanceOf[String]),
      (5L, "é€ñ")).toDF("id", "text")
    val got = TextAnalysis.compressionRatio(docs, "text")
      .select("id", "n_bytes", "n_deflated", "compression_ratio")
      .as[(Long, Option[Long], Option[Long], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val tRatio = got(1L)._4.get
    val pRatio = got(2L)._4.get
    assert(tRatio < 0.15, s"template ratio $tRatio")
    assert(pRatio > 0.5 && pRatio <= 1.2, s"prose ratio $pRatio")
    assert(tRatio < pRatio / 3)
    // empty input still emits a (tiny) deflate frame; the ratio is pinned 1.0
    assert(got(3L)._2.contains(0L) && got(3L)._4.contains(1.0), got(3L).toString)
    assert(got(4L)._2.isEmpty && got(4L)._4.isEmpty, got(4L).toString)
    // "é€ñ" = 2 + 3 + 2 UTF-8 bytes
    assert(got(5L)._2.contains(7L), got(5L).toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.compressionRatio(docs, "text", level = 0)
    }
  }

  test("windowDupProfile: cross-doc windows flagged, within-doc repeats immune") {
    import spark.implicits._
    // docs 1 and 2 share the exact 4-token run "a b c d" (1 shared window
    // at w=4); doc 3 repeats its OWN window twice but shares nothing —
    // within-doc repetition must never count as duplication; doc 4 is too
    // short for any window and must be absent from the output
    val docs = Seq(
      (1L, "a b c d x y z"),     // windows: abcd bcdx cdxy dxyz
      (2L, "p q a b c d r"),     // windows: pqab qabc abcd bcdr
      (3L, "m n o t m n o t"),   // distinct windows incl repeats collapsed
      (4L, "u v w")              // 3 tokens < w=4 -> no windows
    ).toDF("doc_id", "text")
    val got = Dedup.windowDupProfile(docs, "doc_id", "text", w = 4,
        minDocs = 2, thr = 0.25)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L), got.toString)
    val byId = got.map(g => g._1 -> g).toMap
    // docs 1/2: 4 windows each, exactly 1 shared ("a b c d")
    assert(byId(1L) == ((1L, 4L, 1L, 0.25, true)), got.toString)
    assert(byId(2L) == ((2L, 4L, 1L, 0.25, true)), got.toString)
    // doc 3: 5 window positions collapse to 4 distinct, none cross-doc
    assert(byId(3L)._2 == 4L && byId(3L)._3 == 0L && !byId(3L)._5, got.toString)
  }

  test("windowDupProfile: full-copy doc reaches dup_frac 1.0; validation fires") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),   // exact copy: every window shared
      (3L, "totally different text here now entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.windowDupProfile(docs, "doc_id", "text", w = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got(0)._4 == 1.0 && got(0)._5, got.toString)
    assert(got(1)._4 == 1.0 && got(1)._5, got.toString)
    assert(got(2)._4 == 0.0 && !got(2)._5, got.toString)
    intercept[IllegalArgumentException] {
      Dedup.windowDupProfile(docs, "doc_id", "text", w = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.windowDupProfile(docs, "doc_id", "text", w = 4, minDocs = 1)
    }
  }

  test("bm25Scores: hand Okapi formula, absent terms contribute nothing, guards") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark join join extra pad"), // dl 5: spark x1, join x2
      (2L, "spark spark spark"),         // dl 3: spark x3
      (3L, "other words only here")      // dl 4: no query terms
    ).toDF("id", "text")
    val got = TextAnalysis.bm25Scores(df, "id", "text",
        Seq("spark", "join", "zzz"), k1 = 1.5, b = 0.75)
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    // independent re-derivation: N=3, total tokens 12, avgdl=4
    def idf(dfq: Double) = math.log((3.0 - dfq + 0.5) / (dfq + 0.5) + 1.0)
    def w(tf: Double, dl: Double) =
      tf * 2.5 / (tf + 1.5 * (0.25 + 0.75 * dl / 4.0))
    val s1 = idf(2) * w(1, 5) + idf(1) * w(2, 5)
    val s2 = idf(2) * w(3, 3)
    assert(got.map(r => (r._1, r._2, r._3)) == Seq((1L, 2L, 5L), (2L, 1L, 3L)),
      s"doc 3 matches nothing and must be absent: $got")
    assert(math.abs(got(0)._4 - s1) < 1e-12 && math.abs(got(1)._4 - s2) < 1e-12,
      s"got ${got.map(_._4)}, want ($s1, $s2)")
    intercept[IllegalArgumentException](
      TextAnalysis.bm25Scores(df, "id", "text", Nil))
  }

  test("bm25TopK: heap retrieval equals the sorted replay, ties on id desc") {
    import spark.implicits._
    val df = (1L to 40L).map(i =>
      (i, ("spark " * (1 + (i % 4).toInt)) + ("pad " * (i % 7).toInt) + "end"))
      .toDF("id", "text")
    val top = TextAnalysis.bm25TopK(df, "id", "text", Seq("spark"), k = 6)
      .as[(Long, Double, Long)].collect().toSeq
    val replay = TextAnalysis.bm25Scores(df, "id", "text", Seq("spark"))
      .orderBy(desc("score"), desc("id")).limit(6)
      .select("id", "score").as[(Long, Double)].collect().toSeq
    assert(top.map(r => (r._1, r._2)) == replay, s"$top vs $replay")
    assert(top.map(_._3) == (1L to 6L), "rk must be 1-based dense")
  }

  test("containmentPairs: pasted-inclusion fires at ~1 where Jaccard stays low") {
    import spark.implicits._
    import graft.operators.{Dedup => Ops}
    import org.apache.spark.sql.functions.col
    // a 120-char "short" document pasted whole at the head of a much
    // longer one: every interior window of the short text exists in the
    // long text, so containment -> 1.0, while symmetric Jaccard is
    // diluted by the long document's extra windows
    // block-shifted patterns: aperiodic at window scale, so the distinct
    // window-hash pools are large and the mod-8 sample is never empty
    def pat(n: Int, a: Int, b: Int) =
      (0 until n).map(i => ('a' + ((i * a + (i / 26) * b) % 26)).toChar).mkString
    val short = pat(120, 7, 11)
    val tail = pat(480, 11, 7)
    val unrelated = pat(300, 13, 17)
    val docs = Seq((1L, short), (2L, short + tail), (3L, unrelated),
      (4L, "tiny")).toDF("doc_id", "text")
    val got = Ops.containmentPairs(docs, "doc_id", "text", thr = 0.5)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(g => (g._1, g._2)) == Seq((1L, 2L)), s"$got")
    val (_, _, na, nb, inter, c) = got.head
    assert(c >= 0.99, s"pasted inclusion must be ~fully contained: $c")
    assert(inter == math.min(na, nb), "the short doc's kept signature is the intersection")
    // sub-window documents carry no signature and never pair
    assert(!got.exists(g => g._1 == 4L || g._2 == 4L))
    // symmetric-Jaccard contrast: the same pair under d02-style union
    // denominator is well below the containment threshold
    assert(inter * 1.0 / (na + nb - inter) < 0.5, "Jaccard would have missed this pair")
  }

  test("containmentPairs: df cap kills boilerplate-only pairs; identical docs hit 1") {
    import spark.implicits._
    import graft.operators.{Dedup => Ops}
    val boiler = (0 until 200).map(i =>
      ('a' + ((i * 7 + (i / 26) * 11) % 26)).toChar).mkString
    // 60 documents all equal -> every window hash has df 60 > maxDf 50 ->
    // every signature empties after the cap -> no pairs at all
    val many = (1L to 60L).map(i => (i, boiler)).toDF("doc_id", "text")
    assert(Ops.containmentPairs(many, "doc_id", "text", thr = 0.1).isEmpty)
    // two identical docs under the cap -> containment exactly 1.0
    val two = Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text")
    val c = Ops.containmentPairs(two, "doc_id", "text", thr = 0.9)
      .select("containment").as[Double].head()
    assert(c == 1.0, s"$c")
  }
}
