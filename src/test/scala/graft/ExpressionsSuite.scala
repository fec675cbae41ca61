package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, TextFunctions, VectorFunctions}

/** The codegen'd native expressions must agree exactly with their
  * higher-order-function twins (which in turn mirror the DuckDB oracle).
  */
class ExpressionsSuite extends SparkSpec {

  test("PolyHash (codegen) == polyHashSlow (HOF) on real documents") {
    GraftExpressions.register(spark)
    val diff = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        GraftExpressions.polyHash(col("text")).as("fast"),
        TextFunctions.polyHashSlow(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0)
  }

  test("CosineSim (codegen) == cosine (HOF) bit-exactly on embeddings") {
    GraftExpressions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val pairs = e.as("a").crossJoin(e.as("b"))
    val diff = pairs.select(
        GraftExpressions.cosineSim(col("a.embedding"), col("b.embedding")).as("fast"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("slow"))
      .filter(col("fast") =!= col("slow")) // bit equality, not tolerance
      .count()
    assert(diff == 0)
  }

  test("WindowHashes (rolling, one-pass) == transform/filter/distinct HOF chain on real documents") {
    GraftExpressions.register(spark)
    for ((w, mod) <- Seq((20, 8L), (4, 1L), (7, 3L))) {
      val text = col("text")
      val hof = array_distinct(filter(
        transform(sequence(lit(1), length(text) - lit(w - 1)),
          i => GraftExpressions.polyHash(text.substr(i, lit(w)))),
        h => h % lit(mod) === 0L))
      val diff = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(length(text) >= w)
        .select(GraftExpressions.windowHashes(text, w, mod).as("fast"), hof.as("slow"))
        .filter(not(col("fast") <=> col("slow"))) // exact array equality incl. order
        .count()
      assert(diff == 0, s"window=$w mod=$mod diverged from the HOF chain")
    }
    // shorter than the window -> empty array (the HOF sequence would be
    // descending there; callers filter first, but the native twin must
    // stay total and harmless)
    import spark.implicits._
    val short = Seq("abc").toDF("t")
      .select(size(GraftExpressions.windowHashes(col("t"), 4, 1L))).as[Int].head()
    assert(short == 0)
  }

  test("SpanKeys (rolling, one-pass) == Signatures.spanKeys HOF fold on real documents") {
    import graft.functions.{Signatures, SignatureExpressions => SigX}
    SigX.register(spark)
    val th = Signatures.tokenHashes(split(col("text"), " ", -1))
    for (n <- Seq(2, 5, 8)) {
      val diff = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(th.as("_th"))
        .select(SigX.spanKeys(col("_th"), n).as("fast"),
          Signatures.spanKeys(col("_th"), n).as("slow"))
        .filter(not(col("fast") <=> col("slow"))) // exact, incl. order and empties
        .count()
      assert(diff == 0, s"n=$n rolling span keys diverged from the HOF fold")
    }
    // shorter than the span -> empty array, both forms
    import spark.implicits._
    val short = Seq(Seq(1L, 2L)).toDF("th")
      .select(size(SigX.spanKeys(col("th"), 3))).as[Int].head()
    assert(short == 0)
  }

  test("PairExplode (generator) == nested transform/flatten HOF pair expansion on real baskets") {
    graft.functions.PairExplode.register(spark)
    // real sorted baskets from the lineitem co-purchase build (longs) ...
    val baskets = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("_items"))
      .filter(size(col("_items")) >= 2)
    val n = size(col("_items"))
    val hofPairs = baskets.select(explode(flatten(transform(sequence(lit(0), n - 2), i =>
        transform(sequence(i + 1, n - 1), j =>
          struct(element_at(col("_items"), i + 1).as("a"),
            element_at(col("_items"), j + 1).as("b")))))).as("_p"))
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b")).agg(count(lit(1)).as("c"))
    val genPairs = baskets
      .select(graft.functions.PairExplode.pairExplode(col("_items")))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    assert(hofPairs.exceptAll(genPairs).isEmpty && genPairs.exceptAll(hofPairs).isEmpty)
    // ... and struct elements (the simhashPairs member shape)
    import spark.implicits._
    val structArr = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "sim")
      .agg(sort_array(collect_list(struct(col("id"), col("sim")))).as("ms"))
    val got = structArr.select(graft.functions.PairExplode.pairExplode(col("ms")))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // null / short arrays emit nothing
    val empty = Seq(Seq(1L)).toDF("xs")
      .select(graft.functions.PairExplode.pairExplode(col("xs"))).count()
    assert(empty == 0)
  }

  test("PairExplode primitive fast paths: int arrays, nullable elements, reused-row isolation") {
    import spark.implicits._
    graft.functions.PairExplode.register(spark)
    // IntegerType, containsNull=false -> int fast path; collect the raw
    // generated rows (not an aggregate) so a leaked reused row buffer
    // would corrupt earlier pairs and fail the exact-sequence assert
    val gotI = Seq(Seq(1, 2, 3), Seq(7, 9)).toDF("xs")
      .select(graft.functions.PairExplode.pairExplode(col("xs")))
      .as[(Int, Int)].collect().toSeq
    assert(gotI == Seq((1, 2), (1, 3), (2, 3), (7, 9)))
    // LongType fast path, same direct-row check (enumeration order i < j)
    val gotL = Seq(Seq(10L, 20L, 30L, 40L)).toDF("xs")
      .select(graft.functions.PairExplode.pairExplode(col("xs")))
      .as[(Long, Long)].collect().toSeq
    assert(gotL == Seq((10L, 20L), (10L, 30L), (10L, 40L),
      (20L, 30L), (20L, 40L), (30L, 40L)))
    // containsNull=true routes through the generic path and keeps nulls
    val gotN = Seq(Seq[java.lang.Long](1L, null, 5L)).toDF("xs")
      .select(graft.functions.PairExplode.pairExplode(col("xs")))
      .select(col("a"), col("b")).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    assert(gotN == Seq((Some(1L), None), (Some(1L), Some(5L)), (None, Some(5L))))
  }

  test("PolyHash hashes an unpaired high surrogate without swallowing the next char") {
    import spark.implicits._
    import graft.functions.{SignatureExpressions => SigX}
    GraftExpressions.register(spark)
    def fold(cs: Seq[Int]): Long =
      cs.foldLeft(0L)((h, c) => (h * 31 + c) % TextFunctions.P)
    // the guard branch, on a raw JVM string (only place a lone surrogate
    // can exist): surrogate hashes alone, 'a' and 'b' BOTH still hash
    val lone = '\uD800'
    assert(SigX.polyHashString(s"${lone}ab") ==
      fold(Seq(lone.toInt, 'a'.toInt, 'b'.toInt)))
    // through a DataFrame the encoder replaces the lone surrogate with '?'
    // before any expression sees it — both engines hash the same '?ab'
    val got = Seq(s"${lone}ab").toDF("t")
      .select(GraftExpressions.polyHash(col("t"))).as[Long].head()
    assert(got == fold(Seq('?'.toInt, 'a'.toInt, 'b'.toInt)))
  }

  test("CosineSim rejects non-float arrays at analysis time") {
    import spark.implicits._
    GraftExpressions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b") // array<double>
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(GraftExpressions.cosineSim(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("array<float>"))
  }

  test("native signature expressions == HOF twins (shingle/minhash/simhash)") {
    import graft.functions.{SignatureExpressions => SigX, Signatures => Sig}
    SigX.register(spark)
    val toks = TextFunctions.tokens(col("text"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = docs.select(
        SigX.shingleHash(toks).as("fast"),
        Sig.shingleHashes(Sig.tokenHashes(toks)).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(sh == 0)
    val bands = docs.select(
        SigX.minhashBandKeys(SigX.shingleHash(toks)).as("fast"),
        Sig.bandKeys(Sig.minhashSig(Sig.shingleHashes(Sig.tokenHashes(toks)))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bands == 0)
    val sim = docs.select(
        SigX.simhash(toks).as("fast"),
        Sig.simhash(Sig.tokenHashes(toks)).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(sim == 0)
  }

  test("PolyHash stays inside whole-stage codegen") {
    GraftExpressions.register(spark)
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(GraftExpressions.polyHash(col("text")).as("h"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen span in the plan string
    assert(plan.contains("*(1) Project"), plan)
  }

  test("registration is once-per-session: no registry churn on repeated calls") {
    import graft.functions.Registration
    // the guard runs the body exactly once per (session, key) — this is
    // what silences the per-query "replaced a previously registered
    // function" WARN spam across a 197-query benchmark session
    var runs = 0
    Registration.once(spark, "spec-probe") { runs += 1 }
    Registration.once(spark, "spec-probe") { runs += 1 }
    assert(runs == 1, s"body ran $runs times for one (session, key)")
    // a different key on the same session runs; a cloned session (own
    // SessionState, own registry) re-runs the same key
    Registration.once(spark, "spec-probe-2") { runs += 1 }
    assert(runs == 2)
    Registration.once(spark.newSession(), "spec-probe") { runs += 1 }
    assert(runs == 3)
    // and the guarded real registration still resolves after many calls
    (1 to 3).foreach(_ => GraftExpressions.register(spark))
    val one = spark.sql("SELECT graft_poly_hash('x') AS h").collect()
    assert(one.length == 1)
  }
}
