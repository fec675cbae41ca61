package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicates the documents/embeddings tables N× (ids
  * shifted, text/vectors perturbed deterministically so replicas are not
  * trivial duplicates) into /tmp, then runs the dedup/similarity operators
  * at the inflated size and prints timings. Validates that the LSH-join
  * designs scale superlinearly better than the O(n²) baselines they
  * replace — evidence for SURVEY.md §4.
  *
  *   sbt "runMain graft.ScaleProbe 10"            # dedup/similarity probe
  *   sbt "runMain graft.ScaleProbe 10 relational" # fact-fact joins at ~sf1
  *   sbt "runMain graft.ScaleProbe 10 embeddings" # ANN candidate growth (s02/s04)
  *   sbt "runMain graft.ScaleProbe 10 all"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val mode = args.lift(1).getOrElse("dedup") // dedup | relational | embeddings | round6 | graph | ext..ext8 | all
    val src = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$factor"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC") // NTZ→timestamp relabels are value-preserving only under UTC
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    if (mode == "relational" || mode == "all") relational(spark, src, out, factor)
    if (mode == "embeddings" || mode == "all") {
      writeEmbeddings(spark, src, out, factor)
      embeddings(spark, out, factor)
    }
    if (mode == "round6") { round6(spark, src, out, factor); spark.stop(); return }
    if (mode == "graph") { graph(spark, src, out, factor); spark.stop(); return }
    if (mode == "ext") { ext(spark, src, out, factor); spark.stop(); return }
    if (mode == "ext2") { ext2(spark, src, out, factor); spark.stop(); return }
    if (mode == "ext3") { ext3(spark, src, out, factor); spark.stop(); return }
    if (mode == "ext4") { ext4(spark, src, out, factor); spark.stop(); return }
    if (mode == "ext5") { ext5(spark, src, out, factor); spark.stop(); return }
    if (mode == "ext6") { ext6(spark, src, out, factor); spark.stop(); return }
    if (mode == "ext7") { ext7(spark, src, out, factor); spark.stop(); return }
    if (mode == "ext8") { ext8(spark, src, out, factor); spark.stop(); return }
    if (mode == "mixer") { mixer(spark, src, out, factor); spark.stop(); return }
    if (mode == "serving") { serving(spark, factor); spark.stop(); return }
    if (mode == "tar") { tarShards(spark, out, factor); spark.stop(); return }
    if (mode == "warc") { warcShards(spark, out, factor); spark.stop(); return }
    if (mode == "crawl") { crawlE2e(spark, out, factor); spark.stop(); return }
    if (mode == "frontier") { frontier(spark, factor); spark.stop(); return }
    if (mode == "theilsen") { theilSenBucketed(spark, src, factor); spark.stop(); return }
    if (mode == "retrieval") { retrieval(spark, src, out, factor); spark.stop(); return }
    if (mode == "ivfpq") { ivfpq(spark, src, out, factor); spark.stop(); return }
    if (mode == "stats") { stats(spark, src, out, factor); spark.stop(); return }
    if (mode == "bandann") { bandann(spark, src, out, factor); spark.stop(); return }
    if (mode == "relational" || mode == "embeddings") { spark.stop(); return }

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val reps = spark.range(factor).select(col("id").as("rep"))
    // Perturb each replica: append a replica-specific token so cross-replica
    // pairs are near-dups (high Jaccard) rather than exact dups — the worst
    // case for candidate generation.
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    if (mode != "all") writeEmbeddings(spark, src, out, factor) // "all" wrote it above

    println(s"[scale x$factor] documents=${nDocs * factor}")
    val d = spark.read.parquet(s"$out/documents.parquet")
    time("d01 exact")(graft.operators.Dedup.exact(d, "doc_id", "text").count())
    time("d03 minhash-lsh")(graft.operators.Dedup.minhashLshPairs(d, "doc_id", "text", 0.5).count())
    time("d04 simhash")(graft.operators.Dedup.simhashPairs(d, "doc_id", "text").count())
    time("d02 ngram-jaccard")(graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text", 0.5, 20).count())
    // d16's worst case mirrors d02's: cross-replica docs share their full
    // char-window signature except where the replica marker lands
    time("d16 containment")(graft.operators.Dedup.containmentPairs(
      d, "doc_id", "text", thr = 0.5, maxDf = 50).count())
    time("d06 clusters")(graft.operators.Dedup.clusters(d, "doc_id",
      graft.operators.Dedup.minhashLshPairs(d, "doc_id", "text", 0.5),
      checkIds = false).filter(col("keep")).count()) // the shipped d06 path
    // worst case for the span scrub: every cross-replica doc family shares
    // its full token run except the appended replica marker
    time("q31 span-scrub")(graft.operators.Dedup.spanScrub(d, "doc_id", "text")
      .filter(col("dup_tokens") > 0).count())
    graft.functions.GraftExpressions.register(spark)
    val isTest = graft.operators.Sampling.hashBucket(col("doc_id"), 100, "contam:") < 10
    time("d08 contamination")(graft.operators.Dedup.contaminationPairs(
      d.filter(!isTest), d.filter(isTest), "doc_id", "text",
      minOverlap = 5, maxDf = 20).count())
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    time("d05 embedding-lsh")(graft.operators.Dedup.embeddingPairsLsh(
      e, "vec_id", "embedding", 0.4).count())
    time("s02 ann-lsh")(graft.operators.Similarity.annLsh(e, "vec_id", "embedding",
      graft.queries.Similarity.planes).count())
    time("s03 centroids")(graft.operators.Similarity.centroids(e, "label", "embedding").count())
    spark.stop()
  }

  /** Replicate embeddings `factor`× with rep-scaled elementwise shifts so
    * cross-replica vectors are near- but not exact duplicates.
    */
  private def writeEmbeddings(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nEmb = emb.count()
    val reps = spark.range(factor).select(col("id").as("rep"))
    emb.crossJoin(reps)
      .select((col("vec_id") + col("rep") * nEmb).as("vec_id"),
        transform(col("embedding"),
          x => (x + col("rep").cast("float") * lit(0.003f)).cast("float")).as("embedding"),
        col("label"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** ANN scale probe (s02/s04): candidate growth and the hot-bucket cap.
    * With a FIXED geometry (the verified 8-plane / 256-bucket one),
    * per-bucket occupancy grows ~linearly with N, so uncapped candidate
    * volume grows ~N² — the probe prints both the analytic candidate
    * counts (sum over buckets of c·(c-1)/2, capped vs not) and wall time
    * with the cap binding. The scale FIX is geometry sizing: planes ≈
    * log2(corpus / target-bucket-size) keeps bucket size — and therefore
    * candidates per vector — constant as the corpus grows (the d05
    * retune pattern); the probe demonstrates with a corpus-sized plane
    * set generated by the same LCG scheme as the verified ones.
    */
  private def embeddings(spark: SparkSession, out: String, factor: Int): Unit = {
    import graft.operators.Similarity
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    val n = e.count()
    val fixed = graft.queries.Similarity.planes
    // planes sized so expected bucket size ~= 8 at THIS corpus size
    val sized = Similarity.sizedPlanes(n, targetBucketSize = 8, dim = 64)
    val sizedN = sized.length
    def candidates(planes: Seq[Seq[Int]], cap: Long): (Long, Long) = {
      val counts = e.select(Similarity.lshBucket(col("embedding"), planes).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
      val row = counts.agg(
        sum(expr("c * (c - 1) / 2")).as("all"),
        sum(when(col("c") <= cap, expr("c * (c - 1) / 2")).otherwise(lit(0L))).as("capped")).head()
      (row.getAs[Any]("all").asInstanceOf[Number].longValue,
        row.getAs[Any]("capped").asInstanceOf[Number].longValue)
    }
    val (fixedAll, fixedCapped) = candidates(fixed, 8L)
    val (sizedAll, _) = candidates(sized, 8L)
    println(s"[scale x$factor] s02 candidates: fixed-8-plane uncapped=$fixedAll " +
      s"capped(df<=8)=$fixedCapped sized-$sizedN-plane uncapped=$sizedAll (n=$n)")
    time("s02 ann-lsh fixed capped")(
      Similarity.annLsh(e, "vec_id", "embedding", fixed, maxBucketDf = 8).count())
    time("s02 ann-lsh sized geometry")(
      Similarity.annLsh(e, "vec_id", "embedding", sized, maxBucketDf = 64).count())
    val cells = Similarity.centroidVectors(e, "label", "embedding")
    time("s04 ivf-knn probe-1")(
      Similarity.ivfKnn(e, "vec_id", "embedding", cells, col("vec_id") < 8, k = 5).count())
    time("s04 ivf-knn nprobe-4")(
      Similarity.ivfKnn(e, "vec_id", "embedding", cells, col("vec_id") < 8, k = 5, nprobe = 4).count())
    // PQ: codebook training cost is corpus-linear per Lloyd round; the
    // compressed-domain ADC scan is |corpus| x m tiny rows per query set
    val cb = Similarity.pqCodebooks(e, "vec_id", "embedding", dim = 64,
      m = 8, k = 16, iters = 1, salt = "pq:").localCheckpoint(true)
    var codes: org.apache.spark.sql.DataFrame = null
    time("s05 pq encode") {
      codes = Similarity.pqEncode(e, "vec_id", "embedding", cb, dim = 64, m = 8)
        .localCheckpoint(true) // eager: the timer measures the one encode job
      codes.count()
    }
    val queries = e.filter(col("vec_id") < 8)
    time("s05 pq adc-knn (8 queries)")(
      Similarity.pqKnn(codes, cb, queries, "vec_id", "embedding",
        dim = 64, m = 8, k = 5).count())
  }

  /** Fact-fact joins at ~sf1 (SURVEY §7): replicate orders/lineitem/events
    * `factor`× from sf0.1 with key-shifted fact ids (dimension keys — cust,
    * supp, nation — are NOT shifted, so per-dimension-key fan-in grows
    * factor×, the realistic sf1 shape), copy the dims verbatim, then run
    * the three heaviest verified queries end-to-end through SparkEntry.
    */
  private def timed(factor: Int, name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scale x$factor] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  out_rows=$n")
  }

  /** Events for probe replication with `ts` normalized to a NANOS-since-
    * epoch long — the shared decode point in Tables handles both parquet
    * generations; the replicated copy is written as int64 nanos, the
    * shape Tables.events' long arm reads.
    */
  private def eventsNanos(spark: SparkSession, src: String): DataFrame =
    graft.sources.Tables.eventsTsAsNanosLong(spark, src)

  /** Round-6 operators at scale: co-occurrence (corpus-linear pair
    * enumeration under bounded baskets), latestByKey vs the window plan
    * it replaces (the max_by partial agg ships one candidate per key per
    * partition; the window ships every version), sketch vs exact
    * distinct (fixed-size sketches vs shuffling the value set), and
    * int8-quantized vs float brute-force kNN (same plan, 1/4 the bytes).
    */
  private def round6(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Relational, Similarity}
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    // documents ×factor (same perturbation as the dedup probe)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val reps = spark.range(factor).select(col("id").as("rep"))
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val d = spark.read.parquet(s"$out/documents.parquet")
    // events ×factor with user ids UNSHIFTED: the CDC shape — the change
    // log deepens (factor× versions per key) while |keys| stays fixed,
    // exactly when compaction plans diverge
    val ev0 = eventsNanos(spark, src)
    val maxEv = ev0.agg(max(col("event_id"))).head().getLong(0) + 1
    ev0.crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * maxEv)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val ev = spark.read.parquet(s"$out/events.parquet")
    writeEmbeddings(spark, src, out, factor)
    val e = spark.read.parquet(s"$out/embeddings.parquet")

    println(s"[scale x$factor] docs=${nDocs * factor} events=${factor * 100000} " +
      s"(replicated from sf0.1)")
    val toks = d.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    time("q41 cooccurrence")(
      Relational.cooccurrence(toks, "doc_id", "token", maxBasket = 33).count())
    time("q40 latestByKey (max_by)")(
      Relational.latestByKey(ev, "user_id", Seq(col("ts"), col("event_id")),
        Seq(col("ts").as("last_ts"), col("event_id").as("last_event_id"),
          col("value").as("last_value"))).count())
    time("q40 window-plan contrast") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
    }
    // distinct-count contrast at HIGH cardinality (factor×100k distinct
    // event ids): exact shuffles the value set, the sketch ships ≤4 KB
    // per group per partition regardless of cardinality
    time("sketchDistinct (hll)")(
      Relational.sketchDistinct(ev, "event_id", Seq("event_type")).count())
    time("exact count-distinct contrast")(
      ev.groupBy("event_type").agg(countDistinct(col("event_id"))).count())
    val queries = e.filter(col("vec_id") < 8)
    time("s01 float knn (8 queries)")(
      Similarity.knnBruteForce(e, queries, "vec_id", "embedding", 5).count())
    // steady-state quantized search: the int8 store is built ONCE at
    // ingest (timed separately); the recurring per-query cost scans the
    // 4×-smaller code store
    var codes: org.apache.spark.sql.DataFrame = null
    time("s05 quantize+store (once)") {
      Similarity.quantizeInt8(e, "vec_id", "embedding")
        .select(col("vec_id"), col("codes"))
        .write.mode("overwrite").parquet(s"$out/codes.parquet")
      codes = spark.read.parquet(s"$out/codes.parquet")
        .select(col("vec_id"), transform(col("codes"), _.cast("float")).as("embedding"))
      codes.count()
    }
    val qcodes = codes.filter(col("vec_id") < 8)
    time("s05 quantized knn on store")(
      Similarity.knnBruteForce(codes, qcodes, "vec_id", "embedding", 5).count())
  }

  private def relational(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import spark.implicits._
    val reps = spark.range(factor).select(col("id").as("rep"))
    def maxOf(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.agg(max(col(c))).head().get(0).asInstanceOf[Number].longValue + 1

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val maxOrder = maxOf(orders, "o_orderkey")
    orders.crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * maxOrder)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    spark.read.parquet(s"$src/lineitem.parquet").crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * maxOrder)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // events: read ts as raw nanos (the source is ns-precision parquet);
    // the written copy is a plain int64 Tables.events reads unchanged
    val ev = eventsNanos(spark, src)
    val (maxEv, maxUser) = (maxOf(ev, "event_id"), maxOf(ev, "user_id"))
    ev.crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * maxEv)
      .withColumn("user_id", col("user_id") + col("rep") * maxUser)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    println(s"[scale x$factor] orders=${factor * (maxOrder - 1)} (approx) events replicated $factor x")
    Seq("q03_top_orders", "q05_local_supplier", "q12_asof_join",
        "q09_distinct_agg", "q16_percentiles", "q36_gapfill").foreach { q =>
      timed(factor, q)(SparkEntry.queries(q)(spark, out).count())
    }
  }

  /** Late-round-6 operators at scale. Replicated docs SHARE a vocabulary,
    * so the co-occurrence graph's node/edge sets are ~constant while the
    * basket build grows ×factor — the expected trend is: graph
    * construction linear in corpus size, the join rounds on the graph
    * itself (pageRank iterations, triangle joins) flat. tf-idf/entropy
    * are partial-agg pipelines (linear); outliers must stay linear with
    * a |groups|-row driver-side-free stats pass; the salted-join
    * commonness score is the skew stress (hot tokens get ×factor hotter).
    */
  private def graph(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Graph, Relational, TextAnalysis}
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val reps = spark.range(factor).select(col("id").as("rep"))
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val d = spark.read.parquet(s"$out/documents.parquet")
    val ev0 = eventsNanos(spark, src)
    val maxEv = ev0.agg(max(col("event_id"))).head().getLong(0) + 1
    ev0.crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * maxEv)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val ev = spark.read.parquet(s"$out/events.parquet")

    println(s"[scale x$factor] docs=${nDocs * factor}")
    val toks = d.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    val pairs = Relational.cooccurrence(toks, "doc_id", "token", maxBasket = 33)
    time("q45 triangles")(
      Graph.triangleCounts(pairs, "item_a", "item_b").count())
    val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"))
      .union(pairs.select(col("item_b").as("src"), col("item_a").as("dst")))
    time("q43 pagerank (3 it)")(
      Graph.pageRank(edges, "src", "dst", iters = 3).count())
    time("q44 outliers")(
      Relational.zscoreOutliers(ev, Seq("event_type"), col("value"), 3.0,
        payloadCols = Seq(col("event_id"))).count())
    time("t16 tfidf top-3")(
      TextAnalysis.tfIdfTopK(d, "doc_id", "text", 3).count())
    time("t17 entropy")(
      TextAnalysis.tokenEntropy(d, "doc_id", "text").count())
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("freq"))
    time("q46 salted commonness")(
      Relational.saltedJoin(toks, vocab, "token", salts = 8,
          saltSrc = Seq(col("doc_id")), dimHint = Some("shuffle_hash"))
        .groupBy("doc_id").agg(sum("freq")).count())
    // q47: event points double with the corpus; the prefix-sum driver
    // metadata stays |partitions| longs — expected linear wall, flat
    // driver traffic
    // ev.ts is a NANOS long here (nanosAsLong read) — derive millis
    val tsMs = (col("ts") / lit(1000000L)).cast("long")
    time("q47 concurrency")(
      Relational.runningConcurrency(
        ev.select(col("event_id"), tsMs.as("s"),
          (tsMs + (col("value") * 1000).cast("long")).as("e")),
        col("event_id"), col("s"), col("e")).count())
    // d10: the fingerprint table grows xfactor but hot tokens combine
    // map-side; the rebuild join is id-keyed
    time("d10 df-prune")(
      graft.operators.Dedup.lineDedup(d, "doc_id", "text",
        sep = " ", minDfFrac = Some(0.79)).count())
    // d11: reference doubles but the bloom stays a broadcast scalar;
    // only flagged rows pay the backstop join
    val half = nDocs * factor / 2
    time("d11 bloom novelty")({
      val ref = d.filter(col("doc_id") < half)
        .select(col("doc_id").cast("string").as("ck")).distinct().localCheckpoint(true)
      val inc = d.filter(col("doc_id") >= half)
        .select(col("doc_id")).distinct()
        .withColumn("ck", col("doc_id").cast("string")).localCheckpoint(true)
      val gated = graft.operators.Dedup.bloomSeen(inc, ref, "doc_id", "ck")
      gated.filter(!col("probably_seen")).select("doc_id")
        .unionAll(gated.filter(col("probably_seen"))
          .join(ref, Seq("ck"), "left_anti").select("doc_id")).count()
    })
  }

  /** Extension operators at scale: association rules (basket table ×f
    * under the same cap — pair space fixed by the vocab, counts deepen),
    * transitions (CDC shape — same users, f× deeper sequences: the
    * window partitions grow, the output stays |types|²), trend (pure
    * partial agg — flat output), heavy hitters (sketch rows per
    * partition fixed as the stream deepens), domain shift (count table
    * fixed at the vocab), weighted take (TakeOrdered: driver merges
    * n·partitions rows regardless of corpus), and k-core over the
    * deeper co-purchase multigraph collapsed to its distinct edges.
    */
  private def ext(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Relational, Sampling, Sketches, TextAnalysis}
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val reps = spark.range(factor).select(col("id").as("rep"))
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
        col("text"), col("lang"), col("n_chars"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val d = spark.read.parquet(s"$out/documents.parquet")
    val ev0 = eventsNanos(spark, src)
    val maxEv = ev0.agg(max(col("event_id"))).head().getLong(0) + 1
    ev0.crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * maxEv)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val ev = spark.read.parquet(s"$out/events.parquet")
    val li0 = spark.read.parquet(s"$src/lineitem.parquet")
    val maxOk = li0.agg(max(col("l_orderkey"))).head().getLong(0) + 1
    li0.select("l_orderkey", "l_partkey").crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * maxOk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")

    println(s"[scale x$factor] docs=${nDocs * factor}")
    val toks = d.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
    time("q50 assoc rules")(
      Relational.associationRules(toks, "doc_id", "token",
        minBoth = 5, minConf = 0.8, maxBasket = 33).count())
    // ts is a NANOS long under nanosAsLong — ordering is unaffected
    time("q51 transitions")(
      Relational.eventTransitions(ev, "user_id", "event_type", "ts", "event_id")
        .count())
    time("q52 trend")(
      Relational.linearTrend(ev, Seq("event_type"),
        (col("ts") / lit(86400000000000L)).cast("long"), col("value")).count())
    time("q53 heavy hitters")(
      Sketches.heavyHitters(toks, "token", Nil, maxMapSize = 128,
        minEst = 100L * factor).count())
    time("t18 domain shift")(
      TextAnalysis.domainShift(d.filter(col("lang") === "en"),
        d.filter(col("lang") === "zh"), "text").count())
    time("q54 weighted take")(
      Sampling.weightedTake(d.select("doc_id", "n_chars"), "doc_id",
        col("n_chars"), n = 100, salt = "probe").count())
    // the replicated multigraph collapses to the SAME distinct edge set
    // (baskets repeat with shifted orderkeys) — k stays fixed; the probe
    // measures the f×-deeper pair dedup feeding identical peel rounds
    val pairs = Relational.cooccurrence(li, "l_orderkey", "l_partkey",
      maxBasket = 8)
    time("q49 kcore (3 rounds)")(
      graft.operators.Graph.kCorePeel(pairs, "item_a", "item_b",
        k = 80, rounds = 3).count())
  }

  /** Session additions at scale: the exact-moment statistics family
    * (q55 corr / q56 gini / q57 hhi / q58 chi2 — fixed-size partial-agg
    * outputs, expected FLAT-to-linear in rows), t19 burstiness
    * (vocabulary-sized, two partial aggs), and d12 fuzzy matching, whose
    * NAME UNIVERSE grows ×f (per-replica name variants) — the probe that
    * matters, since the semantics are a quadratic pair join and the plan
    * must stay near-linear through the gram-prefix candidates.
    */
  private def ext2(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Dedup, Relational, TextAnalysis}
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val reps = spark.range(factor).select(col("id").as("rep"))
    val li0 = spark.read.parquet(s"$src/lineitem.parquet")
    val maxSk = li0.agg(max(col("l_suppkey"))).head().getLong(0) + 1
    li0.select("l_suppkey", "l_quantity", "l_extendedprice").crossJoin(reps)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * maxSk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val or0 = spark.read.parquet(s"$src/orders.parquet")
    val maxCk = or0.agg(max(col("o_custkey"))).head().getLong(0) + 1
    or0.select("o_custkey", "o_totalprice", "o_orderpriority", "o_orderstatus")
      .crossJoin(reps)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * maxCk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val or = spark.read.parquet(s"$out/orders.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    docs.select("doc_id", "text").crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"), col("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val d = spark.read.parquet(s"$out/documents.parquet")
    // ×f DISTINCT name universe: each replica renames with a short suffix
    // so lengths/grams vary and cross-replica names are near but distinct
    val pt0 = spark.read.parquet(s"$src/part.parquet")
    pt0.select("p_name").crossJoin(reps)
      .select(concat(col("p_name"), lit(" r"), col("rep")).as("p_name"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    val pt = spark.read.parquet(s"$out/part.parquet")

    println(s"[scale x$factor] lineitem=${li.count()} orders=${or.count()} " +
      s"docs=${d.count()} partNames=${pt.select("p_name").distinct().count()}")
    // suppliers ×f: |groups| grows with f, rows/group fixed — linear scan,
    // output stays |groups|-sized
    time("q55 corr")(
      Relational.pearsonCorr(li, Seq("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"), 1L, 100L).count())
    // customers ×f inside 5 fixed segments: the rank window deepens ×f —
    // the inherent per-group sort, parallel across segments
    val spend = or.filter(col("o_totalprice").isNotNull)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("_c"))
      .groupBy("o_custkey").agg(sum("_c").cast("long").as("cents"))
      .withColumn("seg", pmod(col("o_custkey"), lit(5)))
    time("q56 gini")(
      Relational.giniIndex(spend, Seq("seg"), col("cents"), col("o_custkey"),
        scale = 1L).count())
    // entities ×f in fixed groups: two partial aggs, |groups| rows out
    time("q57 hhi")(
      Relational.herfindahl(li.withColumn("g", pmod(col("l_suppkey"), lit(25))),
        Seq("g"), col("l_suppkey"), col("l_extendedprice")).count())
    // fixed 5×3 grid regardless of f: one partial agg + tiny grid join
    time("q58 chi2")(
      Relational.chiSquare(or, "o_orderpriority", "o_orderstatus").count())
    // vocabulary fixed at 31 tokens: corpus-linear explode, tiny output
    time("t19 burstiness")(
      TextAnalysis.tokenBurstiness(d, "doc_id", "text").count())
    // name universe ×f (the quadratic-semantics operator): candidate
    // growth must track the matched-pair count, not |names|²
    time("d12 fuzzy names")(
      Dedup.fuzzyNamePairs(pt, "p_name", maxDist = 3).count())
  }

  /** Third extension sweep: q59 resample (ticks ×f into a FIXED bar
    * grid — the designed-for flat shape), q60 bins (corpus ×f under a
    * fixed value domain: histogram work constant, assignment narrow),
    * q61 A/B + q64 MI (fixed-size partial-agg outputs), q62 RFM
    * (customer universe ×f: base, histograms and bins all grow), and
    * q63 pareto (suppliers ×f inside 25 fixed groups — the rank window
    * deepens; the inherent per-group sort, parallel across groups).
    */
  private def ext3(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.Relational
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val reps = spark.range(factor).select(col("id").as("rep"))
    val ev0 = graft.sources.Tables.events(spark, src)
      .select(unix_millis(col("ts")).as("tms"), col("event_type"),
        col("value"), col("event_id"))
    val maxEid = ev0.agg(max(col("event_id"))).head().getLong(0) + 1
    ev0.crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * maxEid)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events_flat.parquet")
    val ev = spark.read.parquet(s"$out/events_flat.parquet")
    val or0 = spark.read.parquet(s"$src/orders.parquet")
    val maxCk = or0.agg(max(col("o_custkey"))).head().getLong(0) + 1
    or0.select("o_custkey", "o_totalprice", "o_orderpriority", "o_orderstatus",
        "o_orderdate", "o_orderkey")
      .crossJoin(reps)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * maxCk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val or = spark.read.parquet(s"$out/orders.parquet")
    val li0 = spark.read.parquet(s"$src/lineitem.parquet")
    val maxSk = li0.agg(max(col("l_suppkey"))).head().getLong(0) + 1
    li0.select("l_suppkey", "l_extendedprice", "l_returnflag", "l_linestatus")
      .crossJoin(reps)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * maxSk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    println(s"[scale x$factor] events=${ev.count()} orders=${or.count()} " +
      s"lineitem=${li.count()}")

    // ticks ×f, bars fixed: shuffle carries |bars| rows either way
    time("q59 resample")(
      Relational.resample(ev, Seq("event_type"), col("tms"), col("value"),
        bucketMillis = 3600000L, scale = 1000000L).count())
    // corpus ×f, cent domain fixed: histogram constant, assignment narrow
    time("q60 bins")(
      Relational.quantileBins(or.filter(col("o_totalprice").isNotNull),
        col("o_totalprice"), Seq(0.25, 0.5, 0.75), scale = 100L).count())
    // 5 fixed groups regardless of f: one conditional partial agg
    time("q61 abtest")(
      Relational.abTest(or, Seq("o_orderpriority"), col("o_orderstatus"),
        col("o_totalprice"), "F", "O", scale = 100L).count())
    // customer universe ×f: base partial agg + three histogram binnings.
    // Runs the VERIFIED binding itself (probe and oracle lane can never
    // desynchronize); the probe's orders dir carries the columns it reads
    time("q62 rfm")(
      graft.queries.RelationalStats.q62.fn(spark, out).count())
    // suppliers ×f inside 25 fixed groups: the rank window deepens ×f
    time("q63 pareto")(
      Relational.paretoRank(li.withColumn("g", pmod(col("l_suppkey"), lit(25))),
        Seq("g"), col("l_suppkey"), col("l_extendedprice"),
        num = 4L, den = 5L, scale = 100L).count())
    // grid fixed at |flags|×|statuses| regardless of f
    time("q64 mi")(
      Relational.mutualInfo(li, "l_returnflag", "l_linestatus").count())
  }

  /** Round-7 family: SCD2 historization, trailing-window distinct, KS
    * drift, HITS, autocorrelation, point-in-time enrichment. Users and
    * orders replicate ×f (entity-parallel paths should track data
    * volume ~linearly); lineitem replicates by SHIFTED SUPPLIERS (hub
    * side ×f over a fixed part universe — the authority aggregation
    * deepens, the iteration structure does not).
    */
  private def ext4(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Graph, Relational}
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val reps = spark.range(factor).select(col("id").as("rep"))
    val ev0 = graft.sources.Tables.events(spark, src)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tms"), to_date(col("ts")).as("day"))
    val maxUid = ev0.agg(max(col("user_id"))).head().getLong(0) + 1
    val maxEid = ev0.agg(max(col("event_id"))).head().getLong(0) + 1
    ev0.crossJoin(reps)
      .withColumn("user_id", col("user_id") + col("rep") * maxUid)
      .withColumn("event_id", col("event_id") + col("rep") * maxEid)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events_pit.parquet")
    val ev = spark.read.parquet(s"$out/events_pit.parquet")
    val or0 = spark.read.parquet(s"$src/orders.parquet")
    val maxOk = or0.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    or0.select("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus")
      .crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * maxOk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/orders_ks.parquet")
    val or = spark.read.parquet(s"$out/orders_ks.parquet")
    val li0 = spark.read.parquet(s"$src/lineitem.parquet")
      .select("l_suppkey", "l_partkey")
    val maxSk = li0.agg(max(col("l_suppkey"))).head().getLong(0) + 1
    li0.crossJoin(reps)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * maxSk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/supply.parquet")
    val supply = spark.read.parquet(s"$out/supply.parquet")
    println(s"[scale x$factor] events=${ev.count()} orders=${or.count()} " +
      s"supply=${supply.count()}")

    // users ×f: one entity shuffle, windows parallel across users
    time("q71 scd2")(
      Relational.scd2(ev, col("user_id"), col("event_type"),
        col("tms"), col("event_id")).count())
    // (day, user) facts ×f: explode stays ×window, distinct agg deepens
    time("q70 rollingDistinct")(
      Relational.rollingDistinct(ev, col("day"), col("user_id"), 7).count())
    // rows ×f, cent domain and segments fixed: histogram absorbs the
    // growth map-side, the window still sorts |distinct cents| rows
    time("q72 ksTest")(
      Relational.ksTest(or, Seq("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count())
    // hubs ×f over fixed parts: edges ×f through 2 joins/iter
    time("q73 hits")(
      Graph.hits(supply, "l_suppkey", "l_partkey", iters = 3).count())
    // counts ×f inside FIXED buckets: pair join carries |buckets| rows
    // regardless of f — runtime should be ~flat
    time("q74 autocorr")(
      Relational.autocorrelation(ev, Seq("event_type"), col("tms"),
        bucketMillis = 3600000L, lagBuckets = 24).count())
    // lifecycle historize + as-of enrich, both keyed by user (×f)
    time("p08 pointInTime") {
      val life = Seq("signup", "purchase")
      val st = Relational.scd2(ev.filter(col("event_type").isin(life: _*)),
          col("user_id"), col("event_type"), col("tms"), col("event_id"))
        .select(col("entity").as("user_id"), col("state"), col("valid_from"))
      val facts = ev.filter(!col("event_type").isin(life: _*))
        .select(col("user_id"), col("event_id"), col("tms"))
      Relational.asofJoin(facts, st, "user_id", "user_id",
        "tms", "valid_from", "event_id", "valid_from").count()
    }
    // sequential folds: users ×f in parallel, O(1) state per entity
    val evv = ev.withColumn("value",
      (pmod(col("event_id"), lit(10000L)).cast("double")) / lit(100.0))
    time("q76 cusum")(
      Relational.cusum(evv, col("user_id"), col("tms"), col("event_id"),
        col("value"), targetUnits = 5000L, kUnits = 2000L,
        hUnits = 20000L).count())
    time("q77 holt")(
      Relational.holt(evv, col("user_id"), col("tms"), col("event_id"),
        col("value"), alpha = 0.5, beta = 0.25).count())
    // one conditional-agg scan; output fixed at |rules| regardless of f
    time("q78 expectations")(
      Relational.expectations(or, Seq(
        "price_positive" -> (col("o_totalprice") > 0),
        "status_known" -> col("o_orderstatus").isin("F", "O", "P"),
        "priority_known" -> col("o_orderpriority").isNotNull)).count())
  }

  /** Fifth-extension probe (reconciliation / audit / community family,
    * q79–q85): keyed universes (orders, customers, suppliers, order
    * baskets) replicate ×f with shifted keys; the PART universe stays
    * fixed, so the item-vocabulary-bounded outputs (q80 communities,
    * q81 recs, q85 skew keys) must stay ~flat while the corpus-keyed
    * ones (q79 diff, q83 ranks, q84 distances) grow with their key
    * spaces — the designed-for decomposition, probed.
    */
  private def ext5(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Graph, Relational}
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val reps = spark.range(factor).select(col("id").as("rep"))
    val or0 = spark.read.parquet(s"$src/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val maxOk = or0.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val maxCk = or0.agg(max(col("o_custkey"))).head().getLong(0) + 1
    or0.crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * maxOk)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * maxCk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/orders5.parquet")
    val or = spark.read.parquet(s"$out/orders5.parquet")
    val cu0 = spark.read.parquet(s"$src/customer.parquet")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    cu0.crossJoin(reps)
      .withColumn("c_custkey", col("c_custkey") + col("rep") * maxCk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/customer5.parquet")
    val cu = spark.read.parquet(s"$out/customer5.parquet")
    val li0 = spark.read.parquet(s"$src/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
        "l_returnflag", "l_extendedprice")
    val maxSk = li0.agg(max(col("l_suppkey"))).head().getLong(0) + 1
    // order keys and supplier keys shift; the PART universe stays fixed
    li0.crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * maxOk)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * maxSk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/lineitem5.parquet")
    val li = spark.read.parquet(s"$out/lineitem5.parquet")
    // customer baskets with the custkey shift carried through the join
    val baskets = or.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    println(s"[scale x$factor] orders=${or.count()} lineitem=${li.count()} " +
      s"customers=${cu.count()}")

    // keys ×f, change fraction constant: diff output ×f, one keyed
    // full-outer shuffle — expect ~linear
    time("q79 snapshotDiff") {
      val oldSnap = or.filter(col("o_orderkey") % 10 =!= 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val b3 = col("o_orderkey") % 10 === 3
      val newSnap = or.filter(col("o_orderkey") % 10 =!= 2)
        .select(col("o_orderkey"),
          when(b3, lit("X")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(b3, col("o_totalprice") + lit(1.0)).otherwise(col("o_totalprice"))
            .as("o_totalprice"))
      Relational.snapshotDiff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice")).count()
    }
    // baskets ×f over a FIXED part vocabulary: pair counts deepen, the
    // pair/edge tables stay ≤|parts|² — expect sublinear
    time("q80 labelProp") {
      val pairs = Relational.cooccurrence(
        li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey",
        maxBasket = 8)
      Graph.labelPropagation(pairs, "item_a", "item_b", rounds = 2).count()
    }
    // customers ×f, items fixed: the narrow expansion grows with
    // entities, the item-count and top-k tables stay vocabulary-sized
    time("q81 itemSimilarity")(
      Relational.itemSimilarity(baskets, "o_custkey", "l_partkey",
        topK = 10, minBoth = 2L, maxBasket = 60).count())
    // rows ×f into the fixed 3×9 grid: partial agg absorbs — ~flat
    time("q82 benford")(
      Relational.benfordScan(li, Seq("l_returnflag"),
        col("l_extendedprice"), scale = 100L).count())
    // customers ×f inside 5 fixed segments: the rank windows deepen
    // (inherent to the order statistic), parallel across segments
    time("q83 spearman") {
      val spend = or.filter(col("o_totalprice").isNotNull)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("_c"))
        .groupBy("o_custkey").agg(sum("_c").cast("long").as("cents"))
      Relational.spearmanCorr(
        spend.join(cu, col("o_custkey") === col("c_custkey")),
        Seq("c_mktsegment"), col("c_acctbal"), col("cents"),
        scaleX = 100L, scaleY = 1L).count()
    }
    // suppliers ×f over fixed parts: edges ×f, frontier rounds carry
    // the growing reached set — expect sublinear in f
    time("q84 shortestPaths") {
      val e = li.select(
        concat(lit("s"), col("l_suppkey").cast("string")).as("u"),
        concat(lit("p"), col("l_partkey").cast("string")).as("v"),
        floor(col("l_quantity") * lit(1.0) + lit(0.5)).cast("long").as("w"))
      val seeds = spark.read.parquet(s"$src/supplier.parquet")
        .crossJoin(reps)
        .withColumn("s_suppkey", col("s_suppkey") + col("rep") * maxSk)
        .filter(col("s_suppkey") % 20 === 0)
        .select(concat(lit("s"), col("s_suppkey").cast("string")).as("seed"))
      Graph.shortestPaths(e, "u", "v", "w", seeds, "seed", rounds = 3,
        symmetrize = true).count()
    }
    // rows ×f over the fixed part-key universe: the counts table is
    // |keys|-sized regardless of f — expect ~flat
    time("q85 skewReport")(
      Relational.keySkewReport(li, Seq("l_partkey"), topN = 20).count())
    // rows ×f into 3 group checksums: pure partial agg — ~flat wall
    time("q86 tableChecksum")(
      Relational.tableChecksum(or, Seq("o_orderstatus"),
        Seq(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))).count())
    // events ×f with users ×f: one entity shuffle, windows parallel
    val ev5 = graft.sources.Tables.events(spark, src)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tms"), col("value"))
    val maxU = ev5.agg(max("user_id")).head().getLong(0) + 1
    val maxE = ev5.agg(max("event_id")).head().getLong(0) + 1
    ev5.crossJoin(reps)
      .withColumn("user_id", col("user_id") + col("rep") * maxU)
      .withColumn("event_id", col("event_id") + col("rep") * maxE)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events5.parquet")
    val ev = spark.read.parquet(s"$out/events5.parquet")
    time("q87 sessionPaths")(
      Relational.sessionPaths(ev, "user_id", col("tms"), col("event_id"),
        col("event_type"), gapMillis = 1800000L).count())
    // (entity, amount) keys ×f, per-key depth constant: equi-join
    // candidates grow linearly, never quadratically
    time("q88 nearTimeDups")(
      Relational.nearTimeDuplicates(ev, "user_id", col("tms"), col("event_id"),
        col("value"), windowMillis = 3600000L, scale = 1L).count())
    // users ×f over 5 fixed event types: |types|²-sized output — ~flat
    time("q89 setOverlap")(
      Relational.setOverlap(ev, "user_id", "event_type").count())
    // names ×f (shifted suppliers give fresh names): the rarest-gram
    // prefix join tracks match volume, the closure the cluster count
    time("p09 goldenRecord") {
      val sup = spark.read.parquet(s"$src/supplier.parquet")
        .select("s_suppkey", "s_name")
      val maxS = sup.agg(max("s_suppkey")).head().getLong(0) + 1
      val reps5 = sup.crossJoin(reps)
        .select((col("s_suppkey") + col("rep") * maxS).as("id"),
          concat(col("s_name"), lit("#"), col("rep")).as("name"))
      graft.operators.Dedup.goldenRecord(reps5, "id", "name", maxDist = 2).count()
    }
  }

  /** Sixth-extension probe: the round-6 additions (d15 window-dup
    * profile, q92 Adamic–Adar, q93 Holt–Winters, s07 covariance).
    */
  private def ext6(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Dedup, Graph, Relational, Similarity}
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val reps = spark.range(factor).select(col("id").as("rep"))
    // docs ×f with the dedup-probe perturbation: every cross-replica
    // window is shared EXCEPT those touching the appended marker — the
    // worst case for window-df counting (maximal duplication density)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents6.parquet")
    val d = spark.read.parquet(s"$out/documents6.parquet")
    println(s"[scale x$factor] documents=${nDocs * factor}")
    // windows ×f but NO pair join anywhere: df counting is partial-agg,
    // expect ~linear in exploded window rows
    time("d15 windowDupProfile")(
      Dedup.windowDupProfile(d, "doc_id", "text", w = 8)
        .filter(col("is_dup")).count())

    // co-purchase graph over ×f customers and the FIXED part universe:
    // the graph densifies, degrees rise, the center cap drops more hubs —
    // wedge volume is bounded by |parts|·C(cap, 2) regardless of f
    val or0 = spark.read.parquet(s"$src/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val maxOk = or0.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val maxCk = or0.agg(max(col("o_custkey"))).head().getLong(0) + 1
    or0.crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * maxOk)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * maxCk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/orders6.parquet")
    val li0 = spark.read.parquet(s"$src/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    li0.crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * maxOk)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/lineitem6.parquet")
    val baskets = spark.read.parquet(s"$out/orders6.parquet")
      .join(spark.read.parquet(s"$out/lineitem6.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    time("q92 adamicAdar") {
      val edges = Relational.cooccurrence(baskets, "o_custkey", "l_partkey",
          maxBasket = 60)
        .filter(col("n_entities") >= 2L)
      Graph.adamicAdar(edges, "item_a", "item_b",
        maxCenterDeg = 60, minCommon = 2L).count()
    }

    // users ×f with per-user history constant: the fold is
    // entity-parallel with O(m) state — expect ~flat
    val ev0 = graft.sources.Tables.events(spark, src)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("tms"), col("value"))
    val maxUid = ev0.agg(max(col("user_id"))).head().getLong(0) + 1
    val maxEid = ev0.agg(max(col("event_id"))).head().getLong(0) + 1
    ev0.crossJoin(reps)
      .withColumn("user_id", col("user_id") + col("rep") * maxUid)
      .withColumn("event_id", col("event_id") + col("rep") * maxEid)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events6.parquet")
    val ev = spark.read.parquet(s"$out/events6.parquet")
    println(s"[scale x$factor] events=${ev.count()}")
    time("q93 holtWinters")(
      Relational.holtWinters(ev, col("user_id"), col("tms"), col("event_id"),
        col("value"), alpha = 0.5, beta = 0.25, gamma = 0.25, period = 4)
        .count())

    // vectors ×f through the single 33 KB buffer: one linear scan,
    // constant state, d²-row output — expect ~linear scan time
    writeEmbeddings(spark, src, out, factor)
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    time("s07 covariance")(
      Similarity.covarianceMatrix(e, "embedding").count())
  }

  /** ext7 (round 6): the as-of family at ×f, the merge-vs-broadcast
    * crossover evidence for §4. Events replicate with user ids shifted
    * (key cardinality ×f, per-key history constant) — the fact-fact
    * case should scale ~linearly for BOTH the union+window formulation
    * and the native merge (same shuffle volume), with the merge ahead on
    * constant factors (no mixed-stream window machinery). The dimension
    * case maps the ×f fact keys back onto the FIXED original key space
    * and enriches against the un-replicated click table: broadcast skips
    * the fact shuffle entirely (expect ~scan-time, flat in the right
    * side), while the same join forced to merge pays the ×f exchange —
    * the gap IS the 100 TB argument for cost-based as-of selection.
    * Theil–Sen replicates with ts shifted by 370 days per replica
    * (groups ×f, points-per-group constant): the local per-basket fit
    * should scale ~linearly with basket count.
    */
  private def ext7(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.Relational
    import graft.plans.GraftAsofJoin
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val reps = spark.range(factor).select(col("id").as("rep"))
    val ev0 = graft.sources.Tables.events(spark, src)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tms"), col("value"))
    val maxUid = ev0.agg(max(col("user_id"))).head().getLong(0) + 1
    val maxEid = ev0.agg(max(col("event_id"))).head().getLong(0) + 1
    ev0.crossJoin(reps)
      .withColumn("user_id", col("user_id") + col("rep") * maxUid)
      .withColumn("event_id", col("event_id") + col("rep") * maxEid)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/events7.parquet")
    val ev = spark.read.parquet(s"$out/events7.parquet")
    println(s"[scale x$factor] events=${ev.count()}")

    def purchases(e: org.apache.spark.sql.DataFrame) =
      e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
          col("tms").as("p_ms"))
    def clicks(e: org.apache.spark.sql.DataFrame) =
      e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"), col("user_id").as("c_user"),
          col("tms").as("c_ms"))

    // fact-fact at ×f: both sides big, expect ~linear for both forms
    time("asof union+window xf")(
      Relational.asofJoin(purchases(ev), clicks(ev), "p_user", "c_user",
        "p_ms", "c_ms", "p_event_id", "c_event_id").count())
    time("asof merge xf")(
      GraftAsofJoin.asofJoinMerge(purchases(ev), clicks(ev),
        Seq("p_user"), Seq("c_user"), "p_ms", "c_ms",
        tieBreak = Seq("c_event_id"), broadcast = Some(false)).count())

    // dimension case: ×f facts, FIXED small right side — the broadcast
    // plan never shuffles the facts; the merge plan pays the exchange
    val factsOnDim = purchases(ev).withColumn("p_user", col("p_user") % maxUid)
    val dim = clicks(ev0).repartition(8)
    time("asof broadcast dim xf")(
      GraftAsofJoin.asofJoinMerge(factsOnDim, dim, Seq("p_user"), Seq("c_user"),
        "p_ms", "c_ms", tieBreak = Seq("c_event_id"), broadcast = Some(true)).count())
    time("asof merge dim xf")(
      GraftAsofJoin.asofJoinMerge(factsOnDim, dim, Seq("p_user"), Seq("c_user"),
        "p_ms", "c_ms", tieBreak = Seq("c_event_id"), broadcast = Some(false)).count())

    // Theil-Sen with groups xf (ts shifted a year per replica so days
    // never collide): local fit, expect ~linear in baskets
    val evShift = ev.withColumn("tms", col("tms") + col("rep") * lit(370L * 86400000L))
      .withColumn("day", to_date(timestamp_millis(col("tms"))))
      .filter(col("event_type").isNotNull)
    time("theilSen groups xf")(
      Relational.theilSen(evShift, Seq("event_type", "day"),
        col("tms").cast("double"), col("value"),
        maxN = 2000, scaleX = 1L, scaleY = 100L).count())
  }

  /** ext8 (round 6): q96's head-to-head at scale — rows-per-group ×f
    * with the GROUP SPACE FIXED (25 brands), the regime the heap
    * aggregate exists for. The window plan shuffles all ×f rows into
    * |brands| sort tasks — parallelism capped at 25 no matter the
    * cluster; the heap plan's partial agg reduces map-side to ≤ k pairs
    * per (brand, task) and the exchange is kilobytes. Expect window
    * ~linear (sort in 25 tasks), heap ~flat (scan-bound, shuffle
    * constant). Interval overlap join at ×f (users ×f, per-user
    * sessions constant): cells/row constant ⇒ ~linear, no nested loop
    * at any factor.
    */
  private def ext8(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.Relational
    import graft.functions.TopKAggregate
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val reps = spark.range(factor).select(col("id").as("rep"))
    val part0 = spark.read.parquet(s"$src/part.parquet")
      .select("p_partkey", "p_brand", "p_retailprice")
    val maxPk = part0.agg(max(col("p_partkey"))).head().getLong(0) + 1
    part0.crossJoin(reps)
      .withColumn("p_partkey", col("p_partkey") + col("rep") * maxPk)
      // perturb so replicated rows are not score-identical (real ties stay)
      .withColumn("p_retailprice",
        col("p_retailprice") + col("rep").cast("double") * 0.01)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/part8.parquet")
    val parts = spark.read.parquet(s"$out/part8.parquet")
    println(s"[scale x$factor] parts=${parts.count()} brands=" +
      parts.select("p_brand").distinct().count())

    time("topk window xf")(
      Relational.topKPerGroup(parts, Seq("p_brand"),
        Seq(desc("p_retailprice"), desc("p_partkey")), k = 3).count())
    TopKAggregate.register(spark)
    time("topk heap xf")(
      parts.groupBy("p_brand")
        .agg(TopKAggregate.topK(col("p_retailprice"), col("p_partkey"), lit(3)).as("top"))
        .select(col("p_brand"), explode(col("top")))
        .count())

    // interval overlap at xf: users xf (shifted ids), per-user sessions
    // constant — cells/row constant, expect ~linear
    val ev0 = eventsNanos(spark, src)
    val maxUid = ev0.agg(max(col("user_id"))).head().getLong(0) + 1
    ev0.crossJoin(reps)
      .withColumn("user_id", col("user_id") + col("rep") * maxUid)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events8.parquet")
    val ev = spark.read.parquet(s"$out/events8.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000").as("tms")) // integral div: nanos exceed 2^53, double would round
    def sessions(tpe: String, p: String) =
      Relational.sessionize(ev.filter(col("event_type") === tpe), "user_id",
          col("tms"), col("event_id"), gapMillis = 86400000L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(min("tms").as(s"${p}_s"), max("tms").as(s"${p}_e"))
        .select(col("user_id").as(s"${p}_user"), col("session_id").as(s"${p}_sid"),
          col(s"${p}_s"), col(s"${p}_e"))
    time("interval overlap xf")(
      Relational.intervalOverlapJoin(
        sessions("click", "a"), sessions("view", "b"),
        col("a_user"), col("b_user"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"),
        cellWidth = 86400000L).count())
    // the native merge exec on the same inputs (round 12, Q114): no cell
    // explode on either side, state = concurrent intervals per key
    time("interval native xf")(
      graft.plans.GraftIntervalJoin.intervalJoinMerge(
        sessions("click", "a"), sessions("view", "b"),
        Seq("a_user"), Seq("b_user"), "a_s", "a_e", "b_s", "b_e",
        broadcast = Some(false)).count())
  }

  /** SERVING-mode soak (`ScaleProbe <f> serving`): M concurrent hub
    * routes × N enqueue/drain rounds, each route a watermarked tumbling-
    * window aggregation — the production claim under test is that
    * long-running serving state is BOUNDED: the 20 s watermark evicts
    * closed windows, so rows-in-state (read from each route's
    * StateOperatorProgress) must plateau at (live windows × keys), not
    * grow with rounds. Asserts (1) the late-half state peak does not
    * exceed the early-half peak ×1.5 (plateau, not growth), (2) state
    * stays far below the unbounded-accumulation line (rounds × keys),
    * (3) every route is still live and has served finalized windows.
    * `factor` scales rows per round; state bounds are row-count-free by
    * design, so the assertion holds at every factor.
    */
  /** Tar-shard IO probe (`ScaleProbe <f> tar`): f×2,000 WebDataset
    * samples (a ~5 KB binary member + a caption member each) written as
    * 16 key-partitioned shards, then read back three ways. The scale
    * claim under test: shard write/read cost tracks total BYTES (the
    * format is one sequential pass per shard) — time per MB should be
    * flat across factors, and samples() adds only the per-shard groupBy.
    */
  /** Frontier probe: the bloom novelty gate, T27 admission and the p13
    * capped politeness schedule over a FIXED 30-host rule set while the
    * URL volume grows ×factor — the traps this disproves are
    * parallelism collapsing to |hosts| (the q102 window shape) and the
    * already-crawled check shuffling the ledger at every tick:
    * the novel gate is a broadcast bloom + an anti-join whose candidate
    * side is only the flagged fraction (`Dedup.frontierNovel`, ledger =
    * every 5th URL), admission is a broadcast join + array lambda
    * (narrow, scales with cores), and the capped schedule's
    * WindowGroupLimit keeps ≤5 rows/host/partition ahead of the only
    * exchange — so wall time must track the SCAN, not |hosts| or the
    * ledger.
    */
  /** T29/S10 probe: BM25 and MRL truncation at ×factor — both must stay
    * scan-bound: bm25's tf table is bounded by |docs|·|Q| regardless of
    * corpus width, top-k exchanges ≤ k pairs/task through the heap agg,
    * and mrlTruncate is a pure narrow pass.
    */
  private def retrieval(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Similarity, TextAnalysis}
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val reps = spark.range(factor.toLong).select(col("id").as("rep"))
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/docs_retrieval.parquet")
    val d = spark.read.parquet(s"$out/docs_retrieval.parquet")
    println(s"[scale x$factor] retrieval docs=${nDocs * factor}")
    val terms = Seq("spark", "shuffle", "window", "merge", "join", "hash")
    timed(factor, "t22 bm25 scores")(
      TextAnalysis.bm25Scores(d, "doc_id", "text", terms).count())
    timed(factor, "t22 bm25 top-100")(
      TextAnalysis.bm25TopK(d, "doc_id", "text", terms, 100).count())
    writeEmbeddings(spark, src, out, factor)
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    timed(factor, "s09 mrl truncate d=32")(
      Similarity.mrlTruncate(emb, "vec_id", "embedding", 32).count())
  }

  /** IVFADC scale probe (s10, round 10): the production ANN query shape
    * vs the exact baseline as the corpus grows. At ×factor the corpus is
    * nEmb·factor vectors in the SAME 10 label cells, so an nprobe=1
    * IVFADC query scans corpus/10 PQ CODES (m longs each — the floats
    * are never read in the scan) while s01 brute force reads every
    * float vector for every query. Both are linear in corpus size —
    * the probe's evidence is the CONSTANT-FACTOR separation (bytes
    * touched per candidate) and that the ADC scan's wall time tracks
    * the PRUNED candidate count, not the corpus: the printed
    * `candidates` column is |probed cells' population|·|queries|,
    * 1/|cells| of what brute force scores. The exact re-rank tail
    * (ivfPqKnnRerank) adds a candidate-set-sized float read that does
    * NOT grow with the corpus (rerank·|queries| rows).
    */
  private def ivfpq(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.Similarity
    import org.apache.spark.sql.expressions.Window
    writeEmbeddings(spark, src, out, factor)
    val dim = 64; val m = 4; val k = 5
    // a serving-sized query batch: per-batch fixed costs (probe window,
    // distance tables) amortize over 256 queries, so the timing contrast
    // isolates the per-candidate scan cost — the quantity that matters
    // at corpus scale
    val isQ = col("vec_id") < 256
    for ((tag, path) <- Seq("x1" -> s"$src/embeddings.parquet",
        s"x$factor" -> s"$out/embeddings.parquet")) {
      val e = spark.read.parquet(path).localCheckpoint(true)
      val n = e.count()
      val cells = Similarity.centroidVectors(e, "label", "embedding")
        .localCheckpoint(true)
      val cb = Similarity.labelCodebooks(e, "label", "embedding", dim, m)
        .localCheckpoint(true)
      println(s"[scale x$factor] ivfpq $tag corpus=$n cells=${cells.count()} " +
        s"codebook=${cb.count()} entries")
      // index build: the ONCE cost a standing corpus amortizes
      var index: org.apache.spark.sql.DataFrame = null
      timed(factor, s"s10 build $tag") {
        index = Similarity.ivfPqIndex(e, "vec_id", "embedding", cells, cb, dim, m)
          .localCheckpoint(true)
        index.count()
      }
      // per-query-batch costs: the exact float scan vs the pruned code scan
      timed(factor, s"s01 brute $tag")(
        Similarity.knnBruteForce(e, e.filter(isQ), "vec_id", "embedding", k).count())
      timed(factor, s"s10 search $tag") {
        val sc = Similarity.ivfPqSearch(index, cells, cb, e.filter(isQ),
          "vec_id", "embedding", dim, m, nprobe = 1)
        val w = Window.partitionBy("query_id").orderBy(col("adc_d2"), col("neighbor_id"))
        sc.withColumn("rank", row_number().over(w)).filter(col("rank") <= k).count()
      }
    }
  }

  /** Round-10 stats-operator probe: Mann–Whitney / AUC, Kaplan–Meier,
    * and the Poisson bootstrap at ×factor orders. The scale claims under
    * test: mannWhitney/aucScore's only window runs over |DISTINCT
    * values| per group (ties collapse BEFORE the sort — replication
    * multiplies tie counts, not window rows), kaplanMeier's windows run
    * over |distinct durations|, and the bootstrap shuffles only
    * B·|groups| replicate partials however many rows fan out map-side.
    * All three should scale ~linearly in scan cost with flat shuffle
    * structure.
    */
  private def stats(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.{Relational, Sampling}
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val n = orders.count()
    val reps = spark.range(factor.toLong).select(col("id").as("rep"))
    orders.crossJoin(reps)
      .select((col("o_custkey") + col("rep") * 200000L).as("cust"),
        col("o_orderpriority").as("prio"),
        col("o_orderstatus").as("status"),
        // rep-jitter the price so replicas add tie MASS and some new
        // distinct values — the realistic shape
        (col("o_totalprice") + col("rep").cast("double") * 0.01).as("price"),
        col("o_orderdate").as("odate"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/orders_stats.parquet")
    val d = spark.read.parquet(s"$out/orders_stats.parquet").localCheckpoint(true)
    println(s"[scale x$factor] stats rows=${n * factor}")
    timed(factor, "q109 mann-whitney") {
      Relational.mannWhitney(d.filter(col("status").isin("O", "F")),
        Seq("prio"), col("status") === "O", col("price"), scale = 100L).count()
    }
    timed(factor, "t24 auc") {
      Relational.aucScore(d.filter(col("status").isin("O", "F")),
        Seq("prio"), col("status") === "O", col("price"), scale = 100L).count()
    }
    timed(factor, "q110 kaplan-meier") {
      val life = d.groupBy("cust")
        .agg(datediff(max(to_date(col("odate"))), min(to_date(col("odate"))))
          .cast("long").as("dur"),
          (pmod(col("cust"), lit(5L)) =!= 0L).cast("long").as("ev"))
      Relational.kaplanMeier(life, Seq.empty, col("dur"), col("ev")).count()
    }
    timed(factor, "q111 bootstrap b=200") {
      Sampling.poissonBootstrapMeanCI(
        d.select(col("prio"), col("cust"), col("price")),
        Seq("prio"), "cust", col("price"), b = 200).count()
    }
    // Round-10 second wave. Scale claims: mannKendall's quadratic pair
    // join runs on the DAILY pre-agg (replication multiplies per-day tie
    // mass, never the pair count); kruskalWallis/brownForsythe window
    // over |distinct cents| per group like mannWhitney; psiDrift's bins
    // come from the histogram; cmh/ratioSE are pure partial-agg reduces.
    timed(factor, "q113 mann-kendall (daily pre-agg)") {
      val daily = d.groupBy(col("prio"),
          datediff(to_date(col("odate")), lit("1995-01-01").cast("date")).as("x"))
        .agg(sum(floor(col("price") * 100.0 + 0.5).cast("long")).as("y"))
      Relational.mannKendall(daily, Seq("prio"), col("x"), col("y")).count()
    }
    timed(factor, "q114 kruskal-wallis") {
      Relational.kruskalWallis(d, Seq("prio"),
        (dayofweek(col("odate")) - 1).cast("long"), col("price")).count()
    }
    timed(factor, "q120 brown-forsythe") {
      Relational.brownForsythe(d, Seq("prio"),
        (dayofweek(col("odate")) - 1).cast("long"), col("price")).count()
    }
    timed(factor, "q117 cmh") {
      Relational.cmhTest(d.filter(col("status").isin("O", "F")), Nil,
        col("prio"), col("status") === "O", col("price") > 150000.0).count()
    }
    timed(factor, "q118 ratio-se") {
      Relational.ratioSE(d, Seq("prio"), col("price"),
        pmod(col("cust"), lit(10L)) + 1L, scaleY = 100L, scaleW = 1L).count()
    }
    timed(factor, "q119 psi") {
      Relational.psiDrift(d, Seq("prio"), col("price"),
        pmod(col("cust"), lit(2L)) === 0L).count()
    }
    // Round-10 third wave. Scale claims: anovaF is a windowless
    // partial-agg reduce + a k-row fold (pure scan cost); changePoint's
    // windows run over |days| rows after the daily pre-agg; kendallTau's
    // quadratic join runs over distinct (x,y) CELLS — the daily pre-agg
    // bounds cells at |days|, replication adds only tie mass.
    timed(factor, "q122 anova") {
      Relational.anovaF(d, Seq("prio"),
        (dayofweek(col("odate")) - 1).cast("long"), col("price")).count()
    }
    timed(factor, "q121 changepoint (daily pre-agg)") {
      Relational.changePoint(d, Seq("prio"), to_date(col("odate")),
        col("price")).count()
    }
    timed(factor, "q123 kendall-tau (daily pre-agg)") {
      val daily = d.groupBy(col("prio"), to_date(col("odate")).as("day"))
        .agg(count(lit(1)).as("x"),
          sum(floor(col("price") * 100.0 + 0.5).cast("long")).as("y"))
      Relational.kendallTau(daily, Seq("prio"), col("x"), col("y"),
        maxN = 5000, scaleX = 1L, scaleY = 1L).count()
    }
    timed(factor, "q124 seasonal-naive") {
      Relational.seasonalNaiveEval(d, Seq("prio"), to_date(col("odate")),
        col("price")).count()
    }
    timed(factor, "q125 welch-anova") {
      Relational.welchAnova(d, Seq("prio"),
        (dayofweek(col("odate")) - 1).cast("long"), col("price")).count()
    }
  }

  /** Round-11 operators at scale: the native band merge join vs the
    * binned equi-join composition it upgrades (events ×factor with user
    * ids SHIFTED per replica — keys multiply, so per-key band occupancy
    * stays constant while rows grow: the design contract), and sharded
    * HNSW build/search vs exact brute force on embeddings ×factor.
    */
  private def bandann(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)
    // events ×factor, keys shifted per replica
    val ev0 = eventsNanos(spark, src)
    val maxEv = ev0.agg(max(col("event_id"))).head().getLong(0) + 1
    val maxUser = ev0.agg(max(col("user_id"))).head().getLong(0) + 1
    val reps = spark.range(factor.toLong).select(col("id").as("rep"))
    ev0.crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * maxEv)
      .withColumn("user_id", col("user_id") + col("rep") * maxUser)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/events_band.parquet")
    val ev = spark.read.parquet(s"$out/events_band.parquet")
      .withColumn("tms", (col("ts") / 1000000L).cast("long"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("tms").as("p_ms"))
    val e2 = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"), col("tms").as("e_ms"))
    val band = 3600000L
    time("q126 band merge") {
      graft.plans.GraftBandJoin.bandJoinMerge(p, e2, Seq("p_user"), Seq("e_user"),
        "p_ms", "e_ms", -band, band, broadcast = Some(false)).count()
    }
    time("binned composition") {
      // the q25-style bin equi-join WITH the key folded into the bin join
      val w = 2 * band + 1
      def binOf(x: org.apache.spark.sql.Column) =
        ((x - pmod(x, lit(w))) / w).cast("long")
      val l = p.withColumn("_bin", explode(sequence(binOf(col("p_ms") - band), binOf(col("p_ms") + band))))
      val r = e2.withColumn("_rbin", binOf(col("e_ms")))
      l.join(r, col("_bin") === col("_rbin") && col("p_user") === col("e_user") &&
          col("e_ms") >= col("p_ms") - band && col("e_ms") <= col("p_ms") + band)
        .count()
    }
    // embeddings ×factor (writeEmbeddings' perturbed replicas)
    writeEmbeddings(spark, src, out, factor)
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val n = emb.count()
    val q = emb.orderBy("vec_id").limit(50)
    println(s"[scale x$factor] band events=${factor * 100000} embeddings=$n")
    time("s01 brute force") {
      graft.operators.Similarity.knnBruteForce(emb, q, "vec_id", "embedding", 10).count()
    }
    val shards = math.max(4, factor)
    var idx: DataFrame = null
    time(s"hnsw build x$shards") {
      idx = graft.operators.GraphAnn.hnswIndex(emb, "vec_id", "embedding", shards)
        .localCheckpoint(true)
      idx.count()
    }
    time("hnsw search") {
      graft.operators.GraphAnn.hnswSearch(idx, q, "vec_id", "embedding", 10).count()
    }
    // CORPUS-sized query set — the ceiling the broadcast path refuses:
    // every vector queries the index through the cogroup (|Q| = n, no
    // driver collect; per-task memory stays one shard's graph)
    time("hnsw search distributed (corpus as queries)") {
      graft.operators.GraphAnn.hnswSearchDistributed(
        idx, emb, "vec_id", "embedding", 10, shards).count()
    }
  }

  private def frontier(spark: SparkSession, factor: Int): Unit = {
    import graft.operators.Robots
    val hosts = 30
    val n = 200000L * factor
    val rules = spark.range(hosts.toLong)
      .select(concat(lit("host"), col("id"), lit(".example")).as("host"),
        explode(array(
          struct(lit("*").as("agent"), lit(false).as("allow"), lit("/private/").as("path")),
          struct(lit("*").as("agent"), lit(true).as("allow"), lit("/private/ok").as("path")),
          struct(lit("*").as("agent"), lit(false).as("allow"), lit("/*.pdf$").as("path")),
          struct(lit("graftbot").as("agent"), lit(false).as("allow"), lit("/nobots/").as("path")))).as("r"))
      .select(col("host"), col("r.agent"), col("r.allow"), col("r.path"),
        col("r.path").contains("*").or(col("r.path").contains("$")).as("has_wildcard"))
    val urls = spark.range(n)
      .select(col("id"),
        concat(lit("https://host"), pmod(col("id"), lit(hosts)), lit(".example"),
          when(col("id") % 7 === 0, concat(lit("/private/doc"), col("id")))
            .when(col("id") % 11 === 0, concat(lit("/nobots/doc"), col("id")))
            .when(col("id") % 13 === 0, concat(lit("/files/doc"), col("id"), lit(".pdf")))
            .otherwise(concat(lit("/page/doc"), col("id")))).as("url"))
    def stage(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[probe frontier x$factor] $name rows=$c ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // the already-crawled ledger: every 5th URL; the gate's output must
    // shuffle only the bloom-flagged fraction, so its wall time tracks
    // the candidate scan even as the ledger grows with the corpus
    val crawled = urls.where(col("id") % 5 === 0).select("url").localCheckpoint(true)
    val fresh = graft.operators.Dedup
      .frontierNovel(urls, crawled, "url", fpp = 0.01)
      .localCheckpoint(true)
    stage("novelgate")(fresh.count())
    val admitted = Robots.admit(fresh, rules, "graftbot")
      .where(col("robots_allowed")).localCheckpoint(true)
    stage("admit")(admitted.count())
    val byHost = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("id")
    stage("schedule5") {
      admitted
        .withColumn("host", graft.operators.Url.host(col("url")))
        .withColumn("wave", row_number().over(byHost))
        .where(col("wave") <= 5).count()
    }
  }

  /** The documented pre-bucket path for q94's quadratic-fit guard: at
    * sf1 each (event_type, day) group is ~6.9k points > maxN=2000 and
    * theilSen fails loud BY CONTRACT. The contract's escape hatch is
    * demonstrated here at exactly that shape (events ×factor): a salted
    * hash bucket joins the group key, every bucket fits the guard, and
    * the per-bucket exact fits aggregate to a median-of-buckets slope —
    * the standard approximation whose error shrinks with bucket size.
    * Parallelism = |groups|·|buckets|; the quadratic work stays LOCAL
    * per basket.
    */
  private def theilSenBucketed(spark: SparkSession, src: String, factor: Int): Unit = {
    import graft.sources.Tables
    val ev0 = Tables.events(spark, src)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .withColumn("day", to_date(col("ts")))
    val reps = spark.range(factor.toLong).select(col("id").as("_rep"))
    // replicate with a value nudge so replicas are distinct points
    val ev = ev0.crossJoin(reps)
      .withColumn("value", col("value") + col("_rep") * lit(0.001))
      .withColumn("xms", unix_millis(col("ts")) + col("_rep"))
    val buckets = math.max(1, (factor * 800) / 2000 + 1)
    val t0 = System.nanoTime()
    val fits = graft.operators.Relational.theilSen(
      ev.withColumn("_bkt", pmod(hash(col("xms"), col("value")), lit(buckets))),
      groupCols = Seq("event_type", "day", "_bkt"),
      xCol = col("xms"), yCol = col("value"),
      maxN = 2000, scaleX = 1L, scaleY = 100L)
    val agg = fits.groupBy("event_type", "day")
      .agg(expr("percentile(slope, 0.5)").as("slope"),
        sum(col("n_points")).as("n_points"))
    val rows = agg.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val pts = ev.count()
    println(f"[probe theilsen x$factor] points=$pts buckets=$buckets " +
      f"groups_out=$rows  fit=$sec%.2f s (guard-compliant: every basket ≤ 2000)")
  }

  private def tarShards(spark: SparkSession, out: String, factor: Int): Unit = {
    import spark.implicits._
    import graft.sources.TarShards
    val n = 2000 * factor
    val dir = s"$out/tar_probe"
    val rows = spark.range(n.toLong).select(col("id")).as[Long].flatMap { i =>
      // deterministic pseudo-random payload: xorshift over the id
      var x = i * 2654435761L + 1
      val payload = Array.tabulate(5120) { j =>
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; (x + j).toByte
      }
      Seq((f"k$i%09d", "bin", payload),
        (f"k$i%09d", "txt", s"caption $i".getBytes("UTF-8")))
    }.toDF("key", "ext", "content")
    val mb = n * 5.2 / 1024
    val t0 = System.nanoTime()
    TarShards.write(rows, dir, mode = org.apache.spark.sql.SaveMode.Overwrite,
      shards = Some(16))
    val wSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nEntries = TarShards.entries(spark, dir).count()
    val eSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val nSamples = TarShards.samples(spark, dir).count()
    val sSec = (System.nanoTime() - t2) / 1e9
    require(nEntries == 2L * n && nSamples == n.toLong,
      s"tar probe lost rows: $nEntries entries, $nSamples samples for $n")
    println(f"[probe tar x$factor] samples=$n ~${mb}%.0f MB  write=$wSec%.2fs " +
      f"(${mb / wSec}%.0f MB/s)  entries=$eSec%.2fs (${mb / eSec}%.0f MB/s)  " +
      f"samples()=$sSec%.2fs")
    // compact probe: 16 shards -> ~4; content survives, time tracks bytes
    val t3 = System.nanoTime()
    TarShards.compactShards(spark, dir, (mb * 1024 * 1024 / 4).toLong + 1)
    val cSec = (System.nanoTime() - t3) / 1e9
    val nAfter = TarShards.entries(spark, dir).count()
    require(nAfter == 2L * n, s"tar compact lost rows: $nAfter for ${2L * n}")
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar"))
    println(f"[probe tar x$factor] compact 16->$files shards  $cSec%.2fs " +
      f"(${mb / cSec}%.0f MB/s)")
    // manifest probe (M9): digest = one sequential read per shard; the
    // verify diff is |shards|-row metadata — wall must track bytes
    val t4 = System.nanoTime()
    graft.sources.Manifests.write(spark, dir, "*.tar")
    val mSec = (System.nanoTime() - t4) / 1e9
    val t5 = System.nanoTime()
    require(graft.sources.Manifests.verify(spark, dir, "*.tar").isEmpty,
      "fresh manifest must verify clean")
    val vSec = (System.nanoTime() - t5) / 1e9
    println(f"[probe tar x$factor] manifest write=$mSec%.2fs " +
      f"(${mb / mSec}%.0f MB/s)  verify=$vSec%.2fs (${mb / vSec}%.0f MB/s)")
    // key-index probe: build over the compacted layout, then point-lookup
    // 3 keys — the read must open only the hit shards
    val t6 = System.nanoTime()
    TarShards.writeKeyIndex(spark, dir)
    val iSec = (System.nanoTime() - t6) / 1e9
    val keys = Seq(0, n / 2, n - 1).map(i => f"k$i%09d")
    val t7 = System.nanoTime()
    val hit = TarShards.shardsForKeys(spark, dir, keys)
    val looked = TarShards.lookupSamples(spark, dir, keys).count()
    val lSec = (System.nanoTime() - t7) / 1e9
    require(looked == keys.size.toLong && hit.size <= keys.size,
      s"key lookup: $looked rows via ${hit.size} shards")
    println(f"[probe tar x$factor] keyindex build=$iSec%.2fs  " +
      f"lookup(3 keys)=$lSec%.2fs via ${hit.size}/$files shards")
  }

  /** WARC crawl-ingestion probe (`ScaleProbe <f> warc`): f×2,000 synthetic
    * HTML pages (a prose paragraph + a nav bar + a link farm each, ~4 KB)
    * written as 16 url-partitioned .warc.gz shards, read back through
    * responses(), then boilerplate-extracted with Html.htmlMainText. The
    * scale claims under test: (1) shard IO tracks total bytes (one
    * sequential gzip pass per shard); (2) the HTML scanner is linear in
    * input chars — extract time per MB flat across factors.
    */
  private def warcShards(spark: SparkSession, out: String, factor: Int): Unit = {
    import spark.implicits._
    import graft.sources.WarcShards
    val n = 2000 * factor
    val dir = s"$out/warc_probe"
    val rows = spark.range(n.toLong).select(col("id")).as[Long].map { i =>
      val prose = (1 to 12).map(k => s"Sentence $k of article $i carries real page prose.")
        .mkString(" ")
      val nav = (1 to 8).map(k => s"""<a href="/nav$k">Section $k</a>""").mkString(" | ")
      val farm = (1 to 20).map(k => s"""<a href="http://f.example/$i/$k">link $k</a>""")
        .mkString("<div>", " ", "</div>")
      val html = s"<html><head><title>Page $i</title></head><body>" +
        s"<div>$nav</div><p>$prose</p><p>$prose</p>$farm</body></html>"
      (s"http://probe.example/$i", "2026-01-01T00:00:00Z", "text/html",
        html.getBytes("UTF-8"))
    }.toDF("url", "warc_date", "content_type", "body")
    val mb = n * 4.0 / 1024
    val t0 = System.nanoTime()
    WarcShards.write(rows, dir, mode = org.apache.spark.sql.SaveMode.Overwrite,
      shards = Some(16))
    val wSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val resp = WarcShards.responses(spark, dir)
    val nResp = resp.count()
    val rSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val extracted = resp.select(
        graft.operators.Html.htmlMainText(col("body").cast("string")).as("text"))
      .filter(length(col("text")) > 0)
    val nKept = extracted.count()
    val xSec = (System.nanoTime() - t2) / 1e9
    require(nResp == n.toLong && nKept == n.toLong,
      s"warc probe lost rows: $nResp responses, $nKept extracted for $n")
    println(f"[probe warc x$factor] pages=$n ~${mb}%.0f MB  write=$wSec%.2fs " +
      f"(${mb / wSec}%.0f MB/s)  responses=$rSec%.2fs (${mb / rSec}%.0f MB/s)  " +
      f"extract=$xSec%.2fs (${mb / xSec}%.0f MB/s)")
    // compact probe: byte-level gzip-member concat, 16 shards -> ~4
    val t3 = System.nanoTime()
    WarcShards.compactShards(spark, dir, (mb * 1024 * 1024 / 4).toLong + 1)
    val cSec = (System.nanoTime() - t3) / 1e9
    val nAfter = WarcShards.responses(spark, dir).count()
    require(nAfter == n.toLong, s"warc compact lost rows: $nAfter for $n")
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc.gz"))
    println(f"[probe warc x$factor] compact 16->$files shards  $cSec%.2fs " +
      f"(${mb / cSec}%.0f MB/s, pure byte concat)")
  }

  /** Composed crawl-curation probe (`ScaleProbe <f> crawl`) — the whole
    * Common Crawl front chained END TO END at probe scale, every stage a
    * graft operator: WARC shards → responses() → Html.mainText →
    * Url.canonicalize/registeredDomain → exact dedup on the canonical
    * URL → token-count quality gate → MinHash near-dedup → per-domain
    * rollup. The synthetic corpus makes every stage's output count
    * PROVABLE: each article is served at two URL spellings differing
    * only by tracking param and host case (canonical dedup must halve),
    * and articles come in near-dup twins differing by one token of ~81
    * (near-dedup must halve again); articles draw 80 tokens from a
    * 5,000-word vocabulary so cross-article Jaccard ~1% (no false
    * merges). Counts are REQUIREd exact, times logged per stage.
    */
  private def crawlE2e(spark: SparkSession, out: String, factor: Int): Unit = {
    import spark.implicits._
    import graft.operators.{Dedup, Html, Url}
    import graft.sources.WarcShards
    val m = 1000 * factor           // articles (near-dup twins: (2k, 2k+1))
    val n = 2 * m                   // pages: each article at 2 url spellings
    val dir = s"$out/crawl_probe"

    def stage[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe crawl x$factor] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val pages = spark.range(m.toLong).select(col("id")).as[Long].flatMap { a =>
      val topic = a / 2 // twins share the prose, differ by the marker token
      // bit-mixed token draws — an arithmetic progression here makes
      // DIFFERENT topics share stride-aligned token sets (measured: the
      // near-dup graph chained past diameter 20 at x10)
      val prose = (1 to 80).map { j =>
        val x0 = topic * 2654435761L + j * 1013904223L
        val x1 = x0 ^ (x0 >>> 16)
        s"w${math.floorMod((x1 * 2246822519L) >>> 13, 5000)}"
      }.mkString(" ")
      val html = s"<html><head><title>Article $a</title></head><body>" +
        s"""<div><a href="/home">Home</a> | <a href="/next">Next</a></div>""" +
        s"<p>the $prose and marker$a</p></body></html>"
      val site = s"site${topic % 50}" // twins share a site, like real near-dup crawls
      Seq(
        (s"http://$site.example/art/$a?id=$a", html),
        (s"HTTP://${site.toUpperCase}.EXAMPLE/art/$a?id=$a&utm_source=feed", html))
    }.map { case (u, h) => (u, "2026-01-01T00:00:00Z", "text/html", h.getBytes("UTF-8")) }
      .toDF("url", "warc_date", "content_type", "body")

    stage("write_warc") {
      WarcShards.write(pages, dir, mode = org.apache.spark.sql.SaveMode.Overwrite,
        shards = Some(16))
    }
    val extracted = stage("responses+html+url") {
      val e = WarcShards.responses(spark, dir)
        .select(
          Url.canonicalize(col("url")).as("canon"),
          Url.registeredDomain(col("url")).as("domain"),
          Html.htmlMainText(col("body").cast("string")).as("text"))
        .localCheckpoint(true)
      require(e.count() == n.toLong, s"expected $n responses")
      e
    }
    val exact = stage("exact_url_dedup") {
      // one survivor per canonical URL, deterministically the min struct
      val d = extracted.groupBy("canon")
        .agg(min(struct(col("domain"), col("text"))).as("_r"))
        .select(col("canon"), col("_r.domain").as("domain"), col("_r.text").as("text"))
        .localCheckpoint(true)
      require(d.count() == m.toLong,
        s"canonical dedup must collapse the two spellings: expected $m")
      d
    }
    val gated = stage("quality_gate") {
      val g = exact.filter(size(split(col("text"), " ")) >= lit(30))
      require(g.count() == m.toLong, "clean synthetic corpus: the gate drops nothing")
      g
    }
    val near = stage("near_dedup") {
      val nd = Dedup.nearDedup(gated, "canon", "text", 0.8).localCheckpoint(true)
      require(nd.count() == m.toLong / 2,
        s"near-dedup must collapse each twin pair: expected ${m / 2}")
      nd
    }
    stage("domain_rollup") {
      val roll = near.groupBy("domain").agg(count(lit(1)).as("docs"))
      require(roll.count() == 50, "50 registered domains by construction")
    }
    println(f"[probe crawl x$factor] pages=$n -> curated=${m / 2} (exact 2:1, near 2:1)")
  }

  /** Mixer-trio trend (X10/X11/X12): documents ×factor with the 20 source
    * groups HELD CONSTANT (the realistic shape — a bigger corpus, the same
    * mix), budgets scaled ×factor so the selected fraction stays fixed.
    * takeToBudget's histogram-cutpoint plan (round 8) shuffles only the
    * per-(group, hash-bucket) histogram plus the boundary buckets —
    * admission is a narrow broadcast filter, so selection cost tracks the
    * SCAN, not |groups|; epochMix/annealMix are shuffle-free broadcasts —
    * so all three should trend ~linear in the scan. The |groups|=5 leg is
    * the shape that killed the old per-group-window plan (100 TB into 5
    * sort tasks); here it must cost the same as the 20-group leg.
    */
  private def mixer(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    import graft.operators.Sampling
    def time(name: String)(f: => Long): Unit = timed(factor, name)(f)

    val reps = spark.range(factor).select(col("id").as("rep"))
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "source", "n_chars")
    val maxId = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1
    docs0.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * maxId)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$out/docs_mixer.parquet")
    val docs = spark.read.parquet(s"$out/docs_mixer.parquet")
    println(s"[scale x$factor] docs=${docs.count()} groups=20")

    val budgets = (0 until 20)
      .map(i => s"src$i" -> (1000L + 400L * i) * factor).toMap
    time("x10 takeToBudget xf")(
      Sampling.takeToBudget(docs, "source", "n_chars", "doc_id",
        budgets, salt = "sp:").count())
    // few-sources leg: 5 coarse sources over the whole corpus — the
    // realistic LLM-mix cardinality and the old plan's worst case
    // (corpus sort-shuffled into 5 tasks). Budget = half each coarse
    // group's weight, so the boundary search does real work.
    val coarse = docs.withColumn("source",
      concat(lit("mix"), pmod(hash(col("source")), lit(5))))
    val half = coarse.groupBy("source").agg(sum("n_chars").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1) / 2).toMap
    time("x10 takeToBudget 5grp")(
      Sampling.takeToBudget(coarse, "source", "n_chars", "doc_id",
        half, salt = "sp5:").count())
    val epochs = (0 until 20).map(i => s"src$i" -> (1000L + (i % 5) * 500L)).toMap
    time("x11 epochMix xf")(
      Sampling.epochMix(docs, "source", "doc_id", epochs, salt = "sp:").count())
    val start = (0 until 20).map(i => s"src$i" -> (1000L - (i % 5) * 200L)).toMap
    val end = (0 until 20).map(i => s"src$i" -> (200L + (i % 5) * 200L)).toMap
    time("x12 annealMix xf")(
      Sampling.annealMix(docs, "source", "doc_id", start, end,
        phases = 4, salt = "sp:").count())
  }

  private def serving(spark: SparkSession, factor: Int): Unit = {
    import spark.implicits._
    import graft.streaming.ServingHub
    // streaming state-store instances = shuffle partitions; the probe's
    // 64 would mean 64 stores × M routes of pure overhead at this scale
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val hub = new ServingHub(spark)
    val routesN = 4
    val rounds = 30
    val rowsPerRound = 500 * factor
    val keys = 50
    val inputs = (0 until routesN).map { r =>
      val in = hub.openInput[(java.sql.Timestamp, Long, Double)](s"soak_in_$r")
      val served = in.stream.toDF("ts", "k", "v")
        .withWatermark("ts", "20 seconds")
        .groupBy(window(col("ts"), "10 seconds"), col("k"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      hub.route(s"soak_out_$r", served)
      in
    }
    def stateRows: Long = spark.streams.active
      .filter(q => Option(q.name).exists(_.startsWith("soak_out_")))
      .flatMap(q => Option(q.lastProgress))
      .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
    val base = 1700000000000L
    var earlyPeak = 0L
    var latePeak = 0L
    val t0 = System.nanoTime()
    for (round <- 0 until rounds) {
      val ts = base + round * 10000L // event time advances one window per round
      inputs.foreach { in =>
        in.put((0 until rowsPerRound).map(i =>
          (new java.sql.Timestamp(ts + (i % 10) * 1000L), (i % keys).toLong,
            (i % 7).toDouble)): _*)
      }
      hub.processAllAvailable()
      val sr = stateRows
      if (round < rounds / 2) earlyPeak = math.max(earlyPeak, sr)
      else latePeak = math.max(latePeak, sr)
      if (round % 5 == 4)
        println(f"[probe serving x$factor] round=${round + 1}%2d state_rows=$sr")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    require(hub.isActive, "a route died during the soak")
    require(latePeak <= math.max(1L, (earlyPeak * 1.5).toLong),
      s"serving state grew across the soak: early peak $earlyPeak, late peak $latePeak")
    require(latePeak < rounds.toLong * keys * routesN,
      s"serving state tracks rounds (unbounded accumulation): $latePeak")
    val servedWindows = (0 until routesN).map(r => spark.table(s"soak_out_$r").count()).sum
    require(servedWindows > 0, "no finalized windows served")
    val enq = rounds.toLong * rowsPerRound * routesN
    println(f"[probe serving x$factor] routes=$routesN rounds=$rounds enqueued=$enq " +
      f"served_windows=$servedWindows state_early_peak=$earlyPeak " +
      f"state_late_peak=$latePeak ${secs}%.1f s")
    hub.stop()
  }
}
