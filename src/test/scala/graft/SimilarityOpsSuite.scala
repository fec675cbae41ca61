package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Generic-surface behaviors of the similarity operators beyond the oracle
  * bindings — in particular the ivfKnn plan hazards the round-2 review
  * called out: the assignment must be a single aggregation pass (no
  * per-vector window sort, no duplicated corpus scan).
  */
class SimilarityOpsSuite extends SparkSpec {

  private def cellsOf(cs: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cs.toDF("clabel", "cv")
  }

  private def corpusOf(vs: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    vs.toDF("vec_id", "embedding")
  }

  test("ivfKnn assigns to nearest centroid and ranks within the probed cell only") {
    import spark.implicits._
    val corpus = corpusOf(Seq(
      0L -> Seq(1.0f, 0.1f),  // query; nearest centroid 0
      1L -> Seq(1.0f, 0.0f),  // cell 0
      2L -> Seq(0.9f, 0.2f),  // cell 0
      3L -> Seq(0.1f, 1.0f),  // cell 1
      4L -> Seq(0.0f, 1.0f))) // cell 1
    val cells = cellsOf(Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0)))
    val got = Similarity.ivfKnn(corpus, "vec_id", "embedding", cells,
        isQuery = col("vec_id") < 1, k = 5)
      .select("query_id", "cell", "rank", "neighbor_id")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // only cell-0 mates are candidates; id 1 is closer to the query than 2
    assert(got == Seq((0L, 0L, 1L, 1L), (0L, 0L, 2L, 2L)))
  }

  test("ivfKnn centroid ties break to the smallest label") {
    import spark.implicits._
    val corpus = corpusOf(Seq(
      0L -> Seq(1.0f, 1.0f),  // equidistant from both centroids
      1L -> Seq(1.0f, 0.9f))) // also nearer-to-tied, same resolution
    val cells = cellsOf(Seq(1L -> Seq(0.0, 1.0), 0L -> Seq(1.0, 0.0)))
    val got = Similarity.ivfKnn(corpus, "vec_id", "embedding", cells,
        isQuery = col("vec_id") < 1, k = 1)
      .select("query_id", "cell", "neighbor_id").as[(Long, Long, Long)].collect().toSeq
    // the tied query lands in cell 0 (smallest label), as does its neighbor
    assert(got == Seq((0L, 0L, 1L)))
  }

  test("ivfKnn nprobe > 1 recovers neighbors from the second-nearest cell") {
    import spark.implicits._
    // query sits just on the cell-0 side of the boundary; its true nearest
    // neighbor landed in cell 1 — the classic IVF probe-1 recall miss
    val corpus = corpusOf(Seq(
      0L -> Seq(1.0f, 0.9f),   // query → cell 0 (barely)
      1L -> Seq(0.9f, 1.0f),   // cell 1, TRUE nearest neighbor
      2L -> Seq(1.0f, 0.0f)))  // cell 0, farther
    val cells = cellsOf(Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0)))
    def neighbors(p: Int) =
      Similarity.ivfKnn(corpus, "vec_id", "embedding", cells,
          isQuery = col("vec_id") < 1, k = 1, nprobe = p)
        .select("neighbor_id").as[Long].collect().toSeq
    assert(neighbors(1) == Seq(2L), "probe-1 only sees the query's own cell")
    assert(neighbors(2) == Seq(1L), "probe-2 finds the true neighbor across the boundary")
  }

  test("annLsh hot-bucket cap drops degenerate buckets from the join") {
    import spark.implicits._
    // 50 identical vectors share one bucket: an uncapped within-bucket
    // join is quadratic; a binding cap removes the bucket entirely
    val corpus = corpusOf((0L until 50L).map(i => i -> Seq(1.0f, 0.5f)))
    val planes = graft.queries.Similarity.planes
    assert(Similarity.annLsh(corpus, "vec_id", "embedding", planes).count() == 50)
    assert(Similarity.annLsh(corpus, "vec_id", "embedding", planes,
      maxBucketDf = 10).count() == 0)
  }

  test("annLsh plan: bucket cap is partial-agg + semi-join; only the rank window remains") {
    import spark.implicits._
    // the cap must NOT be a count window over the bucket key (it would
    // buffer a degenerate bucket whole in one task); the only WindowExec
    // allowed is the final per-vector top-1 rank, whose partition size is
    // bounded by maxBucketDf by construction.
    val corpus = corpusOf((0L until 32L).map(i => i -> Seq(i.toFloat / 32f, 1f - i.toFloat / 32f)))
    val df = Similarity.annLsh(corpus, "vec_id", "embedding",
      graft.queries.Similarity.planes, maxBucketDf = 10)
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val nodes = collectAll(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[WindowExec]) == 1,
      "bucket-df cap must be partial-agg + semi-join (d02 discipline); " +
        "only the bounded per-vector rank window may remain")
  }

  test("ivfKnn plan: assignment is aggregation, not a window; one window total") {
    import spark.implicits._
    val corpus = corpusOf((0L until 64L).map(i =>
      i -> Seq((i % 8).toFloat + 1f, (i % 3).toFloat)))
    val cells = cellsOf(Seq(0L -> Seq(1.0, 0.1), 1L -> Seq(0.3, 1.0)))
    val df = Similarity.ivfKnn(corpus, "vec_id", "embedding", cells,
      isQuery = col("vec_id") < 4, k = 3)
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val nodes = collectAll(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[WindowExec]) == 1,
      "only the final top-k ranking may use a window; centroid assignment " +
        "must be the max_by aggregation (no per-vector sort)")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "corpus×centroid products must be broadcast, never a cartesian shuffle")
  }

  test("sizedPlanes keeps expected bucket size constant as the corpus grows") {
    import spark.implicits._
    import graft.operators.Similarity
    // generator parity: the verified s02 planes come from the same stream
    assert(Similarity.genPlanes(8, 64) == graft.queries.Similarity.planes)
    // sizing rule: planes = ceil(log2(n / target)), floored at 4
    assert(Similarity.sizedPlanes(40000, 8, 64).length == 13)
    assert(Similarity.sizedPlanes(100, 64, 64).length == 4)
    // empirically: a uniform-ish corpus lands near the target bucket size
    val rnd = new scala.util.Random(3)
    val n = 4096
    val df = (0 until n).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
    val planes = Similarity.sizedPlanes(n, targetBucketSize = 8, dim = 16)
    val sizes = df.select(Similarity.lshBucket(col("vec"), planes).as("b"))
      .groupBy("b").count().select("count").as[Long].collect()
    val mean = sizes.sum.toDouble / sizes.length
    assert(mean >= 2 && mean <= 32, s"mean occupied-bucket size $mean should track target 8")
  }

  /** Two well-separated direction blobs for the spherical-k-means tests:
    * members of a blob have pairwise cosine ~1, across blobs ~orthogonal.
    */
  private def blobs(perBlob: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    def near(base: Array[Float], id: Long) =
      (id, base.map(x => x + rnd.nextFloat() * 0.01f))
    val b1 = Array.fill(16)(0f).updated(0, 1f).updated(1, 0.2f)
    val b2 = Array.fill(16)(0f).updated(8, 1f).updated(9, -0.3f)
    (0 until perBlob).map(i => near(b1, i.toLong)) ++
      (0 until perBlob).map(i => near(b2, (100 + i).toLong))
  }

  test("kmeans separates direction blobs and assigns every row") {
    import spark.implicits._
    val df = blobs(20).toDF("vec_id", "embedding")
    val asg = Similarity.kmeans(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(asg.size == 40, "every input row gets exactly one cell")
    val cells1 = (0L until 20L).map(asg).toSet
    val cells2 = (100L until 120L).map(asg).toSet
    assert(cells1.size == 1 && cells2.size == 1, "each blob lands in one cell")
    assert(cells1 != cells2, "the blobs land in different cells")
  }

  test("kmeans assignment is layout-independent (repartition invariance)") {
    import spark.implicits._
    val df = blobs(15).toDF("vec_id", "embedding")
    val a = Similarity.kmeans(df, "vec_id", "embedding", 3, 1)
      .as[(Long, Long)].collect().toMap
    val b = Similarity.kmeans(df.repartition(7), "vec_id", "embedding", 3, 1)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "deterministic seeds + argmax assignment: layout cannot matter")
  }

  test("kmeans tolerates k larger than the corpus (fewer seeds, no crash)") {
    import spark.implicits._
    val df = blobs(2).toDF("vec_id", "embedding") // 4 vectors, k = 9
    val asg = Similarity.kmeans(df, "vec_id", "embedding", 9, 1)
      .as[(Long, Long)].collect()
    assert(asg.length == 4)
  }

  test("semanticDedup prunes lower-id near-dups within a cell only") {
    import spark.implicits._
    import graft.operators.Dedup
    // blob members are pairwise near-identical (cos ~ 1): within each
    // cell only the smallest id survives a tight threshold
    val df = blobs(5).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(df, "vec_id", "embedding",
        k = 2, iters = 1, thr = 0.999)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got.size == 10, "one output row per input row")
    assert(got(0L) && got(100L), "cell-minimum ids are kept")
    assert((1L until 5L).forall(!got(_)), "blob-1 near-dups pruned")
    assert((101L until 105L).forall(!got(_)), "blob-2 near-dups pruned")
    // a loose-enough k-means cut with an impossible threshold prunes nothing
    val none = Dedup.semanticDedup(df, "vec_id", "embedding", 2, 1, thr = 1.1)
      .filter(!col("keep")).count()
    assert(none == 0)
  }

  // two well-separated values per subspace half: vectors are built from
  // per-subspace "letters", so PQ with k=2 per subspace can code exactly
  private def pqCorpus: Seq[(Long, Seq[Float])] = {
    val lo = Seq(0.0f, 0.1f); val hi = Seq(5.0f, 5.1f)
    Seq(
      (0L, lo ++ lo), (1L, lo ++ hi), (2L, hi ++ lo), (3L, hi ++ hi),
      (4L, lo.map(_ + 0.01f) ++ lo), (5L, hi ++ hi.map(_ - 0.01f)))
  }

  test("pq: encode compresses letter-built vectors losslessly to codes") {
    import spark.implicits._
    val df = pqCorpus.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(df, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2)
    assert(cb.count() == 4) // 2 subspaces x 2 codes
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb, dim = 4, m = 2)
      .as[(Long, Seq[Long])].collect().toMap
    // same-letter vectors share the subspace code; different letters differ
    assert(codes(0L)(0) == codes(1L)(0) && codes(0L)(0) == codes(4L)(0))
    assert(codes(2L)(0) == codes(3L)(0) && codes(2L)(0) != codes(0L)(0))
    assert(codes(0L)(1) == codes(2L)(1) && codes(1L)(1) == codes(3L)(1))
    assert(codes(0L)(1) != codes(1L)(1))
    // layout independence: encoding survives a repartition
    val codes2 = Similarity.pqEncode(df.repartition(7), "vec_id", "embedding",
        cb, dim = 4, m = 2).as[(Long, Seq[Long])].collect().toMap
    assert(codes == codes2)
  }

  test("pq: ADC distance equals exact L2^2 to the reconstructed vector") {
    import spark.implicits._
    val df = pqCorpus.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(df, "vec_id", "embedding", 4, 2, 2, 2)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb, 4, 2)
    val queries = Seq((100L, Seq(0.05f, 0.05f, 5.05f, 5.05f))).toDF("vec_id", "embedding")
    val knn = Similarity.pqKnn(codes, cb, queries, "vec_id", "embedding",
        dim = 4, m = 2, k = 6)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(knn.length == 6)
    // reconstruct each corpus vector from its codes and compare distances
    val book = cb.as[(Int, Long, Seq[Double])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    val codeMap = codes.as[(Long, Seq[Long])].collect().toMap
    // the engine widens float32 inputs to double: compare against the
    // widened values, not the decimal literals
    val qv = Seq(0.05f, 0.05f, 5.05f, 5.05f).map(_.toDouble)
    knn.foreach { case (_, _, nid, adc) =>
      val rec = codeMap(nid).zipWithIndex.flatMap { case (c, s) => book((s, c)) }
      val exact = qv.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc - BigDecimal(exact).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6,
        s"ADC identity violated for $nid: $adc vs $exact")
    }
    // nearest neighbor is the hi-hi corner the query sits closest to? no:
    // query is lo-lo in subspace 0 and hi-hi in subspace 1 -> vec 1
    assert(knn.find(_._2 == 1L).map(_._3).contains(1L),
      s"rank-1 should be the matching-letter vector: ${knn.toSeq}")
  }

  test("ivfPqKnn: cell pruning + ADC identity survive the composition") {
    import spark.implicits._
    // two direction clusters (coarse cells) × two PQ letters per subspace
    val corpus = Seq(
      (0L, Seq(5.0f, 5.0f, 0.12f, 0.12f)), // query; cell 0
      (1L, Seq(5.0f, 5.0f, 0.1f, 0.1f)),   // cell 0
      (2L, Seq(5.1f, 4.9f, 0.1f, 0.2f)),   // cell 0
      (3L, Seq(4.9f, 5.1f, 0.15f, 0.1f)),  // cell 0
      (4L, Seq(0.1f, 0.1f, 5.0f, 5.0f)),   // cell 1
      (5L, Seq(0.1f, 0.2f, 5.1f, 5.0f)),   // cell 1
      (6L, Seq(0.2f, 0.1f, 5.0f, 5.1f))    // cell 1
    ).toDF("vec_id", "embedding")
    val cells = cellsOf(Seq(0L -> Seq(1.0, 1.0, 0.0, 0.0), 1L -> Seq(0.0, 0.0, 1.0, 1.0)))
    val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 3)
    val got = Similarity.ivfPqKnn(corpus, "vec_id", "embedding", cells, cb,
        isQuery = col("vec_id") === 0, dim = 4, m = 2, k = 10)
      .as[(Long, Long, Long, Long, Double)].collect()
    // cell pruning: only the query's own cell is scanned
    assert(got.map(_._4).toSet == Set(1L, 2L, 3L),
      s"nprobe=1 must scan cell 0 only: ${got.toSeq}")
    assert(got.forall(_._2 == 0L))
    // ADC identity THROUGH the composition: adc_d2 = L2² to the
    // reconstructed vector, reconstructed independently here
    val book = cb.as[(Int, Long, Seq[Double])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb, 4, 2)
      .as[(Long, Seq[Long])].collect().toMap
    val qv = Seq(5.0f, 5.0f, 0.12f, 0.12f).map(_.toDouble)
    got.foreach { case (_, _, _, nid, adc) =>
      // replay the engine's arithmetic: per-subspace left-to-right fold,
      // partials summed (2 terms — commutative, so row order is moot),
      // then the same mirror-round floor(x·1e6 + 0.5)/1e6
      val exact = codes(nid).zipWithIndex.map { case (c, s) =>
        val cv = book((s, c))
        val qs = qv.slice(s * 2, s * 2 + 2)
        qs.zip(cv).foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) }
      }.sum
      val mirrored = math.floor(exact * 1e6 + 0.5) / 1e6
      assert(math.abs(adc - mirrored) < 1e-9,
        s"ADC identity violated for $nid: $adc vs $exact")
    }
  }

  test("ivfPqKnnRerank: recall vs exact top-k on planted clusters") {
    import spark.implicits._
    // 3 direction clusters × 20 members, deterministic noise
    val rnd = new scala.util.Random(11)
    val dirs = Seq(Seq(1.0, 0.0, 0.0, 0.2), Seq(0.0, 1.0, 0.2, 0.0),
      Seq(0.1, 0.0, 1.0, 1.0))
    val corpus = (for {
      (d, ci) <- dirs.zipWithIndex
      i <- 0 until 20
    } yield ((ci * 100 + i).toLong,
      d.map(x => (x * 5.0 + rnd.nextGaussian() * 0.15).toFloat)))
      .toDF("vec_id", "embedding")
    val cells = cellsOf(dirs.zipWithIndex.map { case (d, i) => i.toLong -> d })
    val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dim = 4, m = 2, k = 8, iters = 3)
    val isQ = col("vec_id").isin(0L, 100L, 200L)
    val k = 5
    val exact = Similarity.knnBruteForce(corpus,
        corpus.filter(isQ), "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val ivf = Similarity.ivfPqKnnRerank(corpus, "vec_id", "embedding",
        cells, cb, isQ, dim = 4, m = 2, k = k, rerank = 15)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    assert(ivf.keySet == exact.keySet)
    val recall = exact.map { case (q, e) => (e & ivf(q)).size.toDouble / k }
      .sum / exact.size
    assert(recall >= 0.8,
      s"IVFADC+rerank recall@$k = $recall vs exact (want >= 0.8)")
    // re-ranked scores are EXACT cosines: rank-1 per query must agree
    // with brute force (same cell by construction)
    val exactTop = Similarity.knnBruteForce(corpus, corpus.filter(isQ),
        "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ivfTop = Similarity.ivfPqKnnRerank(corpus, "vec_id", "embedding",
        cells, cb, isQ, dim = 4, m = 2, k = 1, rerank = 15)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(ivfTop == exactTop, s"$ivfTop vs $exactTop")
  }

  test("residual IVFPQ: ADC identity on residuals; beats non-residual at equal bytes") {
    import spark.implicits._
    // 3 well-separated clusters; within-cluster structure is a ±1 sign
    // pattern per subspace (PQ-representable EXACTLY with k=2 residual
    // codes), while a NON-residual k=2 codebook must cover 3 cluster
    // positions × 2 offsets per subspace with 2 codes — forced collisions.
    val centers = Seq(Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0),
      Seq(0.0, 0.0, 10.0, 10.0))
    val corpus = (for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 12
    } yield {
      val s1 = if (j % 2 == 0) 1.0 else -1.0   // subspace 1 offset sign
      val s2 = if ((j / 2) % 2 == 0) 1.0 else -1.0 // subspace 2 offset sign
      ((ci * 100 + j).toLong, Seq(
        (c(0) + s1).toFloat, (c(1) + s1 * 0.5).toFloat,
        (c(2) + s2).toFloat, (c(3) + s2 * 0.5).toFloat))
    }).toDF("vec_id", "embedding")
    val cells = cellsOf(centers.zipWithIndex.map { case (c, i) => i.toLong -> c })
    val cbRaw = Similarity.pqCodebooks(corpus, "vec_id", "embedding", 4, 2, 2, 3)
    // ivfResiduals is the training-set producer for a LEARNED residual
    // codebook; here the within-cell structure is known exactly, so the
    // codebook is supplied as literals (the operator takes any codebook)
    // and the residual ADC becomes EXACT — recall must be 1.0
    val resTrain = Similarity.ivfResiduals(corpus, "vec_id", "embedding", cells)
    assert(resTrain.count() == 36 &&
      resTrain.columns.toSeq == Seq("vec_id", "cell", "rvec"))
    val cbRes = Seq(
      (0L, 0L, Seq(1.0, 0.5)), (0L, 1L, Seq(-1.0, -0.5)),
      (1L, 0L, Seq(1.0, 0.5)), (1L, 1L, Seq(-1.0, -0.5)))
      .toDF("sub", "code", "cv")
    val isQ = col("vec_id").isin(0L, 100L, 200L)
    val k = 3
    // exact L2 ground truth, same-cell (clusters are far apart, so the
    // global L2 top-k IS the within-cluster top-k)
    val vecs = corpus.as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def exactTop(q: Long): Set[Long] =
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (vecs(n).zip(vecs(q)).map { case (a, b) => (a - b) * (a - b) }.sum, n))
        .take(k).toSet
    def recallOf(residual: Boolean, cb: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfPqKnn(corpus, "vec_id", "embedding", cells, cb,
          isQ, dim = 4, m = 2, k = k, residual = residual)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
      got.map { case (q, ns) => (ns & exactTop(q)).size.toDouble / k }.sum / got.size
    }
    val rRes = recallOf(residual = true, cbRes)
    val rRaw = recallOf(residual = false, cbRaw)
    assert(rRes == 1.0, s"exact residual codebook must give perfect recall: $rRes")
    assert(rRes >= rRaw,
      s"residual must not lose to non-residual at equal bytes: $rRes vs $rRaw")
    // residual ADC identity: adc_d2 = L2²((q − centroid_probedCell) −
    // decodedResidual(neighbor)), reconstructed independently here
    val index = Similarity.ivfPqIndex(corpus, "vec_id", "embedding", cells,
      cbRes, 4, 2, residual = true)
    val codes = index.select("vec_id", "codes").as[(Long, Seq[Long])].collect().toMap
    val cellOf = index.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val book = cbRes.as[(Long, Long, Seq[Double])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    val got = Similarity.ivfPqSearch(index, cells, cbRes, corpus.filter(isQ),
        "vec_id", "embedding", 4, 2, residual = true)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, cell, nid, adc) =>
      assert(cellOf(nid) == cell, "candidates must come from the probed cell")
      val cc = centers(cell.toInt)
      val qres = vecs(q).zip(cc).map { case (x, c) => x - c }
      val exact = codes(nid).zipWithIndex.map { case (code, s) =>
        val cv = book((s.toLong, code))
        val qs = qres.slice(s * 2, s * 2 + 2)
        qs.zip(cv).foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) }
      }.sum
      val mirrored = math.floor(exact * 1e6 + 0.5) / 1e6
      assert(math.abs(adc - mirrored) < 1e-9,
        s"residual ADC identity violated for ($q, $nid): $adc vs $exact")
    }
  }

  test("ivfPqKnn plan: no cartesian shuffle; corpus windows stay off the scan") {
    import spark.implicits._
    val corpus = corpusOf((0L until 64L).map(i =>
      i -> Seq((i % 8).toFloat + 1f, (i % 3).toFloat, 1f, (i % 5).toFloat)))
    val cells = cellsOf(Seq(0L -> Seq(1.0, 0.1, 1.0, 0.1), 1L -> Seq(0.3, 1.0, 0.1, 1.0)))
    val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding", 4, 2, 4, 1)
    val df = Similarity.ivfPqKnn(corpus, "vec_id", "embedding", cells, cb,
      isQuery = col("vec_id") < 2, dim = 4, m = 2, k = 3, nprobe = 2)
    def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => other +: other.children.flatMap(collectAll)
    }
    val nodes = collectAll(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "every corpus×broadcast product must be broadcast, never cartesian")
    // windows: query probe fan-out (tiny side) + final top-k only — the
    // corpus-sized paths (assignment, encode, scan) are aggregations
    assert(nodes.count(_.isInstanceOf[WindowExec]) <= 2,
      "corpus assignment/encode/scan must not sort per-vector in a window")
  }

  test("pcaComponents: planted 2-spectrum recovery, orthogonality, deflation") {
    import spark.implicits._
    val u1 = Array(0.6, 0.8, 0.0, 0.0)
    val u2 = Array(0.0, 0.0, -0.8, 0.6)
    val rnd = new scala.util.Random(13)
    val pts = Seq.tabulate(400) { _ =>
      val t1 = rnd.nextGaussian() * 5.0 // var 25 along u1
      val t2 = rnd.nextGaussian() * 2.0 // var 4 along u2
      (0 until 4).map(i => (t1 * u1(i) + t2 * u2(i)).toFloat)
    }
    val got = Similarity.pcaComponents(pts.toDF("v"), "v", m = 3)
      .orderBy("comp", "i")
      .as[(Long, Long, Double, Double, Double)].collect()
    val byComp = got.groupBy(_._1).map { case (c, rs) =>
      c -> (rs.sortBy(_._2).map(_._3).toArray, rs.head._4, rs.head._5)
    }
    val (v1, l1, f1) = byComp(1L)
    val (v2, l2, _) = byComp(2L)
    val (_, l3, _) = byComp(3L)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(v1, u1)) > 0.999, s"PC1 ${v1.toSeq}")
    assert(math.abs(dot(v2, u2)) > 0.999, s"PC2 ${v2.toSeq}")
    assert(math.abs(dot(v1, v2)) < 1e-6, "components must be orthogonal")
    assert(l1 > 15 && l2 > 2 && l1 > l2, s"spectrum order: $l1, $l2")
    assert(l3 < 0.05 * l2, s"third eigenvalue must be residual noise: $l3")
    assert(f1 > 0.5 && f1 < 1.0)
    // exhausted spectrum: exactly-rank-1 data (variance on one basis axis
    // only — the deflation c − λ·v·vᵀ is then EXACT in IEEE), m=2 -> the
    // second component is the explicit zero row, not a crash
    val clean = Seq.tabulate(50)(j => Seq(((j % 7) - 3).toFloat, 0f, 0f, 0f))
    val g2 = Similarity.pcaComponents(clean.toDF("v"), "v", m = 2)
      .filter(col("comp") === 2).as[(Long, Long, Double, Double, Double)].collect()
    assert(g2.forall(r => r._4 == 0.0 && r._3 == 0.0),
      s"past-rank component must be (0 loadings, 0 eigenvalue): ${g2.toSeq}")
  }

  test("whiten: unit variance per retained direction, centered, narrow plan") {
    import spark.implicits._
    val u1 = Array(0.6, 0.8, 0.0, 0.0)
    val u2 = Array(0.0, 0.0, -0.8, 0.6)
    val rnd = new scala.util.Random(17)
    val pts = Seq.tabulate(500) { j =>
      val t1 = rnd.nextGaussian() * 5.0 + 10.0 // nonzero mean: centering matters
      val t2 = rnd.nextGaussian() * 2.0
      (j.toLong, (0 until 4).map(i => (t1 * u1(i) + t2 * u2(i)).toFloat))
    }
    val df = pts.toDF("id", "v")
    val ys = Similarity.whiten(df, "id", "v", m = 2)
      .select("y").as[Seq[Double]].collect()
    assert(ys.forall(_.length == 2))
    for (c <- 0 until 2) {
      val col_ = ys.map(_(c))
      val mean = col_.sum / col_.length
      val variance = col_.map(x => (x - mean) * (x - mean)).sum / col_.length
      assert(math.abs(mean) < 1e-6, s"component $c mean $mean (must center)")
      assert(math.abs(variance - 1.0) < 0.01,
        s"whitened component $c variance $variance (must be 1)")
    }
    // degenerate: constant corpus -> zero covariance -> guarded zeros
    val const = Seq.tabulate(10)(j => (j.toLong, Seq(1f, 2f, 3f, 4f))).toDF("id", "v")
    val z = Similarity.whiten(const, "id", "v", m = 2)
      .select("y").as[Seq[Double]].collect()
    assert(z.forall(_.forall(_ == 0.0)), "zero-variance directions whiten to 0")
    // the transform is a narrow projection: no exchange
    val plan = Similarity.whiten(df, "id", "v", m = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("quantizeInt8: max component maps to ±127, zero vector to zero codes") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(2.0f, -4.0f, 1.0f)),   // mx=4 -> scale=4/127
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val got = Similarity.quantizeInt8(df, "id", "v").orderBy("id")
      .as[(Long, Double, Seq[Int])].collect().toSeq
    assert(got(0)._3 == Seq(64, -127, 32)) // round(2/ (4/127)) = round(63.5) = 64
    assert(math.abs(got(0)._2 - 4.0 / 127) < 1e-12)
    assert(got(1)._3 == Seq(0, 0, 0) && got(1)._2 == 0.0)
    // reconstruction error per component is bounded by scale/2
    val (_, scale, codes) = got(0)
    val rec = codes.map(_ * scale)
    Seq(2.0, -4.0, 1.0).zip(rec).foreach { case (x, r) =>
      assert(math.abs(x - r) <= scale / 2 + 1e-12, s"$x vs $r")
    }
  }

  test("quantizedKnn ranks like exact knn on separated clusters") {
    import spark.implicits._
    // two tight direction clusters; quantization noise (~1/127) cannot
    // reorder matches across clusters
    val rows = (0L to 9L).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.02f * i, 0.0f) else Array(0.0f, 0.02f * i, 1.0f)
      (i, base)
    }
    val df = rows.toDF("id", "v")
    val queries = df.filter($"id" < 2)
    val exact = Similarity.knnBruteForce(df, queries, "id", "v", 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    val quant = Similarity.quantizedKnn(df, queries, "id", "v", 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    val sameCluster = quant.forall { case (q, _, n) => (q % 2) == (n % 2) }
    assert(sameCluster, s"quantized knn crossed clusters: $quant")
    // top-1 agreement (rank-1 neighbors identical)
    val top1 = (s: Set[(Long, Long, Long)]) => s.filter(_._2 == 1L)
    assert(top1(exact) == top1(quant), s"${top1(exact)} vs ${top1(quant)}")
  }

  test("prototypePrune: per-cell rank prefix kept, exact ceil(frac*n), full-keep degenerate") {
    import spark.implicits._
    // 20 unit vectors fanned around the circle
    val rows = (0L until 20L).map { i =>
      val t = i * 0.3141592653589793
      (i, Array(math.cos(t).toFloat, math.sin(t).toFloat))
    }
    val df = rows.toDF("id", "v")
    val out = Similarity.prototypePrune(df, "id", "v", k = 3, iters = 1,
        keepNum = 7L, keepDen = 10L)
      .select("id", "cell", "cos", "proto_rank", "keep")
      .as[(Long, Long, Double, Long, Boolean)].collect().toSeq
    assert(out.size == 20 && out.map(_._1).distinct.size == 20)
    out.groupBy(_._2).foreach { case (cell, rowsInCell) =>
      val n = rowsInCell.size.toLong
      // ranks are exactly 1..n, ordered by (cos, id) ascending
      val byRank = rowsInCell.sortBy(_._4)
      assert(byRank.map(_._4) == (1L to n), s"cell $cell ranks")
      assert(byRank.map(r => (r._3, r._1)) == rowsInCell.sortBy(r => (r._3, r._1)).map(r => (r._3, r._1)),
        s"cell $cell rank order must be (cos, id) ascending")
      // keep = the rank prefix of size ceil(0.7*n), lowest-cos (hardest) first
      val expectKeep = (7L * n + 9L) / 10L
      assert(byRank.count(_._5) == expectKeep, s"cell $cell kept ${byRank.count(_._5)} != $expectKeep")
      assert(byRank.takeWhile(_._5).size == expectKeep, s"cell $cell keep must be a rank prefix")
    }
    // keepNum == keepDen keeps every row
    val full = Similarity.prototypePrune(df, "id", "v", k = 3, iters = 1,
        keepNum = 1L, keepDen = 1L)
      .select("keep").as[Boolean].collect()
    assert(full.forall(identity))
    intercept[IllegalArgumentException] {
      Similarity.prototypePrune(df, "id", "v", 3, 1, keepNum = 11L, keepDen = 10L)
    }
  }

  test("covarianceMatrix: hand 2-d covariances, symmetry by upper-triangle contract") {
    import spark.implicits._
    // points (0,0) (2,2) (0,2) (2,0): var = 1 each dim, cov(1,2) = 0
    val a = Seq(Seq(0f, 0f), Seq(2f, 2f), Seq(0f, 2f), Seq(2f, 0f)).toDF("v")
    val gotA = Similarity.covarianceMatrix(a, "v")
      .orderBy("i", "j").as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(gotA == Seq((1L, 1L, 1.0, 1.0, 1.0), (1L, 2L, 1.0, 1.0, 0.0),
      (2L, 2L, 1.0, 1.0, 1.0)), gotA.toString)
    // perfectly correlated pair: cov = var = 0.25 on the line y = x
    val b = Seq(Seq(0f, 0f), Seq(1f, 1f)).toDF("v")
    val gotB = Similarity.covarianceMatrix(b, "v")
      .orderBy("i", "j").as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(gotB.map(_._5) == Seq(0.25, 0.25, 0.25), gotB.toString)
  }

  test("pcaTopComponent: recovers a planted dominant direction; invariants hold") {
    import spark.implicits._
    // planted direction u = (3,4)/5 with strong signal plus weak noise in
    // the orthogonal direction (-4,3)/5 — PC1 must align with u
    val u = Array(0.6, 0.8)
    val o = Array(-0.8, 0.6)
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(200) { _ =>
      val t = rnd.nextGaussian() * 5.0
      val e = rnd.nextGaussian() * 0.1
      Seq((t * u(0) + e * o(0)).toFloat, (t * u(1) + e * o(1)).toFloat)
    }
    val got = Similarity.pcaTopComponent(pts.toDF("v"), "v")
      .orderBy("i").as[(Long, Double, Double, Double)].collect()
    val loading = got.map(_._2)
    val align = math.abs(loading(0) * u(0) + loading(1) * u(1))
    assert(align > 0.999, s"alignment $align, loading ${loading.toSeq}")
    // unit norm, positive sign convention on the largest-|.| entry
    val norm = math.sqrt(loading.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    assert(loading(loading.indices.maxBy(i => math.abs(loading(i)))) > 0)
    // eigenvalue ≈ variance along u (~25), explains nearly everything
    assert(got(0)._3 > 15.0 && got(0)._4 > 0.99, got.toSeq.toString)
    // eigen residual: C v = λ v within float-ish tolerance (C rebuilt from
    // the covarianceMatrix upper triangle)
    val tri = Similarity.covarianceMatrix(pts.toDF("v"), "v")
      .select("i", "j", "cov").as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => (i.toInt - 1, j.toInt - 1) -> c }.toMap
    def cv(i: Int, j: Int): Double = tri.getOrElse((math.min(i, j), math.max(i, j)), 0.0)
    val av = Array.tabulate(2)(i => cv(i, 0) * loading(0) + cv(i, 1) * loading(1))
    val resid = math.sqrt(av.zip(loading).map { case (x, l) => val r = x - got(0)._3 * l; r * r }.sum)
    assert(resid < 1e-6, s"residual $resid")
    intercept[IllegalArgumentException] {
      Similarity.pcaTopComponent(pts.toDF("v"), "v", iters = 0)
    }
  }

  test("standardize: hand z-scores, constant dimension pins z=0, one stat pass") {
    import spark.implicits._
    // dim 1: values 0, 2 -> m=1, sd=1 -> z = -1, +1
    // dim 2: constant 5 -> sd=0 -> z pinned 0.0 for every row
    val df = Seq((1L, Seq(0f, 5f)), (2L, Seq(2f, 5f))).toDF("id", "v")
    val got = Similarity.standardize(df, "id", "v")
      .orderBy("id", "i").as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 0.0, -1.0), (1L, 2L, 5.0, 0.0),
      (2L, 1L, 2.0, 1.0), (2L, 2L, 5.0, 0.0)), s"$got")
  }

  test("covarianceMatrix rejects inconsistent dimensions and empty input") {
    import spark.implicits._
    val bad = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("v")
    intercept[Exception] { Similarity.covarianceMatrix(bad, "v").collect() }
    val empty = Seq.empty[Seq[Float]].toDF("v")
    intercept[Exception] { Similarity.covarianceMatrix(empty, "v").collect() }
  }

  test("mrlTruncate: unit norm, prefix proportions kept, zero prefix safe, narrow plan") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(3f, 4f, 9f, 9f)),  // prefix (3,4): norm 5 -> (0.6, 0.8)
      (2L, Seq(0f, 0f, 7f, 7f))   // all-zero prefix: stays zeros, no NaN
    ).toDF("vec_id", "embedding")
    val got = Similarity.mrlTruncate(df, "vec_id", "embedding", 2)
      .orderBy("vec_id").as[(Long, Seq[Double], Double)].collect().toSeq
    assert(got(0)._2 == Seq(0.6, 0.8) && got(0)._3 == 5.0, got.toString)
    assert(got(1)._2 == Seq(0.0, 0.0) && got(1)._3 == 0.0, got.toString)
    // truncation then renorm preserves cosine ranking on the prefix: the
    // renormalized dot IS the prefix cosine
    val a = got(0)._2
    assert(math.abs(a.map(x => x * x).sum - 1.0) < 1e-12)
    intercept[IllegalArgumentException](
      Similarity.mrlTruncate(df, "vec_id", "embedding", 0))
    // narrow: no exchange anywhere — truncation rides the scan
    val plan = Similarity.mrlTruncate(df, "vec_id", "embedding", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
