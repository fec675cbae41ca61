package graft.operators

import graft.operators.Ckpt._
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, VectorFunctions}

/** Reusable similarity-search operators over arbitrary DataFrames with an
  * `array<float>` embedding column — the library surface behind s01–s04.
  */
object Similarity {

  /** Brute-force cosine top-k: queries are broadcast, the corpus streams
    * once; only (|queries| × k) rows survive the per-query window.
    * Output: query_id, rank, neighbor_id, cos (6 dp).
    */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    GraftExpressions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_v"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(GraftExpressions.cosineSim(col("_qv"), col("_v")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic hyperplane family: small-integer components in
    * [-5, 5] from an LCG stream (exactly representable as doubles, so an
    * external SQL oracle can embed identical literals). The same
    * generator backs the verified s02 planes and the scale probe.
    */
  def genPlanes(num: Int, dim: Int, seed: Long = 2026L): IndexedSeq[IndexedSeq[Int]] = {
    val it = Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    IndexedSeq.fill(num)(IndexedSeq.fill(dim)(Math.floorMod(it.next(), 11L).toInt - 5))
  }

  /** Corpus-sized hyperplane geometry — the scale rule the ANN probe
    * validated (SURVEY §4): with a FIXED plane count, per-bucket
    * occupancy grows linearly with the corpus and the within-bucket join
    * goes quadratic; sizing `planes ≈ log2(corpus / targetBucketSize)`
    * keeps expected bucket size — and so candidates per vector —
    * constant as the corpus grows. Floor 4 planes; pair with a
    * `maxBucketDf` cap for skewed (clustered) corpora, where the MEAN
    * bucket is fine but hot buckets still need the guard.
    */
  def sizedPlanes(corpusSize: Long, targetBucketSize: Int, dim: Int,
      seed: Long = 2026L): IndexedSeq[IndexedSeq[Int]] = {
    require(corpusSize > 0 && targetBucketSize > 0)
    val num = math.max(4,
      math.ceil(math.log(corpusSize.toDouble / targetBucketSize) / math.log(2)).toInt)
    genPlanes(num, dim, seed)
  }

  /** Random-hyperplane LSH bucket id (map-side, one pass per plane). */
  def lshBucket(vec: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(v => lit(v.toDouble)): _*)
      val dot = aggregate(zip_with(vec, planeLit, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via hyperplane LSH: bucket assignment then an equi-join on the
    * bucket id (never a cross product). Output: one row per vector with a
    * bucket-mate — vec_id, bucket, nn_id, cos (its nearest in-bucket
    * neighbor). More planes → smaller buckets → cheaper join, lower
    * recall; size `planes` so 2^planes ≈ corpus/expected-bucket-size.
    * `maxBucketDf` is the hot-bucket guard (the d02/d04/d05 DF-cap
    * pattern): the within-bucket join is quadratic in bucket size, so
    * vectors in buckets larger than the cap are dropped from the join
    * rather than letting one degenerate bucket dominate the stage.
    */
  def annLsh(df: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Int]], maxBucketDf: Int = Int.MaxValue): DataFrame = {
    GraftExpressions.register(df.sparkSession)
    val b0 = df.select(col(idCol).as("vec_id"), col(vecCol).as("_v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    // bucket-df cap as PARTIAL-AGG + SEMI-JOIN (the d02 discipline from
    // operators/Dedup.ngramJaccardPairs): a count window over the bucket
    // key would ship every member of a degenerate bucket (e.g. the
    // all-negative-dot origin bucket) to one task and buffer the whole
    // group before the cap could drop it. The partial-agg count collapses
    // hot buckets map-side; the semi-join build side holds only low-df
    // bucket ids, so hot-bucket rows stream through the probe and drop.
    val b =
      if (maxBucketDf == Int.MaxValue) b0
      else {
        // LAZY cache (ADVICE r12): the count pass, the probe, and both
        // self-join sides read the bucketed table — a lazy persist shares
        // the plane-dot subtree between them without the eager
        // localCheckpoint's side effects (a Spark job at DataFrame
        // construction time, and truncated lineage that an executor loss
        // could no longer recompute)
        val bm = b0.persist()
        val lowB = bm.groupBy("bucket").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxBucketDf)
          .select("bucket")
        bm.join(lowB, Seq("bucket"), "left_semi")
      }
    val p = b.as("a")
      .join(b.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.bucket").as("bucket"),
        col("b.vec_id").as("nn_id"),
        round(GraftExpressions.cosineSim(col("a._v"), col("b._v")), 6).as("cos"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nn_id"))
    p.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "bucket", "nn_id", "cos")
  }

  /** Per-group centroids in long form: (label, dim, centroid) — partial
    * aggregation does the heavy lifting map-side.
    */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(round(avg(col("x").cast("double")), 4).as("centroid"))

  /** Per-group centroids as vectors: (clabel, cv: array<double>). */
  def centroidVectors(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("clabel"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("clabel", "i").agg(avg(col("x").cast("double")).as("c"))
      .groupBy("clabel")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        p => p.getField("c")).as("cv"))

  /** IVF-style ANN: assign vectors to coarse cells (nearest centroid);
    * a query probes only its own cell, so a probe reads 1/|cells| of the
    * corpus — at scale the cell id is a partition key.
    *
    * Plan shape (the round-2 review's scale fix): nearest-centroid
    * assignment is a `max_by` aggregation, NOT a row_number window — the
    * corpus×centroid product collapses map-side (partial aggregation in
    * the same stage), so only one reduced row per vector reaches the
    * shuffle and there is no per-vector sort. Queries are assigned by a
    * separate pass over the (pushdown-filtered, tiny) query subset, so the
    * corpus assignment is computed exactly ONCE — previously deriving the
    * query set from the corpus assignment pushed `isQuery` below the
    * exchange and forced the whole lineage to run twice. The shared
    * `cells` broadcast subtree is deduplicated by Spark's ReuseExchange.
    *
    * `isQuery` must be a predicate over (idCol, vecCol) — it selects the
    * query subset of `df` before assignment. `nprobe` (>= 1) is the
    * standard IVF recall knob: a query probes its `nprobe` nearest cells
    * (the corpus is always single-cell assigned); probe-1 is the verified
    * oracle shape, more probes trade a linear cost increase for recall.
    * Output: query_id, cell, rank, neighbor_id, cos.
    */
  /** Spherical k-means (Lloyd's algorithm, cosine assignment) with fully
    * deterministic seeding — the clustering front of semantic dedup
    * ([[Dedup.semanticDedup]]) and of IVF index building.
    *
    * Seeds are the `k` vectors FIRST IN SCRAMBLED-HASH ORDER of the salted
    * id (the q28 take: polyHash alone is order-preserving for short keys,
    * so it is post-multiplied mod a prime — a bijection that shuffles
    * order): an unbiased, layout-independent, oracle-mirrorable pick,
    * where "first k ids" would correlate with insertion order. The pick
    * is a distributed TakeOrdered (never a global sort); only the k
    * seed rows see a window.
    *
    * Each iteration: (1) assignment — corpus × broadcast(centroids)
    * collapses map-side via `max_by` (the s04 plan shape: one reduced row
    * per vector reaches the shuffle, no per-vector sort; ties broken by
    * smallest centroid label); (2) update — per-(cell, dim) `avg` partial
    * aggregation reassembled into centroid vectors. Centroids (k rows)
    * are checkpointed per iteration so the plan stays bounded for large
    * `iters` (the d06 lineage lesson). Empty cells drop out, exactly as
    * they do in the SQL mirror. After `iters` update rounds a final
    * assignment against the last centroids is returned.
    *
    * Output: (idCol, cell) — every input row assigned to one cell.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, salt: String = ""): DataFrame =
    kmeansAssign(df, idCol, vecCol, k, iters, salt)
      .select(col("vec_id").as(idCol), col("cell"))

  /** [[kmeans]] keeping the vector column and the winning cosine —
    * (vec_id, cell, _v, _cos) — so downstream within-cell work
    * (semantic dedup, prototype pruning) avoids a re-join / re-score.
    */
  private[operators] def kmeansAssign(df: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int, salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be >= 0")
    GraftExpressions.register(df.sparkSession)
    val e = df.select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
    val h = Sampling.scrambledHash(col("vec_id"), salt)
    // distributed top-k by scrambled hash; the k survivors get labels
    // 0..k-1 in the same order (a window over k rows, not the corpus)
    val seedW = Window.orderBy(col("_h"), col("vec_id"))
    var cents = e.select(col("vec_id"), VectorFunctions.toDouble(col("_v")).as("cv"), h.as("_h"))
      .orderBy(col("_h"), col("vec_id")).limit(k)
      .select((row_number().over(seedW) - 1).cast("long").as("clabel"), col("cv"))
      .eagerPin()
    def assign(cs: DataFrame): DataFrame =
      e.crossJoin(broadcast(cs))
        .groupBy(col("vec_id"))
        .agg(max_by(
          struct(col("clabel").as("cell"), col("_v").as("v"),
            VectorFunctions.cosine(col("_v"), col("cv")).as("cos")),
          struct(VectorFunctions.cosine(col("_v"), col("cv")).as("cos"),
            negate(col("clabel")).as("negl"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"), col("m.v").as("_v"),
          col("m.cos").as("_cos"))
    for (_ <- 1 to iters) {
      cents = assign(cents)
        .select(col("cell").as("clabel"), posexplode(col("_v")).as(Seq("i", "x")))
        .groupBy("clabel", "i").agg(avg(col("x").cast("double")).as("c"))
        .groupBy("clabel")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
          p => p.getField("c")).as("cv"))
        .eagerPin()
    }
    assign(cents)
  }

  /** Prototypicality pruning (Sorscher et al. 2022, arXiv:2206.14486,
    * "Beyond neural scaling laws") — the SSL-prototype data-pruning
    * metric: cluster the embedding space with [[kmeans]], score every
    * example by cosine to its OWN cell centroid (high = prototypical /
    * redundant, low = hard / informative), and keep each cell's HARDEST
    * `keepNum/keepDen` fraction. The paper's headline result — beating
    * power-law scaling by dropping the most prototypical examples when
    * data is abundant — makes this the principled volume knob next to
    * [[graft.operators.Dedup.semanticDedup]]'s near-dup prune.
    *
    * The prototypicality score is the cosine the final Lloyd assignment
    * already computed (the max_by carries it out — no re-score, no
    * re-join), bit-identical cross-engine (the s04 fold). The keep
    * DECISION is pure integer arithmetic: rank within cell by
    * (cos, id) ascending, keep iff rank·keepDen ≤ keepNum·n + keepDen−1
    * (⟺ rank ≤ ceil(keepNum·n/keepDen) — q63's crossing discipline, no
    * float threshold). The per-cell rank window is partitioned by the
    * cell id — parallelism = k, and cell sizes ≈ n/k make k the scale
    * knob exactly as in semanticDedup. Output: idCol, cell, cos
    * (unrounded — round at the binding), proto_rank, keep.
    */
  def prototypePrune(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, keepNum: Long, keepDen: Long, salt: String = ""): DataFrame = {
    require(keepDen >= 1 && keepNum >= 1 && keepNum <= keepDen,
      s"need 0 < keepNum/keepDen <= 1, got $keepNum/$keepDen")
    val a = kmeansAssign(df, idCol, vecCol, k, iters, salt)
    val w = Window.partitionBy("cell").orderBy(col("_cos"), col("vec_id"))
    val wn = Window.partitionBy("cell")
    a.withColumn("proto_rank", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wn).cast("long"))
      .select(col("vec_id").as(idCol), col("cell"), col("_cos").as("cos"),
        col("proto_rank"),
        (col("proto_rank") * lit(keepDen) <= col("_n") * lit(keepNum) + lit(keepDen - 1L))
          .as("keep"))
  }

  /** Squared Euclidean distance between two double-array columns. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** The coarse-cell table folded to ONE nested-array row (cell-ascending)
    * — a model artifact (|cells| centroids), not data, so it broadcasts
    * whole and assignment becomes a per-row fold with NO exchange. The
    * old shape (crossJoin + groupBy max_by) shuffled one reduced row per
    * corpus vector for a result that never needed aggregation at all.
    */
  private def cellsRow(cells: DataFrame): DataFrame =
    cells.agg(array_sort(collect_list(struct(
      col("clabel").cast("long").as("cell"),
      VectorFunctions.toDouble(col("cv")).as("cv")))).as("_cells"))

  /** PQ codebooks folded to ONE nested row: element s (1-based s+1) of
    * `_cb` is subspace s's (code, cv) entries, code-ascending.
    */
  private def codebookRow(codebooks: DataFrame): DataFrame =
    codebooks.groupBy(col("sub").cast("int").as("_sub"))
      .agg(array_sort(collect_list(struct(col("code").cast("long").as("code"),
        VectorFunctions.toDouble(col("cv")).as("cv")))).as("_entries"))
      .agg(transform(array_sort(collect_list(struct(col("_sub"), col("_entries")))),
        p => p.getField("_entries")).as("_cb"))

  /** Combined one-row model relation (columns `_cells`, `_cb`) from the
    * separate cell/codebook tables — the general path for prebuilt or
    * externally-trained models.
    */
  private def modelRow(cells: DataFrame, codebooks: DataFrame): DataFrame =
    cellsRow(cells).crossJoin(codebookRow(codebooks))

  /** Combined one-row IVF+PQ model straight from a per-(label, dim-index)
    * MEAN table (clabel: long, i: int 0-based, c: double) — the
    * label-supervised one-step-Lloyd path (s10): coarse cell `clabel` =
    * the full-width mean vector, and codebook entry (sub, clabel)[j] =
    * mean(clabel, sub·subDim + j) mirror-rounded at `roundDp`. ONE
    * aggregation chain (the means groupBy + one global collect) replaces
    * the five rollup exchanges of centroidVectors + labelCodebooks +
    * per-side row folds — at bench SF those exchanges were s10's whole
    * runtime (each AQE stage is a driver barrier), and at 100 TB the
    * model build is one partial-agg pass either way. The restructuring
    * into nested arrays is a narrow expression over the one collected
    * row: `_flat` is sorted by (clabel, i), so entry (li, i) sits at
    * position li·dim + i and every lookup is O(1).
    */
  def ivfPqModelFromMeans(means: DataFrame, dim: Int, m: Int,
      roundDp: Int = 6): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    val subDim = dim / m
    val flat = means.agg(array_sort(collect_list(
      struct(col("clabel"), col("i"), col("c")))).as("_flat"))
    val labels = array_distinct(transform(col("_flat"), e => e.getField("clabel")))
    def meanAt(li: Column, i: Column): Column =
      element_at(col("_flat"), (li * dim + i + 1).cast("int")).getField("c")
    val cellsArr = transform(labels, (l, li) => struct(
      l.as("cell"),
      transform(sequence(lit(0), lit(dim - 1)), i => meanAt(li, i)).as("cv")))
    val cbArr = transform(sequence(lit(0), lit(m - 1)), sIdx =>
      transform(labels, (l, li) => struct(
        l.as("code"),
        transform(sequence(lit(0), lit(subDim - 1)), j =>
          graft.functions.Rounding.mirrorRound(
            meanAt(li, sIdx * subDim + j), roundDp)).as("cv"))))
    flat.select(cellsArr.as("_cells"), cbArr.as("_cb"))
  }

  /** Nearest coarse cell as a left-to-right fold over the `_cells` array:
    * max cosine, ties to the smallest cell id — exactly the old
    * max_by(struct(cos, -label)) rule (Spark's double ordering treats NaN
    * as largest in both forms). Returns struct(cos, cell, cv) so the
    * residual variant can subtract the winning centroid without a lookup.
    */
  private def nearestCell(v: Column, cells: Column): Column =
    aggregate(cells,
      struct(lit(Double.NegativeInfinity).as("cos"),
        lit(Long.MaxValue).as("cell"),
        array().cast("array<double>").as("cv")),
      (acc, c) => {
        val cos = GraftExpressions.cosineSimD(v, c.getField("cv"))
        when(cos > acc.getField("cos") ||
            (cos === acc.getField("cos") && c.getField("cell") < acc.getField("cell")),
          struct(cos.as("cos"), c.getField("cell").as("cell"),
            c.getField("cv").as("cv")))
          .otherwise(acc)
      })

  /** PQ codes as one narrow expression: per subspace, the argmin-d²
    * (ties to the smallest code — the old max_by(code, (-d², -code))
    * rule) fold over that subspace's codebook entries.
    */
  private def pqCodes(vd: Column, cb: Column, m: Int, subDim: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), s => {
      val sv = slice(vd, s * subDim + 1, lit(subDim))
      aggregate(element_at(cb, s + 1),
        struct(lit(Double.PositiveInfinity).as("d2"), lit(Long.MaxValue).as("code")),
        (acc, en) => {
          val d2 = GraftExpressions.sqDistD(sv, en.getField("cv"))
          when(d2 < acc.getField("d2") ||
              (d2 === acc.getField("d2") && en.getField("code") < acc.getField("code")),
            struct(d2.as("d2"), en.getField("code").as("code")))
            .otherwise(acc)
        },
        acc => acc.getField("code"))
    })

  /** One subvector row per (vector, subspace): (vec_id, sub, sv). */
  private def subVectors(in: DataFrame, m: Int, subDim: Int): DataFrame =
    in.select(col("vec_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("_v"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "sv")))

  /** Product-quantization codebooks (the PQ recipe of Jégou et al. 2011,
    * "Product quantization for nearest neighbor search"): the vector
    * space splits into `m` equal subspaces, each clustered independently
    * with `k` L2 k-means centroids, so a `dim`-float vector compresses to
    * `m` small codes — at (m=8, k=256) that is 256 bytes of float32 down
    * to 8 bytes, the difference between an embedding store that fits in
    * cluster memory and one that doesn't at 100 TB.
    *
    * Determinism mirrors [[kmeans]]: seeds are the k corpus vectors first
    * in scrambled-hash order (each contributing its m subvectors), Lloyd
    * assignment is a map-side `max_by` argmin (ties → smallest code),
    * updates are per-(sub, code, dim) partial-agg averages, centroids
    * (m·k rows) checkpointed per round. Output: (sub, code, cv).
    */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, k: Int, iters: Int, salt: String = ""): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    require(k > 0 && iters >= 0)
    GraftExpressions.register(df.sparkSession)
    val subDim = dim / m
    val e = df.select(col(idCol).as("vec_id"), VectorFunctions.toDouble(col(vecCol)).as("_v"))
    val h = Sampling.scrambledHash(col("vec_id"), salt)
    val seedW = Window.orderBy(col("_h"), col("vec_id"))
    val seeds = e.withColumn("_h", h).orderBy(col("_h"), col("vec_id")).limit(k)
      .select((row_number().over(seedW) - 1).cast("long").as("code"), col("_v"))
    var cb = seeds
      .select(col("code"), posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("_v"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "cv")))
      .eagerPin()
    def assign(cbs: DataFrame): DataFrame =
      subVectors(e, m, subDim).join(broadcast(cbs), "sub")
        .groupBy("vec_id", "sub")
        .agg(max_by(struct(col("code"), col("sv")),
          struct(negate(sqDist(col("sv"), col("cv"))).as("nd"),
            negate(col("code")).as("negc"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.code").as("code"), col("m.sv").as("sv"))
    for (_ <- 1 to iters) {
      cb = assign(cb)
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy("sub", "code", "i").agg(avg(col("x")).as("c"))
        .groupBy("sub", "code")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
          p => p.getField("c")).as("cv"))
        .eagerPin()
    }
    cb
  }

  /** Encode vectors against PQ codebooks: (idCol, codes) where codes(s)
    * is the nearest (L2, ties → smallest) centroid code of subspace s.
    * The codebooks (m·k rows) broadcast; encoding is map-side argmin +
    * one per-vector re-aggregation.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, dim: Int, m: Int): DataFrame = {
    require(m > 0 && dim % m == 0)
    val subDim = dim / m
    val e = df.select(col(idCol).as("vec_id"), VectorFunctions.toDouble(col(vecCol)).as("_v"))
    subVectors(e, m, subDim).join(broadcast(codebooks), "sub")
      .groupBy("vec_id", "sub")
      .agg(max_by(col("code"),
        struct(negate(sqDist(col("sv"), col("cv"))).as("nd"),
          negate(col("code")).as("negc"))).as("code"))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        p => p.getField("code")).as("codes"))
      .select(col("vec_id").as(idCol), col("codes"))
  }

  /** Asymmetric-distance (ADC) k-NN over PQ codes: each query computes a
    * distance table against the broadcast codebooks (m·k entries —
    * query-side, the vectors stay uncompressed only here), and the scan
    * is pure COMPRESSED-DOMAIN work: corpus codes equi-join the table on
    * (sub, code) and sum m partial distances per (query, vector) — the
    * corpus's float vectors are never read. adc_d2 is exactly the L2²
    * between the query and the RECONSTRUCTED corpus vector (the defining
    * ADC identity, spec-asserted). Output: query_id, rank, neighbor_id,
    * adc_d2 (6 dp), top-k per query by (adc_d2, neighbor_id).
    */
  def pqKnn(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int, m: Int, k: Int): DataFrame = {
    require(m > 0 && dim % m == 0)
    val subDim = dim / m
    val q = queries.select(col(idCol).as("vec_id"), VectorFunctions.toDouble(col(vecCol)).as("_v"))
    val dt = subVectors(q, m, subDim).join(broadcast(codebooks), "sub")
      .select(col("vec_id").as("query_id"), col("sub"), col("code"),
        sqDist(col("sv"), col("cv")).as("d2"))
    val cx = codes.select(col(idCol).as("neighbor_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val sc = cx.join(broadcast(dt), Seq("sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(round(sum(col("d2")), 6).as("adc_d2"))
    val w = Window.partitionBy("query_id").orderBy(col("adc_d2"), col("neighbor_id"))
    sc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_d2")
  }

  def ivfKnn(df: DataFrame, idCol: String, vecCol: String, cells: DataFrame,
      isQuery: Column, k: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    GraftExpressions.register(df.sparkSession)
    val e = df.select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
    // argmax over centroids: max cosine, ties broken by smallest label —
    // identical selection to ORDER BY cos DESC, clabel ASC ... rn = 1.
    def assign(in: DataFrame): DataFrame =
      in.crossJoin(broadcast(cells))
        .groupBy(col("vec_id"))
        .agg(max_by(
          struct(col("clabel").cast("long").as("cell"), col("_v").as("v")),
          struct(VectorFunctions.cosine(col("_v"), col("cv")).as("cos"),
            negate(col("clabel").cast("long")).as("negl"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"), col("m.v").as("_v"))
    // query side: top-nprobe cells each (nprobe rows per query; the query
    // set is tiny, so the fan-out is broadcast-cheap)
    val qw = Window.partitionBy("vec_id")
      .orderBy(VectorFunctions.cosine(col("_v"), col("cv")).desc, col("clabel"))
    val q =
      if (nprobe == 1)
        assign(e.filter(isQuery))
          .select(col("vec_id").as("query_id"), col("_v").as("_qv"), col("cell").as("qcell"))
      else
        e.filter(isQuery).crossJoin(broadcast(cells))
          .withColumn("rn", row_number().over(qw)).filter(col("rn") <= nprobe)
          .select(col("vec_id").as("query_id"), col("_v").as("_qv"),
            col("clabel").cast("long").as("qcell"))
    val sc = assign(e).join(broadcast(q),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qcell").as("cell"), col("vec_id").as("neighbor_id"),
        round(GraftExpressions.cosineSim(col("_qv"), col("_v")), 6).as("cos"))
    val w2 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    sc.withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cell", "rank", "neighbor_id", "cos")
  }

  /** Label-supervised PQ codebooks: per-(subspace, label) averages — a
    * deterministic one-step Lloyd where an existing clustering (labels,
    * coarse cells, any upstream partition) supplies the assignment. The
    * externally-replayable codebook behind the s10 oracle (every entry is
    * a partial-agg average mirror-rounded at `roundDp`, so cross-engine
    * float-sum ordering cannot flip an encode); [[pqCodebooks]] is the
    * unsupervised alternative when no clustering exists. Output:
    * (sub, code, cv) — `codebooks` shaped for [[pqEncode]]/[[pqKnn]]/
    * [[ivfPqKnn]].
    */
  def labelCodebooks(df: DataFrame, labelCol: String, vecCol: String,
      dim: Int, m: Int, roundDp: Int = 6): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    val subDim = dim / m
    df.select(col(labelCol).cast("long").as("code"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          sp => slice(col(vecCol).cast("array<double>"),
            sp * subDim + 1, lit(subDim)))).as(Seq("sub", "_sv")))
      .select(col("code"), col("sub").cast("long").as("sub"),
        posexplode(col("_sv")).as(Seq("i", "x")))
      .groupBy("sub", "code", "i")
      .agg(graft.functions.Rounding.mirrorRound(avg(col("x")), roundDp).as("c"))
      .groupBy("sub", "code")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        p => p.getField("c")).as("cv"))
  }

  /** IVFADC — the production 100 TB ANN shape (Jégou et al. 2011, §IV:
    * coarse cells × compressed-domain scan): [[ivfKnn]]'s coarse
    * quantizer bounds WHAT is scanned (a query touches only its
    * `nprobe` nearest cells), [[pqKnn]]'s asymmetric-distance scan
    * bounds HOW it is scanned (corpus vectors are ranked from their
    * `m`-byte PQ codes against a per-query distance table — the
    * corpus's float vectors are NEVER read in the scan). Codes are
    * whole-vector PQ against shared codebooks (FAISS's
    * `by_residual=false` IVFPQ variant — one distance table per query,
    * not one per (query, cell); the residual variant trades that for
    * extra precision and is a codebook swap away since assignment
    * and encoding are already separate stages here).
    *
    * Plan shape: corpus → ONE max_by cell assignment + ONE PQ encode
    * (both map-side against broadcasts, the s04/PQ folds); the scan is
    * corpus codes ⋈ broadcast(query probes) on the CELL key — the only
    * corpus-sized shuffle input, pruned to nprobe/|cells| of the data —
    * then ⋈ broadcast(distance table) on (query, sub, code) and a
    * partial-agg sum of m terms per (query, candidate). adc_d2 keeps
    * [[pqKnn]]'s ADC identity: exactly L2² between the query and the
    * RECONSTRUCTED candidate (spec-asserted through the composition).
    * Output: query_id, cell, rank, neighbor_id, adc_d2 — top-k per
    * query by (adc_d2, neighbor_id).
    */
  def ivfPqKnn(df: DataFrame, idCol: String, vecCol: String,
      cells: DataFrame, codebooks: DataFrame, isQuery: Column,
      dim: Int, m: Int, k: Int, nprobe: Int = 1,
      residual: Boolean = false): DataFrame = {
    val sc = ivfPqScores(df, idCol, vecCol, cells, codebooks, isQuery, dim, m,
      nprobe, residual)
    val w = Window.partitionBy("query_id").orderBy(col("adc_d2"), col("neighbor_id"))
    sc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cell", "rank", "neighbor_id", "adc_d2")
  }

  /** [[ivfPqKnn]] + exact re-rank: the top-`rerank` ADC candidates per
    * query (rerank ≥ k) fetch their float vectors — a semi-join-sized
    * read of rerank·|queries| rows, NOT a corpus scan — and the final
    * top-k ranks by exact cosine. This is the standard two-stage
    * IVFADC+R serving shape: the compressed scan does the corpus-sized
    * work, the exact pass touches only a candidate set that no longer
    * depends on corpus size. Output: query_id, rank, neighbor_id,
    * adc_d2 (the candidate stage's score), cos — top-k per query by
    * (cos desc, neighbor_id).
    */
  def ivfPqKnnRerank(df: DataFrame, idCol: String, vecCol: String,
      cells: DataFrame, codebooks: DataFrame, isQuery: Column,
      dim: Int, m: Int, k: Int, rerank: Int, nprobe: Int = 1,
      residual: Boolean = false): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    GraftExpressions.register(df.sparkSession)
    val sc = ivfPqScores(df, idCol, vecCol, cells, codebooks, isQuery, dim, m,
      nprobe, residual)
    val w = Window.partitionBy("query_id").orderBy(col("adc_d2"), col("neighbor_id"))
    val cand = sc.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= rerank)
      .select("query_id", "neighbor_id", "adc_d2")
    val corpus = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nv"))
    val q = df.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val exact = cand.join(corpus, "neighbor_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"), col("adc_d2"),
        round(GraftExpressions.cosineSim(col("_qv"), col("_nv")), 6).as("cos"))
    val w2 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_d2", "cos")
  }

  /** IVFADC index BUILD — the amortized half of the s10 path, separated
    * so a standing corpus pays assignment + encode ONCE and every query
    * batch pays only [[ivfPqSearch]]'s code scan (the FAISS
    * `index.add` / `index.search` split; [[ivfPqKnn]] composes the two
    * for the oracle's one-shot contract). Output: (vec_id, cell, sub,
    * code) — m rows per corpus vector, the long-form stored index; at
    * 100 TB this is the table that persists (≈ m longs + a cell id per
    * vector, ~40 bytes at m=4 vs 256 floats), bucketable by `cell`.
    */
  def ivfPqIndex(df: DataFrame, idCol: String, vecCol: String,
      cells: DataFrame, codebooks: DataFrame, dim: Int, m: Int,
      residual: Boolean = false): DataFrame =
    ivfPqIndexRows(df, idCol, vecCol, modelRow(cells, codebooks),
      dim, m, residual)

  /** [[ivfPqIndex]] over a PREBUILT one-row model relation — so a caller
    * composing index + search (ivfPqScores) folds the model exactly once
    * and the two sides share the same broadcast stage.
    */
  private def ivfPqIndexRows(df: DataFrame, idCol: String, vecCol: String,
      modelR: DataFrame, dim: Int, m: Int,
      residual: Boolean = false): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    GraftExpressions.register(df.sparkSession)
    val subDim = dim / m
    // null vectors cannot index (their cosine/argmin is undefined) — drop
    // them here rather than emitting a garbage cell downstream
    val e = df.select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
      .filter(col("_v").isNotNull)
    // ONE NARROW PASS (VERDICT r12: the old crossJoin→groupBy assignment
    // + explode→join→two-groupBy encode made s10 barrier-heavy; none of
    // it was aggregation in nature): cells and codebooks are model
    // artifacts — m·k centroid entries — folded to one nested-array row
    // each and broadcast; per corpus vector the cell is an argmax fold,
    // the residual variant (FAISS by_residual=true — better recall at
    // the same bytes, since the codebook only has to cover within-cell
    // variation) subtracts the winning centroid the same fold returned,
    // and the m codes are per-subspace argmin folds. Zero exchanges —
    // exactly how a FAISS worker encodes, re-expressed in Catalyst.
    e.crossJoin(broadcast(modelR))
      .withColumn("_v0", VectorFunctions.toDouble(col("_v"))) // convert ONCE, not per centroid
      .withColumn("_best", nearestCell(col("_v0"), col("_cells")))
      .withColumn("_vd",
        if (residual) zip_with(col("_v0"), col("_best.cv"), (x, c) => x - c)
        else col("_v0"))
      .select(col("vec_id"), col("_best.cell").as("cell"),
        pqCodes(col("_vd"), col("_cb"), m, subDim).as("codes"))
  }

  /** IVFADC SEARCH over a prebuilt [[ivfPqIndex]]: queries probe their
    * `nprobe` nearest cells, build their m·k ADC distance tables against
    * the broadcast codebooks, and the index's CODES — never the corpus
    * floats — are scanned within the probed cells only. The scan is the
    * FAISS table-lookup shape: the per-query distance table broadcasts
    * as ONE map row per query, and each (query, candidate) pair costs m
    * map lookups folded left-to-right in a codegen'd collection lambda —
    * no per-subspace row explosion, no (sub, code) join, no groupBy; the
    * only corpus-sized operation is the cell-pruned probe join. A query
    * id that also exists in the index is excluded from its own results
    * (self-match), so in-corpus and external queries both work. Output:
    * (query_id, cell, neighbor_id, adc_d2), every scored candidate —
    * [[ivfPqKnn]] applies the top-k.
    */
  def ivfPqSearch(index: DataFrame, cells: DataFrame, codebooks: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, nprobe: Int = 1,
      residual: Boolean = false): DataFrame =
    ivfPqSearchRows(index, modelRow(cells, codebooks), queries,
      idCol, vecCol, dim, m, nprobe, residual)

  private def ivfPqSearchRows(index: DataFrame, modelR: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, nprobe: Int = 1,
      residual: Boolean = false): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    GraftExpressions.register(queries.sparkSession)
    val subDim = dim / m
    val qv = queries.select(col(idCol).as("query_id"),
      VectorFunctions.toDouble(col(vecCol)).as("_qv"))
      .filter(col("_qv").isNotNull) // a null-vector query probes nothing
    // NARROW probe selection (was: crossJoin + row_number window — an
    // exchange of |queries|·|cells| rows to pick nprobe of them): score
    // the broadcast cell array per query, comparator-sort by (cos desc,
    // cell asc) — the old window's exact order — and slice the top
    // nprobe. Probed pairs KEEP the cell centroid: the residual variant
    // quantizes against q − centroid(cell), so the distance table is per
    // (query, PROBED CELL) — the non-residual table is the same for
    // every probed cell and just rides the same shape.
    val scoredCells = transform(col("_cells"), c => struct(
      GraftExpressions.cosineSimD(col("_qv"), c.getField("cv")).as("cos"),
      c.getField("cell").as("cell"), c.getField("cv").as("cv")))
    val byCosDesc = (l: Column, r: Column) =>
      when(l.getField("cos") > r.getField("cos"), -1)
        .when(l.getField("cos") < r.getField("cos"), 1)
        .when(l.getField("cell") < r.getField("cell"), -1)
        .when(l.getField("cell") > r.getField("cell"), 1)
        .otherwise(0)
    val probes = qv
      .crossJoin(broadcast(modelR))
      .select(col("query_id"), col("_qv"), col("_cb"),
        explode(slice(array_sort(scoredCells, byCosDesc), 1, nprobe)).as("_p"))
      .select(col("query_id"), col("_cb"), col("_p.cell").as("cell"),
        (if (residual)
          zip_with(col("_qv"), col("_p.cv"), (x, c) => x - c)
        else col("_qv")).as("_qr"))
    // per-(query, cell) ADC distance table folded to ONE map row:
    // (sub, code) -> d2 — |queries|·nprobe·m·k entries, broadcast-sized;
    // built narrowly from the codebook row (no explode/join/groupBy)
    val dt = probes.select(col("query_id"), col("cell"),
      map_from_entries(flatten(transform(sequence(lit(0), lit(m - 1)), s =>
        transform(element_at(col("_cb"), s + 1), en => struct(
          struct(s.cast("long").as("s"), en.getField("code").cast("long").as("c")).as("key"),
          GraftExpressions.sqDistD(slice(col("_qr"), s * subDim + 1, lit(subDim)),
            en.getField("cv")).as("value")))))).as("_dt"))
    // compressed-domain scan: ONE cell-pruned join fans candidates out to
    // their probing queries, then adc_d2 is a narrow left-to-right fold of
    // m table lookups — the d05/s01 fold discipline, so the sum order is
    // fixed (not an aggregation's arbitrary order)
    val adc = aggregate(
      transform(sequence(lit(0L), lit(m - 1L)),
        s => element_at(col("_dt"),
          struct(s.as("s"), element_at(col("codes"), (s + 1).cast("int")).cast("long").as("c")))),
      lit(0.0), (acc, x) => acc + x)
    index.join(broadcast(dt), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      // mirror-round (not round): s10's oracle replays this exact value
      .select(col("query_id"), col("cell"), col("vec_id").as("neighbor_id"),
        graft.functions.Rounding.mirrorRound(adc, 6).as("adc_d2"))
  }

  /** One-shot IVFADC scorer: [[ivfPqIndex]] + [[ivfPqSearch]]. */
  private def ivfPqScores(df: DataFrame, idCol: String, vecCol: String,
      cells: DataFrame, codebooks: DataFrame, isQuery: Column,
      dim: Int, m: Int, nprobe: Int, residual: Boolean = false): DataFrame =
    ivfPqScoresModel(df, idCol, vecCol, modelRow(cells, codebooks), isQuery,
      dim, m, nprobe, residual)

  private def ivfPqScoresModel(df: DataFrame, idCol: String, vecCol: String,
      modelR: DataFrame, isQuery: Column,
      dim: Int, m: Int, nprobe: Int, residual: Boolean = false): DataFrame =
    ivfPqSearchRows(
      ivfPqIndexRows(df, idCol, vecCol, modelR, dim, m, residual),
      modelR, df.filter(isQuery), idCol, vecCol, dim, m, nprobe, residual)

  /** [[ivfPqKnn]] over a prebuilt one-row model ([[ivfPqModelFromMeans]]). */
  def ivfPqKnnModel(df: DataFrame, idCol: String, vecCol: String,
      modelR: DataFrame, isQuery: Column,
      dim: Int, m: Int, k: Int, nprobe: Int = 1,
      residual: Boolean = false): DataFrame = {
    val sc = ivfPqScoresModel(df, idCol, vecCol, modelR, isQuery, dim, m,
      nprobe, residual)
    val w = Window.partitionBy("query_id").orderBy(col("adc_d2"), col("neighbor_id"))
    sc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cell", "rank", "neighbor_id", "adc_d2")
  }

  /** Coarse-cell residuals — the training set for a residual-variant PQ
    * codebook ([[pqCodebooks]] over the `rvec` column): each vector minus
    * its nearest cell's centroid, the distribution the by_residual
    * codebook must cover (within-cell variation only, which is why the
    * same byte budget buys more precision). Output: (vec_id, cell, rvec).
    */
  def ivfResiduals(df: DataFrame, idCol: String, vecCol: String,
      cells: DataFrame): DataFrame = {
    GraftExpressions.register(df.sparkSession)
    val e = df.select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
      .filter(col("_v").isNotNull) // null vectors have no residual
    e.crossJoin(broadcast(cells))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("clabel").cast("long").as("cell"), col("_v").as("v")),
        struct(VectorFunctions.cosine(col("_v"), col("cv")).as("cos"),
          negate(col("clabel").cast("long")).as("negl"))).as("m"))
      .join(broadcast(cells.select(col("clabel").cast("long").as("cell"),
        VectorFunctions.toDouble(col("cv")).as("_cc"))),
        col("m.cell") === col("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(VectorFunctions.toDouble(col("m.v")), col("_cc"),
          (x, c) => x - c).as("rvec"))
  }

  /** Symmetric per-vector int8 scalar quantization — the 4× embedding
    * store shrink (float32 → one byte/dim + one scale/vector) that keeps
    * a 100 TB embedding corpus in cluster memory when PQ's lossier 32×
    * isn't wanted. scale = max|v|/127; codes = round-half-up(v/scale),
    * so codes lie in [-127, 127] with the max-magnitude component exact.
    * Rounding is the explicit `floor(x + 0.5)` fold (deterministic in
    * any IEEE engine — an external SQL oracle reproduces codes exactly);
    * all-zero vectors quantize to all-zero codes. A narrow projection —
    * zero shuffle. Output: idCol, scale (double), codes (array<int>).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // hoist the max into its own projection: referencing array_max inside
    // the transform lambda would re-scan the array PER ELEMENT (O(d²)/row)
    val mx = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    val codes = transform(col(vecCol),
      x => when(lit(0.0) === col("_mx"), lit(0L))
        .otherwise(floor(x.cast("double") / (col("_mx") / 127.0) + 0.5)).cast("int"))
    df.select(col(idCol), col(vecCol), mx.as("_mx"))
      .select(col(idCol), (col("_mx") / 127.0).as("scale"), codes.as("codes"))
  }

  /** Brute-force cosine top-k in the QUANTIZED domain: per-vector scales
    * cancel in cosine (cos(s·a, t·b) = cos(a, b)), so ranking needs only
    * the int8 codes — the scan reads 1/4 the bytes of s01 and never
    * touches a float vector. Integer dot products make the scores exact
    * cross-engine (no float-sum ordering concerns). Same output contract
    * as [[knnBruteForce]]: query_id, rank, neighbor_id, cos — where cos
    * is the quantized-domain cosine (within ~1/127 of the float cosine;
    * the spec bounds the rank disturbance).
    */
  def quantizedKnn(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // codes are ints in [-127, 127] — exactly representable as float, so
    // the float-typed CosineSim fast path computes exact integer dots
    def q(df: DataFrame) = quantizeInt8(df, idCol, vecCol)
      .select(col(idCol), transform(col("codes"), _.cast("float")).as(vecCol))
    knnBruteForce(q(corpus), q(queries), idCol, vecCol, k)
  }

  /** One-pass population covariance accumulator over embedding vectors:
    * the buffer is a single Array[Double] [n | Σx (d) | upper-tri Σxᵢxⱼ
    * (d(d+1)/2)] — 33 KB at d = 64 — held as a live object per task and
    * serialized only at the partial/final shuffle boundary, so per-row
    * cost is the d(d+1)/2 multiply-adds and nothing else. Map-side
    * partial aggregation collapses any data size to one 33 KB row per
    * task; the whole corpus reduces to ONE buffer regardless of scale.
    * Dimension is inferred from the first vector and enforced thereafter.
    */
  private class CovAcc extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    override def zero: Array[Double] = Array.emptyDoubleArray
    override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
      if (v == null) return buf
      val d = v.size
      val b = if (buf.isEmpty) new Array[Double](1 + d + d * (d + 1) / 2) else buf
      require(b.length == 1 + d + d * (d + 1) / 2,
        s"inconsistent embedding dimension: got $d")
      b(0) += 1.0
      val x = v.toArray
      var i = 0
      var t = 1 + d
      while (i < d) {
        b(1 + i) += x(i)
        var j = i
        while (j < d) { b(t) += x(i) * x(j); j += 1; t += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a.length == b.length, "inconsistent embedding dimension across partitions")
        var k = 0
        while (k < a.length) { a(k) += b(k); k += 1 }
        a
      }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }
  private lazy val CovUdaf = udaf(new CovAcc)

  /** Collected covariance state: n, per-dimension means, and the dense
    * upper-triangular population covariance (cov(i,j) for i <= j,
    * 0-based). Driver memory is d²-sized — independent of the data.
    */
  private[operators] def covState(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val packed = df.select(col(vecCol).cast("array<double>").as("_v"))
      .filter(col("_v").isNotNull)
      .agg(CovUdaf(col("_v")).as("p"))
      .head.getAs[scala.collection.Seq[Double]](0).toArray
    require(packed.nonEmpty, "covarianceMatrix: empty input")
    val n = packed(0)
    val d = (Math.sqrt(9.0 + 8.0 * (packed.length - 1)) - 3.0).toInt / 2
    require(1 + d + d * (d + 1) / 2 == packed.length, s"bad buffer length ${packed.length}")
    val means = Array.tabulate(d)(i => packed(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        cov(i)(j) = packed(t) / n - means(i) * means(j)
        cov(j)(i) = cov(i)(j)
        j += 1; t += 1
      }
      i += 1
    }
    (n.toLong, means, cov)
  }

  /** Population covariance matrix of an `array<float|double>` column as
    * rows (i, j, mean_i, mean_j, cov) for the upper triangle i <= j
    * (1-based, matching SQL list indexing). One distributed pass (see
    * [[CovAcc]]); the d²-row output is data-size independent.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val (_, means, cov) = covState(df, vecCol)
    val d = means.length
    val rows = for { i <- 0 until d; j <- i until d }
      yield (i + 1L, j + 1L, means(i), means(j), cov(i)(j))
    df.sparkSession.createDataFrame(rows)
      .toDF("i", "j", "mean_i", "mean_j", "cov")
  }

  /** Per-dimension z-score standardization of an embedding column — the
    * feature-scaling pass before distance-based ops (k-means, kNN) when
    * dimensions carry different units. Stats ride [[covState]]'s one-pass
    * buffer (means + variances are already in it — no second scan, no
    * per-dimension groupBy); the d-row stat table is driver-sized and the
    * transform itself is one NARROW pass. Output explodes to
    * (id, i 1-based, x, z) rows so an external engine can verify value by
    * value; dimensions with zero variance define z = 0 (a constant
    * feature carries no signal — never a division by zero).
    */
  def standardize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (_, means, cov) = covState(df, vecCol)
    val d = means.length
    val mArr = array(means.map(lit): _*)
    val sArr = array((0 until d).map(i => lit(math.sqrt(cov(i)(i)))): _*)
    df.select(col(idCol), posexplode(col(vecCol).cast("array<double>")).as(Seq("_p", "x")))
      .select(col(idCol), (col("_p") + 1).cast("long").as("i"), col("x"),
        when(element_at(sArr, col("_p") + 1) > 0.0,
          (col("x") - element_at(mArr, col("_p") + 1)) /
            element_at(sArr, col("_p") + 1))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Matryoshka (MRL) truncation — keep the first `d` dimensions of a
    * nested-representation embedding and re-normalize to unit length
    * (Kusupati et al., "Matryoshka Representation Learning": prefixes of
    * an MRL-trained vector are themselves valid embeddings, so the
    * 100 TB ANN/dedup path can run at d/D of the flops and bytes —
    * truncate once, feed s01/s02/s04/d05 unchanged). Cosine over
    * truncated-and-renormalized vectors equals dot product, and
    * renormalizing HERE (once, at write) beats renormalizing per
    * comparison (billions of times, at query).
    *
    * Shape: completely NARROW — slice + one sequential-fold norm + a
    * per-element divide, all codegen'd collection lambdas, zero UDFs,
    * zero shuffle; at 100 TB it rides the scan that reads the vectors.
    * The fold (((0+x₁²)+x₂²)+…) is stated left-to-right so an external
    * engine replays it bit for bit (the d05/s01 discipline). All-zero
    * prefixes keep zeros (no 0/0). Output: idCol, `emb_d`
    * (array<double>, unit-norm), `norm` (the pre-normalization length —
    * downstream quality filters threshold on it: a near-zero prefix
    * norm means the truncation destroyed the vector).
    */
  def mrlTruncate(df: DataFrame, idCol: String, vecCol: String, d: Int): DataFrame = {
    require(d >= 1, s"d must be >= 1, got $d")
    val t = slice(col(vecCol).cast("array<double>"), 1, d)
    val norm = sqrt(aggregate(t, lit(0.0), (acc, x) => acc + x * x))
    df.select(col(idCol),
      when(norm > 0.0, transform(t, x => x / norm))
        .otherwise(transform(t, _ => lit(0.0))).as("emb_d"),
      norm.as("norm"))
  }

  /** Top principal component by power iteration on the d×d covariance of
    * [[covState]] (driver-side on the d²-sized state — the data itself is
    * touched exactly once). Deterministic: fixed uniform start vector,
    * `iters` fixed iterations, sign normalized so the largest-|loading|
    * entry is positive. Returns one row per dimension:
    * (i 1-based, loading, eigenvalue, explained_frac) where
    * explained_frac = λ / trace(cov).
    */
  def pcaTopComponent(df: DataFrame, vecCol: String, iters: Int = 100): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val (_, means, cov) = covState(df, vecCol)
    val d = means.length
    val (v, lambda) = powerIterate(cov, iters, startBasis = -1)
    require(lambda > 0.0, "pcaTopComponent: degenerate (zero) covariance")
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val rows = v.zipWithIndex.map { case (l, i) =>
      (i + 1L, l, lambda, if (trace > 0) lambda / trace else 0.0)
    }.toSeq
    df.sparkSession.createDataFrame(rows)
      .toDF("i", "loading", "eigenvalue", "explained_frac")
  }

  /** Deterministic power iteration on a symmetric d×d matrix: fixed
    * uniform start (or basis vector `startBasis` when the uniform start
    * is orthogonal to the dominant eigenvector — the deflation loop
    * passes the component index), `iters` fixed rounds, sign normalized
    * so the largest-|loading| entry is positive. Returns (eigenvector,
    * eigenvalue); eigenvalue 0 with a zero vector for a zero matrix.
    */
  private def powerIterate(a: Array[Array[Double]], iters: Int,
      startBasis: Int): (Array[Double], Double) = {
    val d = a.length
    def run(start: Array[Double]): (Array[Double], Double) = {
      var v = start
      var lambda = 0.0
      var it = 0
      while (it < iters && v != null) {
        val av = Array.tabulate(d)(i => {
          var s = 0.0; var j = 0
          while (j < d) { s += a(i)(j) * v(j); j += 1 }
          s
        })
        val norm = math.sqrt(av.map(x => x * x).sum)
        if (norm <= 0.0) v = null
        else { v = av.map(_ / norm); lambda = norm }
        it += 1
      }
      if (v == null) (Array.fill(d)(0.0), 0.0) else (v, lambda)
    }
    var (v, lambda) = run(Array.fill(d)(1.0 / math.sqrt(d)))
    if (lambda == 0.0 && startBasis >= 0) {
      // uniform start annihilated (orthogonal to every surviving
      // eigenvector, or zero matrix): retry from a basis vector — the
      // deflation loop cycles through all d, so a nonzero residual
      // spectrum is always found deterministically
      var b = startBasis % d
      var tries = 0
      while (lambda == 0.0 && tries < d) {
        val e = Array.fill(d)(0.0); e(b) = 1.0
        val r = run(e); v = r._1; lambda = r._2
        b = (b + 1) % d; tries += 1
      }
    }
    if (lambda > 0.0) {
      val maxIdx = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(maxIdx) < 0) v = v.map(x => -x)
    }
    (v, lambda)
  }

  /** Top-`m` principal components + eigenvalues from the one-pass
    * [[covState]] buffer, by DEFLATED power iteration on the collected
    * d×d state (Hotelling deflation: after each component, cov ←
    * cov − λ·v·vᵀ, so the next dominant direction of the residual is the
    * next component) — the driver-side cost is m·iters·d² flops on a
    * matrix that already fits in memory; the DATA is touched exactly
    * once regardless of m. Components whose residual eigenvalue is 0
    * (spectrum exhausted: m > rank) are returned with eigenvalue 0 and a
    * zero loading vector, so the caller can see exactly where the
    * spectrum ends instead of crashing mid-pipeline.
    *
    * Output: one row per (component, dimension) —
    * (comp 1-based, i 1-based, loading, eigenvalue,
    * explained_frac = λ_c / trace(cov)).
    */
  def pcaComponents(df: DataFrame, vecCol: String, m: Int,
      iters: Int = 100): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val (_, means, cov) = covState(df, vecCol)
    val d = means.length
    require(m <= d, s"m=$m components from a $d-dimensional space")
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val work = cov.map(_.clone())
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double, Double)]
    var c = 0
    while (c < m) {
      val (v, lambda) = powerIterate(work, iters, startBasis = c)
      var i = 0
      while (i < d) {
        rows += ((c + 1L, i + 1L, v(i), lambda,
          if (trace > 0) lambda / trace else 0.0))
        i += 1
      }
      // deflate: work -= lambda v v^T
      i = 0
      while (i < d) {
        var j = 0
        while (j < d) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    df.sparkSession.createDataFrame(rows.toSeq)
      .toDF("comp", "i", "loading", "eigenvalue", "explained_frac")
  }

  /** PCA whitening — the embedding-space normalization SemDeDup-style
    * pipelines apply before cosine work: center on the corpus mean,
    * project onto the top-`m` principal components, scale each
    * coordinate by 1/√λ so every retained direction carries unit
    * variance. Stats come from the SAME one-pass [[covState]] buffer as
    * s07/s08 (no second scan); eigenvectors from [[pcaComponents]]'
    * deflation loop on the collected d×d state. The transform itself is
    * a NARROW projection — the m×d loading matrix and the mean embed as
    * literals, each output coordinate is one codegen'd fold over the
    * input vector, zero UDFs, zero shuffle: at 100 TB it rides the scan.
    *
    * Directions with λ ≤ `eps` (numerically empty: m past the effective
    * rank) whiten to 0 rather than amplifying noise by 1/√0 — the
    * standard guarded-whitening rule. Output: (idCol, y array<double>
    * length m).
    *
    * Sizing bound: the m×d loadings embed as plan literals and the
    * driver holds the d×d covariance — right for embedding-sized d
    * (64–1024, plans of ≤ ~10⁵ literals); at d in the several-thousands
    * both the d² driver state and the literal plan grow quadratic/linear
    * — project with [[mrlTruncate]] or a narrower feature set first.
    */
  def whiten(df: DataFrame, idCol: String, vecCol: String, m: Int,
      iters: Int = 100, eps: Double = 1e-12): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val (_, means, cov) = covState(df, vecCol)
    val d = means.length
    require(m <= d, s"m=$m components from a $d-dimensional space")
    val work = cov.map(_.clone())
    val comps = Array.ofDim[Double](m, d)
    val scales = new Array[Double](m)
    var c = 0
    while (c < m) {
      val (v, lambda) = powerIterate(work, iters, startBasis = c)
      comps(c) = v
      scales(c) = if (lambda > eps) 1.0 / math.sqrt(lambda) else 0.0
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    val meanLit = array(means.map(lit): _*)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanLit,
      (x, mu) => x - mu)
    val ys = (0 until m).map { ci =>
      val vLit = array(comps(ci).map(lit): _*)
      aggregate(zip_with(col("_c"), vLit, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x) * lit(scales(ci))
    }
    df.select(col(idCol), centered.as("_c"))
      .select(col(idCol), array(ys: _*).as("y"))
  }
}
