package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** Deterministic hash-based sampling and dataset splitting — the way a
  * training-data pipeline takes samples and train/val/test splits at
  * 100 TB. Unlike `df.sample()` (RNG per partition: not reproducible
  * across runs/partitionings, not joinable), a hash of a stable key gives
  * every row a permanent bucket: the same row lands in the same split in
  * every run, on any cluster layout, and membership is computable from
  * the key alone (narrow, no shuffle, no state).
  *
  * Group-stable splits fall out of the key choice: hash a user/session id
  * instead of the row id and all of an entity's rows stay in one split —
  * the standard leakage guard when splitting training corpora.
  */
object Sampling {

  /** The scrambled hash itself: polyHash of the salted key, then the
    * order-shuffling bijection (× [[graft.functions.Signatures.Scramble]],
    * mod the prime). Non-negative; uniform enough to threshold, order by,
    * or bucket. The salt decorrelates independent samplings of the same
    * keys.
    */
  def scrambledHash(key: Column, salt: String = ""): Column =
    pmod(
      GraftExpressions.polyHash(concat(lit(salt), key.cast("string")))
        * lit(graft.functions.Signatures.Scramble),
      lit(graft.functions.TextFunctions.P))

  /** Stable bucket in [0, buckets): [[scrambledHash]] of the salted
    * string key, mod buckets (the same hash family the dedup signatures
    * use, DuckDB-mirrorable).
    *
    * The scramble step is load-bearing: polyHash alone is ORDER-PRESERVING
    * for short keys (no modular wraparound), so a structured key family —
    * contiguous ids, a shared prefix — lands in one narrow band of the
    * hash range, and a raw `% buckets` threshold keeps either ALL of the
    * family or NONE of it (measured: 400 contiguous ids spanned 0.3% of
    * the bucket range). Post-multiplying by a large odd constant mod the
    * prime is a bijection that shuffles the order (the q28 lesson, now
    * applied to membership); only then is `% buckets` a fair bucket.
    */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column = {
    require(buckets > 0, "buckets must be positive")
    scrambledHash(key, salt) % buckets
  }

  /** Keep rows whose bucket falls below `pct` of `buckets` — a
    * deterministic `pct/buckets` sample, stable under re-runs and
    * repartitioning.
    */
  def sample(df: DataFrame, keyCol: String, pct: Int, buckets: Int = 100,
      salt: String = ""): DataFrame = {
    GraftExpressions.register(df.sparkSession)
    df.filter(hashBucket(col(keyCol), buckets, salt) < pct)
  }

  /** Stratified hash sample: an independent `pct`-per-`buckets` sample
    * within every stratum (the per-language / per-source balanced-take
    * of a corpus pipeline). The membership hash salts the key with the
    * STRATUM, so the samples are decorrelated across strata while each
    * stays deterministic, permanent, and layout-independent — all the
    * q20 guarantees, per group, with zero shuffle (the stratum is part
    * of the row).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      pct: Int, buckets: Int = 100, salt: String = ""): DataFrame = {
    GraftExpressions.register(df.sparkSession)
    val key = concat(col(strataCol).cast("string"), lit(":"), col(keyCol).cast("string"))
    df.filter(hashBucket(key, buckets, salt) < pct)
  }

  /** Balanced fixed-count take: exactly `n` rows per stratum (fewer when
    * a stratum is smaller), chosen by HASH ORDER — deterministic,
    * layout-independent, and unbiased (the hash is a uniform shuffle of
    * each stratum), unlike "first n" (arrival-order bias) or RNG
    * sampling (irreproducible). Ties on the hash break by the key, so
    * selection is total-ordered. One shuffle on the stratum; the window
    * is per-stratum, parallel across strata — the source-balancing
    * ("equal docs per language/domain") take of a corpus pipeline.
    */
  def takePerGroup(df: DataFrame, keyCol: String, strataCol: String, n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0, "take count must be positive")
    GraftExpressions.register(df.sparkSession)
    // see scrambledHash: raw polyHash order is degenerate for short keys
    val h = scrambledHash(col(keyCol), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(h, col(keyCol))
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= n).drop("_rk")
  }

  /** Deterministic weighted sample WITHOUT replacement (the
    * Efraimidis–Spirakis 2006 exponential-keys scheme, RNG replaced by
    * the scrambled hash): each row gets a uniform u ∈ (0, 1] from its
    * salted key, and the top `n` rows by u^(1/w) are the sample —
    * inclusion probability rises with `weightCol`, membership is
    * permanent, layout-independent, and re-salting draws a fresh
    * decorrelated sample. The rank key is computed as ln(u)/w — the
    * same ORDER as u^(1/w) (monotone transform) without `pow`, whose
    * cross-engine libm ulps are wilder than ln's. Selection is
    * orderBy+limit — Spark plans TakeOrdered (per-partition top-n +
    * driver merge of n·partitions rows), never a global sort (the q32
    * discipline). Rows with null/non-positive weight are excluded (the
    * scheme is undefined there). Ties (equal key AND equal wkey —
    * duplicate keyCol values) break on the key, so the sample is a
    * deterministic row SET whenever keyCol is unique.
    * Output: all input columns + wkey (the unrounded rank key).
    */
  def weightedTake(df: DataFrame, keyCol: String, weightCol: Column, n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0, "take count must be positive")
    GraftExpressions.register(df.sparkSession)
    val u = (scrambledHash(col(keyCol), salt) + lit(1L)).cast("double") /
      lit((graft.functions.TextFunctions.P + 1L).toDouble)
    df.filter(weightCol.isNotNull && weightCol.cast("double") > 0)
      .withColumn("wkey", log(u) / weightCol.cast("double"))
      .orderBy(col("wkey").desc, col(keyCol))
      .limit(n)
  }

  /** Deterministic global shuffle into write-ready training shards — the
    * "shuffle the corpus before training" step, without RNG: every row
    * gets (shard, shard_pos) from the scrambled hash of its salted key,
    * so the order is uniform, permanent, layout-independent, and a new
    * salt ("epoch2") is a fresh decorrelated shuffle. Scale shape: shard
    * assignment is a narrow map (`hash % shards`); within-shard positions
    * are a window PER SHARD (parallelism = shards — size `shards` to the
    * cluster exactly as you size output files); there is no global sort
    * or global row_number anywhere. Pair with [[graft.sources.Sinks]]
    * partitioned writes: repartition by shard, sortWithinPartitions by
    * shard_pos, and each shard lands as one ordered file.
    *
    * Output: all input columns + shard (0..shards-1) + shard_pos
    * (0-based rank within the shard, hash order, key tiebreak).
    */
  def shuffleShards(df: DataFrame, keyCol: String, shards: Int,
      salt: String = ""): DataFrame = {
    require(shards > 0, "shards must be positive")
    GraftExpressions.register(df.sparkSession)
    val h = scrambledHash(col(keyCol), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_h"), col(keyCol))
    df.withColumn("_h", h)
      .withColumn("shard", (col("_h") % shards).cast("long"))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
  }

  /** Temperature resampling — the multilingual-pretraining data-mixing
    * step (sample group l with probability ∝ (n_l/N)^alpha, XLM/mBERT
    * style), realized as a deterministic DOWNSAMPLE: per-group keep-rate
    * r_l = (n_min/n_l)^(1-alpha), so kept counts are ∝ n_l^alpha, the
    * smallest group keeps everything, and alpha=1 is a no-op while
    * alpha→0 equalizes group sizes. Membership is the q20 hash
    * predicate (permanent, layout-independent, group-salted), with the
    * per-group threshold floor(r_l · buckets) computed from one tiny
    * count aggregation and broadcast back — two narrow passes, one
    * |groups|-row shuffle, never an RNG.
    *
    * alpha = 0.5 routes through `sqrt`, which IEEE 754 requires to be
    * correctly rounded — so the threshold is bit-identical on any
    * engine; other alphas use `pow`, where cross-engine libm ulps could
    * in principle flip a row at a floor boundary (fine in production,
    * noted for oracle work).
    */
  def temperatureSample(df: DataFrame, keyCol: String, groupCol: String,
      alpha: Double, buckets: Int = 1000000, salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(buckets > 0, "buckets must be positive")
    GraftExpressions.register(df.sparkSession)
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val ratio = col("_nmin").cast("double") / col("_n")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1 - alpha)
    // n_min rides an unpartitioned window over the |groups|-row count
    // table (metadata-sized by contract) instead of a separate agg +
    // crossJoin + broadcast — one fewer materialization barrier, same
    // exact longs
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val thr = counts.withColumn("_nmin", min(col("_n")).over(wAll))
      .select(col(groupCol), floor(rate * buckets).cast("long").as("_thr"))
    val key = concat(col(groupCol).cast("string"), lit(":"), col(keyCol).cast("string"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(hashBucket(key, buckets, salt) < col("_thr"))
      .select(df.columns.map(col): _*)
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", arXiv:2302.03169):
    * score every raw-corpus document by how much more likely its hashed
    * n-gram features are under a TARGET corpus (the
    * "looks-like-Wikipedia" distribution) than under the raw corpus
    * itself — log w(x) = Σ_f [ln p̂_target(f) − ln p̂_raw(f)] over the
    * document's unigram+bigram feature buckets, with add-one smoothing
    * over `dim` buckets. Selection = top-k by weight (deterministic —
    * no Gumbel noise; ties break on id).
    *
    * Scale shape: featurization is narrow (token hashes → bucket ids,
    * the t12 hashing trick); the two corpus feature distributions are
    * partial-agg groupBys bounded by `dim` rows each, so the log-ratio
    * table is TINY and BROADCASTS — scoring is a map-side join + one
    * per-doc sum, no shuffle of the corpus beyond the per-doc
    * aggregation.
    *
    * Output: idCol, n_feats, logw (4 dp). Feed `orderBy(desc("logw"),
    * idCol).limit(k)` for the selection — a TakeOrdered, parallel at any
    * corpus size.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int = 4096): DataFrame = {
    require(dim > 0, "dim must be positive")
    GraftExpressions.register(raw.sparkSession)
    import graft.functions.{Signatures => Sig}
    import graft.functions.TextFunctions.{tokens, P}
    val Scramble = Sig.Scramble
    def features(df: DataFrame): DataFrame = {
      val th = Sig.tokenHashes(tokens(col(textCol)))
      val uni = transform(th, h => (h * Scramble) % P % dim)
      val n = greatest(size(th) - 1, lit(0))
      val bi = zip_with(slice(th, lit(1), n), slice(th, lit(2), n),
        (a, b) => (((a * Sig.B + b) % P) * Scramble) % P % dim)
      df.select(col(idCol).as("_id"), explode(concat(uni, bi)).as("bucket"))
    }
    def dist(df: DataFrame) = features(df).groupBy("bucket").agg(count(lit(1)).as("c"))
    val tc = dist(target)
    val rc = dist(raw)
    // log-ratio per observed bucket; <= 2*dim rows -> broadcast. Every
    // scored feature comes from `raw`, so its bucket is in rc and
    // therefore in this table by construction — scoring raw against its
    // own distribution needs no unseen-bucket floor. (Scoring a THIRD
    // corpus against these two would need one: ln((rt+dim)/(tt+dim)).)
    // The corpus totals tt/rt ride an unpartitioned window over this
    // dim-bounded table — exact long sums, one fewer pair of agg
    // branches + crossJoin + broadcast than computing them separately
    // (each of those was its own materialization barrier under AQE).
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val ratio = tc.withColumnRenamed("c", "ct")
      .join(rc.withColumnRenamed("c", "cr"), Seq("bucket"), "full_outer")
      .withColumn("tt", sum(coalesce(col("ct"), lit(0L))).over(wAll))
      .withColumn("rt", sum(coalesce(col("cr"), lit(0L))).over(wAll))
      .select(col("bucket"),
        (log(coalesce(col("ct"), lit(0L)) + 1.0) - log(col("tt") + dim)
          - log(coalesce(col("cr"), lit(0L)) + 1.0) + log(col("rt") + dim)).as("lr"))
    // no join back to `raw`: every id with >= 1 token appears in rawF and
    // therefore in this aggregate; ids with zero features were absent
    // from the old inner join too
    features(raw)
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy("_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("_lw"))
      .select(col("_id").as(idCol), col("n_feats"),
        graft.functions.Rounding.mirrorRound(col("_lw"), 4).as("logw"))
  }

  /** Deterministic per-group take-to-budget — the data-mixer selection
    * step (the Dolma/RefinedWeb "mix sources to a target token budget"
    * shape): for each group (domain, source, language), take rows in
    * scrambled-hash order until the group's cumulative `weightCol`
    * (token/char count) reaches its budget. The row that CROSSES the
    * budget is kept — a group rich enough always fills its budget; a
    * group poorer than its budget contributes whole. Groups absent from
    * `budgets` drop entirely (explicit mixes only — a silently-default
    * budget would ship an unreviewed corpus slice).
    *
    * Determinism: selection is a pure function of (key, salt, budgets) —
    * layout-independent, permanent under re-runs, and a new salt draws a
    * fresh decorrelated prefix (epoch re-mixing). `keyCol` must be
    * unique per row (the (hash, key) order ties otherwise — the X-family
    * contract). Null weights exclude the row (an unknown token count
    * cannot be budgeted); a NEGATIVE weight fails loud (`raise_error` in
    * the histogram pass, which evaluates every row — a corrupted token
    * count must not silently shrink the corpus; the StreamingBudget twin
    * already throws).
    *
    * Scale shape (the q60/q65 histogram-cutpoint discipline — the corpus
    * NEVER enters a per-group sort): the realistic LLM mix is 10–30
    * sources over the whole corpus, so a per-group running-sum window
    * would sort-shuffle 100 TB into ≤30 tasks. Instead: (1) bucket each
    * row by the high bits of its scrambled hash (`_h div width` — bucket
    * order IS hash order), (2) build a per-(group, bucket) weight
    * histogram — a partial agg, ≤ |groups|·`buckets` rows after map-side
    * combine, (3) find each group's BOUNDARY bucket (smallest bucket
    * whose cumulative weight reaches the budget — the q63 integer
    * crossing rule, exact longs; the only full-corpus-derived window
    * runs over this histogram METADATA, and the |groups|-row (boundary,
    * remaining-budget) result returns to the driver exactly like
    * `histogramCutpoints`' cutpoint longs), (4) admit buckets strictly
    * before the boundary with a NARROW literal-map filter — no join, no
    * shuffle, (5) resolve the boundary bucket exactly with a residual
    * window over ~1/`buckets` of the corpus, crossing row kept.
    * Selection cost scales with the scan, not with |groups|; the
    * admitted set is bit-identical to the definitional per-group running
    * sum (cum − w < budget in (hash, key) order), which the oracle
    * mirrors. Weights must be integral (token/char counts — the
    * arithmetic stays in exact longs, and a fractional weight would be
    * silently truncated instead of budgeted).
    *
    * Bucket sizing: the residual window sorts each group's ONE boundary
    * bucket in a single task — about `corpusBytes / (|groups| ·
    * buckets)` bytes — so choose `buckets ≥ corpusBytes / (|groups| ·
    * targetTaskBytes)`. The 4096 default puts a 100 TB, 30-source
    * corpus near 0.8 GB per residual task; 65536 takes it to ~50 MB.
    * Buckets are hash-range slices, so the count changes ONLY that task
    * size: the admitted set is invariant in `buckets` (spec-asserted),
    * making the knob free to raise with corpus size.
    */
  def takeToBudget(df: DataFrame, groupCol: String, weightCol: String,
      keyCol: String, budgets: Map[String, Long], salt: String = "",
      buckets: Int = 4096): DataFrame = {
    require(budgets.nonEmpty, "takeToBudget needs at least one group budget")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(buckets >= 2, "need at least two hash-range buckets")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    df.schema(weightCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
      case t => throw new IllegalArgumentException(
        s"takeToBudget needs an integral $weightCol (token/char count), got $t")
    }
    GraftExpressions.register(df.sparkSession)
    // bucket = high bits of the scrambled hash: monotone in _h, so
    // cumulative-by-bucket is cumulative-in-hash-order at bucket grain.
    // Group membership (the explicit-mix rule) is an InSet literal — it
    // pushes to the scan; a broadcast join here would cost an exchange
    // in both the histogram job and the admission query for a table
    // that's already driver-resident.
    val width = (graft.functions.TextFunctions.P + buckets - 1) / buckets
    val base = df
      .filter(col(weightCol).isNotNull &&
        col(groupCol).isInCollection(budgets.keys.toSeq))
      .withColumn("_w", when(col(weightCol) < 0, raise_error(concat(
          lit(s"takeToBudget: negative $weightCol at $keyCol="),
          col(keyCol).cast("string")))).otherwise(col(weightCol)).cast("long"))
      .withColumn("_h", scrambledHash(col(keyCol), salt))
      .withColumn("_bk", expr(s"_h div $width"))
    // per-(group, bucket) weight histogram — metadata-sized after the
    // partial agg; cumulating it in bucket order finds the boundary
    // bucket b* = smallest bucket whose cumulative weight reaches the
    // budget (absent → the group never fills: keep whole) and _rm = the
    // budget still open ENTERING b*. |groups| (b*, _rm) pairs come back
    // as driver metadata — the histogramCutpoints discipline. The
    // histogram itself collects when provably small (≤ |groups|·buckets
    // rows — one job, the cheap path); past ~4M potential rows the
    // cumulation runs as a Spark window over the histogram (still
    // metadata — buckets ordered, never rows).
    val hist = base.groupBy(col(groupCol), col("_bk"))
      .agg(sum(col("_w")).as("_bw"))
    val boundaries: Map[String, (Long, Long)] =
      if (budgets.size.toLong * buckets <= 4000000L) {
        hist.collect().groupBy(_.getString(0)).flatMap { case (g, rs) =>
          var cum = 0L
          rs.sortBy(_.getLong(1)).iterator.map { r =>
            cum += r.getLong(2)
            (r.getLong(1), cum, r.getLong(2))
          }.collectFirst { case (bk, c, bw) if c >= budgets(g) =>
            g -> (bk, budgets(g) - c + bw)
          }
        }
      } else {
        val spark = df.sparkSession
        import spark.implicits._
        val bdf = broadcast(budgets.toSeq.toDF("_bgroup", "_budget"))
        val wc = org.apache.spark.sql.expressions.Window
          .partitionBy(groupCol).orderBy("_bk")
        hist.join(bdf, col(groupCol) === col("_bgroup"))
          .withColumn("_cum", sum(col("_bw")).over(wc))
          .filter(col("_cum") >= col("_budget"))
          .groupBy(col(groupCol))
          .agg(min(struct(col("_bk"),
            (col("_budget") - col("_cum") + col("_bw")).as("_rm"))).as("_b"))
          .select(col(groupCol), col("_b").getField("_bk"),
            col("_b").getField("_rm"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      }
    val bstar = typedlit(boundaries.map { case (g, b) => g -> b._1 })
    val remain = typedlit(boundaries.map { case (g, b) => g -> b._2 })
    val keep = df.columns.map(col)
    // buckets strictly before the boundary admit with a narrow
    // literal-map filter — their whole prefix sits under the budget by
    // construction of b*; never-filling groups (absent key → null) keep
    // every bucket
    val clear = base
      .filter(element_at(bstar, col(groupCol)).isNull ||
        col("_bk") < element_at(bstar, col(groupCol)))
      .select(keep: _*)
    // the boundary bucket alone gets the exact residual window — a
    // per-group sort of ~1/buckets of the corpus, crossing row kept
    val we = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("_h"), col(keyCol))
    val edge = base.filter(col("_bk") === element_at(bstar, col(groupCol)))
      .withColumn("_rcum", sum(col("_w")).over(we))
      .filter(col("_rcum") - col("_w") < element_at(remain, col(groupCol)))
      .select(keep: _*)
    clear.unionByName(edge)
  }

  /** Deterministic per-group epoch upsampling — [[takeToBudget]]'s
    * companion mixer step (the "repeat high-quality sources 2.5×,
    * commons 1×" weighting of LLM pre-training mixes): each group's rows
    * replicate `epochsPermille/1000` times, with an `epoch` column
    * distinguishing copies (trainers shuffle on (key, epoch)). The
    * FRACTIONAL epoch is a deterministic scrambled-hash subset — permille
    * precision keeps every comparison integer (no float thresholds, so an
    * external SQL oracle reproduces membership bit-for-bit), and the
    * epoch index salts the hash, so successive fractional epochs of the
    * same group draw decorrelated subsets. Groups absent from the map
    * drop (the [[takeToBudget]] explicit-mix rule); permille 0 drops a
    * group explicitly. Scale shape: the mix table broadcasts, replication
    * is a NARROW `sequence`+`explode` (fan-out = per-row epoch count,
    * bounded by the mix), no shuffle anywhere.
    */
  def epochMix(df: DataFrame, groupCol: String, keyCol: String,
      epochsPermille: Map[String, Long], salt: String = ""): DataFrame = {
    require(epochsPermille.nonEmpty, "epochMix needs at least one group weight")
    require(epochsPermille.values.forall(_ >= 0), "epoch permille must be non-negative")
    GraftExpressions.register(df.sparkSession)
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = broadcast(epochsPermille.toSeq.toDF("_egroup", "_permille"))
    val full = expr("_permille div 1000") // integral div: no double round-trip
    val frac = col("_permille") % 1000L
    df.join(bdf, col(groupCol) === col("_egroup"))
      .withColumn("epoch", explode(sequence(lit(0L), full)))
      .filter(col("epoch") < full ||
        scrambledHash(concat(lit("ep"), col("epoch"), lit(":"),
          col(keyCol).cast("string")), salt) % 1000L < frac)
      .drop("_egroup", "_permille")
  }

  /** Curriculum (annealed) mixing — the schedule-aware third of the mixer
    * trio ([[takeToBudget]] selects, [[epochMix]] repeats, this SHIFTS the
    * mix over training phases, the two-phase / "midtraining" data schedule
    * where e.g. high-quality sources anneal UP late in pre-training): each
    * group's keep-rate interpolates linearly from `startPermille` to
    * `endPermille` across `phases` buckets, and a row joins phase `k` iff
    * its phase-salted scrambled hash lands under that phase's permille.
    * The interpolation is the all-non-negative form
    * `(w0·(P−1−k) + w1·k) / (P−1)` so integer division agrees cross-engine
    * (Scala truncates toward zero, DuckDB floors — they only match on
    * non-negative numerators). Phase salts the hash, so a group annealing
    * DOWN sheds a decorrelated subset each phase rather than a nested
    * prefix. Groups absent from the maps drop (explicit-mix rule). Scale
    * shape: the `phases`×|groups| weight table broadcasts, membership is a
    * narrow filter — no shuffle; fan-out per row ≤ `phases`.
    */
  def annealMix(df: DataFrame, groupCol: String, keyCol: String,
      startPermille: Map[String, Long], endPermille: Map[String, Long],
      phases: Int, salt: String = ""): DataFrame = {
    require(phases >= 2, "annealMix needs at least two phases to interpolate")
    require(startPermille.nonEmpty, "annealMix needs at least one group weight")
    require(startPermille.keySet == endPermille.keySet,
      "start/end weight maps must cover the same groups")
    require((startPermille.values ++ endPermille.values).forall(v => v >= 0 && v <= 1000),
      "anneal permille must be in [0, 1000]")
    GraftExpressions.register(df.sparkSession)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = for {
      (g, w0) <- startPermille.toSeq
      k <- 0 until phases
    } yield (g, k.toLong,
      (w0 * (phases - 1 - k) + endPermille(g) * k) / (phases - 1))
    val bdf = broadcast(rows.toDF("_agroup", "phase", "_permille"))
    df.join(bdf, col(groupCol) === col("_agroup"))
      .filter(scrambledHash(concat(lit("ph"), col("phase"), lit(":"),
        col(keyCol).cast("string")), salt) % 1000L < col("_permille"))
      .drop("_agroup", "_permille")
  }

  /** Add a `split` column assigning each row to a named fraction.
    * `splits` are (name, weight) with weights summing to `buckets`, e.g.
    * Seq("train" -> 80, "val" -> 10, "test" -> 10). Splits are disjoint,
    * exhaustive, and permanent for a given (key, salt, buckets).
    */
  def split(df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
      buckets: Int = 100, salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    require(splits.map(_._2).sum == buckets,
      s"split weights must sum to buckets=$buckets, got ${splits.map(_._2).sum}")
    GraftExpressions.register(df.sparkSession)
    val b = hashBucket(col(keyCol), buckets, salt)
    val bounds = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val expr = splits.init.zip(bounds.init).foldRight(lit(splits.last._1)) {
      case (((name, _), hi), elseCol) => when(b < hi, lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", expr)
  }

  /** Poisson(1) bootstrap CDF thresholds (k = 0..4; weights cap at 5):
    * e⁻¹·Σ_{j≤k} 1/j! as exact decimal literals — both engines parse
    * the same doubles, so a uniform draw maps to the same weight
    * everywhere.
    */
  private val PoissonCdf = Seq(
    0.36787944117144233, // P(0)
    0.7357588823428846,  // P(<=1)
    0.9196986029286058,  // P(<=2)
    0.9810118431238462,  // P(<=3)
    0.9963401531726563)  // P(<=4)

  /** The threshold literals verbatim, for oracle SQL construction —
    * decimal strings both engines parse to the identical doubles.
    */
  def poissonCdfLiterals: Seq[String] = PoissonCdf.map(_.toString)

  /** Poisson bootstrap confidence interval for the per-group mean — the
    * SCALABLE bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    * for massive data streams"; Owen & Eckles 2012): classical
    * resampling draws n rows WITH replacement per replicate, which is
    * unshardable (a replicate's multiset needs global coordination);
    * the Poisson approximation gives every (row, replicate) an
    * INDEPENDENT Poisson(1) multiplicity, so weights are a pure
    * map-side function of the row key and the whole bootstrap becomes
    * one partial-agg groupBy — at 100 TB the only shuffled rows are the
    * B·|groups| replicate partials, never the data.
    *
    * Determinism (the repo's no-RNG rule): the uniform behind each
    * weight is [[scrambledHash]](id#b)/P — exact integer hash, one
    * exact division — inverted through the Poisson CDF thresholds
    * ([[PoissonCdf]], shared literals). Replicate means mirror-round to
    * 6 dp BEFORE ranking (so a last-ulp float-sum difference between
    * engines cannot flip a rank), ties break by replicate id, and the
    * CI bounds select by the exact rank rule lo = max(1, ceil(α·B)),
    * hi = ceil((1−α)·B) over the sorted replicate means. Replicates
    * whose total weight is 0 (possible only for tiny groups) drop, and
    * n_reps reports how many survived — the caller sees the
    * degradation instead of a silently wider interval.
    *
    * Output: groupCols, n (rows), mean (full-sample, 6 dp), n_reps,
    * lo, hi (the (α, 1−α) bootstrap percentile interval, 6 dp).
    */
  def poissonBootstrapMeanCI(df: DataFrame, groupCols: Seq[String],
      idCol: String, valueCol: Column, b: Int = 200,
      alphaPct: Int = 25, salt: String = "boot:"): DataFrame = {
    require(b >= 2, s"need at least 2 replicates, got $b")
    // alphaPct = one-sided tail mass in 1/1000 units (25 -> 2.5% tails,
    // a 95% interval) — integer so the rank arithmetic stays exact
    require(alphaPct >= 1 && alphaPct < 500,
      s"alphaPct (tail mass, 1/1000 units) must be in [1, 500), got $alphaPct")
    GraftExpressions.register(df.sparkSession)
    val parts = groupCols.map(col)
    val base = df.select(parts :+ col(idCol).cast("string").as("_id") :+
        valueCol.cast("double").as("_x"): _*)
      .filter(col("_x").isNotNull && col("_id").isNotNull)
    val rep = base.select(parts ++ Seq(col("_id"), col("_x"),
      explode(sequence(lit(0), lit(b - 1))).as("_b")): _*)
    val u = scrambledHash(concat(col("_id"), lit("#"), col("_b").cast("string")), salt)
      .cast("double") / lit(graft.functions.TextFunctions.P.toDouble)
    val wgt = PoissonCdf.zipWithIndex.foldRight(lit(PoissonCdf.length.toLong)) {
      case ((thr, k), rest) => when(u < thr, lit(k.toLong)).otherwise(rest)
    }
    val means = rep.withColumn("_w", wgt)
      .groupBy(parts :+ col("_b"): _*)
      .agg(sum(col("_w") * col("_x")).as("_wx"), sum(col("_w")).as("_wn"))
      .filter(col("_wn") > 0L)
      .withColumn("_m",
        graft.functions.Rounding.mirrorRound(col("_wx") / col("_wn").cast("double"), 6))
    val full = base.groupBy(parts: _*)
      .agg(count(lit(1)).as("n"),
        graft.functions.Rounding.mirrorRound(
          sum(col("_x")) / count(lit(1)).cast("double"), 6).as("mean"))
    val lo = greatest(lit(1L), ceil(col("n_reps") * lit(alphaPct.toLong) / lit(1000.0)).cast("long"))
    val hi = ceil(col("n_reps") * lit(1000L - alphaPct) / lit(1000.0)).cast("long")
    val ci = means.groupBy(parts: _*)
      .agg(count(lit(1)).as("n_reps"),
        transform(array_sort(collect_list(struct(col("_m"), col("_b")))),
          p => p.getField("_m")).as("_ms"))
      .select(parts ++ Seq(col("n_reps"),
        element_at(col("_ms"), lo.cast("int")).as("lo"),
        element_at(col("_ms"), hi.cast("int")).as("hi")): _*)
    // NULL-SAFE stitch: groupBy treats a null group key as a real group
    // in BOTH aggregates — a plain equi-join would silently drop it
    // (the theilSen-escalation lesson, same round)
    if (groupCols.isEmpty) full.crossJoin(ci)
      .select(col("n"), col("mean"), col("n_reps"), col("lo"), col("hi"))
    else {
      val ciR = ci.select(groupCols.map(c => col(c).as(s"_c_$c")) ++
        Seq(col("n_reps"), col("lo"), col("hi")): _*)
      val cond = groupCols.map(c => col(c) <=> col(s"_c_$c")).reduce(_ && _)
      full.join(ciR, cond)
        .select(parts ++ Seq(col("n"), col("mean"), col("n_reps"),
          col("lo"), col("hi")): _*)
    }
  }
}
