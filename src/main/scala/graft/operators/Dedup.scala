package graft.operators

import graft.operators.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{EmbeddingLsh, GraftExpressions, Rounding, SignatureExpressions => SigX, Signatures => Sig}
import graft.functions.TextFunctions.tokens

/** Reusable deduplication operators over arbitrary DataFrames — the
  * library surface behind the d01–d05 verified queries (SURVEY.md §2c).
  * All candidate generation is join-based (content keys, LSH band keys,
  * SimHash chunk keys); nothing is driver-side, so the same plans scale
  * to 100 TB. Pair outputs use columns (id_a, id_b, ...) with id_a < id_b.
  */
object Dedup {

  /** Exact dedup: annotate each row with its duplicate group. The shuffle
    * key is a 16-byte md5 of the normalized text, never the text itself.
    * Output: idCol, canonical_id (min id in group), group_size, keep.
    */
  def exact(df: DataFrame, idCol: String, textCol: String,
      preserve: Boolean = false): DataFrame = {
    // preserve=true carries the input columns EXCEPT the payload text
    // through the fingerprint window and appends (canonical_id,
    // group_size, keep) — the composition form (p03/p10/p11). The text
    // column itself is dropped BEFORE the exchange: the window shuffles
    // ids + metadata + a 16-byte fingerprint, never document bodies
    // (carrying them measured 1.7x on p10 at sf0.1 and would be the
    // difference between shuffling keys and shuffling the corpus at
    // 100 TB). Callers that need the text re-read it from the source —
    // the lineDedup rebuild-join trade, made once here for everyone.
    if (!preserve) {
      val w = Window.partitionBy(
        graft.functions.TextFunctions.contentFingerprint(col(textCol)))
      df.select(col(idCol),
          min(idCol).over(w).as("canonical_id"),
          count(lit(1)).over(w).as("group_size"))
        .withColumn("keep", col(idCol) === col("canonical_id"))
    } else {
      val head = df.columns.toSeq.filterNot(_ == textCol).map(col)
      val w = Window.partitionBy(col("_fp"))
      df.select(head :+
          graft.functions.TextFunctions.contentFingerprint(col(textCol)).as("_fp"): _*)
        .select(head ++ Seq(
          min(idCol).over(w).as("canonical_id"),
          count(lit(1)).over(w).as("group_size")): _*)
        .withColumn("keep", col(idCol) === col("canonical_id"))
    }
  }

  /** (id, sh): distinct 3-gram shingle hashes per document (one-pass
    * native expression).
    */
  def shingled(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    SigX.register(df.sparkSession)
    df.select(col(idCol).as("_gid"), SigX.shingleHash(tokens(col(textCol))).as("sh"))
  }

  /** Exact pairwise n-gram Jaccard via shingle equi-join. `maxDf` caps
    * hot shingles (a shingle in many documents carries no dedup signal
    * and only fans out the join — the skew guard).
    * Output: id_a, id_b, jaccard (>= thr).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      thr: Double, maxDf: Int): DataFrame = {
    // materialize the exploded shingle table ONCE (the d16/q31 discipline):
    // it feeds the df-cap count AND the semi-join probe, and `kept` below
    // feeds three more consumers — left lazy, the r13 plan audit counted
    // 16 parquet scans in this query (the shingling subtree re-evaluated
    // per reference); checkpointed it is 1
    val ex = shingled(df, idCol, textCol)
      .select(col("_gid"), explode(col("sh")).as("shingle"))
      .eagerPin()
    // df cap as PARTIAL-AGG + SEMI-JOIN, not a window (the q31/d15
    // discipline): a count window over the exploded shingle stream ships
    // every copy of a boilerplate shingle to one task and BUFFERS the
    // whole group before the cap can drop it. The partial-agg count
    // collapses hot shingles map-side (one (shingle, partial) row per
    // task), and the semi-join's build side contains no hot key at all —
    // the hot copies stream through the probe and drop without ever
    // being held together in memory.
    val lowDf = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("shingle")
    // kept feeds the per-doc size agg and BOTH sides of the pair join —
    // materialize it too (see the ex note above)
    val kept = ex.join(lowDf, Seq("shingle"), "left_semi")
      .select("_gid", "shingle")
      .eagerPin()
    val n = kept.groupBy("_gid").agg(count(lit(1)).as("n"))
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a.shingle") === col("b.shingle") && col("a._gid") < col("b._gid"))
      .groupBy(col("a._gid").as("id_a"), col("b._gid").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(n.as("na"), col("id_a") === col("na._gid"))
      .join(n.as("nb"), col("id_b") === col("nb._gid"))
      .select(col("id_a"), col("id_b"),
        Rounding.mirrorRound(col("inter") * 1.0 / (col("na.n") + col("nb.n") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= thr)
  }

  /** MinHash LSH near-dup pairs: 32 minhashes → 8×4 banding → band-key
    * equi-join for candidates → exact Jaccard verification of candidates
    * only. Output: id_a, id_b, jaccard (>= thr).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      thr: Double): DataFrame = {
    val (docs, cand) = minhashCandidatesWithDocs(df, idCol, textCol)
    verifyJaccard(cand, "id_a", docs, "id_b", docs, thr)
      .select("id_a", "id_b", "jaccard")
  }

  /** Just the banded candidate set (id_a < id_b), WITHOUT the exact
    * Jaccard verification join — for compositions that rescore
    * candidates by a different measure ([[sparseCosineRescoreTokens]],
    * d14), where paying the per-candidate shingle-intersect only to
    * discard the score doubles the candidate-stage cost.
    */
  def minhashBandCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    minhashCandidatesWithDocs(df, idCol, textCol)._2

  private def minhashCandidatesWithDocs(df: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    // materialize the shingle table ONCE: it feeds both sides of the
    // band-key self-join AND both verifyJaccard sides (the r13 plan
    // audit counted 8 parquet scans in d03 from the un-pinned subtree)
    val docs = shingled(df, idCol, textCol).filter(size(col("sh")) > 0)
      .eagerPin()
    val bands = docs
      .select(col("_gid"), explode(SigX.minhashBandKeys(col("sh"))).as("bk"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.bk") === col("b.bk") && col("a._gid") < col("b._gid"))
      .select(col("a._gid").as("id_a"), col("b._gid").as("id_b"))
      .distinct()
    (docs, cand)
  }

  /** Exact-Jaccard verification of a candidate pair set against (id, sh)
    * shingle tables — the shared tail of every MinHash path; left/right
    * sides may come from different corpora.
    */
  private def verifyJaccard(cand: DataFrame, leftCol: String, leftDocs: DataFrame,
      rightCol: String, rightDocs: DataFrame, thr: Double): DataFrame = {
    val inter = size(array_intersect(col("sa.sh"), col("sb.sh")))
    cand
      .join(leftDocs.as("sa"), col(leftCol) === col("sa._gid"))
      .join(rightDocs.as("sb"), col(rightCol) === col("sb._gid"))
      .select(col(leftCol), col(rightCol),
        Rounding.mirrorRound(inter * 1.0 / (size(col("sa.sh")) + size(col("sb.sh")) - inter), 4).as("jaccard"))
      .filter(col("jaccard") >= thr)
  }

  /** SimHash near-dup pairs: 60-bit signature → 4×15-bit pigeonhole chunk
    * join (full recall for Hamming <= 3) → verified Hamming distance.
    * `maxChunkDf` caps hot chunk keys, the quadratic-fan-out skew guard.
    * Output: id_a, id_b, hamming (<= maxHamming).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxChunkDf: Int = 100): DataFrame = {
    SigX.register(df.sparkSession)
    graft.functions.BoundedCollect.register(df.sparkSession)
    require(maxChunkDf >= 1 && maxChunkDf < Int.MaxValue,
      s"maxChunkDf out of range: $maxChunkDf")
    val sims = df.select(col(idCol).as("_gid"), SigX.simhash(tokens(col(textCol))).as("sim"))
      .filter(col("_gid").isNotNull) // null ids can never pair; keeping them
      // in the struct-wrapped collect would also count them toward the df
      // cap while embeddingPairsLsh's bare collect skips nulls — filtering
      // here makes the cap population identical across the pair family
    val ex = sims.select(explode(Sig.simChunkKeys(col("sim"))).as("ck"),
      struct(col("_gid"), col("sim")).as("m"))
    // chunk-df cap via the BOUNDED COLLECT (one exchange, r12): each map
    // task retains <= maxChunkDf+1 members per chunk key (a degenerate
    // all-zero-signature key collapses map-side, never buffering its
    // group), groups at the cap are refused exactly, and the signature
    // subtree is computed ONCE — the count+semi-join shape paid a second
    // full pass over it, and a count window would buffer the hot group
    // whole in one task.
    val buckets = ex.groupBy("ck")
      .agg(graft.functions.BoundedCollect.boundedCollect(
        col("m"), lit(maxChunkDf + 1)).as("ms"))
      .select(array_sort(col("ms")).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxChunkDf)
    // in-place pair enumeration over the (sorted, <= cap) bucket members
    // via the native PairExplode GENERATOR: pairs emit lazily with two
    // integer cursors — per-row state O(cap) (the member array), never
    // the O(cap²) pair array the old flatten materialized and never the
    // two-stage explode's interpreted per-element lambdas. Duplicate-id
    // inputs (a batch re-ingested before exact dedup) make i < j
    // insufficient for id_a < id_b, so self-pairs filter out
    // explicitly — the old self-join's a._gid < b._gid contract.
    graft.functions.PairExplode.register(df.sparkSession)
    buckets
      .select(graft.functions.PairExplode.pairExplode(col("ms")))
      .filter(col("a._gid") =!= col("b._gid"))
      .select(col("a._gid").as("id_a"), col("b._gid").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Incremental near-dup check: MinHash-LSH pairs between a NEW batch
    * and the full corpus (existing ∪ new) — the daily-increment ingest
    * gate ("is today's crawl already in the corpus?"). Band keys from
    * the new side equi-join against band keys of BOTH sides, so
    * existing×existing pairs — the quadratic bulk an incremental check
    * must never pay for — are structurally impossible: the existing
    * corpus participates only through its band-key index, which at
    * 100 TB is precomputed once and stored, making the daily check
    * proportional to |new| × collision rate. Candidates are verified
    * with exact Jaccard like [[minhashLshPairs]]. Output: new_id (from
    * the new batch), other_id (either side), jaccard >= thr; new×new
    * pairs appear once (normalized new_id < other_id).
    *
    * PRECONDITION: the two corpora's ids must be DISJOINT (an id on
    * both sides would make its verify rows ambiguous and its own
    * new-vs-old comparison structurally excluded). Checked by default;
    * `checkDisjoint = false` skips the extra semi-join pass when the id
    * scheme guarantees it (e.g. date-prefixed ingest ids).
    */
  def incrementalMinhashPairs(newDf: DataFrame, existingDf: DataFrame,
      idCol: String, textCol: String, thr: Double,
      checkDisjoint: Boolean = true): DataFrame = {
    if (checkDisjoint) {
      val overlap = newDf.select(col(idCol))
        .join(existingDf.select(col(idCol)), idCol, "left_semi").limit(1)
      require(overlap.isEmpty,
        s"newDf and existingDf share ids (e.g. ${overlap.collect().mkString}) — " +
          "incremental dedup needs disjoint id spaces; re-ingested ids must be " +
          "renamed or removed from the existing side first")
    }
    // Materialize both shingle tables ONCE (the d02/d03 discipline,
    // VERDICT r13 item 9): nw feeds the band build twice (its own bands +
    // the union's new arm) and BOTH verify probes, ex feeds the union arm
    // and the verify corpus — without pinning, the audited q27 plan
    // re-scanned and re-SHINGLED the corpus parquet 6 times (4× new side,
    // 2× existing side); with it, each side shingles exactly once.
    val nw = shingled(newDf, idCol, textCol).filter(size(col("sh")) > 0)
      .eagerPin()
    val ex = shingled(existingDf, idCol, textCol).filter(size(col("sh")) > 0)
      .eagerPin()
    def bands(d: DataFrame) =
      d.select(col("_gid"), explode(SigX.minhashBandKeys(col("sh"))).as("bk"))
    val bandsNew = bands(nw)
    val bandsAll = bandsNew.withColumn("_isNew", lit(true))
      .unionByName(bands(ex).withColumn("_isNew", lit(false)))
    val cand = bandsNew.as("a")
      .join(bandsAll.as("b"), col("a.bk") === col("b.bk") && col("a._gid") =!= col("b._gid"))
      // a new×new pair collides in both orientations — keep new_id < other_id;
      // new×existing pairs exist once and keep their natural orientation
      .filter(!col("b._isNew") || col("a._gid") < col("b._gid"))
      .select(col("a._gid").as("new_id"), col("b._gid").as("other_id"))
      .distinct()
    // new_id only ever names new-batch docs — resolve it against nw alone
    // (joining the union would re-scan the whole existing corpus's
    // shingles for zero extra matches); other_id can be either side.
    verifyJaccard(cand, "new_id", nw, "other_id", nw.unionByName(ex), thr)
      .select("new_id", "other_id", "jaccard")
  }

  /** Benchmark decontamination: training documents sharing at least
    * `minOverlap` distinct shingles with any test/benchmark document —
    * the step that strips eval-set passages out of a training corpus.
    * Shape: shingle equi-join between the corpora (never a cross
    * product). The document-frequency cap applies to the TRAIN side (a
    * shingle in many training docs is boilerplate, not contamination
    * signal — and it is the quadratic fan-out risk); the test corpus is
    * a benchmark, tiny by construction, so at scale Spark broadcasts its
    * shingle set and the whole check is one map-side join over the
    * training shingles. Output: train_id, test_id, overlap (distinct
    * shared shingles, >= minOverlap).
    */
  def contaminationPairs(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, minOverlap: Int, maxDf: Int = 100): DataFrame = {
    graft.functions.BoundedCollect.register(train.sparkSession)
    val trEx = shingled(train, idCol, textCol)
      .filter(col("_gid").isNotNull) // a null id can never appear in a pair
      .select(col("_gid").as("train_id"), explode(col("sh")).as("shingle"))
    // the test shingle stream feeds BOTH broadcast builds (membership
    // set + pair probe); it is tiny by contract, so caching it costs
    // nothing and saves the second shingling pass over the test corpus
    val te = shingled(test, idCol, textCol)
      .select(col("_gid").as("test_id"), explode(col("sh")).as("shingle"))
      .persist()
    // Prune the train stream by TEST-SHINGLE MEMBERSHIP before anything
    // shuffles: a shingle absent from the test side can never form a
    // pair, and membership is by shingle VALUE, so every train
    // occurrence of a retained shingle survives — df per surviving
    // shingle is exactly its corpus-wide df. The test corpus is a
    // benchmark, tiny by contract, so its shingle set broadcasts and
    // the filter is map-side; without it the df-cap/probe exchanges
    // below carry the WHOLE train shingle stream — the difference
    // between shuffling the te-matched sliver and shuffling the corpus
    // at 100 TB. A broadcast LEFT SEMI does the membership: the hash
    // build collapses duplicate test shingles for free (an explicit
    // distinct() cost its own exchange — measured +0.65 s on q21/p16).
    val teSh = te.select("shingle").distinct()
    // Train-side df cap as ONE COUNT WINDOW over the prefiltered stream
    // (the q31 one-exchange discipline): the membership join is narrow,
    // so the window's exchange is the only shuffle the train shingles
    // ever make, and the shingling subtree evaluates ONCE. Skew profile
    // matches the old partial-agg + semi-join pair — the semi-join
    // probe already co-located every occurrence of a hot shingle in one
    // task; the window counts them where they land instead of joining a
    // flag back in (and the semi-join shape also re-evaluated the whole
    // shingled(train) explode for the probe). The single-pass
    // bounded-collect alternative was 4-6× slower here — an object-hash
    // aggregate over every surviving shingle group (the r13 p16 breach).
    val wDf = Window.partitionBy("shingle")
    val tr = trEx.join(broadcast(teSh), "shingle")
      .withColumn("_df", count(lit(1)).over(wDf))
      .filter(col("_df") <= maxDf).drop("_df")
    tr.join(broadcast(te), "shingle")
      .groupBy("train_id", "test_id").agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** The scrub itself: `train` minus every document [[contaminationPairs]]
    * flags — an anti-join on the flagged train ids, so the output is the
    * decontaminated corpus ready for training.
    */
  def decontaminate(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, minOverlap: Int, maxDf: Int = 100): DataFrame = {
    val flagged = contaminationPairs(train, test, idCol, textCol, minOverlap, maxDf)
      .select(col("train_id")).distinct()
    train.join(flagged, train(idCol) === flagged("train_id"), "left_anti")
  }

  /** Duplicated-span scrub — the ExactSubstr shape (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499) re-expressed relationally: instead of a suffix
    * array over the concatenated corpus, every length-`n` token window
    * gets a 16-byte span key ([[graft.functions.Signatures.spanKeys]]:
    * two independent polynomial folds of the token hashes), windows whose
    * key occurs at least `minCount` times ANYWHERE in the corpus
    * (including self-repeats within one document — the paper's semantics)
    * mark their `n` token positions as duplicated, and the scrub drops
    * exactly the covered positions, keeping the rest of the document in
    * order.
    *
    * Scale shape: span keys are narrow map-side work; the occurrence
    * count is a partial-aggregation `groupBy` on the 16-byte key (hot
    * boilerplate spans combine map-side — the reason this is not a
    * window, which has no partial agg); flagged windows come back via a
    * left-semi equi-join on the same key (AQE's skew-join splits any
    * mega-hot span); per-document coverage is a `collect_set` of window
    * starts bounded by the document's own length; the scrub itself is a
    * narrow array expression. Nothing driver-side, no gram strings on
    * the wire.
    *
    * Output: idCol, n_tokens, dup_tokens (positions covered by some
    * duplicated window), dup_frac (4 dp), scrubbed (uncovered tokens
    * joined by ' '; '' when fully covered).
    */
  def spanScrub(df: DataFrame, idCol: String, textCol: String, n: Int = 8,
      minCount: Int = 2, checkpoint: Boolean = true): DataFrame = {
    require(n >= 2, "span length must be >= 2")
    require(minCount >= 2, "minCount must be >= 2 (1 would scrub everything)")
    GraftExpressions.register(df.sparkSession)
    SigX.register(df.sparkSession) // native span keys
    val base = df.select(col(idCol).as("_gid"), tokens(col(textCol)).as("_toks"))
    // withTh feeds the gram explode AND the final rebuild join. A LAZY
    // persist shares it between the two consumers without spending a
    // driver job on an eager materialization barrier (VERDICT r12: the
    // barrier count, not the operator cost, is what inflates under
    // co-tenant contention; this operator went from 3 eager jobs to 0).
    val withTh0 = base.select(col("_gid"), col("_toks"), Sig.tokenHashes(col("_toks")).as("_th"))
    val withTh = if (checkpoint) withTh0.persist() else withTh0
    val grams =
      withTh.select(col("_gid"), posexplode(SigX.spanKeys(col("_th"), n)).as(Seq("s", "g")))
        .select(col("_gid"), col("s"), col("g.h1").as("h1"), col("g.h2").as("h2"))
    // Duplicated-span detection as ONE exchange: a count window over the
    // span key replaces the old partial-agg groupBy + left-semi join pair
    // (which shuffled the full gram stream TWICE on the same key). Skew
    // profile is unchanged — the semi-join probe already co-located every
    // occurrence of a hot span in one task; the window just counts them
    // where they land instead of joining a flag back in.
    val wG = Window.partitionBy("h1", "h2")
    val dupStarts = grams.withColumn("_c", count(lit(1)).over(wG))
      .filter(col("_c") >= minCount)
      .groupBy("_gid").agg(collect_set(col("s")).as("_starts"))
    val covered = array_distinct(flatten(transform(col("_starts"), s =>
      sequence(s, s + n - 1))))
    withTh.join(dupStarts, Seq("_gid"), "left")
      .select(col("_gid"), col("_toks"),
        coalesce(col("_starts"), array().cast("array<int>")).as("_starts"))
      .select(col("_gid").as(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        covered.as("_cov"), col("_toks"))
      .select(col(idCol), col("n_tokens"),
        size(col("_cov")).cast("long").as("dup_tokens"),
        Rounding.mirrorRound(size(col("_cov")) * 1.0 / col("n_tokens"), 4).as("dup_frac"),
        concat_ws(" ",
          filter(col("_toks"), (t, i) => !array_contains(col("_cov"), i))).as("scrubbed"))
  }

  /** VARIABLE-LENGTH duplicated-span detection — the suffix-array
    * half of ExactSubstr (Lee et al. 2022, arXiv:2107.06499) that
    * [[spanScrub]]'s fixed-n windows cannot express, re-expressed as
    * PREFIX DOUBLING (Manber–Myers suffix-array construction): a span of
    * length 2L at position s is duplicated iff the COMPOSITE key
    * (key_L(s), key_L(s+L)) occurs >= minCount times corpus-wide, so each
    * round doubles the witnessed span length with one key-composition
    * join — `doublings` rounds reach n·2^doublings from the fixed-n base
    * without ever materializing a suffix array.
    *
    * Lossless pruning makes the ladder cheap: a duplicated 2L-span's
    * halves are themselves duplicated L-spans, so each round extends ONLY
    * positions that survived the previous round's dup filter — work per
    * round shrinks with the (typically exponential) decay of long
    * duplicates. Per round: one count window over the span key (the q31
    * discipline — hot keys co-locate exactly as the old semi-join probe
    * co-located them) + one self-join on (doc, s+L), both declarative,
    * no checkpoints. Fixed rounds, exact integer hashes (two independent
    * polynomial bases, the q31 collision discipline) — an external SQL
    * oracle replays every round as generated CTEs.
    *
    * Output: one row per (document, level) that still has a duplicated
    * span — idCol, span_len (n·2^r), n_spans (duplicated-span STARTS at
    * that level, overlaps counted individually), first_start. The max
    * span_len per doc is the power-of-two lower-bound witness for its
    * longest duplicated substring; docs/levels with no duplicate are
    * absent.
    */
  /** The prefix-doubling ladder both variable-length operators share:
    * per level the duplicated-span SURVIVORS (_gid, s, h1, h2), eagerly
    * checkpointed — each level feeds three consumers (its summary /
    * coverage rows and both sides of the next extension self-join), and
    * a final union would otherwise replay level 0 2^doublings times.
    * The checkpointed tables shrink with the long-duplicate tail, so
    * the barrier cost decays with the rounds (measured 37.6 s → one
    * evaluation per level at sf0.1). EAGER on purpose (r13 A/B): a lazy
    * persist here measured d17 2.4 → 3.4 s and RAISED the job count —
    * the level self-join scans the same uncached plan from both sides
    * inside one stage, so each side computes the subtree before the
    * cache exists (the lazy-cache thundering herd); the eager barrier
    * is what guarantees one evaluation per level.
    * `withTh` must carry (_gid, _th).
    */
  private def spanLadder(withTh: DataFrame, n: Int, doublings: Int,
      minCount: Int): Seq[(Int, DataFrame)] = {
    val wK = Window.partitionBy("h1", "h2")
    def dupOnly(spans: DataFrame): DataFrame =
      spans.withColumn("_c", count(lit(1)).over(wK))
        .filter(col("_c") >= minCount).drop("_c")
    val base = withTh
      .select(col("_gid"), posexplode(SigX.spanKeys(col("_th"), n)).as(Seq("s", "g")))
      .select(col("_gid"), col("s"), col("g.h1").as("h1"), col("g.h2").as("h2"))
    var cur = dupOnly(base).eagerPin()
    var len = n
    val out = scala.collection.mutable.ArrayBuffer((len, cur))
    for (_ <- 1 to doublings) {
      val nxt = cur.as("a").join(cur.as("b"),
          col("a._gid") === col("b._gid") && col("b.s") === col("a.s") + len)
        .select(col("a._gid").as("_gid"), col("a.s").as("s"),
          ((col("a.h1") * Sig.B + col("b.h1")) % Sig.P).as("h1"),
          ((col("a.h2") * Sig.B2 + col("b.h2")) % Sig.P).as("h2"))
      cur = dupOnly(nxt).eagerPin()
      len *= 2
      out += ((len, cur))
    }
    out.toSeq
  }

  def longestDupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, doublings: Int = 3, minCount: Int = 2): DataFrame = {
    require(n >= 2, "base span length must be >= 2")
    require(doublings >= 0, "doublings must be >= 0")
    require(minCount >= 2, "minCount must be >= 2")
    GraftExpressions.register(df.sparkSession)
    SigX.register(df.sparkSession) // native span keys
    // Token hashes MUST materialize as a projected column below the
    // generate (the q31 discipline): inlining tokenHashes into the
    // spanKeys lambda re-evaluates the whole hash transform per
    // element_at access — higher-order functions run interpreted, no
    // CSE — turning the projection O(len²) per document (measured 35 s
    // for a 0.24M-span corpus vs sub-second materialized).
    val withTh = df.select(col(idCol).as("_gid"),
      Sig.tokenHashes(tokens(col(textCol))).as("_th"))
    spanLadder(withTh, n, doublings, minCount).map { case (len, cur) =>
      cur.groupBy(col("_gid").as(idCol))
        .agg(count(lit(1)).as("n_spans"), min(col("s")).cast("long").as("first_start"))
        .select(col(idCol), lit(len.toLong).as("span_len"),
          col("n_spans"), col("first_start"))
    }.reduce(_.unionByName(_))
  }

  /** VARIABLE-LENGTH duplicated-span SCRUB — the removal half of
    * ExactSubstr (Lee et al. 2022) at power-of-two granularity, the
    * companion [[longestDupSpans]]'s witness promises: each document
    * drops the tokens covered by its DEEPEST-witnessed duplicated spans
    * (the ladder's last surviving level for that document — the
    * longest-duplicate lower bound), remaining tokens rejoin with single
    * spaces (the [[spanScrub]] rebuild). Documents with no duplicated
    * base span pass through unscrubbed (span_len 0).
    *
    * Scale shape: the shared checkpointed ladder + one window over the
    * survivor union (|survivors| rows, not the corpus), coverage built
    * narrowly per document from its collected starts (the q31
    * collect_set discipline — starts per doc are bounded by its own
    * token count), one join back to the token table.
    *
    * Output: idCol, n_tokens, span_len (deepest witnessed length, 0 if
    * clean), dup_tokens (covered-token count), scrubbed.
    */
  def longestDupScrub(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, doublings: Int = 3, minCount: Int = 2): DataFrame = {
    require(n >= 2, "base span length must be >= 2")
    require(doublings >= 0, "doublings must be >= 0")
    require(minCount >= 2, "minCount must be >= 2")
    GraftExpressions.register(df.sparkSession)
    SigX.register(df.sparkSession) // native span keys
    // _th materialized below the generate (see longestDupSpans); _toks
    // rides along for the rebuild — lazy persist shares the scan between
    // the ladder build and the final join (the q31 withTh discipline)
    val withTh = df.select(col(idCol).as("_gid"), tokens(col(textCol)).as("_toks"))
      .select(col("_gid"), col("_toks"), Sig.tokenHashes(col("_toks")).as("_th"))
      .persist()
    val levels = spanLadder(withTh, n, doublings, minCount)
    val u = levels.map { case (len, cur) =>
      cur.select(col("_gid"), col("s"), lit(len).as("_len"))
    }.reduce(_.unionByName(_))
    val deepest = u
      .withColumn("_mx", max(col("_len")).over(Window.partitionBy("_gid")))
      .filter(col("_len") === col("_mx"))
    val perDoc = deepest.groupBy("_gid")
      .agg(collect_set(col("s")).as("_starts"), max(col("_len")).as("_slen"))
    val covered = array_distinct(flatten(transform(col("_starts"), st =>
      sequence(st, st + col("_slen") - 1))))
    withTh.join(perDoc, Seq("_gid"), "left")
      .select(col("_gid"), col("_toks"),
        coalesce(col("_starts"), array().cast("array<int>")).as("_starts"),
        coalesce(col("_slen"), lit(0)).as("_slen"))
      .select(col("_gid").as(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        col("_slen").cast("long").as("span_len"),
        covered.as("_cov"), col("_toks"))
      .select(col(idCol), col("n_tokens"), col("span_len"),
        size(col("_cov")).cast("long").as("dup_tokens"),
        concat_ws(" ",
          filter(col("_toks"), (t, i) => !array_contains(col("_cov"), i))).as("scrubbed"))
  }

  /** Cross-document LINE dedup — the CCNet/RefinedWeb boilerplate
    * remover: a line (paragraph) occurring in at least `minDf` DISTINCT
    * documents is navigation/footer/legal boilerplate and is removed
    * from EVERY document (the paper semantics: duplicated paragraphs are
    * dropped everywhere, not kept-once — a header repeated on a million
    * pages is noise in all of them). Within-document repeats alone don't
    * reach `minDf` (the count is per distinct doc).
    *
    * Plan: the corpus is scanned TWICE and no more — once to build the
    * line-fingerprint table (16-byte md5 per line, never line text on
    * the wire; MATERIALIZED eagerly, since both the boilerplate count
    * and the position join read it — left lazy, each branch would
    * re-explode the whole corpus), once for the final rebuild join
    * (which needs the actual line arrays; carrying them through the
    * dedup shuffles would cost more than the re-scan). The
    * document-frequency count is a partial-agg groupBy (hot boilerplate
    * lines combine map-side — the q31 discipline, deliberately not a
    * window); flagged line POSITIONS return via one left-semi equi-join
    * + per-doc `collect_set` (bounded by doc line count); the rebuild
    * is a narrow array filter. Blank lines are never counted as
    * boilerplate.
    *
    * `sep` generalizes the unit: "\n" (default) dedups LINES; " " turns
    * the same machinery into corpus-adaptive STOPWORD pruning (drop
    * every token occurring in ≥ minDf distinct docs — the IR
    * vocabulary-pruning step). `minDfFrac` expresses the threshold as a
    * fraction of the corpus (ceil(frac·N), N = one count-star scalar) so
    * the policy is scale-free; it overrides `minDf`.
    *
    * Output: idCol, n_lines, dup_lines, dup_frac (4 dp), cleaned (kept
    * lines joined by `sep`).
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDf: Int = 2, checkpoint: Boolean = true,
      sep: String = "\n", minDfFrac: Option[Double] = None): DataFrame = {
    minDfFrac.foreach(f => require(f > 0 && f <= 1, "minDfFrac must be in (0, 1]"))
    // Fractional thresholds CLAMP to 2 rather than require: on a tiny or
    // empty corpus (an incremental pipeline's quiet day) ceil(frac·N)
    // reaches 0/1, where the only sane semantics is "nothing can be
    // boilerplate" — crashing there turns a no-op batch into a failed
    // job. An explicit integer minDf below 2 is still a caller bug.
    val threshold: Long =
      minDfFrac.map(f => math.max(2L, math.ceil(f * df.count()).toLong))
        .getOrElse(minDf.toLong)
    require(threshold >= 2, "effective minDf must be >= 2 (1 would drop every line)")
    val base = df.select(col(idCol).as("_gid"),
      split(col(textCol), java.util.regex.Pattern.quote(sep), -1).as("_lines"))
    val lines0 = base
      .select(col("_gid"), posexplode(col("_lines")).as(Seq("p", "l")))
      .filter(length(trim(col("l"))) > 0)
      .select(col("_gid"), col("p"), md5(col("l").cast("binary")).as("f"))
    val lines = if (checkpoint) lines0.eagerPin() else lines0
    val boiler = lines.select(col("_gid"), col("f")).distinct()
      .groupBy("f").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= threshold)
      .select("f")
    val dupPos = lines.join(boiler, Seq("f"), "left_semi")
      .groupBy("_gid").agg(collect_set(col("p")).as("_dup"))
    base.join(dupPos, Seq("_gid"), "left")
      .select(col("_gid"), col("_lines"),
        coalesce(col("_dup"), array().cast("array<int>")).as("_dup"))
      .select(col("_gid").as(idCol),
        size(col("_lines")).cast("long").as("n_lines"),
        size(col("_dup")).cast("long").as("dup_lines"),
        Rounding.mirrorRound(size(col("_dup")) * 1.0 / size(col("_lines")), 4).as("dup_frac"),
        concat_ws(sep,
          filter(col("_lines"), (_, i) => !array_contains(col("_dup"), i))).as("cleaned"))
  }

  /** Duplicate clusters from a near-dup pair set: connected components via
    * iterative min-label propagation — the standard way to turn pairwise
    * LSH hits into dedup groups at scale (a Ray/driver union-find would
    * serialize the whole edge set; this is all joins/aggregations). The
    * label moves one hop per round, so rounds needed = the largest
    * component's diameter — near-dup clusters are shallow in practice.
    * Throws if `maxRounds` is reached before the fixpoint (silent
    * truncation would emit multiple canonicals for one true component).
    * Ids may be any orderable type (numeric, string, ...).
    * Output: id, cluster (min id in the component), keep (id == cluster).
    */
  /** One min-label propagation round over a materialized edge set: one
    * shuffle-join + one aggregation. Neighbor labels arrive as messages
    * (src's comp addressed to dst), each node's own label rides along as
    * a self-message, and min() over both is the update. The fixpoint
    * witness rides the same aggregation — new < old, where old is the
    * self-message — so convergence costs a narrow scan of the
    * just-checkpointed blocks, not another join (the previous shape
    * joined neighbor-mins back against labels every round: two joins).
    * Package-visible so the paired-round plan (`propagate(propagate(l))`
    * references the inner round TWICE — join side + self-message arm)
    * can be built lazily and its exchange reuse verified by spec/probe
    * (VERDICT r13 item 4).
    */
  private[graft] def clusterPropagate(edges: DataFrame, ls: DataFrame): DataFrame = {
    val msgs = edges.join(ls, col("src") === col("id"))
      .select(col("dst").as("_nid"), col("comp"), lit(false).as("_self"))
      .unionByName(ls.select(col("id").as("_nid"), col("comp"), lit(true).as("_self")))
    msgs.groupBy(col("_nid"))
      .agg(min(col("comp")).as("comp"), min(when(col("_self"), col("comp"))).as("_old"))
      .select(col("_nid").as("id"), col("comp"), (col("comp") < col("_old")).as("_changed"))
  }

  def clusters(all: DataFrame, idCol: String, pairs: DataFrame,
      maxRounds: Int = 20, checkIds: Boolean = true): DataFrame = {
    // Materialize the edge set ONCE (the pair generation upstream may be a
    // whole LSH pipeline) and truncate lineage per round with an eager
    // localCheckpoint — otherwise every round's plan embeds all previous
    // rounds and optimizer time dominates (measured 80s → ~8s at 50k
    // docs). Superseded rounds' blocks are released by the ContextCleaner
    // once their Datasets become unreachable (Dataset.unpersist does not
    // apply to localCheckpoint storage).
    // Drop pair endpoints that are not in `all` (e.g. a pair set computed
    // before a filter pass): a foreign id must never become a cluster
    // label — it would mark every real member keep=false and silently
    // lose the whole cluster downstream. Two semi-joins over the pair
    // set, paid once before the loop; the corpus side ships only its id
    // column. Call sites whose pairs derive from `all` itself (nearDedup,
    // the d06 binding) pass checkIds = false — there the guard is
    // provably a no-op and the corpus-id shuffles would be pure cost.
    val inAll =
      if (!checkIds) pairs.select(col("id_a"), col("id_b"))
      else {
        val ids = all.select(col(idCol).as("_vid"))
        pairs.select(col("id_a"), col("id_b"))
          .join(ids, col("id_a") === col("_vid"), "left_semi")
          .join(ids, col("id_b") === col("_vid"), "left_semi")
      }
    val edges = inAll.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(inAll.select(col("id_b").as("src"), col("id_a").as("dst")))
      .eagerPin()
    // Propagate ONLY over nodes incident to an edge: a node with no pair can
    // never change label, and dup pairs are a sliver of the corpus — looping
    // over `all` would shuffle + checkpoint every corpus row every round
    // (billions of rows/round at 100 TB for a few million duplicate nodes).
    // The untouched corpus is stitched back with ONE final left join.
    //
    // Round 0 needs no join: initial labels are the identity, so the first
    // update is comp0(v) = least(v, min incoming src) — one aggregation over
    // the edge set. It also needs no fixpoint probe: any edge (a,b) with
    // a < b lowers b's label, so round 0 changes something iff edges exist
    // (and with no edges the loop below converges immediately on empty
    // inputs). `edges` holds both orientations, so dst covers incident nodes.
    var labels = edges.groupBy(col("dst"))
      .agg(min(col("src")).as("_m"))
      .select(col("dst").as("id"), least(col("dst"), col("_m")).as("comp"))
      .eagerPin()
    def propagate(ls: DataFrame): DataFrame = clusterPropagate(edges, ls)
    // Rounds run in PAIRS per materialization + witness where the round
    // budget allows (r13): min-label propagation is monotone with a
    // unique fixpoint, so a no-change round is followed only by no-change
    // rounds — checking the SECOND round of a pair is exact (pair ends
    // unchanged ⟺ fixpoint reached at or before it), labels are
    // identical either way, and the checkpoint + isEmpty barrier pair is
    // paid once per two hops instead of once per hop (the r12 lesson:
    // driver jobs are what co-tenant contention multiplies). Total
    // propagation rounds stay capped at maxRounds exactly, so the
    // did-not-converge contract is unchanged.
    var converged = false
    var rounds = 1
    while (!converged && rounds < maxRounds) {
      val step = if (rounds + 2 <= maxRounds) 2 else 1
      val next = (if (step == 2) propagate(propagate(labels).select("id", "comp"))
                  else propagate(labels))
        .eagerPin()
      converged = next.filter(col("_changed")).isEmpty
      labels = next.select("id", "comp")
      rounds += step
    }
    if (!converged)
      throw new IllegalStateException(
        s"clusters() did not converge in $maxRounds rounds; a component has " +
          s"diameter > $maxRounds — raise maxRounds")
    // Stitch the full corpus back: nodes with no incident edge are their own
    // singleton cluster. One join, after the loop — never inside it.
    all.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("comp", "_comp"), Seq("id"), "left")
      .select(col("id"), coalesce(col("_comp"), col("id")).as("cluster"))
      .withColumn("keep", col("id") === col("cluster"))
  }

  /** End-to-end near-deduplication — the composed corpus output a
    * pipeline actually ships: MinHash-LSH pairs ([[minhashLshPairs]]) →
    * connected components ([[clusters]]) → keep one canonical (min-id)
    * document per duplicate cluster. Returns the SURVIVING input rows
    * with all their columns (the deduplicated corpus), via one final
    * left-semi join on the keep set. Each stage's scale shape is its
    * own: banded equi-join candidates, join-based label propagation,
    * then a semi-join keyed by id.
    */
  def nearDedup(df: DataFrame, idCol: String, textCol: String,
      thr: Double): DataFrame = {
    val keep = clusters(df, idCol, minhashLshPairs(df, idCol, textCol, thr),
        checkIds = false) // pairs derive from df: endpoints ⊆ corpus
      .filter(col("keep")).select(col("id").as("_keep_id"))
    df.join(keep, df(idCol) === col("_keep_id"), "left_semi")
  }

  /** [[nearDedup]] keeping the BEST row per duplicate cluster instead of
    * the min-id one — the production policy ("of these near-identical
    * crawls, keep the highest-quality copy"): `rankCol` scores rows
    * (higher wins; ties break on smallest id, so selection stays total
    * and deterministic, for ids of ANY orderable type). Two partial-agg
    * passes keyed by the cluster id (best rank, then min id among rows
    * achieving it) — never a per-cluster sort.
    */
  def nearDedupBest(df: DataFrame, idCol: String, textCol: String,
      thr: Double, rankCol: String): DataFrame = {
    val cl = clusters(df, idCol, minhashLshPairs(df, idCol, textCol, thr),
        checkIds = false) // pairs derive from df: endpoints ⊆ corpus
      .select(col("id"), col("cluster"))
    val ranked = df.select(col(idCol).as("id"), col(rankCol).as("_rank")).join(cl, "id")
    val best = ranked.groupBy("cluster").agg(max(col("_rank")).as("_bestRank"))
    // null-safe rank match: an all-null-rank cluster still keeps a row
    // (min id) instead of silently vanishing
    val winner = ranked.as("x").join(best.as("y"),
        col("x.cluster") === col("y.cluster") && col("x._rank") <=> col("y._bestRank"))
      .groupBy(col("x.cluster")).agg(min(col("x.id")).as("_keep_id"))
    df.join(winner.select("_keep_id"), df(idCol) === col("_keep_id"), "left_semi")
  }

  /** Bloom-filter membership gate — the shuffle-free "have we seen this
    * before?" check against a REFERENCE corpus (blocklists, benchmark
    * fingerprints, yesterday's curated set). The reference side collapses
    * to a bloom filter over its content fingerprints (built distributed
    * via Spark's `stat.bloomFilter` partial aggregation, merged on the
    * driver, then BROADCAST); the incoming batch is then annotated by a
    * NARROW `might_contain` scan — no join, no shuffle of either side,
    * which is the point: an anti-join would shuffle the full batch at
    * every ingest tick.
    *
    * Bloom semantics, stated plainly: NO false negatives (every true
    * member is flagged), false positives at ~`fpp` (a flagged row may be
    * novel — route flagged rows to the exact d01 backstop when the
    * answer must be exact). Size honestly: the filter costs ~1.2 bytes
    * per expected item at fpp=1% — fine up to reference sets of ~10⁹
    * fingerprints (≈1.2 GB broadcast); past that, shard the reference
    * and gate against per-shard blooms, or use the stored band-key index
    * ([[incrementalMinhashPairs]]) instead.
    *
    * Output: every `newDf` row + `probably_seen` (true ⇒ likely in the
    * reference; false ⇒ DEFINITELY novel).
    */
  def bloomSeen(newDf: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    def fp(c: org.apache.spark.sql.Column) = graft.functions.TextFunctions.contentFingerprint(c)
    // an empty reference has no members: everything is novel (and
    // stat.bloomFilter cannot aggregate zero rows — null buffer). With
    // expectedItems > 0 (the caller sized us to AVOID touching the
    // reference) emptiness is detected from the aggregation's own
    // failure rather than an extra per-call isEmpty job on the hot path.
    val items = if (expectedItems > 0) expectedItems else reference.count()
    if (items == 0L) return newDf.withColumn("probably_seen", lit(false))
    val bloom =
      try reference.select(fp(col(textCol)).as("_fp"))
        .stat.bloomFilter("_fp", items, fpp)
      catch {
        // stat.bloomFilter cannot aggregate zero rows (null buffer →
        // NPE/NoSuchElement). But those exception TYPES are not proof of
        // emptiness — a genuine driver-side failure must not silently
        // disable the dedup gate. Confirm emptiness explicitly (one
        // limit(1) job, paid only on this cold path) and rethrow if the
        // reference turns out non-empty.
        case e @ (_: NullPointerException | _: NoSuchElementException) =>
          if (reference.select(col(textCol)).limit(1).isEmpty)
            return newDf.withColumn("probably_seen", lit(false))
          else throw e
      }
    val bc = newDf.sparkSession.sparkContext.broadcast(bloom)
    val seen = udf((s: String) => s != null && bc.value.mightContainString(s))
    // null text hashes to null -> definitely not in the reference
    newDf.withColumn("probably_seen",
      coalesce(seen(fp(col(textCol))), lit(false)))
  }

  /** Bloom-gated frontier novelty — the d11 contract packaged as the
    * crawl-frontier step: `candidates` minus the `crawled` ledger,
    * EXACTLY equal to `candidates.join(crawled, urlCol, "left_anti")`
    * but with the ledger-sized shuffle amputated. At 100 TB the crawled
    * ledger is corpus-sized (every URL ever fetched) while a frontier
    * batch is small; a plain anti-join shuffles BOTH sides on the URL
    * key at every tick. Here the ledger collapses once into a broadcast
    * bloom ([[bloomSeen]]); rows the bloom clears are DEFINITELY novel
    * (no false negatives) and never shuffle, and only flagged rows —
    * true dups + ~fpp false positives — pay the exact anti-join
    * backstop that removes the false positives. definite ∪ confirmed ≡
    * the anti-join (spec-asserted), so correctness is free; the win is
    * that the anti-join's candidate side shrinks to (dup rate + fpp) of
    * the batch, and the ledger side of THAT join prunes to the
    * suspects' partitions.
    *
    * Sizing: the bloom costs ~1.44·log2(1/fpp)/8 bytes per ledger URL —
    * at fpp 0.5 that is 0.18 B/URL (10^10 URLs ≈ 1.8 GB broadcast,
    * still halving every batch's shuffled volume); at fpp 0.01 it is
    * 1.2 B/URL (right up to ~10^9 URLs). Choose fpp by broadcast budget
    * — exactness never changes, only how much of the batch takes the
    * backstop. Output: the novel candidate rows, all columns intact.
    */
  def frontierNovel(candidates: DataFrame, crawled: DataFrame,
      urlCol: String = "url", fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    val ledger = crawled.select(col(urlCol)).distinct()
    val gated = bloomSeen(candidates, ledger, urlCol, urlCol, fpp, expectedItems)
    val definite = gated.filter(!col("probably_seen")).drop("probably_seen")
    val confirmed = gated.filter(col("probably_seen")).drop("probably_seen")
      .join(ledger, Seq(urlCol), "left_anti")
    definite.unionByName(confirmed)
  }

  /** Banded hyperplane-LSH embedding near-dup pairs — the scale path.
    * Candidates are pairs colliding in >= 1 of [[EmbeddingLsh.Bands]] band
    * keys (an equi-join, exactly d03's shape for minhash); only candidates
    * get the exact cosine, and only those >= thr survive. Contract matches
    * d03/d04: band-colliding pairs, so recall follows the LSH curve
    * 1-(1-p^Bits)^Bands — ~1 for true near-dups (cos >= 0.9), intentionally
    * partial at loose thresholds. At 100 TB the band key is a shuffle key;
    * bucket fan-out is bounded by sizing Bits to the corpus (2^Bits bucket
    * ids per band) AND by `maxBandDf`, the hot-bucket document-frequency
    * cap (same skew guard as [[ngramJaccardPairs]]/[[simhashPairs]]): a
    * degenerate corpus of near-identical vectors lands in one bucket and
    * would go quadratic — keys shared by more than `maxBandDf` vectors are
    * dropped, bounding any bucket's fan-out at maxBandDf². Output: id_a,
    * id_b, cos (6 dp, >= thr).
    *
    * DENSITY NOTE (×50 probe, SURVEY §4): when a large fraction of the
    * corpus is pairwise-similar at `thr`, the TRUE output is itself
    * quadratic-ish and the op becomes output-bound — enumeration is
    * then the wrong question; raise `thr`, tighten `maxBandDf`, or go
    * straight to [[clusters]] over a sparser pair set.
    */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      thr: Double, maxBandDf: Int = 1000): DataFrame = {
    GraftExpressions.register(df.sparkSession)
    graft.functions.BoundedCollect.register(df.sparkSession)
    require(maxBandDf >= 1 && maxBandDf < Int.MaxValue,
      s"maxBandDf out of range: $maxBandDf")
    val e = df.select(col(idCol).as("_gid"), col(vecCol).as("_v"))
      .filter(col("_gid").isNotNull) // see simhashPairs: uniform cap population
    val ex = e.select(col("_gid"), explode(EmbeddingLsh.bandKeys(col("_v"))).as("bk"))
    // band-df cap via the BOUNDED COLLECT (one exchange, r12): each map
    // task retains <= maxBandDf+1 members per band key (a corpus of
    // near-identical vectors collapsing into one bucket collapses
    // map-side, never buffering its group), groups at the cap are
    // refused exactly, and the hyperplane bandKeys subtree is computed
    // ONCE — the count+semi-join shape paid a second full pass, a count
    // window would buffer the hot group whole in one task, and the
    // bucket-member pairs enumerate in place, so no self-join exchange
    // either.
    val buckets = ex.groupBy("bk")
      .agg(graft.functions.BoundedCollect.boundedCollect(
        col("_gid"), lit(maxBandDf + 1)).as("ids"))
      .select(array_sort(col("ids")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBandDf)
    // native PairExplode generator (see simhashPairs): pairs emit lazily,
    // per-row state O(cap), never the O(cap²) pair array in one value;
    // duplicate-id inputs filter their self-pairs explicitly (the old
    // self-join's a < b contract)
    graft.functions.PairExplode.register(df.sparkSession)
    val cand = buckets
      .select(graft.functions.PairExplode.pairExplode(col("ids")))
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    cand
      .join(e.as("sa"), col("id_a") === col("sa._gid"))
      .join(e.as("sb"), col("id_b") === col("sb._gid"))
      .select(col("id_a"), col("id_b"),
        round(GraftExpressions.cosineSim(col("sa._v"), col("sb._v")), 6).as("cos"))
      .filter(col("cos") >= thr)
  }

  /** Semantic deduplication — the SemDeDup recipe (Abbas et al., 2023,
    * arXiv:2303.09540): k-means the embedding space into cells, then look
    * for near-duplicates ONLY within each cell, pruning every document
    * that has a lower-id near-dup in its cell. Clustering makes the
    * quadratic step local: total pair work is Σ|cell|² ≈ n²/k, so `k` is
    * the scale knob — size it so n/k stays a constant target cell size
    * (same rule as [[graft.operators.Similarity.sizedPlanes]]), and the
    * within-cell join cost per cell stays flat as the corpus grows. For
    * cells that are still degenerate (a hot semantic cluster), route the
    * within-cell step through [[embeddingPairsLsh]] instead of raising k.
    *
    * Clustering is [[graft.operators.Similarity.kmeans]] (deterministic
    * seeds, `iters` Lloyd rounds); the within-cell check is an equi-join
    * on the cell id — never a cross product. Cosine ≥ `thr` marks a
    * near-dup (the paper prunes at 1-ε; `thr` = 1-ε).
    *
    * Output: one row per input — (idCol, cell, keep); keep = false iff a
    * lower-id near-dup shares the cell ("keep one representative per
    * duplicate set" with the library's canonical min-id convention).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, thr: Double, salt: String = ""): DataFrame = {
    GraftExpressions.register(df.sparkSession)
    val asg = Similarity.kmeansAssign(df, idCol, vecCol, k, iters, salt)
      .eagerPin() // the assignment feeds both join sides + output
    val dups = asg.as("x")
      .join(asg.as("y"), col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .filter(round(GraftExpressions.cosineSim(col("x._v"), col("y._v")), 6) >= thr)
      .select(col("y.vec_id").as("vec_id")).distinct()
      .withColumn("_dup", lit(true))
    asg.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id").as(idCol), col("cell"),
        not(coalesce(col("_dup"), lit(false))).as("keep"))
  }

  /** Exact embedding-cosine near-dup pairs: the all-pairs oracle baseline,
    * deliberately O(n²) — [[embeddingPairsLsh]] is the scale path. Guarded:
    * refuses inputs past `maxRows` so the cartesian can't be reached by
    * accident on a large table (raise the bound explicitly to override).
    * Output: id_a, id_b, cos (6 dp, >= thr).
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      thr: Double, maxRows: Long = 200000L): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"embeddingPairs is an exact all-pairs scan ($n rows -> ~${n * n / 2} pairs); " +
        s"beyond maxRows=$maxRows use embeddingPairsLsh, or raise maxRows explicitly")
    GraftExpressions.register(df.sparkSession)
    val e = df.select(col(idCol).as("_gid"), col(vecCol).as("_v"))
    // The broadcast-nested-loop pair scan parallelizes over the STREAMED
    // side's partitions; a small/narrow input (one parquet file) would run
    // the whole O(n²) scan in a single task. Widen it to the cluster.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val streamed = if (e.rdd.getNumPartitions < par) e.repartition(par) else e
    streamed.as("a").join(e.as("b"), col("a._gid") < col("b._gid"))
      .select(col("a._gid").as("id_a"), col("b._gid").as("id_b"),
        round(GraftExpressions.cosineSim(col("a._v"), col("b._v")), 6).as("cos"))
      .filter(col("cos") >= thr)
  }

  /** Fuzzy name matching (entity resolution over a string column): ALL
    * unordered pairs of distinct values within Levenshtein distance
    * `maxDist`, each with its exact distance and row count — the
    * dimension-cleanup / record-linkage primitive (misspelled brands,
    * merchant names, file paths). Semantically a quadratic self-join;
    * the plan is Ed-Join-style LOSSLESS candidate pruning, so it scales
    * to vocabulary-sized name sets (millions) where O(n²) cannot:
    *
    *   1. Work on DISTINCT names (one partial-agg — the corpus never
    *      enters the pair machinery), materialized once.
    *   2. Names with > q·maxDist distinct positional q-grams take the
    *      GRAM-PREFIX path: k edits touch ≤ q·k gram positions, so two
    *      names within distance k share ≥ max(|G_a|,|G_b|) − q·k distinct
    *      grams, and by prefix filtering their (q·k + 1) globally RAREST
    *      grams (one total order: global gram frequency, gram) must
    *      intersect — candidates come from an equi-join of prefix grams,
    *      whose keys are by construction the rare end of the gram
    *      frequency table.
    *   3. Names with ≤ q·maxDist distinct grams (short or repetitive —
    *      "aaaaaaaa" has ONE distinct gram, the count filter is vacuous
    *      for it) fall back to LENGTH-BAND blocking: |len difference| ≤ k
    *      is necessary for distance ≤ k, and the low-gram universe is a
    *      bounded fringe (len band keys explode ×(2k+1)).
    *      The paths are disjoint (pair with any low-gram member → band
    *      path; both high-gram → gram path) and each is exact, so their
    *      union is the exact candidate superset.
    *   4. Candidates normalize to canonical orientation ((len, name)
    *      ascending), dedupe, and verify with the THRESHOLDED
    *      levenshtein (banded O(k·n) DP, not full O(n²) DP).
    *
    * Determinism: counts, lengths and distances are exact integers; no
    * floats anywhere. Hot-gram note: prefix grams are each name's rarest,
    * so candidate fan-out per gram key is naturally the low-df tail; a
    * skewed residue would salt the gram join, not cap it (capping would
    * silently lose pairs — this operator is exact by contract).
    * Output: name_a, name_b, dist, cnt_a, cnt_b.
    */
  def fuzzyNamePairs(df: DataFrame, nameCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 1, "q-gram size must be >= 1")
    val qk = q * maxDist
    val grams = when(length(col("name")) >= q,
      array_distinct(transform(
        sequence(lit(1), length(col("name")) - lit(q - 1)),
        i => col("name").substr(i, lit(q)))))
      .otherwise(array().cast("array<string>"))
    val names = df.select(col(nameCol).as("name"))
      .filter(col("name").isNotNull && length(col("name")) > 0)
      .groupBy("name").agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("len", length(col("name")))
      .withColumn("grams", grams)
      .withColumn("ng", size(col("grams")))
      .eagerPin()

    // Low-gram fallback: any pair touching this fringe, via length bands.
    val low = names.filter(col("ng") <= qk)
    val bandBuild = names.select(col("name").as("name_y"), col("cnt").as("cnt_y"),
        col("len").as("len_y"),
        explode(sequence(col("len") - maxDist, col("len") + maxDist)).as("_key"))
      .filter(col("_key") >= 1)
    val bandCand = low.select(col("name").as("name_x"), col("cnt").as("cnt_x"),
        col("len").as("len_x"))
      .join(bandBuild, col("len_x") === col("_key") && col("name_x") =!= col("name_y"))

    // Gram-prefix path: both sides have enough distinct grams for the
    // count filter to bite.
    val high = names.filter(col("ng") > qk)
    val gramRows = high.select(col("name"), col("cnt"), col("len"),
      explode(col("grams")).as("gram"))
    val gramDf = gramRows.groupBy("gram").agg(count(lit(1)).as("_gdf"))
    val w = Window.partitionBy("name").orderBy(col("_gdf"), col("gram"))
    val prefix = gramRows.join(gramDf, "gram")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= qk + 1)
      .select(col("name"), col("cnt"), col("len"), col("gram"))
    // The candidate self-join EXPLODES (each prefix row matches every
    // same-gram row), so when the planner broadcasts the tiny prefix
    // table, output parallelism = the STREAMED side's partition count —
    // which AQE coalesces to ONE for a 50k-row post-shuffle table,
    // putting the entire candidate stream (40M rows on the ext5
    // golden-record probe over a gram-degenerate serial-name corpus:
    // 174 s on one spinning core vs 22 s widened) in a single task. The
    // d05 fix: widen the streamed side with an explicit repartition,
    // which AQE never coalesces. If prefix ever outgrows the broadcast
    // threshold the join becomes SMJ, where a hot gram's c² block is
    // AQE skew-split territory (no salt needed — and exactness would
    // forbid the d02 drop-the-hot-key cap anyway: a dropped gram can
    // lose a pair whose only shared prefix gram it was).
    val par = df.sparkSession.sparkContext.defaultParallelism
    val aS = prefix.repartition(par * 4)
    val gramCand = aS.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") &&
          col("a.name") =!= col("b.name") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.name").as("name_x"), col("a.cnt").as("cnt_x"), col("a.len").as("len_x"),
        col("b.name").as("name_y"), col("b.cnt").as("cnt_y"), col("b.len").as("len_y"))

    val all = bandCand.select("name_x", "cnt_x", "name_y", "cnt_y", "len_x", "len_y")
      .union(gramCand.select("name_x", "cnt_x", "name_y", "cnt_y", "len_x", "len_y"))
    val firstIsA = col("len_x") < col("len_y") ||
      (col("len_x") === col("len_y") && col("name_x") < col("name_y"))
    val canon = all.select(
        when(firstIsA, col("name_x")).otherwise(col("name_y")).as("name_a"),
        when(firstIsA, col("cnt_x")).otherwise(col("cnt_y")).as("cnt_a"),
        when(firstIsA, col("name_y")).otherwise(col("name_x")).as("name_b"),
        when(firstIsA, col("cnt_y")).otherwise(col("cnt_x")).as("cnt_b"))
    // Verify BEFORE deduplicating: the thresholded (banded O(k·n))
    // levenshtein runs map-side on the join output, so candidate
    // duplicates cost a few cheap DP re-runs each, while a pre-verify
    // distinct would EXCHANGE the full candidate stream (the ext5
    // golden-record probe measured that order at 75 s vs ~9 s of
    // verification on a gram-degenerate corpus — the distinct now
    // shuffles only MATCHED pairs, always a subset).
    canon.withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "cnt_a", "cnt_b")
      .distinct()
  }

  /** Sparse TF-IDF cosine similarity join — the EXACT lexical
    * counterpart of the signature family (d02 Jaccard estimates set
    * overlap, d05 hashes dense embeddings; this computes the true
    * weighted cosine over the sparse term space, the classic IR
    * document-similarity measure): w = tf·ln(N/df) per (doc, token),
    * pair dot products via an INVERTED-INDEX equi-join on the token
    * (never docs × docs), cos = dot/(‖a‖·‖b‖).
    *
    * The document-frequency prune is the index's survival at scale, in
    * both directions: df < 2 tokens can form NO pair and silently feed
    * nothing to the join (typically the long tail of the vocabulary),
    * and df > ceil(maxDfFrac·N) stopwords are dropped from the
    * REPRESENTATION (each would contribute df² join pairs of pure noise
    * — the d02/d10 hot-key discipline, scale-free as a corpus
    * fraction). Norms are over the pruned space, so pruning is part of
    * the representation, not an approximation of it — an external
    * engine mirroring the same prune reproduces every value. The
    * weighted term table materializes once (it feeds the join twice and
    * the norm pass once). Join volume is Σ_token df² over surviving
    * tokens, bounded by maxDf·Σdf. N is one in-engine scalar broadcast
    * (never a driver literal) counting documents that contribute ≥ 1
    * token — an empty/whitespace-only document is OUTSIDE the
    * representation and does not dilute idf or the df cap (it can
    * never pair anyway). Output: doc_a < doc_b, dot, cos (unrounded —
    * round at the binding), thresholded at `minCos`.
    */
  def sparseCosinePairs(df: DataFrame, idCol: String, textCol: String,
      maxDfFrac: Double = 0.5, minCos: Double = 0.3,
      checkpoint: Boolean = true): DataFrame =
    sparseCosinePairsTokens(wordTokens(df, idCol, textCol), "_d", "_t",
      maxDfFrac, minCos, checkpoint)

  /** Token-level entry of [[sparseCosinePairs]]: `toks` is one row per
    * (document, token OCCURRENCE) under ANY tokenization — words,
    * shingle hashes (feature diversity on small-vocabulary corpora:
    * word dfs can be near-uniform while 3-gram dfs discriminate), BPE
    * pieces. N = distinct ids present in `toks`.
    */
  def sparseCosinePairsTokens(toks: DataFrame, idCol: String, tokenCol: String,
      maxDfFrac: Double = 0.5, minCos: Double = 0.3,
      checkpoint: Boolean = true): DataFrame = {
    require(maxDfFrac > 0 && maxDfFrac <= 1, "maxDfFrac must be in (0, 1]")
    require(minCos >= 0, "minCos must be >= 0 (negative is vacuous for tf-idf)")
    val w = tfidfWeights(toks.select(col(idCol).as("_d"), col(tokenCol).as("_t")),
      maxDfFrac, checkpoint)
    val dots = w.as("a").join(w.as("b"),
        col("a._t") === col("b._t") && col("a._d") < col("b._d"))
      .groupBy(col("a._d").as("doc_a"), col("b._d").as("doc_b"))
      .agg(sum(col("a._w") * col("b._w")).as("dot"))
    closeCosine(dots, w, minCos)
  }

  /** Exact TF-IDF cosine RESCORING of a given candidate pair set — the
    * 100 TB composition: a signature pass (d03 MinHash bands, d04
    * SimHash chunks, d05 embedding bands) generates bounded candidates,
    * and only those pairs pay the exact weighted-cosine evaluation —
    * [[sparseCosinePairs]]'s all-surviving-pairs join is for corpora
    * where the pair OUTPUT itself is bounded; this is the form whose
    * cost tracks |candidates|·avg-doc-length instead. Same
    * representation contract (two-sided df prune, norms over the pruned
    * space); pairs whose either side has no surviving tokens drop
    * (cosine undefined in the pruned space — inner norm joins, mirrored
    * by an oracle's inner joins). Output: doc_a, doc_b, dot, cos.
    */
  def sparseCosineRescore(df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxDfFrac: Double = 0.5, minCos: Double = 0.0,
      checkpoint: Boolean = true): DataFrame =
    sparseCosineRescoreTokens(wordTokens(df, idCol, textCol), "_d", "_t",
      pairs, aCol, bCol, maxDfFrac, minCos, checkpoint)

  /** Token-level entry of [[sparseCosineRescore]] — see
    * [[sparseCosinePairsTokens]] for the `toks` contract.
    */
  def sparseCosineRescoreTokens(toks: DataFrame, idCol: String, tokenCol: String,
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxDfFrac: Double = 0.5, minCos: Double = 0.0,
      checkpoint: Boolean = true): DataFrame = {
    require(maxDfFrac > 0 && maxDfFrac <= 1, "maxDfFrac must be in (0, 1]")
    require(minCos >= 0, "minCos must be >= 0 (negative is vacuous for tf-idf)")
    val w = tfidfWeights(toks.select(col(idCol).as("_d"), col(tokenCol).as("_t")),
      maxDfFrac, checkpoint)
    // canonicalize to the sibling operator's doc_a < doc_b contract:
    // a caller handing over both (7,9) and (9,7) — or a self-pair —
    // must not produce duplicate/trivial rows
    val p = pairs.select(least(col(aCol), col(bCol)).as("doc_a"),
        greatest(col(aCol), col(bCol)).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b")).distinct()
    val aw = p.join(w.select(col("_d").as("doc_a"), col("_t"), col("_w").as("_wa")),
      "doc_a")
    val dots = aw
      .join(w.select(col("_d").as("doc_b"), col("_t"), col("_w").as("_wb")),
        Seq("doc_b", "_t"))
      .groupBy("doc_a", "doc_b").agg(sum(col("_wa") * col("_wb")).as("dot"))
    closeCosine(dots, w, minCos)
  }

  /** Whitespace word tokens: (_d, _t) one row per occurrence. */
  private def wordTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("_d"),
        explode(split(col(textCol), " ", -1)).as("_t"))
      .filter(length(col("_t")) > 0)

  /** Shared tf-idf term-weight table: (_d, _t, _w) with the two-sided df
    * prune; materialized once — every caller reads it at least twice.
    * N = distinct document ids present in `toks`.
    */
  private def tfidfWeights(toks: DataFrame, maxDfFrac: Double,
      checkpoint: Boolean): DataFrame = {
    val tf = toks.groupBy("_d", "_t").agg(count(lit(1)).cast("long").as("_tf"))
    val n = toks.select(countDistinct(col("_d")).as("_n"))
    val dfreq = tf.groupBy("_t").agg(count(lit(1)).cast("long").as("_df"))
      .crossJoin(broadcast(n))
      .filter(col("_df") >= 2 &&
        col("_df") <= ceil(lit(maxDfFrac) * col("_n")).cast("long"))
    val w0 = tf.join(dfreq, "_t")
      .select(col("_d"), col("_t"),
        (col("_tf").cast("double") *
          log(col("_n").cast("double") / col("_df").cast("double"))).as("_w"))
    if (checkpoint) w0.eagerPin() else w0
  }

  /** Shared closing: norms from the weight table, cosine, threshold. */
  private def closeCosine(dots: DataFrame, w: DataFrame, minCos: Double): DataFrame = {
    val norms = w.groupBy("_d").agg(sqrt(sum(col("_w") * col("_w"))).as("_nm"))
    dots
      .join(norms.select(col("_d").as("doc_a"), col("_nm").as("_na")), "doc_a")
      .join(norms.select(col("_d").as("doc_b"), col("_nm").as("_nb")), "doc_b")
      .withColumn("cos", col("dot") / (col("_na") * col("_nb")))
      .filter(col("cos") >= minCos)
      .select("doc_a", "doc_b", "dot", "cos")
  }

  /** Entity resolution end-to-end — the golden-record pipeline of master
    * data management, composed from the shipped primitives exactly as a
    * user would: [[fuzzyNamePairs]] (exact within-`maxDist` name pairs,
    * lossless gram-prefix pruning) → [[clusters]] over the name-pair
    * graph (min-label connected components) → each ROW maps through its
    * name to the cluster, and the cluster's canonical id is the MINIMUM
    * entity id across all member rows (the deterministic survivorship
    * rule; swap in [[nearDedupBest]]'s rank-based policy when "best"
    * beats "first"). Name-space clustering means the pair machinery
    * never touches the corpus — |distinct names| drives every stage,
    * rows only join back at the end (one hash join on the name). Rows
    * with a null/empty name are their own singleton clusters (nothing
    * to match on — canonical = themselves). Output: idCol, nameCol,
    * canonical_id (min id of the matched group), is_canonical.
    */
  def goldenRecord(df: DataFrame, idCol: String, nameCol: String,
      maxDist: Int, maxRounds: Int = 20): DataFrame = {
    val pairs = fuzzyNamePairs(df, nameCol, maxDist)
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val names = df.select(col(nameCol).as("_n"))
      .filter(col("_n").isNotNull && length(col("_n")) > 0).distinct()
    val nameClusters = clusters(names, "_n", pairs, maxRounds, checkIds = false)
      .select(col("id").as("_n"), col("cluster").as("_cl"))
    val nameOk = col(nameCol).isNotNull && length(col(nameCol)) > 0
    // null/empty-name rows never enter the cluster machinery: they are
    // their own golden record by definition (nothing to match on), and
    // keeping them out avoids inventing synthetic cluster labels a real
    // name could collide with
    val labeled = df.filter(nameOk)
      .join(nameClusters, col(nameCol) === col("_n"))
    val canon = labeled.groupBy("_cl")
      .agg(min(col(idCol)).as("canonical_id"))
    labeled.join(canon, "_cl")
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
      .select(col(idCol), col(nameCol), col("canonical_id"), col("is_canonical"))
      .unionByName(df.filter(!nameOk)
        .select(col(idCol), col(nameCol), col(idCol).as("canonical_id"),
          lit(true).as("is_canonical")))
  }

  /** Per-document duplicated-window profile: overlapping `w`-token windows
    * (stride 1), a window counting as duplicated when it appears in at
    * least `minDocs` DISTINCT documents. This is the substring-level dedup
    * signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"): a document most of whose windows occur
    * elsewhere is boilerplate/copy even when no pairwise Jaccard fires —
    * the complement of [[ngramJaccardPairs]] (pairs) and the overlapping
    * counterpart of the NON-overlapping chunk dedup in Packing.
    *
    * Scale design: windows travel as the 16-byte dual polynomial folds of
    * [[Sig.spanKeys]] (never gram strings); there is NO pair join anywhere
    * — document frequency is a partial-aggregated count per window key, so
    * a boilerplate window in 10⁶ documents combines map-side instead of
    * fanning out 10¹² candidate pairs. Two shuffles on the window key plus
    * one on the doc id, all skew-safe by construction. Within-doc repeats
    * are collapsed (array_distinct) BEFORE counting, so df counts distinct
    * documents. Documents with < `w` tokens have no windows and are
    * excluded (mirrored in the oracle).
    *
    * Output: idCol, n_windows (distinct windows), n_dup (windows with
    * df >= minDocs), dup_frac (4 dp), is_dup (dup_frac >= thr).
    */
  def windowDupProfile(df: DataFrame, idCol: String, textCol: String,
      w: Int, minDocs: Int = 2, thr: Double = 0.5,
      checkpoint: Boolean = true): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document), got $minDocs")
    GraftExpressions.register(df.sparkSession)
    SigX.register(df.sparkSession) // native span keys
    // _th materializes behind its own projection: the span fold reads the
    // hashed array 2w× per window via element_at, and an inlined
    // tokenize+hash subtree there re-runs per REFERENCE (measured 62 s →
    // 1.6 s at sf0.1 for this exact query). The exploded window table then
    // checkpoints because BOTH the df count and the per-doc join read it.
    val withTh = df.select(col(idCol),
      Sig.tokenHashes(tokens(col(textCol))).as("_th"))
    val wk = transform(SigX.spanKeys(col("_th"), w),
      k => concat_ws("_", k("h1"), k("h2")))
    val ex0 = withTh.select(col(idCol), explode(array_distinct(wk)).as("wk"))
    val ex = if (checkpoint) ex0.eagerPin() else ex0
    val dfc = ex.groupBy("wk").agg(count(lit(1)).as("wdf"))
    ex.join(dfc, "wk")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("wdf") >= minDocs, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        Rounding.mirrorRound(col("n_dup") * 1.0 / col("n_windows"), 4))
      .withColumn("is_dup", col("dup_frac") >= thr)
  }

  /** Character-window CONTAINMENT pairs — the dedup mode Jaccard misses
    * by construction: a short document pasted whole into a long one
    * (quote farms, aggregator pages, doc+boilerplate wrappers) shares
    * only a small fraction of the long document's shingles, so d02/d03's
    * symmetric Jaccard never fires; containment |A∩B| / min(|A|,|B|)
    * does (Broder 1997's second resemblance measure; the Lee et al. 2022
    * substring-dedup motivation at window granularity).
    *
    * Signature: every `window`-char sliding window's polynomial hash
    * (the t04/PolyHash codegen expression per window — O(len·window)
    * narrow work, zero shuffle), WINNOWED deterministically to hashes
    * ≡ 0 (mod sampleMod) — content-defined sampling, so two documents
    * sample the SAME positions of shared text regardless of alignment
    * (a fixed-stride sample would alias on offset). Then exactly d02's
    * scale shape: distinct-hash explode, hot-hash df cap as PARTIAL AGG
    * + SEMI-JOIN (never a window over the exploded stream), candidate
    * pairs meet in a hash equi-join, and the containment denominator is
    * the SMALLER kept-signature size. Documents shorter than `window`
    * or with no sampled windows drop (no signature, no claim). Output:
    * id_a, id_b, n_a, n_b, inter, containment (>= thr).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      thr: Double, window: Int = 20, sampleMod: Int = 8,
      maxDf: Int = 50): DataFrame = {
    require(window >= 4 && window <= 1000, s"window in [4,1000], got $window")
    require(sampleMod >= 1, "sampleMod must be >= 1")
    require(thr > 0 && thr <= 1.0, "thr in (0,1]")
    GraftExpressions.register(df.sparkSession)
    val text = col(textCol)
    // one-pass rolling-hash native twin of the transform/filter/distinct
    // HOF chain (identical values — see WindowHashes): O(len) per row
    // instead of O(len·window) interpreted lambdas
    val fps = df.filter(length(text) >= window)
      .select(col(idCol).as("_gid"),
        GraftExpressions.windowHashes(text, window, sampleMod.toLong).as("_fp"))
      .filter(size(col("_fp")) > 0)
    val ex = fps.select(col("_gid"), explode(col("_fp")).as("h"))
      .eagerPin() // read by the df table AND the pair join
    val lowDf = ex.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("h")
    val kept = ex.join(lowDf, Seq("h"), "left_semi")
    val n = kept.groupBy("_gid").agg(count(lit(1)).as("n"))
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") && col("a._gid") < col("b._gid"))
      .groupBy(col("a._gid").as("id_a"), col("b._gid").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(n.as("na"), col("id_a") === col("na._gid"))
      .join(n.as("nb"), col("id_b") === col("nb._gid"))
      .select(col("id_a"), col("id_b"),
        col("na.n").as("n_a"), col("nb.n").as("n_b"), col("inter"),
        Rounding.mirrorRound(
          col("inter") * 1.0 / least(col("na.n"), col("nb.n")), 4)
          .as("containment"))
      .filter(col("containment") >= thr)
  }
}
