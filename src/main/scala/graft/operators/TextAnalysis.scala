package graft.operators

import graft.operators.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, Rounding, SignatureExpressions => SigX}
import graft.functions.TextFunctions._

/** Reusable text-analysis operators over arbitrary DataFrames — the
  * library surface behind t01–t05. All are single-pass narrow
  * transformations: zero shuffle at any scale.
  */
object TextAnalysis {

  val DefaultLangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "les", "une"))

  /** Conservative redaction patterns (shared with the DuckDB oracle, so
    * only regex features Java and RE2 treat identically: char classes,
    * bounded repeats — no lookaround/backrefs). URLs first: an address
    * inside a URL must redact as part of the URL.
    */
  val DefaultRedactions: Seq[(String, String)] = Seq(
    "https?://[^ ]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>")

  /** Canonical text normalization for dedup/tokenization: lowercase,
    * non-alphanumerics to spaces, whitespace collapsed, trimmed. A
    * narrow, codegen'd column transform — zero shuffle at any scale.
    */
  def normalizeText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** (idCol, norm_text): normalized copy of each document. */
  def normalize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), normalizeText(col(textCol)).as("norm_text"))

  /** (idCol, red_text): text with `patterns` replaced in order — the
    * PII-scrub step of a training-data pipeline (email/URL by default).
    */
  def redact(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[(String, String)] = DefaultRedactions): DataFrame = {
    val red = patterns.foldLeft(col(textCol)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    df.select(col(idCol), red.as("red_text"))
  }

  /** Token/char counts and mean word length. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"),
        length(col(textCol)).cast("long").as("n_chars"))
      .withColumn("mean_wlen",
        Rounding.mirrorRound((col("n_chars") - col("n_tokens") + 1) / col("n_tokens"), 4))

  /** Marker-word language scores + argmax prediction (first language in
    * `markers` order wins ties; 'unknown' when no marker hits).
    */
  def langId(df: DataFrame, idCol: String, textCol: String,
      markers: Seq[(String, Seq[String])] = DefaultLangMarkers): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = df.select(col(idCol) +:
      markers.map { case (l, ws) => markerCount(toks, ws).as(s"score_$l") }: _*)
    val best = greatest(markers.map(m => col("score_" + m._1)): _*)
    val pred = markers.foldRight(lit("unknown")) { case ((l, _), els) =>
      when(col(s"score_$l") > 0 && col(s"score_$l") >= best, lit(l)).otherwise(els)
    }
    scored.withColumn("predicted", pred)
  }

  /** Stopword-ratio / word-length composite quality score. */
  /** t03's composite quality as a bare COLUMN (mirror-rounded 4 dp) —
    * for callers that need the score as a predicate/label without the
    * row-shaping (t30's training labels).
    */
  def qualityExpr(textCol: org.apache.spark.sql.Column,
      stopwords: Seq[String] = Seq("the", "a")): org.apache.spark.sql.Column = {
    val toks = tokens(textCol)
    val nTok = size(toks).cast("long")
    val stops = markerCount(toks, stopwords)
    val meanW = (length(textCol).cast("long") - nTok + 1) / nTok
    Rounding.mirrorRound(lit(0.6) * (lit(1) - stops / nTok)
      + lit(0.4) * least(meanW / 8.0, lit(1.0)), 4)
  }

  def qualityScore(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("long")
    val stops = markerCount(toks, stopwords)
    val meanW = (length(col(textCol)).cast("long") - nTok + 1) / nTok
    df.select(col(idCol),
      Rounding.mirrorRound(stops / nTok, 4).as("stop_ratio"),
      Rounding.mirrorRound(meanW, 4).as("mean_wlen"),
      qualityExpr(col(textCol), stopwords).as("quality"))
  }

  /** Gopher-style document-level quality rule bundle (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1 — the standard pre-training hygiene gates):
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio
    * (`#` / `...`), alphabetic-word fraction, and minimum stopword hits.
    * Emits the raw signals, one boolean per rule, and the composite
    * `keep` — per-rule flags are what a curation pipeline reports (which
    * gate fired), not just the verdict. A single narrow projection:
    * every signal is one pass over the token array, zero shuffle at any
    * scale. Flags compare RAW doubles (each signal is one integer
    * division — bit-identical in any IEEE engine, so an external SQL
    * oracle computes the same booleans); displayed ratios are 4 dp.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq("the", "a"),
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWlen: Double = 3.0, maxMeanWlen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("long")
    val meanW = (length(col(textCol)).cast("long") - nTok + 1) / nTok
    val symRatio = regexp_count(col(textCol), lit("#|\\.\\.\\.")).cast("double") / nTok
    val alphaFrac = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / nTok
    val nStop = markerCount(toks, stopwords)
    df.select(col(idCol),
        nTok.as("n_words"),
        Rounding.mirrorRound(meanW, 4).as("mean_wlen"),
        Rounding.mirrorRound(symRatio, 4).as("symbol_ratio"),
        Rounding.mirrorRound(alphaFrac, 4).as("alpha_frac"),
        nStop.as("n_stop"),
        (nTok >= minWords && nTok <= maxWords).as("r_words"),
        (meanW >= minMeanWlen && meanW <= maxMeanWlen).as("r_wlen"),
        (symRatio <= maxSymbolRatio).as("r_symbol"),
        (alphaFrac >= minAlphaFrac).as("r_alpha"),
        (nStop >= minStopwords).as("r_stop"))
      .withColumn("keep",
        col("r_words") && col("r_wlen") && col("r_symbol") && col("r_alpha") && col("r_stop"))
  }

  /** Fixed-window document chunking with overlap — the context-window
    * splitter of pretraining/RAG pipelines: token windows of
    * `chunkTokens` starting every `chunkTokens - overlap` tokens (the
    * tail chunk may be short; every token lands in ≥1 chunk, boundary
    * tokens in 2). A narrow posexplode of per-row window starts —
    * zero shuffle, output rows ≈ n_tokens / step per doc. Output:
    * idCol, chunk_idx, n_chunk_tokens, chunk_text.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    val starts = sequence(lit(0), greatest(n - 1, lit(0)), lit(step))
    df.select(col(idCol), toks.as("_toks"), explode(starts).as("_start"))
      .select(col(idCol),
        (col("_start") / step).cast("long").as("chunk_idx"),
        least(lit(chunkTokens), size(col("_toks")) - col("_start"))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("_toks"), col("_start") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Polynomial rolling-hash fingerprint (codegen'd). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftExpressions.register(df.sparkSession)
    df.select(col(idCol), GraftExpressions.polyHash(col(textCol)).as("fingerprint"))
  }

  /** BPE-ish regex tokenization: letter runs / digit runs / punctuation
    * runs (the pre-tokenizer split most BPE vocabularies assume). The
    * pattern is RE2-safe so oracle engines agree.
    */
  val RegexTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

  def regexTokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = regexp_extract_all(col(textCol), lit(RegexTokenPattern), lit(0))
    df.select(col(idCol),
      size(toks).cast("long").as("n_bpe_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      coalesce(Rounding.mirrorRound(aggregate(toks, lit(0L), (a, t) => a + length(t))
        / size(toks).cast("double"), 4), lit(0.0)).as("mean_tok_len"))
  }

  /** Corpus vocabulary: global token frequencies (one explode + one
    * aggregation — partial map-side combine carries the load at scale),
    * top `k` by count with deterministic ties on the token.
    */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("token"))
      .limit(k)

  /** Zipf-law fit over the corpus frequency spectrum — log-log least
    * squares of frequency against rank, whose negative slope is the Zipf
    * exponent α (≈ 1 for natural language; Piantadosi 2014 review). The
    * corpus-level health check of a training mix: synthetic/templated
    * corpora flatten the curve (α → 0), boilerplate-dominated ones
    * steepen the head — a one-row fingerprint that moves before
    * downstream evals do, and the diagnostic companion to t07's raw
    * top-k table.
    *
    * Scale shape: the corpus reduces to the (token, count) table by ONE
    * partial-agg pass; ranking and the regression run on the top
    * `maxRanks` of the VOCABULARY (the q53 contract — statistic tables
    * sort, corpora never do). Counts are exact longs; rank is total
    * (count desc, token asc tie-break — reproducible cross-engine); the
    * five regression sums over (ln rank, ln count) are doubles, so they
    * fold on an ORDERED window by rank (the q110 sequential-fold
    * discipline) and the closed forms are fixed double trees. Degenerate
    * spectra (all counts equal → zero y-variance) emit no row. Output
    * one row: n_vocab, n_fit, alpha, r2.
    */
  def zipfFit(df: DataFrame, textCol: String, maxRanks: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxRanks >= 3, s"need >= 3 ranks to fit, got $maxRanks")
    val freq = df.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val ranked = freq
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("freq"), col("token"))))
      .withColumn("n_vocab", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("rank") <= maxRanks)
      .withColumn("_x", log(col("rank").cast("double")))
      .withColumn("_y", log(col("freq").cast("double")))
    val wr = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = ranked
      .withColumn("_m", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("_sx", sum(col("_x")).over(wr))
      .withColumn("_sy", sum(col("_y")).over(wr))
      .withColumn("_sxx", sum(col("_x") * col("_x")).over(wr))
      .withColumn("_syy", sum(col("_y") * col("_y")).over(wr))
      .withColumn("_sxy", sum(col("_x") * col("_y")).over(wr))
      .filter(col("rank") === col("_m")) // the completed ordered fold
    val m = col("_m").cast("double")
    val dx = m * col("_sxx") - col("_sx") * col("_sx")
    val dy = m * col("_syy") - col("_sy") * col("_sy")
    val cov = m * col("_sxy") - col("_sx") * col("_sy")
    folded.filter(col("_m") >= 3)
      .withColumn("_dx", dx).withColumn("_dy", dy)
      .filter(col("_dx") > 0.0 && col("_dy") > 0.0)
      .select(col("n_vocab"), col("_m").as("n_fit"),
        (lit(0.0) - cov / col("_dx")).as("alpha"),
        (cov * cov / (col("_dx") * col("_dy"))).as("r2"))
  }

  /** Flesch reading-ease per group (Flesch 1948) — the classical
    * readability score quality filters bin web text by (a corpus whose
    * FRE collapses is shifting toward legalese/boilerplate; one whose
    * FRE inflates toward telegraphic spam). EVERY count is an exact
    * integer per document — words = the shared space-token contract,
    * sentences = maximal [.!?]+ runs (min 1), syllables = maximal
    * [aeiouy]+ runs in the lowercased text PLUS one per vowel-less word
    * (runs count via the two-replace length trick: replacing each run
    * with '#' then with '' differs by exactly the run count — pure
    * codegen'd Columns, no explode, no UDF, zero shuffle before the
    * group agg) — summed per group as longs in ONE partial-agg pass;
    * only the macro formula
    *   fre = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
    * touches doubles, ONE fixed tree replayed verbatim by the oracle.
    * EMPTY tokens are not words (this deliberately diverges from the
    * raw `len(string_split)` token contract: a run of spaces must not
    * inflate the word count, and a vowel-less "word" of length 0 must
    * not add a syllable), so empty and whitespace-only documents
    * genuinely drop through the zero-word filter. Output: groupCol,
    * n_docs, n_words, n_sentences, n_syllables, fre.
    */
  def readability(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val low = lower(t)
    def runs(c: Column, pat: String): Column =
      (length(regexp_replace(c, pat, "#")) -
        length(regexp_replace(c, pat, ""))).cast("long")
    val words = size(filter(tokens(t), w => length(w) > 0)).cast("long")
    val novowel = size(filter(tokens(low),
      w => length(w) > 0 && !w.rlike("[aeiouy]"))).cast("long")
    val sentences = greatest(lit(1L), runs(t, "[.!?]+"))
    val agg = df.select(col(groupCol), words.as("_w"), sentences.as("_s"),
        (runs(low, "[aeiouy]+") + novowel).as("_y"))
      .filter(col("_w") > 0L)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum(col("_w")).as("n_words"),
        sum(col("_s")).as("n_sentences"), sum(col("_y")).as("n_syllables"))
    agg.withColumn("fre",
      lit(206.835) -
        lit(1.015) * (col("n_words").cast("double") /
          col("n_sentences").cast("double")) -
        lit(84.6) * (col("n_syllables").cast("double") /
          col("n_words").cast("double")))
  }

  /** Gopher-style repetition quality signals (the standard "is this doc
    * degenerate boilerplate?" filters of a training-data pipeline):
    * duplicate-word fraction, duplicate-bigram fraction, and
    * top-word fraction (share of the most frequent token). Bigram
    * signals are NARROW (array arithmetic per row, zero shuffle); the
    * top-word multiplicity aggregates on (id, token) — partial map-side
    * combine carries it at scale, and the shuffle key is the 16-byte-ish
    * (id, token) pair, never the text. Output: idCol, n_tokens,
    * dup_word_frac, dup_bigram_frac, top_word_frac (4 dp).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      preserve: Boolean = false): DataFrame = {
    // FULLY NARROW — zero exchanges (was: explode → two groupBys → join,
    // which shuffled the corpus's entire token stream twice to compute
    // quantities that are pure per-row functions of the token array;
    // VERDICT r12's barrier-count finding). Every stat derives from the
    // row's own array: distinct counts via array_distinct, and the top
    // word count as a run-length fold over the SORTED token array (a
    // word's count = its longest run once sorted). Per-row cost is
    // O(n log n) in the document's own token count — the right shape at
    // 100 TB, where a token-stream shuffle is the single largest cost a
    // quality pass can incur.
    // The token array MUST materialize as its own projected column (the
    // q31/d17 discipline): the stats below reference it ~6 times, and a
    // higher-order function in the projection drops it out of codegen'd
    // CSE — inlined, the split() re-runs per reference (measured 3.7× on
    // t10 at sf0.1). As a non-cheap alias with multiple references the
    // lower Project survives CollapseProject.
    val toks0 = tokens(col(textCol))
    val toks = col("_tk")
    val nb = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), nb), slice(toks, lit(2), nb),
      (a, b) => concat(a, lit(" "), b))
    // longest run in sorted order: state (prev, run, best); strings only
    // compare equal to themselves, so fold order inside equal runs is
    // immaterial and the result is exact (not approximate)
    val top = aggregate(array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    // preserve=true keeps the input columns alongside the stats (the
    // composition form — p03 gates on them without a join-back)
    val head: Seq[org.apache.spark.sql.Column] =
      if (preserve) df.columns.toSeq.map(col) else Seq(col(idCol))
    df.filter(toks0.isNotNull) // mirrors the old explode/inner-join null drop
      .select(head ++ Seq(toks0.as("_tk")): _*)
      .select(head ++ Seq(
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("_nd"),
        nb.cast("long").as("_nb"),
        size(array_distinct(bigrams)).cast("long").as("_nbd"),
        top.as("_top")): _*)
      .select(head ++ Seq(col("n_tokens"),
        Rounding.mirrorRound((col("n_tokens") - col("_nd")) * 1.0 / col("n_tokens"), 4)
          .as("dup_word_frac"),
        when(col("_nb") === 0, lit(0.0))
          .otherwise(Rounding.mirrorRound((col("_nb") - col("_nbd")) * 1.0 / col("_nb"), 4))
          .as("dup_bigram_frac"),
        Rounding.mirrorRound(col("_top") * 1.0 / col("n_tokens"), 4).as("top_word_frac")): _*)
  }

  /** Corpus-LM document scoring — the CCNet-style "how surprising is this
    * document under a language model of the (reference) corpus?" quality
    * signal, with a bigram model with add-one smoothing standing in for
    * the external 5-gram KenLM (which would be a model artifact
    * distributed via Artifacts at deploy): P(w2|w1) =
    * (c(w1 w2) + 1) / (c(w1 ·) + V). Output: idCol, n_bigrams, avg_logp —
    * the mean natural-log probability per bigram (more negative = more
    * surprising; CCNet keeps the middle of the distribution). Documents
    * with fewer than 2 tokens score null with n_bigrams = 0.
    *
    * Two passes, all join-based: (1) model build over `ref` (defaults to
    * `df` itself) — bigram counts, context counts, and the vocabulary
    * size, each a partial-aggregated groupBy whose shuffle key is the
    * token pair, never the text; (2) scoring — the document bigrams
    * equi-join the model tables (left joins, so scoring a corpus against
    * a DIFFERENT reference handles unseen bigrams/contexts via the
    * smoothing floor 1/(c1 + V)). At 100 TB the model tables are
    * shuffle-join sides keyed by (w1, w2)/(w1) — broadcastable when the
    * reference is a curated subset.
    */
  def bigramLm(df: DataFrame, idCol: String, textCol: String,
      ref: Option[DataFrame] = None): DataFrame = {
    def bigrams(in: DataFrame, id: org.apache.spark.sql.Column): DataFrame = {
      val toks = tokens(col(textCol))
      val nb = greatest(size(toks) - 1, lit(0))
      in.select(id.as("_id"),
          explode(zip_with(slice(toks, lit(1), nb), slice(toks, lit(2), nb),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("_bg"))
        .select(col("_id"), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
    }
    val refDf = ref.getOrElse(df)
    // the reference bigram table feeds both model aggregations; it stays
    // LAZY on purpose — materializing it would store a corpus-scale
    // intermediate (~one row per token) in executor blocks to save two
    // NARROW re-tokenization scans, a bad trade at scale (checkpoints in
    // this repo hold sliver-sized state: centroids, edges, model tables).
    // CONTRACT: `ref` must be deterministic across jobs — the two model
    // aggregations scan it independently, so a nondeterministic ref
    // (df.sample, a mutating source) would give bc and cc inconsistent
    // snapshots; stabilize such a ref yourself (persist/localCheckpoint)
    // before passing it. Persist bc/cc when scoring many corpora.
    val rbg = bigrams(refDf, col(idCol))
    val bc = rbg.groupBy("w1", "w2").agg(count(lit(1)).as("_c12"))
    val cc = rbg.groupBy("w1").agg(count(lit(1)).as("_c1"))
    val v = refDf.select(explode(tokens(col(textCol))).as("_tok"))
      .agg(countDistinct("_tok").as("_v"))
    val scored = bigrams(df, col(idCol))
      .join(bc, Seq("w1", "w2"), "left")
      .join(cc, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("_id"),
        log((coalesce(col("_c12"), lit(0L)) + lit(1.0)) /
          (coalesce(col("_c1"), lit(0L)) + col("_v"))).as("_lp"))
      .groupBy("_id")
      .agg(count(lit(1)).as("_nb"), avg("_lp").as("_avg"))
    df.select(col(idCol)).join(scored, col(idCol) === col("_id"), "left")
      .select(col(idCol),
        coalesce(col("_nb"), lit(0L)).as("n_bigrams"),
        col("_avg").as("avg_logp"))
  }

  /** Trigram language-model scoring with STUPID BACKOFF (Brants et al.
    * 2007, arXiv/W07-2, "Large Language Models in Machine Translation")
    * — the scheme the web-scale LM-filtering stacks actually run,
    * because unlike Kneser–Ney it needs NO discount fitting and every
    * level is a plain count ratio:
    *   S(w3|w1w2) = c123/c12            if the trigram was seen,
    *              = α · c23/c2          else if the bigram was seen,
    *              = α² · (c3+1)/(N+V)   otherwise (add-one unigram
    *                floor, so out-of-vocabulary tokens score finite
    *                instead of ln 0 — the OOV guard Brants leaves open).
    * Per-document quality signal = mean ln S over trigram positions —
    * the [[bigramLm]] contract one order higher, with the backoff chain
    * exercised whenever `ref` is a different corpus slice (CCNet trains
    * on the target-domain slice and scores the crawl).
    *
    * Plan: the reference corpus is touched a bounded number of times for
    * three n-gram COUNT tables (partial-agg groupBys — the shuffle
    * carries (gram, count) rows, vocabulary-bounded under Heaps' law,
    * never the token stream) plus one scalar (N, V) agg; scoring is the
    * scored corpus's trigram stream LEFT-joined to the count tables on
    * their gram keys and one per-doc re-aggregation. Each ln sees ONE
    * division (and a literal α product) — a fixed double tree per
    * branch; the branch DECISION is a null test on exact longs. Docs
    * under 3 tokens emit n_trigrams = 0 with a null score. `ref` must
    * be deterministic across jobs (the bigramLm contract — four
    * independent aggregations scan it).
    * Output: idCol, n_trigrams, avg_logp.
    */
  def backoffLm(df: DataFrame, idCol: String, textCol: String,
      ref: Option[DataFrame] = None, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    def trigrams(in: DataFrame, id: org.apache.spark.sql.Column): DataFrame = {
      val toks = tokens(col(textCol))
      val nt = greatest(size(toks) - 2, lit(0))
      // three aligned slices of equal length nt — zip_with never pads
      val pair = zip_with(slice(toks, lit(1), nt), slice(toks, lit(2), nt),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      val tri = zip_with(pair, slice(toks, lit(3), nt),
        (p, c) => struct(p.getField("w1").as("w1"), p.getField("w2").as("w2"),
          c.as("w3")))
      in.select(id.as("_id"), explode(tri).as("_tg"))
        .select(col("_id"), col("_tg.w1").as("w1"), col("_tg.w2").as("w2"),
          col("_tg.w3").as("w3"))
    }
    def bigrams(in: DataFrame): DataFrame = {
      val toks = tokens(col(textCol))
      val nb = greatest(size(toks) - 1, lit(0))
      in.select(explode(zip_with(slice(toks, lit(1), nb), slice(toks, lit(2), nb),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("_bg"))
        .select(col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
    }
    val refDf = ref.getOrElse(df)
    val rbg = bigrams(refDf)
    val rug = refDf.select(explode(tokens(col(textCol))).as("_w"))
    val c123 = trigrams(refDf, lit(0L)).groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("_c123"))
    val c12 = rbg.groupBy("w1", "w2").agg(count(lit(1)).as("_c12"))
    val c23 = rbg.groupBy("w1", "w2").agg(count(lit(1)).as("_c23"))
      .withColumnRenamed("w1", "w2t").withColumnRenamed("w2", "w3t")
    val uc = rug.groupBy("_w").agg(count(lit(1)).as("_cu"))
    val nv = rug.agg(count(lit(1)).as("_n"), countDistinct("_w").as("_v"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val lp = when(col("_c123").isNotNull, log(d(col("_c123")) / d(col("_c12"))))
      .when(col("_c23").isNotNull,
        log(lit(alpha) * d(col("_c23")) / d(col("_c2"))))
      .otherwise(log(lit(alpha * alpha) * (d(coalesce(col("_c3"), lit(0L))) + lit(1.0)) /
        (d(col("_n")) + d(col("_v")))))
    val scored = trigrams(df, col(idCol))
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(c23, col("w2") === col("w2t") && col("w3") === col("w3t"), "left")
      .join(uc.withColumnRenamed("_w", "_w2").withColumnRenamed("_cu", "_c2"),
        col("w2") === col("_w2"), "left")
      .join(uc.withColumnRenamed("_w", "_w3").withColumnRenamed("_cu", "_c3"),
        col("w3") === col("_w3"), "left")
      .crossJoin(broadcast(nv))
      .select(col("_id"), lp.as("_lp"))
      .groupBy("_id")
      .agg(count(lit(1)).as("_nt"), avg("_lp").as("_avg"))
    df.select(col(idCol)).join(scored, col(idCol) === col("_id"), "left")
      .select(col(idCol),
        coalesce(col("_nt"), lit(0L)).as("n_trigrams"),
        col("_avg").as("avg_logp"))
  }

  /** Word-level blocklist filter — the C4 "bad words" gate (Raffel et
    * al. 2020 §2.2 drop any page containing a term from the public
    * blocklist) and the profanity/PII-keyword screens of every crawl
    * pipeline. Token-exact matching (never substring — "class" must not
    * trip a "lass" entry), reported not just decided: n_hits (total
    * occurrences), matched (sorted distinct offending terms,
    * comma-joined — a curation pipeline audits WHICH term fired, the
    * t14 which-gate contract), keep = zero hits.
    *
    * Plan: the term list folds into the plan as a LITERAL array, so the
    * whole operator is ONE narrow whole-stage-codegen projection — zero
    * shuffle, zero join, at any corpus size. Per-token cost is
    * O(|terms|); real blocklists are a few hundred entries, so that is
    * the right trade. For list sizes where it isn't (millions of
    * entries — URL blocklists), use the join/bloom machinery
    * ([[graft.operators.Dedup.bloomSeen]]) instead of this literal
    * path. Output: idCol, n_hits, matched, keep.
    */
  def blocklist(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val tl = array(terms.distinct.map(lit): _*)
    val toks = tokens(col(textCol))
    val hits = size(filter(toks, t => array_contains(tl, t))).cast("long")
    df.select(col(idCol), hits.as("n_hits"),
      array_join(array_sort(array_intersect(toks, tl)), ",").as("matched"),
      (hits === 0L).as("keep"))
  }

  /** Hashed linear text classifier — the fastText architecture (bag of
    * hashed token features → linear layer → threshold) as a narrow column
    * expression: every token maps to feature bucket hash(token) mod
    * `dim`, the document score is the MEAN of the bucket weights, and the
    * label is score > 0. This is the shape of every model-based quality
    * filter in the curation literature (CCNet's fastText language filter,
    * the "looks-like-Wikipedia" classifiers gating GPT-3/LLaMA corpora).
    *
    * Weights are the swap point. With a trained `weights` table
    * ((bucket, weight), `dim` rows — a model artifact shipped via
    * [[graft.api.Artifacts]] at deploy) inference is one explode + one
    * BROADCAST join + one per-document re-aggregation. With the default
    * derived table — bucket id scrambled to a deterministic pseudo-random
    * weight in [-1, 1], the honest stand-in for trained parameters in a
    * container with no model files — the operator collapses to ONE
    * narrow whole-stage-codegen expression: zero shuffle, zero join, at
    * any corpus size. Missing buckets in a supplied table weigh 0.
    *
    * Output: idCol, n_tokens, score (6 dp), label (score > 0). Summation
    * is in token order on both engines (sequential fold), so the oracle
    * matches bit for bit.
    */
  def hashClassifier(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 4096, weights: Option[DataFrame] = None,
      preserve: Boolean = false): DataFrame = {
    require(!(preserve && weights.isDefined),
      "preserve is only supported on the narrow (derived-weights) path")
    require(dim > 0, "dim must be positive")
    GraftExpressions.register(df.sparkSession)
    import org.apache.spark.sql.Column
    val Scramble = graft.functions.Signatures.Scramble
    val toks = tokens(col(textCol))
    // Knuth multiplicative scramble (the canonical Signatures.Scramble):
    // decorrelates the bucket from hash order, and the weight from the
    // bucket id.
    def bucketOf(h: Column): Column = (h * lit(Scramble)) % P % dim
    def weightOf(b: Column): Column =
      (((b + 1) * lit(Scramble)) % P % 2001 - 1000) / 1000.0
    weights match {
      case None =>
        val ws = transform(graft.functions.Signatures.tokenHashes(toks),
          h => weightOf(bucketOf(h)))
        val score = Rounding.mirrorRound(
          aggregate(ws, lit(0.0), (a, x) => a + x) / size(toks), 6)
        // preserve=true keeps the input columns (narrow path only — the
        // p04 composition scores and gates without a self-join-back)
        val head: Seq[Column] =
          if (preserve) df.columns.toSeq.map(col) else Seq(col(idCol))
        df.select(head ++ Seq(size(toks).cast("long").as("n_tokens"),
            score.as("score")): _*)
          .withColumn("label", col("score") > 0)
      case Some(w) =>
        val ex = df.select(col(idCol).as("_id"), explode(toks).as("_tok"))
          .select(col("_id"), bucketOf(GraftExpressions.polyHash(col("_tok"))).as("bucket"))
        val sc = ex.join(broadcast(w.select(col("bucket"), col("weight"))), Seq("bucket"), "left")
          .groupBy("_id")
          .agg(sum(coalesce(col("weight"), lit(0.0))).as("_s"), count(lit(1)).as("_n"))
        df.select(col(idCol)).join(sc, col(idCol) === col("_id"))
          .select(col(idCol), col("_n").as("n_tokens"),
            Rounding.mirrorRound(col("_s") / col("_n"), 6).as("score"))
          .withColumn("label", col("score") > 0)
    }
  }

  /** Corpus report card — the per-group summary every curation run ends
    * with (the numbers that go in a dataset card): document and token
    * counts, the exact MEDIAN document length (rank-based: the value at
    * rank floor((n+1)/2) in length order — deterministic,
    * oracle-mirrorable, no interpolation ambiguity), and the exact-dup
    * footprint (d01 semantics: same normalized text, min-id canonical).
    *
    * Scale shape: NOTHING windows over the corpus by group (a dominant
    * group — English at half the corpus — would land on one task). The
    * counts are partial-agg groupBys; the median comes from a per-group
    * LENGTH HISTOGRAM (bounded by |groups| × distinct lengths — tiny),
    * where the rank-r value is the smallest length whose cumulative
    * count reaches r; only the histogram sees a window. The dup window
    * partitions by FINGERPRINT (dup groups are small by nature), exactly
    * like d01.
    *
    * Output per group: groupCol, n_docs, n_tokens, median_tokens,
    * dup_docs (non-canonical copies), dup_frac (4 dp).
    */
  /** DISTRIBUTED quality-classifier TRAINING (VERDICT r12 item 6) — the
    * loop that closes t12's inference-only gap: a fixed-round batch
    * PERCEPTRON over hashed bag-of-token counts. Perceptron, not
    * logistic regression, on purpose: the update is pure integer
    * arithmetic (y·count accumulations, sign comparisons), so an
    * external SQL oracle replays training bit for bit — a sigmoid would
    * hinge scores on cross-engine libm ulps. Same hashed feature space
    * as [[hashClassifier]] (bucket = polyHash·Scramble mod P mod dim),
    * so the trained table drops into its supplied-weights path.
    *
    * Scale shape: featurization is one partial-agg groupBy (doc,
    * bucket) cached lazily; each round is margins (feature counts ×
    * broadcast weight map, per-doc sum) → misclassified set → gradient
    * partial-agg by bucket — the corpus shuffles bucket-count rows,
    * never text. Weights live on the driver between rounds as a
    * dim-bounded literal map — a MODEL ARTIFACT (the ivfPq-codebook
    * convention), never data. Deterministic: fixed rounds, batch
    * updates (order-free integer sums), margin-0 predicts −1.
    *
    * Output: (bucket: long, weight: long), only nonzero-touched buckets.
    */
  def trainHashedPerceptron(df: DataFrame, idCol: String, textCol: String,
      posCol: org.apache.spark.sql.Column, dim: Int = 1024,
      rounds: Int = 8, averaged: Boolean = true,
      denseDimMax: Int = 1 << 16): DataFrame = {
    require(dim > 0, "dim must be positive")
    require(rounds >= 1, "rounds must be >= 1")
    GraftExpressions.register(df.sparkSession)
    val Scramble = graft.functions.Signatures.Scramble
    val feats = df.select(col(idCol).as("_id"),
        when(posCol, 1L).otherwise(-1L).as("_y"),
        explode(tokens(col(textCol))).as("_tok"))
      .select(col("_id"), col("_y"),
        ((GraftExpressions.polyHash(col("_tok")) * Scramble) % P % dim).as("bucket"))
      .groupBy("_id", "_y", "bucket").agg(count(lit(1)).as("_c"))
    val session = df.sparkSession
    import session.implicits._
    var w = Map.empty[Long, Long]
    var acc = Map.empty[Long, Long]
    def fold(delta: Array[org.apache.spark.sql.Row]): Unit = {
      w = delta.foldLeft(w) { (m, r) =>
        val b = r.getLong(0)
        m.updated(b, m.getOrElse(b, 0L) + r.getLong(1))
      }
      acc = w.foldLeft(acc) { case (m, (b, v)) => m.updated(b, m.getOrElse(b, 0L) + v) }
    }
    if (dim <= denseDimMax) {
      // Dense-dim path (every declared binding: dim ≤ 64k). The feature
      // table collapses ONCE to per-document (bucket, count) profile
      // arrays, so each training round is per-row arithmetic over that
      // persisted table: the margin is a compiled O(profile) pass
      // (graft_bucket_margin — weights reach it as a DENSE dim-sized
      // literal ARRAY, the r13 form; untouched buckets hold 0, exactly
      // the old left-join coalesce), misclassified docs filter WITHOUT
      // an exchange, and the per-bucket gradient is the round's ONLY
      // shuffle (≤ dim rows per map task after partial agg). The r13
      // shape re-shuffled the whole feature table per round — margin
      // agg by (_id,_y), mis join back by _id, delta agg by bucket: 3
      // exchanges and ~5 AQE stage-jobs a round; this is 1 exchange and
      // ~2 jobs (VERDICT r13 item 2 — the t30/p18 barrier floor, which
      // co-tenant contention multiplies). Margins and deltas are exact
      // integer sums — identical in any profile order, so the
      // collect_list order and the r13 grouping order agree bit-for-bit
      // (the oracle replays every round as CTEs and certifies exactly
      // that).
      val docs = feats
        .groupBy("_id", "_y")
        .agg(collect_list(struct(col("bucket"), col("_c"))).as("_bc"))
        .select(col("_y"), col("_bc"))
        .persist() // read every round: margins + gradient
      for (_ <- 1 to rounds) {
        val arr = new Array[Long](dim)
        w.foreach { case (b, v) => arr(b.toInt) = v }
        val margin = GraftExpressions.bucketMargin(col("_bc"), typedlit(arr.toSeq))
        val delta = docs
          .filter((when(margin > 0, 1L).otherwise(-1L)) =!= col("_y"))
          .select(col("_y"), explode(col("_bc")).as("_x"))
          .groupBy(col("_x.bucket").as("bucket"))
          .agg(sum(col("_y") * col("_x._c")).as("_d"))
          .collect()
        fold(delta)
      }
      docs.unpersist(blocking = false)
    } else {
      // Sparse fallback (ADVICE r13): above 64k dims a dense literal
      // array bloats every round's serialized plan and codegen constants
      // with mostly-zero entries, while the broadcast weight join scales
      // with the NONZERO weight count — the r12-proven form, kept
      // verbatim. Margins are the same exact integer sums (left join +
      // coalesce 0 ≡ dense array with 0 holes), so both paths train
      // identical weights.
      val featsP = feats.persist() // read every round: margins + gradient
      for (_ <- 1 to rounds) {
        val wDf = w.toSeq.toDF("bucket", "_wt")
        val mis = featsP
          .join(broadcast(wDf), Seq("bucket"), "left")
          .groupBy("_id", "_y")
          .agg(sum(col("_c") * coalesce(col("_wt"), lit(0L))).as("_m"))
          .filter((when(col("_m") > 0, 1L).otherwise(-1L)) =!= col("_y"))
          .select("_id")
        val delta = featsP.join(mis, "_id")
          .groupBy("bucket").agg(sum(col("_y") * col("_c")).as("_d"))
          .collect()
        fold(delta)
      }
      featsP.unpersist(blocking = false)
    }
    // AVERAGED weights (Freund & Schapire 1999's stability fix, kept
    // integer as the SUM over rounds — a positive scalar multiple of the
    // average, so the ranking is identical and the oracle replay stays
    // exact): the raw batch perceptron oscillates on unnormalized count
    // features (measured AUC swinging 0.38-0.73 by round parity); the
    // round-summed weights reached 0.92/0.86 eval AUC at sf0.001/0.01.
    val out = if (averaged) acc else w
    out.toSeq.sortBy(_._1).toDF("bucket", "weight")
  }

  /** Score documents with a [[trainHashedPerceptron]] weight table: the
    * exact integer margin Σ_b weight(b)·count_d(b) — the inference half
    * of the train→score loop, one broadcast join + one partial agg.
    * Output: idCol, posCol as `pos`, `score` (long margin).
    */
  def perceptronScores(df: DataFrame, idCol: String, textCol: String,
      posCol: org.apache.spark.sql.Column, weights: DataFrame,
      dim: Int = 1024): DataFrame = {
    require(dim > 0, "dim must be positive")
    GraftExpressions.register(df.sparkSession)
    val Scramble = graft.functions.Signatures.Scramble
    df.select(col(idCol).as("_id"), when(posCol, true).otherwise(false).as("pos"),
        explode(tokens(col(textCol))).as("_tok"))
      .select(col("_id"), col("pos"),
        ((GraftExpressions.polyHash(col("_tok")) * Scramble) % P % dim).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("_id").as(idCol), col("pos"))
      .agg(sum(coalesce(col("weight"), lit(0L))).cast("long").as("score"))
  }

  def corpusReport(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = df.select(col(idCol).as("_id"), col(groupCol).as("_g"),
      size(tokens(col(textCol))).cast("long").as("_n"),
      graft.functions.TextFunctions.contentFingerprint(col(textCol)).as("_fp"))
    val keep = t.withColumn("_keep",
      col("_id") === min("_id").over(Window.partitionBy("_fp")))
    val aggs = keep.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_docs"), sum("_n").as("n_tokens"),
        sum(when(!col("_keep"), 1L).otherwise(0L)).as("dup_docs"))
    // histogram median: tiny table, windows are per-group over distinct
    // lengths, not over documents
    val hist = t.groupBy(col("_g"), col("_n")).agg(count(lit(1)).as("_c"))
    // the rank threshold needs only per-group doc counts, which the tiny
    // histogram already holds (sum of its own buckets) — deriving them
    // here keeps the dup-window subtree out of the median branch, so the
    // corpus is scanned once per output, not twice
    val cum = hist
      .withColumn("_cum", sum("_c").over(Window.partitionBy("_g").orderBy("_n")))
      .withColumn("_tot", sum("_c").over(Window.partitionBy("_g")))
    val med = cum
      .filter(col("_cum") >= floor((col("_tot") + 1) / 2))
      .groupBy(col("_g")).agg(min(col("_n")).as("median_tokens"))
    aggs.join(med, "_g")
      .select(col("_g").as(groupCol), col("n_docs"), col("n_tokens"),
        col("median_tokens"), col("dup_docs"),
        Rounding.mirrorRound(col("dup_docs") * 1.0 / col("n_docs"), 4).as("dup_frac"))
  }

  /** BPE merge-table training at corpus scale — the Sennrich et al. 2016
    * recipe ("Neural Machine Translation of Rare Words with Subword
    * Units") with the scale structure real trainers use: the corpus is
    * touched EXACTLY ONCE (the word-frequency groupBy); every merge round
    * then operates on the VOCABULARY table (distinct words × their symbol
    * sequences, weighted by frequency), which is orders of magnitude
    * smaller than the corpus and roughly corpus-size-independent (Heaps'
    * law). Each round: adjacent-pair counts (flatMap + partial-agg sum),
    * the argmax pair (ties → lexicographically smallest — fully
    * deterministic), and a narrow typed map applying the merge
    * greedily left-to-right; the vocab is locally checkpointed per round
    * (the d06 lineage discipline). Words start as character symbols.
    *
    * Returns the ordered merge list (driver-sized by construction:
    * `numMerges` entries IS the model). Encode with [[bpeEncode]] /
    * [[bpeSegment]]. Training stops early if no pair repeats.
    *
    * MERGE BATCHING (round 12): one driver round-trip and one
    * `localCheckpoint` per merge is 32k Spark jobs for a GPT-2-sized
    * vocabulary. Each pass instead takes the top `batchSize` pairs and
    * applies, in rank order, the ranked PREFIX-greedy subset whose
    * symbols are mutually disjoint — a pair is skipped for this pass
    * (not discarded; it re-ranks next pass) if either symbol, or the
    * concatenation of an already-accepted pair, collides with it.
    * Symbol-disjoint merges cannot change each other's occurrence
    * counts (fusing a,b elsewhere can neither create nor break a c,d
    * adjacency), so within a batch every accepted pair's count is
    * exactly what the sequential trainer would have seen — the greedy
    * order is preserved for non-overlapping pairs. WHERE IT CAN
    * DIVERGE from one-merge-at-a-time: a brand-new pair CONTAINING a
    * just-merged symbol (count ≤ the merged pair's) is only visible
    * from the NEXT pass, so if it would have outranked a later batch
    * member, the sequential trainer emits it earlier than the batched
    * one — the merge SET converges, the order near such chains can
    * differ (the standard fast-BPE trade). The DEFAULT batchSize = 1 is
    * exact sequential semantics — character-level BPE chains constantly
    * (l,o → lo,w → low,e), so batching is the deliberate scale knob for
    * large vocabularies, not the silent default: at batchSize = B a
    * GPT-2-sized run pays ~32k/B jobs instead of 32k.
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      batchSize: Int = 1): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    require(batchSize >= 1, "batchSize must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString).toSeq: Seq[String], f) }
      .eagerPin()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.length < numMerges) {
      val want = math.min(batchSize, numMerges - merges.length)
      val top = vocab.flatMap { case (s, f) =>
          if (s.length < 2) Iterator.empty
          else s.iterator.zip(s.iterator.drop(1)).map(p => (p._1, p._2, f))
        }
        .toDF("a", "b", "f").groupBy("a", "b").agg(sum("f").as("cnt"))
        .filter(col("cnt") >= 2) // a pair seen once carries no signal
        .orderBy(desc("cnt"), col("a"), col("b")).limit(want)
        .as[(String, String, Long)].collect()
      if (top.isEmpty) done = true
      else {
        // ranked prefix-greedy non-overlapping selection: a pair whose
        // symbols touch an accepted pair's symbols — or equal an accepted
        // pair's concatenation (a pre-existing symbol spelled like the new
        // one would gain occurrences the stale count missed) — waits for
        // the next pass, where it re-ranks against fresh counts
        val used = scala.collection.mutable.Set[String]()
        val batch = scala.collection.mutable.ArrayBuffer[(String, String)]()
        top.foreach { case (a, b, _) =>
          if (!used(a) && !used(b) && !used(a + b)) {
            batch += ((a, b))
            used += a; used += b; used += (a + b)
          }
        }
        merges ++= batch
        val bList = batch.toList
        val next = vocab.map { case (s, f) =>
            (bList.foldLeft(s) { case (acc, (a, b)) => applyMerge(acc, a, b) }, f)
          }
          .eagerPin()
        vocab = next
      }
    }
    merges.toSeq
  }

  /** One greedy left-to-right pass replacing adjacent (a, b) with a+b —
    * the standard BPE application order ("aaa" under (a,a) → [aa, a]).
    */
  private def applyMerge(sym: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val s = sym.toIndexedSeq
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** Segment one word with a trained merge list (merges applied in rank
    * order) — pure, for spot checks and single-word use.
    */
  def bpeSegment(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (s, (a, b)) => applyMerge(s, a, b)
    }

  /** Corpus encoding with a trained merge list: per-document word and
    * subword counts — the "how many tokens is this corpus under my
    * tokenizer" pass that sizes every training run. Scale shape: the
    * merge list broadcasts inside a closure; segmentation runs ONCE PER
    * DISTINCT WORD (a typed map over the vocabulary), and the corpus
    * re-joins the tiny (word → n_subwords) table — broadcast — rather
    * than re-segmenting every occurrence.
    * Output: idCol, n_words, n_subwords.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val seg = words.select("w").distinct().as[String]
      .map(w => (w, bpeSegment(w, merges).length.toLong))
      .toDF("w", "_ns")
    words.join(broadcast(seg), "w")
      .groupBy("_id")
      .agg(count(lit(1)).as("n_words"), sum("_ns").as("n_subwords"))
      .select(col("_id").as(idCol), col("n_words"), col("n_subwords"))
  }

  /** Per-document top-k keywords by TF-IDF (idf = ln(N/df), the
    * textbook smoothing-free form an external oracle can mirror
    * exactly). One tf aggregation feeds BOTH term frequency and
    * document frequency (df = row count per term over the tf table —
    * no second corpus scan), so the pipeline is: partial-agg on
    * (doc, term), partial-agg on term, a vocab-keyed sort-merge join
    * (both sides are corpus-sized at scale — deliberately NOT
    * broadcast), and a top-k window partitioned by the high-cardinality
    * doc id. N is one metadata scalar. Ties in the score (same tf, same
    * df ⇒ bit-identical doubles on any engine) break on the term
    * itself, so top-k is total-ordered. Output: idCol, term, tfidf
    * (unrounded), rk.
    */
  def tfIdfTopK(df: DataFrame, idCol: String, textCol: String, k: Int,
      checkpoint: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val n = df.count() // one metadata scalar, like Graph.pageRank's |V|
    // (count-star over a parquet source is metadata-cheap; over a derived
    // corpus, persist upstream before calling — the count can't reuse tf
    // because null-text docs vanish in the explode but count toward N)
    val tf0 = df.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    // tf feeds BOTH the df count and the join's left side — materialize
    // or the corpus explode+agg runs twice
    val tf = if (checkpoint) tf0.eagerPin() else tf0
    val docFreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(docFreq, "term")
      .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("_id").as(idCol), col("term"), col("tfidf"), col("rk"))
  }

  /** BM25 relevance of every document against a fixed query term set
    * (Robertson–Spärck Jones; the Okapi form with Lucene's +1 inside
    * the idf log so scores stay positive) — the retrieval scorer a
    * curation pipeline runs for decontamination sweeps ("find training
    * docs that answer benchmark questions") and topical quality mining.
    *   score(D) = Σ_{t ∈ Q∩D} ln((N − df + 0.5)/(df + 0.5) + 1)
    *              · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))
    * Scale shape: ONE corpus pass — tokenize, keep only query terms (an
    * `InSet` literal, narrow), partial-agg (doc, term) counts with the
    * doc length CARRIED through the explode (it's per-doc constant, so
    * `first` rides the same aggregate — no second scan, no doc-length
    * join); df per query term derives from that tf table (≤ |Q| rows,
    * broadcast back); N and avgdl are one metadata scalar pair. Nothing
    * corpus-sized ever sorts; the only shuffle keys are (doc, term) and
    * term. Float note (the t16/t17 trade): per-doc score is a ≤|Q|-term
    * double sum of identical expression trees over discrete (tf, df,
    * dl) inputs — cross-engine divergence is ulp-scale and the 4 dp
    * mirror-round absorbs it.
    * Output: idCol, matched_terms, dl, score (unrounded).
    */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      checkpoint: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(k1 >= 0 && b >= 0 && b <= 1, "k1 >= 0 and b in [0,1]")
    // null text counts toward N but contributes zero length (the SQL
    // mirror's sum() skips its NULL len — same value)
    val stats = df.agg(count(lit(1)).as("n"),
      sum(when(col(textCol).isNull, lit(0L))
        .otherwise(size(tokens(col(textCol))).cast("long"))).as("tot")).head()
    val n = stats.getLong(0)
    require(n > 0, "bm25 over an empty corpus")
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    // token array bound once below the generate (the q31/d17 discipline:
    // size() and the generator would each evaluate the split)
    val tf0 = df.select(col(idCol).as("_id"), tokens(col(textCol)).as("_tk"))
      .select(col("_id"), size(col("_tk")).cast("double").as("_dl"),
        explode(col("_tk")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy("_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("_dl")).as("dl"))
    // tf feeds BOTH the df derivation and the scoring join — pin it
    // (|matching docs|·|Q| rows) or the corpus explode+agg runs twice
    // (the t16 tfIdfTopK lesson; PlanAudit showed 4 corpus scans)
    val tf = if (checkpoint) tf0.eagerPin() else tf0
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log((lit(n.toDouble) - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val contrib = idf * (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(broadcast(dfreq), "term")
      .withColumn("_c", contrib)
      .groupBy("_id")
      .agg(count(lit(1)).as("matched_terms"), first(col("dl")).as("dl"),
        sum(col("_c")).as("score"))
      .select(col("_id").as(idCol), col("matched_terms"),
        col("dl").cast("long").as("dl"), col("score"))
  }

  /** Global top-k retrieval over [[bm25Scores]] through the q96 heap
    * aggregate (`graft_topk`): each map task keeps ONE k-capped min-heap,
    * the shuffle carries ≤ k (score, id) pairs per task — at 100 TB the
    * ranking exchanges kilobytes where a window plan would sort the
    * matched set into one task (a GLOBAL top-k has no partition key).
    * Ties break on id DESC under the heap's (score, id) lexicographic
    * order, exactly q96's contract. Output: idCol, score, rk (1-based).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be >= 1")
    graft.functions.TopKAggregate.register(df.sparkSession)
    bm25Scores(df, idCol, textCol, queryTerms, k1, b)
      .agg(graft.functions.TopKAggregate.topK(
        col("score"), col(idCol), lit(k)).as("top"))
      .select(posexplode(col("top")).as(Seq("_p", "e")))
      .select(col("e.id").as(idCol), col("e.score").as("score"),
        (col("_p") + 1).cast("long").as("rk"))
  }

  /** Per-document Shannon entropy of the token distribution (nats) — a
    * repetition/quality signal: boilerplate and keyword-stuffed docs
    * score low, diverse prose high. Uses the algebraic identity
    * H = ln(n) − (Σ tf·ln tf)/n so ONE aggregation over the (doc, term)
    * tf table suffices — no per-doc total join, no window. Two
    * partial-agg shuffles total, both keyed by high-cardinality ids;
    * parallel at any corpus size. Cross-engine float note (t11's
    * accepted tradeoff, same shape): Σ tf·ln tf is an order-dependent
    * double sum, but per-doc terms number in the hundreds and ln values
    * are transcendental, so engine disagreement sits ~1e-15 — flipping
    * a 4 dp mirror-round needs a true value within an ulp of a 0.00005
    * boundary, which rational-free sums don't land on (verified at
    * sf0.01 AND sf0.1). Integer-moment exactness (the q44 trick) is
    * impossible here: ln(tf) is irrational for tf > 1.
    * Output: idCol, n_tokens, n_distinct, token_entropy (unrounded).
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    tf.groupBy("_id").agg(
        sum(col("tf")).as("_n"),
        count(lit(1)).cast("long").as("n_distinct"),
        sum(col("tf") * log(col("tf"))).as("_slt"))
      .select(col("_id").as(idCol),
        col("_n").cast("long").as("n_tokens"),
        col("n_distinct"),
        (log(col("_n")) - col("_slt") / col("_n")).as("token_entropy"))
  }

  /** Per-token KL(P‖Q) contributions between two corpus slices — the
    * domain-shift / distribution-drift detector of curation pipelines
    * (which tokens make split P read differently from split Q; the same
    * statistic DSIR's importance weights integrate doc-wise, here
    * reported corpus-wise per token). Unigram distributions with add-one
    * smoothing over the UNION vocabulary, so tokens absent from one side
    * are first-class signal, never a division by zero. Plan: each side
    * is one tagged token stream; ONE partial-agg groupBy produces the
    * vocabulary-sized count table (map-side combine absorbs hot tokens);
    * that table materializes once (localCheckpoint) and yields both the
    * three totals (driver scalars — the q16 metadata discipline) and the
    * output rows, each a fixed scalar expression. No total is emitted:
    * a cross-engine float SUM has no deterministic order; downstream
    * sums the per-token terms (31 rows here, |V| in general) when the
    * scalar KL is wanted. Output: token, n_p, n_q, kl_term — the term
    * p·ln(p/q), positive where P over-represents the token.
    */
  def domainShift(p: DataFrame, q: DataFrame, textCol: String): DataFrame = {
    val tp = p.select(explode(tokens(col(textCol))).as("token"),
      lit(1L).as("_inP"), lit(0L).as("_inQ"))
    val tq = q.select(explode(tokens(col(textCol))).as("token"),
      lit(0L).as("_inP"), lit(1L).as("_inQ"))
    val counts = tp.union(tq).groupBy("token")
      .agg(sum("_inP").as("n_p"), sum("_inQ").as("n_q"))
      .eagerPin()
    val totals = counts.agg(count(lit(1)), sum("n_p"), sum("n_q")).head()
    val v = totals.getLong(0)
    if (v == 0) {
      counts.withColumn("kl_term", lit(0.0)).select("token", "n_p", "n_q", "kl_term")
    } else {
      val np = totals.getLong(1)
      val nq = totals.getLong(2)
      val ps = (col("n_p") + lit(1L)).cast("double") / lit((np + v).toDouble)
      val qs = (col("n_q") + lit(1L)).cast("double") / lit((nq + v).toDouble)
      counts.withColumn("_ps", ps).withColumn("_qs", qs)
        .withColumn("kl_term", col("_ps") * log(col("_ps") / col("_qs")))
        .select("token", "n_p", "n_q", "kl_term")
    }
  }

  /** Per-token Jensen–Shannon divergence contributions between two corpus
    * slices — [[domainShift]]'s KL made SYMMETRIC and BOUNDED:
    * JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M) with M = (P+Q)/2, so the total is
    * always ≤ ln 2 and disjoint-support tokens contribute finitely —
    * the property that makes JS the right DRIFT GATE between corpus
    * snapshots (KL explodes to ∞ the moment one side gains a new token,
    * which at 100 TB is every batch; a gate must saturate, not blow up).
    * Same add-one smoothing over the union vocabulary, same plan as
    * domainShift (ONE partial-agg groupBy to the vocabulary-sized count
    * table, totals as driver scalars, every output row a fixed scalar
    * expression — no cross-engine float sum). Output: token, n_p, n_q,
    * js_term = ½(p·ln(p/m) + q·ln(q/m)) ≥ 0; downstream sums |V| terms
    * for the scalar divergence.
    */
  def jsDivergence(p: DataFrame, q: DataFrame, textCol: String): DataFrame = {
    val tp = p.select(explode(tokens(col(textCol))).as("token"),
      lit(1L).as("_inP"), lit(0L).as("_inQ"))
    val tq = q.select(explode(tokens(col(textCol))).as("token"),
      lit(0L).as("_inP"), lit(1L).as("_inQ"))
    val counts = tp.union(tq).groupBy("token")
      .agg(sum("_inP").as("n_p"), sum("_inQ").as("n_q"))
    jsFromCounts(counts)
  }

  /** [[jsDivergence]] from a pre-joined count table (token, n_p, n_q) —
    * the entry point when one side is a STANDING reference vocabulary
    * (the streaming drift gate compares every micro-batch against the
    * same reference counts; re-tokenizing the reference per batch would
    * be corpus-sized work per tick). Same smoothing, same term tree.
    *
    * The counts pin once (the totals job and the term projection share
    * one materialization); batch callers let Bench/Verify's cleanup
    * release it — a PER-TICK caller must manage its own pinning and use
    * [[jsTermsExpr]] directly, or the pinned blocks accumulate across
    * ticks (the streaming gate's round-10 lesson).
    */
  def jsFromCounts(countsIn: DataFrame): DataFrame = {
    val counts = countsIn.eagerPin()
    val totals = counts.agg(count(lit(1)), sum("n_p"), sum("n_q")).head()
    val v = totals.getLong(0)
    if (v == 0) {
      counts.withColumn("js_term", lit(0.0)).select("token", "n_p", "n_q", "js_term")
    } else {
      counts.withColumn("js_term",
          jsTermsExpr(v, totals.getLong(1), totals.getLong(2)))
        .select("token", "n_p", "n_q", "js_term")
    }
  }

  /** The per-token JS term as a pure Column over (n_p, n_q), given the
    * three scalar totals — shared by [[jsFromCounts]] and callers that
    * manage their own materialization (the streaming gate).
    */
  def jsTermsExpr(v: Long, np: Long, nq: Long): org.apache.spark.sql.Column = {
    val ps = (col("n_p") + lit(1L)).cast("double") / lit((np + v).toDouble)
    val qs = (col("n_q") + lit(1L)).cast("double") / lit((nq + v).toDouble)
    val ms = (ps + qs) / 2.0
    (ps * log(ps / ms) + qs * log(qs / ms)) / 2.0
  }

  /** Token count table for a corpus slice: (token, n) — the standing
    * reference side of the streaming JS drift gate, computed ONCE.
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** PPMI co-occurrence scores (Church & Hanks 1990 PMI, positive-clamped
    * as in Levy & Goldberg 2014) — the word-association matrix behind
    * count-based distributional semantics and collocation mining over a
    * training corpus: for every DIRECTED token pair (a before b, within
    * `window` forward positions), ppmi = max(0, ln(c(a,b)·N / (c(a)·c(b))))
    * with c(a)/c(b) the pair table's row/column marginals and N its total.
    *
    * Pair generation is JOIN-FREE and map-side: each position pairs with
    * the next `window` ARRAY ELEMENTS of its own document (a slice of the
    * token array — no positional self-join, no window function), so the
    * only shuffles are vocabulary-bounded partial aggregations: the pair
    * count, two marginals, and two vocab-keyed joins to stitch them. N
    * enters as a driver scalar (the t18 discipline). All counts are exact
    * longs; ppmi is one fixed double expression (products in the double
    * domain — no long overflow at any corpus size) — externally
    * replayable. `minPairCount` prunes the hapax tail AFTER marginals are
    * taken (marginals must see every pair). Output: token_a, token_b,
    * n_pair, ppmi.
    */
  def ppmi(df: DataFrame, textCol: String, window: Int,
      minPairCount: Long = 1L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val pairs = df.select(tokens(col(textCol)).as("_t"))
      .select(posexplode(col("_t")).as(Seq("_i", "token_a")), col("_t"))
      .select(col("token_a"),
        explode(slice(col("_t"), col("_i") + 2, lit(window))).as("token_b"))
    val c = pairs.groupBy("token_a", "token_b")
      .agg(count(lit(1)).as("n_pair"))
      .eagerPin()
    val nRow = c.agg(sum("n_pair")).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0) // empty corpus: no pairs
    val ca = c.groupBy("token_a").agg(sum("n_pair").as("_ca"))
    val cb = c.groupBy("token_b").agg(sum("n_pair").as("_cb"))
    c.join(ca, "token_a").join(cb, "token_b")
      .filter(col("n_pair") >= minPairCount)
      .select(col("token_a"), col("token_b"), col("n_pair"),
        greatest(lit(0.0),
          log(col("n_pair").cast("double") * lit(n.toDouble) /
            (col("_ca").cast("double") * col("_cb").cast("double"))))
          .as("ppmi"))
  }

  /** Per-token burstiness across the corpus — the variance-to-mean ratio
    * (index of dispersion) of per-document counts, zeros included: VMR ≈ 1
    * is Poisson scatter (function words), VMR ≫ 1 is bursty (content /
    * topical words that cluster in few docs), the classic
    * Church–Gale-style signal for stopword vs keyword separation that
    * t16's idf alone can't give (idf sees presence, not clumping).
    * CROSS-ENGINE determinism by the q44/q52 discipline: per-(doc, token)
    * counts are exact longs, the token-level moments k, Σc, Σc² exact
    * long sums (absent docs contribute zero to each, so only N — a
    * driver scalar / oracle scalar subquery, the t18 pattern — carries
    * the zeros), and mean/VMR are one fixed double expression tree:
    * μ = Σc/N, VMR = (Σc²/N − μ²)/μ. Two partial-agg shuffles ((doc,
    * token) then token — hot tokens combine map-side), vocabulary-sized
    * output, no window. Docs with null text vanish in the explode but
    * count toward N — they are real zero-count observations.
    * Output: token, n_docs, total, mean, vmr.
    */
  def tokenBurstiness(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    val tf = df.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("_id", "token").agg(count(lit(1)).cast("long").as("_c"))
    val nd = lit(n.toDouble)
    val mean = col("total").cast("double") / nd
    tf.groupBy("token").agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("_c")).cast("long").as("total"),
        sum(col("_c") * col("_c")).cast("long").as("_ss"))
      .filter(col("total") > 0)
      .withColumn("mean", mean)
      .withColumn("vmr",
        (col("_ss").cast("double") / nd - col("mean") * col("mean")) / col("mean"))
      .select("token", "n_docs", "total", "mean", "vmr")
  }

  /** Token count + distinct 3-gram shingle count (one-pass native). */
  def shingleStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    SigX.register(df.sparkSession)
    val toks = tokens(col(textCol))
    df.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      SigX.distinctShingleCount(toks).as("n_shingles"))
  }

  /** DEFLATE compression ratio per document — the C4/RefinedWeb-style
    * junk signal the word-level heuristics miss: machine-generated
    * boilerplate and template spam compress far below natural prose
    * (ratio = deflated bytes / raw UTF-8 bytes; prose ≈ 0.4–0.7,
    * repeated templates → 0.1, random noise → ~1). A Scala UDF is the
    * honest tool here (zlib is imperative byte work, not an expression
    * tree) but the op stays NARROW — one pass, zero shuffle, the UDF cost
    * IS the deflate cost. Empty text defines ratio 1.0 (incompressible —
    * empties must not look like junk templates). Deterministic for a
    * fixed level on a given JVM (spec-tested; no SQL oracle — DuckDB has
    * no zlib surface). Adds: n_bytes, n_deflated, compression_ratio
    * (4 dp).
    */
  def compressionRatio(df: DataFrame, textCol: String, level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level must be in [1, 9], got $level")
    val deflated = udf { (text: String) =>
      if (text == null) null
      else {
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(level, true)
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](math.max(64, raw.length + raw.length / 2 + 32))
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        d.end()
        Array(raw.length.toLong, total)
      }
    }
    df.withColumn("_z", deflated(col(textCol)))
      .withColumn("n_bytes", element_at(col("_z"), 1))
      .withColumn("n_deflated", element_at(col("_z"), 2))
      .withColumn("compression_ratio",
        when(col("n_bytes") === 0L, lit(1.0))
          .otherwise(Rounding.mirrorRound(
            col("n_deflated").cast("double") / col("n_bytes"), 4)))
      .drop("_z")
  }

  /** Gzip-decompress a binary column (e.g. fetched `.xml.gz` sitemaps or
    * other gzipped payloads that arrive OUTSIDE the WARC layer, which
    * decompresses its own members). Concatenated multi-member streams
    * decode fully (JDK GZIPInputStream walks members). Untrusted-input
    * discipline: output is capped (default 64 MiB) and a stream
    * expanding past the cap FAILS LOUD — a decompression bomb must not
    * OOM an executor; truncated/corrupt streams also throw. Null in →
    * null out. Byte-work UDF exception, like the zlib ratio above.
    */
  def gunzip(c: Column, maxBytes: Int = 64 << 20): Column = {
    require(maxBytes > 0, "maxBytes must be positive")
    val cap = maxBytes
    val f = udf { (b: Array[Byte]) =>
      if (b == null) null
      else {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(b))
        val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 16))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          if (out.size > cap)
            throw new IllegalArgumentException(
              s"gunzip: stream expanded past $cap bytes — refusing (bomb guard)")
          n = in.read(buf)
        }
        in.close()
        out.toByteArray
      }
    }
    f(c)
  }

  /** [[gunzip]] + UTF-8 decode to a string column (malformed bytes →
    * U+FFFD as data, the WARC decode discipline). A binary→string cast
    * would pass invalid byte sequences through UNVALIDATED
    * (UTF8String.fromBytes never replaces), so the decode runs through
    * a CharsetDecoder with REPLACE — the same path as
    * [[graft.sources.WarcShards]]' body decode.
    */
  def gunzipText(c: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) null
      else {
        val d = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        d.decode(java.nio.ByteBuffer.wrap(b)).toString
      }
    }
    f(gunzip(c))
  }
}
