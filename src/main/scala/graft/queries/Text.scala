package graft.queries

import graft.QueryDef
import graft.functions.Rounding
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.operators.TextAnalysis
import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Verified-query surface for the text-analysis operators (SURVEY.md §2c
  * T1–T5); implementations live in [[graft.operators.TextAnalysis]].
  * All operators are single-pass narrow transformations — at 100 TB they
  * run map-side with zero shuffle (the final ORDER BY exists only for the
  * deterministic oracle compare; production pipelines drop it).
  */
object Text {

  // DuckDB fragments mirrored by the Column helpers in TextFunctions.
  private val duckToks = "string_split(text, ' ')"
  private def duckMarkers(words: Seq[String]) =
    s"len(list_filter($duckToks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  private val langMarkers = TextAnalysis.DefaultLangMarkers

  val t01 = QueryDef(
    "t01_token_stats",
    s"""SELECT doc_id, len($duckToks) AS n_tokens,
       |  length(text) AS n_chars,
       |  ${mr(s"(length(text) - len($duckToks) + 1) / len($duckToks)", 4)} AS mean_wlen
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenStats(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  val t02 = QueryDef(
    "t02_lang_id",
    s"""SELECT doc_id,
       |  ${langMarkers.map { case (l, ws) => s"${duckMarkers(ws)} AS score_$l" }.mkString(",\n  ")},
       |  CASE ${langMarkers.map { case (l, _) =>
             s"WHEN score_$l > 0 AND score_$l >= greatest(${langMarkers.map("score_" + _._1).mkString(",")}) THEN '$l'"
           }.mkString(" ")}
       |    ELSE 'unknown' END AS predicted
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.langId(Tables(s, dir, "documents"), "doc_id", "text", langMarkers)
      .orderBy("doc_id")
  }

  val t03 = QueryDef(
    "t03_quality_score",
    s"""SELECT doc_id,
       |  ${mr(s"${duckMarkers(Seq("the", "a"))} / len($duckToks)", 4)} AS stop_ratio,
       |  ${mr(s"(length(text) - len($duckToks) + 1) / len($duckToks)", 4)} AS mean_wlen,
       |  ${mr(s"""0.6 * (1 - ${duckMarkers(Seq("the", "a"))} / len($duckToks))
       |    + 0.4 * least((length(text) - len($duckToks) + 1) / len($duckToks) / 8.0, 1.0)""", 4)} AS quality
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.qualityScore(Tables(s, dir, "documents"), "doc_id", "text", Seq("the", "a"))
      .orderBy("doc_id")
  }

  val t04 = QueryDef(
    "t04_fingerprint",
    """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(text)+1),
      |    i -> CAST(ascii(text[i]) AS BIGINT))), (acc, c) -> (acc*31 + c) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.fingerprint(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  val t05 = QueryDef(
    "t05_shingles",
    s"""SELECT doc_id, len($duckToks) AS n_tokens,
       |  CASE WHEN len($duckToks) >= 3
       |    THEN len(list_distinct(list_transform(range(1, len($duckToks)-1),
       |           i -> $duckToks[i] || ' ' || $duckToks[i+1] || ' ' || $duckToks[i+2])))
       |    ELSE 0 END AS n_shingles
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.shingleStats(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  private val rePat = TextAnalysis.RegexTokenPattern

  val t06 = QueryDef(
    "t06_regex_tokens",
    s"""WITH r AS (SELECT doc_id, regexp_extract_all(text, '$rePat') AS toks FROM documents)
       |SELECT doc_id, len(toks) AS n_bpe_tokens,
       |  len(list_distinct(toks)) AS n_distinct,
       |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE
       |    ${mr("""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b)
       |      / CAST(len(toks) AS DOUBLE)""", 4)} END AS mean_tok_len
       |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.regexTokenStats(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  val t07 = QueryDef(
    "t07_vocabulary",
    s"""SELECT token, count(*) AS freq
       |FROM (SELECT unnest($duckToks) AS token FROM documents)
       |WHERE length(token) > 0
       |GROUP BY token ORDER BY freq DESC, token LIMIT 50""".stripMargin) { (s, dir) =>
    TextAnalysis.vocabulary(Tables(s, dir, "documents"), "text", 50)
  }

  val t08 = QueryDef(
    "t08_normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |    ' +', ' ', 'g')) AS norm_text
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.normalize(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  private val redactSql = TextAnalysis.DefaultRedactions.foldLeft("text") {
    case (e, (p, r)) => s"regexp_replace($e, '$p', '$r', 'g')"
  }

  val t09 = QueryDef(
    "t09_redact",
    s"""SELECT doc_id, $redactSql AS red_text
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.redact(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** t10: Gopher-style repetition quality signals — the degenerate-
    * boilerplate filters (duplicate-word/bigram fractions, top-word
    * share) a corpus-curation pipeline applies before training.
    */
  val t10 = QueryDef(
    "t10_repetition",
    s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |wc AS (SELECT doc_id, w, count(*) AS c
       |       FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2),
       |ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS nd, max(c) AS top
       |       FROM wc GROUP BY 1),
       |b AS (SELECT doc_id,
       |        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
       |      FROM t)
       |SELECT ws.doc_id, ws.n AS n_tokens,
       |  ${mr("(ws.n - ws.nd) * 1.0 / ws.n", 4)} AS dup_word_frac,
       |  CASE WHEN len(b.bg) = 0 THEN 0.0
       |       ELSE ${mr("(len(b.bg) - len(list_distinct(b.bg))) * 1.0 / len(b.bg)", 4)}
       |  END AS dup_bigram_frac,
       |  ${mr("ws.top * 1.0 / ws.n", 4)} AS top_word_frac
       |FROM ws JOIN b ON ws.doc_id = b.doc_id
       |ORDER BY ws.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.repetitionStats(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** t11: corpus-bigram-LM document scoring (the CCNet perplexity-filter
    * shape): add-one-smoothed P(w2|w1) trained on the corpus itself,
    * mean ln-probability per document. Counts are integers (exact on
    * both engines); the only floats are the final division + ln, whose
    * libm ulp differences sit ~1e-15, far under the 1e-9 gate.
    */
  val t11 = QueryDef(
    "t11_bigram_lm",
    s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |bg0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |          i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b FROM t),
       |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg0),
       |bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |cc AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
       |v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM t)),
       |sc AS (SELECT g.doc_id,
       |         ln((coalesce(bc.c12, 0) + 1.0) / (coalesce(cc.c1, 0) + v.v)) AS lp
       |       FROM bg g LEFT JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2
       |         LEFT JOIN cc ON g.w1 = cc.w1 CROSS JOIN v),
       |agg AS (SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS avg_logp
       |        FROM sc GROUP BY 1)
       |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       |  ${mr("a.avg_logp + 50.0", 6)} - 50.0 AS avg_logp
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    // same latent comparator flake t20 hit at sf0.1: avg(lp) is an
    // order-dependent float and near-dup docs produce near-tied
    // averages whose cross-engine ulp jitter can flip the row sort —
    // mirror-round (shifted positive) so near-ties tie exactly
    TextAnalysis.bigramLm(Tables(s, dir, "documents"), "doc_id", "text")
      .withColumn("avg_logp",
        graft.functions.Rounding.mirrorRound(col("avg_logp") + lit(50.0), 6) - lit(50.0))
      .orderBy("doc_id")
  }

  private val ClsDim = 4096 // hashing-trick feature buckets (t12)

  /** t12: hashed linear classifier (the fastText inference shape) with
    * the derived deterministic weight table — both engines compute the
    * identical token hash → bucket → weight arithmetic and sum in token
    * order, so scores (and labels) are bit-identical.
    */
  val t12 = QueryDef(
    "t12_quality_classifier",
    s"""WITH t AS (SELECT doc_id, ${graft.functions.Signatures.sqlToks} AS toks FROM documents),
       |h AS (SELECT doc_id, toks,
       |        ${graft.functions.Signatures.sqlTokenHashes("toks")} AS th FROM t),
       |w AS (SELECT doc_id, len(toks) AS n,
       |        list_transform(th, x ->
       |          (CAST((x * 2654435761 % 1000000007 % $ClsDim + 1)
       |                * 2654435761 % 1000000007 % 2001 AS BIGINT) - 1000) / 1000.0) AS ws
       |      FROM h),
       |s AS (SELECT doc_id, n,
       |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ws),
       |                    (a, b) -> a + b) / n AS sc
       |      FROM w)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  ${mr("sc", 6)} AS score, ${mr("sc", 6)} > 0 AS label
       |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.hashClassifier(Tables(s, dir, "documents"), "doc_id", "text",
      dim = ClsDim).orderBy("doc_id")
  }

  /** t13: corpus report card — per-language doc/token counts, exact
    * rank-based median doc length, and the exact-dup footprint (the
    * dataset-card numbers a curation run publishes).
    */
  val t13 = QueryDef(
    "t13_corpus_report",
    s"""WITH t AS (SELECT doc_id, lang,
       |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
       |             md5(lower(trim(text))) AS fp FROM documents),
       |k AS (SELECT doc_id, lang, n,
       |        doc_id = min(doc_id) OVER (PARTITION BY fp) AS keep FROM t),
       |r AS (SELECT lang, n, keep,
       |        row_number() OVER (PARTITION BY lang ORDER BY n, doc_id) AS rk,
       |        count(*) OVER (PARTITION BY lang) AS cnt FROM k)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n) AS BIGINT) AS n_tokens,
       |  CAST(max(CASE WHEN rk = CAST(floor((cnt + 1) / 2.0) AS BIGINT)
       |           THEN n END) AS BIGINT) AS median_tokens,
       |  CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
       |  ${mr("sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) * 1.0 / count(*)", 4)}
       |    AS dup_frac
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    TextAnalysis.corpusReport(Tables(s, dir, "documents"), "doc_id", "text", "lang")
      .orderBy("lang")
  }

  // t14 thresholds — tuned so every rule except symbol/alpha BINDS on the
  // synthetic corpus (word counts 10–99, mean wlen 3.7–5.3, stops 0–14);
  // symbol/alpha are trivially-passing here but real gates on web text
  private val GMinWords = 30; private val GMaxWords = 90
  private val GMinWlen = 3.0; private val GMaxWlen = 4.8
  private val GMaxSymbol = 0.1; private val GMinAlpha = 0.8; private val GMinStop = 2

  /** t14: Gopher-rule document filter bundle
    * ([[TextAnalysis.gopherRules]]) — per-rule flags + composite keep;
    * both engines compare the RAW single-division doubles against the
    * same literals, so the booleans are exact.
    */
  val t14 = QueryDef(
    "t14_gopher_rules",
    s"""WITH s AS (SELECT doc_id,
       |  len($duckToks) AS nw,
       |  (length(text) - len($duckToks) + 1) / len($duckToks) AS mw,
       |  len(regexp_extract_all(text, '#|\\.\\.\\.')) / CAST(len($duckToks) AS DOUBLE) AS sym,
       |  len(list_filter($duckToks, t -> regexp_matches(t, '[a-zA-Z]')))
       |    / CAST(len($duckToks) AS DOUBLE) AS alpha,
       |  ${duckMarkers(Seq("the", "a"))} AS ns
       |FROM documents)
       |SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
       |  ${mr("mw", 4)} AS mean_wlen, ${mr("sym", 4)} AS symbol_ratio,
       |  ${mr("alpha", 4)} AS alpha_frac, CAST(ns AS BIGINT) AS n_stop,
       |  (nw >= $GMinWords AND nw <= $GMaxWords) AS r_words,
       |  (mw >= $GMinWlen AND mw <= $GMaxWlen) AS r_wlen,
       |  (sym <= $GMaxSymbol) AS r_symbol,
       |  (alpha >= $GMinAlpha) AS r_alpha,
       |  (ns >= $GMinStop) AS r_stop,
       |  (nw >= $GMinWords AND nw <= $GMaxWords
       |    AND mw >= $GMinWlen AND mw <= $GMaxWlen AND sym <= $GMaxSymbol
       |    AND alpha >= $GMinAlpha AND ns >= $GMinStop) AS keep
       |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.gopherRules(Tables(s, dir, "documents"), "doc_id", "text",
        stopwords = Seq("the", "a"), minWords = GMinWords, maxWords = GMaxWords,
        minMeanWlen = GMinWlen, maxMeanWlen = GMaxWlen,
        maxSymbolRatio = GMaxSymbol, minAlphaFrac = GMinAlpha, minStopwords = GMinStop)
      .orderBy("doc_id")
  }

  private val ChunkTokens = 16
  private val ChunkOverlap = 4
  private val ChunkStep = ChunkTokens - ChunkOverlap

  /** t15: fixed-window chunking with overlap
    * ([[TextAnalysis.chunkDocs]]) — window starts every `step` tokens,
    * tail chunks short, boundary tokens shared by two chunks; the
    * oracle rebuilds the same windows via 1-based inclusive list
    * slicing.
    */
  val t15 = QueryDef(
    "t15_chunking",
    s"""WITH t AS (SELECT doc_id, $duckToks AS toks, len($duckToks) AS n
       |           FROM documents),
       |s AS (SELECT doc_id, toks, n,
       |        unnest(range(0, greatest(n, 1), $ChunkStep)) AS start FROM t)
       |SELECT doc_id, CAST(start / $ChunkStep AS BIGINT) AS chunk_idx,
       |  CAST(least($ChunkTokens, n - start) AS BIGINT) AS n_chunk_tokens,
       |  array_to_string(toks[start + 1 : least(start + $ChunkTokens, n)], ' ')
       |    AS chunk_text
       |FROM s ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
    TextAnalysis.chunkDocs(Tables(s, dir, "documents"), "doc_id", "text",
        chunkTokens = ChunkTokens, overlap = ChunkOverlap)
      .orderBy("doc_id", "chunk_idx")
  }

  private val TfIdfK = 3

  /** t16: top-k keywords per doc by TF-IDF
    * ([[TextAnalysis.tfIdfTopK]]) — one tf aggregation feeds both tf
    * and df (no second corpus scan); ties (same tf, same df → the
    * identical double) break on the term, so the top-k set is
    * total-ordered and engine-independent. The oracle mirrors
    * tf · ln(N/df) with the window ordered by the UNROUNDED score.
    */
  val t16 = QueryDef(
    "t16_tfidf",
    s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       |       FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |s AS (SELECT doc_id, term, tf * ln(n.n / df.df) AS score,
       |        row_number() OVER (PARTITION BY doc_id
       |          ORDER BY tf * ln(n.n / df.df) DESC, term) AS rk
       |      FROM tf JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, term, ${mr("score", 4)} AS tfidf, CAST(rk AS BIGINT) AS rk
       |FROM s WHERE rk <= $TfIdfK ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
    TextAnalysis.tfIdfTopK(Tables(s, dir, "documents"), "doc_id", "text", TfIdfK)
      .withColumn("tfidf", Rounding.mirrorRound(col("tfidf"), 4))
      .orderBy("doc_id", "rk")
  }

  /** t17: token-distribution Shannon entropy
    * ([[TextAnalysis.tokenEntropy]]) — the repetition/diversity quality
    * signal, computed via H = ln(n) − (Σ tf·ln tf)/n so one aggregation
    * over the tf table suffices; the oracle mirrors the identity
    * verbatim (never the p·ln p form, whose extra divisions would
    * change the float ops).
    */
  val t17 = QueryDef(
    "t17_token_entropy",
    s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       |       FROM toks GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_distinct,
       |  ${mr("ln(sum(tf)) - sum(tf * ln(tf)) / sum(tf)", 4)} AS token_entropy
       |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenEntropy(Tables(s, dir, "documents"), "doc_id", "text")
      .withColumn("token_entropy", Rounding.mirrorRound(col("token_entropy"), 4))
      .orderBy("doc_id")
  }

  /** t18: per-token KL(P‖Q) domain-shift contributions between the
    * English and Chinese corpus slices ([[TextAnalysis.domainShift]]) —
    * add-one smoothing over the union vocabulary, totals entering as
    * driver scalars on the Spark side and scalar subqueries in the
    * oracle; each row is a fixed scalar expression (no float sum
    * crosses engines).
    */
  val t18 = QueryDef(
    "t18_domain_shift",
    s"""WITH tp AS (SELECT unnest($duckToks) AS token FROM documents WHERE lang = 'en'),
       |tq AS (SELECT unnest($duckToks) AS token FROM documents WHERE lang = 'zh'),
       |cp AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tp GROUP BY 1),
       |cq AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tq GROUP BY 1),
       |v AS (SELECT token FROM cp UNION SELECT token FROM cq),
       |tot AS (SELECT (SELECT count(*) FROM tp) AS np,
       |               (SELECT count(*) FROM tq) AS nq,
       |               (SELECT count(*) FROM v) AS nv),
       |base AS (SELECT v.token,
       |    CAST(coalesce(cp.n, 0) AS BIGINT) AS n_p,
       |    CAST(coalesce(cq.n, 0) AS BIGINT) AS n_q,
       |    CAST(coalesce(cp.n, 0) + 1 AS DOUBLE) / CAST(tot.np + tot.nv AS DOUBLE) AS ps,
       |    CAST(coalesce(cq.n, 0) + 1 AS DOUBLE) / CAST(tot.nq + tot.nv AS DOUBLE) AS qs
       |  FROM v LEFT JOIN cp USING (token) LEFT JOIN cq USING (token) CROSS JOIN tot)
       |SELECT token, n_p, n_q, ${mr("ps * ln(ps / qs)", 6)} AS kl_term
       |FROM base ORDER BY token""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    TextAnalysis.domainShift(docs.filter(col("lang") === "en"),
        docs.filter(col("lang") === "zh"), "text")
      .withColumn("kl_term", Rounding.mirrorRound(col("kl_term"), 6))
      .orderBy("token")
  }

  /** t19: per-token burstiness (variance-to-mean ratio of per-doc counts,
    * zeros included) via [[graft.operators.TextAnalysis.tokenBurstiness]].
    * All moments are exact integer sums and N enters as a driver scalar /
    * oracle scalar subquery (the t18 pattern), so mean and VMR are fixed
    * double expressions — bit-identical cross-engine, no mirror-round.
    */
  val t19 = QueryDef(
    "t19_burstiness",
    s"""WITH tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, unnest($duckToks) AS token FROM documents)
       |  GROUP BY 1, 2),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
       |s AS (SELECT token, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(c) AS BIGINT) AS total, CAST(sum(c*c) AS BIGINT) AS ss
       |  FROM tf GROUP BY 1),
       |m AS (SELECT token, n_docs, total, ss,
       |  CAST(total AS DOUBLE) / tot.nd AS mean, tot.nd AS nd
       |  FROM s CROSS JOIN tot WHERE total > 0)
       |SELECT token, n_docs, total, mean,
       |  (CAST(ss AS DOUBLE) / nd - mean * mean) / mean AS vmr
       |FROM m ORDER BY token""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenBurstiness(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("token")
  }

  /** t20: stupid-backoff trigram LM scoring
    * ([[graft.operators.TextAnalysis.backoffLm]]) — the model trains on
    * the ENGLISH slice and scores the whole corpus, so all three
    * backoff branches fire on real data (seen trigram / bigram backoff
    * / add-one unigram floor); the branch decision is a null test on
    * exact counts, each ln sees one division, and the literal α chain
    * is mirrored as CAST(0.4 AS DOUBLE) so DuckDB's decimal literals
    * can't change the product.
    */
  val t20 = QueryDef(
    "t20_backoff_lm",
    s"""WITH t AS (SELECT doc_id, lang, $duckToks AS toks FROM documents),
       |rt AS (SELECT toks FROM t WHERE lang = 'en'),
       |rtg0 AS (SELECT unnest(list_transform(range(1, len(toks)-1),
       |           i -> struct_pack(w1 := toks[i], w2 := toks[i+1], w3 := toks[i+2]))) AS g FROM rt),
       |rtg AS (SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM rtg0),
       |rbg0 AS (SELECT unnest(list_transform(range(1, len(toks)),
       |           i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b FROM rt),
       |rbg AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM rbg0),
       |rug AS (SELECT unnest(toks) AS w FROM rt),
       |c123 AS (SELECT w1, w2, w3, count(*) AS c FROM rtg GROUP BY 1, 2, 3),
       |c12 AS (SELECT w1, w2, count(*) AS c FROM rbg GROUP BY 1, 2),
       |c23 AS (SELECT w1 AS w2, w2 AS w3, count(*) AS c FROM rbg GROUP BY 1, 2),
       |uc AS (SELECT w, count(*) AS c FROM rug GROUP BY 1),
       |nv AS (SELECT count(*) AS n, count(DISTINCT w) AS v FROM rug),
       |sg0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)-1),
       |          i -> struct_pack(w1 := toks[i], w2 := toks[i+1], w3 := toks[i+2]))) AS g FROM t),
       |sg AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM sg0),
       |sc AS (SELECT sg.doc_id,
       |         CASE WHEN c123.c IS NOT NULL
       |                THEN ln(CAST(c123.c AS DOUBLE) / CAST(c12.c AS DOUBLE))
       |              WHEN c23.c IS NOT NULL
       |                THEN ln(CAST(0.4 AS DOUBLE) * CAST(c23.c AS DOUBLE)
       |                        / CAST(u2.c AS DOUBLE))
       |              ELSE ln((CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE))
       |                      * (CAST(coalesce(u3.c, 0) AS DOUBLE) + 1.0)
       |                      / (CAST(nv.n AS DOUBLE) + CAST(nv.v AS DOUBLE)))
       |         END AS lp
       |       FROM sg
       |         LEFT JOIN c123 ON sg.w1 = c123.w1 AND sg.w2 = c123.w2 AND sg.w3 = c123.w3
       |         LEFT JOIN c12 ON sg.w1 = c12.w1 AND sg.w2 = c12.w2
       |         LEFT JOIN c23 ON sg.w2 = c23.w2 AND sg.w3 = c23.w3
       |         LEFT JOIN uc u2 ON sg.w2 = u2.w
       |         LEFT JOIN uc u3 ON sg.w3 = u3.w
       |         CROSS JOIN nv),
       |agg AS (SELECT doc_id, count(*) AS n_trigrams, avg(lp) AS avg_logp
       |        FROM sc GROUP BY 1)
       |SELECT d.doc_id, coalesce(a.n_trigrams, 0) AS n_trigrams,
       |  ${mr("a.avg_logp + 50.0", 6)} - 50.0 AS avg_logp
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    // avg(lp) is an order-dependent float sum; near-tied docs can land
    // within an ulp of each other and the cross-engine jitter then flips
    // the COMPARATOR's row sort (doc_id misaligns while every float
    // passes tolerance — observed once at sf0.1). Mirror-round to 6
    // decimals on both sides so such docs tie EXACTLY and the sort falls
    // to doc_id. Shifted by +10 into positive range first: mirrorRound's
    // floor(x·f + 0.5) is only round-half-UP for positives, and avg_logp
    // is bounded below by ln(0.16/(n+v)) — about -16 at sf0.1, -30 even
    // at 100 TB token counts — so +50 keeps it positive everywhere.
    TextAnalysis.backoffLm(docs, "doc_id", "text",
        ref = Some(docs.filter(col("lang") === "en")))
      .withColumn("avg_logp",
        graft.functions.Rounding.mirrorRound(col("avg_logp") + lit(50.0), 6) - lit(50.0))
      .orderBy("doc_id")
  }

  private val Blocked = Seq("slow", "dup", "big", "zzz_absent")

  /** t21: C4-style word-level blocklist gate
    * ([[graft.operators.TextAnalysis.blocklist]]) — token-exact hits,
    * sorted distinct matched terms (the which-gate audit column), keep
    * = zero hits; one narrow codegen projection, no shuffle. The list
    * includes a term absent from the corpus to prove absent entries
    * are inert.
    */
  val t21 = QueryDef(
    "t21_blocklist",
    s"""SELECT doc_id,
       |  CAST(len(list_filter($duckToks, t -> t IN ($duckBlocked))) AS BIGINT) AS n_hits,
       |  coalesce(array_to_string(list_sort(list_distinct(
       |    list_filter($duckToks, t -> t IN ($duckBlocked)))), ','), '') AS matched,
       |  len(list_filter($duckToks, t -> t IN ($duckBlocked))) = 0 AS keep
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.blocklist(Tables(s, dir, "documents"), "doc_id", "text", Blocked)
      .orderBy("doc_id")
  }

  private def duckBlocked = Blocked.map(w => s"'$w'").mkString(", ")

  /** t22: BM25 relevance against a fixed query term set
    * ([[TextAnalysis.bm25Scores]], k1 = 1.5 / b = 0.75 — constants whose
    * derived literals (k1+1 = 2.5, 1−b = 0.25) are EXACT doubles, so
    * both engines fold them identically) — the decontamination /
    * topical-mining retrieval scorer. The oracle restates the whole
    * Okapi expression tree verbatim — idf's +0.5/+1 smoothing, the
    * length normalization against a derived avgdl scalar — over the
    * same tf/df/dl integers; per-doc score sums ≤ |Q| such terms (the
    * t16/t17 float trade, 4 dp mirror-round).
    */
  val BmTerms = Seq("spark", "shuffle", "window", "merge")
  val t22 = QueryDef(
    "t22_bm25",
    s"""WITH stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(len($duckToks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM documents),
       |toks AS (SELECT doc_id, CAST(len($duckToks) AS DOUBLE) AS dl,
       |    unnest($duckToks) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
       |    any_value(dl) AS dl
       |  FROM toks WHERE term IN (${BmTerms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1, 2),
       |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |s AS (SELECT doc_id, dl,
       |    ln((n - df + 0.5) / (df + 0.5) + 1) * (tf * (1.5 + 1)) /
       |      (tf + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl)) AS c
       |  FROM tf JOIN dfq USING (term) CROSS JOIN stats)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS matched_terms,
       |  CAST(any_value(dl) AS BIGINT) AS dl, ${mr("sum(c)", 4)} AS score
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.bm25Scores(Tables(s, dir, "documents"), "doc_id", "text",
        BmTerms, k1 = 1.5, b = 0.75)
      .withColumn("score", Rounding.mirrorRound(col("score"), 4))
      .orderBy("doc_id")
  }

  /** t23: per-token Jensen–Shannon divergence contributions between the
    * English and Chinese slices ([[TextAnalysis.jsDivergence]]) — t18's
    * KL made symmetric and bounded (≤ ln 2 total, finite on disjoint
    * support): the drift gate shape for corpus snapshots, where KL
    * explodes the moment one side gains a new token. Same add-one
    * smoothing, same scalar-totals plan as t18; the oracle restates the
    * ½(p·ln(p/m) + q·ln(q/m)) tree verbatim with m = (p+q)/2 expanded
    * in place (same ops → same doubles).
    */
  val t23 = QueryDef(
    "t23_js_divergence", {
      val m = "((ps + qs) / 2.0)"
      s"""WITH tp AS (SELECT unnest($duckToks) AS token FROM documents WHERE lang = 'en'),
         |tq AS (SELECT unnest($duckToks) AS token FROM documents WHERE lang = 'zh'),
         |cp AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tp GROUP BY 1),
         |cq AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tq GROUP BY 1),
         |v AS (SELECT token FROM cp UNION SELECT token FROM cq),
         |tot AS (SELECT (SELECT count(*) FROM tp) AS np,
         |               (SELECT count(*) FROM tq) AS nq,
         |               (SELECT count(*) FROM v) AS nv),
         |base AS (SELECT v.token,
         |    CAST(coalesce(cp.n, 0) AS BIGINT) AS n_p,
         |    CAST(coalesce(cq.n, 0) AS BIGINT) AS n_q,
         |    CAST(coalesce(cp.n, 0) + 1 AS DOUBLE) / CAST(tot.np + tot.nv AS DOUBLE) AS ps,
         |    CAST(coalesce(cq.n, 0) + 1 AS DOUBLE) / CAST(tot.nq + tot.nv AS DOUBLE) AS qs
         |  FROM v LEFT JOIN cp USING (token) LEFT JOIN cq USING (token) CROSS JOIN tot)
         |SELECT token, n_p, n_q,
         |  ${mr(s"(ps * ln(ps / $m) + qs * ln(qs / $m)) / 2.0", 6)} AS js_term
         |FROM base ORDER BY token""".stripMargin
    }) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    TextAnalysis.jsDivergence(docs.filter(col("lang") === "en"),
        docs.filter(col("lang") === "zh"), "text")
      .withColumn("js_term", Rounding.mirrorRound(col("js_term"), 6))
      .orderBy("token")
  }

  /** t03's composite quality expression, shared verbatim with t24/t25
    * (the score those diagnostics evaluate).
    */
  private def qualitySqlRaw =
    s"""0.6 * (1 - ${duckMarkers(Seq("the", "a"))} / len($duckToks))
       |    + 0.4 * least((length(text) - len($duckToks) + 1) / len($duckToks) / 8.0, 1.0)""".stripMargin

  /** t24: ROC-AUC of the t03 quality score predicting the English slice,
    * per source ([[graft.operators.Relational.aucScore]]) — the
    * evaluation a corpus-scale quality classifier actually gets before
    * it gates anything. AUC IS the Mann–Whitney statistic U/(n₊·n₋)
    * (probability a random positive outranks a random negative, ties ½),
    * so the whole computation is q109's exact integer rank arithmetic
    * plus ONE division — no sampling, no driver-side sklearn, the corpus
    * never leaves the cluster. Scores enter as exact 10⁻⁴ units (t03's
    * own mirror-round), so the tie structure is identical cross-engine.
    */
  val t24 = QueryDef(
    "t24_quality_auc", {
      val auc = mr("CAST(r2a - n_pos * (n_pos + 1) AS DOUBLE) / " +
        "(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))", 6)
      s"""WITH s AS (SELECT source, lang = 'en' AS a,
         |    CAST(floor((${mr(qualitySqlRaw, 4)}) * 10000.0 + 0.5) AS BIGINT) AS v
         |  FROM documents),
         |t AS (SELECT source, v, CAST(count(*) AS BIGINT) AS t,
         |        CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ta
         |      FROM s WHERE a IS NOT NULL AND v IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT t.*, CAST(sum(t) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum
         |      FROM t),
         |g AS (SELECT source,
         |        CAST(sum(ta * (2 * (cum - t + 1) + t - 1)) AS BIGINT) AS r2a,
         |        CAST(sum(ta) AS BIGINT) AS n_pos,
         |        CAST(sum(t - ta) AS BIGINT) AS n_neg
         |      FROM r GROUP BY 1)
         |SELECT source, n_pos, n_neg,
         |  CAST(r2a - n_pos * (n_pos + 1) AS BIGINT) AS u2, $auc AS auc
         |FROM g WHERE n_pos > 0 AND n_neg > 0
         |ORDER BY source""".stripMargin
    }) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val scored = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select("doc_id", "quality")
    val df = docs.select(col("doc_id"), col("source"),
        (col("lang") === "en").as("pos"))
      .join(scored, "doc_id")
    graft.operators.Relational.aucScore(df, Seq("source"), col("pos"),
        col("quality"), scale = 10000L)
      .withColumn("auc", Rounding.mirrorRound(col("auc"), 6))
      .orderBy("source")
  }

  private val CalBins = 5

  /** t25: calibration table of the same score
    * ([[graft.operators.Relational.calibrationBins]]) — the
    * reliability-diagram companion t24's AUC can't answer: per
    * equal-width score bin, row count, mean score, and positive rate.
    * Bins by exact-unit arithmetic (score 1.0 clamps into the top bin);
    * both reported doubles are single divisions of exact longs.
    */
  val t25 = QueryDef(
    "t25_calibration",
    s"""WITH s AS (SELECT lang = 'en' AS a,
       |    CAST(floor((${mr(qualitySqlRaw, 4)}) * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM documents)
       |SELECT least(CAST(floor(v * $CalBins / 10000.0) AS BIGINT), ${CalBins - 1}) AS bin,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(v) AS DOUBLE) / CAST(count(*) * 10000 AS DOUBLE) AS mean_score,
       |  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate
       |FROM s WHERE a IS NOT NULL AND v IS NOT NULL
       |GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val scored = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select("doc_id", "quality")
    val df = docs.select(col("doc_id"), (col("lang") === "en").as("pos"))
      .join(scored, "doc_id")
    graft.operators.Relational.calibrationBins(df, Seq.empty, col("pos"),
        col("quality"), bins = CalBins, scale = 10000L)
      .orderBy("bin")
  }

  private val PpmiWindow = 2
  private val PpmiMinPair = 3L

  /** t26: PPMI co-occurrence ([[TextAnalysis.ppmi]], Church & Hanks PMI,
    * positive-clamped per Levy & Goldberg) — collocation mining over the
    * corpus: directed forward-window pairs, marginals from the pair
    * table itself, N as a driver scalar / oracle scalar subquery. The
    * oracle regenerates pairs with the IDENTICAL slice-window rule
    * (position i pairs with array elements i+1..i+window of its own
    * document — a range cross join, no positional self-join) and
    * replays the one fixed double expression.
    */
  val t26 = QueryDef(
    "t26_ppmi",
    s"""WITH t AS (SELECT $duckToks AS toks FROM documents),
       |p AS (SELECT unnest(flatten(list_transform(range(1, len(toks) + 1),
       |        i -> list_transform(range(1, least($PpmiWindow, len(toks) - i) + 1),
       |          o -> {'a': toks[i], 'b': toks[i + o]})))) AS pr
       |      FROM t),
       |c AS (SELECT pr.a AS token_a, pr.b AS token_b, CAST(count(*) AS BIGINT) AS n_pair
       |      FROM p GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS n FROM c),
       |ca AS (SELECT token_a, CAST(sum(n_pair) AS BIGINT) AS ma FROM c GROUP BY 1),
       |cb AS (SELECT token_b, CAST(sum(n_pair) AS BIGINT) AS mb FROM c GROUP BY 1)
       |SELECT token_a, token_b, n_pair,
       |  ${mr("greatest(0.0, ln(CAST(n_pair AS DOUBLE) * n / " +
            "(CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE))))", 6)} AS ppmi
       |FROM c JOIN ca USING (token_a) JOIN cb USING (token_b) CROSS JOIN tot
       |WHERE n_pair >= $PpmiMinPair
       |ORDER BY token_a, token_b""".stripMargin) { (s, dir) =>
    TextAnalysis.ppmi(Tables(s, dir, "documents"), "text",
        window = PpmiWindow, minPairCount = PpmiMinPair)
      .withColumn("ppmi", Rounding.mirrorRound(col("ppmi"), 6))
      .orderBy("token_a", "token_b")
  }

  /** t27: Cohen's kappa between two quality gates
    * ([[graft.operators.Relational.agreementKappa]]) — do t03's stopword
    * gate and the mean-word-length gate agree beyond chance? The audit a
    * curation pipeline owes any pair of filters before composing them
    * (two gates that agree at κ≈1 are redundant; κ≈0 means they prune
    * DIFFERENT documents and the composite is stricter than either).
    * Both gates are EXACT integer comparisons (10·stops ≥ n_toks;
    * chars−n_toks+1 ≤ 7·n_toks) — no float threshold to flip
    * cross-engine — and the four contingency counts reduce in one
    * partial-agg pass. One row out.
    */
  val t27 = QueryDef(
    "t27_cohen_kappa", {
      val nD = "CAST(n AS DOUBLE)"
      val po = s"(CAST(n - n_a - n_b + 2 * n_both AS DOUBLE) / $nD)"
      val pe = s"((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) + " +
        s"($nD - CAST(n_a AS DOUBLE)) * ($nD - CAST(n_b AS DOUBLE))) / ($nD * $nD))"
      s"""WITH l AS (SELECT
         |    (10 * ${duckMarkers(Seq("the", "a"))} >= len($duckToks)) AS a,
         |    ((length(text) - len($duckToks) + 1) <= 7 * len($duckToks)) AS b
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both
         |  FROM l)
         |SELECT n, n_a, n_b, n_both, ${mr(po, 6)} AS po, ${mr(pe, 6)} AS pe,
         |  ${mr(s"($po - $pe) / (1.0 - $pe)", 6)} AS kappa
         |FROM c WHERE n > 0 AND $pe < 1.0""".stripMargin
    }) { (s, dir) =>
    import graft.functions.TextFunctions
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks).cast("long")
    val stops = size(filter(toks, t => t.isin("the", "a"))).cast("long")
    val labeled = Tables(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select((stops * 10L >= nTok).as("a"),
        (length(col("text")).cast("long") - nTok + 1L <= lit(7L) * nTok).as("b"))
    graft.operators.Relational.agreementKappa(labeled, col("a"), col("b"))
      .select(col("n"), col("n_a"), col("n_b"), col("n_both"),
        Rounding.mirrorRound(col("po"), 6).as("po"),
        Rounding.mirrorRound(col("pe"), 6).as("pe"),
        Rounding.mirrorRound(col("kappa"), 6).as("kappa"))
  }

  /** t28: Zipf-law exponent of the corpus frequency spectrum
    * ([[TextAnalysis.zipfFit]]) — the one-row corpus-health fingerprint
    * next to t07's raw top-k: α ≈ 1 for natural language, flattened by
    * templated/synthetic corpora. Counts exact, rank total (freq desc,
    * token tie-break), the five log-log regression sums folded on an
    * ordered window by rank (the q110 discipline over the vocabulary
    * table — the corpus itself never sorts).
    */
  val t28 = QueryDef(
    "t28_zipf", {
      val dx = "(CAST(m AS DOUBLE) * sxx - sx * sx)"
      val dy = "(CAST(m AS DOUBLE) * syy - sy * sy)"
      val cov = "(CAST(m AS DOUBLE) * sxy - sx * sy)"
      s"""WITH f AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest($duckToks) AS token FROM documents)
         |  WHERE length(token) > 0 GROUP BY 1),
         |r AS (SELECT freq,
         |    CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank,
         |    CAST(count(*) OVER () AS BIGINT) AS n_vocab FROM f),
         |fit AS (SELECT rank, n_vocab, ln(CAST(rank AS DOUBLE)) AS x,
         |        ln(CAST(freq AS DOUBLE)) AS y
         |  FROM r WHERE rank <= 1000),
         |fold AS (SELECT rank, n_vocab, CAST(count(*) OVER () AS BIGINT) AS m,
         |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         |    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
         |    sum(x * y) OVER w AS sxy
         |  FROM fit WINDOW w AS (ORDER BY rank
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT n_vocab, m AS n_fit,
         |  ${mr(s"(0.0 - $cov / $dx)", 6)} AS alpha,
         |  ${mr(s"($cov * $cov / ($dx * $dy))", 6)} AS r2
         |FROM fold WHERE rank = m AND m >= 3 AND $dx > 0.0 AND $dy > 0.0""".stripMargin
    }) { (s, dir) =>
    TextAnalysis.zipfFit(Tables(s, dir, "documents"), "text", maxRanks = 1000)
      .select(col("n_vocab"), col("n_fit"),
        Rounding.mirrorRound(col("alpha"), 6).as("alpha"),
        Rounding.mirrorRound(col("r2"), 6).as("r2"))
  }

  /** t29: Flesch reading-ease per source
    * ([[graft.operators.TextAnalysis.readability]]) — per-document
    * exact integer counts (space-token words; [.!?]+ sentence runs min
    * 1; [aeiouy]+ syllable runs + one per vowel-less word, all via the
    * two-replace length trick — codegen'd Columns, zero shuffle before
    * the agg), long sums per source, the macro Flesch formula ONE fixed
    * double tree.
    */
  val t29 = QueryDef(
    "t29_readability", {
      val w = "CAST(n_words AS DOUBLE)"
      val fre = s"206.835 - 1.015 * ($w / CAST(n_sentences AS DOUBLE))" +
        s" - 84.6 * (CAST(n_syllables AS DOUBLE) / $w)"
      s"""WITH p AS (SELECT source,
         |    CAST(len(list_filter($duckToks, t -> length(t) > 0)) AS BIGINT) AS w,
         |    greatest(CAST(1 AS BIGINT),
         |      CAST(length(regexp_replace(text, '[.!?]+', '#', 'g'))
         |        - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT)) AS s,
         |    CAST(length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
         |      - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT)
         |      + CAST(len(list_filter(string_split(lower(text), ' '),
         |          t -> length(t) > 0 AND NOT regexp_matches(t, '[aeiouy]')))
         |        AS BIGINT) AS y
         |  FROM documents),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(w) AS BIGINT) AS n_words,
         |    CAST(sum(s) AS BIGINT) AS n_sentences,
         |    CAST(sum(y) AS BIGINT) AS n_syllables
         |  FROM p WHERE w > 0 GROUP BY 1)
         |SELECT source, n_docs, n_words, n_sentences, n_syllables,
         |  ${mr(fre, 6)} AS fre
         |FROM g ORDER BY source""".stripMargin
    }) { (s, dir) =>
    TextAnalysis.readability(Tables(s, dir, "documents"), "source", "text")
      .withColumn("fre", Rounding.mirrorRound(col("fre"), 6))
      .orderBy("source")
  }

  private[queries] val T30Dim = 1024
  private[queries] val T30Rounds = 8
  private[queries] val T30TrainPct = 80
  private[queries] val T30PosThr = 0.79 // the corpus quality median — a balanced gate

  /** The t30 training replay as generated CTEs, through the averaged
    * weight table `wa` — shared by t30's own oracle and p18's
    * train→artifact→inference chain. Ends with a trailing comma.
    */
  private[queries] def t30TrainCtes: String = {
    val Sg = graft.functions.Signatures
    val scram = (c: String) => s"((${Sg.sqlPolyHashStr(c)} * 2654435761) % 1000000007)"
    val split = scram("('t30:' || CAST(doc_id AS VARCHAR))")
    val sb = new StringBuilder
    sb.append(
      s"""WITH base AS (SELECT doc_id, ${mr(qualitySqlRaw, 4)} >= $T30PosThr AS pos,
         |    $split % 100 < $T30TrainPct AS is_tr, ${Sg.sqlToks} AS toks
         |  FROM documents),
         |h AS (SELECT doc_id, pos, is_tr, ${Sg.sqlTokenHashes("toks")} AS th FROM base),
         |f AS (SELECT doc_id, pos, is_tr, bucket, CAST(count(*) AS BIGINT) AS c
         |      FROM (SELECT doc_id, pos, is_tr,
         |              unnest(list_transform(th,
         |                x -> x * 2654435761 % 1000000007 % $T30Dim)) AS bucket
         |            FROM h)
         |      GROUP BY 1, 2, 3, 4),
         |w0 AS (SELECT CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS wt
         |       WHERE 1 = 0),""".stripMargin)
    for (r <- 1 to T30Rounds) {
      sb.append(
        s"""
           |m$r AS (SELECT f.doc_id, CASE WHEN f.pos THEN 1 ELSE -1 END AS y,
           |          sum(f.c * coalesce(w.wt, 0)) AS m
           |        FROM f LEFT JOIN w${r - 1} w USING (bucket)
           |        WHERE f.is_tr GROUP BY 1, 2),
           |mis$r AS (SELECT doc_id, y FROM m$r
           |          WHERE (CASE WHEN m > 0 THEN 1 ELSE -1 END) <> y),
           |d$r AS (SELECT f.bucket, sum(x.y * f.c) AS d
           |        FROM f JOIN mis$r x USING (doc_id) GROUP BY 1),
           |w$r AS (SELECT coalesce(w.bucket, d.bucket) AS bucket,
           |          coalesce(w.wt, 0) + coalesce(d.d, 0) AS wt
           |        FROM w${r - 1} w FULL OUTER JOIN d$r d ON w.bucket = d.bucket),""".stripMargin)
    }
    val unionW = (1 to T30Rounds).map(r => s"SELECT * FROM w$r").mkString(" UNION ALL ")
    sb.append(
      s"""
         |wa AS (SELECT bucket, sum(wt) AS wt FROM ($unionW) GROUP BY 1),""".stripMargin)
    sb.toString
  }

  /** The t30 trained weight table (Scala side) — shared by t30 and p18. */
  private[queries] def t30TrainedWeights(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import graft.operators.Sampling
    graft.functions.GraftExpressions.register(s)
    val docs = Tables(s, dir, "documents")
    val isTr = Sampling.hashBucket(col("doc_id"), 100, "t30:") < T30TrainPct
    val pos = TextAnalysis.qualityExpr(col("text")) >= T30PosThr
    TextAnalysis.trainHashedPerceptron(docs.filter(isTr), "doc_id", "text",
      pos, dim = T30Dim, rounds = T30Rounds)
  }

  /** t30 (VERDICT r12 item 6): distributed quality-classifier TRAINING —
    * [[graft.operators.TextAnalysis.trainHashedPerceptron]] learns a
    * hashed linear model on an 80% split (label: the t03 quality gate at
    * the corpus median — stopword mix and token-length mix are exactly
    * the signals unigram counts carry) and the query emits the EVAL
    * split's exact integer margins. The oracle replays ALL THREE training rounds as generated
    * CTEs — margins, misclassified set, per-bucket gradient, weight
    * merge, all integer arithmetic — so a hash match certifies the
    * training loop itself, not just the final scores. The spec lane
    * (DedupOpsSuite) proves the trained table beats t12's deterministic
    * default on eval AUC via the t24 machinery.
    */
  val t30 = QueryDef(
    "t30_train_classifier",
    t30TrainCtes +
      s"""
         |sc AS (SELECT f.doc_id, f.pos,
         |         CAST(sum(f.c * coalesce(w.wt, 0)) AS BIGINT) AS score
         |       FROM f LEFT JOIN wa w USING (bucket)
         |       WHERE NOT f.is_tr GROUP BY 1, 2)
         |SELECT doc_id, pos, score FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.Sampling
    // register BEFORE any DataFrame touches hashBucket: Datasets analyze
    // eagerly at construction, so the split filter below resolves
    // graft_poly_hash immediately (a fresh session running only this
    // query would otherwise throw UNRESOLVED_ROUTINE)
    graft.functions.GraftExpressions.register(s)
    val docs = Tables(s, dir, "documents")
    val pos = TextAnalysis.qualityExpr(col("text")) >= T30PosThr
    val isTr = Sampling.hashBucket(col("doc_id"), 100, "t30:") < T30TrainPct
    TextAnalysis.perceptronScores(docs.filter(!isTr), "doc_id", "text",
        pos, t30TrainedWeights(s, dir), dim = T30Dim)
      .orderBy("doc_id")
  }

  val queries: Seq[QueryDef] =
    Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t12, t13,
      t14, t15, t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27,
      t28, t29, t30)
}
