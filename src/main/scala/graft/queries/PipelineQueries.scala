package graft.queries

import graft.operators.Ckpt._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.api.Pipeline
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.operators.TextStages._
import graft.sources.Tables

/** p01 (SURVEY.md §2c P1): a real 3-stage `Stage` pipeline (parse → score →
  * filter) routed through the DuckDB oracle — proving the framework's
  * compile (batching, flatMap filtering, per-partition lifecycle) preserves
  * SQL semantics exactly. The chain is three narrow `mapPartitions`: one
  * scan, zero shuffles before the final deterministic ORDER BY.
  */
object PipelineQueries {

  private val MinTokens = 50L

  val p01 = QueryDef(
    "p01_pipeline_tokens",
    s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |                  length(text) AS n_chars FROM documents)
       |SELECT doc_id, n_tokens, n_chars, ${mr("n_chars*1.0/n_tokens", 4)} AS score
       |FROM t WHERE n_tokens >= $MinTokens ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text")).as[DocRow]
    Pipeline.from(docs)
      .stage(new ParseStage)
      .stage(new ScoreStage)
      .stage(new FilterStage(MinTokens))
      .run()
      .toDF()
      .orderBy("doc_id")
  }

  /** p02: the same stage chain in BATCH mode (persist+count barrier per
    * stage) — the oracle proves mode changes execution, never answers.
    */
  val p02 = QueryDef(
    "p02_pipeline_batch",
    s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |                  length(text) AS n_chars FROM documents)
       |SELECT doc_id, n_tokens, n_chars, ${mr("n_chars*1.0/n_tokens", 4)} AS score
       |FROM t WHERE n_tokens >= $MinTokens ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.api.{ExecutionMode, PipelineConfig}
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text")).as[DocRow]
    val p = Pipeline.from(docs, PipelineConfig(mode = ExecutionMode.Batch))
      .stage(new ParseStage)
      .stage(new ScoreStage)
      .stage(new FilterStage(MinTokens))
    val out = p.run().toDF().orderBy("doc_id")
    // the barriers already ran (Batch is eager); release the result cache
    // so this long-lived session doesn't accumulate it — the consumer
    // recomputes lazily like any other query
    p.unpersistResult()
    out
  }

  private val MinCurTokens = 30L  // quality gate: minimum tokens
  private val MaxDupFrac = 0.6    // quality gate: max duplicate-word fraction
  // (the synthetic corpus repeats a small vocab: median dup_word_frac ~0.54)

  /** p03: the reference's whole use-case end-to-end as ONE verified query —
    * normalize (t08) → repetition-quality gate (t10) → exact dedup on the
    * normalized text (d01) → temperature mixing by language (q29) →
    * shuffle-to-shards (q30), each stage consuming the previous stage's
    * output (the mixing rates come from POST-filter, POST-dedup counts).
    * Proves the operator surface composes: the oracle chains the same five
    * mirrors over one CTE pipeline. All narrow/window/broadcast shapes —
    * the only corpus shuffles are the dedup window and the per-shard
    * position windows.
    */
  val p03 = QueryDef(
    "p03_curation_e2e", {
      val scram = (c: String) =>
        s"((${graft.functions.Signatures.sqlPolyHashStr(c)} * 2654435761) % 1000000007)"
      s"""WITH norm AS (SELECT doc_id, lang,
       |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
       |      ' +', ' ', 'g')) AS nt
       |  FROM documents),
       |t AS (SELECT doc_id, lang, nt, string_split(nt, ' ') AS toks FROM norm),
       |wc AS (SELECT doc_id, w, count(*) AS c
       |       FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2),
       |ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS nd
       |       FROM wc GROUP BY 1),
       |gated AS (SELECT t.doc_id, t.lang, t.nt, ws.n_tokens
       |          FROM t JOIN ws ON t.doc_id = ws.doc_id
       |          WHERE ws.n_tokens >= $MinCurTokens
       |            AND ${mr("(ws.n_tokens - ws.nd) * 1.0 / ws.n_tokens", 4)} <= $MaxDupFrac),
       |uniq AS (SELECT doc_id, lang, n_tokens FROM (
       |  SELECT *, min(doc_id) OVER (PARTITION BY md5(lower(trim(nt)))) AS canon
       |  FROM gated) WHERE doc_id = canon),
       |c AS (SELECT lang, count(*) AS n FROM uniq GROUP BY 1),
       |m AS (SELECT min(n) AS nmin FROM c),
       |r AS (SELECT lang,
       |        CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 1000000) AS BIGINT) AS thr
       |      FROM c CROSS JOIN m),
       |k AS (SELECT u.doc_id, u.lang, u.n_tokens,
       |        'cur:' || u.lang || ':' || CAST(u.doc_id AS VARCHAR) AS kk, r.thr
       |      FROM uniq u JOIN r ON u.lang = r.lang),
       |mixed AS (SELECT doc_id, lang, n_tokens FROM k
       |          WHERE ${scram("kk")} % 1000000 < thr),
       |k2 AS (SELECT doc_id, lang, n_tokens,
       |         'cur:ep1:' || CAST(doc_id AS VARCHAR) AS kk FROM mixed),
       |h AS (SELECT doc_id, lang, n_tokens, ${scram("kk")} AS h FROM k2)
       |SELECT doc_id, lang, n_tokens, CAST(h % 8 AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS BIGINT)
       |    AS shard_pos
       |FROM h ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    import graft.operators.{Dedup, Sampling, TextAnalysis}
    val docs = Tables(s, dir, "documents")
    val norm = docs.select(col("doc_id"), col("lang"),
      TextAnalysis.normalizeText(col("text")).as("norm_text"))
    // each stage's preserve=true output feeds the next directly — the
    // whole gate → dedup → mix chain is one plan with no join-backs
    // (repetitionStats is narrow; the dedup window is the only corpus
    // shuffle before the mixer)
    val gated = TextAnalysis.repetitionStats(norm, "doc_id", "norm_text",
        preserve = true)
      .filter(col("n_tokens") >= MinCurTokens && col("dup_word_frac") <= MaxDupFrac)
      .select("doc_id", "lang", "norm_text", "n_tokens")
    // lazy cache: the mixer reads uniq twice (per-language counts for the
    // thresholds, then the admission join) — without it the normalize →
    // gate → dedup chain recomputes per consumer (measured +0.9 s at
    // sf0.1; no eager barrier, the first stage to run populates it)
    val uniq = Dedup.exact(gated, "doc_id", "norm_text", preserve = true)
      .filter(col("keep")).select("doc_id", "lang", "n_tokens")
      .persist()
    val mixed = Sampling.temperatureSample(uniq, "doc_id", "lang",
      alpha = 0.5, salt = "cur:")
    Sampling.shuffleShards(mixed, "doc_id", shards = 8, salt = "cur:ep1:")
      .select("doc_id", "lang", "n_tokens", "shard", "shard_pos")
      .orderBy("doc_id")
  }

  private val P4SpanN = 8        // duplicated-span window (q31)
  private val P4MaxDupFrac = 0.5 // scrub gate: max duplicated-token fraction
  private val P4Dim = 4096       // classifier + DSIR hashed-feature buckets
  private val P4TargetPct = 10   // DSIR target split (%)

  /** p04: the ROUND-5 curation stack end-to-end as one verified query —
    * duplicated-span scrub (q31) with a dup-fraction gate, model-based
    * quality filtering (t12's hashed linear classifier) over the SCRUBBED
    * text, then DSIR importance weighting (q32) of the survivors against
    * a deterministic target split. Each stage consumes the previous
    * stage's output; the oracle chains the same three mirrors as one CTE
    * pipeline, so scrub coverage, classifier scores, and importance
    * weights all match bit for bit through the composition.
    */
  val p04 = QueryDef(
    "p04_curation_scrubbed", {
      val Sg = graft.functions.Signatures
      val scram = (c: String) => s"((${Sg.sqlPolyHashStr(c)} * 2654435761) % 1000000007)"
      val f1 = Sg.sqlSpanFold("th", "s", P4SpanN, Sg.B)
      val f2 = Sg.sqlSpanFold("th", "s", P4SpanN, Sg.B2)
      val uni = s"x * 2654435761 % 1000000007 % $P4Dim"
      val bi = s"((th2[i] * ${Sg.B} + th2[i+1]) % 1000000007) * 2654435761 % 1000000007 % $P4Dim"
      s"""WITH t0 AS (SELECT doc_id, ${Sg.sqlToks} AS toks FROM documents),
         |h0 AS (SELECT doc_id, toks, ${Sg.sqlTokenHashes("toks")} AS th FROM t0),
         |g0 AS (SELECT doc_id, unnest(range(0, len(th) - $P4SpanN + 1)) AS s, th FROM h0),
         |g AS (SELECT doc_id, s, $f1 AS h1, $f2 AS h2 FROM g0),
         |dupg AS (SELECT h1, h2 FROM g GROUP BY h1, h2 HAVING count(*) >= 2),
         |dsx AS (SELECT DISTINCT g.doc_id, g.s FROM g JOIN dupg USING (h1, h2)),
         |cov AS (SELECT DISTINCT doc_id, p FROM (
         |          SELECT doc_id, unnest(range(s, s + $P4SpanN)) AS p FROM dsx)),
         |cnt AS (SELECT doc_id, count(*) AS c FROM cov GROUP BY 1),
         |tok AS (SELECT doc_id, p, toks[p + 1] AS tk FROM (
         |          SELECT doc_id, unnest(range(0, len(toks))) AS p, toks FROM t0)),
         |unc AS (SELECT k.doc_id, k.p, k.tk FROM tok k
         |        WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                          WHERE c.doc_id = k.doc_id AND c.p = k.p)),
         |scb AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS stext
         |        FROM unc GROUP BY 1),
         |kept1 AS (SELECT t0.doc_id, coalesce(scb.stext, '') AS stext
         |          FROM t0 LEFT JOIN cnt USING (doc_id) LEFT JOIN scb USING (doc_id)
         |          WHERE ${mr("coalesce(cnt.c, 0) * 1.0 / len(toks)", 4)} <= $P4MaxDupFrac),
         |t1 AS (SELECT doc_id, stext, string_split(stext, ' ') AS toks1 FROM kept1),
         |h1 AS (SELECT doc_id, stext, ${Sg.sqlTokenHashes("toks1")} AS th1 FROM t1),
         |s1 AS (SELECT doc_id, stext,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(th1, x ->
         |             (CAST((x * 2654435761 % 1000000007 % $P4Dim + 1)
         |                   * 2654435761 % 1000000007 % 2001 AS BIGINT) - 1000) / 1000.0)),
         |           (a, b) -> a + b) / len(th1) AS sc
         |       FROM h1),
         |kept2 AS (SELECT doc_id, stext, ${mr("sc", 6)} AS score FROM s1
         |          WHERE ${mr("sc", 6)} > 0),
         |k3 AS (SELECT doc_id, stext, score,
         |         'p4:' || CAST(doc_id AS VARCHAR) AS kk FROM kept2),
         |m2 AS (SELECT doc_id, stext, score,
         |         ${scram("kk")} % 100 < $P4TargetPct AS is_t
         |       FROM k3),
         |t2 AS (SELECT doc_id, is_t, string_split(stext, ' ') AS toks2 FROM m2),
         |h2 AS (SELECT doc_id, is_t, ${Sg.sqlTokenHashes("toks2")} AS th2 FROM t2),
         |f AS (SELECT doc_id, is_t,
         |        unnest(list_transform(th2, x -> $uni)) AS bucket FROM h2
         |      UNION ALL
         |      SELECT doc_id, is_t,
         |        unnest(list_transform(range(1, len(th2)), i -> $bi)) AS bucket FROM h2),
         |tc AS (SELECT bucket, count(*) AS ct FROM f WHERE is_t GROUP BY 1),
         |rc AS (SELECT bucket, count(*) AS cr FROM f WHERE NOT is_t GROUP BY 1),
         |tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tc) AS tt,
         |               (SELECT coalesce(sum(cr), 0) FROM rc) AS rt),
         |ratio AS (SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
         |            ln(coalesce(ct, 0) + 1.0) - ln(tt + $P4Dim)
         |            - ln(coalesce(cr, 0) + 1.0) + ln(rt + $P4Dim) AS lr
         |          FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket
         |          CROSS JOIN tot),
         |sd AS (SELECT f.doc_id, count(*) AS n_feats, sum(r.lr) AS lw
         |       FROM f JOIN ratio r USING (bucket)
         |       WHERE NOT f.is_t GROUP BY 1)
         |SELECT sd.doc_id, m2.score, CAST(sd.n_feats AS BIGINT) AS n_feats,
         |  ${mr("sd.lw", 4)} AS logw
         |FROM sd JOIN m2 ON sd.doc_id = m2.doc_id
         |ORDER BY sd.doc_id""".stripMargin
    }) { (s, dir) =>
    import graft.operators.{Dedup, Sampling, TextAnalysis}
    graft.functions.GraftExpressions.register(s)
    val docs = Tables(s, dir, "documents")
    val scr = Dedup.spanScrub(docs, "doc_id", "text", n = P4SpanN, minCount = 2)
    val kept1 = scr.filter(col("dup_frac") <= P4MaxDupFrac)
      .select(col("doc_id"), col("scrubbed").as("stext"))
    // the classifier is a narrow score over kept1 (preserve=true keeps
    // stext riding along — no self-join-back); the scrub+classifier
    // subtree still feeds FOUR consumers downstream (DSIR's two corpus
    // distributions, its scoring pass, and the final score join), so it
    // caches LAZILY — reuse without an eager materialization barrier
    // (the localCheckpoint it replaces was one of the sequential jobs
    // behind p04's driver-run 2x-gate breach, VERDICT r12)
    val kept2 = TextAnalysis.hashClassifier(kept1, "doc_id", "stext",
        dim = P4Dim, preserve = true)
      .filter(col("label")).select("doc_id", "stext", "score")
      .persist()
    val isT = Sampling.hashBucket(col("doc_id"), 100, "p4:") < P4TargetPct
    Sampling.dsirWeights(kept2.filter(!isT), kept2.filter(isT),
        "doc_id", "stext", dim = P4Dim)
      .join(kept2.select("doc_id", "score"), "doc_id")
      .select(col("doc_id"), col("score"), col("n_feats"), col("logw"))
      .orderBy("doc_id")
  }

  /** p05: behavior-analytics stack END-TO-END as one verified query —
    * the events-domain counterpart of p03/p04's curation stacks:
    * gap-sessionize (q11) → per-SESSION rollup (events, duration,
    * converted = any purchase) → per-user summary (session count,
    * converted sessions, mean session duration). The oracle chains the
    * same three stages as CTEs (the sessionize CTE is q11's, verbatim
    * semantics). One shuffle on the user for the windows, two partial
    * aggs above it; mean duration is an avg of small exact longs (IEEE-
    * deterministic cross-engine).
    */
  val p05 = QueryDef(
    "p05_behavior_e2e",
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
       |           FROM events),
       |m AS (SELECT user_id, event_id, event_type, tms,
       |  CASE WHEN lag(tms) OVER w IS NULL
       |         OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
       |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
       |        ROWS UNBOUNDED PRECEDING) AS sid FROM m),
       |per AS (SELECT user_id, sid, count(*) AS n_ev,
       |          max(tms) - min(tms) AS dur,
       |          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       |        FROM s GROUP BY user_id, sid)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       |  CAST(sum(n_ev) AS BIGINT) AS n_events,
       |  CAST(sum(conv) AS BIGINT) AS converted_sessions,
       |  ${mr("avg(dur)", 4)} AS mean_duration_ms
       |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val e = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), unix_millis(col("ts")).as("tms"))
    val sess = graft.operators.Relational.sessionize(
      e, "user_id", col("tms"), col("event_id"), gapMillis = 1800000L)
    val per = sess.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col("tms")) - min(col("tms"))).as("dur"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    per.groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_sessions"),
        sum(col("n_ev")).cast("long").as("n_events"),
        sum(col("conv")).cast("long").as("converted_sessions"),
        Rounding.mirrorRound(avg(col("dur")), 4).as("mean_duration_ms"))
      .orderBy("user_id")
  }

  private val WSelN = 150
  // t03's quality formula, verbatim (the Spark side routes through
  // TextAnalysis.qualityScore, which mirror-rounds quality to 4 dp —
  // the weight both engines then agree on bit for bit)
  private val duckT = "string_split(text, ' ')"
  private val duckQuality =
    s"""0.6 * (1 - len(list_filter($duckT, t -> t IN ('the','a'))) / len($duckT))
       |    + 0.4 * least((length(text) - len($duckT) + 1) / len($duckT) / 8.0, 1.0)""".stripMargin

  /** p06: quality-WEIGHTED corpus selection — the "prefer good documents
    * but keep diversity" sampling step between filtering (throw away the
    * worst) and ranking (keep only the best): t03's quality score
    * becomes the Efraimidis–Spirakis weight (q54 machinery), so
    * inclusion probability rises smoothly with quality while low-quality
    * docs still have a chance — two operators composed in the verified
    * lane, the oracle chaining the same two mirrors as CTEs. Narrow
    * score pass + TakeOrdered selection: zero full shuffles end to end.
    */
  val p06 = QueryDef(
    "p06_weighted_select",
    s"""WITH q AS (SELECT doc_id, ${mr(duckQuality, 4)} AS quality FROM documents),
       |k AS (SELECT doc_id, quality, 'p6:' || CAST(doc_id AS VARCHAR) AS kk FROM q),
       |b AS (SELECT doc_id, quality,
       |        ln(CAST(((${graft.functions.Signatures.sqlPolyHashStr("kk")}
       |                  * 2654435761) % 1000000007) + 1 AS DOUBLE) / 1000000008.0)
       |          / quality AS wkey
       |      FROM k),
       |top AS (SELECT * FROM b ORDER BY wkey DESC, doc_id LIMIT $WSelN)
       |SELECT doc_id, quality, ${mr("wkey", 8)} AS wkey
       |FROM top ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val scored = graft.operators.TextAnalysis.qualityScore(
      Tables(s, dir, "documents"), "doc_id", "text")
    graft.operators.Sampling.weightedTake(scored.select("doc_id", "quality"),
        "doc_id", col("quality"), n = WSelN, salt = "p6:")
      .withColumn("wkey", Rounding.mirrorRound(col("wkey"), 8))
      .orderBy("doc_id")
  }

  private val P7Chunk = 8    // chunk window (tokens) — small enough that chunk-level dups exist
  private val P7Budget = 64  // pack token budget
  private val P7Shards = 4

  /** p07: the context-window prep chain of pretraining/RAG pipelines as
    * ONE verified query — chunk (t15) → chunk-level exact dedup (d01
    * semantics: keep the min-key copy per distinct chunk text — BINDING
    * on this corpus: 8-token windows repeat across docs, the q31
    * signal) → greedy sequence packing (q22) of the surviving chunks.
    * Chunk key = doc_id·100 + chunk_idx (docs are ≤100 chunks by the
    * t15 bound), so the key stays numeric for the packer and decodes
    * back losslessly for the output. The oracle chains the same three
    * mirrors: the t15 window rebuild, a min-per-text group, and the q22
    * recursive greedy replay — every decision pure integer. `d` is
    * MATERIALIZED by name: DuckDB inlines plain CTEs into the recursive
    * term, re-evaluating the whole string_split chunking chain EVERY
    * iteration — at sf1 that replay spilled >55 GB and never finished;
    * materialized, the recursion probes a computed table and the sf1
    * oracle completes in minutes.
    */
  val p07 = QueryDef(
    "p07_chunk_pack", {
      val Sg = graft.functions.Signatures
      val scram = (c: String) => s"((${Sg.sqlPolyHashStr(c)} * 2654435761) % 1000000007)"
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |       len(string_split(text, ' ')) AS n FROM documents),
         |s AS (SELECT doc_id, toks, n,
         |        unnest(range(0, greatest(n, 1), $P7Chunk)) AS start FROM t),
         |c AS (SELECT doc_id * 100 + CAST(start / $P7Chunk AS BIGINT) AS ck,
         |        CAST(least($P7Chunk, n - start) AS BIGINT) AS nt,
         |        array_to_string(toks[start + 1 : least(start + $P7Chunk, n)], ' ')
         |          AS chunk_text
         |      FROM s),
         |kp AS (SELECT min(ck) AS ck FROM c GROUP BY chunk_text),
         |sv AS (SELECT c.ck, c.nt FROM c JOIN kp USING (ck)),
         |k AS (SELECT ck, 'cp:' || CAST(ck AS VARCHAR) AS kk, nt AS n FROM sv),
         |d AS MATERIALIZED (SELECT ck, ${scram("kk")} % $P7Shards AS shard, n,
         |        row_number() OVER (PARTITION BY ${scram("kk")} % $P7Shards
         |                           ORDER BY ck) AS rn
         |      FROM k),
         |p(shard, rn, ck, n, pack, fill, pos) AS (
         |  SELECT shard, rn, ck, n, CAST(0 AS BIGINT), n, CAST(0 AS BIGINT)
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.shard, d.rn, d.ck, d.n,
         |    CASE WHEN p.fill > 0 AND p.fill + d.n > $P7Budget
         |         THEN p.pack + 1 ELSE p.pack END,
         |    CASE WHEN p.fill > 0 AND p.fill + d.n > $P7Budget
         |         THEN d.n ELSE p.fill + d.n END,
         |    CASE WHEN p.fill > 0 AND p.fill + d.n > $P7Budget
         |         THEN CAST(0 AS BIGINT) ELSE p.pos + 1 END
         |  FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
         |SELECT ck // 100 AS doc_id, ck % 100 AS chunk_idx,
         |  CAST(shard AS BIGINT) AS shard, pack, pos AS pack_pos
         |FROM p ORDER BY doc_id, chunk_idx""".stripMargin
    }) { (s, dir) =>
    val chunks = graft.operators.TextAnalysis.chunkDocs(
      Tables(s, dir, "documents"), "doc_id", "text",
      chunkTokens = P7Chunk, overlap = 0)
    val keyed = chunks.withColumn("ck", col("doc_id") * 100L + col("chunk_idx"))
    val keep = keyed.groupBy("chunk_text").agg(min("ck").as("ck")).select("ck")
    val surv = keyed.join(keep, Seq("ck"), "left_semi")
    graft.operators.Packing.packSequences(
        surv.select(col("ck"), col("n_chunk_tokens")), "ck", "n_chunk_tokens",
        budget = P7Budget, shards = P7Shards, salt = "cp:")
      .select(expr("ck div 100").as("doc_id"), (col("ck") % 100).as("chunk_idx"),
        col("shard"), col("pack"), col("pack_pos"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** p08: point-in-time (feature-store) enrichment END-TO-END — the
    * composition that makes q71's SCD2 intervals USEFUL: lifecycle
    * events (signup/purchase) historize into per-user state intervals
    * ([[graft.operators.Relational.scd2]]), then every behavioral event
    * (view/click/error) is enriched with the state its user was in AT
    * THAT MOMENT plus time-in-state — the leakage-free training-data
    * join (using the CURRENT state would leak the future into features).
    * The as-of step rides q12's union + last(ignoreNulls) window — one
    * shuffle on the user, no range join — keyed by valid_from (unique
    * per user: run starts strictly increase), and interval payloads come
    * back via one equi-join on (user, valid_from). Events before a
    * user's first lifecycle event have no state and are dropped (the
    * q12 inner-asof contract, mirrored by the oracle's EXISTS).
    * ms_in_state is an exact long difference.
    */
  val p08 = QueryDef(
    "p08_point_in_time",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
      |           FROM events),
      |l AS (SELECT * FROM e WHERE event_type IN ('signup', 'purchase')),
      |m AS (SELECT user_id, event_type, tms, event_id,
      |        lag(event_type) OVER wo AS prev, row_number() OVER wo AS rn
      |      FROM l WINDOW wo AS (PARTITION BY user_id ORDER BY tms, event_id)),
      |st AS (SELECT user_id, event_type AS state, tms AS valid_from,
      |         event_id AS eid FROM m
      |       WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
      |f AS (SELECT user_id, event_id, event_type AS fact_type, tms FROM e
      |      WHERE event_type NOT IN ('signup', 'purchase'))
      |SELECT f.event_id, f.user_id, f.fact_type, f.tms,
      |  (SELECT s.state FROM st s
      |   WHERE s.user_id = f.user_id AND s.valid_from <= f.tms
      |   ORDER BY s.valid_from DESC, s.eid DESC LIMIT 1) AS state_at,
      |  f.tms - (SELECT max(s.valid_from) FROM st s
      |           WHERE s.user_id = f.user_id AND s.valid_from <= f.tms)
      |    AS ms_in_state
      |FROM f
      |WHERE EXISTS (SELECT 1 FROM st s
      |              WHERE s.user_id = f.user_id AND s.valid_from <= f.tms)
      |ORDER BY f.event_id""".stripMargin) { (s, dir) =>
    import graft.operators.Relational
    val LifecycleTypes = Seq("signup", "purchase")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tms"))
    // the as-of id is run_seq, NOT valid_from: run_seq is unique per user
    // by construction, while two runs CAN share a valid_from (two
    // lifecycle events in the same millisecond, tie-broken by event_id) —
    // a valid_from-keyed payload join would fan out to both states there.
    // At a tie the asof window's last() picks the max run_seq = the later
    // run in scd2's (valid_from, event_id) order; the oracle mirrors that
    // with ORDER BY valid_from DESC, eid DESC.
    val st = Relational.scd2(
        ev.filter(col("event_type").isin(LifecycleTypes: _*)),
        col("user_id"), col("event_type"), col("tms"), col("event_id"))
      .select(col("entity").as("user_id"), col("state"), col("valid_from"),
        col("run_seq"))
    val facts = ev.filter(!col("event_type").isin(LifecycleTypes: _*))
      .select(col("user_id"), col("event_id"),
        col("event_type").as("fact_type"), col("tms"))
    val asof = Relational.asofJoin(facts, st,
      leftKey = "user_id", rightKey = "user_id",
      leftTs = "tms", rightTs = "valid_from",
      leftId = "event_id", rightId = "run_seq")
    facts.join(asof, "event_id")
      .join(st, Seq("user_id"), "inner")
      .filter(col("asof_run_seq") === col("run_seq"))
      .select(col("event_id"), col("user_id"), col("fact_type"), col("tms"),
        col("state").as("state_at"),
        (col("tms") - col("valid_from")).as("ms_in_state"))
      .orderBy("event_id")
  }

  /** p09 (SURVEY.md §2c): entity resolution end-to-end
    * ([[graft.operators.Dedup.goldenRecord]]) — the master-data
    * golden-record chain in the VERIFIED lane: exact fuzzy name pairs
    * (d12's operator, lossless gram-prefix pruning) → connected
    * components over the NAME graph (d06's machinery — |distinct names|
    * drives every stage, the corpus only joins back at the end) →
    * min-id survivorship per cluster. The oracle pays the quadratic
    * levenshtein join (d12's contract) + the recursive-CTE closure
    * (d06's contract); both stages' semantics are already
    * oracle-pinned individually, this chain pins their COMPOSITION.
    */
  val p09 = QueryDef(
    "p09_golden_record",
    """WITH RECURSIVE names AS (SELECT p_name AS name FROM part
      |  WHERE p_name IS NOT NULL AND length(p_name) > 0 GROUP BY 1),
      |p AS (SELECT a.name AS na, b.name AS nb FROM names a JOIN names b
      |  ON ((length(a.name) < length(b.name))
      |      OR (length(a.name) = length(b.name) AND a.name < b.name))
      |  WHERE levenshtein(a.name, b.name) <= 3),
      |edges AS (SELECT na AS a, nb AS b FROM p UNION SELECT nb, na FROM p),
      |reach(a, b) AS (SELECT a, b FROM edges
      |                UNION
      |                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |comp AS (SELECT a AS name, least(a, min(b)) AS cluster FROM reach GROUP BY a),
      |lab AS (SELECT pt.p_partkey, pt.p_name, coalesce(c.cluster, pt.p_name) AS cl
      |  FROM part pt JOIN names n ON pt.p_name = n.name
      |  LEFT JOIN comp c ON pt.p_name = c.name),
      |canon AS (SELECT cl, CAST(min(p_partkey) AS BIGINT) AS canonical_id
      |  FROM lab GROUP BY 1)
      |SELECT l.p_partkey, l.p_name, c.canonical_id,
      |  l.p_partkey = c.canonical_id AS is_canonical
      |FROM lab l JOIN canon c USING (cl)
      |UNION ALL
      |SELECT p_partkey, p_name, p_partkey AS canonical_id, TRUE AS is_canonical
      |FROM part WHERE p_name IS NULL OR length(p_name) = 0
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    graft.operators.Dedup.goldenRecord(Tables(s, dir, "part"),
        "p_partkey", "p_name", maxDist = 3)
      .orderBy("p_partkey")
  }

  /** p10: the data-MIXER end-to-end — length gate → exact dedup (d01) →
    * per-source token-budget selection (X10, budgets 2000+500·i chars) →
    * epoch upsampling (X11, 1 + (i mod 4)·0.75 epochs), each stage
    * consuming the previous stage's output: budgets select from the
    * POST-dedup corpus, epochs replicate the POST-selection survivors.
    * The round-7 mixer trio proven IN COMPOSITION with the curation
    * operators, not just per-operator: the oracle chains the d01 window,
    * the q102 running-sum window, and the q103 epoch draw as CTEs over
    * one pipeline. Scale shapes unchanged by composition — dedup window
    * on the fingerprint, budget window per source, epoch explode narrow.
    */
  val p10 = QueryDef(
    "p10_mixer_e2e", {
      val scram = (c: String) =>
        s"((${graft.functions.Signatures.sqlPolyHashStr(c)} * 2654435761) % 1000000007)"
      s"""WITH gated AS (SELECT doc_id, source, n_chars, text FROM documents
       |               WHERE n_chars >= 150),
       |uniq AS (SELECT doc_id, source, n_chars FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canon
       |    FROM gated) WHERE doc_id = canon),
       |k AS (SELECT doc_id, source, n_chars,
       |        'pm:' || CAST(doc_id AS VARCHAR) AS kk,
       |        2000 + 500 * CAST(substr(source, 4) AS BIGINT) AS budget
       |      FROM uniq),
       |c AS (SELECT doc_id, source, n_chars, budget,
       |        sum(n_chars) OVER (PARTITION BY source
       |          ORDER BY ${scram("kk")}, doc_id) AS cum
       |      FROM k),
       |sel AS (SELECT doc_id, source FROM c WHERE cum - n_chars < budget),
       |w AS (SELECT doc_id, source,
       |        1000 + (CAST(substr(source, 4) AS BIGINT) % 4) * 750 AS permille
       |      FROM sel),
       |e(epoch) AS (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)),
       |x AS (SELECT doc_id, source, epoch, permille // 1000 AS eFull,
       |        permille % 1000 AS frac,
       |        'pm:ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR) AS kk
       |      FROM w JOIN e ON epoch <= permille // 1000)
       |SELECT doc_id, source, epoch FROM x
       |WHERE epoch < eFull OR ${scram("kk")} % 1000 < frac
       |ORDER BY doc_id, epoch""".stripMargin
    }) { (s, dir) =>
    import graft.operators.{Dedup, Sampling}
    val docs = Tables(s, dir, "documents")
    val gated = docs.filter(col("n_chars") >= 150)
    // dedup with preserve=true (no join-back), EAGERLY checkpointed: the
    // takeToBudget histogram/admission/edge consumers re-read this narrow
    // 3-column table; measured at sf0.1 the eager materialization beats a
    // lazy .persist() 2x (the columnar cache build inside the histogram
    // job costs more than a dedicated checkpoint job) - r13 p10 gate fix
    val uniq = Dedup.exact(gated, "doc_id", "text", preserve = true)
      .filter(col("keep")).select("doc_id", "source", "n_chars")
      .eagerPin()
    val budgets = (0 until 20).map(i => s"src$i" -> (2000L + 500L * i)).toMap
    val sel = Sampling.takeToBudget(uniq, "source", "n_chars", "doc_id",
      budgets, salt = "pm:")
    val epochs = (0 until 20).map(i => s"src$i" -> (1000L + (i % 4) * 750L)).toMap
    Sampling.epochMix(sel, "source", "doc_id", epochs, salt = "pm:")
      .select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")
  }

  /** p11: the FULL mixer — p10's chain (gate → d01 dedup → X10 budget →
    * X11 epochs) with the schedule axis composed on top: a 3-phase
    * X12 anneal over the post-epoch corpus (start permille 1000−(i%5)·150
    * annealing to 250+(i%4)·250 — high-quality sources anneal UP, commons
    * DOWN, the midtraining-schedule shape). The anneal keys on
    * (doc_id, epoch) — each epoch copy draws its own phase membership —
    * and the oracle chains all four operators' CTEs plus the phase
    * cross-join and the non-negative-numerator integer interpolation
    * (Scala truncates toward zero, DuckDB floors; they agree only on
    * non-negative numerators, the X12 contract). Composition adds no new
    * shuffle: the anneal is a broadcast weight table + narrow filter over
    * p10's output, fan-out ≤ phases.
    */
  val p11 = QueryDef(
    "p11_mixer_anneal_e2e", {
      val scram = (c: String) =>
        s"((${graft.functions.Signatures.sqlPolyHashStr(c)} * 2654435761) % 1000000007)"
      s"""WITH gated AS (SELECT doc_id, source, n_chars, text FROM documents
       |               WHERE n_chars >= 150),
       |uniq AS (SELECT doc_id, source, n_chars FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canon
       |    FROM gated) WHERE doc_id = canon),
       |k AS (SELECT doc_id, source, n_chars,
       |        'pm:' || CAST(doc_id AS VARCHAR) AS kk,
       |        2000 + 500 * CAST(substr(source, 4) AS BIGINT) AS budget
       |      FROM uniq),
       |c AS (SELECT doc_id, source, n_chars, budget,
       |        sum(n_chars) OVER (PARTITION BY source
       |          ORDER BY ${scram("kk")}, doc_id) AS cum
       |      FROM k),
       |sel AS (SELECT doc_id, source FROM c WHERE cum - n_chars < budget),
       |w AS (SELECT doc_id, source,
       |        1000 + (CAST(substr(source, 4) AS BIGINT) % 4) * 750 AS permille
       |      FROM sel),
       |e(epoch) AS (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)),
       |x AS (SELECT doc_id, source, epoch, permille // 1000 AS eFull,
       |        permille % 1000 AS frac,
       |        'pm:ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR) AS kk
       |      FROM w JOIN e ON epoch <= permille // 1000),
       |mix AS (SELECT doc_id, source, epoch FROM x
       |        WHERE epoch < eFull OR ${scram("kk")} % 1000 < frac),
       |ph(phase) AS (VALUES (CAST(0 AS BIGINT)), (1), (2)),
       |aw AS (SELECT m.doc_id, m.source, m.epoch, ph.phase,
       |        ((1000 - (CAST(substr(m.source, 4) AS BIGINT) % 5) * 150)
       |           * (2 - ph.phase)
       |         + (250 + (CAST(substr(m.source, 4) AS BIGINT) % 4) * 250)
       |           * ph.phase) // 2 AS permille,
       |        'an:ph' || CAST(ph.phase AS VARCHAR) || ':' ||
       |          CAST(m.doc_id AS VARCHAR) || ':' ||
       |          CAST(m.epoch AS VARCHAR) AS hk
       |      FROM mix m CROSS JOIN ph)
       |SELECT doc_id, source, epoch, phase FROM aw
       |WHERE ${scram("hk")} % 1000 < permille
       |ORDER BY doc_id, epoch, phase""".stripMargin
    }) { (s, dir) =>
    import graft.operators.{Dedup, Sampling}
    val docs = Tables(s, dir, "documents")
    val gated = docs.filter(col("n_chars") >= 150)
    val uniq = Dedup.exact(gated, "doc_id", "text", preserve = true)
      .filter(col("keep")).select("doc_id", "source", "n_chars")
      .eagerPin() // see p10
    val budgets = (0 until 20).map(i => s"src$i" -> (2000L + 500L * i)).toMap
    val sel = Sampling.takeToBudget(uniq, "source", "n_chars", "doc_id",
      budgets, salt = "pm:")
    val epochs = (0 until 20).map(i => s"src$i" -> (1000L + (i % 4) * 750L)).toMap
    val mixed = Sampling.epochMix(sel, "source", "doc_id", epochs, salt = "pm:")
      .withColumn("mk", concat(col("doc_id").cast("string"), lit(":"),
        col("epoch").cast("string")))
    val start = (0 until 20).map(i => s"src$i" -> (1000L - (i % 5) * 150L)).toMap
    val end = (0 until 20).map(i => s"src$i" -> (250L + (i % 4) * 250L)).toMap
    Sampling.annealMix(mixed, "source", "mk", start, end, phases = 3, salt = "an:")
      .select("doc_id", "source", "epoch", "phase")
      .orderBy("doc_id", "epoch", "phase")
  }

  /** p12: the crawl-frontier composition — candidate URLs minus the
    * already-crawled set (anti join), gated by T27 `Robots.admit` (RFC
    * 9309 longest-match with Allow winning ties, `*`/`$` wildcard rules,
    * and the group-preference rule: hosts with a graftbot group IGNORE
    * their `*` group entirely), then capped per host (politeness). The
    * oracle mirrors admission with an integer argmax (`len*2+allow` —
    * length dominates, the allow bit breaks exact ties) over the same
    * rule table, pinning the operator's struct-argmax lambda against an
    * independent SQL encoding. URLs/rules derive deterministically from
    * `documents` (host per source; `.pdf` every 7th doc; even-numbered
    * hosts get a graftbot-only group), so the three-way interaction —
    * `/zh/doc1` allow (len 8) beating both `/zh/` (4) and the `$`-anchored
    * pdf disallow (7), but only on hosts whose `*` group applies — is
    * all exercised. Scale shape: admission is ONE host-keyed join of the
    * URL stream against per-host rule arrays (no per-URL groupBy); the
    * per-host cap is a window whose partition is the natural politeness
    * unit.
    */
  private val RobotsFrontierSql =
    """WITH u0 AS (SELECT doc_id, source || '.example' AS host,
      |        '/' || lang || '/doc' || CAST(doc_id AS VARCHAR) ||
      |          CASE WHEN doc_id % 7 = 0 THEN '.pdf' ELSE '.html' END AS path
      |      FROM documents),
      |u AS (SELECT doc_id, host, path, 'https://' || host || path AS url
      |      FROM u0 WHERE doc_id % 5 <> 0),
      |h AS (SELECT DISTINCT source || '.example' AS host,
      |        CAST(substr(source, 4) AS BIGINT) AS srcn FROM documents),
      |rules AS (
      |  SELECT host, '*' AS agent, FALSE AS allow, '/zh/' AS path,
      |         CAST(NULL AS VARCHAR) AS rx, 4 AS len FROM h
      |  UNION ALL SELECT host, '*', TRUE, '/zh/doc1', NULL, 8 FROM h
      |  UNION ALL SELECT host, '*', FALSE, '/*.pdf$', '^/.*\.pdf$', 7 FROM h
      |  UNION ALL SELECT host, 'graftbot', FALSE, '/fr/', NULL, 4 FROM h
      |    WHERE srcn % 2 = 0),
      |sel AS (SELECT r.* FROM rules r JOIN (
      |    SELECT host, max(CASE WHEN agent = 'graftbot' THEN 1 ELSE 0 END) AS he
      |    FROM rules GROUP BY host) g ON r.host = g.host
      |  WHERE (CASE WHEN r.agent = 'graftbot' THEN 1 ELSE 0 END) = g.he),
      |m AS (SELECT u.url, u.host, u.doc_id,
      |        max(CASE WHEN r.path IS NULL THEN NULL
      |             ELSE r.len * 2 + CASE WHEN r.allow THEN 1 ELSE 0 END END) AS code
      |      FROM u LEFT JOIN sel r ON u.host = r.host AND
      |        (CASE WHEN r.rx IS NOT NULL THEN regexp_matches(u.path, r.rx)
      |              ELSE starts_with(u.path, r.path) END)
      |      GROUP BY u.url, u.host, u.doc_id),
      |ok AS (SELECT host, doc_id, url FROM m WHERE code IS NULL OR code % 2 = 1),
      |top AS (SELECT host, doc_id, url,
      |        row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn FROM ok)
      |SELECT host, doc_id, url FROM top WHERE rn <= 3
      |ORDER BY host, doc_id""".stripMargin

  /** The p12/p15 chain, parameterized by the novelty gate (the only
    * difference between the two registry entries).
    */
  private def robotsFrontier(s: SparkSession, dir: String)(
      novel: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    import graft.operators.Robots
    val docs = Tables(s, dir, "documents")
    val urls = docs
      .withColumn("host", concat(col("source"), lit(".example")))
      .withColumn("url", concat(lit("https://"), col("host"), lit("/"), col("lang"),
        lit("/doc"), col("doc_id").cast("string"),
        when(col("doc_id") % 7 === 0, ".pdf").otherwise(".html")))
      .select("doc_id", "host", "url")
    val crawled = urls.where(col("doc_id") % 5 === 0).select("url")
    val fresh = novel(urls, crawled)
    val hosts = docs.select(col("source")).distinct()
      .withColumn("host", concat(col("source"), lit(".example")))
      .withColumn("srcn", substring(col("source"), 4, 10).cast("long"))
    val star = hosts.select(col("host"), explode(array(
      struct(lit("*").as("agent"), lit(false).as("allow"), lit("/zh/").as("path")),
      struct(lit("*").as("agent"), lit(true).as("allow"), lit("/zh/doc1").as("path")),
      struct(lit("*").as("agent"), lit(false).as("allow"), lit("/*.pdf$").as("path"))))
        .as("r"))
      .select(col("host"), col("r.agent"), col("r.allow"), col("r.path"))
    val bot = hosts.where(col("srcn") % 2 === 0)
      .select(col("host"), lit("graftbot").as("agent"), lit(false).as("allow"),
        lit("/fr/").as("path"))
    val rules = star.unionByName(bot)
      .withColumn("has_wildcard",
        col("path").contains("*").or(col("path").contains("$")))
    val admitted = Robots.admit(fresh, rules, "graftbot").where(col("robots_allowed"))
    val byHost = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("doc_id")
    admitted
      .withColumn("rn", row_number().over(byHost)).where(col("rn") <= 3)
      .select("host", "doc_id", "url").orderBy("host", "doc_id")
  }

  val p12 = QueryDef("p12_robots_frontier", RobotsFrontierSql) { (s, dir) =>
    robotsFrontier(s, dir)((urls, crawled) =>
      urls.join(crawled, Seq("url"), "left_anti"))
  }

  /** p15: p12's chain with the already-crawled anti-join replaced by the
    * D13 bloom-gated novelty gate (`Dedup.frontierNovel`) — the 100 TB
    * shape, where the crawled ledger is corpus-sized and must collapse
    * into a broadcast bloom instead of shuffling at every frontier tick.
    * fpp = 0.5 ON PURPOSE (the d11 proof pattern): half the batch gets
    * flagged and must survive the exact backstop, so the oracle — the
    * SAME chained SQL as p12, whose novelty step is a plain NOT-IN —
    * only matches if definite ∪ confirmed is EXACTLY the anti-join.
    */
  val p15 = QueryDef("p15_bloom_frontier", RobotsFrontierSql) { (s, dir) =>
    robotsFrontier(s, dir)((urls, crawled) =>
      graft.operators.Dedup.frontierNovel(urls, crawled, "url", fpp = 0.5))
  }

  /** p13: the politeness SCHEDULE over the frontier — per-host fetch
    * waves spaced by the host's `Crawl-delay` directive. Delays come
    * through T27 `Robots.crawlDelays` parsing fabricated robots bodies
    * (so the parse → schedule chain is what's verified): hosts with
    * srcn%4==0 carry NO directive (caller default 500 ms), srcn%5==0
    * hosts add a graftbot-group delay of 10 s that the exact-agent
    * preference must pick over their `*` value, everyone else gets
    * `*`-group (srcn%3+1) s. The oracle recomputes the delay per host
    * from srcn alone — it agrees only if the parser extracted the right
    * number AND picked the right group. Scale shape: delays are
    * |hosts|-row metadata joined once (broadcast); the schedule has a
    * LOOKAHEAD HORIZON (next 5 waves per host) — a politeness sequence
    * is inherently a per-host total order, so an uncapped schedule over
    * the whole frontier would sort 100 TB into |hosts| tasks (the q102
    * trap); capped, Spark plans a WindowGroupLimit that keeps ≤5 rows
    * per host per input partition BEFORE the exchange, so the sort sees
    * ≤ 5·|hosts|·|partitions| rows no matter the corpus size.
    */
  val p13 = QueryDef(
    "p13_frontier_schedule",
    """WITH u AS (SELECT doc_id, source || '.example' AS host,
      |        CAST(substr(source, 4) AS BIGINT) AS srcn,
      |        'https://' || source || '.example/doc' ||
      |          CAST(doc_id AS VARCHAR) AS url
      |      FROM documents),
      |s AS (SELECT doc_id, host, url,
      |        CASE WHEN srcn % 4 = 0 THEN 500
      |             WHEN srcn % 5 = 0 THEN 10000
      |             ELSE 1000 * (srcn % 3 + 1) END AS delay_ms,
      |        row_number() OVER (PARTITION BY host ORDER BY doc_id) AS wave
      |      FROM u)
      |SELECT host, doc_id, url, wave, (wave - 1) * delay_ms AS eta_ms
      |FROM s WHERE wave <= 5 ORDER BY host, doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.Robots
    val docs = Tables(s, dir, "documents")
    val urls = docs
      .withColumn("host", concat(col("source"), lit(".example")))
      .withColumn("url",
        concat(lit("https://"), col("host"), lit("/doc"), col("doc_id").cast("string")))
      .select("doc_id", "host", "url")
    val hosts = docs.select("source").distinct()
      .withColumn("host", concat(col("source"), lit(".example")))
      .withColumn("srcn", substring(col("source"), 4, 10).cast("long"))
    val bodies = hosts.withColumn("body",
      when(col("srcn") % 4 === 0, lit("User-agent: *\nDisallow: /x\n"))
        .otherwise(concat(
          lit("User-agent: *\nCrawl-delay: "),
          (col("srcn") % 3 + 1).cast("string"), lit("\n"),
          when(col("srcn") % 5 === 0,
            lit("\nUser-agent: graftbot\nCrawl-delay: 10\n"))
            .otherwise(lit("")))))
    val delays = Robots.crawlDelays(bodies, "graftbot")
    val byHost = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("doc_id")
    // delays are |hosts|-row metadata — say so, don't leave the 100-TB
    // url side to a sort-merge exchange if stats mis-estimate
    urls.join(broadcast(delays), Seq("host"), "left")
      .withColumn("delay_ms",
        coalesce((col("crawl_delay_s") * 1000).cast("long"), lit(500L)))
      .withColumn("wave", row_number().over(byHost))
      .where(col("wave") <= 5) // lookahead horizon → WindowGroupLimit
      .select(col("host"), col("doc_id"), col("url"), col("wave"),
        ((col("wave") - 1) * col("delay_ms")).as("eta_ms"))
      .orderBy("host", "doc_id")
  }

  /** p14: the WHOLE crawl frontier as one verified pipeline — p12's
    * admission chain (candidate URLs, anti-join the crawled set, T27
    * robots gate with group preference / longest-match / wildcard rules)
    * feeding p13's politeness schedule (crawlDelays parse with the
    * exact-agent override, default for directive-less hosts, 5-wave
    * lookahead, ETA arithmetic) — the composition a crawler actually
    * runs, against ONE chained oracle. Everything is the proven shapes:
    * broadcast anti-join + broadcast rule-array join + broadcast delay
    * join on the URL side, WindowGroupLimit for the capped wave window.
    */
  val p14 = QueryDef(
    "p14_frontier_e2e",
    """WITH u0 AS (SELECT doc_id, source || '.example' AS host,
      |        CAST(substr(source, 4) AS BIGINT) AS srcn,
      |        '/' || lang || '/doc' || CAST(doc_id AS VARCHAR) ||
      |          CASE WHEN doc_id % 7 = 0 THEN '.pdf' ELSE '.html' END AS path
      |      FROM documents),
      |u AS (SELECT doc_id, host, srcn, path,
      |        'https://' || host || path AS url
      |      FROM u0 WHERE doc_id % 5 <> 0),
      |h AS (SELECT DISTINCT host, srcn FROM u0),
      |rules AS (
      |  SELECT host, '*' AS agent, FALSE AS allow, '/zh/' AS path,
      |         CAST(NULL AS VARCHAR) AS rx, 4 AS len FROM h
      |  UNION ALL SELECT host, '*', TRUE, '/zh/doc1', NULL, 8 FROM h
      |  UNION ALL SELECT host, '*', FALSE, '/*.pdf$', '^/.*\.pdf$', 7 FROM h
      |  UNION ALL SELECT host, 'graftbot', FALSE, '/fr/', NULL, 4 FROM h
      |    WHERE srcn % 2 = 0),
      |sel AS (SELECT r.* FROM rules r JOIN (
      |    SELECT host, max(CASE WHEN agent = 'graftbot' THEN 1 ELSE 0 END) AS he
      |    FROM rules GROUP BY host) g ON r.host = g.host
      |  WHERE (CASE WHEN r.agent = 'graftbot' THEN 1 ELSE 0 END) = g.he),
      |m AS (SELECT u.url, u.host, u.srcn, u.doc_id,
      |        max(CASE WHEN r.path IS NULL THEN NULL
      |             ELSE r.len * 2 + CASE WHEN r.allow THEN 1 ELSE 0 END END) AS code
      |      FROM u LEFT JOIN sel r ON u.host = r.host AND
      |        (CASE WHEN r.rx IS NOT NULL THEN regexp_matches(u.path, r.rx)
      |              ELSE starts_with(u.path, r.path) END)
      |      GROUP BY u.url, u.host, u.srcn, u.doc_id),
      |ok AS (SELECT host, srcn, doc_id, url FROM m
      |       WHERE code IS NULL OR code % 2 = 1),
      |s AS (SELECT host, doc_id, url,
      |        CASE WHEN srcn % 4 = 0 THEN 500
      |             WHEN srcn % 5 = 0 THEN 10000
      |             ELSE 1000 * (srcn % 3 + 1) END AS delay_ms,
      |        row_number() OVER (PARTITION BY host ORDER BY doc_id) AS wave
      |      FROM ok)
      |SELECT host, doc_id, url, wave, (wave - 1) * delay_ms AS eta_ms
      |FROM s WHERE wave <= 5 ORDER BY host, doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.Robots
    val docs = Tables(s, dir, "documents")
    val urls = docs
      .withColumn("host", concat(col("source"), lit(".example")))
      .withColumn("url", concat(lit("https://"), col("host"), lit("/"), col("lang"),
        lit("/doc"), col("doc_id").cast("string"),
        when(col("doc_id") % 7 === 0, ".pdf").otherwise(".html")))
      .select("doc_id", "host", "url")
    val crawled = urls.where(col("doc_id") % 5 === 0).select("url")
    val fresh = urls.join(crawled, Seq("url"), "left_anti")
    val hosts = docs.select(col("source")).distinct()
      .withColumn("host", concat(col("source"), lit(".example")))
      .withColumn("srcn", substring(col("source"), 4, 10).cast("long"))
    val star = hosts.select(col("host"), explode(array(
      struct(lit("*").as("agent"), lit(false).as("allow"), lit("/zh/").as("path")),
      struct(lit("*").as("agent"), lit(true).as("allow"), lit("/zh/doc1").as("path")),
      struct(lit("*").as("agent"), lit(false).as("allow"), lit("/*.pdf$").as("path"))))
        .as("r"))
      .select(col("host"), col("r.agent"), col("r.allow"), col("r.path"))
    val bot = hosts.where(col("srcn") % 2 === 0)
      .select(col("host"), lit("graftbot").as("agent"), lit(false).as("allow"),
        lit("/fr/").as("path"))
    val rules = star.unionByName(bot)
      .withColumn("has_wildcard",
        col("path").contains("*").or(col("path").contains("$")))
    val admitted = Robots.admit(fresh, rules, "graftbot").where(col("robots_allowed"))
    val bodies = hosts.withColumn("body",
      when(col("srcn") % 4 === 0, lit("User-agent: *\nDisallow: /x\n"))
        .otherwise(concat(
          lit("User-agent: *\nCrawl-delay: "),
          (col("srcn") % 3 + 1).cast("string"), lit("\n"),
          when(col("srcn") % 5 === 0,
            lit("\nUser-agent: graftbot\nCrawl-delay: 10\n"))
            .otherwise(lit("")))))
    val delays = Robots.crawlDelays(bodies, "graftbot")
    val byHost = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("doc_id")
    admitted.join(broadcast(delays), Seq("host"), "left")
      .withColumn("delay_ms",
        coalesce((col("crawl_delay_s") * 1000).cast("long"), lit(500L)))
      .withColumn("wave", row_number().over(byHost))
      .where(col("wave") <= 5)
      .select(col("host"), col("doc_id"), col("url"), col("wave"),
        ((col("wave") - 1) * col("delay_ms")).as("eta_ms"))
      .orderBy("host", "doc_id")
  }

  /** p17: RECRAWL scheduling — the loop a crawler runs FOREVER after the
    * first pass, closing the sitemap arc (T28) the way p13 closed the
    * robots arc: per-host sitemap XML bodies (fabricated from doc_id
    * arithmetic, one `<url><loc/><lastmod/><changefreq/></url>` entry
    * per page) parse through `Sitemaps.urls`, each page's NEXT-DUE date
    * is lastmod + its changefreq interval (daily/weekly/monthly →
    * 1/7/30 days — computed from the PARSED fields, so the XML
    * extraction is what's verified), and the stalest-due-first per-host
    * fetch waves space by the host's `Crawl-delay` (p13's exact robots
    * fabrication + `crawlDelays` parse, exact-agent override included).
    * The oracle regenerates entries from doc_id, replays the due
    * arithmetic, the (due, loc) rank and the delay CASE — agreement
    * requires the sitemap parser, the date arithmetic, the delay
    * parser's group choice, and the wave window to ALL line up.
    * Scale shape: sitemap assembly is one host-keyed agg (bodies are
    * per-host metadata, ≤50k entries by the protocol spec); the parse
    * is a narrow explode; delays broadcast; the 5-wave lookahead keeps
    * the schedule behind a WindowGroupLimit exactly like p13.
    */
  val p17 = QueryDef(
    "p17_recrawl_schedule",
    """WITH u AS (SELECT doc_id, source || '.example' AS host,
      |        CAST(substr(source, 4) AS BIGINT) AS srcn,
      |        'https://' || source || '.example/doc' ||
      |          CAST(doc_id AS VARCHAR) AS loc,
      |        strftime(DATE '2026-01-01' + CAST(doc_id % 365 AS INTEGER),
      |          '%Y-%m-%d') AS lastmod,
      |        CASE doc_id % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
      |          ELSE 'monthly' END AS cf
      |      FROM documents),
      |d AS (SELECT *, CAST(lastmod AS DATE) +
      |        CAST(CASE cf WHEN 'daily' THEN 1 WHEN 'weekly' THEN 7
      |          ELSE 30 END AS INTEGER) AS due
      |      FROM u),
      |s AS (SELECT host, srcn, loc, lastmod, due,
      |        row_number() OVER (PARTITION BY host ORDER BY due, loc) AS wave
      |      FROM d)
      |SELECT host, loc, lastmod, strftime(due, '%Y-%m-%d') AS due, wave,
      |  (wave - 1) * (CASE WHEN srcn % 4 = 0 THEN 500
      |                     WHEN srcn % 5 = 0 THEN 10000
      |                     ELSE 1000 * (srcn % 3 + 1) END) AS eta_ms
      |FROM s WHERE wave <= 5 ORDER BY host, wave, loc""".stripMargin) { (s, dir) =>
    import graft.operators.{Robots, Sitemaps}
    val docs = Tables(s, dir, "documents")
      .withColumn("host", concat(col("source"), lit(".example")))
      .withColumn("loc",
        concat(lit("https://"), col("host"), lit("/doc"), col("doc_id").cast("string")))
      .withColumn("lastmod", date_format(date_add(
        to_date(lit("2026-01-01")), (col("doc_id") % 365).cast("int")), "yyyy-MM-dd"))
      .withColumn("cf", element_at(typedlit(Seq("daily", "weekly", "monthly")),
        (col("doc_id") % 3 + 1).cast("int")))
    val sitemapXml = docs.groupBy("host").agg(concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
      concat_ws("", collect_list(concat(
        lit("<url><loc>"), col("loc"), lit("</loc><lastmod>"), col("lastmod"),
        lit("</lastmod><changefreq>"), col("cf"), lit("</changefreq></url>")))),
      lit("</urlset>")).as("xml"))
    val parsed = Sitemaps.urls(sitemapXml, "xml")
    // p13's robots fabrication verbatim: Crawl-delay parse with the
    // exact-agent override and the directive-less default
    val hosts = docs.select("source").distinct()
      .withColumn("host", concat(col("source"), lit(".example")))
      .withColumn("srcn", substring(col("source"), 4, 10).cast("long"))
    val bodies = hosts.withColumn("body",
      when(col("srcn") % 4 === 0, lit("User-agent: *\nDisallow: /x\n"))
        .otherwise(concat(
          lit("User-agent: *\nCrawl-delay: "),
          (col("srcn") % 3 + 1).cast("string"), lit("\n"),
          when(col("srcn") % 5 === 0,
            lit("\nUser-agent: graftbot\nCrawl-delay: 10\n"))
            .otherwise(lit("")))))
    val delays = Robots.crawlDelays(bodies, "graftbot")
    val due = date_add(to_date(col("lastmod")),
      when(col("changefreq") === "daily", 1)
        .when(col("changefreq") === "weekly", 7).otherwise(30))
    val byHost = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy(col("due"), col("loc"))
    parsed
      .withColumn("due", due)
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("delay_ms",
        coalesce((col("crawl_delay_s") * 1000).cast("long"), lit(500L)))
      .withColumn("wave", row_number().over(byHost))
      .where(col("wave") <= 5) // lookahead horizon → WindowGroupLimit
      .select(col("host"), col("loc"), col("lastmod"),
        date_format(col("due"), "yyyy-MM-dd").as("due"), col("wave"),
        ((col("wave") - 1) * col("delay_ms")).as("eta_ms"))
      .orderBy("host", "wave", "loc")
  }

  /** p18 (round 13): the trained-classifier curation loop END-TO-END —
    * T37's training ([[graft.operators.TextAnalysis.trainHashedPerceptron]]
    * on the t30 80% split) produces the weight artifact, and the EVAL
    * split is gated through T12's SUPPLIED-WEIGHTS inference path
    * (`hashClassifier(weights = ...)`) — the drop-in the T37 row promises,
    * proven as one verified composition: train → model artifact →
    * production inference, the full life of a quality classifier in a
    * curation pipeline. The oracle chains ALL 8 training rounds (the
    * shared t30 CTEs) with the t12 mean-weight scoring (Σ weight(bucket)
    * per token / n_tokens, mirror-rounded 6 dp — weights are integer longs,
    * so the double sums are order-free exact) and the final label gate.
    * Scale shape: training per §2c T37; inference = one broadcast join +
    * partial agg — nothing new shuffles.
    */
  val p18 = QueryDef(
    "p18_trained_curation",
    Text.t30TrainCtes +
      s"""
         |sc AS (SELECT f.doc_id, CAST(sum(f.c) AS BIGINT) AS n_tokens,
         |         ${mr("sum(f.c * coalesce(CAST(w.wt AS DOUBLE), 0)) / CAST(sum(f.c) AS DOUBLE)", 6)} AS score
         |       FROM f LEFT JOIN wa w USING (bucket)
         |       WHERE NOT f.is_tr GROUP BY 1)
         |SELECT doc_id, n_tokens, score FROM sc
         |WHERE score > 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.{Sampling, TextAnalysis}
    graft.functions.GraftExpressions.register(s) // see t30: eager analysis
    val docs = Tables(s, dir, "documents")
    val isTr = Sampling.hashBucket(col("doc_id"), 100, "t30:") < Text.T30TrainPct
    val w = Text.t30TrainedWeights(s, dir)
      .withColumn("weight", col("weight").cast("double"))
    TextAnalysis.hashClassifier(docs.filter(!isTr), "doc_id", "text",
        dim = Text.T30Dim, weights = Some(w))
      .filter(col("label"))
      .select("doc_id", "n_tokens", "score")
      .orderBy("doc_id")
  }

  val queries: Seq[QueryDef] =
    Seq(p01, p02, p03, p04, p05, p06, p07, p08, p09, p10, p11, p12, p13, p14,
      p15, p17, p18)
}
