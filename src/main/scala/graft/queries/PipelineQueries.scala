package graft.queries

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
    val rep = TextAnalysis.repetitionStats(norm, "doc_id", "norm_text")
      .select("doc_id", "n_tokens", "dup_word_frac")
    val gated = norm.join(rep, "doc_id")
      .filter(col("n_tokens") >= MinCurTokens && col("dup_word_frac") <= MaxDupFrac)
    val keep = Dedup.exact(gated, "doc_id", "norm_text")
      .filter(col("keep")).select("doc_id")
    val uniq = gated.join(keep, "doc_id")
    val mixed = Sampling.temperatureSample(uniq, "doc_id", "lang",
      alpha = 0.5, salt = "cur:")
    Sampling.shuffleShards(mixed, "doc_id", shards = 8, salt = "cur:ep1:")
      .select("doc_id", "lang", "n_tokens", "shard", "shard_pos")
      .orderBy("doc_id")
  }

  val queries: Seq[QueryDef] = Seq(p01, p02, p03)
}
