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

  val queries: Seq[QueryDef] = Seq(p01, p02)
}
