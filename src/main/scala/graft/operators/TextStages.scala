package graft.operators

import graft.api.Stage

/** Document-processing stages used by the p01 pipeline query: the classic
  * parse → score → filter shape of an LLM-data curation pipeline, expressed
  * as reference-style stages (setup/process/batchSize) but compiled to a
  * single narrow Spark chain by graft.api.Pipeline.
  *
  * Semantics deliberately mirror plain SQL (whitespace tokens, char count,
  * chars-per-token score) so the WHOLE pipeline is DuckDB-oracle-checkable —
  * the framework must not change answers, only execution.
  */
object TextStages {

  final case class DocRow(doc_id: Long, text: String)
  final case class Parsed(doc_id: Long, n_tokens: Long, n_chars: Long)
  final case class Scored(doc_id: Long, n_tokens: Long, n_chars: Long, score: Double)

  /** tokenize + count (keeps empty tokens, like string_split). */
  final class ParseStage(override val batchSize: Int = 64) extends Stage[DocRow, Parsed] {
    override def process(batch: Seq[DocRow]): Seq[Parsed] =
      batch.map { d =>
        Parsed(d.doc_id,
          d.text.split(" ", -1).length.toLong,
          d.text.codePointCount(0, d.text.length).toLong)
      }
  }

  /** chars-per-token score, rounded like SQL round(x, 4). */
  final class ScoreStage(override val batchSize: Int = 64) extends Stage[Parsed, Scored] {
    override def process(batch: Seq[Parsed]): Seq[Scored] =
      batch.map { p =>
        val score = math.round(p.n_chars * 1.0 / p.n_tokens * 10000.0) / 10000.0
        Scored(p.doc_id, p.n_tokens, p.n_chars, score)
      }
  }

  /** Drop short documents — filtering via (reference-style) empty output. */
  final class FilterStage(minTokens: Long) extends Stage[Scored, Scored] {
    override def process(batch: Seq[Scored]): Seq[Scored] =
      batch.filter(_.n_tokens >= minTokens)
  }
}
