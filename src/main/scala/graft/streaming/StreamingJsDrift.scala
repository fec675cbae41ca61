package graft.streaming

import graft.operators.Ckpt._
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming corpus drift gate — t23's Jensen–Shannon divergence applied
  * LIVE at ingest: every micro-batch's token distribution is compared
  * against a STANDING reference vocabulary, and the whole batch either
  * exports (js ≤ threshold) or quarantines. This is the gate a
  * continuous training-data feed needs in front of its shard writer: a
  * scraper gone wrong, a source flipping language, or an injection of
  * boilerplate shifts the batch's unigram distribution long before any
  * per-document filter fires — and JS (symmetric, ≤ ln 2, finite on
  * disjoint support) is the score that SATURATES instead of exploding
  * when the batch carries tokens the reference has never seen (t18's KL
  * would be ∞ on every batch with one new token: useless as a gate).
  *
  * Mechanics (the E19/E20 foreachBatch discipline): the reference
  * counts are computed ONCE ([[TextAnalysis.tokenCounts]], pinned) —
  * per batch the gate tokenizes ONLY the batch, outer-joins the
  * reference counts, and reduces the per-token terms of
  * [[TextAnalysis.jsFromCounts]] to one scalar; foreachBatch re-plans
  * per micro-batch, so the standing side stays current if the caller
  * swaps it. Verdicts append to a driver-side log (batch id, token
  * counts, js, pass) — the monitoring feed — and the returned frame is
  * the batch's rows when it passes, empty when quarantined, so the
  * caller's sink writes exactly the accepted corpus.
  *
  * Determinism note: js is a float SUM over the union vocabulary
  * (monitoring-grade — summation order may move the last ulps). The
  * gate contract is therefore about thresholds with real margins, not
  * bit-exact replay; the per-token TERMS are the t23 oracle-verified
  * arithmetic.
  *
  * Scale shape: per batch — batch-sized tokenize + one partial-agg
  * groupBy, an outer join against the (vocabulary-sized, pinned)
  * reference, one scalar reduce. Nothing corpus-sized happens per tick;
  * the reference is |V| rows however big history grows. Cap the
  * reference vocabulary upstream (min-df prune, [[TextAnalysis]]'s d10
  * path) if |V| itself becomes shuffle-relevant.
  */
final class StreamingJsDrift(referenceCounts: DataFrame, threshold: Double)
  extends Serializable {
  require(threshold > 0, s"threshold must be positive, got $threshold")

  final case class Verdict(batchId: Long, nBatchTokens: Long,
      nRefTokens: Long, unionVocab: Long, js: Double, pass: Boolean)

  // standing side: pinned once, re-used by every micro-batch
  private val ref = referenceCounts
    .select(col("token"), col("n").cast("long").as("n_q"))
    .eagerPin()

  private val log = ArrayBuffer.empty[Verdict]

  /** The verdict history so far (driver-side, one row per micro-batch). */
  def verdicts: Seq[Verdict] = log.synchronized(log.toSeq)

  /** foreachBatch body: gate `batch` (must carry `textCol`), return its
    * rows if the batch passes, an empty frame if it quarantines. An
    * EMPTY batch passes by definition (js of nothing is 0).
    */
  def gate(batch: DataFrame, textCol: String, batchId: Long): DataFrame = {
    val bc = TextAnalysis.tokenCounts(batch, textCol)
      .select(col("token"), col("n").cast("long").as("n_p"))
    // persist/unpersist per tick, NOT localCheckpoint: the totals job
    // and the term reduction share one materialization, and the blocks
    // RELEASE before the next batch — a per-tick checkpoint would
    // accumulate dead blocks in storage memory for the stream's lifetime
    val joined = bc.join(ref, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_p"), lit(0L)).as("n_p"),
        coalesce(col("n_q"), lit(0L)).as("n_q"))
      .persist()
    val agg = try {
      val totals = joined.agg(count(lit(1)), sum("n_p"), sum("n_q")).head()
      val vocab = totals.getLong(0)
      val term =
        if (vocab == 0) lit(0.0)
        else TextAnalysis.jsTermsExpr(vocab, totals.getLong(1), totals.getLong(2))
      joined.select(term.as("js_term"), col("n_p"), col("n_q"))
        .agg(coalesce(sum(col("js_term")), lit(0.0)),
          coalesce(sum(col("n_p")), lit(0L)),
          coalesce(sum(col("n_q")), lit(0L)),
          count(lit(1))).head()
    } finally { joined.unpersist(false); () }
    // a token-less batch is a no-op tick, not a drifted corpus: the
    // smoothed all-zeros-vs-reference js would be spuriously large
    val js = if (agg.getLong(1) == 0L) 0.0 else agg.getDouble(0)
    val v = Verdict(batchId, agg.getLong(1), agg.getLong(2), agg.getLong(3),
      js, js <= threshold)
    log.synchronized { log += v; () }
    if (v.pass) batch else batch.limit(0)
  }
}
