package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{SignatureExpressions => SigX}
import graft.functions.TextFunctions.tokens

/** Streaming NEAR-duplicate detection — the continuous twin of the batch
  * MinHash path ([[graft.operators.Dedup.minhashLshPairs]] / d03): as
  * documents stream in, each computes its LSH band keys (the same
  * one-pass signature expressions as the batch path — narrow, per-row),
  * and a document is flagged `near_dup` iff ANY of its band keys was
  * already claimed by an earlier document — exactly the batch
  * candidate-generation semantics, evaluated incrementally.
  *
  * Shape: two chained stateful operators (Spark's multiple-stateful-
  * operator support), both keyed small:
  *  1. band-ownership state via `flatMapGroupsWithState` keyed by BAND
  *     KEY — state is one long (the owning doc id; within a micro-batch
  *     the smallest doc id claims, so ownership is deterministic and
  *     layout-independent). Emits one (doc_id, ts, collided) verdict per
  *     band.
  *  2. the per-document rollup — a watermark-bounded windowed
  *     aggregation OR-ing the [[graft.functions.Signatures.NumBands]]
  *     band verdicts back into one row per document.
  *
  * State is the band-key universe (one long per distinct band ever
  * seen) — the streaming-ingest analogue of the batch band index that
  * [[graft.operators.Dedup.incrementalMinhashPairs]] precomputes; bound
  * it in production exactly like [[StreamingDedup.firstArrivalBounded]]
  * bounds exact-dedup state (watermark eviction: a band unseen for the
  * horizon is dropped, re-admitting only duplicates farther apart than
  * the horizon — the batch backstop owns those).
  *
  * Unlike exact dedup, a flagged document is a CANDIDATE (band collision
  * ⇒ probably-similar); the batch Jaccard verification remains the
  * authority, so the flag is delivered as an annotation, not a drop.
  *
  * Output (append, emitted once the watermark closes the document's
  * window): doc_id, window_start, near_dup, n_bands.
  */
object StreamingNearDup {

  final case class BandClaim(doc_id: Long, ts: Timestamp, collided: Boolean)

  implicit private val outEnc: Encoder[BandClaim] = Encoders.product[BandClaim]

  /** docs: streaming (doc_id, ts, text). `watermarkDelay` bounds both
    * stateful stages; `windowSize` is the rollup granularity (results for
    * a document emit when the watermark passes its window).
    */
  def nearDupFlags(docs: Dataset[(Long, Timestamp, String)],
      watermarkDelay: String, windowSize: String = "10 seconds"): DataFrame = {
    require(docs.isStreaming, "nearDupFlags expects a streaming Dataset")
    val spark = docs.sparkSession
    SigX.register(spark)
    import spark.implicits._
    val bands = docs.toDF("doc_id", "ts", "text")
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        explode(SigX.minhashBandKeys(SigX.shingleHash(tokens(col("text"))))).as("bk"))
      .as[(Long, Timestamp, String)]
    val claims = bands
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(Long, Timestamp, String)], state: GroupState[Long]) =>
          val rows = it.toArray
          // deterministic within-batch ownership: the smallest unseen doc id
          // claims a previously-unowned band (arrival order inside a batch
          // is a partitioning artifact — min is layout-independent)
          val owner = state.getOption.getOrElse(rows.map(_._1).min)
          state.update(owner)
          rows.iterator.map { case (d, ts, _) => BandClaim(d, ts, d != owner) }
      }
    claims.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowSize), col("doc_id"))
      .agg(max(col("collided")).as("near_dup"), count(lit(1)).as("n_bands"))
      .select(col("doc_id"), col("window.start").as("window_start"),
        col("near_dup"), col("n_bands"))
  }
}
