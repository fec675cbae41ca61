package graft.streaming

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running quantiles over a live stream — the streaming twin of the batch
  * KLL path ([[graft.operators.Sketches.quantiles]]): "p50/p95/p99 so
  * far" per key, continuously, with BOUNDED state.
  *
  * Each grouping key keeps ONE serialized KLL doubles sketch as its
  * `flatMapGroupsWithState` state — a few KB at k=200, fixed forever
  * regardless of stream length, vs. an exact running percentile whose
  * state is the full value log. Keys are the natural grouping (endpoint,
  * stage, tenant — per-key latency is the canonical use), so no hash
  * sharding is needed: a key's sketch sees every one of its values and
  * its estimates are complete for that key. After each micro-batch every
  * UPDATED key re-emits one row per requested rank (Append mode:
  * downstream keeps the latest (key, rank) row — q40 semantics).
  *
  * Error contract is KLL's: exact while the sketch hasn't compacted
  * (n ≤ k keeps every value), then normalized-rank error ~1.65/√k with
  * the same merge-safe bounds as the batch path. Ranks query with the
  * library's default inclusive criterion — identical to the batch
  * operator, so a streaming readout converges to the batch answer over
  * the same data (spec-asserted).
  */
object StreamingQuantiles {

  final case class QuantileRow(key: String, n: Long, rank: Double, value: Double)

  private val stateEnc: Encoder[Array[Byte]] = Encoders.BINARY
  implicit private val outEnc: Encoder[QuantileRow] = Encoders.product[QuantileRow]

  def runningQuantiles(pairs: Dataset[(String, Double)], ranks: Seq[Double],
      k: Int = 200): Dataset[QuantileRow] = {
    require(ranks.nonEmpty, "at least one rank required")
    require(ranks.forall(r => r >= 0.0 && r <= 1.0), s"ranks must be in [0,1]: $ranks")
    require(k >= 8, s"KLL k must be >= 8, got $k")
    val sortedRanks = ranks.sorted
    pairs
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (key: String, it: Iterator[(String, Double)], state: GroupState[Array[Byte]]) =>
          val sk = state.getOption.filter(_.nonEmpty)
            .map(b => KllDoublesSketch.heapify(Memory.wrap(b)))
            .getOrElse(KllDoublesSketch.newHeapInstance(k))
          it.foreach(t => sk.update(t._2))
          state.update(sk.toByteArray)
          if (sk.isEmpty) Iterator.empty
          else {
            val n = sk.getN
            sortedRanks.iterator.map(r => QuantileRow(key, n, r, sk.getQuantile(r)))
          }
      })(stateEnc, outEnc)
  }
}
