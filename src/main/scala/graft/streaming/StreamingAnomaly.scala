package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly detection — the streaming twin of the batch z-score
  * operator ([[graft.operators.Relational.zscoreOutliers]]): flag values
  * that deviate from their key's running baseline as they arrive, with
  * BOUNDED state.
  *
  * Each key's state is THREE exact longs (n, Σy, Σy² of the snapped
  * integer units — the q44/q55 moment discipline applied to streaming
  * state), fixed forever regardless of stream length; the exact
  * alternative keeps the full value log. The contract is PREQUENTIAL:
  * every value is judged against the baseline of strictly-earlier values
  * (cross-batch via state, within-batch by folding the iterator), then
  * added to it — so no value ever scores against itself, early keys
  * warm up naturally, and the verdict sequence is deterministic given
  * the per-key arrival order. A value flags when its baseline has at
  * least `minN` observations, the baseline sample variance is positive,
  * and |y − mean| / sd ≥ threshold.
  *
  * Integer-range bound: Σy² of cent-scale units stays inside a long
  * through ~10⁹ rows per key (q44's bound); shard hot keys beyond.
  * Snapping uses floor(v·scale + 0.5) — the exact rule the batch moment
  * family uses, so a streaming baseline equals the batch moments over
  * the same prefix.
  */
object StreamingAnomaly {

  final case class AnomalyRow(key: String, value: Double, z: Double, nPrior: Long)

  private val stateEnc: Encoder[(Long, Long, Long)] =
    Encoders.product[(Long, Long, Long)]
  implicit private val outEnc: Encoder[AnomalyRow] = Encoders.product[AnomalyRow]

  def anomalies(pairs: Dataset[(String, Double)], threshold: Double = 3.0,
      minN: Long = 30L, scale: Long = 100L): Dataset[AnomalyRow] = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(minN >= 2, s"minN must be >= 2 (variance needs it), got $minN")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    pairs
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (key: String, it: Iterator[(String, Double)],
            state: GroupState[(Long, Long, Long)]) =>
          var (n, s, ss) = state.getOption.getOrElse((0L, 0L, 0L))
          val out = Seq.newBuilder[AnomalyRow]
          it.foreach { case (_, v) =>
            val y = math.floor(v * scale + 0.5).toLong
            if (n >= minN) {
              val nd = n.toDouble
              val mean = s.toDouble / nd
              val variance = (ss.toDouble - s.toDouble * s.toDouble / nd) / (nd - 1.0)
              if (variance > 0) {
                val z = (y.toDouble - mean) / math.sqrt(variance)
                if (math.abs(z) >= threshold) out += AnomalyRow(key, v, z, n)
              }
            }
            n += 1; s += y; ss += y * y
          }
          state.update((n, s, ss))
          out.result().iterator
      })(stateEnc, outEnc)
  }
}
