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
  * alternative keeps the full value log. The contract is BATCH-GRAINED
  * prequential: every value in a micro-batch is judged against the
  * baseline of PRIOR batches only, then the whole batch folds into the
  * state — so no value ever scores against itself, early keys warm up
  * naturally, and (because the baseline is fixed across the batch and
  * long sums commute) the verdicts are DETERMINISTIC under any iterator
  * order. A within-batch fold would re-introduce order sensitivity:
  * after a shuffle a key's batch rows arrive in fetch order, not
  * arrival order, so "judged against the value before it" is not a
  * well-defined baseline in a distributed stream. A value flags when
  * its baseline has at least `minN` observations, the baseline sample
  * variance is positive, and |y − mean| / sd ≥ threshold.
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
          val (n0, s0, ss0) = state.getOption.getOrElse((0L, 0L, 0L))
          // the pre-batch baseline is the ONLY judge: fixed across the
          // batch, so verdicts don't depend on iterator order
          val nd = n0.toDouble
          val mean = if (n0 > 0) s0.toDouble / nd else 0.0
          val variance =
            if (n0 >= 2) (ss0.toDouble - s0.toDouble * s0.toDouble / nd) / (nd - 1.0)
            else 0.0
          val judging = n0 >= minN && variance > 0
          val sd = if (judging) math.sqrt(variance) else 0.0
          var (n, s, ss) = (n0, s0, ss0)
          val out = Seq.newBuilder[AnomalyRow]
          it.foreach { case (_, v) =>
            val y = math.floor(v * scale + 0.5).toLong
            if (judging) {
              val z = (y.toDouble - mean) / sd
              if (math.abs(z) >= threshold) out += AnomalyRow(key, v, z, n0)
            }
            n += 1; s += y; ss += y * y
          }
          state.update((n, s, ss))
          out.result().iterator
      })(stateEnc, outEnc)
  }
}
