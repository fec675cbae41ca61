package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA — the streaming twin of the batch secondary-sort fold
  * ([[graft.operators.Relational.ewma]]): the per-key time-decay
  * baseline (y₀ = x₀, yₜ = α·xₜ + (1−α)·yₜ₋₁) maintained live with
  * BOUNDED state.
  *
  * Each key's state is one (lastOrd, lastTie, y) triple — a fixed ~24
  * bytes forever (the exact alternative replays the full event log).
  * Because the recurrence is ORDER-SENSITIVE, the operator restores a
  * well-defined order inside each micro-batch instead of trusting
  * iterator order (the E9 lesson: after a shuffle, a key's rows arrive
  * in fetch order): the batch's rows sort by the (ord, tie) total order
  * — the batch ewma operator's exact contract — and fold from the
  * pre-batch state in that order. Rows at or below the state's
  * high-water mark (ord, tie) are LATE: folding them would rewrite
  * history the stream already emitted, so they flag `late = true`,
  * carry the unchanged running value, and do NOT fold (ascending sort
  * puts them first, so every late row reports the pre-batch y —
  * deterministic under any iterator order). (ord, tie) must be unique
  * per key; an exact duplicate is judged late.
  *
  * Determinism contract (E8/E9 family): given the same batch
  * composition the output is exact and iterator-order-independent; and
  * when event order respects batch boundaries — the in-order ingest
  * case — the streaming readout EQUALS the batch operator over the
  * concatenated input (spec-asserted). Per-key state is a few fixed
  * scalars; the per-batch sort is bounded by one key's rows in one
  * micro-batch, never the stream's history.
  */
object StreamingEwma {

  final case class EwmaRow(key: String, ord: Long, tie: Long, value: Double,
      valueUnits: Long, ewma: Double, late: Boolean)

  private val stateEnc: Encoder[(Long, Long, Double)] =
    Encoders.product[(Long, Long, Double)]
  implicit private val outEnc: Encoder[EwmaRow] = Encoders.product[EwmaRow]

  def ewma(rows: Dataset[(String, Long, Long, Double)], alpha: Double,
      scale: Long = 100L): Dataset[EwmaRow] = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val oneMinus = 1.0 - alpha
    rows
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (key: String, it: Iterator[(String, Long, Long, Double)],
            state: GroupState[(Long, Long, Double)]) =>
          val sorted = it.toArray.sortBy { case (_, o, t, _) => (o, t) }
          var (lastOrd, lastTie, y) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue, Double.NaN))
          var started = state.exists
          val out = Seq.newBuilder[EwmaRow]
          sorted.foreach { case (_, o, t, v) =>
            val c = math.floor(v * scale + 0.5).toLong
            val isLate = started &&
              (o < lastOrd || (o == lastOrd && t <= lastTie))
            if (isLate) {
              out += EwmaRow(key, o, t, v, c, y, late = true)
            } else {
              y = if (!started) c.toDouble else alpha * c.toDouble + oneMinus * y
              started = true
              lastOrd = o; lastTie = t
              out += EwmaRow(key, o, t, v, c, y, late = false)
            }
          }
          if (started) state.update((lastOrd, lastTie, y))
          out.result().iterator
      })(stateEnc, outEnc)
  }
}
