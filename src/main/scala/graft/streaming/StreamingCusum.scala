package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM — Page's sequential mean-shift test run LIVE, the
  * streaming twin of the batch fold
  * ([[graft.operators.Relational.cusum]]) and the online half of the
  * change-point pair (q121 LOCATES a past shift; this ALARMS the moment
  * one happens at ingest). Per key the state is four longs
  * (lastOrd, lastTie, s⁺, s⁻) — fixed ~32 bytes forever, and because
  * the recurrence
  *   s⁺ = max(0, s⁺ + (c − target − k)),  s⁻ = max(0, s⁻ − (c − target + k))
  * is ALL-INTEGER (values snap to units, target/k/h are caller
  * integers), the streaming readout is bit-replayable by any engine —
  * none of the EWMA fold's IEEE-literal care is needed.
  *
  * Order discipline is [[StreamingEwma]]'s wholesale (the E9 lesson):
  * each micro-batch's rows sort by the (ord, tie) total order and fold
  * from the pre-batch state; rows at or below the state's high-water
  * mark are LATE — folding them would rewrite already-emitted alarms —
  * so they flag `late = true`, carry the unchanged (s⁺, s⁻) and no
  * alarm, and do not fold. After an alarm both sides reset (the
  * standard restart form — repeated shifts all flag), exactly the
  * batch operator's contract, so the in-order streaming readout EQUALS
  * the batch cusum over the concatenated input (spec-asserted).
  * (ord, tie) must be unique per key; an exact duplicate is judged
  * late.
  */
object StreamingCusum {

  final case class CusumRow(key: String, ord: Long, tie: Long,
      valueUnits: Long, sPlus: Long, sMinus: Long, flag: Int, late: Boolean)

  private val stateEnc: Encoder[(Long, Long, Long, Long)] =
    Encoders.product[(Long, Long, Long, Long)]
  implicit private val outEnc: Encoder[CusumRow] = Encoders.product[CusumRow]

  def cusum(rows: Dataset[(String, Long, Long, Double)], targetUnits: Long,
      kUnits: Long, hUnits: Long, scale: Long = 100L): Dataset[CusumRow] = {
    require(kUnits >= 0, s"allowance k must be >= 0, got $kUnits")
    require(hUnits > 0, s"decision threshold h must be > 0, got $hUnits")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    rows
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (key: String, it: Iterator[(String, Long, Long, Double)],
            state: GroupState[(Long, Long, Long, Long)]) =>
          val sorted = it.toArray.sortBy { case (_, o, t, _) => (o, t) }
          var (lastOrd, lastTie, sp, sn) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue, 0L, 0L))
          var started = state.exists
          val out = Seq.newBuilder[CusumRow]
          sorted.foreach { case (_, o, t, v) =>
            // non-finite values NEVER fold: math.floor(NaN*scale+0.5)
            // .toLong is 0, which would silently feed c=0 into s+/s-.
            // The batch twin drops such rows entirely (the snap cast
            // yields null, filtered before the fold) — match it: no
            // output row, no state advance, no high-water-mark move.
            if (v.isNaN || v.isInfinite) ()
            else {
            val c = math.floor(v * scale + 0.5).toLong
            val isLate = started &&
              (o < lastOrd || (o == lastOrd && t <= lastTie))
            if (isLate) {
              out += CusumRow(key, o, t, c, sp, sn, flag = 0, late = true)
            } else {
              sp = math.max(0L, sp + (c - targetUnits - kUnits))
              sn = math.max(0L, sn - (c - targetUnits + kUnits))
              val flag = if (sp > hUnits) 1 else if (sn > hUnits) -1 else 0
              started = true
              lastOrd = o; lastTie = t
              out += CusumRow(key, o, t, c, sp, sn, flag, late = false)
              if (flag != 0) { sp = 0L; sn = 0L } // restart after alarm
            }
            }
          }
          if (started) state.update((lastOrd, lastTie, sp, sn))
          out.result().iterator
      })(stateEnc, outEnc)
  }
}
