package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming politeness scheduler — the continuous twin of the batch
  * frontier schedule (p13): as admitted URLs arrive, each host's next
  * fetch WAVE number is issued from a running per-host counter and the
  * ETA is `(wave − 1) × delay`, so a live crawler can hand fetchers a
  * time-ordered per-host queue without ever sorting the frontier. The
  * politeness sequence is inherently per-host serial; what must NOT be
  * serial is everything else — state is ONE long per host (waves
  * issued so far), per-row work O(1), the only exchange is the
  * host-keyed shuffle (same as the batch window's partition).
  *
  * Ordering contract (the E9/E10/E15 lesson): arrival order across
  * micro-batches is the schedule order — a stream cannot reorder
  * history — and WITHIN a micro-batch rows are issued in ascending id
  * order, so output is a pure function of (batch arrival pattern, ids,
  * delays). Fed in id order it reproduces the batch `row_number` wave
  * assignment exactly (spec-asserted parity). Hosts missing from the
  * delay map take `defaultDelayMs` — the p13 caller-default rule.
  */
object StreamingFrontier {

  final case class Scheduled(id: Long, host: String, wave: Long, etaMs: Long)

  private val stateEnc: Encoder[Long] = Encoders.scalaLong
  implicit private val outEnc: Encoder[Scheduled] = Encoders.product[Scheduled]

  /** rows = (id, host); delays in milliseconds, non-negative. */
  def scheduleWaves(rows: Dataset[(Long, String)], delaysMs: Map[String, Long],
      defaultDelayMs: Long): Dataset[Scheduled] = {
    require(defaultDelayMs >= 0, "defaultDelayMs must be non-negative")
    require(delaysMs.values.forall(_ >= 0), "delays must be non-negative")
    import rows.sparkSession.implicits._
    val d = delaysMs // avoid closing over the enclosing object
    val dflt = defaultDelayMs
    rows
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (host: String, it: Iterator[(Long, String)], state: GroupState[Long]) =>
          val delay = d.getOrElse(host, dflt)
          var issued = state.getOption.getOrElse(0L)
          val out = it.toVector.sortBy(_._1).map { case (id, _) =>
            issued += 1
            Scheduled(id, host, issued, (issued - 1) * delay)
          }
          state.update(issued)
          out.iterator
      })(stateEnc, outEnc)
  }
}
