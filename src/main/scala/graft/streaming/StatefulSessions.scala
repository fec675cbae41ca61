package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState`: incremental
  * gap-based sessionization — the streaming twin of the batch
  * [[graft.operators.Relational.sessionize]] / q11 semantics. State per
  * entity is three longs; at scale it lives in the state store, sharded by
  * the grouping key, and (with an event-time timeout in production) is
  * evicted once the watermark passes the gap.
  */
object StatefulSessions {

  final case class SessionState(nSessions: Long, nEvents: Long, lastTs: Long)
  final case class SessionCount(entity: Long, n_sessions: Long, n_events: Long)

  implicit private val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit private val outEnc: Encoder[SessionCount] = Encoders.product[SessionCount]

  /** events: (entity, tsMillis). Emits the running per-entity session and
    * event counts after each micro-batch. Within a batch events are
    * processed in ts order; a gap > gapMillis (or the first event ever)
    * starts a new session.
    */
  def sessionCounts(events: Dataset[(Long, Long)], gapMillis: Long): Dataset[SessionCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: Long, it: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          val ts = it.map(_._2).toArray.sorted
          var (nSess, nEv, last) = state.getOption
            .map(s => (s.nSessions, s.nEvents, s.lastTs))
            .getOrElse((0L, 0L, Long.MinValue))
          ts.foreach { t =>
            if (last == Long.MinValue || t - last > gapMillis) nSess += 1
            nEv += 1
            // events are ordered only within a batch: a cross-batch late
            // event must not rewind the session clock (it would make the
            // next in-order event spuriously open a session)
            last = math.max(last, t)
          }
          state.update(SessionState(nSess, nEv, last))
          Iterator(SessionCount(entity, nSess, nEv))
      }
  }
}
