package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState`: incremental
  * gap-based sessionization — the streaming twin of the batch
  * [[graft.operators.Relational.sessionize]] / q11 semantics. State per
  * entity is three longs; at scale it lives in the state store, sharded by
  * the grouping key.
  *
  * [[sessionCounts]] is the unbounded-state teaching variant (state grows
  * with the entity universe); [[sessionCountsWithTimeout]] is the
  * production path — watermark + event-time timeout evict an entity's
  * state once the watermark passes its last event by the session gap, so
  * state size tracks ACTIVE entities, not all entities ever seen.
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

  /** events: (entity, ts). Same running counts as [[sessionCounts]], but
    * state is bounded: the input is watermarked by `watermarkDelay`, each
    * update arms an event-time timeout at lastTs + gapMillis, and when the
    * watermark passes it the entity's state is dropped (its session is
    * over — a later event correctly starts a fresh session numbering).
    * Events at or below the watermark are discarded (they can neither
    * extend a live session nor resurrect an evicted one), which is what
    * makes eviction safe: an evicted entity's counts can only be rebuilt
    * from post-watermark events.
    */
  def sessionCountsWithTimeout(events: Dataset[(Long, Timestamp)], gapMillis: Long,
      watermarkDelay: String): Dataset[SessionCount] = {
    import events.sparkSession.implicits._
    events.toDF("entity", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: Long, it: Iterator[(Long, Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // the watermark passed lastTs + gap: the session is closed and
            // no in-watermark event can reference this entity again
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            val ts = it.map(_._2.getTime).filter(_ > wm).toArray.sorted
            if (ts.isEmpty) Iterator.empty // all late: don't touch state
            else {
              var (nSess, nEv, last) = state.getOption
                .map(s => (s.nSessions, s.nEvents, s.lastTs))
                .getOrElse((0L, 0L, Long.MinValue))
              ts.foreach { t =>
                if (last == Long.MinValue || t - last > gapMillis) nSess += 1
                nEv += 1
                last = math.max(last, t)
              }
              state.update(SessionState(nSess, nEv, last))
              // evict once the watermark proves no event can extend the
              // session (ts > wm guarantees this is > the current watermark)
              state.setTimeoutTimestamp(last + gapMillis)
              Iterator(SessionCount(entity, nSess, nEv))
            }
          }
      }
  }
}
