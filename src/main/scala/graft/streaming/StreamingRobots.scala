package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Robots

/** Robots admission with LIVE rule refresh — closing the E16 caveat
  * that a stream-static join plans its static side once, so refreshed
  * robots bodies needed a query restart. A long-running crawl cannot
  * restart per refresh (state checkpoints, in-flight triggers), and it
  * also must not re-read the rules table at trigger rate: robots files
  * change on the order of days while triggers fire on the order of
  * seconds.
  *
  * Shape: the query routes through `foreachBatch`, which re-PLANS its
  * body every micro-batch — so a fresh rules snapshot is picked up by
  * simply swapping the DataFrame the body joins against. The swap is
  * rate-limited by [[RefreshingRules]]: under `ttlMs` the pinned
  * (persisted) snapshot is reused with zero re-reads; past it the
  * loader runs once, the NEW snapshot is materialized BEFORE the old
  * one unpersists, and the swap happens between batches only — never
  * under a running one.
  *
  * Determinism contract (the E15/E18 discipline): each batch is gated
  * by exactly one rules snapshot, so per-batch output ≡
  * `Robots.admit(batch, snapshot, agent)` — the batch operator verbatim
  * on the batch's rows (spec-asserted parity). A refresh changes
  * admission for SUBSEQUENT batches only; emitted verdicts are never
  * revised (re-verdicting already-crawled URLs is the frontier's job —
  * see [[graft.operators.Dedup.frontierNovel]]).
  *
  * Scale: the snapshot is |hosts|-bounded metadata (the [[Robots.rules]]
  * row shape), the per-batch join is the same host-keyed broadcast-able
  * join as batch admission, and the loader cost amortizes over
  * `ttl / trigger` batches.
  */
object StreamingRobots {

  /** Rate-limited snapshot holder for a slowly-changing reference table.
    * `load` re-reads the authoritative source (e.g. `Robots.rules` over
    * a robots-bodies table); `clock` is injectable so specs can drive
    * the TTL deterministically. Driver-side only — `foreachBatch`
    * bodies run on the driver, so the holder is never serialized.
    */
  final class RefreshingRules(load: () => DataFrame, ttlMs: Long,
      clock: () => Long = () => System.currentTimeMillis()) {
    require(ttlMs >= 0, "ttlMs must be non-negative")
    private var cached: Option[(DataFrame, Long)] = None
    private var loads = 0L

    /** How many times the loader actually ran (spec observability). */
    def loadCount: Long = synchronized(loads)

    /** The current snapshot: cached under TTL, else reloaded. The fresh
      * snapshot is pinned (persist + count) before the stale one drops;
      * a FAILED reload unpersists its half-built snapshot and keeps the
      * old one serving (retry at the next batch, stale-but-gated beats
      * a dead query) — only a first load with nothing to fall back on
      * propagates the failure.
      */
    def current(): DataFrame = synchronized {
      val now = clock()
      cached match {
        case Some((df, at)) if now - at < ttlMs => df
        case stale =>
          var fresh: DataFrame = null
          try {
            fresh = load().persist()
            fresh.count() // materialize: a broken source fails HERE, not mid-batch
          } catch {
            case e: Throwable =>
              if (fresh != null) {
                try { fresh.unpersist(); () } catch { case _: Throwable => () }
              }
              stale match {
                case Some((old, _)) =>
                  System.err.println(
                    s"[StreamingRobots] rule reload failed, serving stale snapshot: $e")
                  return old
                case None => throw e
              }
          }
          loads += 1
          stale.foreach(_._1.unpersist())
          cached = Some((fresh, now))
          fresh
      }
    }

    def close(): Unit = synchronized {
      cached.foreach(_._1.unpersist())
      cached = None
    }
  }

  /** The `foreachBatch` body: gate each micro-batch with the holder's
    * current snapshot and hand the gated batch (all input columns +
    * `robots_allowed`) to `sink`. Attach with
    * `urls.writeStream.foreachBatch(admitBatches(rules, agent, sink))`.
    */
  def admitBatches(rules: RefreshingRules, agent: String,
      sink: (DataFrame, Long) => Unit,
      urlCol: String = "url"): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      sink(Robots.admit(batch, rules.current(), agent, urlCol), batchId)
}
