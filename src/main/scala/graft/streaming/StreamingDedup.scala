package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the continuous-pipeline twin of the
  * batch [[graft.operators.Dedup.exact]] / d01 semantics: the FIRST
  * arrival of each key is kept, later duplicates are dropped as they
  * stream in (the ingest-time dedup of a continuously-fed corpus).
  *
  * Two state regimes, mirroring the sessionization pair:
  *  - [[firstArrival]]: unbounded state — one entry per key ever seen.
  *    Exact forever, but state grows with the key universe; only for
  *    bounded key spaces.
  *  - [[firstArrivalBounded]]: the production path — event-time
  *    watermark + `dropDuplicatesWithinWatermark`: duplicate keys are
  *    suppressed while they can still collide inside the watermark
  *    horizon, and key state older than the horizon is EVICTED, so
  *    state tracks the active window, not history. The documented
  *    trade: a duplicate arriving later than `delay` after the original
  *    is re-admitted (batch d01 over the stored corpus is the
  *    authoritative backstop — the standard lambda split).
  *
  * Dedup on content: pass the fingerprint/md5 column as the key (the
  * d01 shuffle-key discipline — never the text itself).
  */
object StreamingDedup {

  def firstArrival(stream: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(stream.isStreaming, "firstArrival expects a streaming Dataset")
    stream.dropDuplicates(keyCols)
  }

  def firstArrivalBounded(stream: DataFrame, tsCol: String, delay: String,
      keyCols: Seq[String]): DataFrame = {
    require(stream.isStreaming, "firstArrivalBounded expects a streaming Dataset")
    stream.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)
  }
}
