package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-side monitoring — the F15 counterpart for continuous
  * pipelines (reference: monitoring.py renders live per-stage tables;
  * Structured Streaming's unit of progress is the QUERY micro-batch, so
  * that is what we roll up): per-query batch counts, input/processed
  * rates, and batch durations, fed by Spark's own
  * `StreamingQueryListener` event bus.
  *
  * Contract mirrors `PipelineMonitor`: AT-LEAST-ONCE, eventually
  * consistent — the event bus is asynchronous, so a snapshot taken
  * immediately after `processAllAvailable()` may trail the last batch;
  * poll `snapshots` (spec does) or read at teardown. Keeps the last
  * `keep` progress rows per query (bounded memory for long-running
  * serving pipelines).
  */
final class StreamingMonitor(keep: Int = 64) extends StreamingQueryListener {
  import StreamingMonitor.Snap

  private val byName = mutable.Map.empty[String, mutable.ArrayDeque[Snap]]
  // Cumulative counters survive the ring buffer: past `keep` batches the
  // retained snapshots are a sliding window, and summing over them would
  // silently turn "total rows" into a window sum and freeze "batches" at
  // `keep` forever.
  private val totals = mutable.Map.empty[String, (Long, Long)] // (batches, rows)
  private val lock = new Object

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val snap = Snap(name, p.batchId, p.numInputRows,
      p.inputRowsPerSecond, p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
    lock.synchronized {
      val q = byName.getOrElseUpdate(name, mutable.ArrayDeque.empty)
      q.append(snap)
      while (q.size > keep) q.removeHead()
      val (b, r) = totals.getOrElse(name, (0L, 0L))
      totals(name) = (b + 1, r + p.numInputRows)
    }
  }

  /** Progress rows seen so far, newest last, per query name. */
  def snapshots: Map[String, Seq[Snap]] =
    lock.synchronized(byName.view.mapValues(_.toSeq).toMap)

  /** One line per query: LIFETIME batches/rows (cumulative counters,
    * not the retained window), latest rates. */
  def report(): String = lock.synchronized {
    byName.toSeq.sortBy(_._1).map { case (name, q) =>
      val latest = q.last
      val (batches, rows) = totals.getOrElse(name, (q.size.toLong, q.map(_.numInputRows).sum))
      f"$name%-24s batches=$batches rows=$rows " +
        f"in=${latest.inputRowsPerSecond}%.1f/s proc=${latest.processedRowsPerSecond}%.1f/s " +
        f"lastBatch=${latest.durationMs}ms"
    }.mkString("\n")
  }

  /** Attach to a session's listener bus; returns this for chaining. */
  def attach(spark: SparkSession): StreamingMonitor = {
    spark.streams.addListener(this); this
  }

  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}

object StreamingMonitor {
  final case class Snap(queryName: String, batchId: Long, numInputRows: Long,
      inputRowsPerSecond: Double, processedRowsPerSecond: Double, durationMs: Long)
}
