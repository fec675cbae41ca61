package graft.streaming

import graft.operators.Ckpt._
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous CDC materialization: merge a streaming change log into a
  * durable parquet table that always holds the LATEST row per key — the
  * streaming twin of the batch q40 compaction
  * ([[graft.operators.Relational.latestByKey]]), i.e. `MERGE INTO`
  * without a table format that provides it.
  *
  * Per micro-batch (`foreachBatch`): existing target ∪ batch →
  * `latestByKey` → write to a temp dir → atomic rename swap. Two
  * properties carry the semantics:
  *
  *  - **Idempotent**: the merge is a max over (order, key) — replaying a
  *    micro-batch (foreachBatch is at-least-once on retry) recomputes
  *    the same target, so at-least-once execution still yields an
  *    exactly-once TABLE.
  *  - **Out-of-order safe**: a late change (order below the target's
  *    current row for that key) loses the max and leaves the target
  *    untouched — no clock assumptions about the change log.
  *
  * The target schema is keyCol + orderCols + payloadCols (order columns
  * must be RETAINED in the target — later merges re-compare against
  * them). At scale the target rewrite is one shuffle of |keys| rows;
  * partition the target (date/bucket) and scope the merge when |keys|
  * is itself 100 TB-large.
  */
object StreamingUpsert {

  /** Start the merge. `orderCols`/`payloadCols` are column NAMES in
    * `changes` (order ties broken by the later-listed columns — pass a
    * unique sequence column last).
    *
    * Crash safety: the swap is write-tmp → delete-target → rename. A
    * crash INSIDE that window leaves the target missing but the tmp dir
    * holding the completed merge — so the read side prefers the target
    * and falls back to the tmp dir. Without the fallback, the replayed
    * batch would merge against nothing and silently DROP every
    * previously-compacted key (state loss, not just duplication).
    */
  def start(changes: DataFrame, path: String, checkpoint: String,
      keyCol: String, orderCols: Seq[String], payloadCols: Seq[String]): StreamingQuery = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val keep: Seq[Column] = (orderCols ++ payloadCols).map(n => col(n).as(n))
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cols = (keyCol +: (orderCols ++ payloadCols)).map(col)
        val incoming = batch.select(cols: _*)
        val tmp = path + "._merging"
        def readState(dir: String) =
          try Some(spark.read.parquet(dir).select(cols: _*))
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        val existing = readState(path).orElse(readState(tmp))
        val all = existing.map(_.unionByName(incoming)).getOrElse(incoming)
        val merged = graft.operators.Relational.latestByKey(
          all, keyCol, orderCols.map(col), keep)
        // localCheckpoint BEFORE overwriting tmp: `merged` may be reading
        // its own input from tmp (the recovery path) — a lazy plan would
        // delete its source mid-write
        val snapshot = merged.eagerPin()
        snapshot.write.mode(SaveMode.Overwrite).parquet(tmp)
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // Hadoop FS delete/rename report failure by RETURN VALUE, not
        // exception. Swallowing a false here would commit the streaming
        // checkpoint over a swap that never happened — the batch's
        // changes silently lost with no error anywhere (and on HDFS a
        // rename onto an existing dir moves tmp INSIDE it). Fail the
        // batch instead: foreachBatch retries, and the merge is
        // idempotent by design.
        if (fs.exists(p) && !fs.delete(p, true))
          sys.error(s"StreamingUpsert: failed to delete stale target $path")
        if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), p))
          sys.error(s"StreamingUpsert: failed to rename $tmp -> $path")
        ()
      }
      .start()
  }
}
