package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.sources.{Manifests, ShardCommit, TarShards, WarcShards}

/** Exactly-once shard export from a stream — the WRITE side of the
  * crawl/curation loop (E14/E17 read WARC shards as they land; this
  * lands tar/WARC shards as results flow out). Spark's own file sink
  * gets exactly-once from its `_spark_metadata` log; shard directories
  * need the same guarantee WITHOUT that log, because downstream
  * consumers are tar/WARC readers (possibly not Spark at all). The
  * manifest IS the commit record:
  *
  *  - each micro-batch writes to its own `batch-<id>` directory,
  *  - the batch's `_MANIFEST.jsonl` lands LAST (after every shard),
  *  - a replayed batch (foreachBatch re-delivers after any failure)
  *    is SKIPPED when its manifest exists — committed work is never
  *    redone — and REWRITTEN from scratch when it doesn't (a crash
  *    mid-write left shards but no manifest: Overwrite clears them),
  *  - readers consume only manifest-listed shards
  *    ([[Manifests.listedGlob]]), so a half-written batch directory is
  *    invisible no matter when the reader lists it.
  *
  * Works on object stores too: pass [[ShardCommit.Publish]] and the
  * task-level commit inside the batch is also rename-free (the
  * publish step then writes the same manifest — one commit record,
  * two layers of it). Batch directories are per-micro-batch by design:
  * a long-running export accumulates many small-batch dirs — roll them
  * up offline with `compactShards` + `Manifests.refresh`.
  */
object StreamingShardExport {

  /** foreachBatch body writing (key, ext, content) batches as tar
    * shards: `urls.writeStream.foreachBatch(tarBatches(path, 4))`.
    */
  def tarBatches(path: String, shards: Int,
      commit: ShardCommit.Mode = ShardCommit.Rename): (DataFrame, Long) => Unit =
    (batch, id) => writeBatch(batch, path, id, commit, "*.tar") { (df, dir) =>
      TarShards.write(df.select("key", "ext", "content"), dir,
        SaveMode.Overwrite, shards = Some(shards), commit = commit)
    }

  /** foreachBatch body writing (url, warc_date, content_type, body)
    * batches as WARC response shards.
    */
  def warcBatches(path: String, shards: Int,
      commit: ShardCommit.Mode = ShardCommit.Rename): (DataFrame, Long) => Unit =
    (batch, id) => writeBatch(batch, path, id, commit, "*.warc.gz") { (df, dir) =>
      WarcShards.write(df.select("url", "warc_date", "content_type", "body"),
        dir, SaveMode.Overwrite, shards = Some(shards), commit = commit)
    }

  /** True iff batch `id` is already committed under `path` (its
    * manifest exists) — exposed for monitoring/tests.
    */
  def committed(spark: org.apache.spark.sql.SparkSession, path: String,
      id: Long): Boolean = {
    val m = new org.apache.hadoop.fs.Path(batchDir(path, id), "_MANIFEST.jsonl")
    m.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(m)
  }

  private def batchDir(path: String, id: Long): String = f"$path/batch-$id%09d"

  private def writeBatch(batch: DataFrame, path: String, id: Long,
      commit: ShardCommit.Mode, glob: String)(
      write: (DataFrame, String) => Unit): Unit = {
    val spark = batch.sparkSession
    if (committed(spark, path, id)) return // replay of committed work
    if (batch.isEmpty) return // no-data trigger: no dir, nothing to commit
    val dir = batchDir(path, id)
    write(batch, dir)
    // Publish mode already landed the manifest as its commit record;
    // Rename mode writes it now, LAST — the batch's commit point
    if (commit != ShardCommit.Publish) Manifests.write(spark, dir, glob)
  }
}
