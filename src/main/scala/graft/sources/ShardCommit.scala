package graft.sources

import org.apache.hadoop.fs.Path

/** Task-side output commit for the shard writers ([[TarShards.write]],
  * [[WarcShards.write]]): write to an attempt-unique temp path, rename
  * into place on success. Without this, a speculative duplicate or a
  * zombie first attempt racing its retry streams into the SAME final
  * shard concurrently — yielding an interleaved/truncated archive that
  * can still parse, i.e. silent corruption at cluster scale.
  *
  * Commit rule: last-committer-wins. Attempts of one partition produce
  * byte-identical shards (both writers are deterministic functions of the
  * partition's rows — name-based UUIDs, mtime 0, no RNG), so whichever
  * attempt's rename lands is correct; the loser deletes its temp file. A
  * failed/abandoned attempt leaves only a `_tmp-*` file, which readers
  * never match (`*.tar` / `*.warc.gz` globs) and overwrite-mode reruns
  * delete with the directory.
  */
private[sources] object ShardCommit {

  /** Runs `body` against a stream on the temp path; `body` returns true
    * if anything was written. Commits (rename) only then — an empty
    * partition leaves no shard file, matching the writers' empty-archive
    * rule.
    */
  def withCommit(conf: SerializableHadoopConf, finalPath: Path)(
      body: java.io.OutputStream => Boolean): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    val attempt = if (tc == null) 0L else tc.taskAttemptId()
    val fs = finalPath.getFileSystem(conf.value)
    val tmp = new Path(finalPath.getParent,
      s"_tmp-${finalPath.getName}.attempt-$attempt")
    val stream = fs.create(tmp, true)
    var wrote = false
    try {
      wrote = body(stream)
      stream.close()
    } catch {
      case e: Throwable =>
        try stream.close() catch { case _: Throwable => () }
        try { fs.delete(tmp, false); () } catch { case _: Throwable => () }
        throw e
    }
    if (wrote) {
      // last-committer-wins: drop any earlier attempt's shard, then
      // rename ours in. If a racing attempt renames between the delete
      // and our rename, our rename fails against the existing file —
      // its bytes are identical, so drop the temp and accept the winner.
      fs.delete(finalPath, false)
      if (!fs.rename(tmp, finalPath)) {
        try { fs.delete(tmp, false); () } catch { case _: Throwable => () }
        if (!fs.exists(finalPath))
          throw new java.io.IOException(s"shard commit failed: $finalPath")
      }
    } else {
      fs.delete(tmp, false)
      ()
    }
  }
}
