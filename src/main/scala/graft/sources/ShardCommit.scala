package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Task-side output commit for the shard writers ([[TarShards.write]],
  * [[WarcShards.write]]). Without a commit protocol, a speculative
  * duplicate or a zombie first attempt racing its retry streams into the
  * SAME final shard concurrently — yielding an interleaved/truncated
  * archive that can still parse, i.e. silent corruption at cluster
  * scale. Two protocols, chosen per filesystem semantics:
  *
  *   - [[Rename]] (default): write to an attempt-unique temp path,
  *     rename into place on success. Correct where rename is an atomic
  *     metadata op that fails on an existing destination (HDFS, local
  *     POSIX). Commit rule: first-committer-wins — attempts of one
  *     partition produce byte-identical shards (both writers are
  *     deterministic functions of the partition's rows — name-based
  *     UUIDs, mtime 0, no RNG), so whichever attempt's rename lands is
  *     correct and the loser deletes its temp file. A failed/abandoned
  *     attempt leaves only a `_tmp-*` file, which readers never match
  *     (`*.tar` / `*.warc.gz` globs) and overwrite-mode reruns delete
  *     with the directory.
  *
  *   - [[Publish]]: S3-class object stores have NO atomic rename (a
  *     "rename" is copy+delete, and two committers can interleave), so
  *     100 TB corpora — which live on object stores — need commit
  *     WITHOUT rename. Each attempt writes its bytes to an
  *     ATTEMPT-UNIQUE FINAL name (`shard-00042-a00000007.tar` — no two
  *     attempts ever touch the same object, so no write races exist at
  *     all), and after the job the driver elects one winner per shard
  *     ([[publish]]), deletes loser attempts, and publishes the
  *     authoritative shard list through [[Manifests]]. Readers,
  *     compaction and the key index then consume ONLY manifest-listed
  *     files ([[Manifests.listedGlob]]); a zombie attempt that lands
  *     bytes after publish is invisible to them and is flagged `extra`
  *     by [[Manifests.verify]]/[[Manifests.check]] for maintenance to
  *     sweep. (Reliability parity anchor: the reference ships artifacts
  *     through content-addressed names + a published catalog rather than
  *     renames — reference file_distribution/_file_distribution.py —
  *     applied here to the data plane.)
  */
object ShardCommit {

  /** Commit protocol for shard writers. */
  sealed trait Mode
  /** Temp + atomic rename — HDFS / local POSIX. */
  case object Rename extends Mode
  /** Attempt-unique final objects + driver-elected manifest — object
    * stores without atomic rename.
    */
  case object Publish extends Mode

  /** `shard-00042.tar` → `shard-00042-a00000007.tar` (fixed-width
    * attempt so lexicographic order == numeric order — winner election
    * takes the minimum name).
    */
  private[sources] def attemptName(finalName: String, attempt: Long): String = {
    val dot = finalName.indexOf('.')
    val (stem, ext) = if (dot < 0) (finalName, "") else finalName.splitAt(dot)
    f"$stem-a$attempt%08d$ext"
  }

  /** The logical shard name of an attempt file, or None if the name is
    * not attempt-suffixed. Accepts 8+ digits: `%08d` zero-pads to AT
    * LEAST 8 but a long-running application's task-attempt counter can
    * pass 10^8, and an unmatched attempt file would silently drop its
    * shard from the publish election — data loss, not a formatting
    * nit. (Election past that boundary is still deterministic — any
    * winner is correct, attempts are byte-identical.)
    */
  private[sources] def logicalName(attemptFile: String): Option[String] = {
    val m = "-a(\\d{8,})(\\.|$)".r.findFirstMatchIn(attemptFile)
    m.map(mm => attemptFile.substring(0, mm.start) +
      attemptFile.substring(mm.start + 2 + mm.group(1).length))
  }

  /** Runs `body` against a stream for `finalPath`'s shard; `body`
    * returns true if anything was written. An empty partition leaves no
    * shard file, matching the writers' empty-archive rule.
    */
  private[sources] def withCommit(conf: SerializableHadoopConf, finalPath: Path,
      mode: Mode = Rename)(body: java.io.OutputStream => Boolean): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    val attempt = if (tc == null) 0L else tc.taskAttemptId()
    val fs = finalPath.getFileSystem(conf.value)
    val target = mode match {
      case Rename => new Path(finalPath.getParent,
        s"_tmp-${finalPath.getName}.attempt-$attempt")
      case Publish => new Path(finalPath.getParent,
        attemptName(finalPath.getName, attempt))
    }
    val stream = fs.create(target, true)
    var wrote = false
    try {
      wrote = body(stream)
      stream.close()
    } catch {
      case e: Throwable =>
        try stream.close() catch { case _: Throwable => () }
        try { fs.delete(target, false); () } catch { case _: Throwable => () }
        throw e
    }
    mode match {
      case Publish =>
        // attempt-unique final object: nothing to move. Losers/zombies
        // are resolved by publish(); an empty partition leaves nothing.
        if (!wrote) { fs.delete(target, false); () }
      case Rename =>
        if (wrote) {
          // rename FIRST: the common uncontended path commits in one
          // atomic metadata op, and a zombie attempt can no longer
          // delete a shard a winner already committed and then die (the
          // old delete-then-rename window). Only when the destination
          // is occupied (an earlier attempt's byte-identical shard)
          // delete-and-retry once — shrinking any remaining race to the
          // filesystem's own rename atomicity. On stores WITHOUT atomic
          // rename use Publish; Manifests.write/check after the job is
          // the backstop either way.
          if (!fs.rename(target, finalPath)) {
            fs.delete(finalPath, false)
            if (!fs.rename(target, finalPath)) {
              try { fs.delete(target, false); () } catch { case _: Throwable => () }
              if (!fs.exists(finalPath))
                throw new java.io.IOException(s"shard commit failed: $finalPath")
            }
          }
        } else {
          fs.delete(target, false)
          ()
        }
    }
  }

  /** Driver-side election + manifest publication for a [[Publish]]-mode
    * write: among `shard-*-aNNNNNNNN<ext>` attempt files under `path`,
    * the lexicographically-first attempt of each logical shard wins
    * (attempts are byte-identical — the writers' determinism contract —
    * so ANY choice is correct; first = deterministic), losers are
    * deleted best-effort, and the winner list is published as the
    * authoritative `_MANIFEST.jsonl` (bytes + SHA-256 via
    * [[Manifests.write]]'s digest — the integrity layer and the commit
    * ledger are the same artifact). Readers consume only
    * [[Manifests.listedGlob]] from here on.
    */
  def publish(spark: SparkSession, path: String, ext: String): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listed = Option(fs.globStatus(new Path(path, s"*-a[0-9]*$ext")))
      .getOrElse(Array.empty)
    val byShard = listed.flatMap { st =>
      val name = st.getPath.getName
      logicalName(name).map(_ => name)
    }.sorted.groupBy(n => logicalName(n).get)
    val winners = byShard.values.map(_.head).toSeq.sorted
    val losers = byShard.values.flatMap(_.tail)
    losers.foreach { l =>
      try { fs.delete(new Path(path, l), false); () }
      catch { case _: Throwable => () } // a zombie may even rewrite it;
      // harmless — readers trust only the manifest
    }
    Manifests.writeFor(spark, path,
      if (winners.isEmpty) "*.__none__" else winners.mkString("{", ",", "}"),
      allowEmpty = true)
  }
}
