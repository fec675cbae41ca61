package graft.api

import org.apache.spark.SparkFiles
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Artifact distribution (reference: file_distribution/ — P2P download of
  * model weights etc. to every node). Spark already ships two P2P
  * mechanisms, so this is a thin veneer:
  *
  *  - [[distributeFile]]/[[localPath]]: `SparkContext.addFile` replicates a
  *    file to every executor's scratch dir (fetched once per node, served
  *    from the driver/NM — the reference's ObjectDownloadRequest analogue).
  *  - [[broadcastObject]]: torrent-broadcast an in-memory object (Spark's
  *    BitTorrent-style broadcast IS peer-to-peer chunk distribution).
  *
  * Stages resolve artifacts inside `setup()`/`setupOnNode()` — exactly
  * where the reference guarantees downloads have landed.
  */
/** A declarative per-stage artifact (reference: DownloadRequest /
  * ObjectDownloadRequest / PrefixDownloadRequest, file_distribution/).
  * Listed in [[Stage.downloadRequests]]; the pipeline resolves it via
  * [[Artifacts]] before the stage compiles. Executors read it at
  * [[localPath]] (Spark controls the scratch location, so there is no
  * `destination` override — the reference's destination path maps to the
  * executor-local SparkFiles dir).
  *
  *  - `unpack = true` → the reference's ObjectDownloadRequest with
  *    unpacking: the archive (zip/tar/jar) is distributed once per node
  *    and EXTRACTED; [[localPath]] is the extracted directory.
  *  - `recursive = true` → PrefixDownloadRequest: `uri` names a
  *    directory whose whole tree is distributed; [[localPath]] is the
  *    replicated directory.
  */
final case class DownloadRequest(
    uri: String,
    unpack: Boolean = false,
    recursive: Boolean = false) {
  /** Basename the artifact is registered under on every executor. */
  def fileName: String = uri.split('/').last

  /** Executor-side absolute local path (valid once the stage runs): the
    * file, the extracted archive dir (`unpack`), or the replicated
    * directory (`recursive`).
    */
  def localPath: String = Artifacts.localPath(fileName)
}

object Artifacts {

  /** Register a file (local path or any Hadoop-visible URI) for
    * distribution to all executors.
    */
  def distributeFile(spark: SparkSession, path: String): Unit =
    spark.sparkContext.addFile(path)

  /** Register a whole directory tree for distribution (the reference's
    * PrefixDownloadRequest: "download all files under a prefix").
    */
  def distributeDirectory(spark: SparkSession, path: String): Unit =
    spark.sparkContext.addFile(path, recursive = true)

  /** Register an archive (zip/tar/jar) distributed once per node and
    * unpacked there (the reference's ObjectDownloadRequest with
    * `unpack`); Spark fetches it via the same torrent-style mechanism and
    * extracts it next to the other SparkFiles.
    */
  def distributeArchive(spark: SparkSession, path: String): Unit =
    spark.sparkContext.addArchive(path)

  /** Resolve a [[DownloadRequest]] on the driver. */
  def resolve(spark: SparkSession, r: DownloadRequest): Unit =
    if (r.unpack) distributeArchive(spark, r.uri)
    else if (r.recursive) distributeDirectory(spark, r.uri)
    else distributeFile(spark, r.uri)

  /** [[resolve]], once per (session, request): a request already resolved
    * this session — by [[downloadAll]]'s prefetch, by an earlier stage of
    * the same pipeline, or by a pipeline re-compile — is a no-op instead
    * of a repeat `addFile` (which WARNs on a same-content re-add and
    * THROWS on a changed-content one mid-pipeline). This is what makes
    * prefetch + per-stage resolution compose: the pipeline compiler calls
    * this for every stage, and stages whose artifacts were prefetched
    * cost nothing.
    */
  def resolveOnce(spark: SparkSession, r: DownloadRequest): Unit =
    graft.functions.Registration.once(spark,
      s"artifact:${r.unpack}:${r.recursive}:${r.uri}") {
      resolve(spark, r)
    }

  /** Collect `downloadRequests` across stages and deduplicate them,
    * order-preserving (reference: `download_artifacts`'s collection +
    * `_deduplicate_download_requests`, pipelines/private/pipelines.py:228
    * and :157 — uniqueness there is (uri, destination, unpack
    * destination); Spark owns the destination, so the key here is the
    * full request: (uri, unpack, recursive)).
    */
  def collectRequests(stages: Seq[Stage[_, _]]): Seq[DownloadRequest] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[DownloadRequest]
    stages.foreach(st => st.downloadRequests.foreach(seen.add))
    seen.toSeq
  }

  /** Cross-stage artifact prefetch (reference: `download_artifacts(stages,
    * config)`, pipelines/private/pipelines.py:228): collect every stage's
    * `downloadRequests`, dedup, and resolve them ALL before the first
    * stage compiles — so a pipeline whose stages share model weights
    * distributes them once, up front, instead of serializing a 50 GB
    * fetch into each stage's compile. The reference's
    * DistributedDownloadConfig (chunking, node parallelism, P2P) maps to
    * Spark's own fetch layer — torrent-style, once per node — so there is
    * no config to carry; `quota` is the optional admission policy
    * ([[ArtifactManager]] — its ledger dedups by uri too, so prefetch and
    * later per-stage `distribute` calls stay idempotent under one quota).
    * Returns the number of distinct requests resolved.
    */
  def downloadAll(spark: SparkSession, stages: Seq[Stage[_, _]],
      quota: Option[ArtifactManager] = None): Int = {
    val reqs = collectRequests(stages)
    reqs.foreach { r =>
      quota match {
        // ALWAYS route through the manager — its ledger dedups by uri, and
        // its resolve goes through resolveOnce, so the session-wide once
        // mark is set as a side effect. Guarding this call with the same
        // once key would let a request already resolved by a PLAIN
        // resolveOnce (an earlier pipeline compile) skip the ledger
        // entirely, under-counting admission for every later distribute.
        case Some(m) => m.distribute(r); ()
        case None => resolveOnce(spark, r)
      }
    }
    reqs.size
  }

  /** Executor-side: absolute local path of a distributed file. */
  def localPath(fileName: String): String = SparkFiles.get(fileName)

  /** Torrent-broadcast an object (e.g. a small model, a plane matrix). */
  def broadcastObject[T: scala.reflect.ClassTag](spark: SparkSession, value: T): Broadcast[T] =
    spark.sparkContext.broadcast(value)
}

/** Background cross-stage artifact prefetch (reference:
  * `BackgroundArtifactDownloader`, pipelines/private/pipelines.py:294):
  * start [[Artifacts.downloadAll]] on a daemon thread at construction and
  * keep doing other driver work — cluster warmup, input listing, plan
  * validation — while the artifacts distribute; call [[await]] (or
  * [[close]], e.g. via `scala.util.Using`) before running the pipeline.
  * Failure surfaces AT THE WAIT, never silently: an exception from the
  * download thread is unwrapped and rethrown by `await`/`close`, exactly
  * the reference's future-result contract.
  *
  * Racing the pipeline compiler is safe: the per-stage
  * [[Artifacts.resolveOnce]] BLOCKS on a key whose resolution is still
  * in flight on this thread's behalf (Registration.once completes-before
  * semantics), so a compile never submits a stage whose artifact is only
  * half-resolved. Waiting first is still the contract — it is what
  * guarantees "downloads have landed before setup()" and surfaces
  * download failures at a predictable point.
  */
final class BackgroundArtifactDownloader(
    spark: SparkSession, stages: Seq[Stage[_, _]],
    quota: Option[ArtifactManager] = None) extends AutoCloseable {

  private val exec = java.util.concurrent.Executors.newSingleThreadExecutor { r =>
    val t = new Thread(r, "graft-artifact-downloader")
    t.setDaemon(true)
    t
  }
  private val fut: java.util.concurrent.Future[Int] =
    exec.submit(new java.util.concurrent.Callable[Int] {
      override def call(): Int = Artifacts.downloadAll(spark, stages, quota)
    })

  /** True once the download finished — successfully or with an error
    * (which [[await]] will rethrow).
    */
  def isComplete: Boolean = fut.isDone

  /** Block until every artifact is distributed; returns the number of
    * distinct requests resolved. Rethrows the download thread's failure
    * unwrapped. Idempotent — a second await returns the same result.
    */
  def await(): Int =
    try fut.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }

  /** [[await]] + thread cleanup (the context-manager exit). */
  override def close(): Unit =
    try { await(); () } finally exec.shutdown()
}

/** Quota/cache-managed artifact distribution (reference:
  * file_distribution/data_plane.rs + object_store_download.rs — chunked
  * P2P distribution with per-node disk quotas and cache reuse). Spark's
  * fetch layer already IS the chunked transport (torrent broadcast /
  * driver-served files, fetched once per node and reused from the
  * executor cache); what Spark lacks is the ADMISSION policy — nothing
  * stops a pipeline from registering more artifact bytes than executor
  * scratch disks hold. This manager adds that policy on the driver:
  *
  *  - **cache reuse**: a `uri` already registered is a no-op (the
  *    per-node fetch cache already serves repeat readers; Spark itself
  *    would warn on a same-content re-add and THROW on a changed-content
  *    one, neither of which a pipeline re-running a stage wants).
  *  - **disk quota**: a registration pushing the total artifact bytes
  *    past `quotaBytes` fails fast on the driver — with the usage
  *    breakdown — before any executor starts fetching a doomed
  *    download (the reference's disk-quota check, data_plane.rs).
  *  - **eviction**: none HERE, by design — SparkFiles live for the
  *    application (Spark's executor cache cleans at app end), so this
  *    manager is the right home for static artifact sets. Pipelines
  *    that must ROTATE artifact sets mid-job (the reference's data
  *    plane evicts under disk pressure, data_plane.rs) use
  *    [[EvictableArtifactCache]] below, whose broadcast-backed plane
  *    supports true LRU delete + re-register.
  *
  * Sizes are resolved through the Hadoop filesystem of each uri
  * (local/HDFS/object store alike); directories count their full tree.
  */
final class ArtifactManager(spark: SparkSession, quotaBytes: Long) {
  require(quotaBytes > 0, "quotaBytes must be positive")
  private val registered = scala.collection.concurrent.TrieMap.empty[String, Long]

  def usedBytes: Long = registered.values.sum
  def registeredUris: Seq[String] = registered.keys.toSeq.sorted

  /** Distribute unless already registered (cache reuse); enforce the
    * quota before Spark starts shipping anything. Returns the request so
    * stages can chain `.localPath`. The resolve goes through
    * [[Artifacts.resolveOnce]]: an artifact a plain (unmanaged) resolve
    * already shipped this session is not re-added — but it still enters
    * THIS ledger, so admission accounting reflects every distributed
    * byte even when the manager is introduced after a first compile.
    */
  def distribute(r: DownloadRequest): DownloadRequest = synchronized {
    if (!registered.contains(r.uri)) {
      val size = sizeOf(r.uri)
      val used = usedBytes
      if (used + size > quotaBytes) {
        val breakdown = registered.toSeq.sortBy(_._1)
          .map { case (u, s) => s"  $u: $s bytes" }.mkString("\n")
        throw new IllegalStateException(
          s"artifact quota exceeded: ${r.uri} needs $size bytes but only " +
            s"${quotaBytes - used} of $quotaBytes remain.\nRegistered:\n$breakdown")
      }
      Artifacts.resolveOnce(spark, r)
      registered.put(r.uri, size)
    }
    r
  }

  /** Recursive byte size through the uri's Hadoop filesystem. */
  private def sizeOf(uri: String): Long = {
    val p = new org.apache.hadoop.fs.Path(uri)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).getContentSummary(p).getLength
  }
}

/** Serializable executor-side handle to an artifact distributed through
  * [[EvictableArtifactCache]]. `localFile` lazily materializes the
  * broadcast bytes into a per-JVM cache directory (atomic tmp+rename, so
  * concurrent task threads race safely) and returns the absolute path —
  * call it inside `setup()` exactly like [[DownloadRequest.localPath]].
  * The file name is CONTENT-addressed (hash of the bytes + basename), so
  * a re-registered uri with new content never serves a stale copy, and a
  * handle whose artifact was evicted fails loud: its broadcast is
  * destroyed, so the next materialization attempt throws rather than
  * silently reading old bytes.
  */
final case class ArtifactHandle private[api] (
    name: String, cacheDirName: String, bc: Broadcast[Array[Byte]]) {
  def localFile: String = {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"), cacheDirName)
    val f = new java.io.File(dir, name)
    if (!f.exists()) {
      val bytes = bc.value // throws if the artifact was evicted — fail loud
      dir.mkdirs()
      val tmp = java.io.File.createTempFile(name + ".", ".part", dir)
      val out = new java.io.FileOutputStream(tmp)
      try out.write(bytes) finally out.close()
      // rename-over is atomic per POSIX; losing the race to another
      // thread/task is fine — the winner wrote identical bytes
      if (!tmp.renameTo(f) && !f.exists())
        throw new java.io.IOException(s"could not materialize artifact $name in $dir")
      if (tmp.exists()) { tmp.delete(); () }
    }
    f.getAbsolutePath
  }
}

/** Mid-job artifact ROTATION with LRU eviction (reference:
  * file_distribution/data_plane.rs — the data plane owns its cached
  * files and evicts them under disk pressure while the job runs).
  * [[ArtifactManager]] cannot offer that on SparkFiles (they are
  * app-scoped with no removal API), so this cache owns its own data
  * plane built from primitives Spark CAN reclaim:
  *
  *  - **distribution** is torrent broadcast (the same P2P chunk
  *    transport the reference implements by hand): `register(uri)`
  *    reads the bytes once on the driver through the uri's Hadoop
  *    filesystem and broadcasts them; executors materialize lazily via
  *    [[ArtifactHandle.localFile]], so a node that never touches an
  *    artifact never stores it.
  *  - **LRU eviction**: a registration that would push `usedBytes` past
  *    `quotaBytes` first evicts least-recently-used entries (recency =
  *    last `register`/`acquire` on the driver, where every pipeline
  *    compile/stage-setup acquisition flows) until the newcomer fits.
  *    Eviction destroys the broadcast (reclaiming executor block store
  *    everywhere, Spark-guaranteed) and runs a best-effort cleanup job
  *    deleting the materialized cache file on every executor the job
  *    lands on (exact under local/local-cluster; on a large cluster any
  *    missed straggler file is bounded by the content-addressed naming
  *    — it can never be served for new content — and dies at app end).
  *  - **delete + re-register**: an evicted uri registers again from
  *    scratch — re-read, re-broadcast, fresh content-addressed name —
  *    which is the reference's cache-miss-after-eviction path.
  *
  * A single artifact larger than the whole quota fails loud (nothing to
  * evict would help). Directories/archives are out of scope — rotation
  * is for model-weight-shaped single files; static trees stay on
  * [[ArtifactManager]].
  */
final class EvictableArtifactCache(spark: SparkSession, quotaBytes: Long) {
  require(quotaBytes > 0, "quotaBytes must be positive")

  private final class Entry(
      val handle: ArtifactHandle, val size: Long,
      val srcLen: Long, val srcMtime: Long, var lastUsed: Long)
  private val entries = scala.collection.mutable.HashMap.empty[String, Entry]
  private var clock = 0L
  private var evicted = 0L
  private val cacheDirName =
    s"graft-artifacts-${spark.sparkContext.applicationId}"

  def usedBytes: Long = synchronized { entries.valuesIterator.map(_.size).sum }
  def registeredUris: Seq[String] = synchronized { entries.keys.toSeq.sorted }
  def evictionCount: Long = synchronized { evicted }

  /** Distribute `uri` and return the executor-usable handle. An
    * already-registered uri whose source is unchanged (same length +
    * modification time — one FS stat per call) is an LRU touch + the
    * existing handle; a CHANGED source rotates in place (evict + fresh
    * read/broadcast), which is what keeps [[ArtifactHandle]]'s
    * never-stale promise honest for in-place file replacement, not just
    * for post-eviction re-registration. The change check is
    * length+mtime (the rsync quick-check trade): an equal-length edit
    * inside one mtime tick is indistinguishable without re-hashing the
    * content — replace artifacts by writing a new file when that
    * matters. Because register re-validates, it STATs the source every
    * call and fails if the source is gone; stages that only need the
    * already-distributed handle (source possibly cleaned up) use
    * [[acquire]], which never touches the source.
    *
    * Concurrency: the slow work — the source stat, the (possibly
    * multi-GB, possibly remote-FS) read, and the broadcast — runs
    * OUTSIDE the cache monitor, under a per-uri in-flight lock, so a
    * large registration never blocks `acquire`/`register` of OTHER
    * artifacts; only the ledger update + eviction sweep take the cache
    * monitor, and they are pure in-memory bookkeeping. Concurrent
    * registrations of the SAME uri serialize on the per-uri lock, so
    * the source is still read and broadcast at most once per change.
    */
  def register(uri: String): ArtifactHandle =
    loadLocks.computeIfAbsent(uri, _ => new Object).synchronized {
      val st = statOf(uri)
      val cached = synchronized {
        entries.get(uri) match {
          case Some(e) if e.srcLen == st.getLen && e.srcMtime == st.getModificationTime =>
            clock += 1; e.lastUsed = clock; Some(e.handle)
          case _ => None // absent, or changed on disk: rotate below
        }
      }
      cached.getOrElse {
        // admission BEFORE reading: a 10 GB file against a 1 GB quota
        // must fail with the quota error, not an OOM mid-read; and the
        // JVM cannot hold (or broadcast) a >2 GB byte array at all
        if (st.getLen > quotaBytes)
          throw new IllegalStateException(
            s"artifact quota exceeded: $uri is ${st.getLen} bytes, over the " +
              s"whole $quotaBytes-byte quota — eviction cannot make room")
        require(st.getLen < Int.MaxValue - 16,
          s"artifact $uri is ${st.getLen} bytes — beyond the JVM array/broadcast " +
            "limit; ship it as multiple files")
        val bytes = readBytes(uri, st.getLen.toInt)
        val digest = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
          .take(6).map(b => f"$b%02x").mkString
        val handle = ArtifactHandle(
          s"$digest-${uri.split('/').last}", cacheDirName,
          spark.sparkContext.broadcast(bytes))
        val cleanups = synchronized {
          clock += 1
          val pending = scala.collection.mutable.ListBuffer.empty[(String, String)]
          entries.get(uri).foreach(e => pending += drop(uri, e)) // rotate stale
          while (usedBytes + bytes.length > quotaBytes) pending += evictLru()
          entries.put(uri,
            new Entry(handle, bytes.length.toLong, st.getLen, st.getModificationTime, clock))
          pending.toSeq
        }
        runCleanups(cleanups)
        handle
      }
    }

  /** Per-uri in-flight registration locks (see [[register]]). Grows with
    * |distinct uris| — lock objects, not artifact bytes.
    */
  private val loadLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** LRU-touching lookup for stages that expect the artifact to already
    * be registered (fails loud on a miss instead of re-reading a uri the
    * pipeline never declared).
    */
  def acquire(uri: String): ArtifactHandle = synchronized {
    val e = entries.getOrElse(uri, throw new NoSuchElementException(
      s"artifact not registered: $uri (registered: ${registeredUris.mkString(", ")})"))
    clock += 1; e.lastUsed = clock; e.handle
  }

  /** Explicit eviction (rotation); true if the uri was present. */
  def evict(uri: String): Boolean = {
    val dropped = synchronized {
      entries.get(uri).map { e => drop(uri, e) }
    }
    dropped.foreach(c => runCleanups(Seq(c)))
    dropped.isDefined
  }

  private def evictLru(): (String, String) = {
    if (entries.isEmpty)
      throw new IllegalStateException("artifact quota eviction underflow") // unreachable: size pre-checked
    val (uri, e) = entries.minBy(_._2.lastUsed)
    drop(uri, e)
  }

  /** Drop the ledger entry and destroy the broadcast (fast, driver-RPC);
    * returns the (dirName, fileName) whose materialized executor copies
    * still need the deferred best-effort cleanup — run it via
    * [[runCleanups]] AFTER releasing the cache monitor, so concurrent
    * register/acquire calls never block behind a cluster job.
    */
  private def drop(uri: String, e: Entry): (String, String) = {
    entries.remove(uri)
    evicted += 1
    // reclaim the P2P copies everywhere (Spark removes the broadcast
    // blocks from every executor's block store)
    e.handle.bc.destroy()
    (e.handle.cacheDirName, e.handle.name)
  }

  /** Best-effort executor-side cache-file deletion (one tiny job per
    * batch of evictions). Best-effort MEANS best-effort: a failed
    * cleanup job (executor churn mid-eviction — likely under exactly the
    * pressure that triggers eviction) must not abort the registration
    * that caused it; the content-addressed names already make any
    * straggler file unservable.
    */
  private def runCleanups(targets: Seq[(String, String)]): Unit =
    if (targets.nonEmpty) {
      val n = math.max(spark.sparkContext.defaultParallelism, 1)
      val local = targets.toArray // closure-clean: no Entry/Broadcast captured
      try spark.sparkContext.parallelize(0 until n, n).foreach { _ =>
        local.foreach { case (dirName, fileName) =>
          val f = new java.io.File(
            new java.io.File(System.getProperty("java.io.tmpdir"), dirName), fileName)
          f.delete() // absent = already clean
          ()
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"artifact cache cleanup job failed (best-effort): ${e.getMessage}")
      }
    }

  private def statOf(uri: String): org.apache.hadoop.fs.FileStatus = {
    val p = new org.apache.hadoop.fs.Path(uri)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    require(st.isFile,
      s"EvictableArtifactCache rotates single files; $uri is a directory — " +
        "use ArtifactManager/distributeDirectory for static trees")
    st
  }

  private def readBytes(uri: String, sizeHint: Int): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(uri)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream(sizeHint.max(64))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
}
