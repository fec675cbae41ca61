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

  /** Executor-side: absolute local path of a distributed file. */
  def localPath(fileName: String): String = SparkFiles.get(fileName)

  /** Torrent-broadcast an object (e.g. a small model, a plane matrix). */
  def broadcastObject[T: scala.reflect.ClassTag](spark: SparkSession, value: T): Broadcast[T] =
    spark.sparkContext.broadcast(value)
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
  *  - **eviction**: none, by design — SparkFiles live for the
  *    application (the reference's data plane owns its files and can
  *    evict mid-job; Spark's executor cache cleans at app end).
  *    Pipelines that must rotate truly huge artifact sets split at a
  *    storage boundary (Batch-mode persist) into separate applications.
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
    * stages can chain `.localPath`.
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
      Artifacts.resolve(spark, r)
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
