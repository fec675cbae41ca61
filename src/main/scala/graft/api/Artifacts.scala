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
