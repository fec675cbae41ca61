package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shard-directory manifests: per-file byte counts + SHA-256, the
  * integrity layer under [[TarShards]]/[[WarcShards]] (and any other
  * shard directory). At 100 TB a corpus is ~100k shards that outlive
  * the job that wrote them and cross machines, object stores and
  * transfer tools; a training run reading a silently-truncated or
  * bit-flipped shard poisons everything downstream with no error at
  * read time (tar/gzip both happily parse a prefix of a damaged file).
  * The manifest makes corruption, loss and drift DETECTABLE: write one
  * after producing shards, [[verify]] before consuming them.
  *
  * Scale shape: hashing is a distributed full scan (one task per shard
  * via binaryFile, each a single sequential read — the same IO pattern
  * as consuming the shards, and the only way to notice rot); the
  * manifest itself is |shards| rows of metadata, collected to the
  * driver and written as one sorted JSON-lines file (100k shards ≈ a
  * few MB — driver-bounded by design, like the writers' listing-driven
  * compaction). `_MANIFEST.jsonl` starts with an underscore so the
  * shard readers' globs (`*.tar`, `*.warc.gz`) never match it.
  */
object Manifests {

  val FileName = "_MANIFEST.jsonl"

  /** One row per shard file: (file, bytes, sha256) — distributed scan,
    * metadata-sized result.
    */
  def digest(spark: SparkSession, path: String, glob: String): DataFrame =
    Tables.binaryFiles(spark, path, glob)
      .select(
        element_at(split(col("path"), "/"), -1).as("file"),
        col("length").as("bytes"),
        sha2(col("content"), 256).as("sha256"))

  /** Digest the shards matched by `glob` and write `_MANIFEST.jsonl`
    * (sorted by file name, one JSON object per line, temp+rename
    * committed). Call it right after a write/compact — the maintenance
    * step owns the manifest like it owns compaction.
    */
  def write(spark: SparkSession, path: String, glob: String = "*"): Unit =
    writeFor(spark, path, glob, allowEmpty = false)

  /** [[write]] with an explicit empty policy — [[ShardCommit.publish]]
    * legitimately publishes an EMPTY manifest when every partition was
    * empty (readers then see an empty-but-committed corpus, which is
    * different from "nobody published here yet").
    */
  private[sources] def writeFor(spark: SparkSession, path: String,
      glob: String, allowEmpty: Boolean): Unit = {
    val rows = digest(spark, path, glob)
      .orderBy("file")
      .select(to_json(struct(col("file"), col("bytes"), col("sha256"))).as("j"))
      .collect().map(_.getString(0)) // |shards| metadata rows, driver-bounded
    require(allowEmpty || rows.nonEmpty, s"no shards match $path/$glob")
    val p = new org.apache.hadoop.fs.Path(path, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path, s"_tmp-$FileName")
    val out = fs.create(tmp, true)
    try out.write(rows.map(_ + "\n").mkString.getBytes("UTF-8"))
    finally out.close()
    // rename FIRST, delete-and-retry only on failure (the ShardCommit
    // Rename discipline): deleting the live manifest before the rename
    // lands would leave a published corpus looking unpublished to any
    // reader in the window — and permanently on a crash between the two
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"manifest commit failed: $tmp -> $p")
    }
    ()
  }

  /** The manifest's file list (sorted) — the authoritative shard set of
    * a [[ShardCommit.Publish]]-mode directory. Driver-side metadata read
    * (|shards| lines).
    */
  def listedFiles(spark: SparkSession, path: String): Seq[String] =
    readLines(spark, path).map { l =>
      val m = "\"file\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(l)
      require(m.isDefined, s"manifest line without a file field: ${l.take(80)}")
      m.get.group(1)
    }.sorted

  /** A `{f1,f2,…}` listing glob over the manifest's files — pass as the
    * `glob` of [[TarShards.entries]]/[[WarcShards.records]]/compaction
    * so readers consume ONLY published shards (the object-store commit
    * contract: orphan attempt files from zombie writers sit in the same
    * directory but are never listed here). An empty manifest yields a
    * cannot-match glob (a valid empty relation, like
    * [[TarShards.lookupSamples]] with zero hits).
    */
  def listedGlob(spark: SparkSession, path: String): String = {
    val files = listedFiles(spark, path)
    if (files.isEmpty) "*.__none__" else files.mkString("{", ",", "}")
  }

  /** Post-maintenance manifest upkeep: if (and only if) the directory is
    * manifest-published, swap `removed` files out of the authoritative
    * list and digest `added` ones in — compaction moves bytes, so the
    * manifest it invalidates must be re-owned in the same maintenance
    * step (the key-index deletion discipline, applied to the commit
    * ledger). No-op when no manifest exists (a plain rename-committed
    * directory).
    */
  def refresh(spark: SparkSession, path: String, removed: Seq[String],
      added: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val keep = (listedFiles(spark, path).toSet -- removed) ++ added
    writeFor(spark, path,
      if (keep.isEmpty) "*.__none__" else keep.toSeq.sorted.mkString("{", ",", "}"),
      allowEmpty = true)
  }

  private def readLines(spark: SparkSession, path: String): List[String] = {
    val p = new org.apache.hadoop.fs.Path(path, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no $FileName under $path — write() one first")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Re-digest the directory and diff it against `_MANIFEST.jsonl`.
    * Returns (file, status, manifest_bytes, actual_bytes) with status
    * `changed` (hash differs — truncation, bit rot, overwrite),
    * `missing` (manifested file gone) or `extra` (file present but not
    * manifested — a foreign or partial write). Empty result = intact.
    * The diff is a full-outer join of two |shards|-row metadata frames.
    */
  def verify(spark: SparkSession, path: String, glob: String = "*"): DataFrame = {
    // read driver-side: Spark's file index skips underscore-prefixed
    // paths (the very property that hides the manifest from shard
    // globs), and the manifest is |shards| rows of metadata anyway
    val lines = readLines(spark, path)
    import spark.implicits._
    val want = spark.read.schema("file STRING, bytes LONG, sha256 STRING")
      .json(spark.createDataset(lines))
      .withColumnRenamed("bytes", "manifest_bytes")
      .withColumnRenamed("sha256", "manifest_sha")
    val got = digest(spark, path, glob)
      .withColumnRenamed("bytes", "actual_bytes")
      .withColumnRenamed("sha256", "actual_sha")
    want.join(got, Seq("file"), "full_outer")
      .withColumn("status",
        when(col("actual_sha").isNull, "missing")
          .when(col("manifest_sha").isNull, "extra")
          .when(col("manifest_sha") =!= col("actual_sha"), "changed"))
      .where(col("status").isNotNull)
      .select("file", "status", "manifest_bytes", "actual_bytes")
  }

  /** [[verify]] that fails loud — the pre-consumption gate: throws with
    * the first few offenders if anything is missing, changed or extra.
    */
  def check(spark: SparkSession, path: String, glob: String = "*"): Unit = {
    val bad = verify(spark, path, glob).limit(4).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"shard manifest violation under $path: " +
          bad.map(r => s"${r.getString(0)} ${r.getString(1)}").mkString(", "))
  }
}
