package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar-shard IO — the de-facto format for sharded
  * multimodal training data at the 100 TB scale this engine targets
  * (reference pipelines feed VLM workers from exactly such shards; see
  * examples/simple_vlm_inference.py's data loading stage). A shard is a
  * plain POSIX ustar archive whose members are sample files named
  * `<key>.<ext>` (e.g. `000123.jpg`, `000123.json`, `000123.txt`); a
  * SAMPLE is the group of members sharing a key.
  *
  * Scale design: the shard is the unit of parallelism AND of IO — one
  * task reads one shard front-to-back (pure sequential reads, the whole
  * point of the format: object stores and spinning disks both hate the
  * per-file random reads a exploded-directory layout causes at 1e9
  * samples). Shards are conventionally 100 MB–1 GB, so whole-shard
  * parsing bounds task memory by shard size; `binaryFiles` gives one row
  * per shard and Spark schedules shards across executors. The writer
  * STREAMS members out through the Hadoop filesystem (no whole-shard
  * buffering), one shard per partition — `df.repartition(n)` chooses the
  * shard count, a range-partition by key gives key-sorted shards.
  *
  * The ustar encode/decode here is self-contained (~60 lines: fixed
  * 512-byte headers, octal sizes, block padding) — no codec libraries,
  * and spec-anchored BOTH ways against GNU tar (our shards list/extract
  * with `tar`; `tar`-built archives parse with this reader).
  */
object TarShards {

  private val Block = 512

  /** One row per tar member across all shards matched by `path`/`glob`:
    * (shard, name, key, ext, content). Non-file members (directories,
    * symlinks, pax/gnu metadata blocks) are skipped.
    */
  def entries(spark: SparkSession, path: String, glob: String = "*.tar"): DataFrame = {
    import spark.implicits._
    Tables.binaryFiles(spark, path, glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        parse(bytes).map { case (name, data) =>
          val base = name.substring(name.lastIndexOf('/') + 1)
          val dot = base.lastIndexOf('.')
          val (key, ext) = if (dot <= 0) (base, "") else (base.substring(0, dot), base.substring(dot + 1))
          (shard, name, key, ext, data)
        }
      }
      .toDF("shard", "name", "key", "ext", "content")
  }

  /** One row per SAMPLE: (shard, key, exts, contents) with the two arrays
    * zipped ext-sorted — the WebDataset grouping. Grouping is per-shard
    * (keys never straddle shards by construction of the writer), so the
    * groupBy shuffles only within the natural shard partitioning.
    */
  def samples(spark: SparkSession, path: String, glob: String = "*.tar"): DataFrame =
    entries(spark, path, glob)
      .groupBy("shard", "key")
      .agg(sort_array(collect_list(struct(col("ext"), col("content")))).as("fs"))
      .select(col("shard"), col("key"),
        col("fs.ext").as("exts"), col("fs.content").as("contents"))

  /** Write (key, ext, content) rows as tar shards, one shard per
    * partition (`shard-%05d.tar`), members named `<key>.<ext>` and
    * emitted in partition order. Pass `shards = Some(n)` to let the
    * writer hash-partition BY KEY into n shards — the property
    * [[samples]] depends on (all of a sample's members in one shard; a
    * plain `repartition(n)` splits them, the row-level trap this
    * parameter exists to close). Omit it only when the input is already
    * key-colocated (e.g. sortWithinPartitions after a key repartition,
    * for key-sorted shards). Streams each member straight to the Hadoop
    * filesystem; memory is bounded by ONE member, not the shard. Rows
    * with a null/empty key or null content fail loud: a silently dropped
    * sample in training data is corruption, not convenience.
    *
    * `commit` picks the task-commit protocol: [[ShardCommit.Rename]]
    * (default — HDFS/local atomic rename) or [[ShardCommit.Publish]] for
    * S3-class object stores: attempt-unique final names, then a
    * driver-side election publishes the authoritative shard list as the
    * `_MANIFEST.jsonl`; read such a directory ONLY through
    * `Manifests.listedGlob(spark, path)` as the glob (zombie attempts
    * landing after publish are invisible to the manifest and flagged
    * `extra` by `Manifests.check`).
    */
  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.ErrorIfExists,
      shards: Option[Int] = None,
      commit: ShardCommit.Mode = ShardCommit.Rename): Unit = {
    val spark = df.sparkSession
    val hadoopConf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(hadoopConf.value)
    if (fs.exists(out)) mode match {
      case SaveMode.Overwrite => fs.delete(out, true); ()
      case SaveMode.ErrorIfExists =>
        throw new IllegalStateException(s"tar shard path exists: $path (use SaveMode.Overwrite)")
      case SaveMode.Ignore => return
      case SaveMode.Append =>
        throw new IllegalArgumentException("tar shards are immutable; Append unsupported")
    }
    fs.mkdirs(out)
    val pathStr = path
    val laid = shards.fold(df)(n => df.repartition(n, col("key")))
    laid.select(col("key").cast("string"), col("ext").cast("string"), col("content"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new org.apache.hadoop.fs.Path(f"$pathStr/shard-$pid%05d.tar")
        // task commit (rename or attempt-unique publish): concurrent
        // attempts (speculation, zombie-vs-retry) must never interleave
        // into one final shard
        ShardCommit.withCommit(hadoopConf, p, commit) { stream =>
          var wrote = false
          rows.foreach { r =>
            val key = r.getString(0)
            val ext = r.getString(1)
            val content = r.getAs[Array[Byte]](2)
            require(key != null && key.nonEmpty && content != null,
              s"tar shard rows need a non-empty key and non-null content (key=$key)")
            val name = if (ext == null || ext.isEmpty) key else s"$key.$ext"
            writeMember(stream, name, content)
            wrote = true
          }
          stream.write(new Array[Byte](2 * Block)) // end-of-archive marker
          // an empty partition leaves no shard file (empty archives are
          // valid tar but noise for readers)
          wrote
        }
      }
    if (commit == ShardCommit.Publish) ShardCommit.publish(spark, path, ".tar")
  }

  private val KeyIndexDir = "_keyindex"

  /** Build the sample-key index under `path/_keyindex`: one (shard, key)
    * parquet row per sample, written distributed (one task per shard —
    * the index build is a full sequential scan, same IO as one read of
    * the corpus; NEVER driver-collected, unlike the byte manifests).
    * This is the WebDataset `.idx` role done relationally: a training
    * or debugging job that needs a HANDFUL of samples out of 100k
    * shards must not scan 100 TB to find them. Shard names are stored
    * relative (file name only) so the index survives directory moves.
    * The underscore dir is invisible to the shard readers' globs and to
    * Spark's file index, exactly like `_MANIFEST.jsonl`.
    */
  /** TOKEN-balanced shard export — [[write]] sizes shards by key-hash
    * row distribution, but a training loader wants shards of ~equal
    * TOKEN budget (a shard is a unit of loader work; 10 long documents
    * can outweigh 10k short ones). Rides the verified q22 machinery:
    * [[graft.operators.Packing.packSequences]] greedily packs keys to
    * `budgetTokens` within `hashShards` deterministic hash shards
    * (scale: each shard packs independently — no global sort), each
    * (hash-shard, pack) pair becomes ONE tar, and placement uses an
    * IDENTITY partitioner over the dense global pack index (hash
    * repartition would collide two packs into one tar and double it).
    * The per-shard pack counts are the only driver state
    * (`hashShards` longs — metadata). All members of a key share its
    * pack (the sample-affinity contract of [[write]]); keys must be
    * numeric-castable (packSequences' contract — surrogate via polyHash
    * otherwise). Every tar's token total is ≤ `budgetTokens` unless a
    * single document exceeds the budget alone (greedy first-fit keeps
    * oversized docs in their own pack).
    *
    * `tokens` maps each key to its token count — one row per key
    * (dedupe upstream if the corpus carries it per member).
    */
  def writeTokenBalanced(df: DataFrame, tokens: DataFrame, path: String,
      budgetTokens: Long, hashShards: Int = 32, salt: String = "",
      mode: SaveMode = SaveMode.ErrorIfExists,
      commit: ShardCommit.Mode = ShardCommit.Rename): Unit = {
    require(hashShards >= 1, "hashShards must be >= 1")
    val spark = df.sparkSession
    val Seq(keyCol, tokCol) = tokens.columns.toSeq.take(2)
    val packs = graft.operators.Packing.packSequences(
      tokens, keyCol, tokCol, budgetTokens, hashShards, salt)
      .select(col(keyCol).cast("string").as("__pkey"),
        col("shard").as("__ws"), col("pack").as("__wp"))
    // dense global pack index: per-hash-shard pack counts are the only
    // driver state (|hashShards| longs)
    val counts = packs.groupBy("__ws").agg(max("__wp").as("mp"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) + 1)).sortBy(_._1)
    require(counts.nonEmpty, "writeTokenBalanced on an empty corpus")
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offsetMap = counts.map(_._1).zip(offsets).toMap
    val numTars = offsets.last + counts.last._2
    require(numTars <= 1000000, s"$numTars output shards — raise budgetTokens")
    // LEFT join + raise_error: a df key absent from `tokens` (or whose
    // string form differs from the numeric round-trip, e.g. "007" vs 7)
    // must FAIL LOUD — a silently dropped sample in training data is
    // corruption, the write() contract of this file. The round-trip
    // itself is checked FIRST: a fractional or padded key ("7.9", " 7")
    // would otherwise truncate onto an EXISTING tokens-table key and
    // silently join that key's pack — the join can't catch what the
    // cast has already collapsed.
    val joined = df
      .withColumn("__pkey",
        when(col("key").cast("long").isNull ||
            col("key").cast("string") =!= col("key").cast("long").cast("string"),
          raise_error(concat(
            lit("writeTokenBalanced: key is not a canonical long (lossy "),
            lit("numeric round-trip): '"),
            coalesce(col("key").cast("string"), lit("NULL")), lit("'")))
            .cast("string"))
          .otherwise(col("key").cast("long").cast("string")))
      .join(packs, Seq("__pkey"), "left")
      .withColumn("__gp",
        when(col("__ws").isNull, raise_error(concat(
          lit("writeTokenBalanced: key has no tokens-table row: "),
          col("key").cast("string"))).cast("long"))
          .otherwise(element_at(typedlit(offsetMap), col("__ws")) + col("__wp")))
      .select(col("key"), col("ext"), col("content"), col("__gp"))
    val schema = joined.schema
    val laid = joined.rdd
      .map(r => (r.getAs[Long]("__gp").toInt, r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = numTars.toInt
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    write(spark.createDataFrame(laid, schema).drop("__gp"), path, mode,
      shards = None, commit = commit)
  }

  def writeKeyIndex(spark: SparkSession, path: String, glob: String = "*.tar"): Unit =
    entries(spark, path, glob)
      .select(element_at(split(col("shard"), "/"), -1).as("shard"), col("key"))
      .distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$KeyIndexDir")

  /** The shards holding any of `keys`, per the key index — ≤ |keys|
    * names, driver-bounded by the lookup size (the index itself stays
    * distributed; only the hit LIST collects).
    */
  def shardsForKeys(spark: SparkSession, path: String, keys: Seq[String]): Seq[String] = {
    require(keys.nonEmpty, "shardsForKeys needs at least one key")
    spark.read.parquet(s"$path/$KeyIndexDir")
      .where(col("key").isin(keys: _*))
      .select("shard").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
  }

  /** Point access: [[samples]] for exactly `keys`, reading ONLY the
    * shards the key index maps them to (a `{a,b,…}` listing glob — the
    * other 100k shards are never opened). A hit shard missing from the
    * directory fails loud: the index is stale (compaction or manual
    * deletes since [[writeKeyIndex]]) and silently returning fewer
    * samples than indexed is training-data corruption.
    */
  def lookupSamples(spark: SparkSession, path: String, keys: Seq[String]): DataFrame = {
    val hit = shardsForKeys(spark, path, keys)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hit.foreach { s =>
      require(fs.exists(new org.apache.hadoop.fs.Path(path, s)),
        s"key index is stale: indexed shard $s is gone — re-run writeKeyIndex")
    }
    // no hits: a glob that cannot match keeps samples()'s schema with
    // zero shards opened (binaryFile has a fixed schema, so an empty
    // listing is a valid empty relation)
    val glob = if (hit.isEmpty) "*.__none__" else hit.mkString("{", ",", "}")
    samples(spark, path, glob).where(col("key").isin(keys: _*))
  }

  /** Compact small shards in place to ~`targetShardBytes` each — the
    * [[graft.sources.Sinks.compact]] discipline applied to tar shards.
    * Incremental ingestion (one shard per micro-batch partition) strews
    * thousands of tiny shards; since the shard is the unit of
    * parallelism AND of sequential IO, tiny shards turn a 100 TB read
    * into the per-file random-read storm the format exists to avoid.
    *
    * The shard count comes from the driver-side file LISTING (metadata
    * only — no data read): ceil(Σ shard bytes / target). Rows then
    * re-shard through [[write]]'s key-hash partitioning, so the
    * sample-affinity invariant [[samples]] depends on is re-established
    * no matter how the input shards were laid out. Tar archives cannot
    * be safely byte-concatenated (trailing zero blocks are ambiguous
    * with zero-filled member data), so compaction decodes and re-encodes
    * members — task memory stays bounded by one input shard (read) and
    * one member (write). Member names flatten to `<key>.<ext>` (the
    * WebDataset contract this module's readers key on) — foreign
    * archives whose semantics live in directory prefixes should not be
    * compacted here. The swap deletes exactly the matched input shards
    * before renaming the rewritten ones in as `compacted-%05d.tar`
    * (files the glob did NOT match are untouched) — run it in the
    * ingest pipeline's maintenance step, not while readers race it.
    * A key index under the directory is DELETED (its shard mapping is
    * stale the moment members move) — re-run [[writeKeyIndex]] after.
    */
  def compactShards(spark: SparkSession, path: String, targetShardBytes: Long,
      glob: String = "*.tar"): Unit = {
    require(targetShardBytes > 0, "targetShardBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listed = fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/$glob"))
    require(listed != null && listed.nonEmpty, s"no shards match $path/$glob")
    val total = listed.map(_.getLen).sum
    val n = math.max(1L, (total + targetShardBytes - 1) / targetShardBytes).toInt
    val tmp = path + "._compacting"
    write(entries(spark, path, glob).select("key", "ext", "content"),
      tmp, SaveMode.Overwrite, shards = Some(n))
    // swap: drop exactly the matched inputs, rename the rewrite in
    listed.foreach(st => fs.delete(st.getPath, false))
    val produced = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/shard-*.tar")).map { st =>
      val dst = new org.apache.hadoop.fs.Path(path,
        st.getPath.getName.replaceFirst("^shard-", "compacted-"))
      fs.delete(dst, false)
      if (!fs.rename(st.getPath, dst))
        throw new java.io.IOException(s"compactShards commit failed: ${st.getPath} -> $dst")
      dst.getName
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    fs.delete(new org.apache.hadoop.fs.Path(path, KeyIndexDir), true) // stale now
    Manifests.refresh(spark, path, listed.map(_.getPath.getName).toSeq,
      produced.toSeq)
  }

  // ---- ustar encode ----

  private def writeMember(out: java.io.OutputStream, name: String, data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100,
      s"ustar member name over 100 bytes: $name (keep keys short; no pax extension here)")
    val h = new Array[Byte](Block)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, math.min(b.length, len))
    }
    def putOctal(v: Long, off: Int, len: Int): Unit =
      put(("%0" + (len - 1) + "o").format(v), off, len - 1) // NUL-terminated octal
    put(name, 0, 100)
    putOctal(420 /*0644*/, 100, 8)
    putOctal(0, 108, 8)
    putOctal(0, 116, 8)
    putOctal(data.length.toLong, 124, 12)
    putOctal(0, 136, 12)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum field as spaces
    h(156) = '0'                                   // typeflag: regular file
    put("ustar", 257, 6)
    put("00", 263, 2)
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put("%06o".format(sum), 148, 6)                // 6 octal digits, NUL, space
    h(154) = 0
    h(155) = ' '
    out.write(h)
    out.write(data)
    val pad = (Block - data.length % Block) % Block
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  // ---- ustar decode ----

  /** Iterate (memberName, bytes) over one in-memory shard. Long member
    * paths resolve through all three mechanisms real archives use: the
    * POSIX ustar `prefix` field (offset 345 — only when the header magic
    * is POSIX `ustar\0`; GNU-format headers reuse those bytes for
    * atime/ctime), GNU `L` longname entries (the data block IS the next
    * member's name), and pax `x` extended headers' `path=` record.
    * Without these, a tar-built archive with >100-char paths silently
    * loses its directory prefix — truncated names that can collide keys
    * in [[samples]]. Global pax headers (`g`) and non-file entries are
    * skipped; trailing zero blocks end the archive.
    */
  private[sources] def parse(tar: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var off = 0
      private var nextEntry: (String, Array[Byte]) = _
      private var pendingName: String = _ // from 'L' / pax 'x' path=
      private def str(o: Int, len: Int): String = {
        var end = o
        val stop = o + len
        while (end < stop && tar(end) != 0) end += 1
        new String(tar, o, end - o, "UTF-8")
      }
      private def octal(o: Int, len: Int): Long = {
        val s = str(o, len).trim
        if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
      }
      // POSIX ustar magic: "ustar" NUL (GNU's is "ustar" space space NUL)
      private def posixMagic(hdr: Int): Boolean =
        str(hdr + 257, 6) == "ustar" && tar(hdr + 262) == 0
      private def advance(): Unit = {
        nextEntry = null
        while (nextEntry == null && off + Block <= tar.length) {
          if (tar.slice(off, off + Block).forall(_ == 0)) { off = tar.length } // end marker
          else {
            val rawName = str(off, 100)
            val size = octal(off + 124, 12)
            val typeflag = tar(off + 156)
            val hdr = off
            val dataStart = off + Block
            val padded = ((size + Block - 1) / Block * Block).toInt
            require(dataStart + size <= tar.length, s"truncated tar member $rawName")
            def data = java.util.Arrays.copyOfRange(tar, dataStart, dataStart + size.toInt)
            typeflag match {
              case 'L' => // GNU longname: data = NUL-terminated real name
                val d = data
                var e = 0
                while (e < d.length && d(e) != 0) e += 1
                pendingName = new String(d, 0, e, "UTF-8")
              case 'x' | 'X' => // pax extended header: path= overrides
                paxPath(data).foreach(pendingName = _)
              case '0' | 0 =>
                val name =
                  if (pendingName != null) pendingName
                  else if (posixMagic(hdr)) {
                    val prefix = str(hdr + 345, 155)
                    if (prefix.nonEmpty) prefix + "/" + rawName else rawName
                  } else rawName
                pendingName = null
                if (!name.endsWith("/")) nextEntry = (name, data)
              case _ => // dirs, links, 'g' global pax, devices: skip —
                pendingName = null // and a longname names ONLY its entry
            }
            off = dataStart + padded
          }
        }
      }
      advance() // look ahead once; subsequent next() re-advances
      override def hasNext: Boolean = nextEntry != null
      override def next(): (String, Array[Byte]) = {
        if (nextEntry == null) throw new NoSuchElementException("tar exhausted")
        val e = nextEntry
        advance()
        e
      }
    }

  /** Extract the `path=` record from a pax extended-header block. Pax
    * records are `"<len> <key>=<value>\n"` with `len` the DECIMAL length
    * of the whole record including its own digits; a malformed record
    * ends the scan (the remaining block is padding or noise — the entry
    * then falls back to its header name).
    */
  private[sources] def paxPath(data: Array[Byte]): Option[String] = {
    var i = 0
    var res: Option[String] = None
    while (i < data.length && data(i) != 0) {
      var j = i
      while (j < data.length && data(j) != ' ') j += 1
      if (j >= data.length) return res
      val len =
        try Integer.parseInt(new String(data, i, j - i, "UTF-8").trim)
        catch { case _: NumberFormatException => return res }
      if (len <= 0 || i + len > data.length) return res
      val rec = new String(data, j + 1, i + len - j - 1, "UTF-8")
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path")
        res = Some(rec.substring(eq + 1).stripSuffix("\n"))
      i += len
    }
    res
  }
}
