package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** WARC shard IO (ISO 28500 / WARC 1.0-1.1) — the web-crawl archive
  * format a 100 TB text-curation pipeline actually ingests: Common Crawl
  * publishes ~90 k `.warc.gz` shards of ~1 GB per monthly crawl, and the
  * reference's text-curation use case starts from exactly such crawls
  * (cf. cosmos_xenna README.md "curation pipelines"; the CCNet/Gopher/
  * RefinedWeb recipes all begin at WARC). [[TarShards]]' sibling, same
  * scale design: the shard is the unit of parallelism AND of sequential
  * IO — one task reads one shard front-to-back, whole-shard parsing
  * bounds task memory by shard size, `binaryFiles` schedules shards
  * across executors. Downstream of [[responses]] everything is ordinary
  * DataFrame work: [[graft.operators.Html]] strips the markup, then the
  * t/d/x operator families curate.
  *
  * Format notes (self-contained, no codec libs): a record is
  * `WARC/1.x CRLF`, `Name: value CRLF` headers, `CRLF`, then exactly
  * `Content-Length` payload bytes, then `CRLF CRLF`. A `.warc.gz` shard
  * is CONCATENATED gzip members, canonically one per record so readers
  * can resume at member boundaries — the writer emits that layout, and
  * the reader accepts both it and a whole-file gzip stream (JDK
  * `GZIPInputStream` walks concatenated members natively). Header
  * values are untrusted input: a negative / non-numeric / past-EOF
  * `Content-Length` fails loud with the shard and offset (the WAV/PNG
  * untrusted-length discipline — never loop, never read out of bounds).
  */
object WarcShards {

  private val Crlf = "\r\n".getBytes("ISO-8859-1")

  /** One row per WARC record across all shards matched by `path`/`glob`:
    * (shard, warc_type, record_id, target_uri, warc_date, content_type,
    * headers, payload). `headers` carries EVERY header verbatim (first
    * occurrence wins on duplicates); the five named columns are the
    * fields every consumer filters on, pre-extracted so the common path
    * never map-probes. Gzip shards are detected by magic, not suffix.
    */
  def records(spark: SparkSession, path: String, glob: String = "*.warc.gz"): DataFrame =
    recordsOf(Tables.binaryFiles(spark, path, glob))

  /** Shared batch/streaming core: (path, content) shard rows → record
    * rows. Stateless flatMap, so the SAME code serves the batch reader
    * and the streaming one.
    */
  private def recordsOf(shards: DataFrame): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (shard, raw) =>
        val bytes = if (isGzip(raw)) gunzipAll(raw, shard) else raw
        parse(bytes, shard).map { r =>
          (shard, r.headers.getOrElse("warc-type", null),
            r.headers.getOrElse("warc-record-id", null),
            r.headers.getOrElse("warc-target-uri", null),
            r.headers.getOrElse("warc-date", null),
            r.headers.getOrElse("content-type", null),
            r.headers, r.payload)
        }
      }
      .toDF("shard", "warc_type", "record_id", "target_uri", "warc_date",
        "content_type", "headers", "payload")
  }

  /** One row per `response` record with the HTTP envelope split off:
    * (shard, url, warc_date, http_status, http_content_type, body).
    * Crawl payloads are untrusted: a payload that does not start with an
    * HTTP status line yields http_status/http_content_type null and the
    * WHOLE payload as body (data, not an error — real crawls contain
    * truncated and non-HTTP responses, and dropping them silently is the
    * corruption [[TarShards.write]]'s null guard exists to prevent).
    */
  def responses(spark: SparkSession, path: String, glob: String = "*.warc.gz"): DataFrame =
    responsesOf(records(spark, path, glob))

  private def responsesOf(recs: DataFrame): DataFrame = {
    val spark = recs.sparkSession
    import spark.implicits._
    recs
      .filter(col("warc_type") === "response")
      .select(col("shard"), col("target_uri"), col("warc_date"), col("payload"))
      .as[(String, String, String, Array[Byte])]
      .map { case (shard, uri, date, payload) =>
        val (status, ctype, body) = splitHttp(payload)
        (shard, uri, date, status, ctype, body)
      }
      .toDF("shard", "url", "warc_date", "http_status", "http_content_type", "body")
  }

  /** [[responses]] with the body DECODED to text: adds `text`, `charset`
    * and `charset_source` columns. Real crawls are full of
    * Windows-1252 / Latin-1 / GBK pages; decoding everything as fixed
    * UTF-8 mojibakes them silently into the curation operators.
    * Resolution order (WHATWG encoding sniffing, which browsers use):
    * a byte-order mark wins over everything (the bytes literally declare
    * themselves), then the HTTP `Content-Type` header's `charset=`
    * parameter, then a `<meta charset=…>` / `<meta http-equiv…>` sniff
    * over the first 1 KiB, then UTF-8. `charset_source` ∈ {"bom",
    * "http-header", "meta", "fallback"} is a first-class column because
    * curation wants to filter on it (a "fallback" page with replacement
    * chars is a quality signal, not just a decode detail). Malformed
    * bytes decode to U+FFFD — data, never an error (the [[responses]]
    * tolerance rule). Unknown/unsupported charset names fall through to
    * the next source.
    */
  def decodedResponses(spark: SparkSession, path: String,
      glob: String = "*.warc.gz"): DataFrame =
    decodedOf(responses(spark, path, glob))

  /** Same decode over an existing [[responses]]-shaped frame (batch or
    * streaming — the flatMap is stateless). Narrow: no shuffle.
    */
  def decodedOf(resps: DataFrame): DataFrame = {
    val dec = udf { (ctype: String, body: Array[Byte]) =>
      decodeBytes(ctype, if (body == null) Array.emptyByteArray else body)
    }
    resps.withColumn("_d", dec(col("http_content_type"), col("body")))
      .withColumn("text", col("_d._1"))
      .withColumn("charset", col("_d._2"))
      .withColumn("charset_source", col("_d._3"))
      .drop("_d")
  }

  /** (text, charsetName, source) for one HTTP body — see
    * [[decodedResponses]] for the resolution order.
    */
  private[graft] def decodeBytes(httpContentType: String,
      body: Array[Byte]): (String, String, String) = {
    val resolved: Option[(java.nio.charset.Charset, String)] =
      bomCharset(body).map((_, "bom"))
        .orElse(charsetParam(httpContentType).map((_, "http-header")))
        .orElse(metaCharset(body).map((_, "meta")))
    val (cs, src) = resolved.getOrElse((java.nio.charset.StandardCharsets.UTF_8, "fallback"))
    val d = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val text = d.decode(java.nio.ByteBuffer.wrap(body)).toString
    // the BOM itself is an encoding declaration, not document text
    (if (text.startsWith("\uFEFF")) text.substring(1) else text, cs.name(), src)
  }

  private def lookup(name: String): Option[java.nio.charset.Charset] =
    try {
      if (java.nio.charset.Charset.isSupported(name))
        Some(java.nio.charset.Charset.forName(name))
      else None
    } catch { case _: java.nio.charset.IllegalCharsetNameException => None }

  private def bomCharset(b: Array[Byte]): Option[java.nio.charset.Charset] =
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
        (b(2) & 0xff) == 0xbf) lookup("UTF-8")
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
      lookup("UTF-16LE")
    else if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      lookup("UTF-16BE")
    else None

  private val CharsetParamRe =
    """(?i)charset\s*=\s*"?([A-Za-z0-9_.:+-]+)""".r

  private def charsetParam(ctype: String): Option[java.nio.charset.Charset] =
    Option(ctype).flatMap(c => CharsetParamRe.findFirstMatchIn(c))
      .flatMap(m => lookup(m.group(1)))

  private val MetaCharsetRe =
    """(?i)<meta[^>]{0,200}?charset\s*=\s*["']?([A-Za-z0-9_.:+-]+)""".r

  /** `<meta charset=…>` (or the http-equiv form — the same regex catches
    * `content="text/html; charset=…"` inside the tag) over the first
    * 1 KiB read as Latin-1: charset declarations are ASCII by spec, so
    * this sniff is encoding-independent for every ASCII-superset.
    */
  private def metaCharset(b: Array[Byte]): Option[java.nio.charset.Charset] = {
    val head = new String(b, 0, math.min(b.length, 1024), "ISO-8859-1")
    MetaCharsetRe.findFirstMatchIn(head).flatMap(m => lookup(m.group(1)))
  }

  /** Streaming ingestion: cure crawl shards AS THEY LAND — the
    * continuous twin of [[responses]], over Spark's file stream source
    * (each micro-batch picks up newly arrived shards; exactly-once per
    * shard via the source's file ledger in the query's checkpoint).
    * The per-shard parse is the SAME stateless flatMap as the batch
    * reader, so batch and streaming ingestion cannot drift. Compose
    * downstream exactly like any stream: [[graft.operators.Html]]
    * extraction is narrow, and the E-family (streaming dedup / bloom
    * first-seen / heavy hitters) picks up from there. Shard files must
    * arrive ATOMICALLY (write elsewhere, rename in — the standard file
    * stream contract; a half-written shard would fail the parse loudly).
    */
  def streamResponses(spark: SparkSession, path: String,
      glob: String = "*.warc.gz"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val shards = spark.readStream.format("binaryFile")
      .schema(schema).option("pathGlobFilter", glob).load(path)
    responsesOf(recordsOf(shards))
  }

  /** Write WARC response shards, one `.warc.gz` per partition
    * (`shard-%05d.warc.gz`), each record its own gzip member (the
    * resumable layout crawl tooling expects), preceded by a `warcinfo`
    * member. Input rows: (url, warc_date, content_type, body) — the
    * writer wraps each body in a minimal `HTTP/1.1 200 OK` envelope so
    * [[responses]] round-trips. Record ids are name-based UUIDs over
    * (url, date, length): deterministic, layout-independent — re-running
    * the job writes byte-identical records (no RNG, the X-family
    * discipline; gzip members carry mtime 0 for the same reason).
    * Null url/body fail loud; `shards = Some(n)` hash-partitions by url.
    * `commit` = [[ShardCommit.Publish]] for object stores without atomic
    * rename: attempt-unique final names + driver-elected
    * `_MANIFEST.jsonl`; read only via `Manifests.listedGlob` then (see
    * [[TarShards.write]] — same contract).
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
        throw new IllegalStateException(s"warc shard path exists: $path (use SaveMode.Overwrite)")
      case SaveMode.Ignore => return
      case SaveMode.Append =>
        throw new IllegalArgumentException("warc shards are immutable; Append unsupported")
    }
    fs.mkdirs(out)
    val pathStr = path
    val laid = shards.fold(df)(n => df.repartition(n, col("url")))
    laid.select(col("url").cast("string"), col("warc_date").cast("string"),
        col("content_type").cast("string"), col("body"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new org.apache.hadoop.fs.Path(f"$pathStr/shard-$pid%05d.warc.gz")
        // task commit (rename or attempt-unique publish): concurrent
        // attempts (speculation, zombie-vs-retry) must never interleave
        // into one final shard
        ShardCommit.withCommit(hadoopConf, p, commit) { stream =>
          var wrote = false
          rows.foreach { r =>
            val url = r.getString(0)
            val body = r.getAs[Array[Byte]](3)
            require(url != null && url.nonEmpty && body != null,
              s"warc shard rows need a non-empty url and non-null body (url=$url)")
            val date = Option(r.getString(1)).getOrElse("1970-01-01T00:00:00Z")
            val ctype = Option(r.getString(2)).getOrElse("application/octet-stream")
            if (!wrote) stream.write(gzipMember(warcinfoRecord(f"shard-$pid%05d")))
            stream.write(gzipMember(responseRecord(url, date, ctype, body)))
            wrote = true
          }
          wrote
        }
      }
    if (commit == ShardCommit.Publish) ShardCommit.publish(spark, path, ".warc.gz")
  }

  /** Compact small crawl shards in place into ~`targetShardBytes` bins —
    * the small-shards hygiene for incrementally-ingested crawls (the
    * streaming route lands one shard per micro-batch partition; a
    * long-running crawl strews thousands of tiny files, and the shard is
    * the unit of parallelism and sequential IO).
    *
    * Unlike tar (see [[TarShards.compactShards]]), WARC shards ARE
    * byte-concatenatable: the shard format is a concatenation of gzip
    * members (one per record), so merging shards is literally streaming
    * their bytes back to back — no decode, no re-encode, bit-exact
    * record preservation (warcinfo records stay attached to the records
    * they describe; ISO 28500 permits multiple warcinfo records per
    * file). Shards first-fit into bins of ≤ target bytes from the
    * driver-side LISTING (metadata only), one task per bin streams the
    * concatenation under the temp+rename task commit, and the swap
    * deletes exactly the matched input files before renaming the bins in
    * as `compacted-%05d.warc.gz` (files the glob did NOT match are
    * untouched) — the Sinks.compact not-while-readers-race caveat
    * applies. Oversized single shards pass through their own bin
    * unchanged.
    */
  def compactShards(spark: SparkSession, path: String, targetShardBytes: Long,
      glob: String = "*.warc.gz"): Unit = {
    require(targetShardBytes > 0, "targetShardBytes must be positive")
    val hadoopConf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hadoopConf.value)
    val listed = fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/$glob"))
    require(listed != null && listed.nonEmpty, s"no shards match $path/$glob")
    // first-fit by listing order (deterministic: globStatus sorts by
    // name) — keeps ingestion order roughly intact within bins
    val bins = scala.collection.mutable.ListBuffer.empty[scala.collection.mutable.ListBuffer[String]]
    var binBytes = 0L
    listed.foreach { st =>
      if (bins.isEmpty || binBytes + st.getLen > targetShardBytes) {
        bins += scala.collection.mutable.ListBuffer(st.getPath.toString)
        binBytes = st.getLen
      } else { bins.last += st.getPath.toString; binBytes += st.getLen }
    }
    val tmp = path + "._compacting"
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    fs.delete(tmpPath, true)
    fs.mkdirs(tmpPath)
    val plan = bins.toSeq.map(_.toSeq).zipWithIndex
    spark.sparkContext.parallelize(plan, plan.size).foreach { case (files, i) =>
      val out = new org.apache.hadoop.fs.Path(f"$tmp/compacted-$i%05d.warc.gz")
      ShardCommit.withCommit(hadoopConf, out) { stream =>
        val buf = new Array[Byte](1 << 16)
        files.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val in = p.getFileSystem(hadoopConf.value).open(p)
          try {
            var n = in.read(buf)
            while (n >= 0) { if (n > 0) stream.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        }
        files.nonEmpty
      }
    }
    // swap: drop exactly the matched inputs, rename the bins in
    listed.foreach(st => fs.delete(st.getPath, false))
    val produced = plan.map { case (_, i) =>
      val src = new org.apache.hadoop.fs.Path(f"$tmp/compacted-$i%05d.warc.gz")
      val dst = new org.apache.hadoop.fs.Path(root, f"compacted-$i%05d.warc.gz")
      fs.delete(dst, false)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"compactShards commit failed: $src -> $dst")
      dst.getName
    }
    fs.delete(tmpPath, true)
    Manifests.refresh(spark, path, listed.map(_.getPath.getName).toSeq, produced)
  }

  // ---- encode ----

  private def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("WARC/1.0\r\n".getBytes("ISO-8859-1"))
    (headers :+ ("Content-Length" -> payload.length.toString)).foreach { case (k, v) =>
      bos.write(s"$k: $v\r\n".getBytes("UTF-8"))
    }
    bos.write(Crlf)
    bos.write(payload)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }

  private def recordId(seed: String): String =
    "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(seed.getBytes("UTF-8")) + ">"

  private def warcinfoRecord(shard: String): Array[Byte] = {
    val info = "software: graft WarcShards\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("UTF-8")
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> recordId(s"warcinfo:$shard"),
      "WARC-Date" -> "1970-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"), info)
  }

  private def responseRecord(url: String, date: String, ctype: String,
      body: Array[Byte]): Array[Byte] = {
    val http = new java.io.ByteArrayOutputStream()
    http.write(("HTTP/1.1 200 OK\r\nContent-Type: " + ctype +
      "\r\nContent-Length: " + body.length + "\r\n\r\n").getBytes("ISO-8859-1"))
    http.write(body)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordId(s"response:$url|$date|${body.length}"),
      "WARC-Date" -> date,
      "WARC-Target-URI" -> url,
      "Content-Type" -> "application/http;msgtype=response"), http.toByteArray)
  }

  /** One complete gzip member (deterministic: mtime 0, no name). */
  private def gzipMember(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data)
    gz.finish(); gz.close()
    bos.toByteArray
  }

  // ---- decode ----

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate ALL concatenated gzip members (JDK GZIPInputStream resumes
    * at each member header). Whole-shard inflation is the same
    * memory-bounded-by-shard-size contract as [[TarShards]] — WARC
    * shards are conventionally ≤ 1 GB compressed.
    */
  private[sources] def gunzipAll(raw: Array[Byte], shard: String): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch {
      case e: java.util.zip.ZipException =>
        throw new IllegalArgumentException(s"corrupt gzip in warc shard $shard: ${e.getMessage}")
    }
    out.toByteArray
  }

  private final case class Rec(headers: Map[String, String], payload: Array[Byte])

  /** Iterate records over one decompressed shard. Tolerates leading
    * whitespace/blank lines between records (some writers pad); every
    * structural violation names the shard and byte offset.
    */
  private def parse(bytes: Array[Byte], shard: String): Iterator[Rec] =
    new Iterator[Rec] {
      private var off = 0
      private var nextRec: Rec = _

      private def lineEnd(from: Int): Int = {
        var i = from
        while (i < bytes.length && bytes(i) != '\n') i += 1
        i // index of \n (or length)
      }
      private def lineAt(from: Int): (String, Int) = {
        val e = lineEnd(from)
        val stop = if (e > from && bytes(e - 1) == '\r') e - 1 else e
        (new String(bytes, from, stop - from, "UTF-8"), math.min(e + 1, bytes.length))
      }
      private def advance(): Unit = {
        nextRec = null
        // skip inter-record padding / blank lines
        while (off < bytes.length &&
            (bytes(off) == '\r' || bytes(off) == '\n')) off += 1
        if (off >= bytes.length) return
        val start = off
        val (magic, afterMagic) = lineAt(off)
        require(magic.startsWith("WARC/"),
          s"warc shard $shard: expected WARC/ version line at offset $start, got '${magic.take(20)}'")
        var pos = afterMagic
        var headers = Map.empty[String, String]
        var blank = false
        while (!blank) {
          require(pos < bytes.length, s"warc shard $shard: unterminated header block at offset $start")
          val (line, nxt) = lineAt(pos)
          pos = nxt
          if (line.isEmpty) blank = true
          else {
            val c = line.indexOf(':')
            require(c > 0, s"warc shard $shard: malformed header '$line' at offset $start")
            val k = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
            val v = line.substring(c + 1).trim
            if (!headers.contains(k)) headers += (k -> v)
          }
        }
        val lenStr = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"warc shard $shard: record at offset $start has no Content-Length"))
        val len =
          try java.lang.Long.parseLong(lenStr)
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"warc shard $shard: non-numeric Content-Length '$lenStr' at offset $start") }
        require(len >= 0 && pos + len <= bytes.length,
          s"warc shard $shard: Content-Length $len at offset $start runs past end of shard " +
            s"(${bytes.length - pos} bytes remain)")
        val payload = java.util.Arrays.copyOfRange(bytes, pos, (pos + len).toInt)
        off = (pos + len).toInt
        nextRec = Rec(headers, payload)
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Rec = {
        if (nextRec == null) throw new NoSuchElementException("warc exhausted")
        val r = nextRec
        advance()
        r
      }
    }

  /** Split an HTTP response payload into (status, content-type, body).
    * Returns (null, null, whole payload) when no HTTP status line leads —
    * tolerant by design, see [[responses]].
    */
  private[sources] def splitHttp(payload: Array[Byte]): (Integer, String, Array[Byte]) = {
    val head = new String(payload, 0, math.min(payload.length, 16), "ISO-8859-1")
    if (!head.startsWith("HTTP/")) return (null, null, payload)
    // header/body split at the first CRLFCRLF (tolerate bare LFLF)
    var i = 0
    var split = -1
    while (split < 0 && i < payload.length - 1) {
      if (payload(i) == '\n') {
        if (i + 2 < payload.length && payload(i + 1) == '\r' && payload(i + 2) == '\n')
          split = i + 3
        else if (payload(i + 1) == '\n') split = i + 2
      }
      i += 1
    }
    if (split < 0) return (null, null, payload)
    val headerText = new String(payload, 0, split, "ISO-8859-1")
    val lines = headerText.split("\r?\n")
    val statusParts = lines.head.split(" ")
    val status: Integer =
      if (statusParts.length >= 2 && statusParts(1).forall(_.isDigit) && statusParts(1).nonEmpty)
        Integer.valueOf(statusParts(1))
      else null
    if (status == null) return (null, null, payload)
    val ctype = lines.tail.collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.orNull
    (status, ctype, java.util.Arrays.copyOfRange(payload, split, payload.length))
  }
}
