package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Generic source readers: pipelines aren't parquet-only. */
class SourcesSuite extends SparkSpec {

  test("csv and json round-trip the documents sample") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "n_chars").limit(50)
    val tmp = Files.createTempDirectory("graft-sources").toString

    docs.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val csv = Tables.csv(spark, s"$tmp/csv")
    assert(csv.count() == 50)
    assert(csv.columns.sorted.toSeq == docs.columns.sorted.toSeq)
    assert(csv.agg(sum("n_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))

    docs.write.mode("overwrite").json(s"$tmp/json")
    val json = Tables.json(spark, s"$tmp/json")
    assert(json.count() == 50)
    assert(json.agg(sum("n_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("events reader rebuilds microsecond timestamps from ns parquet") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.count() > 0)
  }

  test("text reader: line mode and whole-file mode") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-text")
    java.nio.file.Files.write(tmp.resolve("a.txt"), "one\ntwo\nthree".getBytes)
    java.nio.file.Files.write(tmp.resolve("b.txt"), "four".getBytes)
    assert(Tables.text(spark, tmp.toString).count() == 4)
    val whole = Tables.text(spark, tmp.toString, wholeFile = true)
    assert(whole.count() == 2)
    assert(whole.collect().map(_.getString(0)).toSet == Set("one\ntwo\nthree", "four"))
  }

  test("binaryFiles: payload + metadata rows, glob prunes at listing time") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-bin")
    val payload = Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3)
    java.nio.file.Files.write(tmp.resolve("x.jpg"), payload)
    java.nio.file.Files.write(tmp.resolve("x.json"), "{\"caption\":\"hi\"}".getBytes)
    val all = Tables.binaryFiles(spark, tmp.toString)
    assert(all.count() == 2)
    val jpgs = Tables.binaryFiles(spark, tmp.toString, glob = "*.jpg")
    val rows = jpgs.select("path", "length", "content").collect()
    assert(rows.length == 1, "sidecar json pruned by the listing-time glob")
    assert(rows.head.getLong(1) == 5L)
    assert(rows.head.getAs[Array[Byte]](2).toSeq == payload.toSeq)
    // the binary source feeds the m01 shape directly: payload magic routing
    assert(jpgs.filter(col("length") > 0).count() == 1)
  }

  test("orc round-trips with pushdown-compatible schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "g", "v")
    graft.sources.Sinks.orc(df, s"$dir/t")
    val back = Tables.orc(spark, s"$dir/t")
    // names/types survive (nullability widens on read, as with parquet)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)))
    // filters reach the ORC scan (same pushdown contract as parquet)
    val plan = back.filter($"g" === "a").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("g"), plan.take(500))
  }

  test("tar shards: round-trip, sample grouping, and GNU-tar interop both ways") {
    import spark.implicits._
    import graft.sources.TarShards
    val tmp = Files.createTempDirectory("graft-tar").toString
    val rnd = new scala.util.Random(77)
    // mixed binary + text members across 40 samples, incl. a payload
    // crossing the 512-byte block boundary and an empty member
    val rows = (0 until 40).flatMap { i =>
      val key = f"sample$i%06d"
      val img = Array.fill(if (i == 0) 0 else 300 + rnd.nextInt(700))(rnd.nextInt().toByte)
      Seq((key, "bin", img), (key, "txt", s"caption for $i".getBytes("UTF-8")))
    }
    // shards = Some(3): the writer key-partitions, so a sample's members
    // never straddle shards (a bare repartition(3) WOULD split them)
    TarShards.write(rows.toDF("key", "ext", "content"), s"$tmp/shards", shards = Some(3))
    val shardFiles = new java.io.File(s"$tmp/shards").listFiles().filter(_.getName.endsWith(".tar"))
    assert(shardFiles.length == 3, "one shard per partition")

    // round-trip: every member back, bytes identical
    val back = TarShards.entries(spark, s"$tmp/shards")
      .select("key", "ext", "content").as[(String, String, Array[Byte])]
      .collect().map { case (k, e, c) => (k, e) -> c.toSeq }.toMap
    assert(back.size == 80)
    rows.foreach { case (k, e, c) => assert(back((k, e)) == c.toSeq, s"$k.$e bytes differ") }

    // sample grouping: one row per key, both extensions zipped
    val samples = TarShards.samples(spark, s"$tmp/shards")
      .select("key", "exts").as[(String, Seq[String])].collect().toMap
    assert(samples.size == 40 && samples.values.forall(_.sorted == Seq("bin", "txt")))

    // interop 1: GNU tar lists and extracts our shards byte-identically
    val shard0 = shardFiles.minBy(_.getName).getAbsolutePath
    val listed = scala.sys.process.Process(Seq("tar", "-tf", shard0)).!!.trim.linesIterator.toSeq
    assert(listed.nonEmpty && listed.forall(_.matches("sample\\d{6}\\.(bin|txt)")), listed.take(3).toString)
    val xdir = Files.createTempDirectory("graft-untar").toFile
    assert(scala.sys.process.Process(Seq("tar", "-xf", shard0, "-C", xdir.getAbsolutePath)).! == 0)
    listed.foreach { name =>
      val Array(k, e) = name.split("\\.", 2)
      val onDisk = java.nio.file.Files.readAllBytes(new java.io.File(xdir, name).toPath)
      assert(onDisk.toSeq == back((k, e)), s"GNU-extracted $name differs")
    }

    // interop 2: a GNU-tar-built archive parses with our reader
    val gdir = Files.createTempDirectory("graft-gnu").toFile
    java.nio.file.Files.write(new java.io.File(gdir, "a.txt").toPath, "alpha".getBytes)
    java.nio.file.Files.write(new java.io.File(gdir, "b.bin").toPath, Array[Byte](1, 2, 3, 0, -1))
    assert(scala.sys.process.Process(
      Seq("tar", "-cf", s"$tmp/gnu.tar", "-C", gdir.getAbsolutePath, "a.txt", "b.bin")).! == 0)
    val gnu = TarShards.entries(spark, tmp, "gnu.tar")
      .select("name", "content").as[(String, Array[Byte])].collect()
      .map { case (n, c) => n -> c.toSeq }.toMap
    assert(gnu == Map("a.txt" -> "alpha".getBytes.toSeq, "b.bin" -> Seq[Byte](1, 2, 3, 0, -1)))

    // loud guards: existing path without Overwrite; null key
    intercept[IllegalStateException](TarShards.write(rows.take(2).toDF("key", "ext", "content"), s"$tmp/shards"))
    val badRows = Seq((null.asInstanceOf[String], "txt", "x".getBytes)).toDF("key", "ext", "content")
    val err = intercept[org.apache.spark.SparkException](TarShards.write(badRows, s"$tmp/bad"))
    assert(err.getMessage.contains("key") || Option(err.getCause).exists(_.getMessage.contains("key")))
  }

  test("tar reader: >100-char paths via ustar prefix, GNU longname, pax path") {
    import spark.implicits._
    import graft.sources.TarShards
    val tmp = Files.createTempDirectory("graft-long").toString
    val base = Files.createTempDirectory("graft-lsrc").toFile
    // 137-char directory prefix + "/data.txt" = a 146-char member path:
    // over the 100-byte name field in every format
    val relDir = Seq("a" * 45, "b" * 45, "c" * 45).mkString("/")
    val deep = new java.io.File(base, relDir)
    assert(deep.mkdirs())
    java.nio.file.Files.write(new java.io.File(deep, "data.txt").toPath,
      "deep".getBytes("UTF-8"))
    val member = s"$relDir/data.txt"
    // gnu → 'L' longname entry; posix → pax 'x' path= record;
    // ustar → prefix field split (prefix 137 ≤ 155, name 8 ≤ 100)
    for (fmt <- Seq("gnu", "posix", "ustar")) {
      assert(scala.sys.process.Process(Seq("tar", s"--format=$fmt", "-cf",
        s"$tmp/$fmt.tar", "-C", base.getAbsolutePath, member)).! == 0, fmt)
      val got = TarShards.entries(spark, tmp, s"$fmt.tar")
        .select("name", "content", "key", "ext")
        .as[(String, Array[Byte], String, String)].collect()
      assert(got.length == 1, s"$fmt: expected one member, got ${got.length}")
      val (name, content, key, ext) = got.head
      assert(name == member, s"$fmt: full path must survive, got $name")
      assert(content.toSeq == "deep".getBytes("UTF-8").toSeq, fmt)
      assert(key == "data" && ext == "txt", s"$fmt: key/ext from basename")
    }
  }

  test("compactShards: tiny tar/warc shards merge to ~target size, content identical") {
    import spark.implicits._
    import graft.sources.{TarShards, WarcShards}
    val tmp = Files.createTempDirectory("graft-compact").toString
    def visible(dir: String) = Option(new java.io.File(dir).listFiles())
      .map(_.map(_.getName).toSeq.filterNot(_.startsWith("."))).getOrElse(Nil)

    // tar: 16 tiny shards -> a handful near the target
    val rows = (0 until 64).map(i => (f"k$i%04d", "txt",
      (s"payload $i " * 20).getBytes("UTF-8")))
    TarShards.write(rows.toDF("key", "ext", "content"), s"$tmp/t", shards = Some(16))
    val before = TarShards.entries(spark, s"$tmp/t")
      .select("key", "ext", "content").as[(String, String, Array[Byte])]
      .collect().map { case (k, e, c) => (k, e) -> c.toSeq }.toMap
    val sizes0 = new java.io.File(s"$tmp/t").listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.length())
    val target = sizes0.sum / 4 + 1
    TarShards.compactShards(spark, s"$tmp/t", target)
    val names = visible(s"$tmp/t")
    assert(names.forall(_.matches("compacted-\\d{5}\\.tar")), names.toString)
    assert(names.size <= 5 && names.size < sizes0.length, s"${names.size} of ${sizes0.length}")
    val after = TarShards.entries(spark, s"$tmp/t")
      .select("key", "ext", "content").as[(String, String, Array[Byte])]
      .collect().map { case (k, e, c) => (k, e) -> c.toSeq }.toMap
    assert(after == before, "compaction must preserve every member byte-for-byte")
    // compaction re-establishes sample affinity: samples() still groups
    assert(TarShards.samples(spark, s"$tmp/t").count() == 64)

    // warc: byte-level concat bins; responses identical, zcat still reads
    val wrows = (0 until 40).map(i => (s"http://c.test/$i", "2026-01-01T00:00:00Z",
      "text/html", (s"<p>page $i</p>" * 10).getBytes("UTF-8")))
    WarcShards.write(wrows.toDF("url", "warc_date", "content_type", "body"),
      s"$tmp/w", shards = Some(10))
    val wBefore = WarcShards.responses(spark, s"$tmp/w")
      .select("url", "body").as[(String, Array[Byte])]
      .collect().map { case (u, b) => u -> b.toSeq }.toMap
    val wSizes = new java.io.File(s"$tmp/w").listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.length())
    WarcShards.compactShards(spark, s"$tmp/w", wSizes.sum / 3 + 1)
    val wNames = visible(s"$tmp/w")
    assert(wNames.forall(_.matches("compacted-\\d{5}\\.warc\\.gz")), wNames.toString)
    assert(wNames.size <= 4 && wNames.size < wSizes.length, s"${wNames.size} of ${wSizes.length}")
    val wAfter = WarcShards.responses(spark, s"$tmp/w")
      .select("url", "body").as[(String, Array[Byte])]
      .collect().map { case (u, b) => u -> b.toSeq }.toMap
    assert(wAfter == wBefore, "warc compaction must preserve every response")
    // the gzip anchor survives concatenation: system zcat walks all members
    val f0 = new java.io.File(s"$tmp/w", wNames.min).getAbsolutePath
    val zcat = scala.sys.process.Process(Seq("zcat", f0)).!!
    assert(zcat.contains("WARC/1.0") && zcat.contains("http://c.test/"))
    // files outside the glob are untouched by the swap
    val stray = new java.io.File(s"$tmp/w", "MANIFEST.json")
    java.nio.file.Files.write(stray.toPath, "{}".getBytes)
    WarcShards.compactShards(spark, s"$tmp/w", Long.MaxValue)
    assert(stray.exists, "compaction must not delete non-shard files")
    assert(visible(s"$tmp/w").count(_.endsWith(".warc.gz")) == 1)
    assert(WarcShards.responses(spark, s"$tmp/w")
      .select("url", "body").as[(String, Array[Byte])]
      .collect().map { case (u, b) => u -> b.toSeq }.toMap == wBefore)
  }

  test("shard writers commit via temp+rename: no temp residue, failures leave nothing") {
    import spark.implicits._
    import graft.sources.{TarShards, WarcShards}
    val tmp = Files.createTempDirectory("graft-commit").toString
    // success path: only final shard files, no _tmp attempt files
    val rows = (0 until 10).map(i => (f"k$i%03d", "txt", s"v$i".getBytes("UTF-8")))
    TarShards.write(rows.toDF("key", "ext", "content"), s"$tmp/t", shards = Some(2))
    // ignore Hadoop local-FS .crc sidecars (dot-hidden to readers); the
    // assertion is: finals only, zero _tmp attempt files
    def visible(dir: String) = Option(new java.io.File(dir).listFiles())
      .map(_.map(_.getName).toSeq.filterNot(_.startsWith("."))).getOrElse(Nil)
    val tNames = visible(s"$tmp/t")
    assert(tNames.nonEmpty && tNames.forall(_.matches("shard-\\d{5}\\.tar")), tNames.toString)
    val wrows = (0 until 10).map(i => (s"http://x.test/$i", "2024-01-01T00:00:00Z",
      "text/html", s"<p>$i</p>".getBytes("UTF-8")))
    WarcShards.write(wrows.toDF("url", "warc_date", "content_type", "body"),
      s"$tmp/w", shards = Some(2))
    val wNames = visible(s"$tmp/w")
    assert(wNames.nonEmpty && wNames.forall(_.matches("shard-\\d{5}\\.warc\\.gz")), wNames.toString)
    // failure path: a mid-partition error must leave NO final shard and
    // NO temp file — an aborted attempt is invisible to readers
    val bad = (Seq(("good", "txt", "x".getBytes)) :+
      (null.asInstanceOf[String], "txt", "y".getBytes)).toDF("key", "ext", "content")
    intercept[org.apache.spark.SparkException](
      TarShards.write(bad.coalesce(1), s"$tmp/fail"))
    val leftover = visible(s"$tmp/fail")
    assert(leftover.isEmpty, s"aborted write left files: $leftover")
  }

  test("publish-mode commit: attempt-unique finals, manifest is the truth, zombies invisible") {
    import spark.implicits._
    import graft.sources.{Manifests, ShardCommit, TarShards, WarcShards}
    val tmp = Files.createTempDirectory("graft-publish").toString
    def visible(dir: String) = Option(new java.io.File(dir).listFiles())
      .map(_.map(_.getName).toSeq.filterNot(_.startsWith("."))).getOrElse(Nil)

    // --- tar: write in Publish mode ---
    val rows = (0 until 12).map(i => (f"k$i%03d", "txt", s"v$i".getBytes("UTF-8")))
    TarShards.write(rows.toDF("key", "ext", "content"), s"$tmp/t",
      shards = Some(3), commit = ShardCommit.Publish)
    // finals are attempt-suffixed (NO rename happened), manifest published
    val tNames = visible(s"$tmp/t")
    assert(tNames.count(_.matches("shard-\\d{5}-a\\d{8}\\.tar")) == 3, tNames.toString)
    assert(tNames.contains(Manifests.FileName), tNames.toString)
    assert(Manifests.listedFiles(spark, s"$tmp/t").size == 3)
    // manifest-driven read round-trips the corpus
    def readT() = TarShards.entries(spark, s"$tmp/t",
      Manifests.listedGlob(spark, s"$tmp/t"))
      .select("key", "content").as[(String, Array[Byte])].collect()
      .map { case (k, c) => (k, new String(c, "UTF-8")) }.toMap
    val before = readT()
    assert(before == rows.map { case (k, _, c) => k -> new String(c, "UTF-8") }.toMap)
    Manifests.check(spark, s"$tmp/t") // clean directory: losers were swept

    // --- zombie attempt lands AFTER publish: different bytes, higher id ---
    val winner = Manifests.listedFiles(spark, s"$tmp/t")
      .find(_.startsWith("shard-00001")).get
    val zombie = winner.replaceFirst("-a\\d{8}", "-a99999999")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/t", zombie),
      "NOT A REAL SHARD".getBytes("UTF-8"))
    // readers consume only manifest-listed files: identical result
    assert(readT() == before, "zombie attempt leaked into a manifest-driven read")
    // …and check() rejects the orphan for maintenance to sweep
    val e = intercept[IllegalStateException](Manifests.check(spark, s"$tmp/t"))
    assert(e.getMessage.contains("extra") && e.getMessage.contains(zombie), e.getMessage)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$tmp/t", zombie))

    // --- duplicate attempt present at publish time: election keeps the
    // first, deletes the loser, manifest unchanged (byte-identical
    // attempts — the writers' determinism contract) ---
    val dupe = winner.replaceFirst("-a\\d{8}", "-a00000042")
    val winnerBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/t", winner))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/t", dupe), winnerBytes)
    ShardCommit.publish(spark, s"$tmp/t", ".tar")
    val elected = Manifests.listedFiles(spark, s"$tmp/t")
    assert(elected.count(_.startsWith("shard-00001")) == 1)
    assert(elected.find(_.startsWith("shard-00001")).get ==
      (if (winner < dupe) winner else dupe))
    assert(!visible(s"$tmp/t").contains(if (winner < dupe) dupe else winner),
      "loser attempt must be swept at publish")
    assert(readT() == before)
    Manifests.check(spark, s"$tmp/t")

    // --- warc: same contract, plus compaction re-owns the manifest ---
    val wrows = (0 until 10).map(i => (s"http://x.test/$i", "2024-01-01T00:00:00Z",
      "text/html", s"<p>$i</p>".getBytes("UTF-8")))
    WarcShards.write(wrows.toDF("url", "warc_date", "content_type", "body"),
      s"$tmp/w", shards = Some(4), commit = ShardCommit.Publish)
    val wNames = visible(s"$tmp/w")
    assert(wNames.count(_.matches("shard-\\d{5}-a\\d{8}\\.warc\\.gz")) == 4, wNames.toString)
    def readW() = WarcShards.responses(spark, s"$tmp/w",
      Manifests.listedGlob(spark, s"$tmp/w"))
      .select("url", "body").as[(String, Array[Byte])].collect()
      .map { case (u, b) => (u, new String(b, "UTF-8")) }.toMap
    val wBefore = readW()
    assert(wBefore == wrows.map { case (u, _, _, b) => u -> new String(b, "UTF-8") }.toMap)
    // zombie double-write on the warc side too
    val wWinner = Manifests.listedFiles(spark, s"$tmp/w").head
    val wZombie = wWinner.replaceFirst("-a\\d{8}", "-a99999999")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/w", wZombie),
      Array[Byte](0x1f, 0x8b.toByte, 8, 0)) // gzip-magic junk
    assert(readW() == wBefore, "zombie attempt leaked into a manifest-driven warc read")
    assert(Manifests.verify(spark, s"$tmp/w").select("status")
      .as[String].collect().toSeq == Seq("extra"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$tmp/w", wZombie))
    // compaction consumes ONLY manifest-listed shards and refreshes the
    // manifest over the compacted layout
    WarcShards.compactShards(spark, s"$tmp/w", 1L << 20,
      glob = Manifests.listedGlob(spark, s"$tmp/w"))
    val wAfter = Manifests.listedFiles(spark, s"$tmp/w")
    assert(wAfter.nonEmpty && wAfter.forall(_.startsWith("compacted-")), wAfter.toString)
    Manifests.check(spark, s"$tmp/w")
    assert(readW() == wBefore)

    // --- empty input still publishes: an empty manifest is a committed
    // empty corpus, not an unpublished directory ---
    TarShards.write(rows.take(0).toDF("key", "ext", "content"), s"$tmp/e",
      commit = ShardCommit.Publish)
    assert(Manifests.listedFiles(spark, s"$tmp/e").isEmpty)
    assert(TarShards.entries(spark, s"$tmp/e",
      Manifests.listedGlob(spark, s"$tmp/e")).isEmpty)
  }

  test("tar key index: point lookups read only the hit shards; stale index fails loud") {
    import spark.implicits._
    import graft.sources.TarShards
    val tmp = Files.createTempDirectory("graft-keyidx").toString + "/shards"
    val rows = (0 until 48).flatMap { i =>
      Seq((f"k$i%04d", "txt", s"text $i".getBytes("UTF-8")),
          (f"k$i%04d", "bin", Array.fill(64)(i.toByte)))
    }
    TarShards.write(rows.toDF("key", "ext", "content"), tmp, shards = Some(8))
    TarShards.writeKeyIndex(spark, tmp)

    // the hit list is bounded by the lookup, not the corpus
    val keys = Seq("k0003", "k0017")
    val hit = TarShards.shardsForKeys(spark, tmp, keys)
    val all = new java.io.File(tmp).listFiles().count(_.getName.endsWith(".tar"))
    assert(hit.size <= keys.size && hit.size < all, s"hit=$hit of $all shards")

    // pruned read == full-scan filter, both members per sample intact
    val got = TarShards.lookupSamples(spark, tmp, keys)
      .select("key", "exts").as[(String, Seq[String])].collect().toMap
    assert(got == Map("k0003" -> Seq("bin", "txt"), "k0017" -> Seq("bin", "txt")))
    val full = TarShards.samples(spark, tmp).where(col("key").isin(keys: _*))
      .select("key", "exts").as[(String, Seq[String])].collect().toMap
    assert(got == full)

    // unknown key: empty result, zero shards opened
    assert(TarShards.shardsForKeys(spark, tmp, Seq("nope")).isEmpty)
    assert(TarShards.lookupSamples(spark, tmp, Seq("nope")).isEmpty)

    // a deleted hit shard makes the index stale -> loud failure
    val hitPath = java.nio.file.Paths.get(tmp, hit.head)
    val saved = java.nio.file.Files.readAllBytes(hitPath)
    java.nio.file.Files.delete(hitPath)
    val e = intercept[IllegalArgumentException](
      TarShards.lookupSamples(spark, tmp, keys).collect())
    assert(e.getMessage.contains("stale"))
    java.nio.file.Files.write(hitPath, saved) // restore for the compaction leg

    // compaction invalidates the mapping and removes the index
    TarShards.compactShards(spark, tmp, 1L << 20)
    assert(!new java.io.File(tmp, "_keyindex").exists())
    TarShards.writeKeyIndex(spark, tmp) // rebuild maps the compacted layout
    val again = TarShards.lookupSamples(spark, tmp, keys)
      .select("key", "exts").as[(String, Seq[String])].collect().toMap
    assert(again == got)
  }

  test("manifests: write/verify detect bit rot, loss, and foreign files") {
    import spark.implicits._
    import graft.sources.{Manifests, TarShards}
    val tmp = Files.createTempDirectory("graft-manifest").toString + "/shards"
    val rows = (0 until 32).map(i => (f"k$i%04d", "txt", s"payload $i".getBytes("UTF-8")))
    TarShards.write(rows.toDF("key", "ext", "content"), tmp, shards = Some(4))
    Manifests.write(spark, tmp, "*.tar")

    // intact: empty diff, check() passes, readers' glob skips the manifest
    assert(Manifests.verify(spark, tmp, "*.tar").isEmpty)
    Manifests.check(spark, tmp, "*.tar")
    assert(TarShards.entries(spark, tmp).count() == 32)

    // deterministic and sorted: rewriting yields identical bytes
    val mPath = java.nio.file.Paths.get(tmp, Manifests.FileName)
    val before = java.nio.file.Files.readAllBytes(mPath).toSeq
    Manifests.write(spark, tmp, "*.tar")
    assert(java.nio.file.Files.readAllBytes(mPath).toSeq == before)

    // single flipped byte (same length) -> changed. Drop Hadoop's local
    // .crc sidecar first: object stores have no such layer, and with it
    // present ChecksumFileSystem throws before our digest ever runs.
    val shard = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".tar")).head
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(tmp, s".${shard.getName}.crc"))
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)
    bytes(600) = (bytes(600) ^ 0x01).toByte
    java.nio.file.Files.write(shard.toPath, bytes)
    val changed = Manifests.verify(spark, tmp, "*.tar")
      .select("file", "status").as[(String, String)].collect().toSeq
    assert(changed == Seq(shard.getName -> "changed"), changed.toString)
    val e = intercept[IllegalStateException](Manifests.check(spark, tmp, "*.tar"))
    assert(e.getMessage.contains("changed"))

    // restore; then delete one shard and plant a stray
    bytes(600) = (bytes(600) ^ 0x01).toByte
    java.nio.file.Files.write(shard.toPath, bytes)
    val gone = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".tar")).last
    java.nio.file.Files.delete(gone.toPath)
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "stray-00099.tar"),
      Array.fill(512)(0.toByte))
    val diff = Manifests.verify(spark, tmp, "*.tar")
      .select("file", "status").as[(String, String)].collect().toMap
    assert(diff == Map(gone.getName -> "missing", "stray-00099.tar" -> "extra"))
  }

  test("writeTokenBalanced: every tar under the token budget, samples whole, keys once") {
    import spark.implicits._
    import graft.sources.TarShards
    val tmp = Files.createTempDirectory("graft-balanced").toString
    // 40 docs, token counts 10..49; doc 7 is a two-member sample
    val toks = (1L to 40L).map(i => (i, 9L + i)).toDF("key", "n_tokens")
    val members = (1L to 40L).flatMap { i =>
      val base = Seq((i, "txt", s"doc$i".getBytes("UTF-8")))
      if (i == 7L) base :+ ((i, "json", s"""{"id":$i}""".getBytes("UTF-8"))) else base
    }.toDF("key", "ext", "content")
    TarShards.writeTokenBalanced(members, toks, s"$tmp/shards",
      budgetTokens = 100L, hashShards = 4, salt = "tb")

    val back = TarShards.entries(spark, s"$tmp/shards")
    // every member lands exactly once; the two-member sample stays whole
    assert(back.count() == 41)
    assert(back.select("key").distinct().count() == 40)
    assert(back.filter($"key" === "7").select("shard").distinct().count() == 1)
    // per-tar token totals respect the budget (no doc exceeds it alone)
    val perShard = back.select($"shard", $"key".cast("long").as("key"))
      .distinct()
      .join(toks, "key")
      .groupBy("shard").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect()
    assert(perShard.forall(_._2 <= 100L),
      s"over-budget shards: ${perShard.filter(_._2 > 100L).mkString(",")}")
    // balance actually happened: more than hashShards tars exist (40 docs
    // x ~29 avg tokens / 100 budget ~ 12 packs)
    assert(perShard.length > 4, s"only ${perShard.length} shards")
  }
}
