package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Tables}

class SinksSuite extends SparkSpec {

  test("partitioned parquet sink enables partition pruning on read") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "lang", "n_chars")
    val tmp = Files.createTempDirectory("graft-sink").toString
    Sinks.parquet(docs, s"$tmp/by_lang", partitionBy = Seq("lang"))
    // hive-style layout: one directory per lang value
    val dirs = new java.io.File(s"$tmp/by_lang").listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.nonEmpty)
    val back = spark.read.parquet(s"$tmp/by_lang")
    assert(back.count() == docs.count())
    // an equality filter on the partition column prunes at planning time
    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(en.count() == docs.filter(col("lang") === "en").count())
  }

  test("trainingShards: one ordered file per shard directory") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    val sharded = graft.operators.Sampling.shuffleShards(df, "id", shards = 4, salt = "w:")
    val tmp = Files.createTempDirectory("graft-shards").toString
    Sinks.trainingShards(sharded, s"$tmp/out")
    val shardDirs = new java.io.File(s"$tmp/out").listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 4)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: one file per shard, got ${files.length}")
      // parquet preserves in-file row order: the shard streams in shuffle order
      val pos = spark.read.parquet(files.head.getPath).select("shard_pos").as[Long].collect()
      assert(pos.toSeq == (0L until pos.length).toSeq, s"${d.getName} not in position order")
    }
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 500)
  }

  test("compact rewrites a many-file table into evenly-sized files") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact").toString
    val path = s"$tmp/t"
    // simulate incremental ingest: 40 appends of 25 rows = 40+ tiny files
    (0 until 40).foreach { i =>
      (0 until 25).map(j => (i * 25L + j, s"row$i-$j")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(path)
    }
    def parquetFiles() = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles() >= 40)
    Sinks.compact(spark, path, rowsPerFile = 250)
    assert(parquetFiles() == 4, s"1000 rows / 250 per file, got ${parquetFiles()}")
    val back = spark.read.parquet(path)
    assert(back.count() == 1000)
    assert(back.select("id").as[Long].collect().toSet == (0L until 1000L).toSet)
    assert(!new java.io.File(path + "._old").exists() &&
      !new java.io.File(path + "._compacting").exists(), "swap dirs cleaned")

    // crash recovery (rename-first, round 10): simulate the worst point —
    // table renamed away, compacted dir not yet renamed in — and the next
    // invocation must restore all 1000 rows before recompacting
    assert(new java.io.File(path).renameTo(new java.io.File(path + "._old")))
    // stage a "compacted" copy the way the crashed pass would have left it
    spark.read.parquet(path + "._old").repartition(2)
      .write.mode("overwrite").parquet(path + "._compacting")
    assert(!new java.io.File(path).exists(), "crash state: table missing")
    Sinks.compact(spark, path, rowsPerFile = 500)
    val rec = spark.read.parquet(path)
    assert(rec.count() == 1000, "recovery must restore every row")
    assert(rec.select("id").as[Long].collect().toSet == (0L until 1000L).toSet)
    assert(parquetFiles() == 2)
    assert(!new java.io.File(path + "._old").exists() &&
      !new java.io.File(path + "._compacting").exists())
  }

  test("compactSmallFiles: only smalls rewrite; healthy files byte-identical; idempotent") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-selcompact").toString
    val path = s"$tmp/t"
    // one healthy file ...
    (0 until 5000).map(j => (j.toLong, s"big-$j" * 10)).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(path)
    // ... plus incremental-ingest smalls
    (0 until 12).foreach { i =>
      (0 until 5).map(j => (100000L + i * 5 + j, s"tiny$i-$j")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(path)
    }
    val dir = new java.io.File(path)
    def pq() = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    val big = pq().maxBy(_.length)
    val bigBytes = java.nio.file.Files.readAllBytes(big.toPath)
    assert(pq().length == 13)
    // a manifest-published directory: compaction must re-own the ledger
    graft.sources.Manifests.write(spark, path, "*.parquet")

    val (removed, made) = Sinks.compactSmallFiles(spark, path,
      smallBytes = big.length, targetBytes = 512L * 1024)
    assert(removed == 12 && made == 1, s"($removed, $made)")
    // the ledger followed the bytes: no missing, no extra
    graft.sources.Manifests.check(spark, path, "*.parquet")
    assert(pq().length == 2)
    assert(pq().count(_.getName.startsWith("compacted-")) == 1)
    // the healthy file was never touched
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(big.toPath), bigBytes))
    // rows intact
    val back = spark.read.parquet(path)
    assert(back.count() == 5060)
    assert(back.where($"id" >= 100000L).count() == 60)
    // second pass: a single small is left alone (needs >= 2 to act)
    assert(Sinks.compactSmallFiles(spark, path, big.length, 512L * 1024) == ((0, 0)))
    intercept[IllegalArgumentException](
      Sinks.compactSmallFiles(spark, path, 100, 50))
  }

  test("compactSmallFiles: interrupted swap recovers — plan replay, no loss, no dupes") {
    import spark.implicits._
    def mkTable(tag: String): String = {
      val path = s"${Files.createTempDirectory(s"graft-swap$tag")}/t"
      (0 until 4).foreach { i =>
        (0 until 5).map(j => ((i * 5 + j).toLong, s"row$i-$j")).toDF("id", "s")
          .coalesce(1).write.mode("append").parquet(path)
      }
      path
    }
    // Case A — crash mid-WRITE: staging dir exists, no plan file. Entry
    // must abort the stale staging and compact normally.
    val pa = mkTable("a")
    val stA = new java.io.File(pa + "._compacting")
    assert(stA.mkdirs())
    java.nio.file.Files.write(stA.toPath.resolve("part-junk.parquet"),
      "not parquet".getBytes)
    val (r1, m1) = Sinks.compactSmallFiles(spark, pa, 1L << 20, 1L << 20)
    assert(r1 == 4 && m1 >= 1)
    assert(!stA.exists(), "stale (plan-less) staging must be aborted")
    assert(spark.read.parquet(pa).count() == 20)

    // Case B — crash MID-SWAP: outputs written, plan persisted, ONE
    // rename already applied (so the table momentarily holds duplicates),
    // smalls not yet deleted. The next invocation must complete the swap:
    // all 20 rows, exactly once.
    val pb = mkTable("b")
    val dirB = new java.io.File(pb)
    val smalls = dirB.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName)
    assert(smalls.length == 4)
    val stB = pb + "._compacting"
    spark.read.parquet(smalls.map(n => s"$pb/$n").toIndexedSeq: _*)
      .repartition(1).write.mode("overwrite").parquet(stB)
    val produced = new java.io.File(stB).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    val plan = smalls.map(n => s"S\t$n") ++
      produced.map(n => s"P\t$n\tcompacted-${n.stripPrefix("part-")}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(stB, "_SWAP_PLAN"),
      plan.mkString("", "\n", "\n").getBytes("UTF-8"))
    // apply the FIRST rename by hand — the crash point with dupes visible
    val first = produced.head
    assert(new java.io.File(s"$stB/$first")
      .renameTo(new java.io.File(s"$pb/compacted-${first.stripPrefix("part-")}")))
    assert(spark.read.parquet(pb).count() > 20, "pre-recovery state holds dupes")
    // recovery runs at entry; afterwards nothing small remains to compact
    val (r2, m2) = Sinks.compactSmallFiles(spark, pb, 10L, 1L << 20)
    assert((r2, m2) == ((0, 0)), s"($r2, $m2)")
    assert(!new java.io.File(stB).exists(), "staging must be cleared")
    val back = spark.read.parquet(pb).select("id").as[Long].collect().sorted
    assert(back.toSeq == (0L until 20L), "exactly-once rows after recovery")
    assert(dirB.listFiles().count(f => f.getName.endsWith(".parquet")) == 1)
  }

  test("clusteredWrite: per-file key ranges are disjoint (data skipping)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cluster").toString
    val path = s"$tmp/t"
    // ids arrive shuffled (hash order) — an unclustered write would give
    // every file the full min..max span, so min/max stats prune nothing
    val df = (0 until 2000).map(i => ((i * 2654435761L) % 2000, i.toLong))
      .toDF("key", "payload")
    Sinks.clusteredWrite(df, path, files = 8, clusterCols = Seq("key"))
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 8)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("key"), max("key")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(hiA < loB, s"file ranges overlap: ${ranges.toSeq}")
    }
    assert(spark.read.parquet(path).count() == 2000)
  }

  test("zorderWrite: files cover small rectangles in BOTH dims; linear sort can't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // deterministic 100x100 grid, shuffled layout
    val rows = for (x <- 0 until 100; y <- 0 until 100) yield (x.toLong, y.toLong)
    val rnd = new scala.util.Random(5)
    val df = rnd.shuffle(rows).toDF("x", "y").repartition(8)
    graft.sources.Sinks.zorderWrite(df, s"$dir/z", files = 16, "x", "y")
    graft.sources.Sinks.clusteredWrite(df, s"$dir/linear", 16, Seq("x"))
    def meanSpans(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max($"x") - min($"x"), max($"y") - min($"y")).head()
        (r.getLong(0) / 99.0, r.getLong(1) / 99.0)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zx, zy) = meanSpans(s"$dir/z")
    val (lx, ly) = meanSpans(s"$dir/linear")
    // z-order: every file a small rectangle — BOTH dims narrow
    assert(zx < 0.45 && zy < 0.45, s"z-order spans x=$zx y=$zy should both be narrow")
    // linear on x: x narrow but y spans ~the whole domain in every file
    assert(lx < 0.2, s"linear x-span $lx")
    assert(ly > 0.7, s"linear y-span $ly should be near-total — the case for z-order")
  }

  test("bucketed Overwrite clears a stale location the catalog has forgotten") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("graft_bq_stale").toString + "/t"
    graft.sources.Sinks.bucketed(Seq((1L, "old")).toDF("k", "v"),
      "bq_stale", "k", 2, path = Some(loc))
    // external-table DROP removes the catalog entry but leaves the files —
    // the fresh-session analogue (an in-memory catalog forgets everything)
    spark.sql("DROP TABLE bq_stale")
    graft.sources.Sinks.bucketed(Seq((2L, "new")).toDF("k", "v"),
      "bq_stale", "k", 2, path = Some(loc))
    val got = spark.table("bq_stale").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "new")), s"stale files must not survive Overwrite: $got")
    spark.sql("DROP TABLE bq_stale")
  }

  test("bucketed Overwrite clears stale warehouse files for DB-QUALIFIED names") {
    import spark.implicits._
    // db.tbl lives at <warehouse>/db.db/tbl — a hand-concatenated
    // <warehouse>/db.tbl delete would silently no-op and re-expose the
    // stale-reuse bug for qualified names. Simulate the fresh-session
    // scenario directly: stale parquet at the MANAGED location, no
    // catalog entry.
    spark.sql("CREATE DATABASE IF NOT EXISTS bqdb")
    val loc = spark.sessionState.catalog.defaultTablePath(
      spark.sessionState.sqlParser.parseTableIdentifier("bqdb.bq_q")).toString
    Seq((1L, "old")).toDF("k", "v").write.parquet(loc)
    graft.sources.Sinks.bucketed(Seq((2L, "new")).toDF("k", "v"),
      "bqdb.bq_q", "k", 2)
    val got = spark.table("bqdb.bq_q").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "new")), s"stale qualified-name files survived: $got")
    spark.sql("DROP TABLE bqdb.bq_q")
    spark.sql("DROP DATABASE bqdb")
  }

  test("bucketed tables join with ZERO exchange (co-located join)") {
    import spark.implicits._
    val facts = (0 until 2000).map(i => (i.toLong % 100, i.toLong)).toDF("key", "a")
    val dims = (0 until 1000).map(i => (i.toLong % 100, s"v$i")).toDF("key", "b")
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    Sinks.bucketed(facts, "bt_facts", "key", 8, sortCols = Seq("key"),
      path = Some(s"$tmp/facts"))
    Sinks.bucketed(dims, "bt_dims", "key", 8, sortCols = Seq("key"),
      path = Some(s"$tmp/dims"))
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // disable broadcast so the exchange-free plan is bucketing's doing,
      // not a small-table special case
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bt_facts").join(spark.table("bt_dims"), "key")
      val n = j.count()
      assert(n == 2000L * 10) // 20 fact rows x 10 dim rows per key
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(2000)}")
      // same join WITHOUT bucketing shuffles both sides
      val raw = facts.join(dims, "key")
      raw.count()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      spark.sql("DROP TABLE IF EXISTS bt_facts")
      spark.sql("DROP TABLE IF EXISTS bt_dims")
    }
  }
}
