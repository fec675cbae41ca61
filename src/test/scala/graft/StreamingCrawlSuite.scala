package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Html, Robots, Url}
import graft.sources.WarcShards
import graft.streaming.StreamingBudget

/** The composed LIVE ingestion chain: WARC shards land → decode →
  * HTML main text → robots admission (E16, stream-static) → per-host
  * token-budget gate (E15, stateful) — p12's batch frontier discipline
  * running as one continuous query. What this pins beyond the parts:
  * the stages actually compose in a single streaming plan (one
  * stream-static join + one flatMapGroupsWithState), and budget state
  * carries across shard arrivals while robots verdicts stay static.
  */
class StreamingCrawlSuite extends SparkSpec {
  import spark.implicits._

  test("streaming crawl chain: shards land -> decode -> robots gate -> budget admit") {
    val tmp = Files.createTempDirectory("graft-streamcrawl").toString
    val watch = s"$tmp/incoming"
    Files.createDirectories(java.nio.file.Paths.get(watch))
    def land(name: String, rows: Seq[(String, String)]): Unit = {
      val staging = s"$tmp/stage-$name"
      WarcShards.write(
        rows.map { case (u, h) =>
          (u, "2026-03-03T00:00:00Z", "text/html", h.getBytes("UTF-8"))
        }.toDF("url", "warc_date", "content_type", "body"),
        staging, shards = Some(1))
      val shard = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".warc.gz")).get
      Files.move(shard.toPath, java.nio.file.Paths.get(s"$watch/$name.warc.gz"))
      ()
    }
    def page(words: Int, tag: String): String =
      s"<html><body><p>${(1 to words).map(i => s"$tag$i").mkString(" ")}</p></body></html>"

    // shard 0 carries the host's robots.txt; rules are the STATIC side,
    // pinned once (reference data — refresh = query restart, documented)
    land("s0", Seq(("http://st.example/robots.txt",
      "User-agent: *\nDisallow: /private/\n")))
    val rules = Robots.rules(
      WarcShards.decodedResponses(spark, watch)
        .where($"url".endsWith("/robots.txt"))
        .select(Url.host($"url").as("host"), $"text".as("body")))
      .localCheckpoint(true)

    val pages = WarcShards.streamResponses(spark, watch)
      .where(!$"url".endsWith("/robots.txt"))
      .select($"url", Html.htmlMainText($"body".cast("string")).as("text"))
    val gated = Robots.admit(pages, rules, "graftbot")
      .where($"robots_allowed")
      .select(
        regexp_extract($"url", "/p(\\d+)\\.html$", 1).try_cast("long").as("id"),
        Url.host($"url").as("group"),
        size(split($"text", "\\s+")).cast("long").as("weight"))
      .as[(Long, String, Long)]
    // 20-token budget: p1(8) + p3(8) = 16 < 20, p4 is the crossing row
    // (kept, spent=24), p5 arrives over budget and drops
    val admitted = StreamingBudget.admitToBudget(gated, Map("st.example" -> 20L))
    val q = admitted.writeStream.format("memory").queryName("crawl_admitted")
      .option("checkpointLocation", s"$tmp/ckpt").outputMode("append").start()
    try {
      land("s1", Seq(
        ("http://st.example/p1.html", page(8, "alpha")),
        ("http://st.example/private/p2.html", page(8, "secret")),
        ("http://st.example/p3.html", page(8, "bravo"))))
      q.processAllAvailable()
      assert(spark.table("crawl_admitted").select("id").as[Long].collect().sorted
        .toSeq == Seq(1L, 3L))

      land("s2", Seq(
        ("http://st.example/p4.html", page(8, "carol")),
        ("http://st.example/p5.html", page(8, "delta"))))
      q.processAllAvailable()
      val got = spark.table("crawl_admitted")
        .select("id", "weight").as[(Long, Long)].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq == Seq(1L, 3L, 4L), got.mkString(","))
      assert(got.forall(_._2 == 8L))
      // robots stayed static: the private page never surfaced
      assert(!spark.table("crawl_admitted").select("id").as[Long]
        .collect().contains(2L))
    } finally q.stop()
  }

  test("E16+: robots refresh mid-stream gates SUBSEQUENT batches only, rate-limited") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingRobots
    implicit val sqlCtx = spark.sqlContext

    // the authoritative robots source: a mutable bodies table the
    // loader re-reads (stand-in for re-scanning a robots-bodies dir)
    @volatile var bodies: Seq[(String, String)] =
      Seq(("rf.example", "User-agent: *\nDisallow: /private/\n"))
    var loaderRan = 0
    @volatile var loaderBroken = false
    // manual clock so the TTL is driven deterministically
    var clockMs = 0L
    val rules = new StreamingRobots.RefreshingRules(
      () => {
        if (loaderBroken) sys.error("robots source outage")
        loaderRan += 1; Robots.rules(bodies.toDF("host", "body"))
      },
      ttlMs = 1000L, clock = () => clockMs)

    val perBatch = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, Boolean)])]
    val src = MemoryStream[(Long, String)]
    val urls = src.toDF().toDF("id", "url")
    val q = urls.writeStream
      .foreachBatch(StreamingRobots.admitBatches(rules, "graftbot",
        (gated, batchId) => {
          // batch parity: the foreachBatch body IS Robots.admit on the
          // batch's rows — pin the emitted verdicts per batch
          val got = gated.select("id", "robots_allowed")
            .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
          perBatch += batchId -> got
        }))
      .start()
    try {
      // batch 0 under rules v1: /private/ blocked
      src.addData((1L, "http://rf.example/a.html"),
        (2L, "http://rf.example/private/b.html"))
      q.processAllAvailable()
      assert(perBatch.last._2 == Seq(1L -> true, 2L -> false))
      assert(rules.loadCount == 1L)

      // source changes but TTL has not elapsed: old snapshot still
      // serves (no re-read), /blog/ still admitted
      bodies = Seq(("rf.example", "User-agent: *\nDisallow: /blog/\n"))
      src.addData((3L, "http://rf.example/blog/c.html"),
        (4L, "http://rf.example/private/d.html"))
      q.processAllAvailable()
      assert(perBatch.last._2 == Seq(3L -> true, 4L -> false))
      assert(rules.loadCount == 1L, "a refresh under TTL must not re-read")

      // TTL elapses: the NEXT batch picks up v2 — /blog/ now blocked,
      // /private/ released — while earlier batches' verdicts stand
      clockMs += 1500L
      src.addData((5L, "http://rf.example/blog/e.html"),
        (6L, "http://rf.example/private/f.html"))
      q.processAllAvailable()
      assert(perBatch.last._2 == Seq(5L -> false, 6L -> true))
      assert(rules.loadCount == 2L)
      // emitted history never revised: batch 0/1 rows as first verdicted
      assert(perBatch.map(_._2).flatten.toSeq ==
        Seq(1L -> true, 2L -> false, 3L -> true, 4L -> false,
          5L -> false, 6L -> true))
      assert(loaderRan == 2)

      // a FAILED reload past TTL serves the stale snapshot instead of
      // failing the batch (retry next time); the query stays alive
      loaderBroken = true
      clockMs += 1500L
      src.addData((7L, "http://rf.example/blog/g.html"))
      q.processAllAvailable()
      assert(perBatch.last._2 == Seq(7L -> false), "v2 must still gate")
      assert(rules.loadCount == 2L)
      // source recovers: the next over-TTL batch reloads
      loaderBroken = false
      bodies = Seq(("rf.example", "User-agent: *\nDisallow: /private/\n"))
      clockMs += 1500L
      src.addData((8L, "http://rf.example/blog/h.html"))
      q.processAllAvailable()
      assert(perBatch.last._2 == Seq(8L -> true))
      assert(rules.loadCount == 3L)
    } finally { q.stop(); rules.close() }
  }

  test("E21: exactly-once streaming shard export — replays never double-write") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.{Manifests, TarShards}
    import graft.streaming.StreamingShardExport
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-shardexport").toString
    val out = s"$tmp/out"
    val src = MemoryStream[(String, String, String)]
    val sink = StreamingShardExport.tarBatches(out, shards = 2)
    val q = src.toDF().toDF("key", "ext", "payload")
      .withColumn("content", col("payload").cast("binary")).drop("payload")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      src.addData(("k1", "txt", "alpha"), ("k2", "txt", "bravo"))
      q.processAllAvailable()
      assert(StreamingShardExport.committed(spark, out, 0L))
      val b0 = s"$out/batch-000000000"
      def snapshot() = new java.io.File(b0).listFiles().map(f =>
        f.getName -> f.lastModified()).toMap
      val before = snapshot()

      // failure re-delivery of a COMMITTED batch: byte-for-byte no-op
      val replay = Seq(("k1", "txt", "alpha".getBytes("UTF-8")),
        ("k2", "txt", "bravo".getBytes("UTF-8"))).toDF("key", "ext", "content")
      sink(replay, 0L)
      assert(snapshot() == before, "replay of a committed batch must not touch files")

      // crash-mid-write simulation: shards landed, manifest did not ->
      // the replay REWRITES the batch and commits it
      assert(new java.io.File(b0, "_MANIFEST.jsonl").delete())
      sink(replay, 0L)
      assert(StreamingShardExport.committed(spark, out, 0L))

      src.addData(("k3", "txt", "carol"))
      q.processAllAvailable()
      assert(StreamingShardExport.committed(spark, out, 1L))
      // consume ONLY manifest-listed shards across batch dirs
      val keys = Seq(0L, 1L).flatMap { id =>
        val d = f"$out/batch-$id%09d"
        TarShards.entries(spark, d, Manifests.listedGlob(spark, d))
          .select("key").as[String].collect()
      }.sorted
      assert(keys == Seq("k1", "k2", "k3"))
    } finally q.stop()
  }
}
