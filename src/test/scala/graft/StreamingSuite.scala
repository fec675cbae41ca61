package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.{Stage, PipelineConfig, ExecutionMode}
import graft.streaming.{EventStreams, ServingPipeline, StreamingMonitor, StreamingUpsert}

/** F5 (SERVING mode over Structured Streaming) and E1 (watermark + windowed
  * event-time aggregation).
  */
object StreamingSuite {
  final case class Req(id: Long, payload: String)
  final case class Resp(id: Long, result: String)
}

class StreamingSuite extends SparkSpec {
  import StreamingSuite._

  test("F5: Stage chain served over a streaming source (queue-in/queue-out)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Req]
    val served = ServingPipeline.compile(source.toDS())
      .stage(new Stage[Req, Resp] {
        override def batchSize: Int = 4
        override def process(b: Seq[Req]): Seq[Resp] =
          b.map(r => Resp(r.id, r.payload.reverse))
      })
      .run()
    val query = ServingPipeline.start(served, "served_out")
    try {
      source.addData(Req(1, "abc"), Req(2, "xy"))
      query.processAllAvailable()
      source.addData(Req(3, "graft")) // workers stay up; next request batch
      query.processAllAvailable()
      val got = spark.table("served_out").as[Resp].collect().sortBy(_.id)
      assert(got.toSeq == Seq(Resp(1, "cba"), Resp(2, "yx"), Resp(3, "tfarg")))
    } finally query.stop()
  }

  test("E2: streaming exact dedup keeps first arrival; watermark bounds state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // unbounded variant: duplicates suppressed across micro-batches
    val src = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingDedup.firstArrival(
      src.toDS().toDF("id", "fp"), Seq("fp"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      src.addData((1L, "a"), (2L, "b"), (3L, "a")) // 3 is a dup of 1 in-batch
      q.processAllAvailable()
      src.addData((4L, "b"), (5L, "c"))            // 4 is a dup across batches
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[(Long, String)].collect().sortBy(_._1)
      assert(got.map(_._2).sorted.toSeq == Seq("a", "b", "c"))
      assert(got.map(_._1).toSet.intersect(Set(3L, 4L)).isEmpty,
        "later duplicates are dropped, first arrivals kept")
    } finally q.stop()
    // bounded variant compiles to watermarked dedup state (semantics:
    // duplicates suppressed within the horizon, state evicted past it)
    val src2 = MemoryStream[(java.sql.Timestamp, String)]
    val bounded = graft.streaming.StreamingDedup.firstArrivalBounded(
      src2.toDS().toDF("ts", "fp"), "ts", "10 minutes", Seq("fp"))
    val q2 = bounded.writeStream.format("memory").queryName("dedup_bounded")
      .outputMode("append").start()
    try {
      src2.addData((new Timestamp(0L), "x"), (new Timestamp(1000L), "x"))
      q2.processAllAvailable()
      assert(spark.table("dedup_bounded").count() == 1,
        "in-horizon duplicate suppressed under the watermark")
    } finally q2.stop()
    // batch inputs are rejected (use operators.Dedup.exact there)
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingDedup.firstArrival(Seq((1L, "a")).toDF("id", "fp"), Seq("fp"))
    }
  }

  test("narrow text operators compose over streams (classifier on a live source)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "zeta"))
    val src = MemoryStream[(Long, String)]
    // the derived-weights classifier is one narrow codegen expression, so
    // it applies to a streaming DataFrame unchanged — ingest-time quality
    // scoring with zero state
    val out = graft.operators.TextAnalysis.hashClassifier(
      src.toDS().toDF("id", "text"), "id", "text")
    val q = out.writeStream.format("memory").queryName("cls_stream")
      .outputMode("append").start()
    try {
      src.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("cls_stream")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      val batch = graft.operators.TextAnalysis.hashClassifier(
          rows.toDF("id", "text"), "id", "text")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      assert(streamed == batch, "stream and batch scoring agree row for row")
    } finally q.stop()
  }

  test("E4: stream-stream interval join pairs events within the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000)
    val imps = MemoryStream[(Long, Timestamp, String)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = graft.streaming.StreamJoins.intervalJoin(
      imps.toDS().toDF("imp_id", "its", "key"),
      clicks.toDS().toDF("click_id", "cts", "key"),
      "key", "its", "cts", within = "10 seconds", watermarkDelay = "5 seconds")
      .select(col("l.imp_id"), col("r.click_id"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(10), "a"), (2L, ts(10), "b"))
      q.processAllAvailable()
      // click on a within 10s -> attributed; late click on b (40s) -> not
      clicks.addData((100L, ts(15), "a"), (200L, ts(40), "b"))
      q.processAllAvailable()
      // key with no impression never joins
      clicks.addData((300L, ts(16), "zzz"))
      q.processAllAvailable()
      val got = spark.table("ssjoin_out").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L)), s"only the in-window pair attributes: $got")
    } finally q.stop()
  }

  test("E3: streaming near-dup flags band collisions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    val textB = "one two three four five six seven eight nine"
    val textC = "red green blue cyan magenta yellow black white"
    val src = MemoryStream[(Long, Timestamp, String)]
    val out = graft.streaming.StreamingNearDup.nearDupFlags(
      src.toDS(), watermarkDelay = "5 seconds", windowSize = "10 seconds")
    val q = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      src.addData((1L, ts(1), textA), (2L, ts(2), textB))
      q.processAllAvailable()
      // doc 3 duplicates doc 1 (all bands collide); doc 4 is novel
      src.addData((3L, ts(4), textA), (4L, ts(5), textC))
      q.processAllAvailable()
      // push the watermark far past the first window to flush the rollup
      src.addData((99L, ts(1000), "flush flush flush flush"))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .select("doc_id", "near_dup").as[(Long, Boolean)].collect().toMap
      assert(got(1L) == false, "first arrival owns its bands")
      assert(got(2L) == false)
      assert(got(3L) == true, "identical later doc collides on every band")
      assert(got(4L) == false, "novel doc owns fresh bands")
      // every emitted doc carries all NumBands band verdicts
      val nb = spark.table("neardup_out").select("n_bands").as[Long].collect()
      assert(nb.forall(_ == graft.functions.Signatures.NumBands.toLong))
    } finally q.stop()
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingNearDup.nearDupFlags(
        Seq((1L, new Timestamp(0L), "x")).toDS(), "5 seconds")
    }
  }

  test("custom state: flatMapGroupsWithState incremental sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long)]
    val out = graft.streaming.StatefulSessions.sessionCounts(source.toDS(), gapMillis = 1000)
    val query = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 100ms apart -> 1 session; user 2: one event
      source.addData((1L, 0L), (1L, 100L), (2L, 50L))
      query.processAllAvailable()
      // user 1: next event 5s later -> new session; state carried across batches
      source.addData((1L, 5100L))
      query.processAllAvailable()
      // a LATE cross-batch event joins silently (<= lastTs) and must not
      // rewind the session clock...
      source.addData((1L, 4900L))
      query.processAllAvailable()
      // ...so this in-order event (600ms after 5100) does NOT open a session
      source.addData((1L, 5700L))
      query.processAllAvailable()
      val last = spark.table("sessions")
        .groupBy("entity").agg(org.apache.spark.sql.functions.max("n_sessions").as("s"),
          org.apache.spark.sql.functions.max("n_events").as("e"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(last.toSeq == Seq((1L, 2L, 5L), (2L, 1L, 1L)))
    } finally query.stop()
  }

  test("F5b: served output lands in a durable file sink with checkpointing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    val source = MemoryStream[Req]
    val served = ServingPipeline.compile(source.toDS())
      .stage(new Stage[Req, Resp] {
        override def process(b: Seq[Req]): Seq[Resp] =
          b.map(r => Resp(r.id, r.payload.toUpperCase))
      })
      .run()
    val query = served.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      source.addData(Req(1, "ab"), Req(2, "cd"))
      query.processAllAvailable()
      source.addData(Req(3, "ef"))
      query.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out").as[Resp].collect().sortBy(_.id)
      assert(got.toSeq == Seq(Resp(1, "AB"), Resp(2, "CD"), Resp(3, "EF")))
      // the checkpoint carries stream progress — the exactly-once ledger
      // a restarted query resumes from
      assert(new java.io.File(s"$dir/ckpt/offsets").listFiles().nonEmpty)
    } finally query.stop()
  }

  test("F5c: a stateful served route restarts from its checkpoint — state survives, exactly-once") {
    import spark.implicits._
    // the crash-resume story F5b only gestures at: stop a STATEFUL query
    // (running per-key sums through a Stage chain), write more source
    // data while it is down, start a NEW query from the same checkpoint
    // — the state store must resume the sums (no loss) and the offsets
    // ledger must not replay batch-1 files into them (no double count).
    // A file source is the replayable "input queue" here: MemoryStream
    // cannot survive a restart by design.
    val dir = java.nio.file.Files.createTempDirectory("graft_restart").toFile
    val srcDir = s"$dir/src"
    Seq((1L, 5L), (2L, 3L)).toDF("k", "v").write.mode("append").parquet(srcDir)
    def startQuery() = {
      val stream = spark.readStream
        .schema("k LONG, v LONG").parquet(srcDir).as[(Long, Long)]
      val served = ServingPipeline.compile(stream)
        .stage(new Stage[(Long, Long), (Long, Long)] {
          override def process(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
            b.map { case (k, v) => (k, v * 10) }
        })
        .run().toDF("k", "v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
      served.writeStream.format("memory").queryName("restart_agg")
        .outputMode("complete")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
    }
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      val before = spark.table("restart_agg").as[(Long, Long)].collect().toMap
      assert(before == Map(1L -> 50L, 2L -> 30L))
    } finally q1.stop() // the "crash"
    // requests keep arriving while the route is down
    Seq((1L, 2L), (3L, 7L)).toDF("k", "v").write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val after = spark.table("restart_agg").as[(Long, Long)].collect().toMap
      // resumed state: 50+20 (not 50+50+20, which would mean batch-1
      // replayed into state; not 20, which would mean state lost)
      assert(after == Map(1L -> 70L, 2L -> 30L, 3L -> 70L), after.toString)
    } finally q2.stop()
  }

  test("F18b: event-time timeout evicts session state; late events can't resurrect it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val out = graft.streaming.StatefulSessions.sessionCountsWithTimeout(
      source.toDS(), gapMillis = 5000, watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("sessions_wm")
      .outputMode("append").start()
    try {
      def ts(ms: Long) = new Timestamp(ms)
      // entity 1: one session of two events; watermark ends at 2000
      source.addData((1L, ts(1000)), (1L, ts(2000)))
      query.processAllAvailable()
      // entity 2 far in the future advances the watermark to 100000...
      source.addData((2L, ts(100000)))
      query.processAllAvailable()
      // ...and the next batch fires entity 1's timeout (100000 > 2000+5000)
      source.addData((2L, ts(101000)))
      query.processAllAvailable()
      // a late event below the watermark must NOT resurrect evicted state
      source.addData((1L, ts(50)))
      query.processAllAvailable()
      // a fresh in-watermark event starts over: n_sessions restarts at 1
      source.addData((1L, ts(102000)))
      query.processAllAvailable()
      val e1 = spark.table("sessions_wm")
        .as[graft.streaming.StatefulSessions.SessionCount].collect()
        .filter(_.entity == 1L).map(r => (r.n_sessions, r.n_events)).toSeq
      assert(e1.contains((1L, 2L)), "pre-eviction session emitted")
      assert(e1.contains((1L, 1L)), "post-eviction events start a FRESH state")
      assert(!e1.exists(_._1 >= 2L), "evicted state must not carry session counts")
      assert(!e1.exists(_._2 == 3L), "the late event must not reach the state")
    } finally query.stop()
  }

  test("stream-static join: streaming events enriched with a broadcast dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val nations = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    val source = MemoryStream[(Long, Int)] // (event_id, nationkey)
    val enriched = source.toDF().toDF("event_id", "nationkey")
      .join(org.apache.spark.sql.functions.broadcast(nations),
        col("nationkey") === col("n_nationkey"))
      .select("event_id", "n_name")
    val query = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      source.addData((1L, 0), (2L, 1), (3L, 999)) // 999: no dim match -> dropped
      query.processAllAvailable()
      val rows = spark.table("enriched").as[(Long, String)].collect().sortBy(_._1)
      assert(rows.length == 2)
      assert(rows.map(_._1).toSeq == Seq(1L, 2L))
      assert(rows.forall(_._2.nonEmpty))
    } finally query.stop()
  }

  test("E1: watermarked tumbling-window aggregation over event-time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val events = source.toDF().toDF("ts", "event_type")
    val agg = EventStreams.hourlyCounts(events, delay = "30 minutes")
    val query = agg.writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      source.addData((t(1, 5), "click"), (t(1, 25), "click"), (t(1, 45), "view"))
      query.processAllAvailable()
      // advance event time beyond hour 1 + watermark -> hour-1 windows close
      source.addData((t(3, 0), "click"))
      query.processAllAvailable()
      val rows = spark.table("hourly")
        .select(col("hour").cast("string"), col("event_type"), col("n_events"))
        .as[(String, String, Long)].collect().sorted
      assert(rows.contains(("2026-01-01 01:00:00", "click", 2L)))
      assert(rows.contains(("2026-01-01 01:00:00", "view", 1L)))
    } finally query.stop()
  }

  test("E5: native session_window gap sessions — split on gap, merged within") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    // Spark's built-in session_window (gap-merged event-time sessions):
    // the STREAMING-native twin of the batch q11 sessionize and the
    // custom flatMapGroupsWithState path — state is managed by the
    // engine, watermark-evicted, and sessions merge across micro-batches
    val sessions = source.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "5 seconds"), col("user"))
      .agg(count(lit(1)).as("n_events"))
    val query = sessions.writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      def t(s: Int) = Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
      // u1: events at 0,3,6 chain into ONE session (gaps < 5 s) even
      // though they arrive across different micro-batches; the event at
      // 20 starts a second session (gap 14 s > 5)
      source.addData((t(0), "u1"), (t(3), "u1"))
      query.processAllAvailable()
      source.addData((t(6), "u1"), (t(20), "u1"))
      query.processAllAvailable()
      // push event time past 20+5+10 so every session closes and emits
      source.addData((Timestamp.valueOf("2026-01-01 00:01:30"), "u2"))
      query.processAllAvailable()
      val rows = spark.table("native_sessions")
        .select(col("session_window.start").cast("string").as("s"),
          col("session_window.end").cast("string").as("e"), col("user"), col("n_events"))
        .as[(String, String, String, Long)].collect().toSeq.sorted
      assert(rows.contains(("2026-01-01 00:00:00", "2026-01-01 00:00:11", "u1", 3L)),
        s"merged session missing: $rows")
      assert(rows.contains(("2026-01-01 00:00:20", "2026-01-01 00:00:25", "u1", 1L)),
        s"split session missing: $rows")
    } finally query.stop()
  }

  test("E6: streaming CDC upsert — durable target holds the latest row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val source = MemoryStream[(Long, Long, String)]
    val changes = source.toDF().toDF("k", "seq", "v")
    val query = StreamingUpsert.start(changes, s"$dir/target", s"$dir/ckpt",
      keyCol = "k", orderCols = Seq("seq"), payloadCols = Seq("v"))
    try {
      source.addData((1L, 10L, "a1"), (2L, 5L, "b1"))
      query.processAllAvailable()
      source.addData((1L, 20L, "a2"), (3L, 1L, "c1"))
      query.processAllAvailable()
      // LATE change for key 1 (seq 15 < current 20): must lose the merge
      source.addData((1L, 15L, "a-late"))
      query.processAllAvailable()
      val got = spark.read.parquet(s"$dir/target")
        .select("k", "seq", "v").as[(Long, Long, String)].collect().sorted.toSeq
      assert(got == Seq((1L, 20L, "a2"), (2L, 5L, "b1"), (3L, 1L, "c1")), got.toString)
    } finally query.stop()
  }

  test("F15s: StreamingMonitor rolls up per-query batches/rates from the event bus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mon = new StreamingMonitor().attach(spark)
    val source = MemoryStream[Long]
    val query = source.toDF().writeStream.format("memory")
      .queryName("mon_probe").outputMode("append").start()
    try {
      source.addData(1L, 2L, 3L)
      query.processAllAvailable()
      source.addData(4L)
      query.processAllAvailable()
      // listener delivery is async (documented at-least-once contract):
      // poll until the progress events land
      val deadline = System.nanoTime() + 10e9.toLong
      def snaps = mon.snapshots.getOrElse("mon_probe", Nil)
      while (snaps.map(_.numInputRows).sum < 4 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(snaps.map(_.numInputRows).sum == 4, snaps.toString)
      assert(snaps.map(_.batchId).distinct.size >= 2, "one snapshot per micro-batch")
      assert(mon.report().contains("mon_probe"))
    } finally { query.stop(); mon.detach(spark) }
  }

  test("F15s: StreamingMonitor reports LIFETIME totals past the snapshot ring") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // keep=1: the ring retains only the newest snapshot, but report()
    // must keep counting lifetime batches/rows (a window sum would
    // freeze batches at `keep` and understate rows)
    val mon = new StreamingMonitor(keep = 1).attach(spark)
    val source = MemoryStream[Long]
    val query = source.toDF().writeStream.format("memory")
      .queryName("mon_ring").outputMode("append").start()
    try {
      (1 to 3).foreach { i => source.addData(i.toLong, 100L + i); query.processAllAvailable() }
      val deadline = System.nanoTime() + 10e9.toLong
      def line = mon.report().linesIterator.find(_.contains("mon_ring")).getOrElse("")
      while (!line.contains("rows=6") && System.nanoTime() < deadline) Thread.sleep(50)
      assert(mon.snapshots("mon_ring").size == 1, "ring must hold only `keep` snapshots")
      assert(line.contains("batches=3") && line.contains("rows=6"), line)
    } finally { query.stop(); mon.detach(spark) }
  }

  test("E6b: upsert recovers compacted state from the tmp dir after a mid-swap crash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_crash").toString
    // simulate a crash between delete(target) and rename(tmp, target):
    // the completed merge sits in ._merging, the target dir is missing
    Seq((1L, 10L, "prior"), (2L, 7L, "kept"))
      .toDF("k", "seq", "v").write.parquet(s"$dir/target._merging")
    val source = MemoryStream[(Long, Long, String)]
    val query = StreamingUpsert.start(source.toDF().toDF("k", "seq", "v"),
      s"$dir/target", s"$dir/ckpt", "k", Seq("seq"), Seq("v"))
    try {
      source.addData((1L, 11L, "replayed"))
      query.processAllAvailable()
      val got = spark.read.parquet(s"$dir/target")
        .select("k", "seq", "v").as[(Long, Long, String)].collect().sorted.toSeq
      // key 2 came ONLY from the tmp dir — losing it is the state-loss bug
      assert(got == Seq((1L, 11L, "replayed"), (2L, 7L, "kept")), got.toString)
    } finally query.stop()
  }

  test("streaming ewma: in-batch sort restores order, late rows flagged, batch equivalence") {
    import spark.implicits._
    import graft.streaming.StreamingEwma
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Long, Long, Double)]
    val out = StreamingEwma.ewma(source.toDS(), alpha = 0.25, scale = 1L)
    val query = out.writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      def rows() = spark.table("ewma_out").as[StreamingEwma.EwmaRow].collect()
      // batch 1 arrives OUT of (ord, tie) order; the fold must sort first
      source.addData(("1", 20L, 2L, 8.0), ("1", 10L, 1L, 4.0), ("2", 5L, 3L, 9.0))
      query.processAllAvailable()
      val r1 = rows().sortBy(r => (r.key, r.ord))
      assert(r1.map(r => (r.key, r.ord, r.ewma, r.late)).toSeq == Seq(
        ("1", 10L, 4.0, false),
        ("1", 20L, 0.25 * 8.0 + 0.75 * 4.0, false),
        ("2", 5L, 9.0, false)), r1.mkString(","))
      // batch 2: a late row (ord below key 1's high-water mark) flags and
      // does NOT fold; the in-order row continues from the carried state
      source.addData(("1", 15L, 9L, 100.0), ("1", 30L, 4L, 12.0))
      query.processAllAvailable()
      val r2 = rows().sortBy(r => (r.key, r.ord))
      val y2 = 0.25 * 8.0 + 0.75 * 4.0
      val late = r2.filter(_.late)
      assert(late.map(r => (r.key, r.ord, r.ewma)).toSeq == Seq(("1", 15L, y2)), r2.mkString(","))
      assert(r2.filter(r => r.ord == 30L).map(_.ewma).toSeq ==
        Seq(0.25 * 12.0 + 0.75 * y2), r2.mkString(","))
      // in-order streaming readout equals the batch operator on the
      // concatenated accepted rows
      val batch = graft.operators.Relational.ewma(
        Seq((1L, 10L, 1L, 4.0), (1L, 20L, 2L, 8.0), (1L, 30L, 4L, 12.0),
          (2L, 5L, 3L, 9.0)).toDF("e", "o", "t", "v"),
        col("e"), col("o"), col("t"), col("v"), alpha = 0.25, scale = 1L)
        .select("entity", "ord", "ewma").as[(Long, Long, Double)].collect()
        .map { case (e, o, y) => (e.toString, o, y) }.toSet
      val stream = rows().filterNot(_.late).map(r => (r.key, r.ord, r.ewma)).toSet
      assert(stream == batch, s"$stream vs $batch")
    } finally query.stop()
    intercept[IllegalArgumentException] {
      StreamingEwma.ewma(source.toDS(), alpha = 0.0)
    }
  }

  test("E23: streaming CUSUM — integer fold, alarm restart, late rows, batch equality") {
    import spark.implicits._
    import graft.streaming.StreamingCusum
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Long, Long, Double)]
    // target 10, allowance 1, threshold 5: +3 per 14-unit step
    val out = StreamingCusum.cusum(source.toDS(), targetUnits = 10L,
      kUnits = 1L, hUnits = 5L, scale = 1L)
    val query = out.writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    try {
      def rows() = spark.table("cusum_out").as[StreamingCusum.CusumRow].collect()
      // batch 1 arrives OUT of order; on-target row holds 0, two +3 steps
      // cross h=5 on the second -> alarm +1, then restart
      source.addData(("1", 3L, 0L, 14.0), ("1", 1L, 0L, 10.0), ("1", 2L, 0L, 14.0))
      query.processAllAvailable()
      val r1 = rows().sortBy(_.ord)
      assert(r1.map(r => (r.ord, r.sPlus, r.flag)).toSeq ==
        Seq((1L, 0L, 0), (2L, 3L, 0), (3L, 6L, 1)), r1.mkString(","))
      // batch 2: the late row (ord 2 <= high-water 3) reports the POST-RESET
      // state and does not fold; the downward shift then alarms -1
      source.addData(("1", 2L, 0L, 100.0), ("1", 4L, 0L, 4.0), ("1", 5L, 0L, 4.0))
      query.processAllAvailable()
      val r2 = rows().sortBy(r => (r.ord, !r.late))
      val late = r2.filter(_.late)
      assert(late.map(r => (r.ord, r.sPlus, r.sMinus, r.flag)).toSeq ==
        Seq((2L, 0L, 0L, 0)), r2.mkString(","))
      assert(r2.filter(r => !r.late && r.ord >= 4L)
        .map(r => (r.ord, r.sMinus, r.flag)).toSeq ==
        Seq((4L, 5L, 0), (5L, 10L, -1)), r2.mkString(","))
      // in-order streaming readout equals the batch operator on the
      // concatenated accepted rows — the all-integer fold is bit-exact
      val batch = graft.operators.Relational.cusum(
        Seq((1L, 1L, 0L, 10.0), (1L, 2L, 0L, 14.0), (1L, 3L, 0L, 14.0),
          (1L, 4L, 0L, 4.0), (1L, 5L, 0L, 4.0)).toDF("e", "o", "t", "v"),
        col("e"), col("o"), col("t"), col("v"),
        targetUnits = 10L, kUnits = 1L, hUnits = 5L, scale = 1L)
        .select("ord", "s_plus", "s_minus", "flag")
        .as[(Long, Long, Long, Int)].collect().toSet
      val stream = rows().filterNot(_.late)
        .map(r => (r.ord, r.sPlus, r.sMinus, r.flag)).toSet
      assert(stream == batch, s"$stream vs $batch")
    } finally query.stop()
    intercept[IllegalArgumentException] {
      StreamingCusum.cusum(source.toDS(), targetUnits = 0L, kUnits = 0L,
        hUnits = 0L)
    }
  }

  test("E23: streaming CUSUM drops non-finite values (batch null-drop parity)") {
    import spark.implicits._
    import graft.streaming.StreamingCusum
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Long, Long, Double)]
    val out = StreamingCusum.cusum(source.toDS(), targetUnits = 10L,
      kUnits = 1L, hUnits = 5L, scale = 1L)
    val query = out.writeStream.format("memory").queryName("cusum_nan_out")
      .outputMode("append").start()
    try {
      def rows() = spark.table("cusum_nan_out").as[StreamingCusum.CusumRow].collect()
      // NaN/Inf rows emit nothing, fold nothing (math.floor(NaN*s+0.5)
      // .toLong would feed c=0 into the state) and do NOT advance the
      // high-water mark — exactly the batch twin's null-drop contract
      source.addData(("1", 1L, 0L, 14.0), ("1", 2L, 0L, Double.NaN),
        ("1", 3L, 0L, Double.PositiveInfinity))
      query.processAllAvailable()
      val r1 = rows()
      assert(r1.map(r => (r.ord, r.sPlus, r.flag)).toSeq == Seq((1L, 3L, 0)),
        r1.mkString(","))
      // because the non-finite rows never moved the high-water mark, a
      // finite re-send of ord 2 is IN ORDER (not late) and folds normally
      source.addData(("1", 2L, 0L, 14.0))
      query.processAllAvailable()
      val r2 = rows().sortBy(_.ord)
      assert(r2.map(r => (r.ord, r.sPlus, r.flag, r.late)).toSeq ==
        Seq((1L, 3L, 0, false), (2L, 6L, 1, false)), r2.mkString(","))
    } finally query.stop()
  }

  test("streaming anomaly: batch-grained prequential baseline, warm-up, isolation") {
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Double)]
    val out = StreamingAnomaly.anomalies(source.toDS(), threshold = 3.0,
      minN = 10L, scale = 1L)
    val query = out.writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      // warm-up: every value's baseline has n < minN -> nothing flags,
      // state still accumulates (n=10, s=110, ss=1220 -> var = 10/9)
      source.addData((1 to 5).flatMap(_ => Seq(("a", 10.0), ("a", 12.0))): _*)
      query.processAllAvailable()
      def rows() = spark.table("anom_out").as[StreamingAnomaly.AnomalyRow].collect()
      assert(rows().isEmpty, rows().mkString(","))
      // two spikes in ONE batch both judge against the PRE-BATCH
      // baseline (batch-grained: the baseline is fixed for the whole
      // micro-batch, so verdicts are identical under any iterator
      // order — nPrior is 10 for both and neither scores against the
      // other). The cold key b stays silent (warming), proving
      // per-key isolation.
      source.addData(("a", 100.0), ("a", 100.0), ("b", 50.0))
      query.processAllAvailable()
      val r2 = rows()
      assert(r2.length == 2 && r2.forall(r => r.key == "a" && r.value == 100.0), r2.mkString(","))
      assert(r2.forall(_.nPrior == 10L), r2.mkString(","))
      assert(r2.forall(r => math.abs(r.z - 89.0 / math.sqrt(10.0 / 9.0)) < 1e-9),
        r2.mkString(","))
      // a value near the new running mean does not flag, and the two
      // spikes DID fold into the baseline after judging
      source.addData(("a", 26.0))
      query.processAllAvailable()
      assert(rows().length == 2, rows().mkString(","))
    } finally query.stop()
    intercept[IllegalArgumentException] {
      StreamingAnomaly.anomalies(source.toDS(), threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      StreamingAnomaly.anomalies(source.toDS(), minN = 1L)
    }
  }

  test("streaming drift: grid KS exact, above-grid mass, no-reference keys silent") {
    import spark.implicits._
    import graft.streaming.StreamingDrift
    implicit val sqlCtx = spark.sqlContext
    // reference a: {1,2,3} -> grid [1,2,3], cum [1,2,3], n=3
    val ref = StreamingDrift.buildReference(
      Map("a" -> Seq(1.0, 2.0, 3.0), "b" -> Seq(1.0)), scale = 1L)
    val source = MemoryStream[(String, Double)]
    val out = StreamingDrift.drift(source.toDS(), ref, scale = 1L)
    val query = out.writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      def latest(): Map[String, StreamingDrift.DriftRow] =
        spark.table("drift_out").as[StreamingDrift.DriftRow].collect()
          .groupBy(_.key).view.mapValues(_.maxBy(_.nStream)).toMap
      // batch 1: stream a == reference -> D = 0; z has no reference -> silent
      source.addData(("a", 1.0), ("a", 2.0), ("a", 3.0), ("z", 9.0))
      query.processAllAvailable()
      val r1 = latest()
      assert(r1.keySet == Set("a") && r1("a").dNum == 0L && r1("a").d == 0.0,
        r1.toString)
      // batch 2: two extra 3s -> cumS [1,2,5], n=5:
      // gaps |1*3-1*5|=2, |2*3-2*5|=4, |5*3-3*5|=0 -> D = 4/15
      source.addData(("a", 3.0), ("a", 3.0), ("b", 1.0))
      query.processAllAvailable()
      val r2 = latest()
      assert(r2("a").nStream == 5L && r2("a").dNum == 4L &&
        math.abs(r2("a").d - 4.0 / 15.0) < 1e-15, r2.toString)
      assert(r2("b").dNum == 0L, r2.toString) // b matches its reference
      // batch 3: a value ABOVE the grid moves n but no grid CDF:
      // cumS [1,2,5], n=6 -> gaps |3-6|=3, |6-12|=6, |15-18|=3 -> 6/18
      source.addData(("a", 10.0))
      query.processAllAvailable()
      val r3 = latest()
      assert(r3("a").nStream == 6L && r3("a").dNum == 6L &&
        math.abs(r3("a").d - 1.0 / 3.0) < 1e-15, r3.toString)
    } finally query.stop()
    intercept[IllegalArgumentException] {
      StreamingDrift.drift(source.toDS(), Map.empty)
    }
    intercept[IllegalArgumentException] {
      StreamingDrift.buildReference(Map("a" -> Seq(1.0)), scale = 0L)
    }
  }

  test("streaming bloom gate: cross-batch no-false-novel, in-batch min-id dedup, bounded state") {
    import spark.implicits._
    import graft.streaming.StreamingBloom
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    // 2^16 bits / 5 hashes: collision-free in practice for a handful of
    // keys, and deterministic either way (murmur positions are fixed)
    val out = StreamingBloom.firstSeenFlags(source.toDS(), shards = 4,
      bits = 1 << 16, numHashes = 5)
    val query = out.writeStream.format("memory").queryName("bloom_out")
      .outputMode("append").start()
    try {
      def rows() = spark.table("bloom_out").as[StreamingBloom.Novelty].collect()
      // batch 1: a twice (ids 2, 5) + b once — the MIN id carries a's
      // novel flag (within-batch dedup is order-free by id, not arrival)
      source.addData((5L, "a"), (2L, "a"), (10L, "b"))
      query.processAllAvailable()
      val r1 = rows().map(n => n.id -> n.novel).toMap
      assert(r1 == Map(2L -> true, 5L -> false, 10L -> true), r1.toString)
      // batch 2: a again (prior batch: NEVER novel again — the
      // no-false-negative side of the filter), c genuinely new
      source.addData((20L, "a"), (21L, "c"))
      query.processAllAvailable()
      val r2 = rows().filter(_.id >= 20L).map(n => n.key -> n.novel).toMap
      assert(r2 == Map("a" -> false, "c" -> true), r2.toString)
      // batch 3: all three old keys stay non-novel
      source.addData((30L, "a"), (31L, "b"), (32L, "c"))
      query.processAllAvailable()
      assert(rows().filter(_.id >= 30L).forall(!_.novel))
    } finally query.stop()
    intercept[IllegalArgumentException] {
      StreamingBloom.firstSeenFlags(source.toDS(), bits = 100) // not a power of 2
    }
    intercept[IllegalArgumentException] {
      StreamingBloom.firstSeenFlags(source.toDS(), shards = 0)
    }
  }

  test("E13: heap top-k folds across micro-batches — state holds serialized heaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.TopKAggregate.register(spark)
    val src = MemoryStream[(String, Double, Long)]
    val agg = src.toDS().toDF("g", "s", "id")
      .groupBy("g")
      .agg(graft.functions.TopKAggregate.topK(col("s"), col("id"), lit(2)).as("top"))
    val q = agg.writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    try {
      src.addData(("a", 1.0, 1L), ("a", 5.0, 2L), ("b", 3.0, 3L))
      q.processAllAvailable()
      // the state-store roundtrip is the point: batch 2's 4.0 must evict
      // batch 1's 1.0 from a heap DESERIALIZED out of the store
      src.addData(("a", 4.0, 4L), ("b", 9.0, 5L))
      q.processAllAvailable()
      val got = spark.table("topk_stream")
        .select(col("g"), explode(col("top")).as("e"))
        .select(col("g"), col("e.score"), col("e.id"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == Set(("a", 5.0, 2L), ("a", 4.0, 4L), ("b", 9.0, 5L), ("b", 3.0, 3L)))
    } finally q.stop()
  }

  test("streaming budget admission: crossing row kept, closes across batches, batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Long)]
    val out = graft.streaming.StreamingBudget.admitToBudget(
      src.toDS(), Map("a" -> 25L, "b" -> 1000L))
    val q = out.writeStream.format("memory").queryName("budget_out")
      .outputMode("append").start()
    try {
      // batch 1: a spends 10+10=20 < 25 after the second row, both admit;
      // in-batch order is ascending id regardless of addData order
      src.addData((2L, "a", 10L), (1L, "a", 10L), (3L, "b", 5L), (9L, "c", 1L))
      q.processAllAvailable()
      // batch 2: a at spent=20 < 25 admits id 4 (CROSSING row, spent→32),
      // then id 5 must drop; b stays open
      src.addData((4L, "a", 12L), (5L, "a", 1L), (6L, "b", 5L))
      q.processAllAvailable()
      // batch 3: a is closed forever
      src.addData((7L, "a", 1L))
      q.processAllAvailable()
      val got = spark.table("budget_out")
        .as[graft.streaming.StreamingBudget.Admitted].collect().map(_.id).toSet
      assert(got == Set(1L, 2L, 3L, 4L, 6L),
        s"crossing row kept, later arrivals and unbudgeted groups drop: $got")
    } finally q.stop()

    // lambda parity: fed in scrambled-hash id order (one batch per row),
    // the live gate reproduces batch takeToBudget's kept set EXACTLY
    val rows = (1L to 30L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L + i % 7))
    val df = rows.toDF("id", "grp", "w")
    val budgets = Map("a" -> 60L, "b" -> 45L)
    val batchKept = graft.operators.Sampling
      .takeToBudget(df, "grp", "w", "id", budgets, salt = "sb")
      .select("id").as[Long].collect().toSet
    val hashOrder = df
      .withColumn("h", graft.operators.Sampling.scrambledHash(col("id"), "sb"))
      .orderBy("h", "id").as[(Long, String, Long, Long)].collect()
    val src2 = MemoryStream[(Long, String, Long)]
    val out2 = graft.streaming.StreamingBudget.admitToBudget(src2.toDS(), budgets)
    val q2 = out2.writeStream.format("memory").queryName("budget_parity")
      .outputMode("append").start()
    try {
      hashOrder.foreach { case (id, g, w, _) =>
        src2.addData((id, g, w)); q2.processAllAvailable()
      }
      val streamKept = spark.table("budget_parity")
        .as[graft.streaming.StreamingBudget.Admitted].collect().map(_.id).toSet
      assert(streamKept == batchKept,
        "live gate in hash order must equal the batch mixer's kept set")
    } finally q2.stop()

    intercept[IllegalArgumentException](
      graft.streaming.StreamingBudget.admitToBudget(src.toDS(), Map.empty))
    intercept[IllegalArgumentException](
      graft.streaming.StreamingBudget.admitToBudget(src.toDS(), Map("a" -> -1L)))
  }

  test("E20: streaming k-anonymity gate holds sub-k cells, releases on crossing") {
    import spark.implicits._
    import graft.streaming.StreamingKAnonymity
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val q = StreamingKAnonymity.gate(src.toDS(), k = 3)
      .writeStream.format("memory").queryName("kanon")
      .outputMode("append").start()
    try {
      // batch 0: B reaches k in-batch and flows; A (2 rows) is HELD
      src.addData(("A", 1L), ("A", 2L), ("B", 10L), ("B", 11L), ("B", 12L))
      q.processAllAvailable()
      def released() = spark.table("kanon")
        .as[StreamingKAnonymity.Released].collect().map(r => (r.cell, r.id)).toSet
      assert(released() == Set(("B", 10L), ("B", 11L), ("B", 12L)))

      // batch 1: A crosses k -> its buffer flushes WITH the crossing row;
      // B is past k so new rows pass straight through; C starts held
      src.addData(("A", 3L), ("B", 13L), ("C", 20L))
      q.processAllAvailable()
      assert(released() == Set(("B", 10L), ("B", 11L), ("B", 12L), ("B", 13L),
        ("A", 1L), ("A", 2L), ("A", 3L)))

      // stream-end parity with the q108 batch rule: released == rows of
      // cells whose TOTAL count reached k; suppressed == the rest
      val arrived = Seq(("A", 1L), ("A", 2L), ("B", 10L), ("B", 11L),
        ("B", 12L), ("A", 3L), ("B", 13L), ("C", 20L))
      val safe = arrived.groupBy(_._1).filter(_._2.size >= 3).keySet
      assert(released() == arrived.filter(r => safe(r._1)).toSet)
      intercept[IllegalArgumentException](
        StreamingKAnonymity.gate(src.toDS(), 0))
    } finally q.stop()
  }

  test("E22: streaming JS drift gate — in-distribution passes, drifted batch quarantines") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    import graft.streaming.StreamingJsDrift
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq("the quick brown fox", "the lazy dog sleeps",
      "quick dog runs the fox", "brown fox sleeps").toDF("text")
    val refCounts = TextAnalysis.tokenCounts(refDocs, "text")
    // self-calibrating threshold: compute the gate's own js for an
    // in-distribution and a drifted batch, place the bar between them —
    // the streamed verdicts below then hold by construction
    def jsOf(docs: Seq[String]): Double = {
      val bc = TextAnalysis.tokenCounts(docs.toDF("text"), "text")
        .select(col("token"), col("n").cast("long").as("n_p"))
      val j = bc.join(refCounts.select(col("token"), col("n").cast("long").as("n_q")),
          Seq("token"), "full_outer")
        .select(col("token"), coalesce(col("n_p"), lit(0L)).as("n_p"),
          coalesce(col("n_q"), lit(0L)).as("n_q"))
      TextAnalysis.jsFromCounts(j).agg(sum("js_term")).head().getDouble(0)
    }
    val inDist = Seq("the quick fox", "the lazy dog")
    val drifted = Seq("zzz yyy xxx www vvv", "qqq ppp ooo nnn")
    val (jsIn, jsOut) = (jsOf(inDist), jsOf(drifted))
    assert(jsIn < jsOut && jsOut <= math.log(2.0) + 1e-9,
      s"calibration: $jsIn vs $jsOut (bound ${math.log(2.0)})")
    val gate = new StreamingJsDrift(refCounts, threshold = (jsIn + jsOut) / 2)

    val perBatch = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val src = MemoryStream[(Long, String)]
    val q = src.toDF().toDF("id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val out = gate.gate(b, "text", id)
        perBatch += id -> out.select("id").as[Long].collect().sorted.toSeq
        ()
      }.start()
    try {
      src.addData((1L, inDist(0)), (2L, inDist(1)))
      q.processAllAvailable()
      assert(perBatch.last._2 == Seq(1L, 2L), "in-distribution batch must export")

      src.addData((3L, drifted(0)), (4L, drifted(1)))
      q.processAllAvailable()
      assert(perBatch.last._2.isEmpty, "drifted batch must quarantine whole")

      src.addData((5L, "quick brown dog"))
      q.processAllAvailable()
      assert(perBatch.last._2 == Seq(5L), "recovery batch must export again")

      val vs = gate.verdicts
      assert(vs.map(_.pass) == Seq(true, false, true), vs.toString)
      // batch parity: the stream's js values are exactly the gate
      // arithmetic recomputed in batch mode (same plan, same data)
      assert(math.abs(vs(0).js - jsIn) < 1e-9, s"${vs(0)} vs $jsIn")
      assert(math.abs(vs(1).js - jsOut) < 1e-9, s"${vs(1)} vs $jsOut")
      assert(vs.forall(_.js <= math.log(2.0) + 1e-9), "JS is bounded by ln 2")
      // exported union == rows of passing batches exactly
      assert(perBatch.flatMap(_._2).toSeq == Seq(1L, 2L, 5L))
    } finally q.stop()
    // a token-less batch is a no-op tick: js 0, pass
    val empty = gate.gate(Seq.empty[(Long, String)].toDF("id", "text"), "text", 99L)
    assert(empty.count() == 0)
    assert(gate.verdicts.last.js == 0.0 && gate.verdicts.last.pass)
    intercept[IllegalArgumentException](new StreamingJsDrift(refCounts, 0.0))
  }
}
