package graft

import org.apache.spark.sql.SparkSession

import graft.api._

/** Cluster-mode smoke (SURVEY §4): everything else in this repo is proven
  * on `local[*]`, where closures never serialize across JVMs, broadcasts
  * never cross a process boundary, and the driver IS the executor. This
  * main runs a representative query slice + one Stage pipeline under
  * `spark-submit --master local-cluster[2,4,2048]` — two REAL executor
  * JVMs with dynamic allocation on — and asserts the properties that
  * could differ off local mode:
  *
  *  - every query in the slice executes and returns rows (closure/Kryo
  *    serialization, broadcast distribution, shuffle IO all cross
  *    process boundaries);
  *  - the native as-of exec produces the SAME row count as the
  *    union+window formulation (semantics, not just liveness);
  *  - the Stage pipeline completes with exact output and its monitor
  *    gauges report from a NON-driver executor id (TaskMetrics flow back
  *    over the wire);
  *  - more than one executor actually registered (the cluster is real).
  *
  * Driven by scripts/cluster_smoke.sh; prints one `SMOKE_OK` JSON line
  * with per-query seconds for the SURVEY §4 record.
  */
object ClusterSmoke {

  private final class AddOneStage extends Stage[Long, Long] {
    override def batchSize: Int = 64
    override def process(b: Seq[Long]): Seq[Long] = b.map(_ + 1)
  }

  /** Real executor-PROCESS death (the reference's segfault test,
    * test_segfaulting_pipeline.py, with an actual process kill rather
    * than ChaosProbe's in-JVM task death): partition 0's first attempt
    * halts its executor JVM — `Runtime.halt` skips shutdown hooks, the
    * closest JVM analogue of a segfault. The driver sees the RPC drop,
    * the standalone master relaunches the executor, lost shuffle map
    * outputs are regenerated, and the scheduler retries the lost tasks
    * (ExecutorLostFailure counts against spark.task.maxFailures,
    * default 4 off local mode). Survives ONLY off local mode — in
    * local[*] this would kill the driver, which is exactly why the
    * chaos story needs this cluster leg.
    */
  private final class ExecutorKillerStage(appId: String) extends Stage[Long, Long] {
    override def batchSize: Int = 64
    override def setup(ctx: WorkerContext): Unit = {
      // "die once" must survive the death itself: the replacement executor
      // has fresh statics, and a stage RE-submission resets task
      // attemptNumber to 0 (killing again every attempt until the stage
      // aborts — observed). An atomic host-level file creation is the
      // latch that survives both; on a real cluster this would live on
      // the shared FS.
      val flag = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-smoke-kill-$appId")
      if (ctx.partitionId == 0 && flag.createNewFile())
        Runtime.getRuntime.halt(42)
    }
    override def process(b: Seq[Long]): Seq[Long] = b.map(_ + 1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      require(!spark.sparkContext.isLocal,
        "ClusterSmoke must run OFF local mode (use scripts/cluster_smoke.sh)")

      // the monitor attaches FIRST so its gauges observe every task of
      // the run — "which executors ever ran work" is the cluster-reality
      // signal that survives dynamic allocation scaling idle executors
      // back down mid-run (an instantaneous executor count does not)
      val mon = new PipelineMonitor(spark)

      // a slice spanning the operator families: agg, multi-join, native
      // as-of/band/interval (custom execs), salted join, MinHash LSH
      // dedup, TF-IDF, IVF ANN, gap-fill grid, k-core iteration with
      // localCheckpoints
      val slice = Seq(
        "q01_pricing_summary", "q05_local_supplier", "q95_asof_native",
        "q126_band_native", "q97_interval_overlap", "q46_salted_join",
        "d03_minhash_lsh", "t16_tfidf", "s04_ivf_knn", "q36_gapfill",
        "q49_kcore")
      val timings = slice.map { name =>
        val fn = SparkEntry.queries.getOrElse(name,
          throw new IllegalStateException(s"unknown query $name"))
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        require(n > 0, s"$name returned 0 rows off local mode")
        name -> dt
      }

      // semantics cross-check: the custom Catalyst exec and the pure
      // DataFrame formulation must agree row-for-row count off local mode
      val native = SparkEntry.queries("q95_asof_native")(spark, sfDir).count()
      val window = SparkEntry.queries("q12_asof_join")(spark, sfDir).count()
      require(native == window,
        s"as-of semantics diverge off local mode: native=$native window=$window")
      // same discipline for the band exec: the ring-buffer merge (real
      // serialization boundaries, real exchanges) must agree with the
      // raw inequality join row-for-row count
      locally {
        import org.apache.spark.sql.functions.{col, unix_millis}
        val ev = graft.sources.Tables.events(spark, sfDir)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            unix_millis(col("ts")).as("p_ms"))
        val e = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
            unix_millis(col("ts")).as("e_ms"))
        val band = graft.plans.GraftBandJoin.bandJoinMerge(p, e,
          Seq("p_user"), Seq("e_user"), "p_ms", "e_ms",
          -3600000L, 3600000L, broadcast = Some(false)).count()
        val raw = p.join(e, col("p_user") === col("e_user") &&
          col("e_ms") >= col("p_ms") - 3600000L &&
          col("e_ms") <= col("p_ms") + 3600000L).count()
        require(band == raw,
          s"band-join semantics diverge off local mode: native=$band raw=$raw")
      }

      // sharded HNSW (S13): the one operator whose CORRECTNESS depends on
      // a partitioning guarantee local[*] can mask — hnswSearch rebuilds
      // each shard's graph inside mapPartitions and requires
      // repartition(col("shard")) to co-locate whole shards (a split
      // shard = dangling neighbors = loud failure; a silently-wrong
      // partitioner would tank recall instead). Assert recall vs exact
      // brute force ON THIS cluster, real exchanges included.
      locally {
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val queries = emb.orderBy("vec_id").limit(20)
        def top(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
          df.select("query_id", "neighbor_id").collect()
            .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
        val exact = top(graft.operators.Similarity.knnBruteForce(
          emb, queries, "vec_id", "embedding", 10))
        val hnsw = top(graft.operators.GraphAnn.hnswKnn(
          emb, queries, "vec_id", "embedding", k = 10, shards = 4))
        val recall = exact.keys.toSeq.map(q =>
          hnsw.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / 10).sum / exact.size
        require(recall >= 0.9,
          s"HNSW recall@10 off local mode = $recall (< 0.9): shard co-location broken")
      }

      // native interval-overlap exec (Q114): like the as-of/band checks,
      // the merge must agree with the raw inequality join row-for-row
      // count under real serialization boundaries
      locally {
        import org.apache.spark.sql.functions.{col, unix_millis, min => smin, max => smax}
        val ev = graft.sources.Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_millis(col("ts")).as("tms"))
        def sessions(tpe: String, p: String) =
          graft.operators.Relational.sessionize(
              ev.filter(col("event_type") === tpe), "user_id", col("tms"),
              col("event_id"), gapMillis = 86400000L)
            .groupBy(col("user_id"), col("session_id"))
            .agg(smin("tms").as(s"${p}_s"), smax("tms").as(s"${p}_e"))
            .select(col("user_id").as(s"${p}_user"), col("session_id").as(s"${p}_sid"),
              col(s"${p}_s"), col(s"${p}_e"))
        val a = sessions("click", "a")
        val b = sessions("view", "b")
        val native = graft.plans.GraftIntervalJoin.intervalJoinMerge(a, b,
          Seq("a_user"), Seq("b_user"), "a_s", "a_e", "b_s", "b_e",
          broadcast = Some(false)).count()
        val raw = a.join(b, col("a_user") === col("b_user") &&
          col("a_s") <= col("b_e") && col("b_s") <= col("a_e")).count()
        require(native == raw,
          s"interval-join semantics diverge off local mode: native=$native raw=$raw")
      }

      // Stage pipeline across executor JVMs, with monitor + gauges
      import spark.implicits._
      val out = Pipeline
        .from(spark.createDataset(1L to 10000L).repartition(8), monitor = Some(mon))
        .stage(new AddOneStage)
        .run().collect().sorted
      require(out.toSeq == (2L to 10001L), "pipeline output wrong off local mode")
      org.apache.spark.sql.graftbridge.Bridge.waitForListeners(spark.sparkContext)
      val gaugeIds = mon.resourceSnapshot.keySet
      // >=2 DISTINCT executor ids ran tasks at some point during the run
      // — the cluster was real even if dynamic allocation has since
      // reclaimed an idle executor (observed: a 60 s idle timeout can
      // shrink to 1 before any instantaneous count)
      val execIds = gaugeIds.filter(_ != "driver")
      require(execIds.size >= 2,
        s"expected tasks on >=2 executors over the run; gauges saw: ${gaugeIds.mkString(", ")}")
      val execsNow = spark.sparkContext.statusTracker.getExecutorInfos.length - 1

      // executor-process death recovery: kill one executor JVM mid-stage,
      // assert the job still completes with exact output (see
      // ExecutorKillerStage doc for the recovery chain)
      val tDeath = System.nanoTime()
      val deathOut = Pipeline
        .from(spark.createDataset(1L to 4000L).repartition(4))
        .stage(new ExecutorKillerStage(spark.sparkContext.applicationId))
        .run().collect().sorted
      require(deathOut.toSeq == (2L to 4001L),
        s"output wrong after executor-process death: ${deathOut.length} rows")
      val deathSecs = (System.nanoTime() - tDeath) / 1e9

      // streaming-route executor death (reference parity:
      // test_actor_pool_death_recovery.py on the continuous path): a
      // WATERMARKED stateful window aggregation keeps state on executors;
      // an executor JVM halts mid-micro-batch, the master relaunches it,
      // the micro-batch's lost tasks retry, and the state store recovers
      // from its checkpoint+delta files — the closed windows must come
      // out EXACT, not just "the query survived".
      val tStream = System.nanoTime()
      val streamSecs = {
        import org.apache.spark.sql.functions._
        val sdir = java.nio.file.Files.createTempDirectory("graft-smoke-stream")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-smoke-ckpt")
        val appId = spark.sparkContext.applicationId
        // batch 1: 40 users x 50 events across two 1-minute windows
        val b1 = (0 until 2000).map { i =>
          val u = i % 40
          s"""{"user":"u$u","ts":"2026-01-01T00:0${(i % 2)}:${10 + i % 40}.000Z","v":${i % 7}}"""
        }
        java.nio.file.Files.write(sdir.resolve("b1.json"),
          String.join("\n", b1: _*).getBytes("UTF-8"))
        val killOnce = udf { (u: String) =>
          val flag = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-smoke-streamkill-$appId")
          if (u == "u7" && flag.createNewFile()) Runtime.getRuntime.halt(42)
          u
        }
        val schema = "user STRING, ts TIMESTAMP, v LONG"
        val in = spark.readStream.schema(schema).json(sdir.toString)
        val agg = in.select(killOnce(col("user")).as("user"), col("ts"), col("v"))
          .withWatermark("ts", "0 seconds")
          .groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 minute"),
            col("user"))
          .agg(sum("v").as("sv"), count("*").as("n"))
        val q = agg.writeStream.outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .format("memory").queryName("smoke_stream").start()
        q.processAllAvailable() // batch 1 — the executor dies in here
        // batch 2: one late sentinel advances the watermark past both
        // windows, closing them into the append sink
        java.nio.file.Files.write(sdir.resolve("b2.json"),
          """{"user":"sentinel","ts":"2026-01-01T01:00:00.000Z","v":0}""".getBytes("UTF-8"))
        q.processAllAvailable()
        q.processAllAvailable() // one more cycle: append emits on the NEXT batch after the watermark moves
        val got = spark.table("smoke_stream")
          .select(col("user"), col("window.start").cast("string").as("w"),
            col("sv"), col("n"))
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        q.stop()
        val want = (0 until 2000).groupBy(i =>
            (s"u${i % 40}", s"2026-01-01 00:0${i % 2}:00"))
          .map { case (k, is) => k -> (is.map(_ % 7).sum.toLong, is.size.toLong) }
        require(got == want,
          s"streaming state wrong after executor death: got ${got.size} rows, " +
            s"want ${want.size}; diff=${(got.toSet -- want.toSet).take(3)}")
        require(new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft-smoke-streamkill-$appId").exists, "the streaming kill never fired")
        (System.nanoTime() - tStream) / 1e9
      }

      val qjson = timings.map { case (n, t) => f""""$n":$t%.2f""" }.mkString("{", ",", "}")
      println(s"""SMOKE_OK {"sf":"$sfDir","executors_seen":${execIds.size},""" +
        s""""executors_now":$execsNow,""" +
        f""""executor_death_recovery_sec":$deathSecs%.1f,""" +
        f""""streaming_death_recovery_sec":$streamSecs%.1f,""" +
        s""""queries":$qjson}""")
    } finally spark.stop()
  }
}
