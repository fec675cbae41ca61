package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query executed end-to-end (noop
  * sink, so projections/sorts are NOT pruned the way a bare count() would
  * allow), one JSON line on stdout.
  *
  * Each query runs `Runs` times and reports the MEDIAN — a single-shot
  * number on a shared local[32] JVM carries 2×+ noise from JIT/code-cache/
  * GC pressure (rounds 1 and 2 both produced phantom regressions), and a
  * 2× perf gate cannot be adjudicated on a harness noisier than the gate.
  */
object Bench {
  private val Runs = 3

  /** Local-iteration filter: SPARK_GRAFT_QUERIES=q68_bfs_hops,q47_…
    * restricts the run to named queries (shared contract in
    * [[SparkEntry.filtered]]). Unset (the driver's config) = full
    * registry, identical behavior to before.
    */
  private lazy val selected: Seq[QueryDef] =
    SparkEntry.filtered(sys.env.get("SPARK_GRAFT_QUERIES"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Janino's generated-class cache defaults to 100 entries; a
      // 147-query registry × several codegen units each evicts
      // constantly, so every timed run re-pays its plans' compilation
      // (~0.1-0.5 s flat tax per query — measured as a broad 1.5× drift
      // on sub-second queries as the registry grew). Size the cache to
      // the session, not to a single query.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Job/stage counters: every Spark JOB is a driver-side materialization
    // barrier (localCheckpoint, broadcast build, range-exchange sample,
    // AQE stage, final action) — the quantity that multiplies under
    // co-tenant contention (VERDICT r12: the 2×-gate breaches were all
    // barrier-heavy queries, not slow operators). Counting them per query
    // makes the next breach attributable: a query whose median inflates
    // while its job count is 2 is machine noise; one with 14 jobs is a
    // structure problem. Listener events are queued/asynchronous, so
    // counts are drained after a short quiesce — they are diagnostics,
    // not timing inputs.
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    val stageCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        stageCount.addAndGet(j.stageInfos.size.toLong)
      }
    })
    def runOnce(q: QueryDef): Option[(Double, Long, Long)] = {
      val t0 = System.nanoTime()
      try {
        val j0 = jobCount.get(); val s0 = stageCount.get()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // drain the async listener bus so this query's job events are
        // attributed to it, not to the next one (outside the timed span)
        org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
        Some((dt, jobCount.get() - j0, stageCount.get() - s0))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          None
      } finally {
        // Queries are independent jobs: release every block the query
        // pinned (localCheckpoint materializations persist their RDD and
        // stay resident until the JVM happens to GC the RDD handle —
        // across a 115-query × 4-pass session those dead blocks stack up
        // in storage memory and measurably slow every later shuffle; a
        // checkpoint-heavy trio measured 2.2 s → 24.5 s interference on
        // a neighboring query before this cleanup).
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    // Warmup pass 0 (untimed): a full execution of every query, so the
    // scheduler, codegen compiler, parquet readers and every generated
    // plan are JIT'd before anything is measured — otherwise the first
    // timed queries absorb the whole session's warmup.
    spark.range(1000).selectExpr("sum(id)").collect()
    selected.foreach(runOnce)
    // Timed passes are interleaved (whole registry, Runs times) rather
    // than back-to-back per query, so each query's samples are spread
    // across the session's JIT/GC lifecycle and the median is stable.
    val samples = (1 to Runs).flatMap { _ =>
      selected.map(q => q.name -> runOnce(q))
    }
    val results = selected.map { q =>
      val mine = samples.collect { case (n, t) if n == q.name => t }
      // a failed query must not read as a speedup: report it as -1
      val median =
        if (mine.exists(_.isEmpty)) -1.0
        else mine.flatten.map(_._1).sorted.apply(mine.size / 2)
      q.name -> median
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // Per-query spread + barrier profile (VERDICT r12 item 8): min/max
    // across the timed passes make the controlled-vs-driver gate
    // adjudication mechanical (a breach whose min is inside the gate is
    // contention, not a regression), and jobs/stages (max across passes —
    // AQE can vary them slightly) attribute it.
    val spread = selected.flatMap { q =>
      val mine = samples.collect { case (n, Some(t)) if n == q.name => t }
      if (mine.isEmpty) None
      else {
        val ts = mine.map(_._1)
        Some("\"" + q.name +
          f"""":{"min":${ts.min}%.3f,"max":${ts.max}%.3f,"jobs":${mine.map(_._2).max},"stages":${mine.map(_._3).max}}""")
      }
    }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spread,"failed":$failed,"runs":$Runs,"sf":"$sfDir"}"""
    // The driver captures only the tail of stdout (2000 chars in round 6),
    // which truncated the per-query map to 78/154 entries and left the 2×
    // gate unauditable query-by-query. Persist the SAME json whole so a
    // third party can audit every median. A FILTERED run must not clobber
    // the committed full-registry artifact: it only writes when
    // SPARK_GRAFT_BENCH_OUT names a destination explicitly.
    val filteredRun = sys.env.get("SPARK_GRAFT_QUERIES").isDefined
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(if (filteredRun) None else Some("BENCH_full.json"))
    outPath.foreach { path =>
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch {
        case e: Throwable => System.err.println(s"[bench] could not write $path: ${e.getMessage}")
      }
    }
    if (filteredRun && outPath.isEmpty)
      System.err.println("[bench] filtered run: BENCH_full.json NOT written " +
        "(set SPARK_GRAFT_BENCH_OUT to persist a partial artifact elsewhere)")
    // Stdout contract (round 10, VERDICT r9 item 8): the driver keeps only
    // the TAIL of stdout, and rounds 8/9 proved the single full-map line
    // gets truncated at the FRONT — BENCH_r{N}.json recorded
    // "parsed": null both rounds. So the LAST stdout line is a compact
    // summary that always fits the tail capture: totals plus only the
    // slowest queries (the ones the 2× gate could plausibly flag);
    // the complete per-query map lives in BENCH_full.json, written above.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(12)
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val compact = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$slowest,"failed":$failed,"runs":$Runs,"n_queries":${results.size},"detail":"BENCH_full.json","sf":"$sfDir"}"""
    // Persist the compact line too (scripts/bench.sh re-echoes it after
    // sbt exits, so tail-parsing survives ANY future sbt trailer).
    if (!filteredRun) {
      // NonFatal only: an OOM/interrupt here must propagate, and a plain
      // IO failure must say so — bench.sh's re-echo silently disappears
      // when this file is missing, which otherwise leaves the driver's
      // tail-parse failing with no clue.
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_last.json"),
        (compact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] could not persist BENCH_last.json: $e")
      }
    }
    // Stop Spark BEFORE the final println: shutdown logging must not land
    // after the line the driver tail-parses.
    spark.stop()
    println(compact)
  }
}
