package graft.api

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.{AccumulatorV2, LongAccumulator}

/** Per-worker rollup for one stage (reference monitoring.py's per-actor
  * stats): a worker is a task/partition, `wallNanos` its full task time,
  * `processNanos` the time inside `Stage.process` — their ratio is the
  * worker's utilization (the reference's busy-fraction per actor).
  */
final case class WorkerStat(
    rowsIn: Long,
    rowsOut: Long,
    batches: Long,
    failures: Long,
    processNanos: Long,
    wallNanos: Long) {
  def +(o: WorkerStat): WorkerStat = WorkerStat(
    rowsIn + o.rowsIn, rowsOut + o.rowsOut, batches + o.batches,
    failures + o.failures, processNanos + o.processNanos, wallNanos + o.wallNanos)
  def utilization: Double =
    if (wallNanos <= 0) 0.0 else processNanos.toDouble / wallNanos
}

/** Accumulates per-worker stats keyed by workerId; merged across tasks on
  * the driver. One `add` per task (at completion), so accumulator traffic
  * is O(workers), not O(rows).
  */
final class WorkerStatsAccumulator
    extends AccumulatorV2[(String, WorkerStat), Map[String, WorkerStat]] {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, WorkerStat]()
  override def isZero: Boolean = m.isEmpty
  override def copy(): WorkerStatsAccumulator = {
    val c = new WorkerStatsAccumulator
    c.m.putAll(m)
    c
  }
  override def reset(): Unit = m.clear()
  override def add(v: (String, WorkerStat)): Unit = m.merge(v._1, v._2, _ + _)
  override def merge(
      other: AccumulatorV2[(String, WorkerStat), Map[String, WorkerStat]]): Unit =
    other.value.foreach { case (k, v) => m.merge(k, v, _ + _) }
  override def value: Map[String, WorkerStat] = m.asScala.toMap
}

/** Per-executor resource rollup (reference: ray_utils/resource_monitor.py
  * — per-node CPU/memory sampled into the monitoring output). Spark-native
  * sourcing: every finished task reports its TaskMetrics to the driver's
  * listener bus, so the rollup needs no executor-side sampler process —
  * `cpuNanos`/`runMillis`/`gcMillis` sum across the executor's tasks and
  * `peakMemoryBytes` is the max single-task peak execution memory
  * (Spark's memory-consumer high-water mark: shuffles, sorts, aggs).
  */
final case class ExecutorGauge(
    tasks: Long,
    cpuNanos: Long,
    runMillis: Long,
    gcMillis: Long,
    peakMemoryBytes: Long) {
  def +(o: ExecutorGauge): ExecutorGauge = ExecutorGauge(
    tasks + o.tasks, cpuNanos + o.cpuNanos, runMillis + o.runMillis,
    gcMillis + o.gcMillis, math.max(peakMemoryBytes, o.peakMemoryBytes))
}

/** Per-stage stats for a compiled pipeline stage. Holds only accumulators
  * (serializable), so it can be captured by the stage's task closure
  * without dragging the session along.
  */
final class StageStats private[api] (
    val rowsIn: LongAccumulator,
    val rowsOut: LongAccumulator,
    val batches: LongAccumulator,
    val failures: LongAccumulator,
    val processNanos: LongAccumulator,
    val workers: WorkerStatsAccumulator) extends Serializable

/** Per-stage pipeline statistics (reference: pipelines/private/monitoring.py —
  * per-stage rows in/out, batch counts, processing time, per-worker
  * utilization). Spark-native: driver-registered accumulators that
  * executors update in-flight, so stats are live while the job runs; the
  * per-worker rollup arrives once per task at completion.
  *
  * Accuracy contract: the live counters update inside TRANSFORMATIONS
  * (the compiled `mapPartitions`), so Spark guarantees at-least-once, not
  * exactly-once — a retried or speculatively re-executed task counts its
  * rows again. That is the right trade for monitoring (live visibility,
  * zero extra actions); treat the numbers as progress telemetry, not an
  * audit total. Under a healthy run (no task retries) they are exact.
  *
  * Queue depths have no analogue by design: Spark tasks PULL — there are
  * no inter-stage queues to measure (see the F12 mapping in Pipeline).
  */
final class PipelineMonitor(spark: SparkSession,
    jobInfo: Option[JobInfo] = None) {

  private val stages = TrieMap.empty[String, StageStats]

  // the pipeline identity this monitor's rollups are tagged with
  // (reference: JobInfo, specs.py:500 — metrics-tagging record); settable
  // after construction because PipelineConfig carries it and Pipeline.from
  // runs later than monitor construction
  @volatile private var jobInfoOpt: Option[JobInfo] = jobInfo

  /** Attach/replace the job identity (called by [[Pipeline.from]] when
    * `PipelineConfig.jobInfo` is set; latest pipeline wins, matching a
    * monitor reused across sequential runs).
    */
  def adoptJobInfo(ji: JobInfo): Unit = jobInfoOpt = Some(ji)

  /** Metric tags from the attached [[JobInfo]] — empty when none. Join
    * these onto [[snapshot]]/[[resourceSnapshot]] rows when exporting to
    * a metrics backend; [[render]] prefixes them for the console.
    */
  def tags: Map[String, String] = jobInfoOpt match {
    case Some(ji) => Map(
      "pipeline_type" -> ji.pipelineType,
      "pipeline_version" -> ji.pipelineVersion,
      "pipeline_mode" -> ji.pipelineMode)
    case None => Map.empty
  }

  // Executor resource gauges (resource_monitor.py parity): a driver-side
  // listener rolls each finished task's TaskMetrics into a per-executor
  // gauge. Registered at construction so gauges cover the whole monitored
  // run; call [[detach]] when discarding the monitor (listeners outlive
  // the object otherwise). The bus posts asynchronously — a snapshot
  // taken the instant a job returns may trail by a few tasks.
  private val gauges = TrieMap.empty[String, ExecutorGauge]
  private val resourceListener = new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null && e.taskInfo != null) {
        val g = ExecutorGauge(1L, m.executorCpuTime, m.executorRunTime,
          m.jvmGCTime, m.peakExecutionMemory)
        // lock-free merge loop (listener thread is single, but replace-
        // under-contention is the honest TrieMap idiom)
        var done = false
        while (!done) {
          gauges.get(e.taskInfo.executorId) match {
            case None => done = gauges.putIfAbsent(e.taskInfo.executorId, g).isEmpty
            case Some(prev) => done = gauges.replace(e.taskInfo.executorId, prev, prev + g)
          }
        }
      }
    }
  }
  spark.sparkContext.addSparkListener(resourceListener)

  /** Per-executor resource gauges accumulated so far ("driver" is the
    * one executor id under local mode).
    */
  def resourceSnapshot: Map[String, ExecutorGauge] = gauges.toMap

  /** Unregister the resource listener (end-of-pipeline teardown). */
  def detach(): Unit = spark.sparkContext.removeSparkListener(resourceListener)

  private[api] def forStage(name: String): StageStats =
    stages.getOrElseUpdate(name, {
      val sc = spark.sparkContext
      val w = new WorkerStatsAccumulator
      sc.register(w, s"$name.workers")
      new StageStats(
        sc.longAccumulator(s"$name.rowsIn"),
        sc.longAccumulator(s"$name.rowsOut"),
        sc.longAccumulator(s"$name.batches"),
        sc.longAccumulator(s"$name.failures"),
        sc.longAccumulator(s"$name.processNanos"),
        w)
    })

  /** Snapshot: stage → (rowsIn, rowsOut, batches, failures, processMillis). */
  def snapshot: Map[String, (Long, Long, Long, Long, Long)] =
    stages.map { case (n, s) =>
      n -> (s.rowsIn.value.longValue, s.rowsOut.value.longValue,
        s.batches.value.longValue, s.failures.value.longValue,
        s.processNanos.value.longValue / 1000000L)
    }.toMap

  /** Per-worker breakdown: stage → workerId → [[WorkerStat]]. */
  def workerSnapshot: Map[String, Map[String, WorkerStat]] =
    stages.map { case (n, s) => n -> s.workers.value }.toMap

  /** Mean busy-fraction of a stage's workers (process time / task wall
    * time), the reference's per-stage utilization signal: a stage far
    * below 1.0 is IO/scheduling-bound, not compute-bound.
    */
  def utilization(stage: String): Double = {
    val ws = stages.get(stage).map(_.workers.value).getOrElse(Map.empty)
    if (ws.isEmpty) 0.0
    else ws.valuesIterator.map(_.utilization).sum / ws.size
  }

  /** One computed row per stage: (name, in, out, batches, failures, ms,
    * workers, utilization, rate) — the single source both console
    * renderers format from.
    */
  private def stageRows: Seq[(String, Long, Long, Long, Long, Long, Int, Double, Double)] =
    snapshot.toSeq.sortBy(_._1).map { case (n, (in, out, b, f, ms)) =>
      val nw = stages(n).workers.value.size
      val rate = if (ms > 0) out * 1000.0 / ms else 0.0
      (n, in, out, b, f, ms, nw, utilization(n), rate)
    }

  def report: String =
    stageRows.map { case (n, in, out, b, f, ms, nw, util, rate) =>
      f"$n%-32s in=$in%-8d out=$out%-8d batches=$b%-6d failures=$f%-4d " +
        f"${ms}ms workers=$nw util=$util%.2f rate=$rate%.0f rows/s"
    }.mkString("\n")

  /** Console table render at a verbosity level (reference:
    * monitoring.py's `display()` + utils/verbosity.py levels).
    *  - None: empty.
    *  - Info: one aligned row per stage (the reference's INFO pipeline
    *    stats table).
    *  - Debug: Info plus a per-WORKER sub-table per stage (rows/s,
    *    busy-fraction utilization per worker — the per-actor view).
    */
  def render(verbosity: Verbosity): String = verbosity match {
    case Verbosity.None => ""
    case Verbosity.Info => (renderJobLine :+ renderStageTable).mkString("\n")
    case Verbosity.Debug =>
      val workers = workerSnapshot.toSeq.sortBy(_._1).map { case (stage, ws) =>
        val rows = ws.toSeq.sortBy(_._1).map { case (wid, s) =>
          f"    $wid%-12s in=${s.rowsIn}%-8d out=${s.rowsOut}%-8d " +
            f"batches=${s.batches}%-6d failures=${s.failures}%-4d util=${s.utilization}%.2f"
        }
        s"  $stage workers:\n${rows.mkString("\n")}"
      }
      ((renderJobLine :+ renderStageTable) ++ workers ++ renderGauges).mkString("\n")
  }

  // the JobInfo tag line every rendered rollup leads with (when attached)
  private def renderJobLine: Seq[String] = jobInfoOpt.toSeq.map(ji =>
    s"job: type=${ji.pipelineType} version=${ji.pipelineVersion} mode=${ji.pipelineMode}")

  private def renderGauges: Seq[String] = {
    val gs = resourceSnapshot
    if (gs.isEmpty) Seq.empty
    else "  executor gauges:" +: gs.toSeq.sortBy(_._1).map { case (id, g) =>
      f"    $id%-12s tasks=${g.tasks}%-6d cpu_ms=${g.cpuNanos / 1000000L}%-8d " +
        f"run_ms=${g.runMillis}%-8d gc_ms=${g.gcMillis}%-6d " +
        f"peak_mem=${g.peakMemoryBytes}%d"
    }
  }

  private def renderStageTable: String = {
    val header = f"${"stage"}%-32s ${"in"}%-8s ${"out"}%-8s ${"batches"}%-8s " +
      f"${"failures"}%-9s ${"time_ms"}%-8s ${"workers"}%-8s ${"util"}%-5s rows/s"
    val rows = stageRows.map { case (n, in, out, b, f, ms, nw, util, rate) =>
      f"$n%-32s $in%-8d $out%-8d $b%-8d $f%-9d $ms%-8d $nw%-8d $util%-5.2f $rate%.0f"
    }
    (header +: rows).mkString("\n")
  }

  /** Rate-limited live reporting (reference: monitoring loop — stats are
    * rendered at most `freqHz` per second at the configured verbosity;
    * NONE renders nothing). Pull-style: call [[maybeReport]] from any
    * driver loop (e.g. between Batch-mode stages or a streaming
    * progress listener); or [[start]] a daemon thread that reports every
    * `1/freqHz` seconds until [[stop]].
    */
  def reporter(verbosity: Verbosity, freqHz: Double = 0.2,
      sink: String => Unit = println(_),
      clock: () => Double = Timing.systemClock): ConsoleReporter =
    new ConsoleReporter(this, verbosity, freqHz, sink, clock)
}

/** Verbosity for monitor rendering (reference: utils/verbosity.py
  * VerbosityLevel NONE/INFO/DEBUG).
  */
sealed trait Verbosity
object Verbosity {
  case object None extends Verbosity
  case object Info extends Verbosity
  case object Debug extends Verbosity
}

final class ConsoleReporter private[api] (
    monitor: PipelineMonitor,
    verbosity: Verbosity,
    freqHz: Double,
    sink: String => Unit,
    clock: () => Double) {
  require(freqHz > 0, s"reporter frequency must be positive, got $freqHz")
  private val limiter = new RateLimitedCaller(freqHz, clock)
  @volatile private var thread: Option[Thread] = None

  /** Render+emit if the rate budget allows and verbosity demands it;
    * returns whether a report was emitted.
    */
  def maybeReport(): Boolean =
    verbosity != Verbosity.None &&
      limiter.maybeDo(sink(monitor.render(verbosity))).isDefined

  /** Emit unconditionally (the final end-of-pipeline report). */
  def reportNow(): Unit =
    if (verbosity != Verbosity.None) sink(monitor.render(verbosity))

  /** Background daemon reporting every 1/freqHz seconds until [[stop]]. */
  def start(): Unit = synchronized {
    require(thread.isEmpty, "reporter already started")
    val t = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(math.max(1L, (1000.0 / freqHz).toLong))
        reportNow()
      } catch { case _: InterruptedException => () }
    }, "graft-monitor-reporter")
    t.setDaemon(true)
    t.start()
    thread = Some(t)
  }

  def stop(): Unit = synchronized {
    thread.foreach(_.interrupt())
    thread = None
  }
}
