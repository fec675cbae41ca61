package graft.api

import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.storage.StorageLevel

/** Spark-native re-expression of the reference pipeline surface
  * (cosmos_xenna/pipelines/private/specs.py): `Stage`, `StageSpec`,
  * `PipelineConfig`, `ExecutionMode` and the pipeline runner.
  *
  * Mapping (SURVEY.md §2a):
  *  - A Ray actor pool per stage → Spark tasks over partitions. A stage
  *    compiles to ONE `mapPartitions`: `setup()` runs once per partition
  *    (the worker analogue), `setupOnNode()` once per executor JVM,
  *    `destroy()` on task completion, and samples flow through
  *    `Iterator.grouped(batchSize)` (the slot-batching analogue).
  *  - STREAMING mode → Spark's pull-based pipelined execution: chained
  *    narrow `mapPartitions` never materialize between stages, and
  *    backpressure is structural (tasks pull; nothing queues unbounded),
  *    so `slots_per_actor` / `max_queued_multiplier` have no analogue to
  *    tune (specs.py:462).
  *  - BATCH mode → persist + count barrier between stages, the analogue
  *    of "materialize everything between stages" (specs.py:61).
  *  - SERVING mode → the same compiled chain over a Structured Streaming
  *    `Dataset` (see graft.streaming.ServingPipeline); the input queue is
  *    the stream source, the output queue the sink (specs.py:65).
  *  - Autoscaling (the reference's Rust bin-packing over actor pools) →
  *    Spark AQE + `spark.dynamicAllocation.*`; `numWorkers` /
  *    `overProvisionFactor` become explicit `repartition` hints
  *    (specs.py:306).
  *  - `worker_max_lifetime_m` / `worker_restart_interval_m` (periodic
  *    actor restart for leak hygiene, specs.py) → no analogue NEEDED:
  *    a Spark "worker" lives exactly one task — setup/destroy bracket
  *    every partition, so state never outlives a task; executor-JVM
  *    hygiene belongs to the cluster manager
  *    (`spark.executor.maxNumFailures`, pod restarts).
  *  - `max_setup_failure_percentage` (tolerate a fraction of workers
  *    failing setup, specs.py:445) → DOCUMENTED DIVERGENCE: Ray can run
  *    with fewer workers because work is redistributed; a Spark task owns
  *    its partition's DATA, so skipping a failed-setup task would silently
  *    drop rows. The Spark-native policy is retry (numSetupAttempts here,
  *    spark.task.maxFailures at task level) and fail the job if setup
  *    truly cannot succeed.
  *  - Per-stage runtime environments (`Stage.env_info` / `RuntimeEnv`,
  *    specs.py:174; ray_utils/runtime_envs.py) → DELIBERATE LIMITATION:
  *    a Ray actor can run each stage in its own conda env; Spark executors
  *    share one JVM classpath per application, so environment granularity
  *    is per-PIPELINE, not per-stage. The Spark-native mappings are
  *    (a) JVM stages: one classpath, isolate libraries at build time
  *    (shading) — no runtime switch exists to document around;
  *    (b) native/Python helpers launched by a stage (e.g. a decoder
  *    subprocess): ship the env as an archive via `downloadRequests` /
  *    `spark.archives` and exec against it inside `setup()`;
  *    (c) stages that truly need disjoint runtimes: run them as separate
  *    pipelines chained through a storage boundary (Batch mode's persist
  *    is exactly that barrier). This is the standard Spark deployment
  *    model, not a missing feature of this port.
  */
abstract class Stage[I, O] extends Serializable {

  /** Samples per `process` call (reference: `stage_batch_size`, specs.py:100). */
  def batchSize: Int = 1

  /** Advisory worker shape (reference: `required_resources`). On a real
    * cluster this informs executor sizing / dynamic-allocation profiles;
    * it never affects semantics.
    */
  def resources: Resources = Resources()

  /** Once per executor JVM, before the first partition of this stage runs
    * there (reference: `setup_on_node`, specs.py:258). The natural Spark
    * analogue of node-level state is a JVM singleton. Override either
    * arity; the context overload wins.
    */
  def setupOnNode(): Unit = ()
  def setupOnNode(ctx: WorkerContext): Unit = setupOnNode()

  /** Once per task/partition — the per-worker init hook (load a model,
    * open a client). Reference: `setup` (specs.py:264), which receives
    * WorkerMetadata; the Spark analogue is the task context.
    */
  def setup(): Unit = ()
  def setup(ctx: WorkerContext): Unit = setup()

  /** Declarative per-stage artifacts (reference: `download_requests`,
    * specs.py:186): every listed file is distributed to all executors via
    * [[Artifacts.distributeFile]] BEFORE this stage compiles, so `setup()`
    * and `process` can read it with [[Artifacts.localPath]] /
    * [[DownloadRequest.localPath]] without manual distribution calls —
    * the same "downloads have landed before setup" guarantee the
    * reference makes.
    */
  def downloadRequests: Seq[DownloadRequest] = Seq.empty

  /** Transform a batch. Returning an empty Seq drops the samples (the
    * reference's `None` return, specs.py:309): flatMap semantics make
    * filtering free.
    */
  def process(batch: Seq[I]): Seq[O]

  /** Per-worker teardown, called when the task completes (reference:
    * `destroy`, specs.py:271).
    */
  def destroy(): Unit = ()

  def name: String = getClass.getSimpleName.stripSuffix("$")
}

/** Resource shape (reference: resources.py:409). `cpus`/`gpus` are
  * advisory sizing hints (see [[GpuResources]] for the cluster mapping);
  * `isSpmd = true` CHANGES EXECUTION: the stage compiles to Spark's
  * barrier mode (`RDD.barrier()`) — the gang-scheduling analogue of the
  * reference's SPMD worker groups (resources.py:423, torchrun-style
  * distributed inference). All tasks of a barrier stage are scheduled
  * together or not at all, and each worker gets rank / world-size /
  * peer-address / allGather rendezvous via [[WorkerContext.spmd]].
  */
final case class Resources(cpus: Double = 1.0, gpus: Double = 0.0, isSpmd: Boolean = false)

/** Gang coordination surface for SPMD (barrier) stages — the Spark
  * analogue of the reference's WorkerMetadata.rank / world_size /
  * rendevous_params (resources.py:363, smoke_test_multi_node_spmd.py):
  * `rank` ∈ [0, worldSize); `peerAddresses(0)` is the conventional
  * rendezvous master (MASTER_ADDR analogue); `gather(msg)` is
  * `BarrierTaskContext.allGather` — every worker contributes a string and
  * receives all workers' strings in rank order (use it to exchange ports,
  * NCCL ids, shard manifests); `sync()` is a plain barrier.
  */
final case class SpmdContext(
    rank: Int,
    worldSize: Int,
    peerAddresses: Seq[String],
    gather: String => Seq[String],
    sync: () => Unit)

/** Per-worker identity handed to the setup hooks (reference:
  * WorkerMetadata/NodeInfo, resources.py:363/400). partitionId is the
  * worker analogue; stageAttempt/taskAttempt expose Spark's retry counters.
  * `spmd` is populated only inside barrier (isSpmd) stages.
  * `gpuAddresses` are the task's ASSIGNED GPU device addresses when the
  * stage runs under a GPU ResourceProfile (see [[GpuResources]]) — the
  * reference's per-actor CUDA visibility (ray_utils/gpu.py); empty on
  * CPU-only clusters/local mode.
  */
final case class WorkerContext(
    workerId: String,
    partitionId: Int,
    attemptNumber: Int,
    stageId: Int,
    spmd: Option[SpmdContext] = None,
    gpuAddresses: Seq[String] = Nil)

sealed trait ExecutionMode
object ExecutionMode {
  /** Lazy narrow chain; stages run concurrently via pipelined execution. */
  case object Streaming extends ExecutionMode
  /** Materialization barrier (persist+count) between stages. */
  case object Batch extends ExecutionMode
  /** Same chain over a Structured Streaming Dataset. */
  case object Serving extends ExecutionMode
}

/** Per-stage overrides (reference: StageSpec, specs.py:306). `None` falls
  * back to the [[PipelineConfig]] value, mirroring
  * `override_with_pipeline_params` (specs.py:352).
  */
final case class StageSpec[I, O](
    stage: Stage[I, O],
    numWorkers: Option[Int] = None,
    numRunAttempts: Option[Int] = None,
    numSetupAttempts: Option[Int] = None,
    ignoreFailures: Option[Boolean] = None,
    failuresReturnNones: Option[Boolean] = None,
    resetWorkersOnFailure: Option[Boolean] = None,
    overProvisionFactor: Option[Double] = None)

/** Pipeline-wide config (reference: PipelineConfig, specs.py:434).
  *
  *  - `numSetupAttempts`: bounded retry around `Stage.setup()` (reference
  *    `num_setup_attempts_python`, specs.py:440) — transient setup
  *    failures (a model-download hiccup) must not kill the task.
  *  - `resetWorkersOnFailure` (specs.py:457): on an ignored `process`
  *    failure the worker is torn down and rebuilt — `destroy()`, the
  *    node-setup latch cleared, `setupOnNode()`/`setup()` re-run — so a
  *    poisoned node-level singleton can't poison every later batch. As in
  *    the reference, it only takes effect with `ignoreFailures`; it also
  *    clears the latch when the task itself fails, so a fresh task
  *    attempt re-initializes the node.
  */
final case class PipelineConfig(
    mode: ExecutionMode = ExecutionMode.Streaming,
    numRunAttempts: Int = 1,
    numSetupAttempts: Int = 1,
    ignoreFailures: Boolean = false,
    failuresReturnNones: Boolean = false,
    resetWorkersOnFailure: Boolean = false,
    batchStorageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    checkpointDir: Option[String] = None,
    jobInfo: Option[JobInfo] = None)

/** Pipeline-identity record for tagging reported metrics (reference:
  * JobInfo, specs.py:500-508 — "info about the pipeline job ... used to
  * tag reported pipeline metrics"). Attach via
  * `PipelineConfig(jobInfo = Some(...))`: [[Pipeline.from]] hands it to
  * the monitor, whose [[PipelineMonitor.tags]]/render carry it on every
  * rollup — so metrics aggregated ACROSS pipelines (the reference's use
  * case) stay attributable to (type, version, mode).
  */
final case class JobInfo(
    pipelineType: String,
    pipelineVersion: String,
    pipelineMode: String)

/** Typed pipeline builder/compiler: each added stage extends a lazy
  * `Dataset` chain. The chain IS the pipeline — Catalyst sees one plan, so
  * column pruning below the first stage and AQE above it still apply.
  */
final class Pipeline[I] private (
    val dataset: Dataset[I],
    config: PipelineConfig,
    monitor: Option[PipelineMonitor],
    index: Int,
    persisted: Option[Dataset[_]] = None) {

  def stage[O: Encoder](s: Stage[I, O]): Pipeline[O] = stage(StageSpec(s))

  def stage[O: Encoder](spec: StageSpec[I, O]): Pipeline[O] = {
    if (config.mode == ExecutionMode.Batch && !dataset.isStreaming
        && config.checkpointDir.isDefined) {
      // CHECKPOINTED batch: each stage materializes to DURABLE storage
      // (parquet + _SUCCESS marker) instead of executor block storage, and
      // a stage whose checkpoint already exists is SKIPPED ENTIRELY — its
      // process/setup never run — so a rerun after a mid-pipeline failure
      // (driver loss included, which persist() does not survive) resumes
      // at the first incomplete stage. The caller owns the directory
      // lifecycle: one dir per pipeline VERSION (stages are addressed by
      // position; editing the chain invalidates the dir), delete to force
      // a full recompute. This is Batch mode's storage-boundary contract
      // (see `envInfo` note) made automatic.
      val spark = dataset.sparkSession
      val path = s"${config.checkpointDir.get}/stage-$index"
      val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        val compiled = Pipeline.compile(dataset, spec, config, monitor,
          f"Stage $index%02d - ${spec.stage.name}")
        compiled.write.mode("overwrite").parquet(path) // the barrier
      }
      new Pipeline(spark.read.parquet(path).as[O], config, monitor, index + 1, persisted)
    } else {
      val compiled = Pipeline.compile(dataset, spec, config, monitor,
        f"Stage $index%02d - ${spec.stage.name}")
      if (config.mode == ExecutionMode.Batch && !compiled.isStreaming) {
        val p = compiled.persist(config.batchStorageLevel)
        // the materialization barrier: a noop sink scans (and thereby
        // caches) every partition in ONE job with no aggregation
        // exchange and no row deserialization — count() spent an extra
        // partial/final agg round-trip per stage, which at 3 stages was
        // most of Batch mode's driver-job count (the quantity co-tenant
        // contention multiplies, VERDICT r12)
        p.write.format("noop").mode("overwrite").save()
        // the previous stage's materialization has been consumed — free it
        // (the reference's batch mode likewise drops stage N-1 once stage N
        // is materialized)
        persisted.foreach(_.unpersist())
        new Pipeline(p, config, monitor, index + 1, Some(p))
      } else new Pipeline(compiled, config, monitor, index + 1, persisted)
    }
  }

  /** Terminal: the composed (lazy unless Batch) output Dataset. In Batch
    * mode the LAST stage stays persisted (it is the result); call
    * `unpersistResult()` when done with it.
    */
  def run(): Dataset[I] = dataset

  def unpersistResult(): Unit = persisted.foreach(_.unpersist())
}

object Pipeline {

  def from[I](
      ds: Dataset[I],
      config: PipelineConfig = PipelineConfig(),
      monitor: Option[PipelineMonitor] = None): Pipeline[I] = {
    require(!(ds.isStreaming && config.mode == ExecutionMode.Batch),
      "Batch mode requires a bounded input; use Streaming/Serving for streams")
    // the config's job identity rides the monitor so its rollups are
    // tagged (reference: PipelineSpec.job_info → reported metric tags)
    config.jobInfo.foreach(ji => monitor.foreach(_.adoptJobInfo(ji)))
    new Pipeline(ds, config, monitor, 0)
  }

  /** JVM-wide once-per-node latch backing `setupOnNode` (the analogue of a
    * Ray node-level setup; on a multi-executor cluster each executor JVM
    * runs it once). Keyed by a per-compiled-stage id minted on the driver —
    * NOT the stage class — so two instances of the same stage class (e.g.
    * differently configured) each get their own node setup.
    */
  private val nodeSetupDone = new ConcurrentHashMap[String, java.lang.Boolean]()
  private[graft] def setupNodeOnce(key: String)(body: => Unit): Unit =
    nodeSetupDone.computeIfAbsent(key, _ => { body; java.lang.Boolean.TRUE })

  /** Clear the once-per-node latch so the next [[setupNodeOnce]] re-runs
    * the body — the reset path behind `resetWorkersOnFailure`.
    */
  private[graft] def resetNodeSetup(key: String): Unit = nodeSetupDone.remove(key)

  private val stageIds = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def withAttempts[A](n: Int)(body: => A): A =
    Retry.withRetries(n)(body)

  private def compile[I, O: Encoder](
      ds: Dataset[I],
      spec: StageSpec[I, O],
      config: PipelineConfig,
      monitor: Option[PipelineMonitor],
      stageName: String): Dataset[O] = {
    val st = spec.stage
    val ignore = spec.ignoreFailures.getOrElse(config.ignoreFailures)
    val nones = spec.failuresReturnNones.getOrElse(config.failuresReturnNones)
    // failures_return_nones documents "the task will not be retried"
    // (specs.py:477): padding IS the failure policy, so burn no attempts.
    val attempts =
      if (nones) 1 else spec.numRunAttempts.getOrElse(config.numRunAttempts)
    val setupAttempts = spec.numSetupAttempts.getOrElse(config.numSetupAttempts)
    // Reference gates worker reset on ignore_failures (specs.py:457).
    val reset = spec.resetWorkersOnFailure.getOrElse(config.resetWorkersOnFailure) && ignore
    val outCls = implicitly[Encoder[O]].clsTag.runtimeClass
    if (nones) {
      // The padding must survive the output encoder: primitives unbox null
      // to 0 silently and top-level case-class encoders reject null
      // outright — both would betray the policy. Fail fast with guidance.
      require(!outCls.isPrimitive &&
          (classOf[Option[_]].isAssignableFrom(outCls) || !classOf[Product].isAssignableFrom(outCls)),
        s"failuresReturnNones needs a null-tolerant output type; got ${outCls.getName}. " +
          "Use Option[O] (None per failed sample) or a reference type like String.")
    }
    val nonePad: O =
      if (classOf[Option[_]].isAssignableFrom(outCls)) None.asInstanceOf[O]
      else null.asInstanceOf[O]
    val nodeKey = s"${st.getClass.getName}#${stageIds.incrementAndGet()}"
    // numWorkers → explicit repartition; over-provision widens it. On a
    // cluster this sets task parallelism for the stage; locally it is the
    // worker-count analogue.
    val scaled = (spec.numWorkers, spec.overProvisionFactor) match {
      case (Some(n), Some(f)) => ds.repartition(math.max(1, math.ceil(n * f).toInt))
      case (Some(n), None)    => ds.repartition(n)
      case _                  => ds
    }
    val stats = monitor.map(_.forStage(stageName))
    // Resolve declarative artifacts on the driver, before the stage can
    // run anywhere (reference: download_requests, specs.py:186). Once per
    // (session, request): artifacts prefetched by Artifacts.downloadAll /
    // BackgroundArtifactDownloader — or by an earlier stage sharing the
    // same weights — are not re-added here.
    st.downloadRequests.foreach(r => Artifacts.resolveOnce(ds.sparkSession, r))
    val body: (Iterator[I], WorkerContext) => Iterator[O] =
      partitionBody(st, ignore, nones, attempts, setupAttempts, reset,
        nonePad, nodeKey, stats)
    if (st.resources.isSpmd) {
      // SPMD gang stage → Spark barrier execution: every task of the
      // stage is scheduled together or not at all (the reference's "one
      // actor per GPU, all coordinated as a single worker group",
      // resources.py:423). Barrier mode is RDD-level by design in Spark,
      // so the stage hops out of Catalyst for its imperative gang work
      // and hops back via createDataset; numWorkers IS the world size.
      require(!scaled.isStreaming,
        "SPMD (barrier) stages need a bounded input: Spark barrier mode is batch-only")
      // Gang collectives make single-worker re-initialization unsound: a
      // setup() that calls gather()/sync() (the reason SpmdContext exists)
      // and is re-run on ONE worker issues a different number of
      // collectives than its peers — the gang deadlocks until the barrier
      // timeout. Spark's own model agrees: a failed barrier stage retries
      // ALL tasks together. So per-worker setup retries and worker resets
      // are rejected loudly rather than silently dropped.
      require(setupAttempts == 1,
        "SPMD stages cannot use numSetupAttempts > 1: re-running setup() on one " +
          "gang member desynchronizes its collectives (Spark retries the whole " +
          "barrier stage on failure — rely on that)")
      require(!reset,
        "SPMD stages cannot use resetWorkersOnFailure: rebuilding one gang member " +
          "mid-stage desynchronizes its collectives")
      val session = scaled.sparkSession
      implicit val oTag: scala.reflect.ClassTag[O] = implicitly[Encoder[O]].clsTag
      val rdd = scaled.rdd.barrier().mapPartitions { it =>
        val btc = org.apache.spark.BarrierTaskContext.get()
        val infos = btc.getTaskInfos()
        val spmd = SpmdContext(
          rank = btc.partitionId(),
          worldSize = infos.length,
          peerAddresses = infos.map(_.address).toIndexedSeq,
          gather = msg => btc.allGather(msg).toIndexedSeq,
          sync = () => btc.barrier())
        btc.barrier() // gang rendezvous: no worker enters setup until all are up
        body(it, currentCtx().copy(spmd = Some(spmd)))
      }
      session.createDataset(rdd)
    } else scaled.mapPartitions(it => body(it, currentCtx()))
  }

  /** Worker identity from the live task (partition = worker). */
  private def currentCtx(): WorkerContext = {
    val tc = Option(TaskContext.get())
    WorkerContext(
      workerId = tc.map(t => s"${t.stageId()}-${t.partitionId()}").getOrElse("local"),
      partitionId = tc.map(_.partitionId()).getOrElse(0),
      attemptNumber = tc.map(_.attemptNumber()).getOrElse(0),
      stageId = tc.map(_.stageId()).getOrElse(0),
      gpuAddresses = tc.toSeq.flatMap(t =>
        t.resources().get("gpu").toSeq.flatMap(_.addresses)))
  }

  /** The per-partition worker loop — setup-on-node latch, setup retries,
    * batch processing with the failure policies, per-worker stats, destroy
    * on completion. Shared verbatim by the regular `mapPartitions` path
    * and the SPMD barrier path (which only enriches the context).
    */
  private def partitionBody[I, O](
      st: Stage[I, O],
      ignore: Boolean,
      nones: Boolean,
      attempts: Int,
      setupAttempts: Int,
      reset: Boolean,
      nonePad: O,
      nodeKey: String,
      stats: Option[StageStats])(it: Iterator[I], ctx: WorkerContext): Iterator[O] = {
      val tc = Option(TaskContext.get())
      if (reset)
        // a failed task must not leave the node latched: the next task
        // attempt gets a freshly initialized node (specs.py:457)
        tc.foreach(_.addTaskFailureListener((_, _) => Pipeline.resetNodeSetup(nodeKey)))
      Pipeline.setupNodeOnce(nodeKey)(st.setupOnNode(ctx))
      Pipeline.withAttempts(setupAttempts)(st.setup(ctx))
      // per-worker rollup: local counters, ONE accumulator add per task
      val taskStart = System.nanoTime()
      val local = new LocalWorkerCounters
      stats.foreach { s =>
        tc.foreach(_.addTaskCompletionListener[Unit] { _ =>
          s.workers.add(ctx.workerId -> local.toStat(System.nanoTime() - taskStart))
        })
      }
      tc.foreach(_.addTaskCompletionListener[Unit](_ => st.destroy()))
      val counted = stats.fold(it)(s => it.map { x => s.rowsIn.add(1); local.rowsIn += 1; x })
      val out = counted.grouped(st.batchSize).flatMap { batch =>
        val t0 = System.nanoTime()
        val res =
          try {
            val r = Pipeline.withAttempts(attempts)(st.process(batch))
            stats.foreach(_.batches.add(1))
            local.batches += 1
            r
          } catch {
            // NonFatal only: an OutOfMemoryError or a task-kill interrupt
            // must propagate — swallowing it would convert fatal JVM state
            // into silently dropped batches and block cancellation.
            case NonFatal(e) if nones =>
              stats.foreach(_.failures.add(1))
              local.failures += 1
              // The reference's failures_return_nones (specs.py:474): the
              // failed batch yields one placeholder per sample so downstream
              // stages see aligned cardinality. Option outputs get a real
              // None — chained typed stages receive objects directly (no
              // encode round-trip), so a raw null would NPE the next stage.
              Seq.fill(batch.size)(nonePad)
            case NonFatal(e) if ignore =>
              stats.foreach(_.failures.add(1))
              local.failures += 1
              if (reset) {
                // reset_workers_on_failure: tear the worker down and
                // rebuild it so node/worker state poisoned by the failure
                // can't poison every later batch.
                try st.destroy() catch { case NonFatal(_) => () }
                Pipeline.resetNodeSetup(nodeKey)
                Pipeline.setupNodeOnce(nodeKey)(st.setupOnNode(ctx))
                Pipeline.withAttempts(setupAttempts)(st.setup(ctx))
              }
              Seq.empty[O]
          }
        val dt = System.nanoTime() - t0
        stats.foreach(_.processNanos.add(dt))
        local.processNanos += dt
        res
      }
      stats.fold(out)(s => out.map { x => s.rowsOut.add(1); local.rowsOut += 1; x })
  }

  /** Task-local mutable counters backing the per-worker rollup — pushed to
    * the [[WorkerStatsAccumulator]] exactly once, at task completion.
    */
  private final class LocalWorkerCounters {
    var rowsIn = 0L
    var rowsOut = 0L
    var batches = 0L
    var failures = 0L
    var processNanos = 0L
    def toStat(wallNanos: Long): WorkerStat =
      WorkerStat(rowsIn, rowsOut, batches, failures, processNanos, wallNanos)
  }
}
