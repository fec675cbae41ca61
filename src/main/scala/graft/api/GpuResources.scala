package graft.api

import org.apache.spark.rdd.RDD
import org.apache.spark.resource.{ExecutorResourceRequests, ResourceProfile, ResourceProfileBuilder, TaskResourceRequests}
import org.apache.spark.sql.{Dataset, Encoder}

/** Cluster mapping for `Resources(gpus = n)` (reference:
  * ray_utils/gpu.py — per-actor GPU allocation and CUDA visibility;
  * smoke_test_cuda_visibility tests). The Spark analogue is STAGE-LEVEL
  * SCHEDULING: a `ResourceProfile` attached to the stage's RDD tells the
  * scheduler that THIS stage's tasks each need `n` GPUs (and optionally
  * that its executors must hold `m`), exactly like the reference's
  * per-stage `Resources(gpus=...)` actor shapes.
  *
  * Deployment recipe (documented here because `local[*]` cannot execute
  * GPU profiles — no GPU discovery in a local scheduler):
  *
  *  1. Cluster config:
  *     `spark.executor.resource.gpu.amount=<m>`,
  *     `spark.executor.resource.gpu.discoveryScript=<getGpus.sh>`,
  *     `spark.task.resource.gpu.amount=<default per-task>` — the
  *     APPLICATION-wide default shape (all stages alike).
  *  2. Per-STAGE override (what this object provides): build a profile
  *     with [[profileFor]] and pin the compiled stage Dataset to it with
  *     [[withStageProfile]]. Stage-level scheduling needs dynamic
  *     allocation on YARN/k8s/standalone; a task-only profile
  *     (`executorGpus = None` → TaskResourceProfile) also works without
  *     dynamic allocation since Spark 3.4, reusing the default executors.
  *  3. Inside the stage, the task's ASSIGNED GPU addresses surface as
  *     `WorkerContext.gpuAddresses` (from
  *     `TaskContext.resources()("gpu").addresses`) — the
  *     `CUDA_VISIBLE_DEVICES` analogue the reference computes per actor
  *     (gpu.py); pass them to the native library in `setup()`.
  *
  * Fractional `gpus` (several tasks sharing one device — the reference's
  * fractional actor GPUs) map directly: `taskGpus = 0.25` lets 4 tasks
  * share each device.
  */
object GpuResources {

  /** Build the stage's ResourceProfile from its advisory [[Resources]].
    * `executorGpus = Some(m)` additionally requests dedicated executors
    * holding m GPUs (full stage-level scheduling); `None` keeps a
    * task-requirements-only profile (runs on the default executors).
    */
  def profileFor(res: Resources, executorGpus: Option[Int] = None,
      discoveryScript: String = ""): ResourceProfile = {
    require(res.gpus > 0, s"profileFor needs a GPU-shaped stage, got gpus=${res.gpus}")
    val b = new ResourceProfileBuilder()
    b.require(new TaskResourceRequests().resource("gpu", res.gpus))
    executorGpus.foreach { m =>
      require(m >= math.ceil(res.gpus),
        s"executor gpus ($m) must cover the per-task request (${res.gpus})")
      b.require(new ExecutorResourceRequests().resource("gpu", m, discoveryScript))
    }
    b.build()
  }

  /** Pin a compiled stage Dataset to a GPU profile. The profile is an
    * RDD-level construct in Spark, so this hops the Dataset to its RDD
    * (same hop an SPMD barrier stage makes) and back; downstream
    * operators continue in Catalyst.
    */
  def withStageProfile[T: Encoder](ds: Dataset[T], profile: ResourceProfile): Dataset[T] =
    ds.sparkSession.createDataset(pinned(ds, profile))

  /** The RDD carrying the profile — exposed so callers/specs can assert
    * the profile landed (`rdd.getResourceProfile`).
    */
  def pinned[T](ds: Dataset[T], profile: ResourceProfile): RDD[T] =
    ds.rdd.withResources(profile)
}
