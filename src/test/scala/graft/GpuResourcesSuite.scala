package graft

import org.apache.spark.resource.ResourceProfile

import graft.api.{GpuResources, Pipeline, Resources, Stage, WorkerContext}

/** GPU stage-level scheduling hook (reference: ray_utils/gpu.py per-actor
  * GPU shapes). CPU-only CI: asserts the ResourceProfile lands on the
  * stage's RDD and that the WorkerContext GPU plumbing runs — not real
  * GPU execution (local mode has no GPU discovery).
  */
class GpuResourcesSuite extends SparkSpec {

  test("profileFor maps Resources(gpus=n) to task/executor gpu requests") {
    val taskOnly = GpuResources.profileFor(Resources(cpus = 2.0, gpus = 0.25))
    assert(taskOnly.taskResources("gpu").amount == 0.25)
    assert(!taskOnly.executorResources.contains("gpu"),
      "task-only profile must not demand dedicated executors")
    val full = GpuResources.profileFor(Resources(gpus = 2.0), executorGpus = Some(4),
      discoveryScript = "/opt/getGpus.sh")
    assert(full.taskResources("gpu").amount == 2.0)
    assert(full.executorResources("gpu").amount == 4)
    assert(full.executorResources("gpu").discoveryScript == "/opt/getGpus.sh")
    intercept[IllegalArgumentException](GpuResources.profileFor(Resources(gpus = 0.0)))
    intercept[IllegalArgumentException](
      GpuResources.profileFor(Resources(gpus = 4.0), executorGpus = Some(2)))
  }

  test("pinned wires the profile into Spark's scheduler layer") {
    import spark.implicits._
    val ds = Seq(1, 2, 3).toDS()
    val prof = GpuResources.profileFor(Resources(gpus = 1.0))
    // local[*] has no cluster manager, so Spark's ResourceProfileManager
    // rejects the registration — the exception COMES FROM inside
    // RDD.withResources, proving the hook reaches the scheduler layer; on
    // standalone/YARN/k8s the same call attaches the profile and
    // rdd.getResourceProfile() returns it (stage-level scheduling docs).
    val ex = intercept[org.apache.spark.SparkException](GpuResources.pinned(ds, prof))
    assert(ex.getMessage.toLowerCase.contains("resourceprofile"))
    // the default (unpinned) RDD carries no custom profile
    assert(Option(Seq(1).toDS().rdd.getResourceProfile()).isEmpty)
  }

  test("WorkerContext.gpuAddresses plumbing runs (empty on CPU-only local)") {
    import spark.implicits._
    val out = Pipeline.from(Seq(1, 2).toDS())
      .stage(new Stage[Int, String] {
        private var addrs: Seq[String] = null
        override def setup(ctx: WorkerContext): Unit = { addrs = ctx.gpuAddresses }
        override def process(b: Seq[Int]): Seq[String] =
          b.map(x => s"$x:${addrs.mkString("+")}")
      })
      .run().collect()
    assert(out.sorted.toSeq == Seq("1:", "2:"),
      "no GPUs assigned in local mode -> empty address list reaches the stage")
  }
}
