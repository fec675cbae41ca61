package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.SparkSession

import graft.api._

/** Worker-death chaos probe (reference parity:
  * cosmos_xenna/pipelines/v1/test_segfaulting_pipeline.py and
  * ray_utils/test_actor_pool_death_recovery.py — an actor dies mid-batch,
  * Ray restarts it, and the pipeline completes with full, correct
  * output). Spark's analogue of a dying worker process is a dying TASK
  * ATTEMPT; recovery is the scheduler's task retry. Local masters pin
  * `maxFailures` to 1 unless asked (`local[4,2]` = 4 threads, 2 attempts),
  * which is why this runs as its OWN JVM — the shared spec session cannot
  * retry tasks — spawned by ChaosSuite or run directly via
  * `sbt "runMain graft.ChaosProbe"`.
  *
  * The injected death is a [[scala.util.control.ControlThrowable]]:
  * outside `NonFatal`, so neither the run-attempt retry wrapper nor the
  * `ignoreFailures` batch handler can swallow it (a genuinely fatal
  * process death, not an ignorable batch error), while Spark's own
  * fatal-error check does NOT JVM-kill on it — exactly the shape of one
  * worker dying without taking the executor host down.
  *
  * Verified interaction under `resetWorkersOnFailure` + task retry:
  *  1. the task-failure listener clears the once-per-node latch, so the
  *     RETRY attempt re-runs `setupOnNode` (node state rebuilt);
  *  2. `setup`/`destroy` bracket every task attempt including the dead
  *     one (destroy fires from the completion listener on failure too);
  *  3. the job completes and the output matches the no-failure oracle —
  *     rows emitted by the dead attempt are discarded by Spark, never
  *     double-counted.
  */
object ChaosProbe {
  // per-JVM chaos state (driver and executors share the JVM under local)
  private val batches = new AtomicInteger(0)
  private val died = new AtomicBoolean(false)
  private val setupCount = new AtomicInteger(0)
  private val destroyCount = new AtomicInteger(0)
  private val nodeSetupCount = new AtomicInteger(0)
  private val maxAttemptSeen = new AtomicInteger(0)

  /** Fatal-to-the-worker, non-fatal-to-the-JVM (see class doc). */
  private final class WorkerDeath
      extends scala.util.control.ControlThrowable("simulated worker death (chaos probe)")

  private final class DyingStage extends Stage[Long, Long] {
    override def batchSize: Int = 32
    override def setupOnNode(): Unit = { nodeSetupCount.incrementAndGet(); () }
    override def setup(ctx: WorkerContext): Unit = {
      setupCount.incrementAndGet()
      maxAttemptSeen.accumulateAndGet(ctx.attemptNumber, math.max(_, _))
      ()
    }
    override def destroy(): Unit = { destroyCount.incrementAndGet(); () }
    override def process(b: Seq[Long]): Seq[Long] = {
      // die exactly once JVM-wide, on the third batch processed — the
      // dying task has real progress behind it (mid-task, mid-stream)
      if (batches.incrementAndGet() == 3 && died.compareAndSet(false, true))
        throw new WorkerDeath
      b.map(_ + 1)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4,2]") // 4 threads, spark.task.maxFailures = 2
      .appName("graft-chaos-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val ds = spark.createDataset(1L to 1000L).repartition(4)
      val out = Pipeline
        .from(ds, PipelineConfig(ignoreFailures = true, resetWorkersOnFailure = true))
        .stage(new DyingStage)
        .run()
        .collect()
        .sorted
      def check(cond: Boolean, msg: => String): Unit =
        if (!cond) throw new IllegalStateException(s"CHAOS_FAIL $msg")
      check(died.get(), "the chaos death never fired")
      check(out.toSeq == (2L to 1001L),
        s"output != no-failure oracle: ${out.length} rows, head=${out.take(3).mkString(",")}")
      check(maxAttemptSeen.get() == 1,
        s"expected a task RETRY (attempt 1); max attempt seen ${maxAttemptSeen.get()}")
      // 4 partitions + 1 retried attempt = 5 task executions, each
      // bracketed by setup/destroy (destroy fires on the dead one too)
      check(setupCount.get() == 5, s"setup ran ${setupCount.get()}x, expected 5")
      check(destroyCount.get() == 5, s"destroy ran ${destroyCount.get()}x, expected 5")
      // the failure listener cleared the node latch → the retry re-ran it
      check(nodeSetupCount.get() == 2,
        s"setupOnNode ran ${nodeSetupCount.get()}x, expected 2 (initial + post-death)")
      println(s"CHAOS_OK rows=${out.length} setup=${setupCount.get()} " +
        s"destroy=${destroyCount.get()} nodeSetup=${nodeSetupCount.get()} " +
        s"maxAttempt=${maxAttemptSeen.get()}")
    } finally spark.stop()
  }
}
