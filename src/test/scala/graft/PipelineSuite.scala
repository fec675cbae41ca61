package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.api._

/** Framework semantics specs: SURVEY.md §2a F1–F15. */
object PipelineSuite {
  // JVM-shared probes (executors == driver JVM under local[*]).
  val nodeSetups = new AtomicInteger(0)
  val workerSetups = new AtomicInteger(0)
  val destroys = new AtomicInteger(0)
  val flakyCalls = new AtomicInteger(0)
  val maxBatch = new AtomicInteger(0)

  // (reference: v1/test_batch_size_hang.py — a batch size far larger than
  // the available items must process the short tail, never wait for a
  // full batch; Iterator.grouped emits the final partial group, asserted
  // in the oversized-batch test below)
  final class AddStage(delta: Int, override val batchSize: Int = 10)
      extends Stage[Int, Int] {
    override def setupOnNode(): Unit = { nodeSetups.incrementAndGet(); () }
    override def setup(): Unit = { workerSetups.incrementAndGet(); () }
    override def destroy(): Unit = { destroys.incrementAndGet(); () }
    override def process(batch: Seq[Int]): Seq[Int] = {
      maxBatch.getAndUpdate(m => math.max(m, batch.size))
      batch.map(_ + delta)
    }
  }

  /** Used ONLY by the F7 lifecycle test: the setupOnNode latch is keyed by
    * stage class, so a dedicated class keeps the count isolated from other
    * tests in this JVM.
    */
  final class LifecycleStage extends Stage[Int, Int] {
    override def setupOnNode(): Unit = { nodeSetups.incrementAndGet(); () }
    override def setup(): Unit = { workerSetups.incrementAndGet(); () }
    override def destroy(): Unit = { destroys.incrementAndGet(); () }
    override def process(batch: Seq[Int]): Seq[Int] = batch
  }

  val ckptCalls = new AtomicInteger(0)
  val boom = new java.util.concurrent.atomic.AtomicBoolean(false)

  final class CountingAdd(delta: Int) extends Stage[Int, Int] {
    override def process(batch: Seq[Int]): Seq[Int] = {
      ckptCalls.addAndGet(batch.size); batch.map(_ + delta)
    }
  }

  final class BoomStage extends Stage[Int, Int] {
    override def process(batch: Seq[Int]): Seq[Int] = {
      if (boom.get) throw new RuntimeException("boom")
      batch
    }
  }

  final class EvenFilterStage extends Stage[Int, Int] {
    override def batchSize: Int = 7
    override def process(batch: Seq[Int]): Seq[Int] = batch.filter(_ % 2 == 0)
  }

  /** Fails on first attempt for every batch containing `poison`. */
  final class FlakyStage(poison: Int) extends Stage[Int, Int] {
    override def batchSize: Int = 5
    private val attempts = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    override def process(batch: Seq[Int]): Seq[Int] = {
      flakyCalls.incrementAndGet()
      if (batch.contains(poison)) {
        val k = batch.min
        val n = attempts.merge(k, 1, (a, b) => a + b)
        if (n == 1) throw new RuntimeException(s"flaky on $batch")
      }
      batch
    }
  }

  /** Always fails on batches containing `poison`. */
  final class PoisonStage(poison: Int) extends Stage[Int, Int] {
    override def batchSize: Int = 1
    override def process(batch: Seq[Int]): Seq[Int] = {
      if (batch.contains(poison)) throw new RuntimeException("poison")
      batch
    }
  }

  final class PartitionIdStage extends Stage[Int, Int] {
    override def process(batch: Seq[Int]): Seq[Int] =
      batch.map(_ => org.apache.spark.TaskContext.getPartitionId())
  }

  val ctxPartitions = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  // ---- setup-retry / worker-reset probes (JVM-shared under local[*]) ----
  val setupTries = new AtomicInteger(0)
  final class FlakySetupStage(succeedOn: Int) extends Stage[Int, Int] {
    override def setup(): Unit = {
      // transient setup failure — the model-download-hiccup case the
      // reference built num_setup_attempts_python for (specs.py:440)
      if (setupTries.incrementAndGet() < succeedOn)
        throw new RuntimeException("transient setup failure")
    }
    override def process(batch: Seq[Int]): Seq[Int] = batch
  }

  val nodeInits = new AtomicInteger(0)
  @volatile var nodePoisoned = false
  final class PoisonedNodeStage extends Stage[Int, Int] {
    override def batchSize: Int = 1
    override def setupOnNode(): Unit = {
      // the FIRST node init comes up poisoned; a re-init heals it — the
      // "only a reset worker can clear it" scenario from specs.py:457
      nodePoisoned = nodeInits.incrementAndGet() == 1
    }
    override def process(batch: Seq[Int]): Seq[Int] = {
      if (nodePoisoned) throw new RuntimeException("poisoned node singleton")
      batch
    }
  }

  val nonesProcessCalls = new AtomicInteger(0)
  final class CountingPoisonStage(poison: Int) extends Stage[Int, String] {
    override def batchSize: Int = 1
    override def process(batch: Seq[Int]): Seq[String] = {
      nonesProcessCalls.incrementAndGet()
      if (batch.contains(poison)) throw new RuntimeException("poison")
      batch.map(_.toString)
    }
  }

  final class DyingStage extends Stage[Int, Int] {
    override def destroy(): Unit = { destroys.incrementAndGet(); () }
    override def process(batch: Seq[Int]): Seq[Int] =
      throw new RuntimeException("worker died mid-batch")
  }

  final class InterruptingStage extends Stage[Int, Int] {
    override def batchSize: Int = 1
    override def process(batch: Seq[Int]): Seq[Int] =
      throw new InterruptedException("task-kill analogue")
  }

  final class DeclaredArtifactStage(req: DownloadRequest) extends Stage[Int, Int] {
    override def downloadRequests: Seq[DownloadRequest] = Seq(req)
    @transient private var factor: Int = _
    override def setup(): Unit = {
      // no manual Artifacts call anywhere: the pipeline resolved the
      // declarative request before this stage could run
      factor = scala.io.Source.fromFile(req.localPath).mkString.trim.toInt
    }
    override def process(batch: Seq[Int]): Seq[Int] = batch.map(_ * factor)
  }

  /** Declares requests without using them — the downloadAll specs only
    * exercise collection/dedup/resolution, not worker-side reads.
    */
  final class MultiDeclStage(paths: Seq[String]) extends Stage[Int, Int] {
    override def downloadRequests: Seq[DownloadRequest] =
      paths.map(p => DownloadRequest(p))
    override def process(batch: Seq[Int]): Seq[Int] = batch
  }

  final class ArchiveArtifactStage(req: DownloadRequest, inner: String) extends Stage[Int, Int] {
    override def downloadRequests: Seq[DownloadRequest] = Seq(req)
    @transient private var factor: Int = _
    override def setup(): Unit = {
      // req.localPath is the EXTRACTED directory of the archive
      val f = new java.io.File(req.localPath, inner)
      factor = scala.io.Source.fromFile(f).mkString.trim.toInt
    }
    override def process(batch: Seq[Int]): Seq[Int] = batch.map(_ * factor)
  }

  final class DirArtifactStage(req: DownloadRequest) extends Stage[Int, Int] {
    override def downloadRequests: Seq[DownloadRequest] = Seq(req)
    @transient private var factor: Int = _
    override def setup(): Unit = {
      // req.localPath is the replicated directory: sum every file in it
      val dir = new java.io.File(req.localPath)
      factor = dir.listFiles().sortBy(_.getName)
        .map(f => scala.io.Source.fromFile(f).mkString.trim.toInt).sum
    }
    override def process(batch: Seq[Int]): Seq[Int] = batch.map(_ * factor)
  }

  val artifactSum = new AtomicLong(0)
  final class ArtifactStage(fileName: String) extends Stage[Int, Int] {
    @transient private var factor: Int = _
    override def setup(): Unit = {
      // resolve a distributed artifact exactly where the reference
      // guarantees downloads have landed (in worker setup)
      val line = scala.io.Source.fromFile(Artifacts.localPath(fileName)).mkString.trim
      factor = line.toInt
    }
    override def process(batch: Seq[Int]): Seq[Int] = batch.map(_ * factor)
  }
}

class PipelineSuite extends SparkSpec {
  import PipelineSuite._

  private def ints(n: Int, parts: Int = 4) = {
    import spark.implicits._
    spark.createDataset(1 to n).repartition(parts)
  }

  test("F1/F2/F6: stage chain transforms with batching") {
    import spark.implicits._
    maxBatch.set(0)
    val out = Pipeline.from(ints(100))
      .stage(new AddStage(1))
      .stage(new AddStage(10))
      .run().collect().sorted
    assert(out.toSeq == (12 to 111))
    assert(maxBatch.get() <= 10 && maxBatch.get() > 1) // grouped(batchSize)
  }

  test("F6b: batch size far beyond the item count processes the tail, no hang") {
    import spark.implicits._
    // reference: v1/test_batch_size_hang.py — an oversized stage_batch_size
    // must flush the short final group instead of waiting to fill
    val out = Pipeline.from(ints(7, parts = 2))
      .stage(new AddStage(1, batchSize = 10000))
      .run().collect().sorted
    assert(out.toSeq == (2 to 8))
  }

  test("F7: setup per partition, setupOnNode once per JVM, destroy runs") {
    import spark.implicits._
    nodeSetups.set(0); workerSetups.set(0); destroys.set(0)
    val ds = ints(50, parts = 5)
    val out = Pipeline.from(ds).stage(new LifecycleStage).run()
    out.count()
    assert(nodeSetups.get() == 1)    // JVM singleton (one "node" under local)
    assert(workerSetups.get() == 5)  // one per partition (worker analogue)
    assert(destroys.get() == 5)      // teardown per task
  }

  test("F7c: two instances of one stage class each run their node setup") {
    import spark.implicits._
    nodeSetups.set(0)
    Pipeline.from(ints(10, parts = 2))
      .stage(new LifecycleStage)
      .stage(new LifecycleStage) // differently-instantiated, same class
      .run().count()
    assert(nodeSetups.get() == 2)
  }

  test("F9c: failuresReturnNones fails fast on null-intolerant output types") {
    import spark.implicits._
    val cfg = PipelineConfig(failuresReturnNones = true)
    val ex = intercept[IllegalArgumentException] {
      Pipeline.from(ints(4), cfg).stage(new AddStage(1)) // Int output: null -> 0
    }
    assert(ex.getMessage.contains("null-tolerant"))
  }

  test("F10: filtering via empty output (flatMap semantics)") {
    import spark.implicits._
    val out = Pipeline.from(ints(20))
      .stage(new EvenFilterStage)
      .run().collect().sorted
    assert(out.toSeq == (2 to 20 by 2))
  }

  test("F8: bounded retries recover transient failures") {
    import spark.implicits._
    flakyCalls.set(0)
    val cfg = PipelineConfig(numRunAttempts = 3)
    val out = Pipeline.from(ints(20, parts = 2), cfg)
      .stage(new FlakyStage(poison = 7))
      .run().collect().sorted
    assert(out.toSeq == (1 to 20))
    assert(flakyCalls.get() > 4) // at least one retry happened
  }

  test("F9a: ignoreFailures drops the failing batch, keeps the rest") {
    import spark.implicits._
    val cfg = PipelineConfig(ignoreFailures = true)
    val out = Pipeline.from(ints(10, parts = 2), cfg)
      .stage(new PoisonStage(poison = 4))
      .run().collect().sorted
    assert(out.toSeq == (1 to 10).filterNot(_ == 4))
  }

  test("F9b: failuresReturnNones pads failed batches with nulls") {
    import spark.implicits._
    val cfg = PipelineConfig(failuresReturnNones = true)
    val src = spark.createDataset(Seq("a", "bb", "boom", "dddd")).repartition(1)
    val out = Pipeline.from(src, cfg)
      .stage(new Stage[String, String] {
        override def batchSize: Int = 1
        override def process(b: Seq[String]): Seq[String] = {
          if (b.contains("boom")) throw new RuntimeException("boom")
          b.map(_.toUpperCase)
        }
      })
      .run().collect()
    assert(out.count(_ == null) == 1)
    assert(out.filter(_ != null).sorted.toSeq == Seq("A", "BB", "DDDD"))
  }

  test("F9d: failuresReturnNones pads Option outputs with real None") {
    import spark.implicits._
    val cfg = PipelineConfig(failuresReturnNones = true)
    val out = Pipeline.from(spark.createDataset(Seq("ok", "boom")).repartition(1), cfg)
      .stage(new Stage[String, Option[String]] {
        override def batchSize: Int = 1
        override def process(b: Seq[String]): Seq[Option[String]] = {
          if (b.contains("boom")) throw new RuntimeException("boom")
          b.map(s => Some(s.toUpperCase))
        }
      })
      // a SECOND typed stage receives the padded objects directly — a raw
      // null (instead of None) would NPE here
      .stage(new Stage[Option[String], String] {
        override def process(b: Seq[Option[String]]): Seq[String] =
          b.map(_.getOrElse("<failed>"))
      })
      .run().collect().sorted
    assert(out.toSeq == Seq("<failed>", "OK"))
  }

  test("F8b: numSetupAttempts retries transient setup failures") {
    import spark.implicits._
    setupTries.set(0)
    val out = Pipeline.from(ints(10, parts = 1),
        PipelineConfig(numSetupAttempts = 3))
      .stage(new FlakySetupStage(succeedOn = 3))
      .run().collect().sorted
    assert(out.toSeq == (1 to 10))
    assert(setupTries.get() == 3) // failed twice, succeeded on the third

    // without retries the same transient failure kills the job
    setupTries.set(0)
    intercept[Exception] {
      Pipeline.from(ints(10, parts = 1))
        .stage(new FlakySetupStage(succeedOn = 3)).run().collect()
    }
  }

  test("F-reset: resetWorkersOnFailure re-runs node setup after an ignored failure") {
    import spark.implicits._
    // poisoned node singleton, reset ON: first batch fails and is dropped,
    // the worker is rebuilt (setupOnNode re-runs, healing the singleton),
    // remaining batches pass
    nodeInits.set(0); nodePoisoned = false
    val healed = Pipeline.from(ints(5, parts = 1),
        PipelineConfig(ignoreFailures = true, resetWorkersOnFailure = true))
      .stage(new PoisonedNodeStage)
      .run().collect().sorted
    assert(healed.length == 4, "exactly the first (poisoned) batch is lost")
    assert(nodeInits.get() >= 2, "node setup must have re-run")

    // same poison, reset OFF: the singleton is never cleared and every
    // batch dies — the round-2 hazard this feature closes
    nodeInits.set(0); nodePoisoned = false
    val stuck = Pipeline.from(ints(5, parts = 1),
        PipelineConfig(ignoreFailures = true))
      .stage(new PoisonedNodeStage)
      .run().collect()
    assert(stuck.isEmpty)
    assert(nodeInits.get() == 1)
  }

  test("F9e: failuresReturnNones never burns retries (reference: no retry when padding)") {
    import spark.implicits._
    nonesProcessCalls.set(0)
    val out = Pipeline.from(ints(4, parts = 1),
        PipelineConfig(failuresReturnNones = true, numRunAttempts = 5))
      .stage(new CountingPoisonStage(poison = 3))
      .run().collect()
    assert(out.count(_ == null) == 1)
    assert(out.filter(_ != null).map(_.toInt).sorted.toSeq == Seq(1, 2, 4))
    // 4 single-element batches, one failing: exactly 4 calls — the failed
    // batch was padded on FIRST failure, not retried 5 times
    assert(nonesProcessCalls.get() == 4)
  }

  test("F9f: fatal errors propagate even under ignoreFailures") {
    import spark.implicits._
    // an interrupt is the task-kill path: swallowing it would block
    // cancellation, so the NonFatal gate must let it out
    val ex = intercept[Exception] {
      Pipeline.from(ints(3, parts = 1), PipelineConfig(ignoreFailures = true))
        .stage(new InterruptingStage)
        .run().collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.isInstanceOf[InterruptedException]),
      s"expected the interrupt to surface, got: $ex")
  }

  test("utils: Retry propagates fatal errors without burning attempts") {
    val calls = new AtomicInteger(0)
    intercept[InterruptedException] {
      Retry.withRetries(3) {
        calls.incrementAndGet()
        throw new InterruptedException("fatal")
      }
    }
    assert(calls.get() == 1)
  }

  test("F-downloads: declarative downloadRequests resolve before setup") {
    import spark.implicits._
    val f = java.io.File.createTempFile("graft_declared_artifact", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, "7\n")
    val out = Pipeline.from(ints(5, parts = 2))
      .stage(new DeclaredArtifactStage(DownloadRequest(f.getAbsolutePath)))
      .run().collect().sorted
    assert(out.toSeq == Seq(7, 14, 21, 28, 35))
  }

  test("F-downloads-b: archive requests are unpacked on the worker side") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_arch").toFile
    val zip = new java.io.File(dir, "bundle.zip")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zip))
    zos.putNextEntry(new java.util.zip.ZipEntry("factor.txt"))
    zos.write("3\n".getBytes)
    zos.closeEntry(); zos.close()
    val out = Pipeline.from(ints(4, parts = 2))
      .stage(new ArchiveArtifactStage(
        DownloadRequest(zip.getAbsolutePath, unpack = true), "factor.txt"))
      .run().collect().sorted
    assert(out.toSeq == Seq(3, 6, 9, 12))
  }

  test("F-downloads-c: recursive requests replicate a whole directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prefix").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a.txt").toPath, "2\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "b.txt").toPath, "3\n")
    val out = Pipeline.from(ints(4, parts = 2))
      .stage(new DirArtifactStage(
        DownloadRequest(dir.getAbsolutePath, recursive = true)))
      .run().collect().sorted
    assert(out.toSeq == Seq(5, 10, 15, 20))
  }

  test("F-death: a dying worker still runs destroy; the node latch resets for the next attempt") {
    import spark.implicits._
    // the reference's segfaulting-worker scenario (test_segfaulting_pipeline):
    // Ray restarts the dead actor; on Spark the task fails, Spark re-attempts
    // it (spark.task.maxFailures on a cluster), and graft guarantees
    // (a) destroy() runs for the dying worker (completion listener fires on
    //     failure too — no leaked model handles), and
    // (b) the setupOnNode latch can be cleared so the re-attempt
    //     re-initializes node state.
    destroys.set(0)
    intercept[Exception] {
      Pipeline.from(ints(3, parts = 1))
        .stage(new DyingStage)
        .run().collect()
    }
    assert(destroys.get() == 1, "destroy must run when the task fails")

    // the latch reset path used by the task-failure listener
    val inits = new AtomicInteger(0)
    Pipeline.setupNodeOnce("death-spec-key")(inits.incrementAndGet())
    Pipeline.setupNodeOnce("death-spec-key")(inits.incrementAndGet())
    assert(inits.get() == 1)
    Pipeline.resetNodeSetup("death-spec-key")
    Pipeline.setupNodeOnce("death-spec-key")(inits.incrementAndGet())
    assert(inits.get() == 2, "a cleared latch re-runs node setup")
  }

  test("F11: numWorkers repartitions the stage input") {
    import spark.implicits._
    val out = Pipeline.from(ints(40, parts = 2))
      .stage(StageSpec(new PartitionIdStage, numWorkers = Some(8)))
      .run().collect().distinct.sorted
    assert(out.length == 8)
  }

  test("F20: fan-out and fan-in through process (reference dynamic splitting)") {
    import spark.implicits._
    // fan-out: each sample becomes 3
    val out = Pipeline.from(ints(10))
      .stage(new Stage[Int, Int] {
        override def batchSize: Int = 4
        override def process(b: Seq[Int]): Seq[Int] = b.flatMap(x => Seq(x, x, x))
      })
      .run().collect()
    assert(out.length == 30)
    // fan-in: each batch reduces to a single sample
    val in = Pipeline.from(ints(100, parts = 2))
      .stage(new Stage[Int, Int] {
        override def batchSize: Int = 10
        override def process(b: Seq[Int]): Seq[Int] = Seq(b.sum)
      })
      .run().collect()
    assert(in.length == 10 && in.sum == (1 to 100).sum)
  }

  test("utils: Retry honors the exception filter (reference retry semantics)") {
    var calls = 0
    intercept[IllegalStateException] {
      Retry.withRetries(5, retryOn = !_.isInstanceOf[IllegalStateException]) {
        calls += 1; throw new IllegalStateException("not retryable")
      }
    }
    assert(calls == 1) // unlisted exception propagated immediately
  }

  test("F4: BATCH mode materializes between stages and preserves results") {
    import spark.implicits._
    val cfg = PipelineConfig(mode = ExecutionMode.Batch)
    val p = Pipeline.from(ints(30), cfg).stage(new AddStage(5, batchSize = 4))
    // barrier already ran (eager count); result must match streaming mode
    assert(p.run().collect().sorted.toSeq == (6 to 35))
  }

  test("F4b: checkpointed batch resumes at the first incomplete stage") {
    import spark.implicits._
    import PipelineSuite.{BoomStage, CountingAdd}
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val cfg = PipelineConfig(mode = ExecutionMode.Batch, checkpointDir = Some(dir))
    def build() = Pipeline.from(ints(20), cfg)
      .stage(new CountingAdd(1)).stage(new BoomStage)
    PipelineSuite.ckptCalls.set(0)
    PipelineSuite.boom.set(true)
    // first run: stage 0 checkpoints durably, stage 1 fails mid-pipeline
    intercept[Exception] { build() }
    val afterFirst = PipelineSuite.ckptCalls.get
    assert(afterFirst == 20, "stage 0 processed every row before the failure")
    assert(new java.io.File(s"$dir/stage-0/_SUCCESS").exists,
      "completed stage left a durable checkpoint")
    assert(!new java.io.File(s"$dir/stage-1/_SUCCESS").exists,
      "failed stage left no completion marker")
    // fix the failure, rerun the SAME pipeline + dir: stage 0 is skipped
    // entirely (its process never runs again), stage 1 resumes from its
    // stored output
    PipelineSuite.boom.set(false)
    assert(build().run().collect().sorted.toSeq == (2 to 21))
    assert(PipelineSuite.ckptCalls.get == afterFirst, "stage 0 was not recomputed")
    // fully-checkpointed rerun: no stage executes at all
    assert(build().run().collect().sorted.toSeq == (2 to 21))
    assert(PipelineSuite.ckptCalls.get == afterFirst)
  }

  test("F-downloads-e: downloadAll — cross-stage dedup, quota accounting, idempotent reuse") {
    import PipelineSuite.MultiDeclStage
    val dir = java.nio.file.Files.createTempDirectory("graft_dlall").toFile
    def mk(name: String, bytes: Int): java.io.File = {
      val f = new java.io.File(dir, name)
      val w = new java.io.FileOutputStream(f)
      w.write(new Array[Byte](bytes)); w.close(); f
    }
    val a = mk("dlall_a.bin", 100)
    val b = mk("dlall_b.bin", 200)
    // two stages share artifact a: the collected set dedups to 2 requests
    val stages: Seq[Stage[_, _]] = Seq(
      new MultiDeclStage(Seq(a.getAbsolutePath)),
      new MultiDeclStage(Seq(a.getAbsolutePath, b.getAbsolutePath)))
    assert(Artifacts.collectRequests(stages).map(_.fileName) ==
      Seq("dlall_a.bin", "dlall_b.bin"))
    val mgr = new ArtifactManager(spark, quotaBytes = 1000)
    assert(Artifacts.downloadAll(spark, stages, Some(mgr)) == 2)
    assert(mgr.usedBytes == 300 && mgr.registeredUris.size == 2)
    // reuse is idempotent under the same quota ledger: a re-prefetch (or
    // a pipeline compile re-resolving the same requests) double-counts
    // nothing and re-adds nothing
    assert(Artifacts.downloadAll(spark, stages, Some(mgr)) == 2)
    assert(mgr.usedBytes == 300 && mgr.registeredUris.size == 2)
    // the artifacts really distributed (readable where workers read them)
    assert(new java.io.File(Artifacts.localPath("dlall_a.bin")).length() == 100)
    // a request already resolved by a PLAIN resolveOnce (no manager) must
    // still enter a later manager's ledger — quota accounting counts every
    // distributed byte, even when the manager arrives after a first compile
    val c = mk("dlall_c.bin", 50)
    Artifacts.resolveOnce(spark, DownloadRequest(c.getAbsolutePath))
    val mgr2 = new ArtifactManager(spark, quotaBytes = 1000)
    assert(Artifacts.downloadAll(spark,
      Seq[Stage[_, _]](new MultiDeclStage(Seq(c.getAbsolutePath))), Some(mgr2)) == 1)
    assert(mgr2.usedBytes == 50 && mgr2.registeredUris.size == 1,
      "pre-resolved artifacts must still be admission-counted by a later quota manager")
    // and the pipeline itself compiles + runs over the prefetched stages
    import spark.implicits._
    val out = Pipeline.from(ints(4, parts = 2))
      .stage(new MultiDeclStage(Seq(a.getAbsolutePath, b.getAbsolutePath)))
      .run().collect().sorted
    assert(out.toSeq == (1 to 4))
  }

  test("F-downloads-d: BackgroundArtifactDownloader — overlap, failure surfaces at wait") {
    import PipelineSuite.MultiDeclStage
    val dir = java.nio.file.Files.createTempDirectory("graft_bgdl").toFile
    val f = new java.io.File(dir, "bg_model.bin")
    java.nio.file.Files.writeString(f.toPath, "weights")
    val dl = new BackgroundArtifactDownloader(spark,
      Seq(new MultiDeclStage(Seq(f.getAbsolutePath))))
    // other driver work proceeds while the download thread runs
    import spark.implicits._
    assert(spark.range(100).as[Long].reduce(_ + _) == 4950L)
    assert(dl.await() == 1)
    assert(dl.isComplete)
    assert(dl.await() == 1, "await is idempotent")
    dl.close()
    assert(new java.io.File(Artifacts.localPath("bg_model.bin")).exists())
    // a missing artifact fails AT THE WAIT, not silently
    val missing = new java.io.File(dir, "nope.bin").getAbsolutePath
    val bad = new BackgroundArtifactDownloader(spark,
      Seq(new MultiDeclStage(Seq(missing))))
    intercept[java.io.FileNotFoundException] { bad.await() }
    // the failed request was NOT marked resolved: creating the file and
    // retrying succeeds (Registration rolls back on failure)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(missing), "late")
    assert(Artifacts.downloadAll(spark,
      Seq(new MultiDeclStage(Seq(missing)))) == 1)
    assert(new java.io.File(Artifacts.localPath("nope.bin")).exists())
  }

  test("F14: Artifacts distributes files to workers") {
    import spark.implicits._
    val f = java.io.File.createTempFile("graft-artifact", ".txt")
    java.nio.file.Files.writeString(f.toPath, "3")
    Artifacts.distributeFile(spark, f.getAbsolutePath)
    val out = Pipeline.from(ints(5, parts = 2))
      .stage(new ArtifactStage(f.getName))
      .run().collect().sorted
    assert(out.toSeq == Seq(3, 6, 9, 12, 15))
  }

  test("F7b: setup hooks receive worker context (partition identity)") {
    import spark.implicits._
    PipelineSuite.ctxPartitions.clear()
    Pipeline.from(ints(20, parts = 4))
      .stage(new Stage[Int, Int] {
        // static object reference: closures are serialized per task, so a
        // captured local would be mutated on a deserialized copy
        override def setup(ctx: WorkerContext): Unit = {
          PipelineSuite.ctxPartitions.add(ctx.partitionId); ()
        }
        override def process(b: Seq[Int]): Seq[Int] = b
      })
      .run().count()
    assert(PipelineSuite.ctxPartitions.size() == 4) // one id per worker
  }

  test("utils: Grouping mirrors the reference batching helpers") {
    assert(Grouping.splitByChunkSize(1 to 10, 3).map(_.toSeq) ==
      Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7, 8, 9), Seq(10)))
    assert(Grouping.splitByChunkSize(1 to 10, 3, dropIncompleteChunk = true).map(_.toSeq) ==
      Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7, 8, 9)))
    assert(Grouping.splitByChunkSize(1 to 9, 3, dropIncompleteChunk = true).size == 3)
    assert(Grouping.splitIntoNChunks(1 to 10, 3).map(_.length) == Seq(4, 3, 3))
    assert(Grouping.splitIntoNChunks(1 to 10, 3).flatten == (1 to 10))
    // fewer elements than chunks: one singleton per element, never empties
    assert(Grouping.splitIntoNChunks(Seq(1, 2), 5) == Seq(Seq(1), Seq(2)))
    assert(Grouping.pairwise(Seq(1, 2, 3)) == Seq((1, 2), (2, 3)))
    assert(Grouping.dictZip(Map("a" -> 1), Map("a" -> "x")) == Map("a" -> (1, "x")))
    var calls = 0
    val r = Retry.withRetries(3) { calls += 1; if (calls < 3) throw new RuntimeException; 42 }
    assert(r == 42 && calls == 3)
  }

  test("utils: Approx mirrors the reference float comparisons") {
    assert(Approx.floatEq(1.0, 1.0 + 1e-7))
    assert(!Approx.floatEq(1.0, 1.0 + 1e-5))
    assert(Approx.floatGt(1.0 + 1e-5, 1.0) && !Approx.floatGt(1.0 + 1e-7, 1.0))
    assert(Approx.floatLt(1.0, 1.0 + 1e-5) && !Approx.floatLt(1.0, 1.0 + 1e-7))
    assert(Approx.floatGte(1.0 + 1e-7, 1.0) && Approx.floatLte(1.0, 1.0 + 1e-7))
    assert(Approx.isAlmostWhole(2.9999999) && !Approx.isAlmostWhole(2.5))
  }

  test("F15: PipelineMonitor reports per-stage rows/batches") {
    import spark.implicits._
    val mon = new PipelineMonitor(spark)
    val out = Pipeline.from(ints(100), monitor = Some(mon))
      .stage(new AddStage(1))
      .stage(new EvenFilterStage)
      .run()
    out.count()
    val snap = mon.snapshot
    val s0 = snap.keys.find(_.contains("AddStage")).get
    val s1 = snap.keys.find(_.contains("EvenFilterStage")).get
    assert(snap(s0)._1 == 100 && snap(s0)._2 == 100)
    assert(snap(s1)._1 == 100 && snap(s1)._2 == 50) // filter halves
    assert(snap(s0)._3 > 0)                         // batches counted
    assert(mon.report.nonEmpty)
  }

  test("F15e: JobInfo tags monitor rollups (reference specs.py JobInfo parity)") {
    import spark.implicits._
    // untagged monitor: no tags, no job line
    val bare = new PipelineMonitor(spark)
    assert(bare.tags.isEmpty)
    assert(!bare.render(Verbosity.Info).contains("job:"))
    bare.detach()
    // tagged via PipelineConfig: Pipeline.from hands the identity to the
    // monitor, so rollups are attributable across pipelines
    val mon = new PipelineMonitor(spark)
    val ji = JobInfo("curation", "v12", "batch")
    Pipeline.from(ints(10), config = PipelineConfig(jobInfo = Some(ji)),
        monitor = Some(mon))
      .stage(new AddStage(1))
      .run().count()
    assert(mon.tags == Map("pipeline_type" -> "curation",
      "pipeline_version" -> "v12", "pipeline_mode" -> "batch"))
    val rendered = mon.render(Verbosity.Info)
    assert(rendered.startsWith("job: type=curation version=v12 mode=batch"),
      rendered.linesIterator.take(1).mkString)
    assert(mon.render(Verbosity.Debug).contains("job: type=curation"))
    // constructor attachment works too; a later pipeline's identity wins
    val mon2 = new PipelineMonitor(spark, Some(JobInfo("a", "1", "m")))
    assert(mon2.tags("pipeline_type") == "a")
    Pipeline.from(ints(5), config = PipelineConfig(
        jobInfo = Some(JobInfo("b", "2", "m"))), monitor = Some(mon2))
      .stage(new AddStage(1)).run().count()
    assert(mon2.tags("pipeline_type") == "b", "latest pipeline identity wins")
    mon.detach(); mon2.detach()
  }

  test("F15b: monitor exposes per-worker stats and utilization") {
    import spark.implicits._
    val mon = new PipelineMonitor(spark)
    Pipeline.from(ints(100, parts = 5), monitor = Some(mon))
      .stage(new AddStage(1))
      .run().count()
    val (stage, workers) = mon.workerSnapshot.find(_._1.contains("AddStage")).get
    assert(workers.size == 5, "one worker entry per task/partition")
    assert(workers.values.map(_.rowsIn).sum == 100)
    assert(workers.values.map(_.rowsOut).sum == 100)
    assert(workers.values.forall(w => w.wallNanos > 0 && w.processNanos >= 0))
    val util = mon.utilization(stage)
    assert(util >= 0.0 && util <= 1.0, s"utilization must be a busy-fraction, got $util")
    assert(mon.report.contains("workers=5"))
  }

  test("F15d: executor resource gauges roll TaskMetrics into the monitor (resource_monitor parity)") {
    import spark.implicits._
    val mon = new PipelineMonitor(spark)
    try {
      // a pipeline leg feeds the stage stats; a shuffle+agg leg guarantees
      // a non-zero peak execution memory (memory-consumer high-water mark)
      Pipeline.from(ints(1000, parts = 4), monitor = Some(mon))
        .stage(new AddStage(1))
        .run().count()
      spark.range(200000).groupBy((org.apache.spark.sql.functions.col("id") % 512).as("k"))
        .count().write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.graftbridge.Bridge.waitForListeners(spark.sparkContext)
      val gauges = mon.resourceSnapshot
      assert(gauges.nonEmpty, "at least one executor gauge after a run")
      val total = gauges.values.reduce(_ + _)
      assert(total.tasks > 0)
      assert(total.cpuNanos > 0, "CPU time must accumulate")
      assert(total.runMillis >= 0 && total.gcMillis >= 0)
      assert(total.peakMemoryBytes > 0,
        "the shuffle/agg leg must register peak execution memory")
      // the Debug render carries the gauge table
      val dbg = mon.render(Verbosity.Debug)
      assert(dbg.contains("executor gauges:") && dbg.contains("cpu_ms="), dbg)
      assert(mon.render(Verbosity.Info).contains("stage"),
        "Info render unchanged by the gauge section")
      assert(!mon.render(Verbosity.Info).contains("executor gauges:"))
    } finally mon.detach()
    // after detach the listener stops rolling: run another job, gauges frozen
    val frozenTasks = mon.resourceSnapshot.values.map(_.tasks).sum
    spark.range(10000).selectExpr("sum(id)").collect()
    org.apache.spark.sql.graftbridge.Bridge.waitForListeners(spark.sparkContext)
    assert(mon.resourceSnapshot.values.map(_.tasks).sum == frozenTasks)
  }

  test("reference parity: fan-out into an oversized batch stage cannot hang (test_batch_size_hang)") {
    import spark.implicits._
    // the reference shape: batch-1 stage fans each sample out 2000x, then
    // a batch-2000 stage consumes; a pull-based chain must stream through
    val out = Pipeline.from(ints(4, parts = 2))
      .stage(new Stage[Int, Int] {
        override def batchSize: Int = 1
        override def process(b: Seq[Int]): Seq[Int] = Seq.fill(2000)(b.head)
      })
      .stage(new Stage[Int, Int] {
        override def batchSize: Int = 2000
        override def process(b: Seq[Int]): Seq[Int] = b
      })
      .stage(new Stage[Int, Int] {
        override def batchSize: Int = 1
        override def process(b: Seq[Int]): Seq[Int] = b
      })
      .run()
    assert(out.count() == 4L * 2000)
  }

  test("reference parity: complex multi-stage pipeline (test_complex_pipeline shape)") {
    import spark.implicits._
    val mon = new PipelineMonitor(spark)
    // 5 stages, mixed batch sizes, filtering, fan-out, an ignored-failure
    // stage, and monitoring — the reference's end-to-end smoke shape
    val out = Pipeline.from(ints(200, parts = 8),
        PipelineConfig(ignoreFailures = true), Some(mon))
      .stage(new Stage[Int, Int] {               // x2 map, small batches
        override def batchSize: Int = 3
        override def process(b: Seq[Int]): Seq[Int] = b.map(_ * 2)
      })
      .stage(new Stage[Int, Int] {               // drop odd (none here) + fan-out x3
        override def batchSize: Int = 16
        override def process(b: Seq[Int]): Seq[Int] = b.flatMap(x => Seq(x, x, x))
      })
      .stage(new Stage[Int, Int] {               // a poisoned batch is dropped, not fatal
        override def batchSize: Int = 50
        override def process(b: Seq[Int]): Seq[Int] =
          if (b.contains(42)) throw new RuntimeException("poison") else b
      })
      .stage(new Stage[Int, String] {            // type change
        override def batchSize: Int = 7
        override def process(b: Seq[Int]): Seq[String] = b.map(x => s"v$x")
      })
      .run().collect()
    // 200 inputs ->x3 = 600, minus the dropped poisoned batches (those
    // containing 42 = 2*21, tripled): every surviving row is well-formed
    assert(out.nonEmpty && out.length < 600)
    assert(out.forall(_.startsWith("v")))
    assert(out.count(_ == "v42") == 0, "poisoned batches were dropped")
    val snap = mon.snapshot
    assert(snap.size == 4, "all four stages monitored")
    assert(snap.values.map(_._4).sum > 0, "the failure was counted")
  }

  test("F15c: render verbosity levels; rate-limited console reporter") {
    import spark.implicits._
    val mon = new PipelineMonitor(spark)
    Pipeline.from(ints(60, parts = 3), monitor = Some(mon))
      .stage(new AddStage(1)).run().count()
    assert(mon.render(Verbosity.None).isEmpty)
    val info = mon.render(Verbosity.Info)
    assert(info.linesIterator.next().startsWith("stage"), "Info has a header row")
    assert(info.contains("AddStage") && info.contains("60"))
    assert(!info.contains("workers:"), "Info has no per-worker section")
    val debug = mon.render(Verbosity.Debug)
    assert(debug.contains("workers:") && debug.contains("util="),
      "Debug adds the per-worker sub-table")
    // reporter: injectable clock, rate-limited like the reference loop
    var clock = 0.0
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val rep = mon.reporter(Verbosity.Info, freqHz = 1.0, sink = out += _, clock = () => clock)
    assert(rep.maybeReport());  assert(!rep.maybeReport()) // within the period
    clock = 1.5
    assert(rep.maybeReport())
    assert(out.size == 2 && out.forall(_.contains("AddStage")))
    val silent = mon.reporter(Verbosity.None, freqHz = 100.0, sink = out += _)
    assert(!silent.maybeReport() && out.size == 2, "NONE renders nothing")
  }

  test("F14b: ArtifactManager — cache reuse and disk quota admission") {
    val dir = java.nio.file.Files.createTempDirectory("graft_quota").toFile
    def mk(name: String, bytes: Int): java.io.File = {
      val f = new java.io.File(dir, name)
      val w = new java.io.FileOutputStream(f)
      w.write(new Array[Byte](bytes)); w.close(); f
    }
    val a = mk("model_a.bin", 600)
    val b = mk("model_b.bin", 300)
    val c = mk("model_c.bin", 200)
    val mgr = new ArtifactManager(spark, quotaBytes = 1000)
    mgr.distribute(DownloadRequest(a.getAbsolutePath))
    assert(mgr.usedBytes == 600)
    // cache reuse: same uri again is a no-op, not a double-count
    mgr.distribute(DownloadRequest(a.getAbsolutePath))
    assert(mgr.usedBytes == 600 && mgr.registeredUris.size == 1)
    mgr.distribute(DownloadRequest(b.getAbsolutePath))
    assert(mgr.usedBytes == 900)
    // quota admission: fails fast on the driver with the usage breakdown
    val ex = intercept[IllegalStateException](mgr.distribute(DownloadRequest(c.getAbsolutePath)))
    assert(ex.getMessage.contains("quota exceeded") && ex.getMessage.contains("model_a.bin"))
    assert(mgr.usedBytes == 900, "rejected artifact is not counted")
    // and the admitted artifacts really are distributed (readable by workers)
    assert(new java.io.File(Artifacts.localPath("model_a.bin")).length() == 600)
  }

  test("F14c: EvictableArtifactCache — LRU eviction under quota, delete + re-register") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evict").toFile
    def mk(name: String, bytes: Int, fill: Byte): java.io.File = {
      val f = new java.io.File(dir, name)
      val w = new java.io.FileOutputStream(f)
      w.write(Array.fill(bytes)(fill)); w.close(); f
    }
    val a = mk("rot_a.bin", 500, 'A')
    val b = mk("rot_b.bin", 300, 'B')
    val c = mk("rot_c.bin", 300, 'C')
    val cache = new EvictableArtifactCache(spark, quotaBytes = 1000)
    val ha = cache.register(a.getAbsolutePath)
    val hb = cache.register(b.getAbsolutePath)
    assert(cache.usedBytes == 800)
    // executors materialize lazily inside tasks and read real bytes
    val read = spark.sparkContext.parallelize(1 to 4, 4).map { _ =>
      val f = new java.io.File(ha.localFile)
      (f.length(), scala.io.Source.fromFile(f).mkString.head)
    }.collect()
    assert(read.forall(_ == (500L, 'A')))
    val bFile = new java.io.File(hb.localFile) // materialize b too (driver JVM)
    assert(bFile.length() == 300)
    // touch a so b is the LRU entry, then register c: 800+300 > 1000 →
    // exactly b is evicted (not a, which was used more recently)
    cache.register(a.getAbsolutePath)
    cache.register(c.getAbsolutePath)
    assert(cache.registeredUris == Seq(a, c).map(_.getAbsolutePath).sorted)
    assert(cache.usedBytes == 800 && cache.evictionCount == 1)
    // eviction reclaimed the data plane: the materialized cache file is
    // deleted (local mode: the cleanup job runs in this JVM), and the
    // evicted handle fails loud instead of serving stale bytes
    assert(!bFile.exists(), "evicted artifact's cache file must be deleted")
    intercept[Exception](hb.localFile)
    // delete + re-register: new content lands under a NEW content-
    // addressed name — never the stale copy
    mk("rot_b.bin", 400, 'Z')
    cache.register(a.getAbsolutePath) // touch: c is now the LRU entry
    val hb2 = cache.register(b.getAbsolutePath)
    assert(hb2.name != hb.name)
    val f2 = new java.io.File(hb2.localFile)
    assert(f2.length() == 400 && scala.io.Source.fromFile(f2).mkString.head == 'Z')
    assert(cache.evictionCount == 2, "a(500)+c(300)+b(400) > 1000 evicts LRU c")
    assert(!cache.registeredUris.contains(c.getAbsolutePath))
    // acquire touches LRU order and fails loud on a miss
    assert(cache.acquire(a.getAbsolutePath).name == ha.name)
    intercept[NoSuchElementException](cache.acquire("/nope/missing.bin"))
    // a single artifact over the whole quota can never be admitted
    val huge = mk("rot_huge.bin", 2000, 'H')
    val ex = intercept[IllegalStateException](cache.register(huge.getAbsolutePath))
    assert(ex.getMessage.contains("quota"))
    // explicit rotation
    assert(cache.evict(a.getAbsolutePath) && !cache.evict(a.getAbsolutePath))
    // in-place source replacement rotates on register (length+mtime stat
    // check) — no explicit evict needed, stale weights can't survive
    mk("rot_b.bin", 410, 'Y')
    val hb3 = cache.register(b.getAbsolutePath)
    assert(hb3.name != hb2.name, "changed content must mint a new handle")
    val f3 = new java.io.File(hb3.localFile)
    assert(f3.length() == 410 && scala.io.Source.fromFile(f3).mkString.head == 'Y')
    assert(cache.usedBytes == 410)
  }

  test("F14e: EvictableArtifactCache — concurrent registers don't serialize on the cache monitor") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evict_conc").toFile
    def mk(name: String, bytes: Int, fill: Byte): String = {
      val f = new java.io.File(dir, name)
      val w = new java.io.FileOutputStream(f)
      w.write(Array.fill(bytes)(fill)); w.close(); f.getAbsolutePath
    }
    val uris = (0 until 6).map(i => mk(s"conc_$i.bin", 100 + 10 * i, ('a' + i).toByte))
    val cache = new EvictableArtifactCache(spark, quotaBytes = 100000)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    try {
      // 12 threads × 30 ops over 6 uris: registers racing registers of
      // the same AND other uris, plus acquires — must neither deadlock
      // nor double-broadcast (same-uri races serialize on the per-uri
      // lock, so every thread sees the same handle per content version)
      val tasks = (0 until 12).map { t =>
        pool.submit(new java.util.concurrent.Callable[Seq[(String, String)]] {
          def call(): Seq[(String, String)] = (0 until 30).map { k =>
            val uri = uris((t + k) % uris.length)
            val h = if (k % 3 == 2) { cache.register(uri); cache.acquire(uri) }
                    else cache.register(uri)
            uri -> h.name
          }
        })
      }
      val seen = tasks.flatMap(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      // unchanged sources: exactly ONE handle name per uri across all
      // threads — the in-flight guard collapsed concurrent loads
      uris.foreach(u => assert(seen(u).size == 1, s"$u: ${seen(u)}"))
      assert(cache.registeredUris.toSet == uris.toSet)
      assert(cache.usedBytes == uris.zipWithIndex.map { case (_, i) => 100 + 10 * i }.sum)
      assert(cache.evictionCount == 0)
    } finally pool.shutdownNow()
  }

  test("F14d: EvictableArtifactCache invariants hold under randomized op sequences") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evict_prop").toFile
    def write(name: String, bytes: Int, fill: Byte): java.io.File = {
      val f = new java.io.File(dir, name)
      val w = new java.io.FileOutputStream(f)
      w.write(Array.fill(bytes)(fill)); w.close(); f
    }
    val quota = 1000L
    val cache = new EvictableArtifactCache(spark, quota)
    val rnd = new scala.util.Random(1234)
    val uris = (0 until 8).map { i =>
      write(s"prop_$i.bin", 50 + rnd.nextInt(350), ('a' + i).toByte).getAbsolutePath
    }
    val live = scala.collection.mutable.Map.empty[String, ArtifactHandle]
    var lastEvictions = 0L
    for (step <- 0 until 60) {
      rnd.nextInt(10) match {
        case n if n < 6 => // register (hit or miss or rotation)
          val uri = uris(rnd.nextInt(uris.length))
          val h = cache.register(uri)
          live(uri) = h
        case n if n < 8 => // in-place content change, then register → rotation
          val i = rnd.nextInt(uris.length)
          write(s"prop_$i.bin", 50 + rnd.nextInt(350), ('A' + rnd.nextInt(20)).toByte)
          val h = cache.register(uris(i))
          live(uris(i)) = h
        case _ => // explicit evict
          val uri = uris(rnd.nextInt(uris.length))
          cache.evict(uri)
          live.remove(uri)
      }
      // invariants after EVERY op
      assert(cache.usedBytes <= quota, s"step $step: quota breached: ${cache.usedBytes}")
      assert(cache.evictionCount >= lastEvictions, "eviction count must be monotone")
      lastEvictions = cache.evictionCount
      val reg = cache.registeredUris.toSet
      assert(reg.subsetOf(uris.toSet))
      // every registered uri still serves real bytes; acquire agrees with
      // the last register's handle unless an eviction replaced it
      reg.foreach { uri =>
        val h = cache.acquire(uri)
        assert(new java.io.File(h.localFile).length() > 0)
      }
    }
    assert(cache.evictionCount > 0, "the sequence must have exercised eviction")
  }

  test("F31 doc-test: every StreamingSpecificSpec knob has a named mapping " +
      "in the README migration table and SURVEY F12/F13a") {
    // the reference's streaming-mode spec (pipelines/private/specs.py:376,
    // exported in v1/__init__.py) — its knobs map onto Spark scheduler
    // conf, not library surface; this pins that the mapping is WRITTEN
    // DOWN, knob by knob, so the claim "every v1 export is mapped" stays
    // literally true
    val knobs = Seq(
      "autoscale_interval_s",
      "autoscale_speed_estimation",
      "max_queued_multiplier",
      "max_queued_lower_bound",
      "verbosity_level",
      "enable_backlog_aware_scaledown",
      "scale_down_grace_after_ready_s")
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    knobs.foreach { k =>
      assert(readme.contains(k), s"README migration table must name $k")
      assert(survey.contains(k), s"SURVEY F12/F13a must name $k")
    }
    assert(readme.contains("StreamingSpecificSpec") &&
      survey.contains("StreamingSpecificSpec"))
  }

  test("F3: streaming-mode chain is narrow (no shuffle between stages)") {
    import spark.implicits._
    val ds = spark.createDataset(1 to 10) // no repartition: plan stays narrow
    val out = Pipeline.from(ds)
      .stage(new AddStage(1)).stage(new AddStage(2)).stage(new AddStage(3))
      .run()
    // three chained mapPartitions keep the input partitioning: narrow
    assert(out.rdd.getNumPartitions == ds.rdd.getNumPartitions)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
