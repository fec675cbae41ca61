package graft

import graft.api.{Pipeline, Resources, Stage, StageSpec, WorkerContext}

/** SPMD gang-scheduled stages (reference: Resources(is_spmd=True),
  * resources.py:423 + smoke_test_multi_node_spmd.py) mapped to Spark
  * barrier execution. `allGather`/`barrier` THROW outside barrier mode,
  * so these passing proves the stage really ran gang-scheduled.
  */
object SpmdSuite {
  final case class In(x: Int)
  final case class Out(rank: Int, world: Int, master: String, gathered: Seq[String], x: Int)

  /** The smoke test's shape: setup() does the torchrun-style rendezvous —
    * learns rank/world/master, exchanges a per-worker string with every
    * peer (the NCCL-id analogue), then syncs before processing.
    */
  final class GangStage extends Stage[In, Out] {
    override def resources: Resources = Resources(cpus = 1.0, isSpmd = true)
    private var rank = -1
    private var world = -1
    private var master = ""
    private var gathered: Seq[String] = Nil
    override def setup(ctx: WorkerContext): Unit = {
      val s = ctx.spmd.getOrElse(sys.error("SPMD stage did not receive SpmdContext"))
      rank = s.rank
      world = s.worldSize
      master = s.peerAddresses.head
      gathered = s.gather(s"rank-${s.rank}")
      s.sync()
    }
    override def process(b: Seq[In]): Seq[Out] =
      b.map(i => Out(rank, world, master, gathered, i.x))
  }
}

class SpmdSuite extends SparkSpec {
  import SpmdSuite._

  test("F-SPMD: isSpmd stage runs as a barrier gang with rank/world/allGather") {
    import spark.implicits._
    val in = spark.createDataset((0 until 40).map(In(_)))
    val out = Pipeline.from(in)
      .stage(StageSpec(new GangStage, numWorkers = Some(4))) // numWorkers = world size
      .run().collect()
    assert(out.length == 40, "all rows processed")
    assert(out.map(_.world).distinct.toSeq == Seq(4), "every worker saw world_size = 4")
    assert(out.map(_.rank).distinct.sorted.toSeq == Seq(0, 1, 2, 3), "ranks are 0..world-1")
    // allGather: every worker received every rank's message, in rank order
    out.foreach(o => assert(o.gathered == (0 until 4).map(r => s"rank-$r")))
    // one shared rendezvous master (peerAddresses.head agrees everywhere)
    assert(out.map(_.master).distinct.length == 1)
  }

  test("F-SPMD: per-worker setup retries and worker resets are rejected (gang-desync guard)") {
    import spark.implicits._
    val in = spark.createDataset(Seq(In(1)))
    val retry = intercept[IllegalArgumentException] {
      Pipeline.from(in).stage(StageSpec(new GangStage, numSetupAttempts = Some(2))).run()
    }
    assert(retry.getMessage.contains("desynchronizes"))
    val reset = intercept[IllegalArgumentException] {
      Pipeline.from(in, graft.api.PipelineConfig(
          ignoreFailures = true, resetWorkersOnFailure = true))
        .stage(new GangStage).run()
    }
    assert(reset.getMessage.contains("desynchronizes"))
  }

  test("F-SPMD: streaming input is rejected (barrier mode is batch-only)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[In]
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.ServingPipeline.compile(source.toDS()).stage(new GangStage).run()
    }
    assert(ex.getMessage.contains("bounded"))
  }
}
