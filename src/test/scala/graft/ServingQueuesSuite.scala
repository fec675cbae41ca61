package graft

import graft.api.Stage
import graft.streaming.{ServingHub, ServingPipeline}

/** Serving-queue surface (reference: specs.py:512 ServingQueues +
  * v1/test_serving.py): named input/output queues, multiple routes per
  * hub, burst handling, pipeline stays alive between requests.
  */
object ServingQueuesSuite {
  final case class Num(x: Int)
  final case class Txt(id: Long, s: String)
  final case class TxtOut(id: Long, s: String, len: Int)

  /** The reference test's stage: doubles every element. */
  final class DoubleStage extends Stage[Num, Num] {
    override def batchSize: Int = 4
    override def process(b: Seq[Num]): Seq[Num] = b.map(n => Num(n.x * 2))
  }
}

class ServingQueuesSuite extends SparkSpec {
  import ServingQueuesSuite._

  test("serving queues: two named routes through one hub, per-queue outputs") {
    import spark.implicits._
    val hub = new ServingHub(spark)
    try {
      // route 1 mirrors test_serving.py: three x2 stages -> x8
      val nums = hub.openInput[Num]("nums_in")
      hub.route("nums_out", ServingPipeline.compile(nums.stream)
        .stage(new DoubleStage).stage(new DoubleStage).stage(new DoubleStage).run())
      // route 2: an unrelated chain over a second named queue, same hub
      val txts = hub.openInput[Txt]("txts_in")
      hub.route("txts_out", ServingPipeline.compile(txts.stream)
        .stage(new Stage[Txt, TxtOut] {
          override def process(b: Seq[Txt]): Seq[TxtOut] =
            b.map(t => TxtOut(t.id, t.s.toUpperCase, t.s.length))
        }).run())
      assert(hub.activeRoutes == Seq("nums_out", "txts_out"))

      // single request
      nums.put(Num(1))
      txts.put(Txt(10, "graft"))
      hub.processAllAvailable()
      assert(spark.table("nums_out").as[Num].collect().toSeq == Seq(Num(8)))
      assert(hub.output("txts_out").as[TxtOut].collect().toSeq ==
        Seq(TxtOut(10, "GRAFT", 5)))

      // bursty requests: all served, each on its own queue, no cross-talk
      nums.put((0 until 10).map(Num(_)): _*)
      txts.put((0L until 5L).map(i => Txt(i, s"t$i")): _*)
      hub.processAllAvailable()
      val numsGot = spark.table("nums_out").as[Num].collect().map(_.x).sorted.toSeq
      assert(numsGot == ((0 until 10).map(_ * 8) :+ 8).sorted)
      assert(hub.output("txts_out").count() == 6)

      // the pipeline is still running (reference: thread.is_alive)
      assert(hub.isActive)
    } finally hub.stop()
    assert(!hub.isActive)
  }

  test("serving queues: route rejects batch Datasets and duplicate names") {
    import spark.implicits._
    val hub = new ServingHub(spark)
    try {
      val in = hub.openInput[Num]("dup_in")
      hub.route("dup_out", ServingPipeline.compile(in.stream).stage(new DoubleStage).run())
      intercept[IllegalArgumentException] {
        hub.route("dup_out", ServingPipeline.compile(in.stream).stage(new DoubleStage).run())
      }
      intercept[IllegalArgumentException] {
        hub.route("batch_out", Seq(Num(1)).toDS())
      }
      intercept[IllegalArgumentException](hub.output("never_routed"))
    } finally hub.stop()
  }
}
