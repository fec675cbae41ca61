package graft

import org.apache.spark.sql.functions._

import graft.api.Pipeline
import graft.operators.Multimodal._

/** M2: multimodal decode/resize/frame-sample plumbing over binary columns
  * (deterministic stubbed codec; the Spark-side flow is real).
  */
class MultimodalSuite extends SparkSpec {

  test("M2: decode -> resize -> frame-sample pipeline over binary payloads") {
    import spark.implicits._
    val media = Tables()
    val out = Pipeline.from(media)
      .stage(new DecodeStage(batchSize = 8))
      .stage(new ResizeStage(16, 16))
      .stage(new FrameSampleStage(every = 4))
      .run()
    val rows = out.collect()
    // every doc yields ceil(16/4) = 4 sampled frames
    assert(rows.length == media.count() * 4)
    assert(rows.map(_.frameIdx).distinct.sorted.toSeq == Seq(0, 4, 8, 12))
    // deterministic: same inputs -> same digests
    val again = Pipeline.from(media)
      .stage(new DecodeStage()).stage(new ResizeStage(16, 16))
      .stage(new FrameSampleStage(every = 4)).run().collect()
    assert(rows.map(r => (r.id, r.frameIdx, r.digest)).sortBy(x => (x._1, x._2)).toSeq ==
      again.map(r => (r.id, r.frameIdx, r.digest)).sortBy(x => (x._1, x._2)).toSeq)
  }

  test("M2: decoded dimensions derive deterministically from payload bytes") {
    import spark.implicits._
    val media = Tables()
    val decoded = Pipeline.from(media).stage(new DecodeStage()).run().collect()
    decoded.foreach { f =>
      assert(f.width >= 8 && f.width <= 32 && f.height >= 8 && f.height <= 32)
      assert(f.pixels.length == f.width * f.height)
    }
  }

  private def Tables() = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
