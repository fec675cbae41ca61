package graft

import org.apache.spark.sql.functions._

import graft.api.{Pipeline, PipelineMonitor, Resources, Stage, WorkerContext}
import graft.operators.Multimodal._

/** Parity with the reference's shipped example
  * (examples/simple_vlm_inference.py): a download → decode → VLM-caption
  * pipeline. The transport and the model are deterministic stand-ins
  * (this container has no network or model weights — exactly the two
  * swap points the example parameterizes); the pipeline structure,
  * batching, GPU-shaped resources, per-worker model setup, REAL JPEG
  * decode, and monitoring are the real thing.
  */
object VlmExampleSuite {
  final case class Caption(id: Long, caption: String)

  /** The example's _DownloadStage: batch-1 fetch by URL. Transport is a
    * broadcast url→bytes map standing in for `requests.get`.
    */
  final class DownloadStage(images: Map[String, Array[Byte]])
      extends Stage[(Long, String), MediaRow] {
    override def batchSize: Int = 1
    override def resources: Resources = Resources(cpus = 1.0)
    override def process(b: Seq[(Long, String)]): Seq[MediaRow] =
      b.map { case (id, url) => MediaRow(id, images(url)) }
  }

  /** The example's _ModelStage: GPU-shaped, loads the model once per
    * worker in setup(), captions in batches. The "model" is a
    * deterministic luma summarizer — swap for a real engine in setup().
    */
  final class CaptionStage extends Stage[DecodedFrame, Caption] {
    override def batchSize: Int = 4 // the example's BATCH_SIZE
    override def resources: Resources = Resources(cpus = 1.0, gpus = 1.0)
    @transient private var model: (Int, Int, Array[Byte]) => String = null
    override def setup(ctx: WorkerContext): Unit = {
      // a real pipeline loads weights here (via Stage.downloadRequests)
      // and pins to ctx.gpuAddresses; the stub stays deterministic
      model = (w, h, px) => {
        val mean = if (px.isEmpty) 0 else px.foldLeft(0L)((a, b) => a + (b & 0xff)) / px.length
        s"image ${w}x$h mean-luma $mean"
      }
    }
    override def process(b: Seq[DecodedFrame]): Seq[Caption] =
      b.map(f => Caption(f.id, model(f.width, f.height, f.pixels)))
  }
}

class VlmExampleSuite extends SparkSpec {
  import VlmExampleSuite._

  test("example parity: download -> real JPEG decode -> batched captioning") {
    import spark.implicits._
    // real JPEG payloads, one solid-gray per "url" (level = 40*i)
    def jpeg(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(level, level, level)); g.fillRect(0, 0, 32, 24); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val urls = (1 to 6).map(i => s"https://example.test/img$i.jpg")
    val images = urls.zipWithIndex.map { case (u, i) => u -> jpeg(40 * i + 40) }.toMap
    val mon = new PipelineMonitor(spark)
    val captions = Pipeline.from(
        spark.createDataset(urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }),
        monitor = Some(mon))
      .stage(new DownloadStage(images))
      .stage(new DecodeStage(batchSize = 4)) // REAL ImageIO JPEG decode
      .stage(new CaptionStage)
      .run().collect().sortBy(_.id)
    assert(captions.length == 6)
    captions.foreach { c =>
      // solid JPEG round-trips near-exactly: mean luma within codec error
      val expected = 40 * c.id + 40
      val got = "mean-luma (\\d+)".r.findFirstMatchIn(c.caption).get.group(1).toInt
      assert(c.caption.startsWith("image 32x24"), c.caption)
      assert(math.abs(got - expected) <= 3, s"caption $c vs expected level $expected")
    }
    // all three stages monitored, with the fan-in/fan-out bookkeeping
    val snap = mon.snapshot
    assert(snap.size == 3 && snap.values.forall(_._1 == 6))
  }
}
