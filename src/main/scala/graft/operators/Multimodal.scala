package graft.operators

import graft.api.{Resources, Stage}

/** Multimodal batch plumbing (SURVEY.md §2c M2): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / resize /
  * frame-sample run as batched stages over those bytes.
  *
  * The container ships no media codecs, so `FakeCodec.decode` is a STUB: a
  * deterministic fake that derives dimensions and "pixels" from the payload
  * bytes alone (marked clearly below; swap in a real JNI/FFmpeg decoder by
  * replacing that one function). Everything Spark-side — schema, batching,
  * partition flow, stage composition — is real and spec-tested.
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class DecodedFrame(id: Long, width: Int, height: Int, pixels: Array[Byte])
  final case class ResizedFrame(id: Long, width: Int, height: Int, pixels: Array[Byte])
  final case class FrameSample(id: Long, frameIdx: Int, digest: Long)

  /** STUB decoder — deterministic fake standing in for a real image codec.
    * Width/height derive from a byte-sum hash; "pixels" are the payload
    * bytes tiled to width*height. Deterministic → spec-testable.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      var h = 0L
      payload.foreach(b => h = h * 131 + (b & 0xff))
      val w = 8 + Math.floorMod(h, 25L).toInt         // 8..32
      val ht = 8 + Math.floorMod(h >> 8, 25L).toInt   // 8..32
      val px = Array.tabulate(w * ht)(i =>
        if (payload.isEmpty) 0.toByte else payload(i % payload.length))
      (w, ht, px)
    }
  }

  /** Batched GPU-shaped decode stage (a real decoder would want the batch
    * to amortize codec state; `resources` advertises the GPU shape).
    */
  final class DecodeStage(override val batchSize: Int = 8)
      extends Stage[MediaRow, DecodedFrame] {
    override def resources: Resources = Resources(cpus = 1.0, gpus = 0.25)
    override def process(batch: Seq[MediaRow]): Seq[DecodedFrame] =
      batch.map { m =>
        val (w, h, px) = FakeCodec.decode(m.payload)
        DecodedFrame(m.id, w, h, px)
      }
  }

  /** Nearest-neighbor resize to a fixed target — pure byte math, real. */
  final class ResizeStage(targetW: Int, targetH: Int, override val batchSize: Int = 32)
      extends Stage[DecodedFrame, ResizedFrame] {
    override def process(batch: Seq[DecodedFrame]): Seq[ResizedFrame] =
      batch.map { f =>
        val px = Array.tabulate(targetW * targetH) { i =>
          val (ty, tx) = (i / targetW, i % targetW)
          val sy = math.min(f.height - 1, ty * f.height / targetH)
          val sx = math.min(f.width - 1, tx * f.width / targetW)
          f.pixels(sy * f.width + sx)
        }
        ResizedFrame(f.id, targetW, targetH, px)
      }
  }

  /** Sample every k-th "frame" (row stripe) and fingerprint it — the
    * video-frame-sampling analogue over the fake pixel planes.
    */
  final class FrameSampleStage(every: Int, override val batchSize: Int = 32)
      extends Stage[ResizedFrame, FrameSample] {
    override def process(batch: Seq[ResizedFrame]): Seq[FrameSample] =
      batch.flatMap { f =>
        (0 until f.height by every).map { row =>
          var d = 0L
          var x = 0
          while (x < f.width) { d = d * 131 + (f.pixels(row * f.width + x) & 0xff); x += 1 }
          FrameSample(f.id, row, d)
        }
      }
  }
}
