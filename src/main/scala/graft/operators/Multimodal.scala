package graft.operators

import graft.api.{Resources, Stage}

/** Multimodal batch plumbing (SURVEY.md §2c M2): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / resize /
  * frame-sample / audio-feature extraction run as batched stages over
  * those bytes.
  *
  * Decoding is REAL for every format the JVM can open without external
  * libraries: PPM (P6) and WAV (PCM16) are pure byte arithmetic, and
  * JPEG / PNG (plus GIF/BMP) decode through the JDK's built-in
  * `javax.imageio` codecs. [[DecodeStage]] sniffs the payload magic to
  * route to the right decoder. Only codecs genuinely absent from the
  * JDK (MP3/H.264) fall back to `FakeCodec`: a clearly-marked
  * deterministic stand-in. The verified production swap is
  * [[ExternalDecoderStage]] — an ffmpeg-shaped subprocess decoder with
  * binary distribution, probed per-worker setup, bounded output and
  * the corrupt-stream failure path spec-tested against a stub binary;
  * route MP3/H.264 payloads through it and parse its PCM/PPM output
  * with the walkers here. Everything Spark-side — schema, batching,
  * partition flow, stage composition — is real and spec-tested.
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class DecodedFrame(id: Long, width: Int, height: Int, pixels: Array[Byte])
  final case class ResizedFrame(id: Long, width: Int, height: Int, pixels: Array[Byte])
  final case class FrameSample(id: Long, frameIdx: Int, digest: Long)
  final case class AudioClip(id: Long, sampleRate: Int, channels: Int, samples: Array[Short])
  final case class AudioFeatures(id: Long, durationMs: Long, rms: Double, zeroCrossRate: Double)

  /** Real decoders for formats that are pure byte arithmetic. */
  object Codecs {

    /** Binary PPM (P6): "P6 <w> <h> <maxval>" header (whitespace/comment
      * separated) followed by raw RGB triplets. Returns (w, h, luma):
      * pixels are converted to 8-bit luma (BT.601 integer weights) so the
      * [[DecodedFrame]] contract — one byte per pixel — holds for real
      * and fake decodes alike.
      */
    def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
      var i = 2
      def skipSpace(): Unit = {
        var go = true
        while (go && i < bytes.length) {
          val c = bytes(i).toChar
          if (c == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
          else if (c.isWhitespace) i += 1
          else go = false
        }
      }
      def int(): Int = {
        skipSpace()
        var v = 0
        while (i < bytes.length && bytes(i).toChar.isDigit) { v = v * 10 + (bytes(i) - '0'); i += 1 }
        v
      }
      val (w, h, maxv) = (int(), int(), int())
      require(w > 0 && h > 0 && maxv == 255, s"unsupported PPM: ${w}x$h max=$maxv")
      i += 1 // the single whitespace byte after maxval
      val need = w * h * 3
      require(bytes.length - i >= need, "truncated PPM payload")
      val luma = new Array[Byte](w * h)
      var p = 0
      while (p < w * h) {
        val r = bytes(i + 3 * p) & 0xff
        val g = bytes(i + 3 * p + 1) & 0xff
        val b = bytes(i + 3 * p + 2) & 0xff
        luma(p) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
        p += 1
      }
      (w, h, luma)
    }

    /** WAV (RIFF) with PCM16 data: walks the chunk list to fmt/data.
      * Returns (sampleRate, channels, interleaved samples).
      */
    def decodeWavPcm16(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(at: Int): String = new String(bytes, at, 4, "US-ASCII")
      require(bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE", "not a WAV")
      var at = 12
      var rate = 0; var channels = 0; var bits = 0
      var samples: Array[Short] = null
      while (at + 8 <= bytes.length) {
        val id = fourcc(at)
        val size = bb.getInt(at + 4)
        // an untrusted size field must not send the walker backwards
        // (infinite loop) or past the buffer (raw IndexOutOfBounds);
        // sum in Long — a size near Int.MaxValue overflows the Int sum
        // and would slip past the bound it is checked against
        require(size >= 0 && at + 8L + size <= bytes.length,
          s"corrupt WAV chunk '$id' at offset $at: declared size $size exceeds payload")
        if (id == "fmt ") {
          require(bb.getShort(at + 8) == 1, "only PCM wav supported")
          channels = bb.getShort(at + 10)
          rate = bb.getInt(at + 12)
          bits = bb.getShort(at + 22)
          require(bits == 16, s"only PCM16 supported, got $bits-bit")
        } else if (id == "data") {
          val n = size / 2
          samples = Array.tabulate(n)(k => bb.getShort(at + 8 + 2 * k))
        }
        at += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(rate > 0 && samples != null, "missing fmt/data chunk")
      (rate, channels, samples)
    }

    /** Compressed raster formats (JPEG/PNG/GIF/BMP) via the JDK's
      * built-in `javax.imageio` readers — zero external dependencies.
      * Decodes to the same (w, h, BT.601 luma plane) contract as
      * [[decodePpm]], so downstream resize/frame-sample stages are
      * format-agnostic.
      */
    def decodeImageIo(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "ImageIO could not decode payload (unknown/corrupt format)")
      toLuma(img)
    }

    /** Multi-frame container decode (animated GIF — the one video-like
      * format the JDK reads natively): one (w, h, luma) per frame, in
      * presentation order, each COMPOSITED onto the logical screen.
      * Real-world animated GIFs are inter-frame optimized — frame k
      * stores only the changed sub-rectangle plus its left/top offset
      * and a disposal method — and the JDK reader's `read(i)` returns
      * exactly that sub-image, so raw frames would have wrong sizes and
      * delta-only content. Frames are therefore drawn at their declared
      * offsets onto a persistent canvas; `restoreToBackgroundColor`
      * disposal clears the frame rect (the `restorePrevious` method,
      * vanishingly rare, is treated as no-dispose). The canvas spans
      * frame 0's extent — in a well-formed GIF the first frame paints
      * the full logical screen; later frames drawing outside it clip
      * rather than error. The real decode
      * path behind [[VideoFrameSampleStage]]; an FFmpeg-backed H.264
      * decoder slots in by replacing this function only.
      */
    def decodeGifFrames(bytes: Array[Byte]): IndexedSeq[(Int, Int, Array[Byte])] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no ImageIO reader for payload")
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          require(n > 0, "no frames in container")
          def attrs(i: Int): (Int, Int, String) = {
            val tree = r.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
              .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            def node(name: String) = Option(tree.getElementsByTagName(name).item(0))
              .map(_.asInstanceOf[javax.imageio.metadata.IIOMetadataNode])
            val desc = node("ImageDescriptor")
            val gce = node("GraphicControlExtension")
            (desc.map(_.getAttribute("imageLeftPosition").toInt).getOrElse(0),
              desc.map(_.getAttribute("imageTopPosition").toInt).getOrElse(0),
              gce.map(_.getAttribute("disposalMethod")).getOrElse("none"))
          }
          val first = r.read(0)
          val (x0, y0, _) = attrs(0)
          val cw = math.max(r.getWidth(0) + x0, first.getWidth + x0)
          val ch = math.max(r.getHeight(0) + y0, first.getHeight + y0)
          val canvas = new java.awt.image.BufferedImage(
            cw, ch, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = canvas.createGraphics()
          try {
            (0 until n).map { i =>
              val frame = if (i == 0) first else r.read(i)
              val (x, y, disposal) = attrs(i)
              g.drawImage(frame, x, y, null)
              val out = toLuma(canvas)
              if (disposal == "restoreToBackgroundColor") {
                g.setColor(java.awt.Color.BLACK)
                g.fillRect(x, y, frame.getWidth, frame.getHeight)
              }
              out
            }
          } finally g.dispose()
        } finally r.dispose()
      } finally iis.close()
    }

    /** PNG textual metadata (tEXt chunks): the in-band caption/provenance
      * channel of a PNG corpus — (keyword, value) pairs, in chunk order.
      * Pure byte walking of the chunk stream (4-byte big-endian length,
      * 4-byte type, data, CRC), with the same untrusted-length guards as
      * the WAV walker: a negative or over-long declared size fails with
      * a clear error instead of looping or reading out of bounds. CRCs
      * are not verified (metadata extraction, not integrity checking).
      * Non-PNG payloads throw; PNGs without tEXt return empty.
      */
    def pngTextChunks(bytes: Array[Byte]): Seq[(String, String)] = {
      val sig = Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      require(bytes.length >= 8 && sig.zipWithIndex.forall {
        case (b, i) => (bytes(i) & 0xff) == b
      }, "not a PNG")
      val bb = java.nio.ByteBuffer.wrap(bytes) // PNG is big-endian
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var at = 8
      while (at + 8 <= bytes.length) {
        val len = bb.getInt(at)
        val typ = new String(bytes, at + 4, 4, "US-ASCII")
        require(len >= 0 && at + 12L + len <= bytes.length,
          s"corrupt PNG chunk '$typ' at offset $at: declared size $len exceeds payload")
        if (typ == "tEXt") {
          val data = bytes.slice(at + 8, at + 8 + len)
          val sep = data.indexOf(0.toByte)
          require(sep > 0, s"tEXt chunk at $at lacks the keyword separator")
          out += ((new String(data, 0, sep, "ISO-8859-1"),
            new String(data, sep + 1, data.length - sep - 1, "ISO-8859-1")))
        }
        at += 12 + len // length + type + data + CRC
      }
      out.toSeq
    }

    private def toLuma(img: java.awt.image.BufferedImage): (Int, Int, Array[Byte]) = {
      val w = img.getWidth
      val h = img.getHeight
      val argb = img.getRGB(0, 0, w, h, null, 0, w) // one bulk read, any source color model
      val luma = new Array[Byte](w * h)
      var p = 0
      while (p < luma.length) {
        val v = argb(p)
        val r = (v >> 16) & 0xff
        val g = (v >> 8) & 0xff
        val b = v & 0xff
        luma(p) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
        p += 1
      }
      (w, h, luma)
    }
  }

  /** STUB decoder — deterministic fake standing in for codecs the JDK
    * genuinely lacks (MP3/H.264 video). Width/height derive from a
    * byte-sum hash; "pixels" are the payload bytes tiled to
    * width*height. Deterministic → spec-testable.
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

  /** Batched GPU-shaped decode stage (a real decoder wants the batch to
    * amortize codec state; `resources` advertises the GPU shape).
    * Routes by payload magic: P6 PPM decodes by direct byte arithmetic;
    * JPEG (FFD8), PNG (89 50 4E 47), GIF (GIF8 — first frame; see
    * [[VideoFrameSampleStage]] for all frames) and BMP (BM) decode via
    * the JDK's ImageIO; only payloads with no JDK codec hit the
    * FakeCodec stub.
    */
  final class DecodeStage(override val batchSize: Int = 8)
      extends Stage[MediaRow, DecodedFrame] {
    override def resources: Resources = Resources(cpus = 1.0, gpus = 0.25)
    override def process(batch: Seq[MediaRow]): Seq[DecodedFrame] =
      batch.map { m =>
        val p = m.payload
        def is(at: Int, b: Int) = p.length > at && (p(at) & 0xff) == b
        val imageIo =
          (is(0, 0xff) && is(1, 0xd8)) ||                                // JPEG
          (is(0, 0x89) && is(1, 'P') && is(2, 'N') && is(3, 'G')) ||     // PNG
          (is(0, 'G') && is(1, 'I') && is(2, 'F') && is(3, '8')) ||      // GIF
          (is(0, 'B') && is(1, 'M'))                                     // BMP
        val (w, h, px) =
          if (is(0, 'P') && is(1, '6')) Codecs.decodePpm(p)
          else if (imageIo) Codecs.decodeImageIo(p)
          else FakeCodec.decode(p)
        DecodedFrame(m.id, w, h, px)
      }
  }

  final case class ImageStats(id: Long, width: Int, height: Int,
      aspect: Double, meanLuma: Double, stdLuma: Double, entropy: Double,
      extremeFrac: Double)

  /** Image quality statistics over decoded luma planes — the signals an
    * image-curation pipeline filters on BEFORE spending GPU time
    * (LAION-style: drop blank/black frames, near-constant backgrounds,
    * torn downloads): mean and standard deviation of luma (blank and
    * black images have σ ≈ 0), Shannon entropy of the 256-bin luma
    * histogram in bits (uniform noise → 8, constant → 0 — the
    * compressibility/texture proxy), the fraction of pixels at the
    * 0/255 extremes (clipping/tearing detector), and the aspect ratio.
    * Pure per-sample arithmetic over pixels already in memory — the
    * stats ride the same Stage pipeline as decode (no second decode
    * pass), and downstream filtering is an ordinary DataFrame filter on
    * this row. Sample variance over n pixels uses the population form
    * (σ² = E[x²] − E[x]² — n is ~10⁵⁺, the distinction is noise); an
    * empty pixel array (0×0 decode) yields zeroed stats rather than
    * NaNs so a filter can target it explicitly.
    */
  final class ImageStatsStage(override val batchSize: Int = 32)
      extends Stage[DecodedFrame, ImageStats] {
    override def process(batch: Seq[DecodedFrame]): Seq[ImageStats] =
      batch.map { f =>
        val n = f.pixels.length
        if (n == 0) ImageStats(f.id, f.width, f.height, 0.0, 0.0, 0.0, 0.0, 0.0)
        else {
          val histo = new Array[Long](256)
          var s = 0L
          var ss = 0L
          var extreme = 0L
          var i = 0
          while (i < n) {
            val v = f.pixels(i) & 0xff
            histo(v) += 1
            s += v
            ss += v.toLong * v
            if (v == 0 || v == 255) extreme += 1
            i += 1
          }
          val nd = n.toDouble
          val mean = s / nd
          val variance = math.max(0.0, ss / nd - mean * mean)
          var entropy = 0.0
          var b = 0
          while (b < 256) {
            if (histo(b) > 0) {
              val p = histo(b) / nd
              entropy -= p * math.log(p)
            }
            b += 1
          }
          ImageStats(f.id, f.width, f.height,
            if (f.height > 0) f.width.toDouble / f.height else 0.0,
            mean, math.sqrt(variance), entropy / math.log(2.0), extreme / nd)
        }
      }
  }

  final case class MediaMetadata(id: Long, pairs: Map[String, String])

  /** In-band metadata extraction: PNG tEXt (keyword, value) pairs per
    * payload — caption/provenance without sidecar files. Non-PNG
    * payloads yield an empty map, and so do TRUNCATED or CORRUPT PNGs
    * (the codec keeps its fail-fast contract for direct callers; the
    * stage degrades, because in a web-crawl corpus a cut-off download
    * is data, not a reason to kill the job). Repeated keywords — legal
    * per the PNG spec (e.g. two Comment chunks) — are preserved by
    * joining their values with '\n' in chunk order rather than being
    * silently last-one-wins'd by toMap.
    */
  final class PngMetadataStage(override val batchSize: Int = 32)
      extends Stage[MediaRow, MediaMetadata] {
    override def process(batch: Seq[MediaRow]): Seq[MediaMetadata] =
      batch.map { m =>
        val p = m.payload
        val isPng = p.length > 3 && (p(0) & 0xff) == 0x89 &&
          p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
        val pairs =
          if (!isPng) Map.empty[String, String]
          else try {
            Codecs.pngTextChunks(p)
              .groupBy(_._1).view
              .mapValues(_.map(_._2).mkString("\n")).toMap
          } catch { case scala.util.control.NonFatal(_) => Map.empty[String, String] }
        MediaMetadata(m.id, pairs)
      }
  }

  /** Real audio decode: WAV/PCM16 payloads to sample arrays. */
  final class AudioDecodeStage(override val batchSize: Int = 8)
      extends Stage[MediaRow, AudioClip] {
    override def process(batch: Seq[MediaRow]): Seq[AudioClip] =
      batch.map { m =>
        val (rate, ch, samples) = Codecs.decodeWavPcm16(m.payload)
        AudioClip(m.id, rate, ch, samples)
      }
  }

  /** Real DSP features over decoded audio: duration, RMS level (of the
    * full-scale range), zero-crossing rate — the standard cheap
    * quality/speech-detection signals of an audio data pipeline.
    * Zero-crossings are counted PER CHANNEL (stride = `channels`):
    * adjacent interleaved samples belong to different channels, so a
    * naive flat scan would count phantom flips on stereo clips.
    */
  final class AudioFeatureStage(override val batchSize: Int = 32)
      extends Stage[AudioClip, AudioFeatures] {
    override def process(batch: Seq[AudioClip]): Seq[AudioFeatures] =
      batch.map { c =>
        val n = c.samples.length
        val ch = math.max(1, c.channels)
        val frames = n / ch
        var sumSq = 0.0
        var i = 0
        while (i < n) {
          val x = c.samples(i) / 32768.0
          sumSq += x * x
          i += 1
        }
        var crossings = 0L
        var c0 = 0
        while (c0 < ch) {
          var f = 1
          while (f < frames) {
            if ((c.samples(f * ch + c0) >= 0) != (c.samples((f - 1) * ch + c0) >= 0)) crossings += 1
            f += 1
          }
          c0 += 1
        }
        val comparisons = ch.toLong * math.max(0, frames - 1)
        AudioFeatures(c.id,
          durationMs = frames * 1000L / c.sampleRate,
          rms = if (n == 0) 0.0 else math.sqrt(sumSq / n),
          zeroCrossRate = if (comparisons == 0) 0.0 else crossings.toDouble / comparisons)
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

  final case class VideoFrame(id: Long, frameIdx: Int, width: Int, height: Int, pixels: Array[Byte])

  /** REAL video frame sampling: decodes a multi-frame container
    * (animated GIF via the JDK reader — magic `GIF8`) and keeps every
    * `every`-th frame as a luma plane, the decode→sample front of a
    * video curation pipeline. Non-GIF payloads are rejected per sample
    * (clear error) rather than faked — compose with [[DecodeStage]] for
    * still images.
    */
  final class VideoFrameSampleStage(every: Int, override val batchSize: Int = 8)
      extends Stage[MediaRow, VideoFrame] {
    require(every > 0, "sample interval must be positive")
    override def resources: Resources = Resources(cpus = 1.0, gpus = 0.25)
    override def process(batch: Seq[MediaRow]): Seq[VideoFrame] =
      batch.flatMap { m =>
        val p = m.payload
        require(p.length >= 4 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8',
          s"VideoFrameSampleStage expects a GIF container, id=${m.id}")
        Codecs.decodeGifFrames(p).zipWithIndex.collect {
          case ((w, h, luma), idx) if idx % every == 0 => VideoFrame(m.id, idx, w, h, luma)
        }
      }
  }

  final case class FrameHash(id: Long, frameIdx: Int, phash: Long)

  /** Average-hash (aHash) perceptual frame signature: the luma plane is
    * nearest-neighbor-reduced to 8×8, each cell contributes one bit
    * (above/below the 64-cell mean) → a 64-bit hash whose Hamming
    * distance measures visual similarity. Invariant to resolution and to
    * uniform brightness shifts (the mean moves with the pixels); robust
    * to small noise — the standard cheap perceptual key for frame-level
    * video dedup.
    */
  final class FrameHashStage(override val batchSize: Int = 32)
      extends Stage[VideoFrame, FrameHash] {
    override def process(batch: Seq[VideoFrame]): Seq[FrameHash] =
      batch.map { f =>
        val px = Array.tabulate(64) { i =>
          val (ty, tx) = (i / 8, i % 8)
          val sy = math.min(f.height - 1, ty * f.height / 8)
          val sx = math.min(f.width - 1, tx * f.width / 8)
          f.pixels(sy * f.width + sx) & 0xff
        }
        val mean = px.sum / 64.0
        var h = 0L
        var i = 0
        while (i < 64) { if (px(i) >= mean) h |= (1L << i); i += 1 }
        FrameHash(f.id, f.frameIdx, h)
      }
  }

  /** Video-level near-duplicate pairs over frame perceptual hashes — the
    * reference's video-curation dedup re-expressed relationally: two
    * videos are near-dups when at least `minFrac` of the shorter video's
    * sampled frames have a frame in the other within Hamming
    * `maxHamming`. Shape is the d04 discipline applied per frame: the
    * 64-bit phash splits into 4×16-bit pigeonhole chunk keys (full
    * recall for Hamming ≤ 3), candidates come from a chunk equi-join
    * (never frames × frames), `maxChunkDf` caps degenerate chunks (flat
    * frames — intros, black frames — share hashes corpus-wide and are
    * exactly the boilerplate that carries no dedup signal), and only
    * colliding frame pairs pay the exact Hamming check.
    *
    * Input: one row per sampled frame (idCol, frameCol, hashCol) — the
    * output of [[VideoFrameSampleStage]] → [[FrameHashStage]]. Output:
    * id_a, id_b, matched (distinct matched frames OF THE SHORTER VIDEO —
    * the side coverage is measured on), frac (matched / min(|a|, |b|),
    * 4 dp, in [0, 1], >= minFrac).
    */
  def videoNearDupPairs(frames: org.apache.spark.sql.DataFrame, idCol: String,
      frameCol: String, hashCol: String, maxHamming: Int = 3,
      minFrac: Double = 0.5, maxChunkDf: Int = 10000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val f = frames.select(col(idCol).as("_vid"), col(frameCol).as("_fi"),
      col(hashCol).as("_ph"))
    val nf = f.groupBy("_vid").agg(countDistinct("_fi").as("_nf"))
    val keyed = f.select(col("_vid"), col("_fi"), col("_ph"),
      explode(array((0 until 4).map(k => concat_ws("_", lit(k.toString),
        shiftright(col("_ph"), k * 16).bitwiseAND(lit(0xFFFFL)))): _*)).as("ck"))
    // hot-chunk cap as a partial-agg groupBy + broadcast ANTI join (the
    // spanScrub discipline — a window would shuffle every frame-chunk row
    // with the hot keys landing on single tasks; the hot-key LIST is tiny
    // by definition, so it broadcasts)
    val hot = keyed.groupBy("ck").agg(count(lit(1)).as("_c"))
      .filter(col("_c") > maxChunkDf).select("ck")
    val chunks = keyed.join(broadcast(hot), Seq("ck"), "left_anti")
    val m = chunks.as("a").join(chunks.as("b"),
        col("a.ck") === col("b.ck") && col("a._vid") < col("b._vid"))
      .select(col("a._vid").as("id_a"), col("b._vid").as("id_b"),
        col("a._fi").as("fa"), col("b._fi").as("fb"),
        col("a._ph").as("pa"), col("b._ph").as("pb"))
      .distinct()
      .filter(bit_count(col("pa").bitwiseXOR(col("pb"))) <= maxHamming)
    // matched coverage is measured on the SHORTER video's frames (the
    // documented contract): many long-video frames matching one frame of
    // a short video must not inflate the fraction past 1
    val matched = m.groupBy("id_a", "id_b")
      .agg(countDistinct(col("fa")).as("_ma"), countDistinct(col("fb")).as("_mb"))
    matched
      .join(nf.select(col("_vid").as("id_a"), col("_nf").as("_na")), "id_a")
      .join(nf.select(col("_vid").as("id_b"), col("_nf").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        when(col("_na") <= col("_nb"), col("_ma")).otherwise(col("_mb")).as("matched"),
        graft.functions.Rounding.mirrorRound(
          when(col("_na") <= col("_nb"), col("_ma")).otherwise(col("_mb"))
            * 1.0 / least(col("_na"), col("_nb")), 4).as("frac"))
      .filter(col("frac") >= minFrac)
  }

  final case class AudioBlockHash(id: Long, blockIdx: Int, hash: Long)

  /** Audio envelope perceptual hash — the audio analogue of
    * [[FrameHashStage]]: the decoded clip folds to a mono energy
    * envelope (mean |sample| per `windowFrames`-frame window), and each
    * block of `blockWindows` consecutive windows hashes to one 64-bit
    * signature whose bit i says "window i's energy is at or above the
    * block mean" — AMPLITUDE-invariant (uniform gain scales every energy
    * and the mean together) the way aHash is brightness-invariant.
    * Blocks hop by half a block, so a clip embedded at a half-block
    * offset still produces aligned signatures; a trailing partial block
    * is dropped (its mean would hash a different-length profile).
    */
  final class AudioEnvelopeHashStage(windowFrames: Int = 256,
      blockWindows: Int = 64, override val batchSize: Int = 32)
      extends Stage[AudioClip, AudioBlockHash] {
    require(windowFrames >= 1, "windowFrames must be >= 1")
    require(blockWindows >= 2 && blockWindows <= 64,
      "blockWindows must be in [2, 64] (one long per block)")
    override def process(batch: Seq[AudioClip]): Seq[AudioBlockHash] =
      batch.flatMap { c =>
        val ch = math.max(1, c.channels)
        val frames = c.samples.length / ch
        val nWin = frames / windowFrames
        val energies = Array.tabulate(nWin) { w =>
          var s = 0.0
          var f = w * windowFrames
          val end = f + windowFrames
          while (f < end) {
            var k = 0
            var m = 0.0
            while (k < ch) { m += math.abs(c.samples(f * ch + k).toDouble); k += 1 }
            s += m / ch
            f += 1
          }
          s / windowFrames
        }
        val hop = math.max(1, blockWindows / 2)
        val blocks =
          if (nWin < blockWindows) 0 else (nWin - blockWindows) / hop + 1
        (0 until blocks).map { b =>
          val off = b * hop
          var mean = 0.0
          var i = 0
          while (i < blockWindows) { mean += energies(off + i); i += 1 }
          mean /= blockWindows
          var h = 0L
          i = 0
          while (i < blockWindows) {
            if (energies(off + i) >= mean) h |= (1L << i)
            i += 1
          }
          AudioBlockHash(c.id, b, h)
        }
      }
  }

  /** Audio-level near-duplicate pairs over envelope block hashes:
    * [[videoNearDupPairs]] IS the operator — its pigeonhole chunk-join /
    * hot-chunk cap / shorter-side coverage machinery is media-agnostic
    * over (id, index, 64-bit hash) rows, so audio rides it unchanged.
    */
  def audioNearDupPairs(blocks: org.apache.spark.sql.DataFrame, idCol: String,
      blockCol: String, hashCol: String, maxHamming: Int = 3,
      minFrac: Double = 0.5, maxChunkDf: Int = 10000): org.apache.spark.sql.DataFrame =
    videoNearDupPairs(blocks, idCol, blockCol, hashCol, maxHamming, minFrac,
      maxChunkDf)

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
