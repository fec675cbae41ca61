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

  test("M2b: real PPM payloads decode exactly (dimensions + luma bytes)") {
    import spark.implicits._
    // a real 4x2 P6 image, synthesized byte-for-byte
    val w = 4; val h = 2
    val rgb = Array.tabulate[Byte](w * h * 3)(i => (i * 7 % 251).toByte)
    val header = s"P6\n# comment\n$w $h\n255\n".getBytes("US-ASCII")
    val ppm = header ++ rgb
    def luma(p: Int): Byte = {
      val (r, g, b) = (rgb(3 * p) & 0xff, rgb(3 * p + 1) & 0xff, rgb(3 * p + 2) & 0xff)
      ((r * 299 + g * 587 + b * 114) / 1000).toByte
    }
    val media = spark.createDataset(Seq(MediaRow(1L, ppm)))
    val decoded = Pipeline.from(media).stage(new DecodeStage()).run().collect()
    assert(decoded.length == 1)
    assert(decoded.head.width == w && decoded.head.height == h)
    assert(decoded.head.pixels.toSeq == (0 until w * h).map(luma),
      "pixels must be the exact BT.601 luma plane of the source RGB")
    // and a resize of the real image keeps exact nearest-neighbor bytes
    val resized = Pipeline.from(media)
      .stage(new DecodeStage()).stage(new ResizeStage(2, 1)).run().collect().head
    assert(resized.pixels.toSeq == Seq(luma(0), luma(2)))
  }

  test("M2d: real JPEG and PNG payloads decode via JDK ImageIO (w/h + luma)") {
    import spark.implicits._
    val w = 24; val h = 16
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 10) % 256; val g = (y * 16) % 256; val b = (x + y) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer in this JDK")
      bos.toByteArray
    }
    def luma(x: Int, y: Int): Int = {
      val v = img.getRGB(x, y)
      ((((v >> 16) & 0xff) * 299) + (((v >> 8) & 0xff) * 587) + ((v & 0xff) * 114)) / 1000
    }
    val png = encode("png")
    val jpg = encode("jpg")
    // real container magics, so DecodeStage routes them to ImageIO
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P')
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    val media = spark.createDataset(Seq(MediaRow(1L, png), MediaRow(2L, jpg)))
    val decoded = Pipeline.from(media).stage(new DecodeStage()).run().collect()
      .map(f => f.id -> f).toMap
    val expected = for (y <- 0 until h; x <- 0 until w) yield luma(x, y).toByte
    // PNG is lossless: exact dimensions AND byte-exact luma plane
    val pngF = decoded(1L)
    assert(pngF.width == w && pngF.height == h)
    assert(pngF.pixels.toSeq == expected)
    // JPEG is lossy: exact dimensions, luma within codec quantization error
    val jpgF = decoded(2L)
    assert(jpgF.width == w && jpgF.height == h)
    val maxErr = (0 until w * h)
      .map(p => math.abs((jpgF.pixels(p) & 0xff) - (expected(p) & 0xff))).max
    assert(maxErr <= 24, s"JPEG luma deviates up to $maxErr from source — not a real decode")
  }

  test("M2c: real WAV/PCM16 payloads decode to samples; features are exact DSP") {
    import spark.implicits._
    // synthesize a real RIFF/WAVE file: 1 channel, 8000 Hz, 16-bit PCM,
    // a 4000-sample square wave alternating +/-1000 every sample
    val rate = 8000
    val n = 4000
    val samples = Array.tabulate(n)(i => if (i % 2 == 0) 1000.toShort else (-1000).toShort)
    val dataBytes = 2 * n
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(bb.putShort(_))
    val media = spark.createDataset(Seq(MediaRow(7L, bb.array())))
    val feats = Pipeline.from(media)
      .stage(new AudioDecodeStage())
      .stage(new AudioFeatureStage())
      .run().collect().head
    assert(feats.durationMs == 500)                      // 4000 / 8000 Hz
    assert(math.abs(feats.rms - 1000.0 / 32768) < 1e-9)  // constant magnitude
    assert(feats.zeroCrossRate == 1.0)                   // sign flips every sample
  }

  test("M6: audio near-dup — envelope block hashes are amplitude-invariant, different clips stay apart") {
    import spark.implicits._
    def wavOf(samples: Array[Short]): Array[Byte] = {
      val dataBytes = 2 * samples.length
      val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      samples.foreach(bb.putShort(_))
      bb.array()
    }
    // envelope = per-window constant amplitude from a seeded RNG, EVEN
    // values so the half-gain copy (>> 1) scales every energy EXACTLY by
    // 0.5 and the above-block-mean bits are identical
    val windowFrames = 4
    val nWin = 96 // 64-window blocks, hop 32 -> 2 full blocks
    // amplitude constant per WINDOW (the envelope is what's hashed)
    def envelope(seed: Int): Array[Short] = {
      val rnd = new scala.util.Random(seed)
      val amps = Array.fill(nWin)((rnd.nextInt(8000) + 100) * 2)
      Array.tabulate(nWin * windowFrames) { i =>
        val amp = amps(i / windowFrames)
        (if (i % 2 == 0) amp else -amp).toShort
      }
    }
    val a = envelope(1)
    val half = a.map(s => (s / 2).toShort) // even values: exact halving
    val other = envelope(2)
    val clips = spark.createDataset(Seq(
      MediaRow(1L, wavOf(a)), MediaRow(2L, wavOf(half)), MediaRow(3L, wavOf(other))))
    val hashes = Pipeline.from(clips)
      .stage(new AudioDecodeStage())
      .stage(new AudioEnvelopeHashStage(windowFrames = windowFrames, blockWindows = 64))
      .run().toDF()
    // 2 blocks per clip; clip 2's hashes equal clip 1's bit for bit
    val h = hashes.as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(h(1L).length == 2, h.toString)
    assert(h(1L).map(x => (x._2, x._3)).toSet == h(2L).map(x => (x._2, x._3)).toSet)
    val pairs = graft.operators.Multimodal.audioNearDupPairs(
        hashes, "id", "blockIdx", "hash", maxHamming = 3, minFrac = 0.5)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"$pairs")
    assert(pairs.head._4 == 1.0, s"$pairs")
  }

  test("M3: video near-dup — decode -> frame aHash -> chunk-join pairs") {
    import spark.implicits._
    def gifOf(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(img =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null))
      writer.endWriteSequence(); writer.dispose(); ios.close()
      bos.toByteArray
    }
    val w = 16; val h = 16
    // frame j: two-tone split at column (or row) 2+j — two exact colors
    // survive GIF palette quantization losslessly
    def frame(dark: Int, bright: Int, split: Int, vertical: Boolean) = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(bright, bright, bright)); g.fillRect(0, 0, w, h)
      g.setColor(new java.awt.Color(dark, dark, dark))
      if (vertical) g.fillRect(0, 0, split * 2, h) else g.fillRect(0, 0, w, split * 2)
      g.dispose(); img
    }
    val vidA = gifOf((0 until 4).map(j => frame(40, 200, 2 + j, vertical = true)))
    // B = A's geometry, uniformly brighter: aHash is brightness-invariant
    val vidB = gifOf((0 until 4).map(j => frame(60, 220, 2 + j, vertical = true)))
    // C = horizontal splits: visually different frames
    val vidC = gifOf((0 until 4).map(j => frame(40, 200, 2 + j, vertical = false)))
    val media = spark.createDataset(Seq(
      MediaRow(1L, vidA), MediaRow(2L, vidB), MediaRow(3L, vidC)))
    val hashes = Pipeline.from(media)
      .stage(new VideoFrameSampleStage(every = 1))
      .stage(new FrameHashStage())
      .run().toDF()
    val pairs = videoNearDupPairs(hashes, "id", "frameIdx", "phash",
        maxHamming = 3, minFrac = 0.5)
      .select("id_a", "id_b", "matched", "frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 4L, 1.0)),
      s"A~B near-dup (every frame matches), C distinct: $pairs")
    // asymmetric lengths: a long video repeating ONE of a short video's
    // frames must measure coverage on the SHORT side (frac <= 1, never
    // the long side's inflated match count)
    val longVid = gifOf(Seq.fill(6)(frame(40, 200, 3, vertical = true)))
    val shortVid = gifOf(Seq(
      frame(40, 200, 3, vertical = true), frame(40, 200, 3, vertical = false)))
    val h2 = Pipeline.from(spark.createDataset(Seq(
        MediaRow(10L, longVid), MediaRow(11L, shortVid))))
      .stage(new VideoFrameSampleStage(every = 1))
      .stage(new FrameHashStage())
      .run().toDF()
    val p2 = videoNearDupPairs(h2, "id", "frameIdx", "phash",
        maxHamming = 3, minFrac = 0.0)
      .select("id_a", "id_b", "matched", "frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(p2 == Seq((10L, 11L, 1L, 0.5)),
      s"1 of the short video's 2 frames matches -> frac 0.5: $p2")
  }

  test("M2f: real multi-frame GIF decodes; VideoFrameSampleStage keeps every k-th frame") {
    import spark.implicits._
    // write a REAL 6-frame animated GIF with the JDK's sequence writer:
    // frame i is solid gray level 20*i+20 (solid frames survive GIF's
    // palette quantization exactly)
    val w = 12; val h = 9
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val levels = (0 until 6).map(i => 20 * i + 20)
    levels.foreach { g =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gph = img.createGraphics()
      gph.setColor(new java.awt.Color(g, g, g)); gph.fillRect(0, 0, w, h); gph.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = bos.toByteArray
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F')
    // direct decode: 6 frames, exact dims, solid luma = gray level
    val frames = Codecs.decodeGifFrames(gif)
    assert(frames.length == 6)
    frames.zip(levels).foreach { case ((fw, fh, luma), g) =>
      assert(fw == w && fh == h)
      assert(luma.forall(b => (b & 0xff) == g), s"solid frame must stay level $g")
    }
    // stage: every 2nd frame -> indices 0, 2, 4
    val media = spark.createDataset(Seq(MediaRow(9L, gif)))
    val sampled = Pipeline.from(media).stage(new VideoFrameSampleStage(every = 2))
      .run().collect().sortBy(_.frameIdx)
    assert(sampled.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    sampled.foreach { f =>
      assert(f.width == w && f.height == h)
      assert(f.pixels.forall(b => (b & 0xff) == levels(f.frameIdx)))
    }
    // a still-image DecodeStage also takes GIF (first frame, real decode)
    val still = Pipeline.from(spark.createDataset(Seq(MediaRow(3L, gif))))
      .stage(new DecodeStage()).run().collect().head
    assert(still.width == w && still.height == h)
    assert(still.pixels.forall(b => (b & 0xff) == levels.head), "first frame, real luma")
    // non-GIF payloads are rejected with a clear error, not faked
    val bad = spark.createDataset(Seq(MediaRow(1L, Array[Byte]('P', '6', ' '))))
    val ex = intercept[org.apache.spark.SparkException] {
      Pipeline.from(bad).stage(new VideoFrameSampleStage(every = 1)).run().collect()
    }
    assert(ex.getMessage.contains("GIF container") ||
      Option(ex.getCause).exists(_.getMessage.contains("GIF container")))
  }

  test("M2g: optimized GIFs (sub-rect frames at offsets) composite onto the canvas") {
    // real-world animated GIFs store only changed sub-rectangles; the
    // decoder must composite, not emit raw delta frames
    val w = 16; val h = 10
    def solid(sw: Int, sh: Int, level: Int) = {
      val img = new java.awt.image.BufferedImage(sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(level, level, level)); g.fillRect(0, 0, sw, sh); g.dispose()
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    def meta(img: java.awt.image.BufferedImage, x: Int, y: Int) = {
      val m = writer.getDefaultImageMetadata(new javax.imageio.ImageTypeSpecifier(img), null)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = m.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      m.setFromTree(fmt, tree)
      m
    }
    val full = solid(w, h, 100)
    val delta = solid(4, 3, 200) // frame 1: only a 4x3 patch at (5, 2)
    writer.writeToSequence(new javax.imageio.IIOImage(full, null, meta(full, 0, 0)), null)
    writer.writeToSequence(new javax.imageio.IIOImage(delta, null, meta(delta, 5, 2)), null)
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val frames = Codecs.decodeGifFrames(bos.toByteArray)
    assert(frames.length == 2)
    frames.foreach { case (fw, fh, _) => assert(fw == w && fh == h,
      "every composited frame spans the full logical screen") }
    assert(frames(0)._3.forall(b => (b & 0xff) == 100))
    val f1 = frames(1)._3
    for (y <- 0 until h; x <- 0 until w) {
      val expect = if (x >= 5 && x < 9 && y >= 2 && y < 5) 200 else 100
      assert((f1(y * w + x) & 0xff) == expect, s"composited pixel ($x,$y)")
    }
  }

  test("M2e: stereo ZCR strides by channel; corrupt WAV chunk sizes fail fast") {
    import graft.operators.Multimodal.Codecs
    // stereo clip: ch0 flips sign every frame (ZCR 1), ch1 constant (ZCR 0)
    val frames = 1000
    val samples = Array.tabulate(2 * frames) { i =>
      if (i % 2 == 0) { if ((i / 2) % 2 == 0) 1000.toShort else (-1000).toShort }
      else 500.toShort
    }
    val clip = AudioClip(1L, 8000, 2, samples)
    val feats = new AudioFeatureStage().process(Seq(clip)).head
    assert(feats.zeroCrossRate == 0.5, "per-channel ZCR: (1.0 + 0.0) / 2 channels")
    assert(feats.durationMs == frames * 1000L / 8000)
    // corrupt chunk sizes must raise a descriptive error, not hang or IOOBE
    def wavWithDataSize(declared: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(40).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(declared).putShort(0).putShort(0)
      bb.array()
    }
    val neg = intercept[IllegalArgumentException](Codecs.decodeWavPcm16(wavWithDataSize(-8)))
    assert(neg.getMessage.contains("corrupt WAV chunk"))
    val over = intercept[IllegalArgumentException](Codecs.decodeWavPcm16(wavWithDataSize(1 << 20)))
    assert(over.getMessage.contains("corrupt WAV chunk"))
  }

  test("M4: PNG tEXt metadata extracts; corrupt chunk lengths fail fast") {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data).putInt(0) // CRC unchecked
      bb.array()
    }
    def tEXt(k: String, v: String) =
      chunk("tEXt", (k.getBytes("ISO-8859-1") :+ 0.toByte) ++ v.getBytes("ISO-8859-1"))
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val png = sig ++ chunk("IHDR", new Array[Byte](13)) ++
      tEXt("Title", "sunset") ++ tEXt("Author", "cam-7") ++
      chunk("IEND", Array.empty)
    assert(Codecs.pngTextChunks(png) == Seq("Title" -> "sunset", "Author" -> "cam-7"))
    // a real ImageIO-written PNG simply has no tEXt -> empty, no error
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Codecs.pngTextChunks(bos.toByteArray).isEmpty)
    // untrusted declared length: oversized and negative both fail clearly
    // patch the high byte of the big-endian length field -> ~2 GB declared
    val overlong = sig ++ chunk("IHDR", new Array[Byte](13)).patch(0, Seq(0x7f.toByte), 1)
    val err = intercept[IllegalArgumentException](Codecs.pngTextChunks(overlong))
    assert(err.getMessage.contains("corrupt PNG chunk"))
    // the stage maps non-PNG payloads to empty metadata, PNGs to pairs
    val out = new PngMetadataStage().process(Seq(
      MediaRow(1L, png), MediaRow(2L, "not a png".getBytes)))
    assert(out == Seq(
      MediaMetadata(1L, Map("Title" -> "sunset", "Author" -> "cam-7")),
      MediaMetadata(2L, Map.empty)))
    // the stage DEGRADES on truncated/corrupt PNGs (a cut-off crawl
    // download is data, not a job-killer) while the codec above stays
    // fail-fast for direct callers; repeated keywords (legal per spec)
    // join with \n instead of last-one-wins
    val truncated = sig.take(4) // passes the 4-byte magic, fails the codec
    val dupKeys = sig ++ chunk("IHDR", new Array[Byte](13)) ++
      tEXt("Comment", "first") ++ tEXt("Comment", "second") ++
      chunk("IEND", Array.empty)
    val out2 = new PngMetadataStage().process(Seq(
      MediaRow(3L, truncated), MediaRow(4L, overlong), MediaRow(5L, dupKeys)))
    assert(out2 == Seq(
      MediaMetadata(3L, Map.empty),
      MediaMetadata(4L, Map.empty),
      MediaMetadata(5L, Map("Comment" -> "first\nsecond"))))
  }

  test("ImageStatsStage: hand stats for constant, bimodal, empty and aspect cases") {
    val stage = new ImageStatsStage()
    // constant gray: sigma = 0, entropy = 0 bits, no extremes
    val gray = DecodedFrame(1L, 4, 4, Array.fill(16)(128.toByte))
    // half black / half white: mean 127.5, sigma 127.5, entropy 1 bit,
    // every pixel at an extreme
    val bw = DecodedFrame(2L, 4, 2, (Array.fill(4)(0) ++ Array.fill(4)(255)).map(_.toByte))
    // zero-pixel decode: zeroed stats, not NaNs
    val empty = DecodedFrame(3L, 0, 0, Array.empty[Byte])
    val Seq(g, b, e) = stage.process(Seq(gray, bw, empty))
    assert(g == ImageStats(1L, 4, 4, 1.0, 128.0, 0.0, 0.0, 0.0), s"$g")
    assert(b.aspect == 2.0 && b.meanLuma == 127.5 && b.stdLuma == 127.5 &&
      b.entropy == 1.0 && b.extremeFrac == 1.0, s"$b")
    assert(e == ImageStats(3L, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0), s"$e")
    // a real decode feeds it: the 2x2 P6 ramp through DecodeStage
    val ppm = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Int](0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 0, 255).map(_.toByte))
    val decoded = new DecodeStage().process(Seq(MediaRow(9L, ppm)))
    val Seq(st) = stage.process(decoded)
    assert(st.width == 2 && st.height == 2 && st.stdLuma > 0 && st.entropy > 1.9,
      s"$st") // 4 distinct luma values -> ~2 bits
  }

  test("M7+M2: WebDataset tar shards feed the decode pipeline end-to-end") {
    import spark.implicits._
    import graft.sources.TarShards
    // 12 samples, each a REAL PNG (ImageIO-encoded, distinct width) plus
    // a caption sidecar — the WebDataset shape the reference's VLM
    // example consumes
    val pngs = (0 until 12).map { i =>
      val w = 8 + i
      val img = new java.awt.image.BufferedImage(w, 5,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until 5)
        img.setRGB(x, y, (x * 31 + y * 97 + i * 13) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (f"s$i%04d", bos.toByteArray)
    }
    val rows = pngs.flatMap { case (k, png) =>
      Seq((k, "png", png), (k, "txt", s"caption $k".getBytes("UTF-8")))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_wds").toString
    TarShards.write(rows.toDF("key", "ext", "content"), s"$dir/shards", shards = Some(2))
    // read samples back, pull the png member, run the standard decode leg
    val media = TarShards.samples(spark, s"$dir/shards")
      .select(col("key"), col("exts"), col("contents"))
      .as[(String, Seq[String], Seq[Array[Byte]])]
      .map { case (key, exts, contents) =>
        val png = contents(exts.indexOf("png"))
        MediaRow(key.drop(1).toLong, png)
      }
    val decoded = Pipeline.from(media)
      .stage(new DecodeStage(batchSize = 4))
      .run().collect().sortBy(_.id)
    assert(decoded.length == 12)
    decoded.foreach { f =>
      assert(f.width == 8 + f.id && f.height == 5,
        s"id=${f.id} decoded ${f.width}x${f.height}")
      assert(f.pixels.length == f.width * f.height, "luma plane size")
    }
    // the caption sidecars rode the same samples
    val caps = TarShards.entries(spark, s"$dir/shards")
      .filter(col("ext") === "txt").count()
    assert(caps == 12)
  }

  private def Tables() = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
