package graft

import graft.operators.Exif

/** JPEG EXIF metadata + GPS scrub, against hand-built fixtures (the
  * WARC-literal-record discipline): a full APP1/TIFF blob in BOTH byte
  * orders with inline and out-of-line values, a GPS IFD with rational
  * coordinates, a no-EXIF JPEG, and corrupt-length guards.
  */
class ExifSuite extends SparkSpec {
  import spark.implicits._

  private def u16(v: Int, le: Boolean): Array[Byte] =
    if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32(v: Long, le: Boolean): Array[Byte] =
    if (le) Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
    else Array.tabulate(4)(i => ((v >> (8 * (3 - i))) & 0xff).toByte)
  private def entry(tag: Int, typ: Int, cnt: Long, value: Array[Byte], le: Boolean): Array[Byte] = {
    require(value.length == 4)
    u16(tag, le) ++ u16(typ, le) ++ u32(cnt, le) ++ value
  }

  /** TIFF blob: IFD0 @8 (make→70 out-of-line, model inline, orientation
    * 6, GPS pointer→80), "graftcam\0" @70, GPS IFD @80 (lat-ref inline,
    * lat rationals →112), 3 rationals @112.
    */
  private def tiffBlob(le: Boolean): Array[Byte] = {
    val b = new Array[Byte](136)
    def put(at: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, b, at, bytes.length)
    put(0, (if (le) "II" else "MM").getBytes("US-ASCII"))
    put(2, u16(42, le))
    put(4, u32(8, le))
    put(8, u16(4, le)) // IFD0: 4 entries
    put(10, entry(0x010f, 2, 9, u32(70, le), le))             // make, out-of-line
    put(22, entry(0x0110, 2, 4, "gx1\u0000".getBytes, le))    // model, inline
    put(34, entry(0x0112, 3, 1, u16(6, le) ++ u16(0, le), le)) // orientation 6
    put(46, entry(0x8825, 4, 1, u32(80, le), le))             // GPS IFD pointer
    put(58, u32(0, le))                                        // next IFD
    put(70, "graftcam\u0000".getBytes("US-ASCII"))
    put(80, u16(2, le)) // GPS IFD: 2 entries
    put(82, entry(0x0001, 2, 2, "N\u0000\u0000\u0000".getBytes, le)) // lat ref
    put(94, entry(0x0002, 5, 3, u32(112, le), le))            // lat rationals
    put(106, u32(0, le))
    put(112, u32(37, le) ++ u32(1, le)) // 37/1 degrees
    put(120, u32(47, le) ++ u32(1, le))
    put(128, u32(30, le) ++ u32(1, le))
    b
  }

  private def jpegWith(tiff: Array[Byte]): Array[Byte] = {
    val app1 = Array(0xff, 0xe1).map(_.toByte) ++
      u16(2 + 6 + tiff.length, le = false) ++
      "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff
    Array(0xff, 0xd8).map(_.toByte) ++ app1 ++
      Array(0xff, 0xda, 0x00, 0x02).map(_.toByte) ++ // SOS
      Array[Byte](1, 2, 3) ++ Array(0xff, 0xd9).map(_.toByte)
  }

  test("meta: both byte orders, inline + out-of-line values, GPS flag") {
    for (le <- Seq(true, false)) {
      val m = Exif.meta(jpegWith(tiffBlob(le)))
      assert(m == Exif.Meta(Some(6), Some("graftcam"), Some("gx1"), None,
        hasGps = true), s"le=$le: $m")
    }
  }

  test("no-EXIF jpeg: empty meta, stripGps returns the input untouched") {
    val plain = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02, 9, 0xff, 0xd9).map(_.toByte)
    assert(Exif.meta(plain) == Exif.Meta(None, None, None, None, hasGps = false))
    assert(Exif.stripGps(plain) eq plain)
  }

  test("stripGps: GPS gone, everything else byte-preserved, idempotent") {
    for (le <- Seq(true, false)) {
      val img = jpegWith(tiffBlob(le))
      val scrubbed = Exif.stripGps(img)
      val m = Exif.meta(scrubbed)
      assert(!m.hasGps, s"le=$le")
      assert(m.orientation.contains(6) && m.make.contains("graftcam") &&
        m.model.contains("gx1"))
      assert(scrubbed.length == img.length)
      // the GPS rationals and table are zeroed in place
      val tiffBase = img.indexOfSlice("Exif".getBytes) + 6
      assert(scrubbed.slice(tiffBase + 80, tiffBase + 110).forall(_ == 0))
      assert(scrubbed.slice(tiffBase + 112, tiffBase + 136).forall(_ == 0))
      // bytes OUTSIDE the surgical region are identical (pixels, other tags)
      val changed = img.indices.filter(i => img(i) != scrubbed(i))
      assert(changed.forall(i => i >= tiffBase + 46 && i < tiffBase + 136),
        s"unexpected byte changes at $changed")
      // no GPS left -> second strip is a no-op returning the same array
      assert(Exif.stripGps(scrubbed) eq scrubbed)
    }
  }

  test("corrupt lengths fail loud") {
    val img = jpegWith(tiffBlob(le = true))
    // APP1 declares a length past the payload
    val bad = img.clone()
    bad(2 + 2) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](Exif.meta(bad))
    assert(e.getMessage.contains("exceeds payload"))
    assert(intercept[IllegalArgumentException](
      Exif.meta("not a jpeg".getBytes)).getMessage.contains("JPEG"))
  }

  test("ScrubStage: pipeline-lane form surfaces metadata and ships scrubbed bytes") {
    val out = new Exif.ScrubStage().process(Seq(
      Exif.Image("a", jpegWith(tiffBlob(le = true))),
      Exif.Image("b", Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))))
    val byKey = out.map(s => s.key -> s).toMap
    assert(byKey("a").hadGps && byKey("a").make.contains("graftcam"))
    assert(!Exif.meta(byKey("a").jpeg).hasGps)
    assert(!byKey("b").hadGps && (byKey("b").jpeg sameElements
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)))
  }

  test("property: randomized TIFF layouts — shuffled entries, moved values, junk tags (120 cases)") {
    val rnd = new scala.util.Random(99)
    (0 until 120).foreach { c =>
      val le = rnd.nextBoolean()
      val makeStr = "cam" + rnd.nextInt(1000)
      val orient = 1 + rnd.nextInt(8)
      val withGps = rnd.nextBoolean()
      // entries in random order; random unknown tags mixed in
      val unknown = (0 until rnd.nextInt(3)).map { _ =>
        (0x9000 + rnd.nextInt(100), 3, 1L, "ul")
      }
      // layout: header(8) + ifd0 + out-of-line region + optional gps
      val known = Seq(
        (0x0112, 3, 1L, "orient"),
        (0x010f, 2, (makeStr.length + 1).toLong, "make")) ++
        (if (withGps) Seq((0x8825, 4, 1L, "gps")) else Nil)
      val entries = rnd.shuffle(known ++ unknown)
      val n = entries.size
      val ifd0End = 8 + 2 + n * 12 + 4
      // out-of-line make string placed at a random gap past ifd0
      val makeOff = ifd0End + rnd.nextInt(16)
      val gpsOff = makeOff + makeStr.length + 1 + rnd.nextInt(16)
      val gpsValOff = gpsOff + 2 + 12 + 4 + rnd.nextInt(8)
      val total = gpsValOff + 24 + rnd.nextInt(8)
      val b = new Array[Byte](total)
      def put(at: Int, bytes: Array[Byte]): Unit =
        System.arraycopy(bytes, 0, b, at, bytes.length)
      put(0, (if (le) "II" else "MM").getBytes); put(2, u16(42, le)); put(4, u32(8, le))
      put(8, u16(n, le))
      entries.zipWithIndex.foreach { case ((tag, typ, cnt, kind), i) =>
        val value = kind match {
          case "orient" => u16(orient, le) ++ u16(0, le)
          case "make"   => u32(makeOff, le)
          case "gps"    => u32(gpsOff, le)
          case _        => u16(7, le) ++ u16(0, le)
        }
        put(8 + 2 + i * 12, entry(tag, typ, cnt, value, le))
      }
      put(8 + 2 + n * 12, u32(0, le))
      put(makeOff, (makeStr + "\u0000").getBytes("US-ASCII"))
      if (withGps) {
        put(gpsOff, u16(1, le))
        put(gpsOff + 2, entry(0x0002, 5, 3, u32(gpsValOff, le), le))
        put(gpsOff + 2 + 12, u32(0, le))
        put(gpsValOff, u32(rnd.nextInt(90), le) ++ u32(1, le))
      }
      val img = jpegWith(b)
      val m = Exif.meta(img)
      assert(m.orientation.contains(orient) && m.make.contains(makeStr) &&
        m.hasGps == withGps, s"case $c le=$le n=$n: $m")
      val scrubbed = Exif.stripGps(img)
      assert(!Exif.meta(scrubbed).hasGps, s"case $c: gps survives scrub")
      if (!withGps) assert(scrubbed eq img, s"case $c: gps-free must be untouched")
      else {
        val m2 = Exif.meta(scrubbed)
        assert(m2.orientation.contains(orient) && m2.make.contains(makeStr),
          s"case $c: scrub damaged other metadata: $m2")
      }
    }
  }

  test("column API: meta struct + scrub over a binary column") {
    val df = Seq(
      ("gps", jpegWith(tiffBlob(le = true))),
      ("plain", Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))).toDF("id", "img")
    val got = df.select($"id",
        Exif.exifMeta($"img").as("m"),
        Exif.exifMeta(Exif.exifStripGps($"img")).as("s"))
      .selectExpr("id", "m._5 as had", "s._5 as has")
      .as[(String, Boolean, Boolean)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == Map("gps" -> (true, false), "plain" -> (false, false)))
  }
}
