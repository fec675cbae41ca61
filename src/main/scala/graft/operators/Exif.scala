package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** JPEG EXIF metadata — the in-band provenance/privacy channel of an
  * image corpus, the JPEG twin of M4's PNG tEXt reader: `meta` surfaces
  * orientation/make/model/datetime and whether a GPS IFD is present
  * (curation filters on it), and `stripGps` REMOVES location data —
  * images uploaded with GPS coordinates are location PII, and a
  * training corpus must be able to scrub them without re-encoding
  * pixels. Self-contained segment/IFD walking of the public JPEG (ISO
  * 10918 marker stream) and TIFF 6.0 grammars, both byte orders — no
  * codec libraries, the tar/WARC/PNG/WAV discipline: untrusted lengths
  * and offsets are bounds-checked and fail loud with position context;
  * absent metadata is data (None/false), structural corruption is an
  * error.
  *
  * `stripGps` is IN-PLACE surgery on a copy: the GPS IFD's out-of-line
  * values, then its entry table, are zeroed, and IFD0's GPS-pointer tag
  * is re-tagged to a private no-op id — every byte offset in the file
  * stays valid (TIFF offsets are absolute), pixels and all other
  * metadata are untouched, and the output is byte-identical to the
  * input when there was no GPS to strip. Scala-side byte work wrapped
  * as UDFs for the column API — the documented imperative-byte-work
  * exception (zlib/WAV/PNG precedent); the hot path is one pass over
  * each payload.
  */
object Exif {

  final case class Meta(orientation: Option[Int], make: Option[String],
      model: Option[String], datetime: Option[String], hasGps: Boolean)

  private val Empty = Meta(None, None, None, None, hasGps = false)

  /** Parse EXIF out of a JPEG payload. Non-JPEG bytes throw; a JPEG
    * without an Exif APP1 segment returns the empty Meta.
    */
  def meta(jpeg: Array[Byte]): Meta =
    tiffRegion(jpeg) match {
      case None => Empty
      case Some((base, limit)) => parseTiff(jpeg, base, limit)
    }

  /** Scrub location data: returns a copy with the GPS IFD neutralized,
    * or the input array itself when no GPS IFD exists. All other bytes
    * (pixels, other metadata) are untouched.
    */
  def stripGps(jpeg: Array[Byte]): Array[Byte] =
    tiffRegion(jpeg) match {
      case None => jpeg
      case Some((base, limit)) =>
        gpsPointer(jpeg, base, limit) match {
          case None => jpeg
          case Some((entryPos, gpsIfdPos)) =>
            val out = jpeg.clone()
            val t = Tiff(out, base, limit)
            // zero each GPS entry's out-of-line value, then the table
            val n = t.u16(gpsIfdPos)
            // the final table fill spans the whole IFD (count word, n
            // entries, next-IFD pointer); a truncated GPS IFD must fail
            // loud here, not silently zero the next JPEG segment
            require(gpsIfdPos + 2 + n * 12 + 4 <= limit,
              s"corrupt GPS IFD at $gpsIfdPos: $n entries run past the TIFF region")
            for (i <- 0 until n) {
              val e = gpsIfdPos + 2 + i * 12
              val typ = t.u16(e + 2)
              val cnt = t.u32(e + 4)
              val sz = typeSize.getOrElse(typ, 1L) * cnt
              if (sz > 4) {
                val off = base + t.u32(e + 8)
                require(off + sz <= limit,
                  s"corrupt GPS entry at $e: value runs past the TIFF region")
                java.util.Arrays.fill(out, off.toInt, (off + sz).toInt, 0.toByte)
              }
            }
            java.util.Arrays.fill(out, gpsIfdPos, gpsIfdPos + 2 + n * 12 + 4, 0.toByte)
            // re-tag IFD0's GPS pointer to a private no-op tag id so no
            // reader follows it; entry count/offsets all stay valid
            t.putU16(entryPos, 0xEA1C)
            out
        }
    }

  /** exif struct column: (orientation, make, model, datetime, has_gps). */
  def exifMeta(c: Column): Column = metaUdf(c)

  /** binary column with GPS scrubbed (byte-identical when GPS-free). */
  def exifStripGps(c: Column): Column = stripUdf(c)

  private lazy val metaUdf = udf { (b: Array[Byte]) =>
    if (b == null) None
    else {
      val m = meta(b)
      Some((m.orientation, m.make, m.model, m.datetime, m.hasGps))
    }
  }
  private lazy val stripUdf = udf { (b: Array[Byte]) =>
    if (b == null) null else stripGps(b)
  }

  // ---- pipeline lane (the Html.ExtractStage precedent) ----

  final case class Image(key: String, jpeg: Array[Byte])
  final case class ImageScrubbed(key: String, jpeg: Array[Byte],
      orientation: Option[Int], make: Option[String], hadGps: Boolean)

  /** Stage form for `PipelineSpec` lanes: per image, surface the
    * curation metadata and ship the GPS-scrubbed bytes onward.
    */
  final class ScrubStage(override val batchSize: Int = 64)
      extends graft.api.Stage[Image, ImageScrubbed] {
    override def process(batch: Seq[Image]): Seq[ImageScrubbed] =
      batch.map { img =>
        val m = meta(img.jpeg)
        ImageScrubbed(img.key, stripGps(img.jpeg),
          m.orientation, m.make, m.hasGps)
      }
  }

  // ---- JPEG marker walk ----

  /** The TIFF blob inside the Exif APP1 segment as (absolute base,
    * absolute end), or None when the JPEG carries no EXIF. The walk
    * stops at SOS — APP segments precede entropy-coded data.
    */
  private def tiffRegion(jpeg: Array[Byte]): Option[(Int, Int)] = {
    require(jpeg.length >= 4 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG (missing SOI)")
    var at = 2
    while (at + 4 <= jpeg.length) {
      require((jpeg(at) & 0xff) == 0xff, s"corrupt JPEG: expected marker at $at")
      val marker = jpeg(at + 1) & 0xff
      if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        at += 2 // standalone markers carry no length
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI, or SOS: no EXIF before image data -> none
      } else {
        val len = ((jpeg(at + 2) & 0xff) << 8) | (jpeg(at + 3) & 0xff)
        require(len >= 2 && at + 2 + len <= jpeg.length,
          s"corrupt JPEG segment 0x${marker.toHexString} at $at: declared size $len exceeds payload")
        if (marker == 0xe1 && len >= 8 &&
            new String(jpeg, at + 4, 4, "US-ASCII") == "Exif" &&
            jpeg(at + 8) == 0 && jpeg(at + 9) == 0)
          return Some((at + 10, at + 2 + len))
        at += 2 + len
      }
    }
    None
  }

  // ---- TIFF IFD walk ----

  private val typeSize = Map(1 -> 1L, 2 -> 1L, 3 -> 2L, 4 -> 4L, 5 -> 8L,
    6 -> 1L, 7 -> 1L, 8 -> 2L, 9 -> 4L, 10 -> 8L, 11 -> 4L, 12 -> 8L)

  /** Bounds-checked primitive reads over the TIFF region, honoring its
    * declared byte order.
    */
  private final case class Tiff(b: Array[Byte], base: Int, limit: Int) {
    val little: Boolean = {
      require(base + 8 <= limit, "TIFF region too short for its header")
      val order = new String(b, base, 2, "US-ASCII")
      require(order == "II" || order == "MM", s"bad TIFF byte order '$order'")
      order == "II"
    }
    require(u16(base + 2) == 42, "bad TIFF magic")
    def u16(at: Int): Int = {
      require(at >= base && at + 2 <= limit, s"TIFF read past region at $at")
      val x = (b(at) & 0xff, b(at + 1) & 0xff)
      if (little) (x._2 << 8) | x._1 else (x._1 << 8) | x._2
    }
    def u32(at: Int): Long = {
      require(at >= base && at + 4 <= limit, s"TIFF read past region at $at")
      val v = (0 until 4).map(i => (b(at + i) & 0xffL))
      if (little) (v(3) << 24) | (v(2) << 16) | (v(1) << 8) | v(0)
      else (v(0) << 24) | (v(1) << 16) | (v(2) << 8) | v(3)
    }
    def putU16(at: Int, v: Int): Unit = {
      if (little) { b(at) = (v & 0xff).toByte; b(at + 1) = ((v >> 8) & 0xff).toByte }
      else { b(at) = ((v >> 8) & 0xff).toByte; b(at + 1) = (v & 0xff).toByte }
    }
    def ascii(at: Int, count: Long): String = {
      require(at >= base && at + count <= limit, s"TIFF string past region at $at")
      val raw = new String(b, at, count.toInt, "US-ASCII")
      val nul = raw.indexOf('\u0000')
      if (nul >= 0) raw.substring(0, nul) else raw
    }
  }

  /** IFD0's GPS-pointer entry as (absolute entry position, absolute GPS
    * IFD position) — None when the file has no GPS IFD.
    */
  private def gpsPointer(b: Array[Byte], base: Int, limit: Int): Option[(Int, Int)] = {
    val t = Tiff(b, base, limit)
    val ifd0 = base + t.u32(base + 4).toInt
    val n = t.u16(ifd0)
    (0 until n).iterator.map(i => ifd0 + 2 + i * 12).collectFirst {
      case e if t.u16(e) == 0x8825 => (e, base + t.u32(e + 8).toInt)
    }
  }

  private def parseTiff(b: Array[Byte], base: Int, limit: Int): Meta = {
    val t = Tiff(b, base, limit)
    val ifd0 = base + t.u32(base + 4).toInt
    val n = t.u16(ifd0)
    var m = Empty
    for (i <- 0 until n) {
      val e = ifd0 + 2 + i * 12
      val tag = t.u16(e)
      val typ = t.u16(e + 2)
      val cnt = t.u32(e + 4)
      def asciiVal: Option[String] = {
        if (typ != 2 || cnt == 0) None
        else if (cnt <= 4) Some(t.ascii(e + 8, cnt))
        else Some(t.ascii(base + t.u32(e + 8).toInt, cnt))
      }
      tag match {
        case 0x0112 if typ == 3 => m = m.copy(orientation = Some(t.u16(e + 8)))
        case 0x010f => m = m.copy(make = asciiVal)
        case 0x0110 => m = m.copy(model = asciiVal)
        case 0x0132 => m = m.copy(datetime = asciiVal)
        case 0x8825 => m = m.copy(hasGps = true)
        case _ =>
      }
    }
    m
  }
}
