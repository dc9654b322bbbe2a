package graft.multimodal

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal columns: image/audio/video payloads ride as opaque
  * `binary` columns next to relational ones; decode / feature-extract
  * runs as a per-partition batch pipeline (`mapPartitions`), which is
  * where a real deployment hands batches to a native codec or an
  * inference runtime.
  *
  * The decode step is REAL: [[Multimodal.parseHeader]] parses the
  * actual PNG / JPEG / GIF binary formats (magic bytes, chunk CRCs,
  * JPEG marker scan) — the metadata pass a 100 TB pipeline runs over
  * every payload before deciding what to ship to a full codec. The
  * matching writers ([[pngBytes]] / [[jpegBytes]] / [[gifBytes]])
  * produce spec-conformant bytes (PNG output is decodable by any
  * standard codec — ScalaTest cross-checks both directions against the
  * JDK's independent `javax.imageio` implementation). Full pixel
  * decode of arbitrary codecs is the one step that still needs a
  * native library in production; everything up to it is real here.
  */
case class MediaRow(doc_id: Long, payload: Array[Byte])

case class ImageHeader(format: String, width: Int, height: Int)

case class MediaFeatures(doc_id: Long, n_bytes: Int, format: String,
                         width: Option[Int], height: Option[Int],
                         mean_byte: Double)

object Multimodal {

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  // ---------------------------------------------------------------- writers

  /** A complete, decodable PNG: signature, IHDR (8-bit RGB), one IDAT
    * with filter-0 scanlines deflate-compressed, IEND — every chunk
    * CRC32-stamped per the PNG spec. Deterministic for (w, h, fill).
    */
  def pngBytes(w: Int, h: Int, fill: Byte = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(PngSig)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      out.writeInt(body.length)
      val tb = typ.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body); out.writeInt(crc.getValue.toInt)
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.array())
    val stride = 1 + 3 * w
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      var x = 1
      while (x < stride) { raw(y * stride + x) = fill; x += 1 }
      y += 1
    }
    val defl = new Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** A JFIF marker stream carrying real SOI / APP0 / SOF0 / EOI
    * segments with the dimensions in the SOF0 frame header — the part
    * of a JPEG every metadata scanner reads. (No entropy-coded scan is
    * emitted, so this is header-parseable but not pixel-decodable;
    * [[parseHeader]] is cross-validated against full ImageIO-encoded
    * JPEGs in ScalaTest.)
    */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dimensions ${w}x$h")
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeShort(0xffd8) // SOI
    out.writeShort(0xffe0) // APP0
    out.writeShort(16)
    out.write("JFIF".getBytes("US-ASCII")); out.writeByte(0)
    out.writeShort(0x0101) // version 1.1
    out.writeByte(0)       // density units
    out.writeShort(1); out.writeShort(1) // x/y density
    out.writeByte(0); out.writeByte(0)   // no thumbnail
    out.writeShort(0xffc0) // SOF0: baseline frame header
    out.writeShort(8 + 3 * 3)
    out.writeByte(8)       // precision
    out.writeShort(h); out.writeShort(w)
    out.writeByte(3)       // components: YCbCr
    var c = 1
    while (c <= 3) { out.writeByte(c); out.writeByte(0x11); out.writeByte(0); c += 1 }
    out.writeShort(0xffd9) // EOI
    bos.toByteArray
  }

  /** GIF89a header + logical screen descriptor (little-endian u16
    * dimensions) + trailer. */
  def gifBytes(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dimensions ${w}x$h")
    val b = new ByteArrayOutputStream()
    b.write("GIF89a".getBytes("US-ASCII"))
    b.write(w & 0xff); b.write((w >> 8) & 0xff)
    b.write(h & 0xff); b.write((h >> 8) & 0xff)
    b.write(0); b.write(0); b.write(0) // no GCT, bg 0, aspect 0
    b.write(0x3b)                      // trailer
    b.toByteArray
  }

  // ---------------------------------------------------------------- parser

  /** Real image-header decode: sniff the magic bytes, then parse the
    * format's own structure — PNG IHDR (with CRC verification), JPEG
    * marker scan to the first frame header (SOFn), GIF logical screen
    * descriptor. Returns None for anything that is not a structurally
    * valid image header (truncated, corrupt CRC, or non-image bytes).
    */
  def parseHeader(p: Array[Byte]): Option[ImageHeader] = {
    if (p.length >= 33 && p.startsWith(PngSig)) parsePng(p)
    else if (p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
      parseJpeg(p)
    else if (p.length >= 11 &&
      (bytesStartWith(p, "GIF87a") || bytesStartWith(p, "GIF89a"))) parseGif(p)
    else None
  }

  private def bytesStartWith(p: Array[Byte], s: String): Boolean = {
    val b = s.getBytes("US-ASCII")
    p.length >= b.length && java.util.Arrays.equals(p, 0, b.length, b, 0, b.length)
  }

  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)

  private def parsePng(p: Array[Byte]): Option[ImageHeader] = {
    // layout: sig(8) len(4) "IHDR"(4) body(13) crc(4) — dims at 16/20
    if (be32(p, 8) != 13) return None
    if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')) return None
    val crc = new CRC32()
    crc.update(p, 12, 4 + 13)
    if (crc.getValue.toInt != be32(p, 29)) return None // corrupt IHDR
    val w = be32(p, 16); val h = be32(p, 20)
    if (w <= 0 || h <= 0) None else Some(ImageHeader("png", w, h))
  }

  private def parseJpeg(p: Array[Byte]): Option[ImageHeader] = {
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xff) != 0xff) return None // marker misalignment: corrupt
      var m = p(i + 1) & 0xff
      while (m == 0xff && i + 2 < p.length) { i += 1; m = p(i + 1) & 0xff } // fill bytes
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone markers
      else if (m == 0xd9) return None                   // EOI before any frame header
      else {
        if (i + 3 >= p.length) return None
        val len = be16(p, i + 2)
        if (len < 2) return None
        // SOFn (frame header) carries the dimensions; C4/C8/CC are
        // huffman/arithmetic tables, not frames.
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 9 > p.length) return None
          val h = be16(p, i + 5); val w = be16(p, i + 7)
          return if (w <= 0 || h <= 0) None else Some(ImageHeader("jpeg", w, h))
        }
        i += 2 + len
      }
    }
    None
  }

  private def parseGif(p: Array[Byte]): Option[ImageHeader] = {
    val w = (p(6) & 0xff) | ((p(7) & 0xff) << 8)
    val h = (p(8) & 0xff) | ((p(9) & 0xff) << 8)
    if (w <= 0 || h <= 0) None else Some(ImageHeader("gif", w, h))
  }

  // ---------------------------------------------------------------- pipeline

  /** Partition-batched feature extraction over the binary column: real
    * header decode + byte statistics. Non-image payloads surface as
    * format="unknown" with null dimensions (filterable downstream)
    * rather than failing the batch.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // One iterator per partition: amortizes any per-batch setup a real
      // decoder needs (codec contexts, model sessions, pinned buffers).
      it.map { m =>
        val hdr = parseHeader(m.payload)
        var sum = 0L
        var i = 0
        while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
        val mean = if (m.payload.length == 0) 0.0 else sum.toDouble / m.payload.length
        MediaFeatures(m.doc_id, m.payload.length,
          hdr.map(_.format).getOrElse("unknown"),
          hdr.map(_.width), hdr.map(_.height), mean)
      }
    }(Encoders.product[MediaFeatures])

  def extractFeaturesDF(df: DataFrame): DataFrame =
    extractFeatures(df.as[MediaRow](Encoders.product[MediaRow])).toDF()
}
