package graft.multimodal

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

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

case class AudioHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       nFrames: Long)

case class AudioFeatures(doc_id: Long, n_bytes: Int,
                         sample_rate: Option[Int], channels: Option[Int],
                         bits_per_sample: Option[Int], n_frames: Option[Long],
                         duration_ms: Option[Double], rms: Option[Double])

case class VideoHeader(brand: String, timescale: Int, duration: Long,
                       nTracks: Int, width: Int, height: Int)

case class VideoFeatures(doc_id: Long, n_bytes: Int, brand: Option[String],
                         timescale: Option[Int], duration: Option[Long],
                         duration_ms: Option[Double], n_tracks: Option[Int],
                         width: Option[Int], height: Option[Int])

/** Decoded `stbl` sample metadata of one MP4 track: the media
  * timescale (`mdhd`), the run-length decoding times (`stts` entries as
  * (sample_count, sample_delta) runs) and per-sample byte sizes
  * (`stsz`). Everything frame SAMPLING needs — picking which frames to
  * decode — without touching a codec.
  */
case class Mp4SampleTable(timescale: Int, sttsRuns: Array[(Int, Int)],
                          sizes: Array[Int])

case class FrameSample(doc_id: Long, frame_idx: Long, pts: Long,
                       pts_ms: Double, size: Long)

/** One WAV through the decode→downsample→re-encode pipeline: input
  * rate/frames from the decoded header, output rate/frames re-parsed
  * from the RE-ENCODED bytes, and PCM min/max over the re-decoded
  * resampled samples — pixel-level proof for the audio path.
  */
case class ResampledAudio(doc_id: Long, sample_rate: Int, out_rate: Int,
                          in_frames: Long, out_frames: Long,
                          pcm_min: Int, pcm_max: Int)

/** One image through the decode→resize→re-encode pipeline: input
  * geometry from the decoded IHDR, output geometry re-parsed from the
  * RE-ENCODED bytes, and pixel-value evidence (min/max over the
  * inflated samples of the RESIZED image) proving the pixels — not
  * just headers — survived the round trip.
  */
case class ResizedImage(doc_id: Long, width: Int, height: Int,
                        out_w: Int, out_h: Int, px_min: Int, px_max: Int)

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

  /** A complete RIFF/WAVE file: canonical 44-byte header (RIFF size,
    * "WAVE", PCM `fmt ` chunk, `data` chunk) followed by 16-bit
    * little-endian PCM frames. Samples are a deterministic integer
    * sawtooth per (frame, channel) so every byte is a pure function of
    * the arguments — decodable by any standard WAV reader (ScalaTest
    * cross-checks against the JDK's independent `javax.sound.sampled`
    * implementation).
    */
  def wavBytes(sampleRate: Int, channels: Int, nFrames: Int,
               tone: Int = 1): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0 && tone > 0,
      s"bad wav params sr=$sampleRate ch=$channels frames=$nFrames tone=$tone")
    val blockAlign = channels * 2
    val dataSize = nFrames * blockAlign
    val b = ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)   // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16)                      // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        b.putShort(pcmSample(i, c, tone))
        c += 1
      }
      i += 1
    }
    b.array()
  }

  /** The deterministic test waveform: a ±30000 sawtooth whose period
    * depends on `tone`, phase-shifted per channel. Pure integer math so
    * writer, parser tests, and the SQL oracle can all recompute it. */
  def pcmSample(frame: Int, channel: Int, tone: Int): Short =
    ((((frame * tone + channel * 37) % 200) - 100) * 300).toShort

  /** A structurally valid ISO-BMFF (MP4) file per ISO/IEC 14496-12:
    * `ftyp` (brand), `moov` [`mvhd` v0 (timescale, duration) + one
    * `trak`/`tkhd` v0 per track (track_id, 16.16 fixed-point w×h)],
    * and an `mdat` whose payload is a deterministic byte ramp. Every
    * box carries its correct 32-bit big-endian size, so any standard
    * box walker (ffprobe, mp4dump) reads the same fields
    * [[parseMp4Header]] does. Deterministic for the arguments.
    */
  def mp4Bytes(timescale: Int, duration: Long,
               tracks: Seq[(Int, Int, Int)], mdatLen: Int = 16): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && tracks.nonEmpty && mdatLen >= 0,
      s"bad mp4 params ts=$timescale dur=$duration tracks=${tracks.size}")
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      b.array()
    })
    // mvhd version 0: 100-byte box body per spec (version/flags, times,
    // timescale, duration, rate, volume, matrix, next_track_ID).
    val mvhd = box("mvhd", {
      val b = ByteBuffer.allocate(100)
      b.putInt(0)                      // version 0 + flags
      b.putInt(0).putInt(0)            // creation/modification time
      b.putInt(timescale)
      b.putInt(duration.toInt)
      b.putInt(0x00010000)             // rate 1.0
      b.putShort(0x0100.toShort)       // volume 1.0
      b.position(b.position() + 10)    // reserved
      b.putInt(0x00010000).putInt(0).putInt(0) // unity matrix
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.position(b.position() + 24)    // pre_defined
      b.putInt(tracks.map(_._1).max + 1) // next_track_ID
      b.array()
    })
    val traks = tracks.map { case (id, w, h) =>
      require(id > 0 && w > 0 && h > 0 && w <= 0x7fff && h <= 0x7fff,
        s"bad track ($id, $w, $h)")
      // tkhd version 0: 84-byte body (times, track_ID, duration, layer,
      // volume, matrix, 16.16 fixed-point width/height).
      box("trak", box("tkhd", {
        val b = ByteBuffer.allocate(84)
        b.putInt(0x000007)             // version 0, flags: enabled|in-movie|in-preview
        b.putInt(0).putInt(0)          // creation/modification time
        b.putInt(id)
        b.putInt(0)                    // reserved
        b.putInt(duration.toInt)
        b.position(b.position() + 8)   // reserved
        b.putShort(0).putShort(0)      // layer, alternate_group
        b.putShort(0).putShort(0)      // volume (video), reserved
        b.putInt(0x00010000).putInt(0).putInt(0)
        b.putInt(0).putInt(0x00010000).putInt(0)
        b.putInt(0).putInt(0).putInt(0x40000000)
        b.putInt(w << 16).putInt(h << 16)
        b.array()
      }))
    }
    val moov = box("moov", (mvhd +: traks).reduce(_ ++ _))
    val mdat = box("mdat", Array.tabulate(mdatLen)(i => (i * 7 & 0xff).toByte))
    ftyp ++ moov ++ mdat
  }

  private def bmffBox(typ: String, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + body.length)
    b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
    b.array()
  }

  /** A structurally valid single-track MP4 WITH a full sample table:
    * `ftyp` + `moov`[`mvhd` + `trak`[`tkhd` + `mdia`[`mdhd` + `hdlr`
    * ('vide') + `minf`[`stbl`[`stsd`, `stts` (one uniform run of
    * `sizes.length` samples at `delta` ticks), `stsz` (per-sample
    * sizes), `stsc`, `stco` (correct absolute chunk offset)]]]]] +
    * `mdat` holding the concatenated sample payloads. This is the
    * metadata a real demuxer seeks frames with; deterministic for the
    * arguments.
    */
  def mp4BytesWithSamples(timescale: Int, delta: Int, sizes: Seq[Int],
                          w: Int, h: Int): Array[Byte] = {
    require(timescale > 0 && delta > 0 && sizes.nonEmpty &&
      sizes.forall(_ >= 0) && w > 0 && h > 0 && w <= 0x7fff && h <= 0x7fff,
      s"bad mp4 sample params ts=$timescale d=$delta n=${sizes.size}")
    val n = sizes.size
    val duration = n.toLong * delta
    val ftyp = bmffBox("ftyp", {
      val b = ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      b.array()
    })
    val mvhd = bmffBox("mvhd", {
      val b = ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(timescale).putInt(duration.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort)
      b.position(b.position() + 10)
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.position(b.position() + 24)
      b.putInt(2)                        // next_track_ID
      b.array()
    })
    val tkhd = bmffBox("tkhd", {
      val b = ByteBuffer.allocate(84)
      b.putInt(0x000007).putInt(0).putInt(0)
      b.putInt(1)                        // track_ID
      b.putInt(0).putInt(duration.toInt)
      b.position(b.position() + 8)
      b.putShort(0).putShort(0).putShort(0).putShort(0)
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(w << 16).putInt(h << 16)
      b.array()
    })
    val mdhd = bmffBox("mdhd", {
      val b = ByteBuffer.allocate(24)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(timescale).putInt(duration.toInt)
      b.putShort(0x55c4.toShort).putShort(0) // language 'und', pre_defined
      b.array()
    })
    val hdlr = bmffBox("hdlr", {
      val b = ByteBuffer.allocate(25)
      b.putInt(0).putInt(0).put("vide".getBytes("US-ASCII"))
      b.position(b.position() + 12)
      b.put(0.toByte)                    // empty NUL-terminated name
      b.array()
    })
    val stsd = bmffBox("stsd",
      ByteBuffer.allocate(8).putInt(0).putInt(0).array())
    val stts = bmffBox("stts", {
      val b = ByteBuffer.allocate(16)
      b.putInt(0).putInt(1).putInt(n).putInt(delta)
      b.array()
    })
    val stsz = bmffBox("stsz", {
      val b = ByteBuffer.allocate(12 + 4 * n)
      b.putInt(0).putInt(0).putInt(n)
      sizes.foreach(b.putInt)
      b.array()
    })
    val stsc = bmffBox("stsc", {
      val b = ByteBuffer.allocate(20)
      b.putInt(0).putInt(1).putInt(1).putInt(n).putInt(1)
      b.array()
    })
    def assemble(chunkOff: Int): Array[Byte] = {
      val stco = bmffBox("stco",
        ByteBuffer.allocate(12).putInt(0).putInt(1).putInt(chunkOff).array())
      val stbl = bmffBox("stbl", stsd ++ stts ++ stsz ++ stsc ++ stco)
      val minf = bmffBox("minf", stbl)
      val mdia = bmffBox("mdia", mdhd ++ hdlr ++ minf)
      val trak = bmffBox("trak", tkhd ++ mdia)
      bmffBox("moov", mvhd ++ trak)
    }
    // stco points into mdat, whose offset depends on moov's (fixed)
    // size: assemble once to measure, once with the real offset.
    val moovLen = assemble(0).length
    val moov = assemble(ftyp.length + moovLen + 8)
    val payload = Array.tabulate(sizes.sum)(i => (i * 3 & 0xff).toByte)
    ftyp ++ moov ++ bmffBox("mdat", payload)
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

  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)

  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  /** Real RIFF/WAVE header decode: verify the RIFF/WAVE framing, walk
    * the chunk list (word-aligned, per spec), read PCM parameters from
    * `fmt ` and the frame count from `data`. Returns None for
    * truncated, non-RIFF, or non-PCM payloads — never throws on
    * arbitrary bytes.
    */
  def parseWavHeader(p: Array[Byte]): Option[AudioHeader] = {
    if (p.length < 44 || !bytesStartWith(p, "RIFF")) return None
    if (!(p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')) return None
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, align, bits
    var dataSize = -1L
    var i = 12
    while (i + 8 <= p.length) {
      val size = le32(p, i + 4).toLong & 0xffffffffL
      val body = i + 8
      if (p(i) == 'f' && p(i + 1) == 'm' && p(i + 2) == 't' && p(i + 3) == ' ') {
        if (size < 16 || body + 16 > p.length) return None
        if (le16(p, body) != 1) return None // PCM only; no codec payloads
        fmt = Some((le16(p, body + 2), le32(p, body + 4),
          le16(p, body + 12), le16(p, body + 14)))
      } else if (p(i) == 'd' && p(i + 1) == 'a' &&
          p(i + 2) == 't' && p(i + 3) == 'a') {
        if (body + size > p.length) return None // truncated data chunk
        dataSize = size
      }
      // Word-aligned advance, computed in Long: size near 2³² truncates
      // to a negative Int and stalls (or reverses) the walk — reject,
      // never spin on a corrupt payload.
      val next = body.toLong + size + (size & 1)
      if (next <= i || next > p.length) return None
      i = next.toInt
    }
    fmt match {
      case Some((ch, rate, align, bits)) if dataSize >= 0 &&
          ch > 0 && rate > 0 && align == ch * ((bits + 7) / 8) && bits > 0 =>
        Some(AudioHeader(rate, ch, bits, dataSize / align))
      case _ => None
    }
  }

  /** Real ISO-BMFF (MP4) header decode: walk the top-level box list by
    * declared sizes, require a leading `ftyp`, then inside `moov` read
    * the movie timescale/duration from `mvhd` (v0/v1) and count `trak`
    * boxes, taking presentation dimensions from the first `tkhd` with a
    * nonzero 16.16 fixed-point width×height. Returns None for
    * truncated, misaligned, or non-BMFF payloads — never throws on
    * arbitrary bytes. This is the metadata pass a 100 TB video pipeline
    * runs before deciding which payloads to hand to a real demuxer.
    */
  def parseMp4Header(p: Array[Byte]): Option[VideoHeader] = {
    if (p.length < 16) return None
    if (!(p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p')) return None
    val ftypSize = be32(p, 0)
    if (ftypSize < 16 || ftypSize > p.length) return None
    val brand = new String(p, 8, 4, "US-ASCII")
    if (!brand.forall(c => c >= 0x20 && c < 0x7f)) return None
    var timescale = 0
    var duration = -1L
    var nTracks = 0
    var w = 0
    var h = 0
    var i = ftypSize
    while (i + 8 <= p.length) {
      val size = be32(p, i).toLong & 0xffffffffL
      if (size < 8 || i + size > p.length) return None // corrupt box framing
      if (p(i + 4) == 'm' && p(i + 5) == 'o' && p(i + 6) == 'o' && p(i + 7) == 'v') {
        // walk moov children
        var j = i + 8
        val end = i + size.toInt
        while (j + 8 <= end) {
          val cs = be32(p, j).toLong & 0xffffffffL
          if (cs < 8 || j + cs > end) return None
          val typ = new String(p, j + 4, 4, "US-ASCII")
          if (typ == "mvhd") {
            if (j + 8 >= end) return None
            val version = p(j + 8) & 0xff
            if (version == 1) {
              if (j + 8 + 28 + 8 > end) return None
              timescale = be32(p, j + 8 + 20)
              duration = (be32(p, j + 8 + 24).toLong << 32) |
                (be32(p, j + 8 + 28).toLong & 0xffffffffL)
            } else {
              if (j + 8 + 12 + 4 > end) return None
              timescale = be32(p, j + 8 + 12)
              duration = be32(p, j + 8 + 16).toLong & 0xffffffffL
            }
          } else if (typ == "trak") {
            nTracks += 1
            // find tkhd inside this trak
            var k = j + 8
            val tEnd = j + cs.toInt
            while (k + 8 <= tEnd) {
              val ts = be32(p, k).toLong & 0xffffffffL
              if (ts < 8 || k + ts > tEnd) return None
              if (p(k + 4) == 't' && p(k + 5) == 'k' &&
                  p(k + 6) == 'h' && p(k + 7) == 'd') {
                val version = p(k + 8) & 0xff
                // width/height are the final 8 body bytes in v0 and v1
                val dimOff = k + 8 + (if (version == 1) 96 else 84) - 8
                if (dimOff + 8 <= tEnd && w == 0 && h == 0) {
                  val tw = be32(p, dimOff) >>> 16   // 16.16 fixed point
                  val th = be32(p, dimOff + 4) >>> 16
                  if (tw > 0 && th > 0) { w = tw; h = th }
                }
              }
              k += ts.toInt
            }
          }
          j += cs.toInt
        }
      }
      i += size.toInt
    }
    if (timescale <= 0 || duration < 0) None
    else Some(VideoHeader(brand, timescale, duration, nTracks, w, h))
  }

  /** First child box of `typ` inside body range [start, end): returns
    * the CHILD's body range. None on corrupt framing (size < 8 or
    * overrunning the parent) — never throws on arbitrary bytes.
    */
  private def findBox(p: Array[Byte], start: Int, end: Int,
                      typ: String): Option[(Int, Int)] = {
    var i = start
    while (i + 8 <= end) {
      val size = be32(p, i).toLong & 0xffffffffL
      if (size < 8 || i + size > end) return None
      if (p(i + 4) == typ.charAt(0) && p(i + 5) == typ.charAt(1) &&
          p(i + 6) == typ.charAt(2) && p(i + 7) == typ.charAt(3))
        return Some((i + 8, i + size.toInt))
      i += size.toInt
    }
    None
  }

  /** Real `stbl` decode of the first track: media timescale from
    * `mdhd` (v0/v1), decoding-time runs from `stts`, per-sample sizes
    * from `stsz` (uniform or per-sample form). This is everything frame
    * SAMPLING needs — a pipeline picks frame indices/offsets from the
    * sample table alone and hands only those byte ranges to a codec.
    * Returns None for truncated/misaligned/non-BMFF payloads.
    */
  def parseMp4SampleTable(p: Array[Byte]): Option[Mp4SampleTable] = {
    if (p.length < 16) return None
    if (!(p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p')) return None
    val ftypSize = be32(p, 0)
    if (ftypSize < 16 || ftypSize > p.length) return None
    for {
      moov <- findBox(p, ftypSize, p.length, "moov")
      trak <- findBox(p, moov._1, moov._2, "trak")
      mdia <- findBox(p, trak._1, trak._2, "mdia")
      mdhd <- findBox(p, mdia._1, mdia._2, "mdhd")
      minf <- findBox(p, mdia._1, mdia._2, "minf")
      stbl <- findBox(p, minf._1, minf._2, "stbl")
      stts <- findBox(p, stbl._1, stbl._2, "stts")
      stsz <- findBox(p, stbl._1, stbl._2, "stsz")
      tsc <- {
        val v = p(mdhd._1) & 0xff
        val off = mdhd._1 + (if (v == 1) 20 else 12)
        if (off + 4 <= mdhd._2) Some(be32(p, off)).filter(_ > 0) else None
      }
      runs <- {
        if (stts._1 + 8 > stts._2) None
        else {
          val nEntries = be32(p, stts._1 + 4)
          if (nEntries < 0 || stts._1 + 8 + 8L * nEntries > stts._2) None
          else Some(Array.tabulate(nEntries) { e =>
            (be32(p, stts._1 + 8 + 8 * e), be32(p, stts._1 + 12 + 8 * e))
          })
        }
      }
      sizes <- {
        if (stsz._1 + 12 > stsz._2) None
        else {
          val uniform = be32(p, stsz._1 + 4)
          val count = be32(p, stsz._1 + 8)
          if (count < 0) None
          else if (uniform != 0) Some(Array.fill(count)(uniform))
          else if (stsz._1 + 12 + 4L * count > stsz._2) None
          else Some(Array.tabulate(count)(e => be32(p, stsz._1 + 12 + 4 * e)))
        }
      }
    } yield Mp4SampleTable(tsc, runs, sizes)
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

  /** Audio branch of the same partition-batched pipeline: RIFF/WAVE
    * header decode plus a REAL pass over the 16-bit PCM samples (RMS) —
    * the cheap full-decode statistic a filter stage computes before
    * shipping audio to an expensive model. Non-WAV payloads surface
    * with null fields rather than failing the batch.
    */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] =
    media.mapPartitions { it =>
      it.map { m =>
        val hdr = parseWavHeader(m.payload)
        val rms = hdr.filter(h => h.bitsPerSample == 16 && h.nFrames > 0)
          .map { h =>
            val n = h.nFrames * h.channels
            val dataOff = findDataOffset(m.payload)
            var ss = 0.0
            var i = 0L
            while (i < n) {
              val s = le16(m.payload, (dataOff + i * 2).toInt).toShort.toDouble
              ss += s * s
              i += 1
            }
            math.sqrt(ss / n)
          }
        AudioFeatures(m.doc_id, m.payload.length,
          hdr.map(_.sampleRate), hdr.map(_.channels),
          hdr.map(_.bitsPerSample), hdr.map(_.nFrames),
          hdr.map(h => h.nFrames * 1000.0 / h.sampleRate), rms)
      }
    }(Encoders.product[AudioFeatures])

  /** Video branch of the partition-batched pipeline: ISO-BMFF box-walk
    * decode (brand, movie timescale/duration, track count, presentation
    * dimensions). Non-MP4 payloads surface with null fields rather than
    * failing the batch.
    */
  def extractVideoFeatures(media: Dataset[MediaRow]): Dataset[VideoFeatures] =
    media.mapPartitions { it =>
      it.map { m =>
        val hdr = parseMp4Header(m.payload)
        VideoFeatures(m.doc_id, m.payload.length,
          hdr.map(_.brand), hdr.map(_.timescale), hdr.map(_.duration),
          hdr.map(v => v.duration * 1000.0 / v.timescale),
          hdr.map(_.nTracks),
          hdr.map(_.width).filter(_ > 0), hdr.map(_.height).filter(_ > 0))
      }
    }(Encoders.product[VideoFeatures])

  /** Frame sampling (every k-th frame) driven by the REAL sample
    * table: expand the `stts` runs into per-frame presentation times,
    * keep indices ≡ 0 (mod `every`), and emit (index, pts, pts_ms,
    * byte size) per kept frame. This is the Spark-side shape of video
    * curation at 100 TB: a pure per-row flatMap (no shuffle), emitting
    * the tiny frame-reference stream that downstream decode/embedding
    * stages consume — the codec only ever sees the sampled byte ranges.
    */
  def extractFrameSamples(media: Dataset[MediaRow],
                          every: Int): Dataset[FrameSample] = {
    require(every > 0, s"bad sampling stride $every")
    media.mapPartitions { it =>
      it.flatMap { m =>
        parseMp4SampleTable(m.payload).iterator.flatMap { st =>
          val out = scala.collection.mutable.ArrayBuffer.empty[FrameSample]
          var pts = 0L
          var idx = 0L
          st.sttsRuns.foreach { case (cnt, delta) =>
            var c = 0
            while (c < cnt) {
              if (idx % every == 0)
                out += FrameSample(m.doc_id, idx, pts,
                  pts.toDouble * 1000.0 / st.timescale,
                  if (idx < st.sizes.length) st.sizes(idx.toInt).toLong else -1L)
              pts += delta
              idx += 1
              c += 1
            }
          }
          out
        }
      }
    }(Encoders.product[FrameSample])
  }

  // ------------------------------------------------------- audio pipeline

  /** Locate the `data` chunk body in a RIFF/WAVE stream (same walk as
    * [[parseWavHeader]], returning the byte offset). */
  private def wavDataOffset(p: Array[Byte]): Option[Int] = {
    if (p.length < 44 || !bytesStartWith(p, "RIFF")) return None
    var i = 12
    while (i + 8 <= p.length) {
      val size = le32(p, i + 4).toLong & 0xffffffffL
      val body = i + 8
      if (p(i) == 'd' && p(i + 1) == 'a' && p(i + 2) == 't' && p(i + 3) == 'a')
        return if (body + size <= p.length) Some(body) else None
      // Strict-advance guard, in Long: a crafted size near 2³² would
      // truncate to a negative Int and leave i unchanged (or move it
      // backwards) — an executor task spinning forever on one corrupt
      // payload. A chunk that cannot fit the remaining bytes also ends
      // the walk: skip-and-log posture, never a hang.
      val next = body.toLong + size + (size & 1)
      if (next <= i || next > p.length) return None
      i = next.toInt
    }
    None
  }

  /** Encode arbitrary 16-bit PCM frames (interleaved, frames·channels
    * shorts) as the same canonical RIFF/WAVE profile [[wavBytes]]
    * writes. */
  def encodeWavPcm(sampleRate: Int, channels: Int,
                   pcm: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && pcm.length % channels == 0,
      s"bad pcm geometry sr=$sampleRate ch=$channels n=${pcm.length}")
    val blockAlign = channels * 2
    val dataSize = pcm.length * 2
    val b = ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < pcm.length) { b.putShort(pcm(i)); i += 1 }
    b.array()
  }

  /** decode → drop every second frame (2:1 decimation, the simplest
    * integer-ratio resample) → re-encode at half the rate → re-DECODE,
    * in partition batches. Output geometry and PCM min/max come from
    * the re-encoded bytes' own decode — the audio analogue of
    * [[resizeImages]]. Undecodable/non-PCM payloads emit -1 markers.
    */
  def downsampleWav(media: Dataset[MediaRow]): Dataset[ResampledAudio] =
    media.mapPartitions { it =>
      it.map { m =>
        val in = for {
          hdr <- parseWavHeader(m.payload) if hdr.bitsPerSample == 16
          off <- wavDataOffset(m.payload)
        } yield (hdr, off)
        in match {
          case Some((hdr, off)) =>
            val ch = hdr.channels
            val bb = ByteBuffer.wrap(m.payload)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val outFrames = ((hdr.nFrames + 1) / 2).toInt
            val out = new Array[Short](outFrames * ch)
            var f = 0
            while (f < outFrames) {
              var c = 0
              while (c < ch) {
                out(f * ch + c) = bb.getShort(off + ((2 * f) * ch + c) * 2)
                c += 1
              }
              f += 1
            }
            val reenc = encodeWavPcm(math.max(1, hdr.sampleRate / 2), ch, out)
            (parseWavHeader(reenc), wavDataOffset(reenc)) match {
              case (Some(oh), Some(ooff)) =>
                val ob = ByteBuffer.wrap(reenc)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                var mn = Int.MaxValue
                var mx = Int.MinValue
                var i2 = 0
                val n = (oh.nFrames * oh.channels).toInt
                while (i2 < n) {
                  val v = ob.getShort(ooff + i2 * 2).toInt
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i2 += 1
                }
                if (n == 0) { mn = 0; mx = 0 }
                ResampledAudio(m.doc_id, hdr.sampleRate, oh.sampleRate,
                  hdr.nFrames, oh.nFrames, mn, mx)
              case _ =>
                ResampledAudio(m.doc_id, hdr.sampleRate, -1, hdr.nFrames,
                  -1L, -1, -1)
            }
          case None =>
            ResampledAudio(m.doc_id, -1, -1, -1L, -1L, -1, -1)
        }
      }
    }(Encoders.product[ResampledAudio])

  // ------------------------------------------------------- pixel pipeline

  /** Full pixel decode of a filter-0 8-bit-RGB PNG (the profile
    * [[pngBytes]] emits): chunk walk → IDAT concat → inflate → strip
    * the per-scanline filter bytes. Returns (w, h, rgb samples of
    * length h·3w); None for non-PNG, non-RGB profiles, filtered
    * scanlines, or a short/corrupt pixel stream.
    */
  def decodePngPixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!p.startsWith(PngSig)) return None
    var i = PngSig.length
    var w = 0
    var h = 0
    var ok = false
    val idat = new ByteArrayOutputStream()
    while (i + 8 <= p.length) {
      val len = be32(p, i)
      val typ = new String(p, i + 4, 4, "US-ASCII")
      val body = i + 8
      // be32 is SIGNED: a crafted length like 0xFFFFFFF4 (-12) would
      // pass `body + len > p.length` and make `i = body + len + 4` a
      // no-op — an infinite loop on one corrupt payload. Reject
      // negative lengths outright; with len >= 0 the walk strictly
      // advances (i += len + 12).
      if (len < 0 || body + len > p.length) return None
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(p, body); h = be32(p, body + 4)
          // bit depth 8, color type 2 (truecolor RGB), no interlace
          ok = p(body + 8) == 8 && p(body + 9) == 2 && p(body + 12) == 0
        case "IDAT" => idat.write(p, body, len)
        case _ => ()
      }
      i = body + len + 4 // skip CRC
    }
    if (!ok || w <= 0 || h <= 0) return None
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val stride = 1 + 3 * w
    val raw = new Array[Byte](h * stride)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } finally inf.end()
    if (off != raw.length) return None
    val rgb = new Array[Byte](h * 3 * w)
    var y = 0
    while (y < h) {
      if (raw(y * stride) != 0) return None // only filter 0 supported
      System.arraycopy(raw, y * stride + 1, rgb, y * 3 * w, 3 * w)
      y += 1
    }
    Some((w, h, rgb))
  }

  /** Encode arbitrary RGB samples (length h·3w) as the same PNG
    * profile [[pngBytes]] writes. */
  def encodePngRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == h * 3 * w, s"expected ${h * 3 * w} samples, got ${rgb.length}")
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
      .put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    val stride = 1 + 3 * w
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      System.arraycopy(rgb, y * 3 * w, raw, y * stride + 1, 3 * w)
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

  /** Nearest-neighbor resample of RGB samples. */
  def resizeNearestRgb(w: Int, h: Int, rgb: Array[Byte],
                       w2: Int, h2: Int): Array[Byte] = {
    val out = new Array[Byte](h2 * 3 * w2)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * h / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * w / w2).toInt
        var c = 0
        while (c < 3) {
          out((y * w2 + x) * 3 + c) = rgb((sy * w + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** decode → nearest-neighbor half-size → re-encode → re-DECODE, in
    * partition batches. The emitted output geometry and pixel min/max
    * come from the re-encoded bytes' own decode, so a bug anywhere in
    * the inflate/filter/stride/deflate arithmetic shows up as a value
    * mismatch, not a silently-accepted pass-through. Undecodable
    * payloads yield (-1, -1, -1, -1) markers rather than failing the
    * batch — the skip-and-log posture of a 100 TB media sweep.
    */
  def resizeImages(media: Dataset[MediaRow]): Dataset[ResizedImage] =
    media.mapPartitions { it =>
      it.map { m =>
        decodePngPixels(m.payload) match {
          case Some((w, h, rgb)) =>
            val w2 = math.max(1, w / 2)
            val h2 = math.max(1, h / 2)
            val reenc = encodePngRgb(w2, h2, resizeNearestRgb(w, h, rgb, w2, h2))
            decodePngPixels(reenc) match {
              case Some((ow, oh, orgb)) =>
                var mn = 255; var mx = 0; var i = 0
                while (i < orgb.length) {
                  val v = orgb(i) & 0xff
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                ResizedImage(m.doc_id, w, h, ow, oh, mn, mx)
              case None => ResizedImage(m.doc_id, w, h, -1, -1, -1, -1)
            }
          case None => ResizedImage(m.doc_id, -1, -1, -1, -1, -1, -1)
        }
      }
    }(Encoders.product[ResizedImage])

  /** Byte offset of the `data` chunk body (only called after
    * [[parseWavHeader]] accepted the payload). The RIFF walk exists
    * exactly once — [[wavDataOffset]]; this is its Int-view veneer. */
  private def findDataOffset(p: Array[Byte]): Int =
    wavDataOffset(p).getOrElse(-1)
}
