package graft

import graft.multimodal.{MediaCodec, Multimodal}
import org.apache.spark.sql.functions._

/** Specs for the pure-JVM media header parsers: hand-built byte layouts
  * decoded exactly, encoder/decoder round trips, chunk walking, garbage
  * rejection, and the Spark decodeMedia path end-to-end.
  */
class MediaCodecSpec extends SparkSpec {

  test("hand-built 2x2 BMP decodes exactly") {
    // Build the file byte-by-byte (NOT via encodeBmp) so the decoder is
    // checked against the format spec, not against our own encoder.
    // 2x2, 24bpp: rowSize = (2*3 + 3)/4*4 = 8, data = 16, file = 70.
    val b = new Array[Byte](70)
    b(0) = 'B'; b(1) = 'M'
    // file size = 70 LE at offset 2
    b(2) = 70; b(3) = 0; b(4) = 0; b(5) = 0
    b(10) = 54 // pixel offset
    b(14) = 40 // info header size
    b(18) = 2  // width = 2
    b(22) = 2  // height = 2
    b(26) = 1  // planes
    b(28) = 24 // bpp
    // compression 0 at 30, data size 16 at 34
    b(34) = 16
    val m = MediaCodec.decode(b).get
    assert(m.format == "bmp")
    assert(m.width.contains(2) && m.height.contains(2))
    assert(m.channels == 3 && m.bitDepth == 8)
    assert(m.sampleRate.isEmpty && m.nSamples.isEmpty && m.durationUs.isEmpty)
  }

  test("BMP encoder layout: padding, bottom-up rows, BGR order") {
    // 2x2 where pixel(x,y) = unique color per cell
    val px = Map((0, 0) -> 0x112233, (1, 0) -> 0x445566,
      (0, 1) -> 0x778899, (1, 1) -> 0xAABBCC)
    val b = MediaCodec.encodeBmp(2, 2, (x, y) => px((x, y)))
    assert(b.length == 70) // 54 + 2 * 8 (row padded 6 -> 8)
    // bottom-up: first stored row is y=1; BGR order
    assert((b(54) & 0xFF) == 0x99 && (b(55) & 0xFF) == 0x88 && (b(56) & 0xFF) == 0x77)
    assert((b(57) & 0xFF) == 0xCC && (b(58) & 0xFF) == 0xBB && (b(59) & 0xFF) == 0xAA)
    // padding bytes zero
    assert(b(60) == 0 && b(61) == 0)
    // second stored row is y=0
    assert((b(62) & 0xFF) == 0x33 && (b(63) & 0xFF) == 0x22 && (b(64) & 0xFF) == 0x11)
    val m = MediaCodec.decode(b).get
    assert(m.width.contains(2) && m.height.contains(2) && m.channels == 3)
  }

  test("top-down BMP (negative height) decodes with positive height") {
    val b = MediaCodec.encodeBmp(3, 4, (_, _) => 0)
    // rewrite height to -4 (two's complement LE)
    b(22) = (-4 & 0xFF).toByte; b(23) = 0xFF.toByte; b(24) = 0xFF.toByte; b(25) = 0xFF.toByte
    val m = MediaCodec.decode(b).get
    assert(m.width.contains(3) && m.height.contains(4))
  }

  test("PPM/PGM round trip, including comment and whitespace handling") {
    val ppm = MediaCodec.encodePpm(17, 13, 255, (x, y) => x * 65536 + y)
    val mp = MediaCodec.decode(ppm).get
    assert(mp.format == "ppm" && mp.width.contains(17) && mp.height.contains(13))
    assert(mp.channels == 3 && mp.bitDepth == 8)
    assert(ppm.length == "P6\n17 13\n255\n".length + 3 * 17 * 13)

    val pgm = MediaCodec.encodePgm(5, 9, 255, (x, y) => x + y)
    val mg = MediaCodec.decode(pgm).get
    assert(mg.format == "pgm" && mg.width.contains(5) && mg.height.contains(9))
    assert(mg.channels == 1)

    // netpbm allows comments between header tokens
    val commented = ("P6\n# a comment line\n 4\t6 # trailing\n255\n" +
      "x" * (3 * 4 * 6)).getBytes("US-ASCII")
    val mc = MediaCodec.decode(commented).get
    assert(mc.width.contains(4) && mc.height.contains(6))
  }

  test("WAV round trip + duration arithmetic") {
    val samples = Array.tabulate[Short](441 * 2)(i => (i % 32767).toShort)
    val wav = MediaCodec.encodeWav(44100, 2, samples)
    assert(wav.length == 44 + 441 * 2 * 2)
    val m = MediaCodec.decode(wav).get
    assert(m.format == "wav" && m.channels == 2 && m.bitDepth == 16)
    assert(m.sampleRate.contains(44100))
    assert(m.nSamples.contains(441L))
    assert(m.durationUs.contains(441L * 1000000L / 44100)) // 10000 us
    assert(m.width.isEmpty && m.height.isEmpty)
  }

  test("G.711 µ-law/a-law WAV decodes sample-exactly vs the JDK codec") {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    // the JDK's own ULAW/ALAW→PCM converter is the independent oracle:
    // our table-free expansion must match it on every stored byte
    def jdkDecode(bytes: Array[Byte], rate: Int, ch: Int): Array[Int] = {
      val src = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        rate.toFloat, 16, ch, ch * 2, rate.toFloat, false) // little-endian
      val pcm = AudioSystem.getAudioInputStream(target, src)
      val out = pcm.readAllBytes()
      Array.tabulate(out.length / 2)(i =>
        ((out(2 * i) & 0xFF) | (out(2 * i + 1) << 8)).toShort.toInt)
    }
    for (uLaw <- Seq(true, false)) {
      val samples = Array.tabulate[Short](500)(i =>
        ((i * 1237 + 89) % 65536 - 32768).toShort)
      val bytes = MediaCodec.encodeWavG711(8000, 1, samples, uLaw)
      assert(bytes.length == 44 + 500) // one byte per companded sample
      val m = MediaCodec.decode(bytes).get
      assert(m.format == (if (uLaw) "wav_ulaw" else "wav_alaw"))
      assert(m.bitDepth == 8 && m.sampleRate.contains(8000))
      assert(m.nSamples.contains(500L))
      assert(m.durationUs.contains(500L * 1000000L / 8000))
      val (fmt, ours) = MediaCodec.decodeValues(bytes).get
      assert(fmt == m.format)
      val jdk = jdkDecode(bytes, 8000, 1)
      assert(ours.length == 500 && jdk.length == 500)
      assert(ours.sameElements(jdk),
        s"uLaw=$uLaw first diff at ${ours.zip(jdk).indexWhere(p => p._1 != p._2)}")
    }
  }

  test("G.711 expansion/compression is value-stable on all 256 codewords") {
    // decode→encode→decode must be the identity on decoded VALUES for
    // every codeword (the +0/-0 dual zero makes raw codeword round-trip
    // the wrong invariant)
    for (c <- 0 until 256) {
      val u = MediaCodec.ulawToPcm(c).toInt
      assert(MediaCodec.ulawToPcm(MediaCodec.pcmToUlaw(u) & 0xFF).toInt == u,
        s"ulaw codeword $c decodes to $u which re-encodes lossily")
      val a = MediaCodec.alawToPcm(c).toInt
      assert(MediaCodec.alawToPcm(MediaCodec.pcmToAlaw(a) & 0xFF).toInt == a,
        s"alaw codeword $c decodes to $a which re-encodes lossily")
    }
  }

  test("WAV chunk walking skips non-fmt/data chunks") {
    val base = MediaCodec.encodeWav(8000, 1, Array.tabulate[Short](100)(_.toShort))
    // splice a LIST chunk (10 bytes payload -> padded) between WAVE and fmt
    val listChunk = new Array[Byte](8 + 10)
    listChunk(0) = 'L'; listChunk(1) = 'I'; listChunk(2) = 'S'; listChunk(3) = 'T'
    listChunk(4) = 10
    val spliced = base.slice(0, 12) ++ listChunk ++ base.slice(12, base.length)
    // fix RIFF size (not validated by decoder, but keep it honest)
    val m = MediaCodec.decode(spliced).get
    assert(m.sampleRate.contains(8000) && m.nSamples.contains(100L))
    assert(m.durationUs.contains(100L * 1000000L / 8000)) // 12500 us
  }

  test("garbage, truncated, and compressed-magic payloads return None") {
    assert(MediaCodec.decode(Array[Byte]()).isEmpty)
    assert(MediaCodec.decode("hello world".getBytes).isEmpty)
    assert(MediaCodec.decode(Array[Byte]('B', 'M', 1, 2)).isEmpty) // truncated BMP
    assert(MediaCodec.decode("P6".getBytes).isEmpty) // header cut off
    assert(MediaCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty) // no fmt/data
    // a bare PNG magic with no image data: ImageIO yields nothing → None
    assert(MediaCodec.decode(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)).isEmpty)
    // BMP with RLE compression flag rejected
    val b = MediaCodec.encodeBmp(2, 2, (_, _) => 0)
    b(30) = 1 // BI_RLE8
    assert(MediaCodec.decode(b).isEmpty)
    // a 12-bit WAV (non-byte-multiple depth) is rejected, not floored
    val w12 = MediaCodec.encodeWav(8000, 1, Array[Short](1, 2, 3, 4))
    w12(34) = 12 // bits-per-sample field
    assert(MediaCodec.decode(w12).isEmpty)
    // netpbm maxval must be < 65536: a 6-digit maxval is malformed
    assert(MediaCodec.decode("P5\n2 2\n100000\n".getBytes ++
      Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("PNG decodes byte-exactly through the JDK ImageIO path") {
    // PNG is lossless: a synthesized image must round-trip every pixel
    def px(x: Int, y: Int): Int = ((x * 37 + y * 101) % 256) * 0x010101
    val png = MediaCodec.encodePng(5, 4, px)
    // it really is a PNG container
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N')
    val m = MediaCodec.decode(png).get
    assert(m.format == "png" && m.width.contains(5) && m.height.contains(4))
    assert(m.bitDepth == 8)
    val (fmt, values) = MediaCodec.decodeValues(png).get
    assert(fmt == "png")
    val expect = for (y <- 0 until 4; x <- 0 until 5)
      yield (px(x, y) >> 16) & 0xFF
    assert(values.toSeq == expect) // byte-exact, row-major, top row first
    // and the perceptual pipeline consumes PNGs like any raw format:
    // the aHash of a PNG equals the aHash of the same pixels as BMP
    val bmp = MediaCodec.encodeBmp(5, 4, px)
    assert(MediaCodec.decodeValues(bmp).get._2.toSeq == values.toSeq)
  }

  test("synthesizeAsset decode recovers generation parameters for many ids") {
    (0L until 300L).foreach { id =>
      val (fmt, bytes) = MediaCodec.synthesizeAsset(id)
      val m = MediaCodec.decode(bytes).getOrElse(fail(s"id=$id did not decode"))
      assert(m.format == fmt, s"id=$id")
      (id % 3) match {
        case 0 =>
          assert(m.width.contains((1 + id % 31).toInt), s"id=$id")
          assert(m.height.contains((1 + (id / 31) % 23).toInt), s"id=$id")
        case 1 =>
          assert(m.width.contains((1 + id % 17).toInt), s"id=$id")
          assert(m.height.contains((1 + (id / 17) % 13).toInt), s"id=$id")
        case _ =>
          val rate = Array(8000, 16000, 22050, 44100)((id % 4).toInt)
          assert(m.sampleRate.contains(rate), s"id=$id")
          assert(m.channels == (1 + id % 2).toInt, s"id=$id")
          assert(m.nSamples.contains(100L + id % 400), s"id=$id")
      }
    }
  }

  test("hand-built MP3 frame decodes against the format spec, not our encoder") {
    // one MPEG1 Layer III frame: FF FB = sync + version 11 + layer 01 +
    // no CRC; 0x90 = bitrate idx 9 (128 kbps) + rate idx 0 (44100);
    // 0x00 = stereo. Frame length = floor(144000·128/44100) = 417.
    val frame = new Array[Byte](417)
    frame(0) = 0xFF.toByte; frame(1) = 0xFB.toByte
    frame(2) = 0x90.toByte; frame(3) = 0x00
    val m = MediaCodec.decode(frame).get
    assert(m.format == "mp3")
    assert(m.channels == 2 && m.sampleRate.contains(44100))
    assert(m.nSamples.contains(1152L))
    assert(m.durationUs.contains(1152L * 1000000L / 44100L))
    // mono flag: channel mode 11
    val mono = frame.clone(); mono(3) = 0xC0.toByte
    assert(MediaCodec.decode(mono).get.channels == 1)
    // a VBR-ish chain: 128 kbps frame followed by a 192 kbps frame
    // (idx 11 → floor(144000·192/44100) = 626) — the walk must use each
    // frame's OWN length
    val f2 = new Array[Byte](626)
    f2(0) = 0xFF.toByte; f2(1) = 0xFB.toByte; f2(2) = 0xB0.toByte
    val vbr = MediaCodec.decode(frame ++ f2).get
    assert(vbr.nSamples.contains(2304L))
    // trailing garbage after the last full frame stops the walk cleanly
    val trail = MediaCodec.decode(frame ++ "garbage".getBytes).get
    assert(trail.nSamples.contains(1152L))
    // a truncated frame (header claims 417, only 100 present) is not counted
    assert(MediaCodec.decode(frame.take(100)).isEmpty)
    // layer I (bits 11) is out of scope → None, not a wrong parse
    val l1 = frame.clone(); l1(1) = 0xFF.toByte
    assert(MediaCodec.decode(l1).isEmpty)
  }

  test("MP3 ID3v2 skip + encoder round trip incl. MPEG2 low rates") {
    // ID3v2 tag with a syncsafe size the decoder must honor
    val withTag = MediaCodec.encodeMp3(128, 44100, mono = false,
      frames = 3, id3Bytes = 200)
    assert(withTag(0) == 'I' && withTag(1) == 'D' && withTag(2) == '3')
    val m = MediaCodec.decode(withTag).get
    assert(m.nSamples.contains(3L * 1152) && m.sampleRate.contains(44100))
    // MPEG2 (rates < 32 kHz): 576 samples/frame, coef 72000
    val lo = MediaCodec.encodeMp3(48, 22050, mono = true, frames = 5)
    val m2 = MediaCodec.decode(lo).get
    assert(m2.sampleRate.contains(22050) && m2.channels == 1)
    assert(m2.nSamples.contains(5L * 576))
    assert(lo.length == 5 * (72000 * 48 / 22050))
  }

  test("MP4 box walk: encoder round trip, v1 mvhd, audio track count, truncation") {
    val b = MediaCodec.encodeMp4(timescale = 90000, durationUnits = 450000L,
      width = 640, height = 360, audioTracks = 1)
    assert(new String(b, 4, 4) == "ftyp")
    val m = MediaCodec.decode(b).get
    assert(m.format == "mp4")
    assert(m.width.contains(640) && m.height.contains(360))
    assert(m.channels == 2) // 1 video + 1 audio track
    assert(m.sampleRate.contains(90000) && m.nSamples.contains(450000L))
    assert(m.durationUs.contains(5000000L)) // 450000 / 90000 = 5 s
    // hand-built v1 mvhd (64-bit duration): ver 1 + flags, 8-byte
    // ctime/mtime, u32 timescale, u64 duration — offsets 20/24
    val p = new java.io.ByteArrayOutputStream()
    p.write(Array[Byte](1, 0, 0, 0)) // version 1
    p.write(new Array[Byte](16)) // ctime + mtime (u64 each)
    p.write(Array[Byte](0, 0, 0x03, 0xE8.toByte)) // timescale 1000
    p.write(Array[Byte](0, 0, 0, 0, 0, 0, 0x27, 0x10)) // duration 10000
    def box(t: String, pay: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val sz = pay.length + 8
      o.write(Array[Byte]((sz >> 24).toByte, (sz >> 16).toByte,
        (sz >> 8).toByte, sz.toByte))
      t.foreach(c => o.write(c.toInt)); o.write(pay); o.toByteArray
    }
    val ftyp = box("ftyp", "isom   isom".getBytes("ISO-8859-1"))
    val v1 = ftyp ++ box("moov", box("mvhd", p.toByteArray))
    val mv1 = MediaCodec.decode(v1).get
    assert(mv1.sampleRate.contains(1000) && mv1.nSamples.contains(10000L))
    assert(mv1.durationUs.contains(10000000L))
    // truncated mid-box: no crash, no moov → None
    assert(MediaCodec.decode(b.take(30)).isEmpty)
    assert(MediaCodec.decode(ftyp).isEmpty) // ftyp alone, no moov
  }

  test("synthesizeCompressedAsset decode recovers generation parameters " +
      "and exact byte lengths for many ids") {
    (0L until 300L).foreach { id =>
      val (fmt, bytes) = MediaCodec.synthesizeCompressedAsset(id)
      val m = MediaCodec.decode(bytes).getOrElse(fail(s"id=$id did not decode"))
      assert(m.format == fmt, s"id=$id")
      val k = id / 2
      if (id % 2 == 0) {
        val br = Array(64, 96, 128, 192)((k % 4).toInt)
        val rate = Array(32000, 44100, 48000)((k % 3).toInt)
        val frames = 20 + id % 30
        assert(m.sampleRate.contains(rate), s"id=$id")
        assert(m.channels == (if (k % 2 == 0) 1 else 2), s"id=$id")
        assert(m.nSamples.contains(frames * 1152L), s"id=$id")
        val id3 = if (id % 5 == 0) 50 + id % 60 else 0
        assert(bytes.length == id3 + frames * (144000L * br / rate), s"id=$id")
      } else {
        assert(m.width.contains(16 * (1 + id % 40).toInt), s"id=$id")
        assert(m.height.contains(16 * (1 + (id / 40) % 30).toInt), s"id=$id")
        assert(m.channels == 1 + (k % 2).toInt, s"id=$id")
        assert(m.nSamples.contains(1000L + id % 9000), s"id=$id")
        assert(bytes.length == 146 + 141 * (1 + (k % 2).toInt), s"id=$id")
      }
    }
  }

  test("decodeMedia Dataset path: real parse + unknown fallback") {
    import spark.implicits._
    val real = (0L until 12L).map { id =>
      val (fmt, bytes) = MediaCodec.synthesizeAsset(id)
      Multimodal.Asset(id, fmt, bytes, "synth")
    }
    val junk = Multimodal.Asset(99L, "image", "not a media file".getBytes, "junk")
    val ds = spark.createDataset(real :+ junk)
    val out = Multimodal.decodeMedia(ds)(spark).collect().sortBy(_.asset_id)
    assert(out.length == 13)
    assert(out.count(_.format == "bmp") == 4)
    assert(out.count(_.format == "ppm") == 4)
    assert(out.count(_.format == "wav") == 4)
    val u = out.find(_.asset_id == 99L).get
    assert(u.format == "unknown" && u.width.isEmpty && u.n_bytes == 16L)
  }

  test("decodeValues: hand-built 2x2 BMP yields row-major red values, unpadded, top row first") {
    // bottom-up storage: file rows are (image row 1) then (image row 0).
    // red channel per pixel: (0,0)=10 (1,0)=20 / (0,1)=30 (1,1)=40
    val b = new Array[Byte](70)
    b(0) = 'B'; b(1) = 'M'; b(2) = 70
    b(10) = 54; b(14) = 40; b(18) = 2; b(22) = 2; b(26) = 1; b(28) = 24
    b(34) = 16
    // file row 0 = image row y=1 (bottom-up): B,G,R per pixel + 2 pad
    b(54 + 2) = 30; b(54 + 5) = 40
    // file row 1 = image row y=0
    b(62 + 2) = 10; b(62 + 5) = 20
    val (fmt, vs) = MediaCodec.decodeValues(b).get
    assert(fmt == "bmp")
    assert(vs.toSeq == Seq(10, 20, 30, 40)) // row-major, top row first
  }

  test("decodeValues: top-down BMP (negative height) reads rows in storage order") {
    val b = new Array[Byte](70)
    b(0) = 'B'; b(1) = 'M'; b(2) = 70
    b(10) = 54; b(14) = 40; b(18) = 2
    // height = -2 (top-down), little-endian two's complement
    b(22) = 0xFE.toByte; b(23) = 0xFF.toByte; b(24) = 0xFF.toByte; b(25) = 0xFF.toByte
    b(26) = 1; b(28) = 24; b(34) = 16
    b(54 + 2) = 10; b(54 + 5) = 20 // storage row 0 IS image row 0
    b(62 + 2) = 30; b(62 + 5) = 40
    val (_, vs) = MediaCodec.decodeValues(b).get
    assert(vs.toSeq == Seq(10, 20, 30, 40))
  }

  test("decodeValues: PGM gray bytes and PPM red channel, comment-tolerant header") {
    val pgm = "P5\n# a comment\n3 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val (f1, v1) = MediaCodec.decodeValues(pgm).get
    assert(f1 == "pgm" && v1.toSeq == Seq(1, 2, 3, 4, 5, 6))
    val ppm = MediaCodec.encodePpm(2, 1, 255,
      (x, _) => if (x == 0) 0xAA0000 else 0x550000)
    val (f2, v2) = MediaCodec.decodeValues(ppm).get
    assert(f2 == "ppm" && v2.toSeq == Seq(0xAA, 0x55))
  }

  test("decodeValues: WAV PCM16 samples sign-extend and preserve interleave order") {
    val samples = Array[Short](100, -200, 32767, -32768, 0, -1)
    val wav = MediaCodec.encodeWav(8000, 2, samples)
    val (f, vs) = MediaCodec.decodeValues(wav).get
    assert(f == "wav")
    assert(vs.toSeq == Seq(100, -200, 32767, -32768, 0, -1))
  }

  test("property: encode -> decodeValues round-trips arbitrary dims and payloads") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genBmp = for {
      w <- Gen.choose(1, 40); h <- Gen.choose(1, 30)
      seed <- Gen.choose(0L, 1L << 40)
    } yield {
      def px(x: Int, y: Int) = (((seed + 31L * x + 7L * y) % 256).toInt * 0x010101) & 0xFFFFFF
      val expect = for (y <- 0 until h; x <- 0 until w)
        yield ((seed + 31L * x + 7L * y) % 256).toInt
      (MediaCodec.encodeBmp(w, h, px), "bmp", expect)
    }
    val genPpm = for {
      w <- Gen.choose(1, 40); h <- Gen.choose(1, 30)
      seed <- Gen.choose(0L, 1L << 40)
    } yield {
      def px(x: Int, y: Int) = (((seed + 13L * x + 3L * y) % 256).toInt * 0x010101) & 0xFFFFFF
      val expect = for (y <- 0 until h; x <- 0 until w)
        yield ((seed + 13L * x + 3L * y) % 256).toInt
      (MediaCodec.encodePpm(w, h, 255, px), "ppm", expect)
    }
    val genWav = for {
      rate <- Gen.oneOf(8000, 44100); ch <- Gen.choose(1, 2)
      frames <- Gen.choose(1, 300); seed <- Gen.choose(0L, 1L << 40)
    } yield {
      val samples = Array.tabulate[Short](frames * ch)(i =>
        ((seed * 31 + i * 17) % 65536 - 32768).toShort)
      (MediaCodec.encodeWav(rate, ch, samples), "wav", samples.map(_.toInt).toSeq)
    }
    val prop = Prop.forAll(Gen.oneOf(genBmp, genPpm, genWav)) {
      case (bytes, fmt, expect) =>
        MediaCodec.decodeValues(bytes) match {
          case Some((f, vs)) => f == fmt && vs.toSeq == expect
          case None          => false
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("decodeValues survives truncation and garbage without throwing") {
    val (_, full) = MediaCodec.synthesizeAsset(0L) // a BMP
    for (n <- 0 to math.min(full.length, 80))
      MediaCodec.decodeValues(full.take(n)) // must not throw
    assert(MediaCodec.decodeValues("garbage".getBytes).isEmpty)
    assert(MediaCodec.decodeValues(Array.empty[Byte]).isEmpty)
  }

  test("corrupt size/offset/dimension fields yield None, never hang or crash") {
    // RIFF chunk whose 32-bit size field wraps negative after toInt: the
    // walk must terminate (no infinite loop) and reject the file
    val wav = MediaCodec.encodeWav(8000, 1, Array[Short](1, 2, 3))
    val badChunk = wav.clone()
    badChunk(16) = 0xF8.toByte; badChunk(17) = 0xFF.toByte
    badChunk(18) = 0xFF.toByte; badChunk(19) = 0xFF.toByte // fmt size = -8
    assert(MediaCodec.decode(badChunk).isEmpty)
    assert(MediaCodec.decodeValues(badChunk).isEmpty)

    // BMP with a pixel-data offset whose u32 goes negative after toInt
    val (_, bmp) = MediaCodec.synthesizeAsset(0L)
    val badOff = bmp.clone()
    badOff(10) = 0; badOff(11) = 0; badOff(12) = 0; badOff(13) = 0x80.toByte
    assert(MediaCodec.decodeValues(badOff).isEmpty)

    // BMP claiming a ~2^30 width: rowSize/array arithmetic must not
    // overflow into a crash
    val badW = bmp.clone()
    badW(18) = 0; badW(19) = 0; badW(20) = 0; badW(21) = 0x40.toByte
    assert(MediaCodec.decodeValues(badW).isEmpty)

    // netpbm header with an over-long digit run (> Int.MaxValue) is a
    // malformed header, not a NumberFormatException
    val badPnm = "P6\n99999999999 3\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](32)(0)
    assert(MediaCodec.decode(badPnm).isEmpty)
    assert(MediaCodec.decodeValues(badPnm).isEmpty)
  }

  test("imageAHash: identical images equal, perturbation stays hamming-near, inverse differs") {
    import spark.implicits._
    def bmp(id: Long, px: (Int, Int) => Int) =
      Multimodal.Asset(id, "bmp", MediaCodec.encodeBmp(16, 16, px), "t")
    val gradient = (x: Int, y: Int) => (((x * 16 + y * 7) % 256) * 0x010101)
    val perturbed = (x: Int, y: Int) =>
      if (x == 3 && y == 3) 0xFFFFFF else gradient(x, y)
    val inverse = (x: Int, y: Int) => gradient(15 - x, 15 - y)
    val tiny = Multimodal.Asset(5L, "bmp",
      MediaCodec.encodeBmp(2, 2, gradient), "t") // below the 4x4 grid
    val out = Multimodal.imageAHash(spark.createDataset(Seq(
        bmp(1, gradient), bmp(2, gradient), bmp(3, perturbed),
        bmp(4, inverse), tiny)))(spark)
      .collect().map(h => h.asset_id -> h.ahash).toMap
    assert(out(1L) == out(2L)) // identical pixels, identical hash
    val nearBits = java.lang.Long.bitCount(out(1L) ^ out(3L))
    assert(nearBits <= 2, s"one-pixel perturbation flipped $nearBits bits")
    assert(out(1L) != out(4L)) // reversed gradient is a different image
    assert(!out.contains(5L))  // sub-grid images have no defined hash
  }

  test("imagePHash: hand-computed DCT signs, brightness-shift invariant, sub-grid skipped") {
    import spark.implicits._
    // 4x4 image, one pixel per cell -> cell means == pixels; expected
    // hash recomputed here with an independent straightforward loop over
    // the same integer basis
    val basis = Array(
      Array(10000L, 10000L, 10000L, 10000L),
      Array(9239L, 3827L, -3827L, -9239L),
      Array(7071L, -7071L, -7071L, 7071L),
      Array(3827L, -9239L, 9239L, -3827L))
    // mod-wrapped so the plane is non-monotone (a pure linear ramp has
    // every AC coefficient <= 0 and hashes to 0 — a valid but
    // degenerate case for the sign assertions below)
    val px = Array.tabulate(4, 4)((y, x) => (53 * x + 97 * y) % 150)
    def expected(shift: Int): Long = {
      var hash = 0L
      for (u <- 0 until 4; v <- 0 until 4; if u != 0 || v != 0) {
        var d = 0L
        for (r <- 0 until 4; c <- 0 until 4)
          d += basis(u)(r) * (px(r)(c) + shift) * basis(v)(c)
        if (d > 0) hash |= (1L << (u * 4 + v))
      }
      hash
    }
    def bmp(id: Long, shift: Int) = Multimodal.Asset(id, "bmp",
      MediaCodec.encodeBmp(4, 4, (x, y) => (px(y)(x) + shift) * 0x010101), "t")
    val tiny = Multimodal.Asset(4L, "bmp",
      MediaCodec.encodeBmp(2, 2, (_, _) => 7 * 0x010101), "t")
    val out = Multimodal.imagePHash(spark.createDataset(Seq(
        bmp(1, 0), bmp(2, 0), bmp(3, 40), tiny)))(spark)
      .collect().map(h => h.asset_id -> h.phash).toMap
    assert(out(1L) == expected(0), s"got ${out(1L)}, want ${expected(0)}")
    assert(out(1L) != 0L, "gradient image must have nonzero AC signs")
    assert(out(1L) == out(2L)) // identical pixels, identical hash
    // +40 to every pixel only moves the DC term (AC basis rows sum to 0)
    assert(expected(40) == expected(0))
    assert(out(3L) == out(1L), "uniform brightness shift must not move pHash")
    assert(!out.contains(4L)) // sub-grid images have no defined hash
  }

  test("imageNearDupPairs: consensus pairs identical+shifted copies, excludes the inverse") {
    import spark.implicits._
    val px = Array.tabulate(8, 8)((y, x) => (53 * x + 97 * y) % 150)
    def bmp(id: Long, f: (Int, Int) => Int) =
      Multimodal.Asset(id, "bmp", MediaCodec.encodeBmp(8, 8,
        (x, y) => f(x, y) * 0x010101), "t")
    val out = Multimodal.imageNearDupPairs(spark.createDataset(Seq(
        bmp(1, (x, y) => px(y)(x)),
        bmp(2, (x, y) => px(y)(x)),          // identical
        bmp(3, (x, y) => px(y)(x) + 40),     // uniform brightness shift
        bmp(4, (x, y) => 255 - px(y)(x))     // inverse — different image
      )))(spark)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both hashes are brightness-shift invariant → {1,2,3} all pair up;
    // the inverse flips both hashes' bits → never in consensus
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("audioFingerprint: identical streams equal, loud/quiet contour drives the bits") {
    import spark.implicits._
    // first half quiet (amp 10), second half loud (amp 1000): the loud
    // frames' bits set, quiet frames' clear
    val contour = Array.tabulate[Short](320)(i =>
      (if (i < 160) 10 else 1000).toShort)
    def wav(id: Long, samples: Array[Short]) =
      Multimodal.Asset(id, "wav", MediaCodec.encodeWav(8000, 1, samples), "t")
    // a µ-law asset must fingerprint exactly like a PCM asset holding the
    // companded-then-expanded samples (the codec is lossy; the PIPELINE
    // over companded bytes must not add any loss of its own)
    val expanded = contour.map(s =>
      MediaCodec.ulawToPcm(MediaCodec.pcmToUlaw(s.toInt) & 0xFF))
    val ulawAsset = Multimodal.Asset(5L, "wav_ulaw",
      MediaCodec.encodeWavG711(8000, 1, contour, uLaw = true), "t")
    val out = Multimodal.audioFingerprint(spark.createDataset(Seq(
        wav(1, contour), wav(2, contour),
        wav(3, contour.map(s => (-s).toShort)), // same |amplitude| contour
        wav(4, Array.tabulate[Short](8)(_.toShort)), // < 16 samples
        ulawAsset, wav(6, expanded))))(spark)
      .collect().map(f => f.asset_id -> f.afp).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) == out(3L)) // fingerprint is |amplitude|-based
    assert(out(1L) == 0xFF00L) // frames 8-15 loud -> high byte set
    assert(!out.contains(4L))  // sub-frame streams have no fingerprint
    assert(out(5L) == out(6L)) // µ-law bytes ≡ expanded PCM through the pipeline
  }

  test("payloadFeatures: integer stats + order-sensitive checksum + crossings") {
    import spark.implicits._
    val samples = Array[Short](5, -3, 4, -2) // 3 sign flips
    val assets = Seq(
      Multimodal.Asset(1L, "wav", MediaCodec.encodeWav(8000, 1, samples), "t"),
      Multimodal.Asset(2L, "junk", "zzz".getBytes, "t"))
    val out = Multimodal.payloadFeatures(spark.createDataset(assets))(spark)
      .collect().sortBy(_.asset_id)
    val w = out(0)
    assert(w.format == "wav" && w.n_values == 4 && w.v_sum == 4 &&
      w.v_min == -3 && w.v_max == 5 && w.crossings == 3)
    // weighted: 1*5 + 2*(-3) + 3*4 + 4*(-2) = 3
    assert(w.weighted_sum == 3)
    assert(out(1).format == "unknown" && out(1).n_values == 0)
  }

  test("mp3 content fingerprint: invariant under ID3 retagging, " +
      "sensitive to one payload byte, per-frame over a VBR chain") {
    val bitrates = Seq(64, 128, 96, 192, 64)
    def pay(f: Int, i: Int): Byte = ((f * 131 + i * 7) % 251).toByte
    val bare = MediaCodec.encodeMp3Frames(44100, mono = true, bitrates, pay)
    val tagged = MediaCodec.encodeMp3Frames(44100, mono = true, bitrates,
      pay, id3Bytes = 77)
    assert(bare.length != tagged.length, "variants must differ byte-wise")
    val fpBare = MediaCodec.mp3ContentFingerprint(bare).get
    val fpTagged = MediaCodec.mp3ContentFingerprint(tagged).get
    assert(fpBare.length == 5, "one hash per frame")
    assert(fpBare.toSeq == fpTagged.toSeq,
      "an ID3 retag must not move the content fingerprint")
    // flip ONE payload byte of frame 2 -> exactly that hash changes
    val tampered = bare.clone()
    val frameLens = bitrates.map(br => 144000 * br / 44100)
    val f2Start = frameLens.take(2).sum
    tampered(f2Start + 4 + 10) = (tampered(f2Start + 4 + 10) ^ 0x5A).toByte
    val fpTampered = MediaCodec.mp3ContentFingerprint(tampered).get
    assert((0 until 5).filter(i => fpTampered(i) != fpBare(i)) == Seq(2),
      "exactly the tampered frame's hash must change")
    // garbage -> None
    assert(MediaCodec.mp3ContentFingerprint("nope".getBytes).isEmpty)
  }

  test("mp3 side info: ISO 11172-3 bit layout round-trips global_gain for MPEG1 mono/stereo and MPEG2 mono") {
    def frame(versionBits: Int, bitrate: Int, rate: Int, mono: Boolean,
        gains: Seq[Int]): Array[Byte] = {
      val row = if (versionBits == 3) 0 else 1
      val coef = if (versionBits == 3) 144000 else 72000
      val bi = MediaCodec.mp3BitrateIndex(row, bitrate)
      val si = MediaCodec.mp3RateIndex(versionBits, rate)
      val len = coef * bitrate / rate
      val f = new Array[Byte](len)
      f(0) = 0xFF.toByte
      f(1) = (0xE0 | (versionBits << 3) | (1 << 1) | 1).toByte
      f(2) = ((bi << 4) | (si << 2)).toByte
      f(3) = (if (mono) 0xC0 else 0x00).toByte
      val side = MediaCodec.mp3SideInfo(gains, if (mono) 1 else 2,
        mpeg1 = versionBits == 3)
      System.arraycopy(side, 0, f, 4, side.length)
      f
    }
    // MPEG1 mono: 2 granules/frame, exact recovery over two frames
    val m1 = frame(3, 128, 44100, mono = true, Seq(100, 155)) ++
      frame(3, 128, 44100, mono = true, Seq(42, 203))
    assert(MediaCodec.mp3GranuleGains(m1).get.toSeq ==
      Seq(100, 155, 42, 203))
    // MPEG1 stereo: gains per (granule, channel), reader averages
    // channels — gr0 (80, 90) -> 85, gr1 (200, 100) -> 150
    val st = frame(3, 128, 44100, mono = false, Seq(80, 90, 200, 100))
    assert(MediaCodec.mp3GranuleGains(st).get.toSeq == Seq(85, 150))
    // MPEG2 (LSF) mono: 1 granule/frame, 9-byte side info
    val m2 = frame(2, 64, 22050, mono = true, Seq(77)) ++
      frame(2, 64, 22050, mono = true, Seq(190))
    assert(MediaCodec.mp3GranuleGains(m2).get.toSeq == Seq(77, 190))
    // a frame too short to hold its side info declines instead of
    // reading past the frame (8 kbps MPEG2 mono = 72-byte frames is
    // fine; hand-truncate the chain instead)
    assert(MediaCodec.mp3GranuleGains(m1.take(10)).isEmpty)
    assert(MediaCodec.mp3GranuleGains("nope".getBytes).isEmpty)
  }

  test("synthesizeMp3Twin: re-encoded variants share the energy contour, families separate, content fingerprints differ") {
    val nFamilies = 60
    val perFamily = (0 until nFamilies).map { c =>
      val variants = (0 until 3).map(v =>
        MediaCodec.synthesizeMp3Twin(3L * c + v))
      // different bitrates + filler: no variant is a byte-copy, and the
      // CONTENT fingerprints (payload hashes) all differ
      assert(variants.map(_.toSeq).distinct.size == 3)
      val cfps = variants.map(b =>
        MediaCodec.mp3ContentFingerprint(b).get.toSeq)
      assert(cfps.distinct.size == 3,
        "re-encodes must not share payload fingerprints")
      // ...but the side-info energy contour is IDENTICAL
      val contours = variants.map(b => MediaCodec.mp3EnergyContour(b).get)
      assert(contours.map { case (n, w) => (n, w.toSeq) }.distinct.size == 1,
        s"family $c variants must share the contour")
      contours.head
    }
    // distinct families never collide (47+ contour bits)
    assert(perFamily.map { case (n, w) => (n, w.toSeq) }.distinct.size ==
      nFamilies)
    // granule count follows the family rule
    assert(perFamily.head._1 == 48)
    // the full operator recovers the twin rule end to end
    implicit val s = spark
    import s.implicits._
    val assets = s.range(3L * nFamilies).as[Long]
      .map(d => graft.multimodal.Multimodal.Asset(d, "audio",
        MediaCodec.synthesizeMp3Twin(d), "synth"))
    val clusters = graft.multimodal.Multimodal.audioNearDupClusters(assets)
      .collect()
    assert(clusters.length == nFamilies)
    assert(clusters.forall(_.getAs[Long]("n_members") == 3L))
    assert(clusters.map(_.getAs[Long]("rep_id")).sorted.toSeq ==
      (0 until nFamilies).map(3L * _))
  }

  test("mp4 content fingerprint: invariant under re-chunking and " +
      "free-box padding (every stco offset moves), sensitive to a " +
      "sample byte; stsc/stsz/stco resolve the exact sample ranges") {
    val samples = (0 until 7).map(i =>
      Array.tabulate(20 + 5 * i)(j => ((i * 37 + j * 11) % 250).toByte))
    val a = MediaCodec.encodeMp4Media(1000, 5000, 640, 480, samples,
      samplesPerChunk = 1)
    val b = MediaCodec.encodeMp4Media(1000, 5000, 640, 480, samples,
      samplesPerChunk = 3)
    val c = MediaCodec.encodeMp4Media(1000, 5000, 640, 480, samples,
      samplesPerChunk = 2, freeBytes = 123)
    assert(a.length != b.length || !a.sameElements(b))
    val fa = MediaCodec.mp4ContentFingerprint(a).get
    val fb = MediaCodec.mp4ContentFingerprint(b).get
    val fc = MediaCodec.mp4ContentFingerprint(c).get
    assert(fa.length == 7, "one hash per sample")
    assert(fa.toSeq == fb.toSeq && fa.toSeq == fc.toSeq,
      "re-mux layouts must share the content fingerprint")
    // the decode walk still reads these containers as mp4
    val meta = MediaCodec.decode(c).get
    assert(meta.format == "mp4" && meta.width.contains(640))
    // tamper one byte of sample 4 (find it via the b layout's tables)
    val tampered = b.clone()
    // sample 4 lives in chunk 2 (0-based: chunks of 3) at in-chunk pos 1
    val fpPos = MediaCodec.mp4ContentFingerprint(tampered).get
    assert(fpPos.toSeq == fb.toSeq)
    // brute-force: flip bytes until exactly hash #4 changes
    val mdatAt = tampered.length - samples.map(_.length).sum
    val off4 = mdatAt + samples.take(4).map(_.length).sum
    tampered(off4 + 3) = (tampered(off4 + 3) ^ 0x33).toByte
    val ft = MediaCodec.mp4ContentFingerprint(tampered).get
    assert((0 until 7).filter(i => ft(i) != fb(i)) == Seq(4),
      "exactly the tampered sample's hash must change")
    assert(MediaCodec.mp4ContentFingerprint(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("synthesizeCompressedTwin: variants of one family differ " +
      "byte-wise but share the fingerprint; families never collide; " +
      "compressedNearDupClusters recovers the twin rule end to end") {
    import spark.implicits._
    val ids = (0L until 60L)
    // byte-level: variants differ, fingerprints agree within a family
    ids.grouped(3).foreach { g =>
      val fams = g.map(MediaCodec.synthesizeCompressedTwin)
      val bytes = fams.map(_._2)
      assert(bytes.map(_.length).distinct.size > 1 ||
        !bytes(0).sameElements(bytes(1)),
        s"variants of family ${g.head / 3} should differ byte-wise")
      val fps = bytes.map(b => MediaCodec.contentFingerprint(b).get._2.toSeq)
      assert(fps.distinct.size == 1,
        s"family ${g.head / 3} variants must fingerprint identically")
    }
    // cross-family: all 20 fingerprint sequences distinct
    val perFam = ids.grouped(3).map(g =>
      MediaCodec.contentFingerprint(
        MediaCodec.synthesizeCompressedTwin(g.head)._2).get._2.toSeq).toSeq
    assert(perFam.distinct.size == perFam.size, "families must not collide")
    // Spark end to end: clusters of exactly 3, rep = family min id
    val assets = spark.createDataset(ids.map { d =>
      val (fmt, b) = MediaCodec.synthesizeCompressedTwin(d)
      Multimodal.Asset(d, fmt, b, "t")
    }.toSeq)
    val rows = Multimodal.compressedNearDupClusters(assets)(spark)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.length == 20)
    rows.zipWithIndex.foreach { case ((rep, fmt, n, sum), i) =>
      assert(rep == 3L * i && n == 3 && sum == 9L * i + 3,
        s"cluster $i: ($rep, $n, $sum)")
      assert(fmt == (if (i % 2 == 0) "mp3" else "mp4"))
    }
  }

  // ---------- pure-JVM baseline JPEG codec ----------

  test("hand-built baseline JPEG decodes against the format spec, not our encoder") {
    // one 8x8 block, quant table all 16s, standard Annex K Huffman
    // tables, DC-only entropy data assembled bit-by-bit BY HAND:
    //   DC category 3 code = '100', magnitude bits '101' (+5)
    //   EOB = '1010'  → 100 101 1010 padded with 1s = 1001 0110 1011
    // expected pixels: coef0 = 5·16 = 80 → IDCT DC-only = 80/8 = 10
    // → level shift = 138 everywhere.
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xFFD8)
    u16(0xFFDB); u16(2 + 1 + 64); u8(0)
    (0 until 64).foreach(_ => u8(16))
    u16(0xFFC0); u16(11); u8(8); u16(8); u16(8); u8(1); u8(1); u8(0x11); u8(0)
    val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    u16(0xFFC4); u16(2 + 1 + 16 + 12); u8(0x00)
    dcBits.foreach(u8); (0 to 11).foreach(u8)
    // a tiny AC table is enough: we only need EOB to be decodable, but
    // write the REAL Annex K AC table so the canonical-code build is
    // exercised at full size
    val acVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
      0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
      0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
      0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
      0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
      0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
      0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
      0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
      0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
    u16(0xFFC4); u16(2 + 1 + 16 + acVals.length); u8(0x10)
    acBits.foreach(u8); acVals.foreach(u8)
    u16(0xFFDA); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    u8(Integer.parseInt("10010110", 2)); u8(Integer.parseInt("10111111", 2))
    u16(0xFFD9)
    val b = out.toByteArray
    val (w, h, nc, vs) = MediaCodec.decodeJpegBaseline(b).get
    assert(w == 8 && h == 8 && nc == 1)
    assert(vs.forall(_ == 138), s"expected uniform 138, got ${vs.toSeq.distinct}")
    // header-only parse agrees, and the generic dispatch reports jpeg
    val m = MediaCodec.decode(b).get
    assert(m.format == "jpeg" && m.width.contains(8) && m.height.contains(8))
  }

  test("JPEG encoder -> own decoder round trip: smooth image, near-exact at high quality") {
    val w = 37 // deliberately not multiples of 8: edge-block padding
    val h = 21
    def px(x: Int, y: Int): Int = 40 + (3 * x + 5 * y) % 160
    val jpg = MediaCodec.encodeJpegGray(w, h, 95, px)
    val (dw, dh, nc, vs) = MediaCodec.decodeJpegBaseline(jpg).get
    assert(dw == w && dh == h && nc == 1)
    var sumErr = 0L
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val e = math.abs(vs(y * w + x) - px(x, y))
      sumErr += e
      maxErr = math.max(maxErr, e)
    }
    val mean = sumErr.toDouble / (w * h)
    assert(mean <= 3.0 && maxErr <= 25,
      s"round-trip error too large: mean=$mean max=$maxErr")
  }

  test("JPEG interop: own encoder read by ImageIO equals own decoder (IDCT rounding only)") {
    val w = 48
    val h = 32
    def px(x: Int, y: Int): Int = (x * 31 + y * 57 + (x * y) % 13) % 256
    val jpg = MediaCodec.encodeJpegGray(w, h, 85, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO could not parse our encoder's output")
    assert(img.getWidth == w && img.getHeight == h)
    val (_, _, _, own) = MediaCodec.decodeJpegBaseline(jpg).get
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      // raster sample, NOT getRGB: TYPE_BYTE_GRAY getRGB runs a linear→
      // sRGB colorspace conversion that gamma-bends the raw JPEG sample
      val jdkV = img.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(own(y * w + x) - jdkV))
    }
    assert(maxDiff <= 2, s"own decode vs libjpeg decode differ by $maxDiff")
  }

  test("JPEG interop: ImageIO-encoded grayscale and color files decode through the own baseline path") {
    // grayscale (1 component): strict agreement with the JDK decoder
    val w = 40
    val h = 24
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) // raster, not setRGB (gamma)
      gray.getRaster.setSample(x, y, 0, (x * 11 + y * 23) % 256)
    val gout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "jpg", gout))
    val gbytes = gout.toByteArray
    val Some((gw, gh, gnc, gvs)) = MediaCodec.decodeJpegBaseline(gbytes)
    assert(gw == w && gh == h && gnc == 1)
    val gimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gbytes))
    var gMax = 0
    for (y <- 0 until h; x <- 0 until w)
      gMax = math.max(gMax,
        math.abs(gvs(y * w + x) - gimg.getRaster.getSample(x, y, 0)))
    assert(gMax <= 2, s"grayscale decode drift vs JDK: $gMax")
    // color (3 components, 4:2:0): the JDK upsamples chroma with
    // triangular interpolation, we box-replicate — compare leniently on
    // the red channel
    val color = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) // smooth gradients, no mod wrap
      color.setRGB(x, y,
        ((40 + x * 4) << 16) | ((30 + y * 6) << 8) | ((x + y) * 2))
    val cout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(color, "jpg", cout))
    val cbytes = cout.toByteArray
    val Some((cw, ch, cnc, cvs)) = MediaCodec.decodeJpegBaseline(cbytes)
    assert(cw == w && ch == h && cnc == 3)
    val cimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cbytes))
    var cSum = 0L
    for (y <- 0 until h; x <- 0 until w)
      cSum += math.abs(cvs(y * w + x) - ((cimg.getRGB(x, y) >> 16) & 0xFF))
    val cMean = cSum.toDouble / (w * h)
    assert(cMean <= 4.0, s"color decode mean drift vs JDK: $cMean")
  }

  test("progressive JPEG: baseline decoder declines, decodeValues still reads via ImageIO") {
    val w = 24
    val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 31 + y * 3) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val prog = bos.toByteArray
    assert(MediaCodec.decodeJpegBaseline(prog).isEmpty,
      "progressive file must not decode through the baseline path")
    val (fmt, vs) = MediaCodec.decodeValues(prog).get // ImageIO fallback
    assert(fmt == "jpeg" && vs.length == w * h)
  }

  test("JPEG quality estimation inverts the encoder's DQT exactly; foreign tables estimate nearest") {
    // our own encoder: exact inversion across the quality range
    for (q <- Seq(5, 20, 40, 50, 75, 90, 95)) {
      val jpg = MediaCodec.encodeJpegGray(16, 16, q, (x, y) => (x * y) % 256)
      assert(MediaCodec.jpegQualityEstimate(jpg).contains(q),
        s"quality $q not recovered: ${MediaCodec.jpegQualityEstimate(jpg)}")
    }
    // the JDK encoder writes libjpeg-formula tables too (default q=75)
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, (x * 7 + y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jdkQ = MediaCodec.jpegQualityEstimate(bos.toByteArray)
    assert(jdkQ.exists(q => q >= 60 && q <= 90), s"JDK default quality: $jdkQ")
    // a hand-perturbed table (non-standard) still lands NEAR its origin
    val base = MediaCodec.encodeJpegGray(16, 16, 60, (_, _) => 128)
    // bump one DQT byte (first table entry, zigzag position 0 lives
    // right after the DQT header: FFDB len pq/tq)
    val mutated = base.clone()
    val dqtAt = (0 until base.length - 1).indexWhere(i =>
      (base(i) & 0xFF) == 0xFF && (base(i + 1) & 0xFF) == 0xDB)
    mutated(dqtAt + 5) = ((mutated(dqtAt + 5) & 0xFF) + 1).toByte
    val est = MediaCodec.jpegQualityEstimate(mutated)
    assert(est.exists(q => math.abs(q - 60) <= 3), s"perturbed estimate: $est")
    // non-JPEG input declines
    assert(MediaCodec.jpegQualityEstimate("not a jpeg".getBytes).isEmpty)
  }

  test("jpegQuantTables rejects truncated and cross-segment DQT instead of throwing or misparsing") {
    // a DQT that declares only 10 table bytes for a pq=0 table (needs 64);
    // the variants differ in what follows segEnd
    def malformedDqt(trailer: java.io.ByteArrayOutputStream => Unit)
        : Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(0xFF); bos.write(0xD8) // SOI
      bos.write(0xFF); bos.write(0xDB) // DQT
      val segLen = 2 + 1 + 10
      bos.write(segLen >> 8); bos.write(segLen & 0xFF)
      bos.write(0x00) // pq=0, tq=0
      (0 until 10).foreach(i => bos.write(16 + i))
      trailer(bos)
      bos.toByteArray
    }
    // file ends exactly at segEnd: the unguarded walk read past the end
    // of the array (AIOOBE killing the task on one malformed crawl asset)
    val truncated = malformedDqt(_ => ())
    assert(MediaCodec.jpegQuantTables(truncated).isEmpty)
    assert(MediaCodec.jpegQualityEstimate(truncated).isEmpty)
    // more file after segEnd: the unguarded walk silently parsed the NEXT
    // segment's bytes (a COM full of 0x41) as quant values
    val crossSegment = malformedDqt { bos =>
      bos.write(0xFF); bos.write(0xFE); bos.write(0); bos.write(60)
      (0 until 58).foreach(_ => bos.write(0x41))
    }
    assert(MediaCodec.jpegQuantTables(crossSegment).isEmpty)
    // a precision nibble outside {0,1} is equally malformed
    val badPq = {
      val b = malformedDqt(_ => ())
      b(6) = 0x20.toByte // pq=2
      b
    }
    assert(MediaCodec.jpegQuantTables(badPq).isEmpty)
    // well-formed files still parse
    val ok = MediaCodec.encodeJpegGray(8, 8, 75, (_, _) => 128)
    assert(MediaCodec.jpegQuantTables(ok).exists(_.contains(0)))
  }

  test("synthesizeJpegTwin: re-encoded variants cluster by perceptual hash, families separate") {
    val nFamilies = 40
    // pattern safety pool must be deep enough that contentId → (geometry,
    // pattern) stays injective far past any gate corpus: the bound is
    // 256·|safe| content families = 768·|safe| doc ids; sf10's max
    // doc_id is 994,999 → need |safe| ≥ 1,296. Demand 3× headroom.
    assert(MediaCodec.PhashSafePatterns.length >= 4000,
      s"safe-pattern pool too small: ${MediaCodec.PhashSafePatterns.length}")
    val perFamily = (0 until nFamilies).map { c =>
      val variants = (0 until 3).map(v => MediaCodec.synthesizeJpegTwin(3L * c + v))
      // re-encodes share no bytes (different tables AND entropy data)
      assert(variants.map(_.toSeq).distinct.size == 3,
        s"family $c variants are byte-identical")
      val hashes = variants.map { b =>
        val (fmt, w, h, means) = graft.multimodal.Multimodal.cellMeans(b).get
        assert(fmt == "jpeg")
        (w, h, graft.multimodal.Multimodal.ahashOf(means),
          graft.multimodal.Multimodal.phashOf(means))
      }
      assert(hashes.distinct.size == 1,
        s"family $c hashes split across qualities: $hashes")
      hashes.head
    }
    assert(perFamily.distinct.size == nFamilies,
      "distinct families collided on the perceptual consensus key")
  }
}
