package graft.multimodal

/** Pure-JVM codecs for media containers: BMP (Windows bitmap), PPM/PGM
  * (binary netpbm) and WAV (RIFF PCM) via byte-level parsers, plus
  * PNG/JPEG/GIF via OpenJDK's pure-Java `javax.imageio` readers.
  *
  * The raw-format paths are REAL header parsers — width/height/
  * sample-rate/duration come from byte arithmetic over the actual
  * container layout, not from a hash fake. No OS codec or native library
  * is involved anywhere (ImageIO's PNG/JPEG/GIF readers are pure Java),
  * so everything runs in every Spark executor with zero extra deps.
  * Compressed audio: G.711 µ-law/a-law WAV variants (format codes 7/6)
  * decode through the standard CCITT expansion — bit-identical to the
  * JDK's `javax.sound.sampled` ULAW/ALAW converters (spec-checked).
  * Remaining compressed formats (MP3/MP4/...) still fall back to the
  * declared stub in [[Multimodal.Decode]]; the dispatch lives in
  * [[decode]].
  *
  * Encoders exist so specs and the td39 oracle can synthesize byte-exact
  * files whose expected metadata is computable in plain SQL — decode of a
  * synthesized asset must reproduce the generation parameters exactly.
  */
object MediaCodec {

  /** Unified decoded metadata across image and audio containers.
    * `bitDepth` is bits per channel (BMP 24bpp → 3 channels × 8 bits).
    * `nSamples` counts frames (per-channel samples); `durationUs` is
    * integer microseconds (floor), keeping the value oracle-comparable.
    */
  final case class MediaMeta(
      format: String,
      width: Option[Int],
      height: Option[Int],
      channels: Int,
      bitDepth: Int,
      sampleRate: Option[Int],
      nSamples: Option[Long],
      durationUs: Option[Long])

  // ---------- little-endian byte helpers ----------

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  private def tag(b: Array[Byte], off: Int, s: String): Boolean =
    off + s.length <= b.length &&
      (0 until s.length).forall(i => b(off + i) == s.charAt(i).toByte)

  private def putTag(b: Array[Byte], off: Int, s: String): Unit = {
    var i = 0
    while (i < s.length) { b(off + i) = s.charAt(i).toByte; i += 1 }
  }

  // ---------- BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp) ----------

  /** Encode a 24bpp uncompressed BMP. `pixel(x, y)` returns packed
    * 0xRRGGBB. Rows are stored bottom-up and padded to 4-byte boundaries,
    * per the format spec.
    */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "BMP dimensions must be positive")
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong)   // file size
    putU32(out, 10, 54L)                // pixel data offset
    putU32(out, 14, 40L)                // BITMAPINFOHEADER size
    putU32(out, 18, width.toLong)
    putU32(out, 22, height.toLong)
    putU16(out, 26, 1)                  // planes
    putU16(out, 28, 24)                 // bits per pixel
    putU32(out, 30, 0L)                 // BI_RGB (uncompressed)
    putU32(out, 34, dataSize.toLong)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val rgb = pixel(x, y)
        out(rowOff + x * 3) = (rgb & 0xFF).toByte          // B
        out(rowOff + x * 3 + 1) = ((rgb >> 8) & 0xFF).toByte  // G
        out(rowOff + x * 3 + 2) = ((rgb >> 16) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  private def decodeBmp(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val bpp = u16(b, 28)
    val compression = u32(b, 30)
    if (compression != 0L || (bpp != 8 && bpp != 24 && bpp != 32)) return None
    val w = i32(b, 18)
    val h = math.abs(i32(b, 22)) // negative height = top-down rows
    if (w <= 0 || h == 0) return None
    Some(MediaMeta("bmp", Some(w), Some(h), bpp / 8, 8, None, None, None))
  }

  // ---------- PPM / PGM (binary netpbm: P6 / P5) ----------

  /** Encode a binary PPM (P6). Header is exactly
    * `P6\nW H\nMAXVAL\n` so the total byte size is computable in SQL.
    */
  def encodePpm(width: Int, height: Int, maxVal: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && maxVal > 0 && maxVal < 256)
    val header = s"P6\n$width $height\n$maxVal\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val rgb = pixel(x, y)
        out(i) = ((rgb >> 16) & 0xFF).toByte
        out(i + 1) = ((rgb >> 8) & 0xFF).toByte
        out(i + 2) = (rgb & 0xFF).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a binary PGM (P5), single gray channel. */
  def encodePgm(width: Int, height: Int, maxVal: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && maxVal > 0 && maxVal < 256)
    val header = s"P5\n$width $height\n$maxVal\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        out(i) = (px(x, y) & 0xFF).toByte
        i += 1; x += 1
      }
      y += 1
    }
    out
  }

  private def isPnmWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t'

  private def decodePnm(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return None
    var pos = 2
    // netpbm headers allow arbitrary whitespace and '#'-to-EOL comments
    def nextInt(): Option[Int] = {
      while (pos < b.length && (isPnmWs(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else pos += 1
      }
      val start = pos
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
      // > 9 digits cannot be a sane dimension/maxval and would overflow
      // Int — malformed header ⇒ None, never a NumberFormatException
      if (pos == start || pos - start > 9) None
      else Some(new String(b, start, pos - start, "US-ASCII").toInt)
    }
    val gray = b(1) == '5'
    for {
      w <- nextInt(); h <- nextInt(); maxv <- nextInt()
      // netpbm requires 0 < maxval < 65536; a 6+-digit maxval is a
      // malformed header, not a valid 16-bit image
      if w > 0 && h > 0 && maxv > 0 && maxv < 65536
    } yield MediaMeta(if (gray) "pgm" else "ppm", Some(w), Some(h),
      if (gray) 1 else 3, if (maxv > 255) 16 else 8, None, None, None)
  }

  // ---------- WAV (RIFF, PCM) ----------

  /** Encode a PCM WAV. `samples` is interleaved 16-bit frames
    * (length = frames × channels); total size = 44 + 2·|samples|.
    */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    putTag(out, 0, "RIFF")
    putU32(out, 4, (36 + dataSize).toLong)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt ")
    putU32(out, 16, 16L)                 // fmt chunk size
    putU16(out, 20, 1)                   // PCM
    putU16(out, 22, channels)
    putU32(out, 24, sampleRate.toLong)
    putU32(out, 28, sampleRate.toLong * channels * 2) // byte rate
    putU16(out, 32, channels * 2)        // block align
    putU16(out, 34, 16)                  // bits per sample
    putTag(out, 36, "data")
    putU32(out, 40, dataSize.toLong)
    var i = 0
    while (i < samples.length) {
      putU16(out, 44 + i * 2, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  // ---------- G.711 companding (µ-law / a-law WAV, format codes 7 / 6) ----------

  /** G.711 µ-law byte → linear 16-bit sample. Same table the JDK's
    * `javax.sound.sampled` UlawCodec builds (CCITT G.711): bias 0x84,
    * 3-bit exponent, 4-bit mantissa, stored complemented.
    */
  def ulawToPcm(u: Int): Short = {
    val b = ~u & 0xFF
    var t = ((b & 0x0F) << 3) + 132
    t <<= (b & 0x70) >> 4
    (if ((b & 0x80) != 0) 132 - t else t - 132).toShort
  }

  /** Linear 16-bit sample → G.711 µ-law byte (clip 32635, bias 0x84). */
  def pcmToUlaw(s0: Int): Byte = {
    var sample = s0
    val sign = if (sample < 0) { sample = -sample; 0x80 } else 0
    if (sample > 32635) sample = 32635
    sample += 132
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (sample & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (sample >> (exp + 3)) & 0x0F
    (~(sign | (exp << 4) | mant) & 0xFF).toByte
  }

  /** G.711 a-law byte → linear 16-bit sample (JDK AlawCodec convention:
    * after the 0x55 XOR, bit 0x80 SET means positive).
    */
  def alawToPcm(a0: Int): Short = {
    val a = (a0 & 0xFF) ^ 0x55
    var v = ((a & 0x0F) << 4) + 8
    val seg = (a & 0x70) >> 4
    if (seg >= 1) v += 0x100
    if (seg > 1) v <<= seg - 1
    (if ((a & 0x80) == 0) -v else v).toShort
  }

  /** Linear 16-bit sample → G.711 a-law byte. */
  def pcmToAlaw(s0: Int): Byte = {
    var sample = s0
    val sign = if (sample >= 0) 0x80 else { sample = -sample; 0 }
    if (sample > 32635) sample = 32635
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (sample & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant =
      if (exp == 0) (sample >> 4) & 0x0F
      else (sample >> (exp + 3)) & 0x0F
    ((sign | (exp << 4) | mant) ^ 0x55).toByte
  }

  /** Encode a G.711-companded WAV (format code 7 = µ-law, 6 = a-law,
    * 8 bits/sample): compress the 16-bit frames through the matching
    * compressor and emit a standard RIFF/fmt/data layout. Decoding with
    * [[decodeValues]] (or the JDK's `AudioSystem` ULAW/ALAW→PCM
    * conversion) expands each stored byte back to its 16-bit code.
    */
  def encodeWavG711(sampleRate: Int, channels: Int, samples: Array[Short],
      uLaw: Boolean): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataSize = samples.length
    val out = new Array[Byte](44 + dataSize)
    putTag(out, 0, "RIFF")
    putU32(out, 4, (36 + dataSize).toLong)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt ")
    putU32(out, 16, 16L)
    putU16(out, 20, if (uLaw) 7 else 6)   // WAVE_FORMAT_MULAW / ALAW
    putU16(out, 22, channels)
    putU32(out, 24, sampleRate.toLong)
    putU32(out, 28, sampleRate.toLong * channels) // 1 byte per sample
    putU16(out, 32, channels)
    putU16(out, 34, 8)
    putTag(out, 36, "data")
    putU32(out, 40, dataSize.toLong)
    var i = 0
    while (i < samples.length) {
      out(44 + i) =
        if (uLaw) pcmToUlaw(samples(i).toInt) else pcmToAlaw(samples(i).toInt)
      i += 1
    }
    out
  }

  /** Next chunk position after the one at `pos` with payload `size` —
    * word-aligned, computed in Long so a crafted 32-bit size field can
    * never wrap negative (infinite loop) or overflow the index space.
    * Returns -1 when the advance would not move forward or leaves the
    * buffer (corrupt size ⇒ stop walking, let field validation reject).
    */
  private def nextChunk(pos: Int, size: Long, len: Int): Int = {
    val next = pos.toLong + 8L + size + (size & 1L)
    if (next <= pos || next > len.toLong) -1 else next.toInt
  }

  private def decodeWav(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var pos = 12
    var fmtCode = -1
    var channels = 0
    var rate = 0
    var bits = 0
    var dataSize = -1L
    // walk RIFF chunks: fmt and data may be separated by others (LIST, ...)
    while (pos >= 0 && pos + 8 <= b.length && (channels == 0 || dataSize < 0)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = u32(b, pos + 4)
      if (id == "fmt " && pos + 8 + 16 <= b.length) {
        fmtCode = u16(b, pos + 8)
        channels = u16(b, pos + 10)
        rate = u32(b, pos + 12).toInt
        bits = u16(b, pos + 22)
      } else if (id == "data") {
        dataSize = math.min(size, (b.length - pos - 8).toLong)
      }
      pos = nextChunk(pos, size, b.length)
    }
    // format name distinguishes companding: 1 = linear PCM ("wav"),
    // 7 = G.711 µ-law, 6 = G.711 a-law (both 8 bits stored / sample)
    val fmtName = fmtCode match {
      case 1 => "wav"
      case 7 => "wav_ulaw"
      case 6 => "wav_alaw"
      case _ => return None // compressed codecs beyond G.711: declared stub
    }
    // bits must be a whole byte multiple (PCM container alignment): a
    // 12-bit depth would silently floor to 1 byte/sample and misreport
    // frame count and duration — reject instead
    if (channels <= 0 || rate <= 0 || bits < 8 || bits % 8 != 0 ||
      bits > 64 || dataSize < 0 || (fmtCode != 1 && bits != 8)) None
    else {
      val frames = dataSize / (channels.toLong * (bits / 8))
      Some(MediaMeta(fmtName, None, None, channels, bits, Some(rate),
        Some(frames), Some(frames * 1000000L / rate)))
    }
  }

  // ---------- payload decoding (pixel / sample values) ----------

  /** Decode the PAYLOAD, not just the header: row-major values per
    * container —
    *   - BMP 24bpp: red channel per pixel, top row first (undoing the
    *     container's bottom-up row order and 4-byte row padding; top-down
    *     negative-height files read in storage order);
    *   - PPM (P6): red channel per pixel; PGM (P5): the gray byte —
    *     netpbm stores top-down unpadded, maxval ≤ 255 only;
    *   - WAV PCM16: interleaved samples as signed ints.
    * Row-major order is part of the contract — an order-sensitive
    * checksum over these values catches padding/row-flip bugs that
    * order-invariant stats (sum/min/max) cannot.
    */
  def decodeValues(b: Array[Byte]): Option[(String, Array[Int])] = {
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
      val meta = decodeBmp(b).getOrElse(return None)
      if (u16(b, 28) != 24) return None // value decode: 24bpp only
      val w = meta.width.get
      val hRaw = i32(b, 22)
      val h = meta.height.get
      // all guards in Long: a crafted offset (negative after toInt) or a
      // huge width (rowSize/array-size Int overflow) must yield None, not
      // an index crash or NegativeArraySizeException
      val off = u32(b, 10)
      val rowSize = (w.toLong * 3 + 3) / 4 * 4
      if (off < 54 || w.toLong * h > (1L << 28) ||
        off + rowSize * h > b.length) return None
      val out = new Array[Int](w * h)
      val offI = off.toInt         // bounded by b.length via the guard
      val rowSizeI = rowSize.toInt
      var y = 0
      while (y < h) {
        // positive height = bottom-up storage: top image row is the LAST
        val rowOff = offI + (if (hRaw > 0) (h - 1 - y) else y) * rowSizeI
        var x = 0
        while (x < w) {
          out(y * w + x) = b(rowOff + x * 3 + 2) & 0xFF // red channel
          x += 1
        }
        y += 1
      }
      Some(("bmp", out))
    } else if (b.length >= 2 && b(0) == 'P') {
      val meta = decodePnm(b).getOrElse(return None)
      if (meta.bitDepth != 8) return None
      val w = meta.width.get
      val h = meta.height.get
      val stride = meta.channels // 3 for P6, 1 for P5
      // re-scan the header to find where pixel data starts: the single
      // whitespace byte after maxval ends the header
      var pos = 2
      var fields = 0
      while (fields < 3 && pos < b.length) {
        while (pos < b.length && (isPnmWs(b(pos)) || b(pos) == '#')) {
          if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
          else pos += 1
        }
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
        fields += 1
      }
      pos += 1 // the single whitespace terminating the header
      if (pos + w.toLong * h * stride > b.length) return None
      val out = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        out(i) = b(pos + i * stride) & 0xFF
        i += 1
      }
      Some((meta.format, out))
    } else if (b.length >= 12 && tag(b, 0, "RIFF")) {
      val meta = decodeWav(b).getOrElse(return None)
      val companded = meta.format != "wav"
      if (!companded && meta.bitDepth != 16) return None
      // re-walk chunks for the data offset
      var pos = 12
      var dataOff = -1
      var dataSize = 0L
      while (pos >= 0 && pos + 8 <= b.length && dataOff < 0) {
        val size = u32(b, pos + 4)
        if (tag(b, pos, "data")) {
          dataOff = pos + 8
          dataSize = math.min(size, (b.length - pos - 8).toLong)
        }
        pos = nextChunk(pos, size, b.length)
      }
      if (dataOff < 0) return None
      if (companded) {
        // G.711: each stored byte expands to one linear 16-bit sample —
        // the SAME value contract as PCM16, so every downstream audio op
        // (fingerprint, stats) runs unchanged over companded assets
        val uLaw = meta.format == "wav_ulaw"
        val n = dataSize.toInt
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) =
            if (uLaw) ulawToPcm(b(dataOff + i) & 0xFF).toInt
            else alawToPcm(b(dataOff + i) & 0xFF).toInt
          i += 1
        }
        Some((meta.format, out))
      } else {
        val n = (dataSize / 2).toInt
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = u16(b, dataOff + i * 2).toShort.toInt // sign-extend
          i += 1
        }
        Some(("wav", out))
      }
    } else {
      // JPEG: the pure-JVM baseline decoder first (deterministic, no
      // JDK-native libjpeg involved); progressive/exotic JPEGs and the
      // other compressed formats go through the ImageIO readers — the
      // same value contract (red channel row-major) either way, so
      // aHash/perceptual ops run unchanged over PNG/JPEG/GIF assets
      val own = decodeJpegBaseline(b).map { case (_, _, _, vs) => ("jpeg", vs) }
      own.orElse(imageIoFormat(b).flatMap { fmt =>
        readImageIo(b).map { img =>
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              out(y * w + x) = (img.getRGB(x, y) >> 16) & 0xFF
              x += 1
            }
            y += 1
          }
          (fmt, out)
        }
      })
    }
  }

  // ---------- compressed images via JDK ImageIO (PNG / JPEG / GIF) ----------

  /** Magic-sniffed format name for the containers OpenJDK's pure-Java
    * ImageIO readers handle; None for anything else (so arbitrary bytes
    * never pay an ImageIO parse attempt).
    */
  private def imageIoFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && tag(b, 1, "PNG")) Some("png")
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF &&
      (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) Some("jpeg")
    else if (b.length >= 6 && tag(b, 0, "GIF8")) Some("gif")
    else None

  private def readImageIo(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    catch { case _: Exception => None }

  /** Decode a compressed image through `javax.imageio` — OpenJDK ships
    * pure-Java PNG/JPEG/GIF readers, so no OS codec or native library is
    * involved (the rationale that kept these stubbed no longer applies).
    * Oracle-checked queries stay on the raw self-contained formats whose
    * bytes a SQL oracle can predict; ImageIO output feeds spec-level
    * checks (see `MediaCodecSpec`).
    */
  private def decodeImageIo(b: Array[Byte]): Option[MediaMeta] =
    imageIoFormat(b).flatMap { fmt =>
      readImageIo(b).map { img =>
        val cm = img.getColorModel
        MediaMeta(fmt, Some(img.getWidth), Some(img.getHeight),
          cm.getNumComponents, cm.getComponentSize(0), None, None, None)
      }
    }

  /** Encode ARGB pixels as PNG via ImageIO (spec/synthesis helper;
    * `pixel(x, y)` returns packed 0xRRGGBB, alpha forced opaque).
    */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, pixel(x, y) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---------- MP3 (MPEG audio frame headers; no codec payload) ----------
  //
  // Enough of ISO 11172-3/13818-3 for corpus stats and dedup keys on
  // real crawls: sync on the 11-bit frame sync, read version / layer /
  // bitrate / sample-rate / channel-mode from the 4-byte header, then
  // WALK the frame chain (each header states its own frame length) to
  // count frames — duration falls out of frames × samples-per-frame ÷
  // rate. ID3v2 tags are skipped via their syncsafe size. The codec
  // payload is never interpreted (that WOULD need a DSP stack); header
  // metadata is what the pipeline operators consume.

  // bitrate kbps by [versionRow][bitrateIndex] for LAYER III only:
  // row 0 = MPEG1, row 1 = MPEG2/2.5 (index 0 = "free", 15 = invalid)
  private val Mp3BitrateL3 = Array(
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
  // sample rate by [versionBits][srIndex]: versionBits 0=MPEG2.5, 2=MPEG2, 3=MPEG1
  private val Mp3Rates = Map(
    3 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    0 -> Array(11025, 12000, 8000))

  private def mp3Sync(b: Array[Byte], off: Int): Boolean =
    off + 3 < b.length && (b(off) & 0xFF) == 0xFF && (b(off + 1) & 0xE0) == 0xE0

  private def id3v2Size(b: Array[Byte]): Int =
    if (b.length >= 10 && tag(b, 0, "ID3"))
      10 + (((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F))
    else 0

  /** Encode `frames` valid MPEG Layer III frames (MPEG1 for rates ≥
    * 32 kHz, MPEG2 below), zero payload, no padding bit — so the byte
    * length is exactly frames × floor(coef·bitrate/rate) and a SQL
    * oracle can predict it. `id3Bytes > 0` prepends an ID3v2 tag of that
    * payload size (the decoder must skip it).
    */
  def encodeMp3(bitrateKbps: Int, sampleRate: Int, mono: Boolean,
      frames: Int, id3Bytes: Int = 0): Array[Byte] = {
    val versionBits = if (sampleRate >= 32000) 3 else 2
    val row = if (versionBits == 3) 0 else 1
    val bi = Mp3BitrateL3(row).indexOf(bitrateKbps)
    val si = Mp3Rates(versionBits).indexOf(sampleRate)
    require(bi > 0 && si >= 0, s"unsupported mp3 params $bitrateKbps/$sampleRate")
    val coef = if (versionBits == 3) 144000 else 72000
    val frameLen = coef * bitrateKbps / sampleRate
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      val tagBuf = new Array[Byte](10 + id3Bytes)
      putTag(tagBuf, 0, "ID3")
      tagBuf(3) = 4 // v2.4
      tagBuf(6) = ((id3Bytes >> 21) & 0x7F).toByte
      tagBuf(7) = ((id3Bytes >> 14) & 0x7F).toByte
      tagBuf(8) = ((id3Bytes >> 7) & 0x7F).toByte
      tagBuf(9) = (id3Bytes & 0x7F).toByte
      out.write(tagBuf)
    }
    val frame = new Array[Byte](frameLen)
    frame(0) = 0xFF.toByte
    frame(1) = (0xE0 | (versionBits << 3) | (1 << 1) | 1).toByte // layer III, no CRC
    frame(2) = ((bi << 4) | (si << 2)).toByte // padding 0, private 0
    frame(3) = (if (mono) 0xC0 else 0x00).toByte // channel mode
    (0 until frames).foreach(_ => out.write(frame))
    out.toByteArray
  }

  /** VBR twin of [[encodeMp3]]: one frame per entry of `bitrates`
    * (kbps, each a valid MPEG1/2 Layer III rate for `sampleRate`), the
    * payload bytes of frame f filled by `payload(f, i)` — real
    * variable-bitrate streams change the bitrate per frame, and a
    * content fingerprint must survive that.
    */
  def encodeMp3Frames(sampleRate: Int, mono: Boolean, bitrates: Seq[Int],
      payload: (Int, Int) => Byte, id3Bytes: Int = 0): Array[Byte] = {
    val versionBits = if (sampleRate >= 32000) 3 else 2
    val row = if (versionBits == 3) 0 else 1
    val si = Mp3Rates(versionBits).indexOf(sampleRate)
    require(si >= 0, s"unsupported mp3 rate $sampleRate")
    val coef = if (versionBits == 3) 144000 else 72000
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      val tagBuf = new Array[Byte](10 + id3Bytes)
      putTag(tagBuf, 0, "ID3")
      tagBuf(3) = 4
      tagBuf(6) = ((id3Bytes >> 21) & 0x7F).toByte
      tagBuf(7) = ((id3Bytes >> 14) & 0x7F).toByte
      tagBuf(8) = ((id3Bytes >> 7) & 0x7F).toByte
      tagBuf(9) = (id3Bytes & 0x7F).toByte
      out.write(tagBuf)
    }
    bitrates.zipWithIndex.foreach { case (br, f) =>
      val bi = Mp3BitrateL3(row).indexOf(br)
      require(bi > 0, s"unsupported mp3 bitrate $br")
      val frameLen = coef * br / sampleRate
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xFF.toByte
      frame(1) = (0xE0 | (versionBits << 3) | (1 << 1) | 1).toByte
      frame(2) = ((bi << 4) | (si << 2)).toByte
      frame(3) = (if (mono) 0xC0 else 0x00).toByte
      var i = 4
      while (i < frameLen) { frame(i) = payload(f, i - 4); i += 1 }
      out.write(frame)
    }
    out.toByteArray
  }

  // FNV-1a 64 over a byte range — the content-fingerprint hash (fixed,
  // portable, order-sensitive within a unit)
  private def fnv64(b: Array[Byte], from: Int, to: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < to) { h = (h ^ (b(i) & 0xFFL)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Order-sensitive MP3 CONTENT fingerprint: one 64-bit hash per frame,
    * over the frame's codec payload only (sync header + optional CRC
    * excluded — the bytes an ID3 retag, padding rewrite or header-flag
    * change cannot touch). Two files with the same audio payload in the
    * same order fingerprint identically no matter how their metadata
    * differs; None when no frame chain parses.
    */
  def mp3ContentFingerprint(b: Array[Byte]): Option[Array[Long]] = {
    var pos = id3v2Size(b)
    if (!mp3Sync(b, pos)) return None
    val h1 = b(pos + 1) & 0xFF
    val versionBits = (h1 >> 3) & 0x3
    if (versionBits == 1 || ((h1 >> 1) & 0x3) != 1) return None
    val row = if (versionBits == 3) 0 else 1
    val rates = Mp3Rates(versionBits)
    val coef = if (versionBits == 3) 144000 else 72000
    val fps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var ok = true
    while (ok && mp3Sync(b, pos)) {
      val crc = ((b(pos + 1) & 0x1) == 0) // protection bit 0 = CRC present
      val h2 = b(pos + 2) & 0xFF
      val bi = (h2 >> 4) & 0xF
      val si = (h2 >> 2) & 0x3
      val padding = (h2 >> 1) & 0x1
      if (bi == 0 || bi == 15 || si == 3) ok = false
      else {
        val len = coef * Mp3BitrateL3(row)(bi) / rates(si) + padding
        if (len <= 4 || pos + len > b.length) ok = false
        else {
          val payStart = pos + 4 + (if (crc) 2 else 0)
          fps += fnv64(b, payStart, pos + len)
          pos += len
        }
      }
    }
    if (fps.isEmpty) None else Some(fps.toArray)
  }

  private def decodeMp3(b: Array[Byte]): Option[MediaMeta] = {
    var pos = id3v2Size(b)
    if (!mp3Sync(b, pos)) return None
    val h1 = b(pos + 1) & 0xFF
    val versionBits = (h1 >> 3) & 0x3
    val layerBits = (h1 >> 1) & 0x3
    if (versionBits == 1 || layerBits != 1) return None // layer III only
    val row = if (versionBits == 3) 0 else 1
    val rates = Mp3Rates(versionBits)
    val firstH2 = b(pos + 2) & 0xFF
    val si0 = (firstH2 >> 2) & 0x3
    if (si0 == 3) return None
    val rate = rates(si0)
    val channels = if (((b(pos + 3) & 0xFF) >> 6) == 3) 1 else 2
    val spf = if (versionBits == 3) 1152L else 576L
    val coef = if (versionBits == 3) 144000 else 72000
    var frames = 0L
    // walk the frame chain: every frame's length comes from ITS header
    // (VBR streams change bitrate per frame)
    var ok = true
    while (ok && mp3Sync(b, pos)) {
      val h2 = b(pos + 2) & 0xFF
      val bi = (h2 >> 4) & 0xF
      val si = (h2 >> 2) & 0x3
      val padding = (h2 >> 1) & 0x1
      if (bi == 0 || bi == 15 || si == 3) ok = false // free/invalid: stop
      else {
        val len = coef * Mp3BitrateL3(row)(bi) / rates(si) + padding
        if (len <= 4 || pos + len > b.length) ok = false
        else { frames += 1; pos += len }
      }
    }
    if (frames == 0) None
    else Some(MediaMeta("mp3", None, None, channels, 0, Some(rate),
      Some(frames * spf), Some(frames * spf * 1000000L / rate)))
  }

  // ---------- MP3 Layer III side info (global_gain energy envelope) -----
  //
  // ISO 11172-3 §2.4.1.7 / 13818-3 §2.4.1.7: directly after a Layer III
  // frame header (+ optional CRC) sits the side-info block, carrying a
  // per-granule/channel `global_gain` (8 bits) — the quantizer step size
  // that tracks the granule's ENERGY. A re-encode at another bitrate
  // re-quantizes the same audio: every payload byte and frame size
  // changes (td106's content fingerprint cannot match them), but the
  // gain CONTOUR — whether each granule is louder than its predecessor —
  // survives, because any encoder's gain follows the audio's energy
  // envelope (a constant encoder offset cancels in the comparisons).
  // Reading global_gain needs only FIXED bit offsets inside the side
  // info (no Huffman tables, no filterbank):
  //   MPEG1: main_data_begin 9, private (mono 5 / stereo 3),
  //          scfsi 4·nch, then ngr=2 × nch blocks of 59 bits each —
  //          part2_3_length 12, big_values 9, GLOBAL_GAIN 8, ...
  //          (side info 17 bytes mono / 32 stereo)
  //   MPEG2: main_data_begin 8, private (mono 1 / stereo 2), ngr=1,
  //          per channel 63 bits — same leading field order
  //          (side info 9 bytes mono / 17 stereo)

  private def sideInfoBits(mpeg1: Boolean, nch: Int): (Int, Int, Int) = {
    // (header bits, bits per granule-channel block, granules per frame)
    if (mpeg1) (9 + (if (nch == 1) 5 else 3) + 4 * nch, 59, 2)
    else (8 + (if (nch == 1) 1 else 2), 63, 1)
  }

  private def setBits(buf: Array[Byte], bitOff: Int, width: Int,
      value: Int): Unit = {
    var i = 0
    while (i < width) {
      if (((value >> (width - 1 - i)) & 1) != 0) {
        val p = bitOff + i
        buf(p >> 3) = (buf(p >> 3) | (0x80 >> (p & 7))).toByte
      }
      i += 1
    }
  }

  private def getBits(b: Array[Byte], bitOff: Int, width: Int): Int = {
    var v = 0
    var i = 0
    while (i < width) {
      val p = bitOff + i
      v = (v << 1) | ((b(p >> 3) >> (7 - (p & 7))) & 1)
      i += 1
    }
    v
  }

  /** A frame's side-info block with the given per-(granule, channel)
    * global gains and every other field zero (part2_3_length = 0: the
    * frame declares no main data — a conforming decoder renders
    * silence, which is exactly what a synthesis fixture needs).
    * `gains.length` must be granules × channels (MPEG1: 2·nch).
    */
  private[graft] def mp3BitrateIndex(row: Int, kbps: Int): Int =
    Mp3BitrateL3(row).indexOf(kbps)
  private[graft] def mp3RateIndex(versionBits: Int, rate: Int): Int =
    Mp3Rates(versionBits).indexOf(rate)

  private[graft] def mp3SideInfo(gains: Seq[Int], nch: Int,
      mpeg1: Boolean): Array[Byte] = {
    val (hdr, block, ngr) = sideInfoBits(mpeg1, nch)
    require(gains.length == ngr * nch,
      s"need ${ngr * nch} gains, got ${gains.length}")
    require(gains.forall(g => g >= 0 && g <= 255), s"8-bit gains: $gains")
    val buf = new Array[Byte]((hdr + block * ngr * nch + 7) / 8)
    gains.zipWithIndex.foreach { case (g, i) =>
      setBits(buf, hdr + i * block + 21, 8, g) // past part2_3_length+big_values
    }
    buf
  }

  /** Per-granule global gains of a Layer III stream (channel-averaged,
    * integer floor), via the same frame-chain walk as
    * [[mp3ContentFingerprint]] — header + side-info bits only, no
    * entropy decode. None when no frame parses or a frame is too short
    * to hold its side info.
    */
  def mp3GranuleGains(b: Array[Byte]): Option[Array[Int]] = {
    var pos = id3v2Size(b)
    if (!mp3Sync(b, pos)) return None
    val h1 = b(pos + 1) & 0xFF
    val versionBits = (h1 >> 3) & 0x3
    if (versionBits == 1 || ((h1 >> 1) & 0x3) != 1) return None
    val mpeg1 = versionBits == 3
    val row = if (mpeg1) 0 else 1
    val rates = Mp3Rates(versionBits)
    val coef = if (mpeg1) 144000 else 72000
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var ok = true
    while (ok && mp3Sync(b, pos)) {
      val crc = ((b(pos + 1) & 0x1) == 0)
      val h2 = b(pos + 2) & 0xFF
      val bi = (h2 >> 4) & 0xF
      val si = (h2 >> 2) & 0x3
      val padding = (h2 >> 1) & 0x1
      val nch = if (((b(pos + 3) & 0xFF) >> 6) == 3) 1 else 2
      if (bi == 0 || bi == 15 || si == 3) ok = false
      else {
        val len = coef * Mp3BitrateL3(row)(bi) / rates(si) + padding
        val (hdr, block, ngr) = sideInfoBits(mpeg1, nch)
        val sideBytes = (hdr + block * ngr * nch + 7) / 8
        val sideStart = pos + 4 + (if (crc) 2 else 0)
        if (len <= 4 || pos + len > b.length ||
          sideStart + sideBytes > pos + len) ok = false
        else {
          var g = 0
          while (g < ngr) {
            var sum = 0
            var c = 0
            while (c < nch) {
              sum += getBits(b, sideStart * 8 +
                hdr + (g * nch + c) * block + 21, 8)
              c += 1
            }
            out += sum / nch
            g += 1
          }
          pos += len
        }
      }
    }
    if (out.isEmpty) None else Some(out.toArray)
  }

  /** Re-encode-robust audio fingerprint: the per-granule global-gain
    * CONTOUR — bit i = 1 iff gain(i+1) > gain(i) — packed MSB-first
    * into 64-bit words, plus the granule count. Invariant under a
    * constant encoder gain offset and under per-granule gain noise
    * smaller than the envelope's step; changes with the audio's energy
    * envelope. Two files of the same audio at different bitrates share
    * it; different audio does not.
    */
  def mp3EnergyContour(b: Array[Byte]): Option[(Int, Array[Long])] =
    mp3GranuleGains(b).map { gains =>
      val n = gains.length
      val words = new Array[Long]((math.max(n - 1, 1) + 63) / 64)
      var i = 0
      while (i < n - 1) {
        if (gains(i + 1) > gains(i))
          words(i >> 6) |= 0x8000000000000000L >>> (i & 63)
        i += 1
      }
      (n, words)
    }

  /** Deterministic MP3 re-encode twin (the td109 fixture, td107's twin
    * discipline for audio): contentId = id/3 fixes a granule-energy
    * envelope (a reflecting walk with steps of 5–8 gain units, 48–64
    * granules); the id%3 variant re-"encodes" it — different bitrate
    * (112/128/160), a constant gain offset (0/+3/−3), per-granule gain
    * jitter in {−1,0,+1} and disjoint payload filler bytes (variant 1
    * also wears an ID3v2 tag). Steps ≥5 with jitter spread ≤2 mean the
    * CONTOUR comparisons can never flip — variants share
    * [[mp3EnergyContour]] exactly while no payload byte survives —
    * and the ≥47-bit contour keeps distinct families collision-free
    * far past any gate corpus.
    */
  def synthesizeMp3Twin(id: Long): Array[Byte] = {
    val contentId = id / 3
    val v = (id % 3).toInt
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val ngr = 48 + 2 * ((contentId % 9).toInt) // even: MPEG1 = 2 gr/frame
    val base = new Array[Int](ngr)
    base(0) = 80 + (contentId % 48).toInt
    var i = 1
    while (i < ngr) {
      val step = 5 + (mix(contentId * 1009L + i) & 3L).toInt // 5..8
      val up =
        if (base(i - 1) + step > 210) false
        else if (base(i - 1) - step < 40) true
        else (mix(contentId * 31L + i * 7L) & 1L) == 0L
      base(i) = if (up) base(i - 1) + step else base(i - 1) - step
      i += 1
    }
    val bitrate = v match { case 0 => 112; case 1 => 128; case _ => 160 }
    val offset = v match { case 0 => 0; case 1 => 3; case _ => -3 }
    val gains = base.indices.map(g => base(g) + offset +
      ((mix(contentId * 131L + v * 17L + g * 13L) % 3L).toInt + 3) % 3 - 1)
    val frames = ngr / 2
    val sampleRate = 44100
    val frameLen = 144000 * bitrate / sampleRate
    val bi = Mp3BitrateL3(0).indexOf(bitrate)
    val si = Mp3Rates(3).indexOf(sampleRate)
    val out = new java.io.ByteArrayOutputStream()
    if (v == 1) { // ID3 retag on one variant: the walk must skip it
      val id3Bytes = 64
      val tagBuf = new Array[Byte](10 + id3Bytes)
      putTag(tagBuf, 0, "ID3")
      tagBuf(3) = 4
      tagBuf(9) = id3Bytes.toByte
      out.write(tagBuf)
    }
    var f = 0
    while (f < frames) {
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xFF.toByte
      frame(1) = (0xE0 | (3 << 3) | (1 << 1) | 1).toByte // MPEG1 L3, no CRC
      frame(2) = ((bi << 4) | (si << 2)).toByte
      frame(3) = 0xC0.toByte // mono
      val side = mp3SideInfo(Seq(gains(2 * f), gains(2 * f + 1)), nch = 1,
        mpeg1 = true)
      System.arraycopy(side, 0, frame, 4, side.length)
      var p = 4 + side.length
      while (p < frameLen) { // variant-disjoint filler: no shared bytes
        frame(p) = (mix(id * 8191L + f * 521L + p) & 0xFFL).toByte
        p += 1
      }
      out.write(frame)
      f += 1
    }
    out.toByteArray
  }

  // ---------- MP4 / ISO-BMFF (box walk; no codec payload) ----------
  //
  // ISO 14496-12 box structure: [u32 size][4cc type][payload], sizes
  // big-endian, size 1 → 64-bit largesize follows, size 0 → to EOF.
  // The walk reads ftyp (container check), moov/mvhd (timescale +
  // duration → wall-clock length) and each trak's mdia/hdlr handler
  // ('vide'/'soun') + tkhd width/height (16.16 fixed point) — the
  // metadata a corpus pipeline filters and dedups on.

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def putBe32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
    o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
  }

  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    putBe32(o, payload.length + 8L)
    fourcc.foreach(c => o.write(c.toInt))
    o.write(payload)
    o.toByteArray
  }

  /** Encode a minimal but structurally valid MP4: ftyp + moov(mvhd +
    * one video trak (tkhd with 16.16 width/height + mdia/hdlr 'vide')
    * + `audioTracks` audio traks (hdlr 'soun')) + an empty mdat.
    */
  def encodeMp4(timescale: Int, durationUnits: Long,
      width: Int, height: Int, audioTracks: Int = 0): Array[Byte] = {
    val ftypP = new java.io.ByteArrayOutputStream()
    "isom".foreach(c => ftypP.write(c.toInt)); putBe32(ftypP, 512L)
    "isommp42".grouped(4).foreach(_.foreach(c => ftypP.write(c.toInt)))
    val mvhdP = new java.io.ByteArrayOutputStream()
    putBe32(mvhdP, 0L); putBe32(mvhdP, 0L); putBe32(mvhdP, 0L) // v0, ctime, mtime
    putBe32(mvhdP, timescale.toLong); putBe32(mvhdP, durationUnits)
    putBe32(mvhdP, 0x00010000L); mvhdP.write(Array.fill[Byte](70)(0)) // rate + rest
    putBe32(mvhdP, audioTracks + 2L) // next track id
    def trak(handler: String, w: Int, h: Int, id: Int): Array[Byte] = {
      val tkhdP = new java.io.ByteArrayOutputStream()
      putBe32(tkhdP, 7L) // v0 + flags enabled
      putBe32(tkhdP, 0L); putBe32(tkhdP, 0L) // ctime, mtime
      putBe32(tkhdP, id.toLong); putBe32(tkhdP, 0L) // track id, reserved
      putBe32(tkhdP, durationUnits)
      tkhdP.write(Array.fill[Byte](52)(0)) // reserved+layer+group+volume+matrix[..]
      putBe32(tkhdP, w.toLong << 16); putBe32(tkhdP, h.toLong << 16)
      val hdlrP = new java.io.ByteArrayOutputStream()
      putBe32(hdlrP, 0L); putBe32(hdlrP, 0L) // v0, pre_defined
      handler.foreach(c => hdlrP.write(c.toInt))
      hdlrP.write(Array.fill[Byte](13)(0)) // reserved + empty name
      box("trak", box("tkhd", tkhdP.toByteArray) ++
        box("mdia", box("hdlr", hdlrP.toByteArray)))
    }
    val traks = trak("vide", width, height, 1) +:
      (0 until audioTracks).map(i => trak("soun", 0, 0, i + 2))
    val moov = box("moov",
      box("mvhd", mvhdP.toByteArray) ++ traks.reduce(_ ++ _))
    box("ftyp", ftypP.toByteArray) ++ moov ++ box("mdat", Array.emptyByteArray)
  }

  /** Walk `b`'s child boxes in [from, to), calling `f(type, payStart,
    * payEnd)`; tolerant of truncation (stops at the first bad size).
    */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var pos = from
    while (pos + 8 <= to) {
      val size0 = be32(b, pos)
      val typ = new String(b, pos + 4, 4, "ISO-8859-1")
      val (payStart, size) =
        if (size0 == 1L && pos + 16 <= to) (pos + 16, be64(b, pos + 8))
        else if (size0 == 0L) (pos + 8, (to - pos).toLong)
        else (pos + 8, size0)
      // size beyond Int range can't be in-array anyway (byte[] max);
      // checking before toInt keeps a hostile largesize from wrapping
      if (size < 8 || size > Int.MaxValue || pos + size > to) return
      f(typ, payStart, pos + size.toInt)
      pos += size.toInt
    }
  }

  private def decodeMp4(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 12 || !tag(b, 4, "ftyp")) return None
    var timescale = 0L
    var duration = -1L
    var vWidth: Option[Int] = None
    var vHeight: Option[Int] = None
    var tracks = 0
    walkBoxes(b, 0, b.length) { (typ, s, e) =>
      if (typ == "moov") walkBoxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "mvhd" && e2 - s2 >= 20) {
          val v = b(s2) & 0xFF
          // v1 carries 64-bit ctime/mtime/duration — needs 32 payload
          // bytes before the duration ends; a shorter box is malformed,
          // skip rather than read a neighboring box's bytes
          if (v == 1 && e2 - s2 >= 32) {
            timescale = be32(b, s2 + 20); duration = be64(b, s2 + 24)
          } else if (v == 0) {
            timescale = be32(b, s2 + 12); duration = be32(b, s2 + 16)
          }
        } else if (t2 == "trak") {
          tracks += 1
          var isVideo = false
          var tw = 0; var th = 0
          walkBoxes(b, s2, e2) { (t3, s3, e3) =>
            if (t3 == "tkhd" && e3 - s3 >= 8) {
              // width/height are the LAST 8 bytes of tkhd, both versions
              tw = (be32(b, e3 - 8) >> 16).toInt
              th = (be32(b, e3 - 4) >> 16).toInt
            } else if (t3 == "mdia") walkBoxes(b, s3, e3) { (t4, s4, _) =>
              if (t4 == "hdlr" && tag(b, s4 + 8, "vide")) isVideo = true
            }
          }
          if (isVideo && vWidth.isEmpty && tw > 0) {
            vWidth = Some(tw); vHeight = Some(th)
          }
        }
      }
    }
    if (timescale <= 0 || duration < 0) None
    else Some(MediaMeta("mp4", vWidth, vHeight, tracks, 0,
      Some(timescale.toInt), Some(duration),
      Some(duration * 1000000L / timescale)))
  }

  /** Encode an MP4 with a REAL sample layout: the video trak carries a
    * full `stbl` (stsc sample-to-chunk, stsz sample sizes, stco chunk
    * offsets — absolute, into the mdat payload) and the mdat holds the
    * concatenated `samples` bytes grouped `samplesPerChunk` per chunk.
    * `freeBytes > 0` inserts a `free` box between ftyp and moov — a
    * metadata-layout variant that moves every chunk offset without
    * touching a single content byte (remuxers do exactly this).
    */
  def encodeMp4Media(timescale: Int, durationUnits: Long,
      width: Int, height: Int, samples: Seq[Array[Byte]],
      samplesPerChunk: Int = 1, freeBytes: Int = 0): Array[Byte] = {
    require(samplesPerChunk >= 1, s"samplesPerChunk: $samplesPerChunk")
    val ftypP = new java.io.ByteArrayOutputStream()
    "isom".foreach(c => ftypP.write(c.toInt)); putBe32(ftypP, 512L)
    "isommp42".grouped(4).foreach(_.foreach(c => ftypP.write(c.toInt)))
    val ftyp = box("ftyp", ftypP.toByteArray)
    val free =
      if (freeBytes > 0) box("free", new Array[Byte](freeBytes))
      else Array.emptyByteArray
    val chunkCount = (samples.size + samplesPerChunk - 1) / samplesPerChunk
    def moovFor(chunkOffsets: Seq[Long]): Array[Byte] = {
      val mvhdP = new java.io.ByteArrayOutputStream()
      putBe32(mvhdP, 0L); putBe32(mvhdP, 0L); putBe32(mvhdP, 0L)
      putBe32(mvhdP, timescale.toLong); putBe32(mvhdP, durationUnits)
      putBe32(mvhdP, 0x00010000L); mvhdP.write(Array.fill[Byte](70)(0))
      putBe32(mvhdP, 2L)
      val tkhdP = new java.io.ByteArrayOutputStream()
      putBe32(tkhdP, 7L); putBe32(tkhdP, 0L); putBe32(tkhdP, 0L)
      putBe32(tkhdP, 1L); putBe32(tkhdP, 0L)
      putBe32(tkhdP, durationUnits)
      tkhdP.write(Array.fill[Byte](52)(0))
      putBe32(tkhdP, width.toLong << 16); putBe32(tkhdP, height.toLong << 16)
      val hdlrP = new java.io.ByteArrayOutputStream()
      putBe32(hdlrP, 0L); putBe32(hdlrP, 0L)
      "vide".foreach(c => hdlrP.write(c.toInt))
      hdlrP.write(Array.fill[Byte](13)(0))
      val stscP = new java.io.ByteArrayOutputStream()
      putBe32(stscP, 0L); putBe32(stscP, 1L) // one uniform run
      putBe32(stscP, 1L); putBe32(stscP, samplesPerChunk.toLong)
      putBe32(stscP, 1L) // sample description index
      val stszP = new java.io.ByteArrayOutputStream()
      putBe32(stszP, 0L); putBe32(stszP, 0L) // varying sizes
      putBe32(stszP, samples.size.toLong)
      samples.foreach(s => putBe32(stszP, s.length.toLong))
      val stcoP = new java.io.ByteArrayOutputStream()
      putBe32(stcoP, 0L); putBe32(stcoP, chunkOffsets.size.toLong)
      chunkOffsets.foreach(o => putBe32(stcoP, o))
      val stbl = box("stbl", box("stsc", stscP.toByteArray) ++
        box("stsz", stszP.toByteArray) ++ box("stco", stcoP.toByteArray))
      val trak = box("trak", box("tkhd", tkhdP.toByteArray) ++
        box("mdia", box("hdlr", hdlrP.toByteArray) ++
          box("minf", stbl)))
      box("moov", box("mvhd", mvhdP.toByteArray) ++ trak)
    }
    // stco holds ABSOLUTE offsets, but the moov length is offset-value
    // independent (fixed-width u32 entries): measure with zeros, then
    // rebuild with the real offsets
    val moovLen = moovFor(Seq.fill(chunkCount)(0L)).length
    val mdatPayloadStart = ftyp.length + free.length + moovLen + 8L
    val chunkOffsets = samples.grouped(samplesPerChunk)
      .scanLeft(mdatPayloadStart) { (off, chunk) =>
        off + chunk.map(_.length.toLong).sum
      }
      .take(chunkCount).toSeq
    val mdatP = new java.io.ByteArrayOutputStream()
    samples.foreach(mdatP.write)
    ftyp ++ free ++ moovFor(chunkOffsets) ++ box("mdat", mdatP.toByteArray)
  }

  /** Order-sensitive MP4 CONTENT fingerprint via the sample-table walk:
    * per trak, resolve each sample's absolute byte range from
    * stsc/stsz/stco (the index a remux rewrites but whose TARGET bytes
    * it cannot change) and hash the sample bytes, in (trak, sample)
    * order. Chunk re-layout, free-box padding, moov edits and timescale
    * rewrites all leave the fingerprint fixed; one changed content byte
    * changes its sample's hash. None when no trak carries a usable
    * sample table.
    */
  def mp4ContentFingerprint(b: Array[Byte]): Option[Array[Long]] = {
    if (b.length < 12 || !tag(b, 4, "ftyp")) return None
    val fps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var malformed = false
    walkBoxes(b, 0, b.length) { (typ, s, e) =>
      if (typ == "moov") walkBoxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "trak") {
          // per-trak sample tables
          var stsc: Seq[(Long, Long)] = Seq.empty // (firstChunk, perChunk)
          var sizes: Array[Long] = null
          var offsets: Array[Long] = null
          walkBoxes(b, s2, e2) { (t3, s3, e3) =>
            if (t3 == "mdia") walkBoxes(b, s3, e3) { (t4, s4, e4) =>
              if (t4 == "minf") walkBoxes(b, s4, e4) { (t5, s5, e5) =>
                if (t5 == "stbl") walkBoxes(b, s5, e5) { (t6, s6, e6) =>
                  t6 match {
                    case "stsc" if e6 - s6 >= 8 =>
                      val n = be32(b, s6 + 4).toInt
                      if (s6 + 8 + 12L * n <= e6)
                        stsc = (0 until n).map(i => (be32(b, s6 + 8 + 12 * i),
                          be32(b, s6 + 12 + 12 * i)))
                    case "stsz" if e6 - s6 >= 12 =>
                      val fixed = be32(b, s6 + 4)
                      val n = be32(b, s6 + 8).toInt
                      if (fixed > 0) sizes = Array.fill(n)(fixed)
                      else if (s6 + 12 + 4L * n <= e6)
                        sizes = Array.tabulate(n)(i => be32(b, s6 + 12 + 4 * i))
                    case "stco" if e6 - s6 >= 8 =>
                      val n = be32(b, s6 + 4).toInt
                      if (s6 + 8 + 4L * n <= e6)
                        offsets = Array.tabulate(n)(i => be32(b, s6 + 8 + 4 * i))
                    case "co64" if e6 - s6 >= 8 =>
                      val n = be32(b, s6 + 4).toInt
                      if (s6 + 8 + 8L * n <= e6)
                        offsets = Array.tabulate(n)(i => be64(b, s6 + 8 + 8 * i))
                    case _ => ()
                  }
                }
              }
            }
          }
          if (sizes != null && offsets != null && stsc.nonEmpty) {
            // chunk c (1-based) takes the perChunk of the last stsc entry
            // with firstChunk <= c; samples run consecutively per chunk
            var sample = 0
            var chunk = 1
            while (sample < sizes.length && chunk <= offsets.length) {
              val perChunk = stsc.takeWhile(_._1 <= chunk).lastOption
                .map(_._2.toInt).getOrElse(0)
              var off = offsets(chunk - 1)
              var k = 0
              while (k < perChunk && sample < sizes.length) {
                val sz = sizes(sample)
                if (off < 0 || sz < 0 || off + sz > b.length) {
                  malformed = true; k = perChunk; sample = sizes.length
                } else {
                  fps += fnv64(b, off.toInt, (off + sz).toInt)
                  off += sz; sample += 1; k += 1
                }
              }
              chunk += 1
            }
            if (sample < sizes.length) malformed = true // ran out of chunks
          }
        }
      }
    }
    if (malformed || fps.isEmpty) None else Some(fps.toArray)
  }

  /** Content fingerprint dispatch: sniff the container, return
    * `(format, per-unit hashes)` — frames for MP3, samples for MP4.
    */
  def contentFingerprint(bytes: Array[Byte]): Option[(String, Array[Long])] =
    if (bytes.length >= 12 && tag(bytes, 4, "ftyp"))
      mp4ContentFingerprint(bytes).map(("mp4", _))
    else if ((bytes.length >= 10 && tag(bytes, 0, "ID3")) ||
      mp3Sync(bytes, 0))
      mp3ContentFingerprint(bytes).map(("mp3", _))
    else None

  // ---------- JPEG (ITU-T T.81 BASELINE sequential, pure JVM) ----------
  //
  // A from-scratch baseline JPEG codec — no ImageIO, no libjpeg, no
  // native code: marker parse, DQT/DHT tables, canonical Huffman
  // decode with byte-unstuffing and RSTn handling, dequant, double-
  // precision separable IDCT, box chroma upsampling, YCbCr→RGB. The
  // point is PERCEPTUAL dedup of compressed crawls: a re-ENCODED copy
  // (same image, different quality/bitrate) defeats the td106 payload
  // fingerprints — only decoded-pixel hashes (aHash/pHash) catch it,
  // and that needs a decoder every executor can run. Progressive
  // (SOF2) and arithmetic-coded files return None (the ImageIO
  // fallback still reads them); baseline covers the dominant share of
  // crawl JPEGs. The encoder (grayscale, Annex K tables scaled by the
  // libjpeg quality formula) exists so specs and oracles can SYNTHESIZE
  // re-encode twins whose decoded geometry is computable in plain SQL.

  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.1/K.2 base quantization tables, natural (row-major) order
  private val JpegLumQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // Annex K.3 standard Huffman specs (BITS ++ HUFFVAL), luminance
  private val JpegDcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcLumVals = (0 to 11).toArray
  private val JpegAcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val JpegAcLumVals: Array[Int] = Array(
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

  // cos((2x+1)·u·π/16) · C(u), the shared 1-D DCT basis (double; JVM
  // IEEE arithmetic makes the codec bit-deterministic across executors)
  private val JpegCos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** libjpeg quality → scaled Annex K table (natural order). */
  private def jpegScaledQuant(quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    JpegLumQuant.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  private final class JpegHuffDecoder(bits: Array[Int], vals: Array[Int]) {
    // canonical decode tables per T.81 F.2.2.3
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr: Array[Int] = {
      val vp = new Array[Int](17)
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        vp(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
      vp
    }
    def decode(in: JpegBitReader): Int = {
      var code = in.nextBit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | in.nextBit()
        l += 1
      }
      if (l > 16) throw new JpegDataException("huffman code overrun")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private final class JpegDataException(msg: String) extends Exception(msg)

  /** Entropy-segment bit reader: undoes 0xFF00 byte stuffing, stops at
    * any real marker, and resynchronizes across RSTn restarts.
    */
  private final class JpegBitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var have = 0
    def nextBit(): Int = {
      if (have == 0) {
        if (pos >= b.length) throw new JpegDataException("EOF in entropy data")
        val byte = b(pos) & 0xFF
        if (byte == 0xFF) {
          val nxt = if (pos + 1 < b.length) b(pos + 1) & 0xFF else -1
          if (nxt != 0x00) throw new JpegDataException(f"marker FF$nxt%02x in scan")
          pos += 2
        } else pos += 1
        cur = byte
        have = 8
      }
      have -= 1
      (cur >> have) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Consume an expected RSTn marker (byte-aligned). */
    def restart(): Unit = {
      have = 0
      while (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF &&
        (b(pos + 1) & 0xFF) == 0xFF) pos += 1 // fill bytes
      if (pos + 1 >= b.length || (b(pos) & 0xFF) != 0xFF ||
        ((b(pos + 1) & 0xFF) & 0xF8) != 0xD0)
        throw new JpegDataException("expected RSTn")
      pos += 2
    }
  }

  private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** 8×8 dequantized-coefficient block → spatial samples (level-shifted,
    * clamped 0..255) via two separable 1-D passes.
    */
  private def jpegIdct(coef: Array[Double], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows: frequency u → spatial x
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += JpegCos(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += JpegCos(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        val px = math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  private def jpegIsBaseline(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8

  /** Decode a BASELINE sequential JPEG to (width, height, nComponents,
    * row-major samples) — the gray value for 1-component files, the RED
    * channel after YCbCr→RGB for 3-component (the [[decodeValues]]
    * contract). Chroma planes upsample by box replication. None for
    * progressive/arithmetic/malformed input — callers fall back to
    * ImageIO there, so this never REDUCES coverage.
    */
  def decodeJpegBaseline(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (!jpegIsBaseline(b)) return None
    try {
      val quant = Array.ofDim[Int](4, 64)
      val dcTables = new Array[JpegHuffDecoder](4)
      val acTables = new Array[JpegHuffDecoder](4)
      var width = 0
      var height = 0
      var nComp = 0
      // per component: id, h, v, tq (from SOF), td, ta (from SOS)
      var compH: Array[Int] = null
      var compV: Array[Int] = null
      var compTq: Array[Int] = null
      var compTd: Array[Int] = null
      var compTa: Array[Int] = null
      var restartInterval = 0
      var pos = 2
      var scanStart = -1
      while (scanStart < 0) {
        while (pos < b.length && (b(pos) & 0xFF) != 0xFF) pos += 1
        while (pos < b.length && (b(pos) & 0xFF) == 0xFF &&
          pos + 1 < b.length && (b(pos + 1) & 0xFF) == 0xFF) pos += 1
        if (pos + 3 >= b.length) return None
        val marker = b(pos + 1) & 0xFF
        val segLen = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
        val segEnd = pos + 2 + segLen
        if (segEnd > b.length) return None
        marker match {
          case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
            if ((b(pos + 4) & 0xFF) != 8) return None // precision
            height = ((b(pos + 5) & 0xFF) << 8) | (b(pos + 6) & 0xFF)
            width = ((b(pos + 7) & 0xFF) << 8) | (b(pos + 8) & 0xFF)
            nComp = b(pos + 9) & 0xFF
            if (width == 0 || height == 0 ||
              (nComp != 1 && nComp != 3)) return None
            compH = new Array[Int](nComp)
            compV = new Array[Int](nComp)
            compTq = new Array[Int](nComp)
            var i = 0
            while (i < nComp) {
              val hv = b(pos + 11 + 3 * i) & 0xFF
              compH(i) = hv >> 4
              compV(i) = hv & 0xF
              compTq(i) = b(pos + 12 + 3 * i) & 0xFF
              if (compH(i) < 1 || compH(i) > 4 || compV(i) < 1 ||
                compV(i) > 4 || compTq(i) > 3) return None
              i += 1
            }
            pos = segEnd
          case m if m >= 0xC2 && m <= 0xCF && m != 0xC4 && m != 0xC8 =>
            return None // progressive/lossless/arithmetic: not baseline
          case 0xDB => // DQT (one or more tables per segment)
            var p = pos + 4
            while (p < segEnd) {
              val pq = (b(p) & 0xFF) >> 4
              val tq = b(p) & 0xF
              if (tq > 3) return None
              p += 1
              var i = 0
              while (i < 64) {
                val v =
                  if (pq == 0) { val r = b(p) & 0xFF; p += 1; r }
                  else { val r = ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF); p += 2; r }
                quant(tq)(JpegZigzag(i)) = v
                i += 1
              }
            }
            pos = segEnd
          case 0xC4 => // DHT (one or more tables per segment)
            var p = pos + 4
            while (p < segEnd) {
              val tc = (b(p) & 0xFF) >> 4
              val th = b(p) & 0xF
              if (tc > 1 || th > 3) return None
              val bl = Array.tabulate(16)(i => b(p + 1 + i) & 0xFF)
              val total = bl.sum
              if (p + 17 + total > segEnd) return None
              val vals = Array.tabulate(total)(i => b(p + 17 + i) & 0xFF)
              val tbl = new JpegHuffDecoder(bl, vals)
              if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
              p += 17 + total
            }
            pos = segEnd
          case 0xDD => // DRI
            restartInterval = ((b(pos + 4) & 0xFF) << 8) | (b(pos + 5) & 0xFF)
            pos = segEnd
          case 0xDA => // SOS
            if (nComp == 0) return None
            val ns = b(pos + 4) & 0xFF
            if (ns != nComp) return None // single interleaved scan only
            compTd = new Array[Int](nComp)
            compTa = new Array[Int](nComp)
            var i = 0
            while (i < ns) {
              // match scan component id → frame position (ids are 1-based
              // by convention but not by spec; match on order here since
              // baseline single-scan files list them in frame order)
              compTd(i) = (b(pos + 6 + 2 * i) & 0xFF) >> 4
              compTa(i) = b(pos + 6 + 2 * i) & 0xF
              i += 1
            }
            scanStart = segEnd // Ss/Se/AhAl skipped (fixed in baseline)
          case 0xD9 => return None // EOI before SOS
          case _ => pos = segEnd // APPn / COM / DNL / ...
        }
      }
      // T.81 A.2.2: a single-component scan is NON-interleaved — the MCU
      // is one data unit and the declared sampling factors do not
      // subdivide it (some encoders write h=v=2 on grayscale files)
      if (nComp == 1) { compH(0) = 1; compV(0) = 1 }
      val hMax = compH.max
      val vMax = compV.max
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      // per-component planes at full MCU-padded resolution
      val planeW = Array.tabulate(nComp)(i => mcusX * compH(i) * 8)
      val planeH = Array.tabulate(nComp)(i => mcusY * compV(i) * 8)
      if (planeW.zip(planeH).exists { case (w, h) => w.toLong * h > (1L << 28) })
        return None
      val planes = Array.tabulate(nComp)(i => new Array[Int](planeW(i) * planeH(i)))
      val in = new JpegBitReader(b, scanStart)
      val pred = new Array[Int](nComp)
      val coef = new Array[Double](64)
      val block = new Array[Int](64)
      var mcu = 0
      val totalMcus = mcusX * mcusY
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          in.restart()
          java.util.Arrays.fill(pred, 0)
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < nComp) {
          val dc = dcTables(compTd(ci))
          val ac = acTables(compTa(ci))
          val qt = quant(compTq(ci))
          if (dc == null || ac == null) throw new JpegDataException("missing DHT")
          var by = 0
          while (by < compV(ci)) {
            var bx = 0
            while (bx < compH(ci)) {
              java.util.Arrays.fill(coef, 0.0)
              val t = dc.decode(in)
              if (t > 15) throw new JpegDataException("bad DC category")
              pred(ci) += jpegExtend(in.receive(t), t)
              coef(0) = pred(ci).toDouble * qt(0)
              var k = 1
              var eob = false
              var anyAc = false
              while (k < 64 && !eob) {
                val rs = ac.decode(in)
                val r = rs >> 4
                val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 else eob = true
                } else {
                  k += r
                  if (k > 63) throw new JpegDataException("AC index overrun")
                  val nat = JpegZigzag(k)
                  coef(nat) = jpegExtend(in.receive(s), s).toDouble * qt(nat)
                  anyAc = true
                  k += 1
                }
              }
              if (!anyAc) {
                // DC-only block = flat: the IDCT's closed form is
                // DC/8 + level shift in every cell — skip both passes
                val px0v = math.round(coef(0) / 8.0).toInt + 128
                val pxv = if (px0v < 0) 0 else if (px0v > 255) 255 else px0v
                java.util.Arrays.fill(block, pxv)
              } else jpegIdct(coef, block)
              val px0 = (mx * compH(ci) + bx) * 8
              val py0 = (my * compV(ci) + by) * 8
              val pw = planeW(ci)
              val plane = planes(ci)
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  plane((py0 + yy) * pw + px0 + xx) = block(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      val out = new Array[Int](width * height)
      if (nComp == 1) {
        val pw = planeW(0)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            out(y * width + x) = planes(0)(y * pw + x)
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val yy = planes(0)((y * compV(0) / vMax) * planeW(0) + x * compH(0) / hMax)
            val cr = planes(2)((y * compV(2) / vMax) * planeW(2) + x * compH(2) / hMax)
            val r = math.round(yy + 1.402 * (cr - 128)).toInt
            out(y * width + x) = if (r < 0) 0 else if (r > 255) 255 else r
            x += 1
          }
          y += 1
        }
      }
      Some((width, height, nComp, out))
    } catch {
      case _: JpegDataException | _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Header-only baseline parse (dimensions + component count) for
    * [[decode]] — same marker walk, no entropy decode.
    */
  private def decodeJpegHeader(b: Array[Byte]): Option[MediaMeta] = {
    if (!jpegIsBaseline(b)) return None
    var pos = 2
    while (pos + 3 < b.length) {
      while (pos < b.length && (b(pos) & 0xFF) != 0xFF) pos += 1
      while (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF &&
        (b(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 3 >= b.length) return None
      val marker = b(pos + 1) & 0xFF
      if (marker == 0xC0 || marker == 0xC1) {
        if (pos + 9 >= b.length || (b(pos + 4) & 0xFF) != 8) return None
        val h = ((b(pos + 5) & 0xFF) << 8) | (b(pos + 6) & 0xFF)
        val w = ((b(pos + 7) & 0xFF) << 8) | (b(pos + 8) & 0xFF)
        val nc = b(pos + 9) & 0xFF
        if (w == 0 || h == 0 || (nc != 1 && nc != 3)) return None
        return Some(MediaMeta("jpeg", Some(w), Some(h), nc, 8, None, None, None))
      }
      if (marker == 0xDA || marker == 0xD9 ||
        (marker >= 0xC2 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8))
        return None // hit scan/EOI/non-baseline SOF without a usable SOF
      val segLen = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
      if (segLen < 2) return None
      pos += 2 + segLen
    }
    None
  }

  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0
          nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s per T.81
      put(0x7F, 8 - nBits)
    }
  }

  /** Canonical (code, length) per symbol from a BITS/HUFFVAL spec. */
  private def jpegEncTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        table(vals(k)) = (code, l)
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    table
  }

  /** Encode a GRAYSCALE baseline JPEG at the given libjpeg-style quality
    * (1–100): Annex K luminance table scaled by the libjpeg formula,
    * standard Annex K Huffman tables, double FDCT, round-to-nearest
    * quantization, edge blocks padded by clamp-replication. `px(x, y)`
    * returns the 0–255 gray sample. The twin synthesizer re-encodes one
    * pixel plane at several qualities through this — byte-distinct
    * files (different tables AND different entropy data) that only a
    * decoded-pixel hash can match.
    */
  def encodeJpegGray(width: Int, height: Int, quality: Int,
      px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF)
    val qt = jpegScaledQuant(quality)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16be(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16be(0xFFD8) // SOI
    u16be(0xFFDB); u16be(2 + 1 + 64); u8(0) // DQT: pq=0, tq=0
    var i = 0
    while (i < 64) { u8(qt(JpegZigzag(i))); i += 1 }
    u16be(0xFFC0); u16be(8 + 3) // SOF0, 1 component
    u8(8); u16be(height); u16be(width); u8(1)
    u8(1); u8(0x11); u8(0) // id 1, 1×1 sampling, table 0
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      u16be(0xFFC4); u16be(2 + 1 + 16 + vals.length); u8(tc << 4)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, JpegDcLumBits, JpegDcLumVals)
    dht(1, JpegAcLumBits, JpegAcLumVals)
    u16be(0xFFDA); u16be(6 + 2) // SOS
    u8(1); u8(1); u8(0x00) // 1 component, id 1, DC 0 / AC 0
    u8(0); u8(63); u8(0) // Ss, Se, AhAl
    val dcTab = jpegEncTable(JpegDcLumBits, JpegDcLumVals)
    val acTab = jpegEncTable(JpegAcLumBits, JpegAcLumVals)
    val bw = new JpegBitWriter(out)
    def magnitude(v: Int): Int = { // bit category of |v|
      var m = math.abs(v)
      var s = 0
      while (m != 0) { m >>= 1; s += 1 }
      s
    }
    def putVal(v: Int, s: Int): Unit =
      if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val spatial = new Array[Double](64)
    val freq = new Array[Int](64)
    var pred = 0
    var byi = 0
    while (byi < blocksY) {
      var bxi = 0
      while (bxi < blocksX) {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sx = math.min(width - 1, bxi * 8 + x)
            val sy = math.min(height - 1, byi * 8 + y)
            spatial(y * 8 + x) = (px(sx, sy) & 0xFF) - 128.0
            x += 1
          }
          y += 1
        }
        // CONSTANT blocks short-circuit the transform: a flat 8×8 has
        // DC = 8·value and every AC exactly 0 (the closed form of the
        // separable FDCT), so the two O(8³) passes buy nothing — flat
        // regions dominate synthetic fixtures AND real-world graphics
        var flat = true
        var fk = 1
        while (fk < 64 && flat) {
          if (spatial(fk) != spatial(0)) flat = false
          fk += 1
        }
        if (flat) {
          java.util.Arrays.fill(freq, 0)
          freq(0) = math.round(spatial(0) * 8.0 / qt(0)).toInt
        } else {
          // separable FDCT, then round-to-nearest quantization
          val tmp = new Array[Double](64)
          var v = 0
          while (v < 8) { // columns first: spatial y → frequency v
            var x = 0
            while (x < 8) {
              var s = 0.0
              var y2 = 0
              while (y2 < 8) { s += JpegCos(v)(y2) * spatial(y2 * 8 + x); y2 += 1 }
              tmp(v * 8 + x) = s
              x += 1
            }
            v += 1
          }
          var vv = 0
          while (vv < 8) {
            var u = 0
            while (u < 8) {
              var s = 0.0
              var x2 = 0
              while (x2 < 8) { s += JpegCos(u)(x2) * tmp(vv * 8 + x2); x2 += 1 }
              val d = s / 4.0
              freq(vv * 8 + u) = math.round(d / qt(vv * 8 + u)).toInt
              u += 1
            }
            vv += 1
          }
        }
        val dcDiff = freq(0) - pred
        pred = freq(0)
        val sDc = magnitude(dcDiff)
        val (cDc, lDc) = dcTab(sDc)
        bw.put(cDc, lDc)
        putVal(dcDiff, sDc)
        var k = 1
        var run = 0
        while (k < 64) {
          val coefV = freq(JpegZigzag(k))
          if (coefV == 0) run += 1
          else {
            while (run >= 16) { val (c, l) = acTab(0xF0); bw.put(c, l); run -= 16 }
            val sAc = magnitude(coefV)
            val (c, l) = acTab((run << 4) | sAc)
            bw.put(c, l)
            putVal(coefV, sAc)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = acTab(0x00); bw.put(c, l) } // EOB
        bxi += 1
      }
      byi += 1
    }
    bw.flush()
    u16be(0xFFD9) // EOI
    out.toByteArray
  }

  /** Parse every quantization table in a JPEG's DQT segments, natural
    * order, indexed by table id — header walk only, no entropy decode.
    */
  def jpegQuantTables(b: Array[Byte]): Option[Map[Int, Array[Int]]] = {
    if (!jpegIsBaseline(b)) return None
    val tables = scala.collection.mutable.Map.empty[Int, Array[Int]]
    var pos = 2
    var done = false
    while (!done && pos + 3 < b.length) {
      while (pos < b.length && (b(pos) & 0xFF) != 0xFF) pos += 1
      while (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF &&
        (b(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 3 >= b.length) done = true
      else {
        val marker = b(pos + 1) & 0xFF
        if (marker == 0xDA || marker == 0xD9) done = true // scan/EOI
        else {
          val segLen = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
          val segEnd = pos + 2 + segLen
          if (segLen < 2 || segEnd > b.length) return None
          if (marker == 0xDB) {
            var p = pos + 4
            while (p < segEnd) {
              val pq = (b(p) & 0xFF) >> 4
              val tq = b(p) & 0xF
              p += 1
              // a DQT whose declared segment length understates the
              // 65/129-byte table payload is malformed: reading on would
              // either throw (segEnd == b.length) or silently parse the
              // NEXT segment's bytes as quant values — reject, same
              // contract as a truncated file (None, never an exception)
              if (pq > 1 || p + (if (pq == 0) 64 else 128) > segEnd)
                return None
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                t(JpegZigzag(i)) =
                  if (pq == 0) { val r = b(p) & 0xFF; p += 1; r }
                  else { val r = ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF); p += 2; r }
                i += 1
              }
              tables(tq) = t
            }
          }
          pos = segEnd
        }
      }
    }
    if (tables.isEmpty) None else Some(tables.toMap)
  }

  /** Estimate the ENCODER QUALITY of a JPEG from its luminance
    * quantization table — the standard crawl-curation signal (a q=30
    * re-encode of a q=90 original is low-value training data however
    * large the file). Exact-match first: if some q ∈ [1, 100] scales the
    * Annex K luminance base to EXACTLY the parsed table (the libjpeg
    * formula — most encoders), that q is returned; otherwise the q with
    * minimal L1 distance (re-quantized or non-standard tables). Header
    * walk only — no pixel decode. None for non-JPEG or DQT-less input.
    */
  def jpegQualityEstimate(b: Array[Byte]): Option[Int] =
    jpegQuantTables(b).flatMap(_.get(0)).map { tbl =>
      var bestQ = 1
      var bestDist = Long.MaxValue
      var q = 1
      while (q <= 100 && bestDist != 0L) {
        val cand = jpegScaledQuant(q)
        var d = 0L
        var i = 0
        while (i < 64) { d += math.abs(cand(i) - tbl(i)).toLong; i += 1 }
        if (d < bestDist) { bestDist = d; bestQ = q }
        q += 1
      }
      bestQ
    }

  /** 16-bit cell patterns whose 4×4 integer-DCT AC coefficients all
    * carry ≥ `margin` absolute magnitude when rendered as 16/240 cell
    * means — i.e. patterns whose pHash sign bits CANNOT flip under
    * JPEG quantization noise (block-aligned constant cells keep decode
    * error ≤ ~2 levels ⇒ |δd| ≤ 16·1e8·2 ≈ 3.2e9 < the 4e9 margin).
    * All-dark (0) and all-light (0xFFFF) are excluded so aHash stays
    * injective (both degenerate to the same all-ones hash). Scanned
    * once per JVM; the twin synthesizer indexes into this list.
    */
  private[graft] lazy val PhashSafePatterns: Array[Int] = {
    val margin = 4000000000L
    val means = new Array[Long](16)
    (1 until 0xFFFF).filter { p =>
      var c = 0
      while (c < 16) {
        means(c) = if ((p & (1 << c)) != 0) 240L else 16L
        c += 1
      }
      var safe = true
      var u = 0
      while (u < 4 && safe) {
        var v = 0
        while (v < 4 && safe) {
          if (u != 0 || v != 0) {
            var d = 0L
            var r = 0
            while (r < 4) {
              var cc = 0
              while (cc < 4) {
                d += Multimodal.DctBasis(u)(r) * means(r * 4 + cc) *
                  Multimodal.DctBasis(v)(cc)
                cc += 1
              }
              r += 1
            }
            if (math.abs(d) < margin) safe = false
          }
          v += 1
        }
        u += 1
      }
      safe
    }.toArray
  }

  /** Re-ENCODE twins for the perceptual near-dup oracle: three JPEG
    * encodings per content family — `contentId = id / 3`, variant
    * `id % 3` → quality {90, 75, 40} — of ONE pixel plane. Unlike the
    * [[synthesizeCompressedTwin]] retag/remux variants, these files
    * share NO payload bytes (different quant tables, different entropy
    * data); only decoding to pixels can match them. Geometry is id
    * arithmetic (`a = contentId % 256`: w = 32·(1 + a%16),
    * h = 32·(1 + a/16)); content is a 4×4 plane of 16/240 constant
    * cells, each cell a whole number of 8×8 JPEG blocks (so every
    * block is constant ⇒ decode error ≤ DC quant error ⇒ the
    * perceptual hashes are provably quality-invariant), with the cell
    * pattern drawn injectively from [[PhashSafePatterns]]
    * (contentId / 256 indexes it; distinct families ⇒ distinct
    * consensus keys for contentId < 256 · |safe patterns| ≈ 2 M+
    * families ≈ 6 M+ doc ids — past even the sf10 probe corpus).
    */
  def synthesizeJpegTwin(id: Long): Array[Byte] = {
    val contentId = id / 3
    val quality = (id % 3).toInt match {
      case 0 => 90
      case 1 => 75
      case _ => 40
    }
    val a = (contentId % 256).toInt
    val w = 32 * (1 + a % 16)
    val h = 32 * (1 + a / 16)
    val pattern = PhashSafePatterns(
      ((contentId / 256) % PhashSafePatterns.length).toInt)
    encodeJpegGray(w, h, quality, (x, y) => {
      val cell = (y * 4 / h) * 4 + (x * 4 / w)
      if ((pattern & (1 << cell)) != 0) 240 else 16
    })
  }

  // ---------- dispatch ----------

  /** Sniff the container magic and parse the header. Raw self-contained
    * formats (BMP/netpbm/WAV) decode via the byte-level parsers; PNG/
    * JPEG/GIF via the JDK's pure-Java ImageIO readers; MP3 / MP4 via the
    * frame-header walk / ISO-BMFF box walk (header metadata only — the
    * codec payload is never interpreted). Returns None for anything
    * unrecognized (truncated files, garbage) so callers can fall back to
    * the declared stub.
    */
  def decode(bytes: Array[Byte]): Option[MediaMeta] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) >= '1' &&
      bytes(1) <= '7') decodePnm(bytes)
    else if (bytes.length >= 12 && tag(bytes, 0, "RIFF")) decodeWav(bytes)
    else if (bytes.length >= 12 && tag(bytes, 4, "ftyp")) decodeMp4(bytes)
    else if (bytes.length >= 10 && tag(bytes, 0, "ID3")) decodeMp3(bytes)
    else if (mp3Sync(bytes, 0)) decodeMp3(bytes)
    // baseline JPEG: pure header walk (no entropy decode, no ImageIO);
    // progressive/exotic JPEG and PNG/GIF go through the ImageIO readers
    else decodeJpegHeader(bytes).orElse(decodeImageIo(bytes))

  // ---------- deterministic synthesis (for the td39 oracle + specs) ----------

  /** Synthesize a real media file from an id. Format and every header
    * parameter are pure integer functions of the id, so a SQL oracle can
    * compute the expected decode output without parsing bytes:
    *   - id % 3 == 0 → BMP:  w = 1 + id % 31,  h = 1 + (id / 31) % 23
    *   - id % 3 == 1 → PPM:  w = 1 + id % 17,  h = 1 + (id / 17) % 13
    *   - id % 3 == 2 → WAV:  rate ∈ {8000, 16000, 22050, 44100} by id % 4,
    *                         channels = 1 + id % 2, frames = 100 + id % 400
    */
  def synthesizeAsset(id: Long): (String, Array[Byte]) = (id % 3).toInt match {
    case 0 =>
      val w = (1 + id % 31).toInt
      val h = (1 + (id / 31) % 23).toInt
      ("bmp", encodeBmp(w, h, (x, y) => (((id + x + y) % 256).toInt * 0x010101) & 0xFFFFFF))
    case 1 =>
      val w = (1 + id % 17).toInt
      val h = (1 + (id / 17) % 13).toInt
      ("ppm", encodePpm(w, h, 255, (x, y) => (((id + 3 * x + 7 * y) % 256).toInt * 0x010101) & 0xFFFFFF))
    case _ =>
      val rates = Array(8000, 16000, 22050, 44100)
      val rate = rates((id % 4).toInt)
      val ch = (1 + id % 2).toInt
      val frames = (100 + id % 400).toInt
      val samples = Array.tabulate[Short](frames * ch)(i => ((id * 31 + i * 17) % 65536 - 32768).toShort)
      ("wav", encodeWav(rate, ch, samples))
  }

  /** Compressed-container twin of [[synthesizeAsset]] (the td105
    * oracle): every header parameter is integer arithmetic over the id.
    *   - id % 2 == 0 → MP3: bitrate ∈ {64, 96, 128, 192} by (id/2) % 4,
    *     rate ∈ {32000, 44100, 48000} by (id/2) % 3 (all MPEG1),
    *     mono iff (id/2) % 2 == 0, frames = 20 + id % 30, and every 5th
    *     asset carries an ID3v2 tag of 40 + id % 60 payload bytes;
    *   - id % 2 == 1 → MP4: timescale ∈ {600, 1000, 12288, 90000} by
    *     (id/2) % 4, duration = 1000 + id % 9000 units,
    *     video w = 16·(1 + id % 40), h = 16·(1 + (id/40) % 30),
    *     audio tracks = (id/2) % 2.
    */
  // splitmix64 finalizer — full-entropy payload bytes for the twin
  // synthesizer (plain linear formulas collide across content ids mod
  // 256, silently merging distinct families)
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Near-dup twins for the content-fingerprint oracle: three byte-level
    * VARIANTS per content family — `contentId = id / 3`, variant
    * `id % 3` — that share the exact codec payload but differ in
    * metadata/layout, the way re-tagged and re-muxed copies of one
    * recording differ in a crawl:
    *   - family format: mp3 iff contentId even;
    *   - MP3 variants: v0 bare, v1 small ID3v2 tag, v2 large ID3v2 tag
    *     (frame payloads identical — VBR pattern and all);
    *   - MP4 variants: samplesPerChunk = v + 1 (different stsc/stco
    *     layout) and v2 adds a `free` box (every chunk offset moves) —
    *     same sample bytes in the same order.
    * Byte-identical only within a variant; content-fingerprint-identical
    * across a family; distinct across families (mix64 payloads).
    */
  def synthesizeCompressedTwin(id: Long): (String, Array[Byte]) = {
    val contentId = id / 3
    val v = (id % 3).toInt
    if (contentId % 2 == 0) {
      val k = contentId / 2
      val rates = Array(32000, 44100, 48000)
      val brs = Array(64, 96, 128, 192)
      val nf = (6 + contentId % 8).toInt
      val bitrates = Array.tabulate(nf)(f => brs(((k + f) % 4).toInt))
      val id3 = v match {
        case 0 => 0
        case 1 => (24 + contentId % 32).toInt
        case _ => (64 + contentId % 48).toInt
      }
      ("mp3", encodeMp3Frames(rates((k % 3).toInt), mono = k % 2 == 0,
        bitrates,
        (f, i) => (mix64(contentId * 0x10001L + f * 0x101L + i) & 0xFF).toByte,
        id3Bytes = id3))
    } else {
      val k = contentId / 2
      val scales = Array(600, 1000, 12288, 90000)
      val ns = (4 + contentId % 6).toInt
      val samples = (0 until ns).map(i =>
        Array.tabulate((20 + (contentId + 3 * i) % 40).toInt)(j =>
          (mix64(contentId * 0x20003L + i * 0x211L + j) & 0xFF).toByte))
      ("mp4", encodeMp4Media(scales((k % 4).toInt),
        500 + contentId % 5000,
        width = (16 * (1 + contentId % 40)).toInt,
        height = (16 * (1 + (contentId / 40) % 30)).toInt,
        samples = samples, samplesPerChunk = v + 1,
        freeBytes = if (v == 2) (32 + contentId % 32).toInt else 0))
    }
  }

  def synthesizeCompressedAsset(id: Long): (String, Array[Byte]) =
    if (id % 2 == 0) {
      val bitrates = Array(64, 96, 128, 192)
      val rates = Array(32000, 44100, 48000)
      val k = id / 2
      ("mp3", encodeMp3(bitrates((k % 4).toInt), rates((k % 3).toInt),
        mono = k % 2 == 0, frames = (20 + id % 30).toInt,
        id3Bytes = if (id % 5 == 0) (40 + id % 60).toInt else 0))
    } else {
      val scales = Array(600, 1000, 12288, 90000)
      val k = id / 2
      ("mp4", encodeMp4(scales((k % 4).toInt), 1000 + id % 9000,
        width = 16 * (1 + id % 40).toInt, height = 16 * (1 + (id / 40) % 30).toInt,
        audioTracks = (k % 2).toInt))
    }
}
