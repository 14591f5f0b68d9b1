package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic media blobs (spec-valid PNG / JPEG / GIF /
  * WAV / BMP / PPM / MP4 containers with known content) for exercising
  * the REAL parsers in [[graft.functions.Multimodal]]. The pixel/sample
  * fixtures (PNG with genuine deflated+filtered IDAT, JPEG from the
  * JDK's own independent encoder, GIF with genuine LZW, BMP, PPM, PCM
  * WAV) carry deterministic patterns whose expected stats are computed
  * from the raw values BEFORE encoding, so decoders are checked through
  * the full byte pipeline (JPEG within a small lossy-compression
  * tolerance — bit-exact truth does not exist for a lossy codec); the
  * header-only fixtures (scan-less JPEG, MP4) have every field a parser
  * reads spec-conformant.
  */
object MediaSynth {

  final case class MediaDoc(url: String, html: Array[Byte],
                            exp_kind: String, exp_w: Int, exp_h: Int,
                            exp_rate: Int, exp_ch: Int,
                            exp_frames: Long, exp_mean_x1000: Long,
                            exp_peak: Int, exp_decoded: Boolean)

  private def crc32(bs: Array[Byte]*): Array[Byte] = {
    val c = new java.util.zip.CRC32()
    bs.foreach(c.update)
    val v = c.getValue
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  }

  private def be32(v: Int) =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)

  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdrType = "IHDR".getBytes
    val ihdrData = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    val iendType = "IEND".getBytes
    sig ++ be32(13) ++ ihdrType ++ ihdrData ++ crc32(ihdrType, ihdrData) ++
      be32(0) ++ iendType ++ crc32(iendType)
  }

  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xFF, 0xD8).map(_.toByte)
    val app0 = Array(0xFF, 0xE0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++
      Array[Byte](0, 0)
    // SOF0 baseline, one component: len 11 = 2+1+2+2+1+3
    val sof0 = Array(0xFF, 0xC0).map(_.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 1, 0x11, 0)
    // SOS (len 8 = 2+1+2+3): strict readers (the JDK's) refuse a frame
    // header with no scan; the entropy data itself is empty
    val sos = Array(0xFF, 0xDA).map(_.toByte) ++ be16(8) ++
      Array[Byte](1, 1, 0, 0, 63, 0)
    val eoi = Array(0xFF, 0xD9).map(_.toByte)
    soi ++ app0 ++ sof0 ++ sos ++ eoi
  }

  def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ le16(w) ++ le16(h) ++
      Array[Byte](0, 0, 0, 0x3B)

  /** Smooth (low-frequency) pattern for the REAL-pixel JPEG fixtures:
    * lossy DCT compression reconstructs smooth gradients almost exactly,
    * so the pre-encoding truth stays a tight bound (q33 uses a small
    * tolerance — JPEG has no bit-exact truth by design).
    */
  def smoothRgbAt(x: Int, y: Int, w: Int, h: Int): (Int, Int, Int) = (
    x * 255 / math.max(w - 1, 1),
    y * 255 / math.max(h - 1, 1),
    (x + y) * 255 / math.max(w + h - 2, 1))

  /** Expected (pixels, meanLumaX1000, peakLuma) of the [[smoothRgbAt]]
    * pattern (gray = its Rec.709 luma), computed BEFORE encoding.
    */
  def jpegTruth(w: Int, h: Int): (Long, Long, Int) = {
    var sum = 0L
    var peak = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = smoothRgbAt(x, y, w, h)
        val l = (2126 * r + 7152 * g + 722 * b) / 10000
        sum += l
        if (l > peak) peak = l
        x += 1
      }
      y += 1
    }
    val pix = w.toLong * h
    (pix, (sum * 1000 + pix / 2) / pix, peak)
  }

  /** GENUINE baseline JPEG bytes (the JDK's ImageIO encoder at quality
    * 0.95) carrying the [[smoothRgbAt]] pattern — gray renders its
    * Rec.709 luma into a single-component stream, color a three-component
    * YCbCr stream (the encoder picks the subsampling). The decoder under
    * test sees real entropy-coded data from a real independent encoder.
    */
  def jpegPixelBytes(w: Int, h: Int, gray: Boolean): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h,
      if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = smoothRgbAt(x, y, w, h)
      if (gray) {
        val l = (2126 * r + 7152 * g + 722 * b) / 10000
        img.getRaster.setSample(x, y, 0, l)
      } else img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Deterministic 8-bit grayscale pattern for the gray-PNG fixtures. */
  private def grayAt(x: Int, y: Int): Int = (x * 11 + y * 17) % 256

  /** Expected (pixels, meanLumaX1000, peakLuma) of the [[grayAt]] pattern
    * (gray luma IS the sample value).
    */
  def grayTruth(w: Int, h: Int): (Long, Long, Int) = {
    var sum = 0L
    var peak = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = grayAt(x, y)
        sum += l
        if (l > peak) peak = l
        x += 1
      }
      y += 1
    }
    val pix = w.toLong * h
    (pix, (sum * 1000 + pix / 2) / pix, peak)
  }

  /** Spec-valid PNG with a REAL zlib-compressed IDAT carrying the
    * [[rgbAt]] (color types 2/6) or [[grayAt]] (color types 0/4) pattern.
    * Each scanline uses filter type `y % 5`, so a decoder must implement
    * all five PNG filters (None/Sub/Up/Average/Paeth) correctly to
    * recover the pixels; the IDAT is split into two chunks to exercise
    * multi-IDAT streams. The expected luma stats come from the raw
    * pattern values BEFORE filtering/compression, so the decoder is
    * checked through the full byte pipeline, not against itself.
    */
  def pngPixelBytes(w: Int, h: Int, colorType: Int): Array[Byte] =
    pngEncode(w, h, colorType, (x, y, cur, base) =>
      colorType match {
        case 0 => cur(base) = grayAt(x, y).toByte
        case 4 =>
          cur(base) = grayAt(x, y).toByte
          cur(base + 1) = ((x + 3 * y) % 256).toByte // alpha (ignored in stats)
        case _ =>
          val (r, g, b) = rgbAt(x, y)
          cur(base) = r.toByte; cur(base + 1) = g.toByte; cur(base + 2) = b.toByte
          if (colorType == 6) cur(base + 3) = ((x + 3 * y) % 256).toByte
      })

  /** The shared PNG encode path (filter rotation + deflate + split IDAT);
    * `fillPixel(x, y, buf, base)` writes one pixel's `bpp` bytes.
    */
  private def pngEncode(w: Int, h: Int, colorType: Int,
      fillPixel: (Int, Int, Array[Byte], Int) => Unit): Array[Byte] = {
    val bpp = colorType match {
      case 0 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => throw new IllegalArgumentException(s"colorType $colorType")
    }
    val rowLen = 1 + w * bpp
    val raw = new Array[Byte](rowLen * h) // filtered scanlines, concatenated
    val cur = new Array[Byte](w * bpp)    // unfiltered pixel bytes, this row
    val prv = new Array[Byte](w * bpp)
    for (y <- 0 until h) {
      for (x <- 0 until w) fillPixel(x, y, cur, x * bpp)
      val ft = y % 5
      raw(y * rowLen) = ft.toByte
      for (i <- 0 until w * bpp) {
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0 // left (decoded)
        val up = prv(i) & 0xff
        val c = if (i >= bpp) prv(i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) >> 1
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        raw(y * rowLen + 1 + i) = ((cur(i) & 0xff) - pred).toByte
      }
      cur.copyToArray(prv)
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    var zLen = 0
    while (!deflater.finished()) zLen += deflater.deflate(buf, zLen, buf.length - zLen)
    deflater.end()
    val z = java.util.Arrays.copyOf(buf, zLen)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes
      be32(data.length) ++ t ++ data ++ crc32(t, data)
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    val split = z.length / 2 // two IDAT chunks (spec: concatenated stream)
    sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", z.take(split)) ++ chunk("IDAT", z.drop(split)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Palette entry i of the GIF fixtures' 256-color global color table. */
  private def paletteAt(i: Int): (Int, Int, Int) =
    (i, (i * 3) % 256, (i * 7) % 256)

  /** Pixel index pattern of the GIF fixtures. */
  private def idxAt(x: Int, y: Int): Int = (x * 7 + y * 13) % 256

  /** Expected (pixels, meanLumaX1000, peakLuma) of [[idxAt]] mapped
    * through [[paletteAt]].
    */
  def gifTruth(w: Int, h: Int): (Long, Long, Int) = {
    var sum = 0L
    var peak = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = paletteAt(idxAt(x, y))
        val l = (2126 * r + 7152 * g + 722 * b) / 10000
        sum += l
        if (l > peak) peak = l
        x += 1
      }
      y += 1
    }
    val pix = w.toLong * h
    (pix, (sum * 1000 + pix / 2) / pix, peak)
  }

  /** GIF89a with a 256-entry global color table and a REAL LZW-compressed
    * image frame carrying the [[idxAt]] pattern — a genuine encoder
    * (growing dictionary, variable code width, clear-on-full), so the
    * decoder's dictionary growth, code-width transitions, and KwKwK path
    * all get exercised; truth comes from the raw index/palette values
    * before encoding.
    */
  def gifPixelBytes(w: Int, h: Int, interlaced: Boolean = false): Array[Byte] = {
    val minCode = 8
    val clear = 1 << minCode
    val eoi = clear + 1
    // LZW encode, LSB-first bit packing
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bits = 0
    var codeSize = minCode + 1
    @inline def put(code: Int): Unit = {
      bitBuf |= code.toLong << bits
      bits += codeSize
      while (bits >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bits -= 8 }
    }
    // dictionary: (prefixCode << 8 | byte) → code
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    put(clear)
    var prev = -1
    // interlaced storage writes rows in the four GIF passes (y ≡ 0 mod 8,
    // 4 mod 8, 2 mod 4, odd) — same pixels, permuted row order
    val rowOrder: Seq[Int] =
      if (!interlaced) 0 until h
      else (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++
        (1 until h by 2)
    for (y <- rowOrder) {
      var x = 0
      while (x < w) {
        val k = idxAt(x, y)
        if (prev < 0) prev = k
        else {
          val key = (prev << 8) | k
          val hit = dict.get(key)
          if (hit != null) prev = hit
          else {
            put(prev)
            if (nextCode < 4096) {
              dict.put(key, nextCode)
              nextCode += 1
              // width rule: the decoder adds each dictionary entry one
              // code BEHIND the encoder (it needs the next code's first
              // byte), so the encoder must widen one entry later than the
              // decoder's `== 1<<codeSize` rule — at `> 1<<codeSize` —
              // or the two sides read/write the boundary code at
              // different widths (the max value the encoder can emit next
              // is nextCode-1; the max the decoder can receive is its own
              // nextCode, which lags by exactly one)
              if (nextCode > (1 << codeSize) && codeSize < 12) codeSize += 1
            } else {
              put(clear) // dictionary full: reset
              codeSize = minCode + 1
              nextCode = eoi + 1
              dict = new java.util.HashMap[Integer, Integer]()
            }
            prev = k
          }
        }
        x += 1
      }
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (bits > 0) out.write((bitBuf & 0xff).toInt)
    val lzw = out.toByteArray
    // assemble: header + LSD + 256-color GCT + image descriptor + data
    // sub-blocks (≤255 bytes each) + trailer
    val bb = new java.io.ByteArrayOutputStream()
    bb.write("GIF89a".getBytes)
    bb.write(le16(w)); bb.write(le16(h))
    bb.write(0x80 | 7) // GCT present, 2^(7+1)=256 entries
    bb.write(0); bb.write(0)
    for (i <- 0 until 256) {
      val (r, g, b) = paletteAt(i)
      bb.write(r); bb.write(g); bb.write(b)
    }
    bb.write(0x2C) // image descriptor: full-frame at (0,0), no LCT
    bb.write(le16(0)); bb.write(le16(0)); bb.write(le16(w)); bb.write(le16(h))
    bb.write(if (interlaced) 0x40 else 0)
    bb.write(minCode)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      bb.write(len)
      bb.write(lzw, off, len)
      off += len
    }
    bb.write(0) // block terminator
    bb.write(0x3B)
    bb.toByteArray
  }

  /** Minimal spec-valid MP4/ISO-BMFF container: `ftyp` + `moov` holding a
    * v0 `mvhd` (timescale 1000 ⇒ duration field IS milliseconds) and one
    * `trak`/`tkhd` with 16.16 fixed-point width/height — every field
    * [[graft.functions.Multimodal.mp4Header]] reads is real, by
    * construction.
    */
  def mp4Bytes(w: Int, h: Int, durMs: Long): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ typ.getBytes ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isomiso2".getBytes)
    val mvhd = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ // version 0 + flags
        be32(0) ++ be32(0) ++    // creation, modification
        be32(1000) ++            // timescale: 1000 units/sec
        be32(durMs.toInt) ++     // duration
        be32(0x00010000) ++ be16(0x0100) ++ be16(0) ++ // rate, volume, reserved
        be32(0) ++ be32(0) ++    // reserved
        // identity matrix
        be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000) ++
        be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++ // pre_defined
        be32(2))                 // next track id
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ // version 0 + flags (enabled|in-movie|in-preview)
        be32(0) ++ be32(0) ++    // creation, modification
        be32(1) ++ be32(0) ++    // track id, reserved
        be32(durMs.toInt) ++     // duration (movie timescale)
        be32(0) ++ be32(0) ++    // reserved
        be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ // layer, altgroup, volume, reserved
        be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000) ++
        be32(w << 16) ++ be32(h << 16)) // 16.16 fixed-point dims
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  private def le32(v: Int) =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def riffWebp(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val chunk = fourcc.getBytes("ISO-8859-1") ++ le32(payload.length) ++
      payload ++ (if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    "RIFF".getBytes("ISO-8859-1") ++ le32(4 + chunk.length) ++
      "WEBP".getBytes("ISO-8859-1") ++ chunk
  }

  /** WEBP, lossy VP8 flavor: RIFF/WEBP container whose VP8 chunk carries a
    * real frame-tag prologue (start code 9D 01 2A + 14-bit LE dims); the
    * entropy-coded stream body is deterministic junk — header-only
    * fixture, the [[mp4Bytes]]/[[jpegBytes]] contract.
    */
  def webpBytes(w: Int, h: Int): Array[Byte] =
    riffWebp("VP8 ", Array[Byte](0x10, 0, 0, 0x9D.toByte, 0x01, 0x2A) ++
      le16ArrLe(w) ++ le16ArrLe(h) ++
      Array.tabulate(11)(j => ((j * 37 + 5) & 0xff).toByte))

  /** WEBP, lossless VP8L flavor: 2F signature + 14-bit-packed (w−1, h−1). */
  def webpLBytes(w: Int, h: Int): Array[Byte] = {
    val bits = (w - 1) | ((h - 1) << 14)
    riffWebp("VP8L", Array[Byte](0x2F) ++ le32(bits) ++
      Array.tabulate(9)(j => ((j * 53 + 11) & 0xff).toByte))
  }

  private def le16ArrLe(v: Int) = Array(v.toByte, ((v >> 8) & 0x3F).toByte)

  final case class Mp3Doc(url: String, bytes: Array[Byte],
      exp_kbps: Int, exp_rate: Int, exp_ch: Int, exp_dur_ms: Long,
      exp_title: String, exp_artist: String)

  /** CBR MPEG-1 Layer III stream: optional ID3v2.3/2.4 tag carrying
    * TIT2/TPE1 in the requested text encoding (0 latin-1, 1 UTF-16 BOM,
    * 3 UTF-8) plus zero padding, then `nFrames` spec-sized frames
    * (frameLen = 144·bitrate/sampleRate) whose payloads are deterministic
    * non-sync junk. Every field a header parser reads is real.
    */
  def mp3Bytes(brIdx: Int, srIdx: Int, nFrames: Int, mono: Boolean,
      title: String, artist: String, v24: Boolean, enc: Int,
      withTag: Boolean): Array[Byte] = {
    val kbpsTab = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    val rateTab = Array(44100, 48000, 32000)
    def syncsafe(v: Int) = Array(((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
      ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    def textPayload(s: String): Array[Byte] = enc match {
      case 0 => Array(0.toByte) ++ s.getBytes("ISO-8859-1") :+ 0.toByte
      case 1 => // BOM'd, with the spec's two-byte UTF-16 terminator
        Array(1.toByte) ++ s.getBytes("UTF-16") ++ Array(0.toByte, 0.toByte)
      case _ => Array(3.toByte) ++ s.getBytes("UTF-8") :+ 0.toByte
    }
    def frame(id: String, payload: Array[Byte]) =
      id.getBytes ++ (if (v24) syncsafe(payload.length) else be32(payload.length)) ++
        Array[Byte](0, 0) ++ payload
    val tag = if (!withTag) Array.emptyByteArray else {
      val frames = frame("TIT2", textPayload(title)) ++ frame("TPE1", textPayload(artist))
      val padded = frames ++ new Array[Byte](17) // zero padding area
      "ID3".getBytes ++ Array((if (v24) 4 else 3).toByte, 0.toByte, 0.toByte) ++
        syncsafe(padded.length) ++ padded
    }
    val kbps = kbpsTab(brIdx)
    val rate = rateTab(srIdx)
    val frameLen = 144 * (kbps * 1000) / rate
    val audio = Array.tabulate(nFrames * frameLen) { j =>
      if (j % frameLen == 0) 0xFF.toByte
      else if (j % frameLen == 1) 0xFB.toByte
      else if (j % frameLen == 2) ((brIdx << 4) | (srIdx << 2)).toByte
      else if (j % frameLen == 3) (if (mono) 0xC0 else 0x00).toByte
      else ((j * 31 + 7) % 251).toByte // payload junk, never 0xFF
    }
    tag ++ audio
  }

  /** MP3 fixture corpus for q161: tag/no-tag, both ID3 majors, all three
    * text encodings, mono/stereo, varied bitrate/rate, interleaved with
    * non-MP3 blobs that must yield no metadata.
    */
  def mp3DF(spark: SparkSession, count: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, count.toLong).as[Long].map { id =>
      val i = id.toInt
      if (i % 5 == 4) {
        val bytes = if (i % 10 == 4) wavBytes(8000, 1) else pngBytes(9, 9)
        Mp3Doc(f"media://aud/$i%05d.bin", bytes, 0, 0, 0, 0L, "", "")
      } else {
        val brIdx = 1 + i % 14
        val srIdx = i % 3
        val withTag = i % 4 != 3
        val title = if (withTag) s"Track $i" else ""
        val artist = if (withTag) s"Artist ${i % 7}" else ""
        val bytes = mp3Bytes(brIdx, srIdx, 3 + i % 4, mono = i % 2 == 0,
          title, artist, v24 = i % 3 == 1, enc = i % 3, withTag)
        val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)(brIdx)
        val rate = Array(44100, 48000, 32000)(srIdx)
        val tagLen = if (withTag) {
          // header(10) + 2 frames(10+1+len+1 each) + padding(17)
          val tl = s"Track $i"
          val ar = s"Artist ${i % 7}"
          // payload = encoding byte + text bytes + NUL terminator
          // (1 byte for latin-1/UTF-8, 2 for UTF-16)
          def enc(s: String) = i % 3 match {
            case 0 => 2 + s.getBytes("ISO-8859-1").length
            case 1 => 3 + s.getBytes("UTF-16").length
            case _ => 2 + s.getBytes("UTF-8").length
          }
          10 + (10 + enc(tl)) + (10 + enc(ar)) + 17
        } else 0
        val audioBytes = bytes.length - tagLen
        Mp3Doc(f"media://aud/$i%05d.mp3", bytes, kbps, rate,
          if (i % 2 == 0) 1 else 2, audioBytes.toLong * 8 / kbps, title, artist)
      }
    }.toDF()
  }

  final case class SubDoc(url: String, bytes: Array[Byte], exp_kind: String,
      exp_cues: Int, exp_dur_ms: Long, exp_text: String)

  /** SRT/WebVTT fixture corpus for q160. The CLEAN text is generated
    * first, then wrapped in the markup each format carries (`<i>`,
    * `<c.cls>`, `<v Name>`, karaoke stamps, `{\an8}` overrides, `&amp;`
    * entities, NOTE blocks, cue ids, cue settings, one malformed timing
    * line per 5th doc) — the parser must recover the plant exactly.
    */
  def subtitleDF(spark: SparkSession, count: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, count.toLong).as[Long].map(id => subDocFor(id.toInt)).toDF()
  }

  /** One deterministic subtitle fixture (see [[subtitleDF]]). */
  def subDocFor(i: Int): SubDoc = {
      val vtt = i % 2 == 1
      val nCues = 3 + i % 4
      val sb = new StringBuilder
      val clean = new StringBuilder
      var dur = 0L
      if (vtt) sb.append("WEBVTT\n\nNOTE this block is ignored\nstill ignored\n\n")
      for (c <- 0 until nCues) {
        val startMs = i * 41L + c * 2000L
        val endMs = startMs + 1500L + (c % 3) * 250L
        dur += endMs - startMs
        def ts(ms: Long): String = {
          val sep = if (vtt) "." else ","
          f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d$sep${ms % 1000}%03d"
        }
        val line1 = s"word$i alpha $c beta"
        val line2 = s"gamma & delta $c"
        if (clean.nonEmpty) clean.append('\n')
        clean.append(line1).append('\n').append(line2)
        if (i % 5 == 0 && c == 1) // malformed cue: dropped, payload consumed
          sb.append("bad --> cue\nswallowed junk line\n\n")
        if (!vtt) sb.append(c + 1).append('\n')
        else sb.append("cue-id-").append(c).append('\n')
        sb.append(ts(startMs)).append(" --> ").append(ts(endMs))
        if (vtt && c % 2 == 1) sb.append(" align:start line:0%")
        sb.append('\n')
        val deco1 =
          if (vtt) s"<c.yellow><00:00:01.000>word$i</c> <i>alpha $c</i> beta"
          else (if (c == 0) "{\\an8}" else "") + s"word$i <i>alpha $c</i> beta"
        sb.append(deco1).append('\n')
        sb.append(s"gamma &amp; delta $c").append('\n')
        sb.append('\n')
      }
      SubDoc(f"media://sub/$i%05d.${if (vtt) "vtt" else "srt"}",
        sb.toString.getBytes("UTF-8"), if (vtt) "vtt" else "srt",
        nCues, dur, clean.toString)
  }

  final case class ExifDoc(url: String, bytes: Array[Byte],
      exp_container: String, exp_big: Boolean, exp_orient: Int,
      exp_w: Int, exp_h: Int, exp_make: String, exp_dt: String,
      exp_gps: Boolean)

  /** EXIF fixture corpus for q157: standalone TIFFs and Exif-carrying
    * JPEGs in both byte orders with varied orientation/GPS planting,
    * interleaved with EXIF-free blobs (plain PNG/GIF/JPEG) that must
    * yield no metadata.
    */
  def exifDF(spark: SparkSession, count: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, count.toLong).as[Long].map { id =>
      val i = id.toInt
      val w = 17 + i
      val h = 9 + (i % 13)
      val o = i % 8 + 1
      val gps = i % 2 == 0
      val big = i % 4 >= 2
      val make = s"graftcam-$o"
      val dt = f"2021:0${o % 9 + 1}:07 10:${o + 10}%02d:00"
      i % 5 match {
        case 0 | 1 =>
          ExifDoc(f"media://exif/$i%05d.tif", tiffBytes(w, h, o, gps, big),
            "tiff", big, o, w, h, make, dt, gps)
        case 2 | 3 =>
          ExifDoc(f"media://exif/$i%05d.jpg", jpegExifBytes(w, h, o, gps, big),
            "jpeg", big, o, w, h, make, dt, gps)
        case _ =>
          val bytes = i % 15 match {
            case 4 => pngBytes(w, h)
            case 9 => gifBytes(w, h)
            case _ => jpegBytes(w, h) // JPEG with no APP1: the near-miss
          }
          ExifDoc(f"media://exif/$i%05d.bin", bytes, "", false, 0, 0, 0, "", "", false)
      }
    }.toDF()
  }

  /** Spec-valid, FULLY DECODABLE grayscale TIFF (TIFF 6.0 baseline:
    * uncompressed, one strip, BlackIsZero) carrying a real EXIF tag set —
    * Orientation, Make, DateTime, an Exif sub-IFD (PixelX/YDimension) and
    * optionally a GPS IFD pointer — in either byte order. The raster is
    * the [[grayAt]] pattern, so the JDK's independent ImageIO TIFF
    * decoder can cross-check dims AND pixels, and its metadata tree the
    * tag values.
    */
  def tiffBytes(w: Int, h: Int, orientation: Int, gps: Boolean,
      bigEndian: Boolean): Array[Byte] = {
    def e16(v: Int) = if (bigEndian) be16(v) else le16(v)
    def e32(v: Int) = if (bigEndian) be32(v) else le32(v)
    val make = s"graftcam-$orientation".getBytes("ISO-8859-1") :+ 0.toByte
    val dt = (f"2021:0${orientation % 9 + 1}:07 10:${orientation + 10}%02d:00"
      .getBytes("ISO-8859-1")) :+ 0.toByte // 19 chars + NUL = 20 bytes
    val nIfd0 = if (gps) 14 else 13
    val ifd0Size = 2 + nIfd0 * 12 + 4
    val exifOff = 8 + ifd0Size
    val exifSize = 2 + 2 * 12 + 4
    val gpsOff = exifOff + exifSize
    val gpsSize = if (gps) 2 + 12 + 4 else 0
    val makeOff = gpsOff + gpsSize
    val dtOff = makeOff + make.length
    val stripOff = dtOff + dt.length
    def entry(tag: Int, typ: Int, count: Int, value: Array[Byte]) =
      e16(tag) ++ e16(typ) ++ e32(count) ++ value.padTo(4, 0.toByte)
    def shortVal(v: Int) = if (bigEndian) be16(v) ++ be16(0) else le16(v) ++ le16(0)
    val ifd0 = e16(nIfd0) ++
      entry(0x0100, 3, 1, shortVal(w)) ++
      entry(0x0101, 3, 1, shortVal(h)) ++
      entry(0x0102, 3, 1, shortVal(8)) ++
      entry(0x0103, 3, 1, shortVal(1)) ++
      entry(0x0106, 3, 1, shortVal(1)) ++
      entry(0x010F, 2, make.length, e32(makeOff)) ++
      entry(0x0111, 4, 1, e32(stripOff)) ++
      entry(0x0112, 3, 1, shortVal(orientation)) ++
      entry(0x0115, 3, 1, shortVal(1)) ++
      entry(0x0116, 3, 1, shortVal(h)) ++
      entry(0x0117, 4, 1, e32(w * h)) ++
      entry(0x0132, 2, dt.length, e32(dtOff)) ++
      entry(0x8769, 4, 1, e32(exifOff)) ++
      (if (gps) entry(0x8825, 4, 1, e32(gpsOff)) else Array.emptyByteArray) ++
      e32(0)
    val exifIfd = e16(2) ++
      entry(0xA002, 4, 1, e32(w)) ++
      entry(0xA003, 4, 1, e32(h)) ++
      e32(0)
    val gpsIfd =
      if (gps) e16(1) ++ entry(0x0000, 1, 4, Array[Byte](2, 3, 0, 0)) ++ e32(0)
      else Array.emptyByteArray
    val strip = Array.tabulate(w * h)(i => grayAt(i % w, i / w).toByte)
    val hdr = (if (bigEndian) "MM".getBytes ++ be16(42)
               else "II".getBytes ++ le16(42)) ++ e32(8)
    hdr ++ ifd0 ++ exifIfd ++ gpsIfd ++ make ++ dt ++ strip
  }

  /** JPEG wrapping [[tiffBytes]] in an APP1 "Exif" segment (CIPA DC-008
    * embedding) ahead of the [[jpegBytes]] header-only frame. */
  def jpegExifBytes(w: Int, h: Int, orientation: Int, gps: Boolean,
      bigEndian: Boolean): Array[Byte] = {
    val tif = tiffBytes(w, h, orientation, gps, bigEndian)
    val payload = "Exif".getBytes ++ Array[Byte](0, 0) ++ tif
    val app1 = Array(0xFF, 0xE1).map(_.toByte) ++ be16(payload.length + 2) ++ payload
    val base = jpegBytes(w, h)
    base.take(2) ++ app1 ++ base.drop(2)
  }

  /** Spec-valid PCM WAV: RIFF header + 16-byte fmt chunk + a small silent
    * data chunk (every field a header parser reads is real).
    */
  def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val bitsPerSample = 16
    val blockAlign = channels * bitsPerSample / 8
    val data = new Array[Byte](4 * blockAlign) // 4 silent frames
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * blockAlign) ++
      le16(blockAlign) ++ le16(bitsPerSample)
    val dataChunk = "data".getBytes ++ le32(data.length) ++ data
    val body = "WAVE".getBytes ++ fmt ++ dataChunk
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  /** Deterministic RGB pattern for the uncompressed-raster fixtures; the
    * generator computes the expected luma stats from these raw values
    * BEFORE encoding, so the decoder is checked through the byte layout
    * (BGR order, row padding, header offsets), not against itself.
    */
  private def rgbAt(x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y * 13) % 256, (x * 3 + y) % 256, (x + y * 5) % 256)

  private def lumaOf(r: Int, g: Int, b: Int): Int =
    (2126 * r + 7152 * g + 722 * b) / 10000

  /** Expected (pixels, meanLumaX1000, peakLuma) of the [[rgbAt]] pattern. */
  def rasterTruth(w: Int, h: Int): (Long, Long, Int) = {
    var sum = 0L
    var peak = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgbAt(x, y)
        val l = lumaOf(r, g, b)
        sum += l
        if (l > peak) peak = l
        x += 1
      }
      y += 1
    }
    val pix = w.toLong * h
    (pix, (sum * 1000 + pix / 2) / pix, peak)
  }

  /** Spec-valid 24-bit BI_RGB BMP (bottom-up, 4-byte-padded rows) carrying
    * the [[rgbAt]] pixel pattern — a REAL-pixel fixture.
    */
  def bmpBytes(w: Int, h: Int): Array[Byte] = bmpOfRgb(w, h, rgbAt)

  /** 24-bit BI_RGB BMP of an arbitrary RGB pattern. */
  private def bmpOfRgb(w: Int, h: Int,
      rgbFn: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataOff = 54
    val total = dataOff + rowSize * h
    val out = new Array[Byte](total)
    out(0) = 'B'; out(1) = 'M'
    le32(total).copyToArray(out, 2)
    le32(dataOff).copyToArray(out, 10)
    le32(40).copyToArray(out, 14) // BITMAPINFOHEADER
    le32(w).copyToArray(out, 18)
    le32(h).copyToArray(out, 22) // positive = bottom-up
    le16(1).copyToArray(out, 26) // planes
    le16(24).copyToArray(out, 28)
    le32(0).copyToArray(out, 30) // BI_RGB
    le32(rowSize * h).copyToArray(out, 34)
    for (row <- 0 until h; x <- 0 until w) {
      val y = h - 1 - row // bottom-up storage
      val (r, g, b) = rgbFn(x, y)
      val base = dataOff + row * rowSize + x * 3
      out(base) = b.toByte; out(base + 1) = g.toByte; out(base + 2) = r.toByte
    }
    out
  }

  // ---- seeded near-dup image family (q145 fixtures) ----------------------

  /** splitmix64 finalizer (Steele/Lea/Flood 2014, public domain). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Four coarse luma levels for the seeded block pattern: any two blocks
    * are either exactly equal or ≥ 60 apart, so a near-dup variant's
    * sum-cancelling ±2 pixel noise can never flip a dHash gradient sign.
    */
  private val BlockLevels = Array(30, 90, 150, 210)

  /** Luma level of dHash block (cx ∈ 0..8, cy ∈ 0..7) for a seed. */
  def blockLevel(seed: Long, cx: Int, cy: Int): Int =
    BlockLevels(((mix64(seed * 977 + cy * 9 + cx) >>> 32) & 3).toInt)

  /** Fixture dims chosen so every dHash 9×8 block is exactly 10×10 px. */
  val NeardupW = 90
  val NeardupH = 80

  private def seedLuma(seed: Long, x: Int, y: Int): Int =
    blockLevel(seed, x / 10, y / 10)

  private def grayPng(w: Int, h: Int, lumaAt: (Int, Int) => Int): Array[Byte] =
    pngEncode(w, h, 2, (x, y, cur, base) => {
      // r=g=b=luma: the decoders' integer Rec.709 (2126r+7152g+722b)/10000
      // reproduces the sample EXACTLY, keeping block sums integral
      val l = lumaAt(x, y).toByte
      cur(base) = l; cur(base + 1) = l; cur(base + 2) = l
    })

  /** Base picture of a near-dup group. */
  def seededPng(seed: Long): Array[Byte] =
    grayPng(NeardupW, NeardupH, seedLuma(seed, _, _))

  /** Near-dup: ±2 checker noise that cancels EXACTLY inside every 10×10
    * block (50 `+2` and 50 `-2` pixels per block) — every byte of the
    * raster differs from the base, every block sum (hence the dHash) is
    * identical. Hamming distance to the base: exactly 0.
    */
  def seededNoisyPng(seed: Long): Array[Byte] =
    grayPng(NeardupW, NeardupH, (x, y) =>
      seedLuma(seed, x, y) + (if (((x + y) & 1) == 0) 2 else -2))

  /** Near-dup: ONE block bumped a full 60-luma level step — can flip at
    * most the two dHash bits comparing that block with its left and right
    * neighbors (hamming ≤ 2 from the base, inside the detection radius).
    */
  def seededBumpPng(seed: Long): Array[Byte] = {
    val bx = ((mix64(seed ^ 0x5bf03721L) >>> 8) % 9).toInt
    val by = ((mix64(seed ^ 0x1c8e44d9L) >>> 8) % 8).toInt
    grayPng(NeardupW, NeardupH, (x, y) => {
      val l = seedLuma(seed, x, y)
      if (x / 10 == bx && y / 10 == by) { if (l <= 150) l + 60 else l - 60 }
      else l
    })
  }

  /** The SAME picture as [[seededPng]] re-encoded as a 24-bit BMP — the
    * cross-container duplicate (dHash must come out bit-identical).
    */
  def seededBmp(seed: Long): Array[Byte] =
    bmpOfRgb(NeardupW, NeardupH, (x, y) => {
      val l = seedLuma(seed, x, y)
      (l, l, l)
    })

  // ---- seeded near-dup audio family (q148 fixtures) ----------------------

  /** 65 envelope windows × 160 samples — the [[graft.functions.Multimodal.ahash64]]
    * window count, sample count an exact multiple so every window is the
    * same size.
    */
  val AudioWindows = 65
  val AudioWinSamples = 160

  /** Per-window amplitude level ∈ {256, 1024, 4096, 16384}: 4× gaps, so
    * integer truncation under volume scaling can never reorder two
    * DISTINCT levels, while equal levels produce byte-identical windows
    * (hence exactly equal envelope sums) under any uniform scaling.
    */
  def audioLevel(seed: Long, w: Int): Int =
    Array(256, 1024, 4096, 16384)(((mix64(seed * 4099 + w) >>> 32) & 3).toInt)

  /** Triangle carrier, period 64, range [-64, 63]. */
  private def tri(j: Int): Int = {
    val m = j % 64
    (if (m < 32) m - 16 else 47 - m) * 4
  }

  /** Seeded WAV (mono s16le, 8 kHz): per-window triangle carrier scaled by
    * the seed's level sequence. `volNum/volDen` applies a uniform volume
    * change (sample-wise integer scaling); `rotate` cyclically shifts the
    * samples WITHIN each window by a seed-derived offset (bytes differ,
    * order-free window sums identical); `bumpWin` ≥ 0 moves that one
    * window a full level step (±2 envelope-hash bits at most).
    */
  def seededWav(seed: Long, volNum: Int = 1, volDen: Int = 1,
      rotate: Boolean = false, bumpWin: Int = -1): Array[Byte] = {
    val frames = AudioWindows * AudioWinSamples
    val data = new Array[Byte](frames * 2)
    val rot = if (rotate) 1 + ((mix64(seed ^ 0x7e11a3L) >>> 8) % 151).toInt else 0
    for (w <- 0 until AudioWindows) {
      var lvl = audioLevel(seed, w)
      if (w == bumpWin) lvl = if (lvl <= 4096) lvl * 4 else lvl / 4
      for (j <- 0 until AudioWinSamples) {
        val jj = (j + rot) % AudioWinSamples
        val s = lvl * tri(jj) / 64 * volNum / volDen
        val base = (w * AudioWinSamples + j) * 2
        data(base) = s.toByte
        data(base + 1) = (s >> 8).toByte
      }
    }
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(8000 * 2) ++ le16(2) ++ le16(16)
    val dataChunk = "data".getBytes ++ le32(data.length) ++ data
    val body = "WAVE".getBytes ++ fmt ++ dataChunk
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  /** One audio row of the planted near-dup corpus. */
  final case class NeardupAud(url: String, bytes: Array[Byte], group_id: Long)

  /** Planted near-dup audio corpus for q148: per group — the base clip, a
    * 5/8-volume re-master (envelope hash unchanged), a within-window
    * time-jitter variant (rotated samples, hash unchanged), and a
    * one-window level bump (hamming ≤ 2) — plus unrelated singletons.
    */
  def neardupAudioDF(spark: SparkSession, groups: Int, singles: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, (groups + singles).toLong)
      .repartition(4)
      .as[Long].flatMap { id =>
        if (id < groups) {
          val seed = 0xBEA7000L + id * 6007L
          val bump = (Math.floorMod(mix64(seed), 65L)).toInt
          Seq(
            NeardupAud(f"aud://grp/$id%03d/a.wav", seededWav(seed), id),
            NeardupAud(f"aud://grp/$id%03d/b.wav",
              seededWav(seed, volNum = 5, volDen = 8), id),
            NeardupAud(f"aud://grp/$id%03d/c.wav",
              seededWav(seed, rotate = true), id),
            NeardupAud(f"aud://grp/$id%03d/d.wav",
              seededWav(seed, bumpWin = bump), id))
        } else {
          val seed = 0xD15C000L + id * 15013L
          Seq(NeardupAud(f"aud://solo/$id%03d.wav", seededWav(seed), -1 - id))
        }
      }.toDF()
  }

  /** One image row of the planted near-dup corpus. */
  final case class NeardupImg(url: String, bytes: Array[Byte], group_id: Long)

  /** Planted near-dup image corpus for q145: per group — a base PNG, a
    * sum-cancelling-noise PNG (hamming 0), a one-block-bumped PNG
    * (hamming ≤ 2) and the base picture as a BMP (cross-container,
    * hamming 0) — plus `singles` unrelated singleton images (group_id
    * < 0, expected to pair with nothing). Fully deterministic.
    */
  def neardupImagesDF(spark: SparkSession, groups: Int, singles: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, (groups + singles).toLong)
      .repartition(4) // the synth is per-row embarrassingly parallel
      .as[Long].flatMap { id =>
        if (id < groups) {
          val seed = 0xA11CE000L + id * 7919L
          Seq(
            NeardupImg(f"img://grp/$id%03d/a.png", seededPng(seed), id),
            NeardupImg(f"img://grp/$id%03d/b.png", seededNoisyPng(seed), id),
            NeardupImg(f"img://grp/$id%03d/c.png", seededBumpPng(seed), id),
            NeardupImg(f"img://grp/$id%03d/d.bmp", seededBmp(seed), id))
        } else {
          val seed = 0x50C1A150L + id * 104729L
          Seq(NeardupImg(f"img://solo/$id%03d.png", seededPng(seed), -1 - id))
        }
      }.toDF()
  }

  /** Binary P6 PPM with a header comment, carrying the same [[rgbAt]]
    * pattern.
    */
  def ppmBytes(w: Int, h: Int): Array[Byte] = {
    val hdr = s"P6\n# synthetic fixture\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + w * h * 3)
    hdr.copyToArray(out, 0)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbAt(x, y)
      val base = hdr.length + (y * w + x) * 3
      out(base) = r.toByte; out(base + 1) = g.toByte; out(base + 2) = b.toByte
    }
    out
  }

  /** Deterministic s16le sample value for frame k, channel c. */
  private def sampleAt(k: Int, c: Int): Int =
    ((k * 2731 + c * 499) % 20001) - 10000

  /** PCM WAV whose data chunk carries [[sampleAt]] samples, plus the
    * expected (frames, meanAbsX1000 full-scale-normalized, peakAbs)
    * computed from the raw values before encoding.
    */
  def wavToneBytes(sampleRate: Int, channels: Int, frames: Int): (Array[Byte], (Long, Long, Int)) = {
    val blockAlign = channels * 2
    val data = new Array[Byte](frames * blockAlign)
    var sumAbs = 0L
    var peak = 0
    for (k <- 0 until frames; c <- 0 until channels) {
      val v = sampleAt(k, c)
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      val base = (k * channels + c) * 2
      data(base) = v.toByte; data(base + 1) = (v >> 8).toByte
    }
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * blockAlign) ++
      le16(blockAlign) ++ le16(16)
    val dataChunk = "data".getBytes ++ le32(data.length) ++ data
    val body = "WAVE".getBytes ++ fmt ++ dataChunk
    val samples = frames.toLong * channels
    val scale = 32768L * samples
    val mean = if (samples == 0) 0L else (sumAbs * 1000 + scale / 2) / scale
    ("RIFF".getBytes ++ le32(body.length) ++ body,
      (frames.toLong, mean, peak))
  }

  /** `count` media docs in the pages-table binary shape `(url, html)` plus
    * ground-truth columns (dims for images, rate/channels for audio, and
    * REAL content stats — frames / mean ×1000 / peak — for the
    * pixel/sample-decoded kinds), round-robin across six formats with
    * values varying per id.
    */
  def mediaDF(spark: SparkSession, count: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, count.toLong).as[Long].map { id =>
      val i = id.toInt
      val w = 16 + i * 3
      val h = 9 + i * 2
      i % 12 match {
        case 11 => // WEBP: header-only (dims real, both chunk flavors)
          if (i % 24 == 11)
            MediaDoc(f"media://img/$i%05d.webp", webpLBytes(w, h), "webp",
              w, h, 0, 0, 0L, 0L, 0, exp_decoded = false)
          else
            MediaDoc(f"media://img/$i%05d.webp", webpBytes(w, h), "webp",
              w, h, 0, 0, 0L, 0L, 0, exp_decoded = false)
        case 0 => // REAL-pixel PNG, RGB, all five filters exercised
          val (pix, mean, peak) = rasterTruth(w, h)
          MediaDoc(f"media://img/$i%05d.png", pngPixelBytes(w, h, 2), "png",
            w, h, 0, 0, pix, mean, peak, exp_decoded = true)
        case 1 => MediaDoc(f"media://img/$i%05d.jpg", jpegBytes(w, h), "jpeg",
          w, h, 0, 0, 0L, 0L, 0, exp_decoded = false)
        case 2 => // REAL-pixel GIF through a genuine LZW round-trip
          val (pix, mean, peak) = gifTruth(w, h)
          MediaDoc(f"media://img/$i%05d.gif", gifPixelBytes(w, h), "gif",
            w, h, 0, 0, pix, mean, peak, exp_decoded = true)
        case 3 =>
          val rate = 8000 + i * 100
          val ch = 1 + (i % 2)
          val (bytes, (fr, mean, peak)) = wavToneBytes(rate, ch, 50 + i)
          MediaDoc(f"media://aud/$i%05d.wav", bytes, "wav",
            0, 0, rate, ch, fr, mean, peak, exp_decoded = true)
        case 4 =>
          val (pix, mean, peak) = rasterTruth(w, h)
          MediaDoc(f"media://img/$i%05d.bmp", bmpBytes(w, h), "bmp",
            w, h, 0, 0, pix, mean, peak, exp_decoded = true)
        case 5 =>
          val (pix, mean, peak) = rasterTruth(w, h)
          MediaDoc(f"media://img/$i%05d.ppm", ppmBytes(w, h), "ppm",
            w, h, 0, 0, pix, mean, peak, exp_decoded = true)
        case 6 => // gray+alpha PNG: the non-RGB sample layout
          val (pix, mean, peak) = grayTruth(w, h)
          MediaDoc(f"media://img/$i%05d-ga.png", pngPixelBytes(w, h, 4), "png",
            w, h, 0, 0, pix, mean, peak, exp_decoded = true)
        case 7 => // MP4: header-only (dims real, duration-ms in frames)
          val durMs = 1000L + i * 33
          MediaDoc(f"media://vid/$i%05d.mp4", mp4Bytes(w, h, durMs), "mp4",
            w, h, 0, 0, durMs, 0L, 0, exp_decoded = false)
        case 8 => // RGBA PNG: alpha ignored by the luma stats
          val (pix, mean, peak) = rasterTruth(w, h)
          MediaDoc(f"media://img/$i%05d-ra.png", pngPixelBytes(w, h, 6), "png",
            w, h, 0, 0, pix, mean, peak, exp_decoded = true)
        case 9 => // REAL-pixel grayscale JPEG (single-component stream)
          val (pix, mean, peak) = jpegTruth(w, h)
          MediaDoc(f"media://img/$i%05d-g.jpg", jpegPixelBytes(w, h, gray = true),
            "jpeg", w, h, 0, 0, pix, mean, peak, exp_decoded = true)
        case _ => // REAL-pixel color JPEG (YCbCr, encoder-chosen subsampling)
          val (pix, mean, peak) = jpegTruth(w, h)
          MediaDoc(f"media://img/$i%05d-c.jpg", jpegPixelBytes(w, h, gray = false),
            "jpeg", w, h, 0, 0, pix, mean, peak, exp_decoded = true)
      }
    }.toDF()
  }
}
