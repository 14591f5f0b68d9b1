package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic media blobs (spec-valid PNG / JPEG / GIF
  * containers with known dimensions) for exercising the REAL header
  * parsers in [[graft.functions.Multimodal]] — the payload pixels are
  * filler, but every header field a parser reads (signatures, chunk
  * layout, CRCs, segment lengths, dimension fields) is spec-conformant,
  * so the dims the engine reports are checkable against ground truth.
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

  private def le32(v: Int) =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

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
  def bmpBytes(w: Int, h: Int): Array[Byte] = {
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
      val (r, g, b) = rgbAt(x, y)
      val base = dataOff + row * rowSize + x * 3
      out(base) = b.toByte; out(base + 1) = g.toByte; out(base + 2) = r.toByte
    }
    out
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
      i % 6 match {
        case 0 => MediaDoc(f"media://img/$i%05d.png", pngBytes(w, h), "png",
          w, h, 0, 0, 0L, 0L, 0, exp_decoded = false)
        case 1 => MediaDoc(f"media://img/$i%05d.jpg", jpegBytes(w, h), "jpeg",
          w, h, 0, 0, 0L, 0L, 0, exp_decoded = false)
        case 2 => MediaDoc(f"media://img/$i%05d.gif", gifBytes(w, h), "gif",
          w, h, 0, 0, 0L, 0L, 0, exp_decoded = false)
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
        case _ =>
          val (pix, mean, peak) = rasterTruth(w, h)
          MediaDoc(f"media://img/$i%05d.ppm", ppmBytes(w, h), "ppm",
            w, h, 0, 0, pix, mean, peak, exp_decoded = true)
      }
    }.toDF()
  }
}
