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
                            exp_rate: Int, exp_ch: Int)

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

  /** `count` media docs in the pages-table binary shape `(url, html)` plus
    * ground-truth columns (dims for images, rate/channels for audio),
    * round-robin across the four formats with values varying per id.
    */
  def mediaDF(spark: SparkSession, count: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, count.toLong).as[Long].map { id =>
      val i = id.toInt
      val w = 16 + i * 3
      val h = 9 + i * 2
      i % 4 match {
        case 0 => MediaDoc(f"media://img/$i%05d.png", pngBytes(w, h), "png", w, h, 0, 0)
        case 1 => MediaDoc(f"media://img/$i%05d.jpg", jpegBytes(w, h), "jpeg", w, h, 0, 0)
        case 2 => MediaDoc(f"media://img/$i%05d.gif", gifBytes(w, h), "gif", w, h, 0, 0)
        case _ =>
          val rate = 8000 + i * 100
          val ch = 1 + (i % 2)
          MediaDoc(f"media://aud/$i%05d.wav", wavBytes(rate, ch), "wav", 0, 0, rate, ch)
      }
    }.toDF()
  }
}
