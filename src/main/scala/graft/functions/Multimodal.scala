package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat opaque `binary` payloads (image/audio/
  * video frames, or here the raw html bytes) as first-class columns with
  * typed, deterministic feature extraction running inside `mapPartitions`.
  *
  * The DECODE step is a STUB — this container has no image/audio codecs, so
  * [[decodeStub]] derives a deterministic fake (dimensions from the byte
  * length, a 16-bin byte histogram, an integer entropy score) purely from the
  * bytes. The Spark-side plumbing is real and what matters at 100 TB: the
  * binary column is never exploded or copied, feature extraction is a single
  * narrow per-partition pass (no shuffle), and outputs are fixed-width
  * columns so downstream scans prune the blob away entirely.
  */
object Multimodal {

  final case class MediaFeatures(
      url: String,
      byte_len: Int,
      kind: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      channels: Int,
      histogram: Array[Int],
      entropy_x1000: Long,
      head_hex: String)

  /** REAL pure-JVM image header parse: PNG (IHDR), JPEG (SOFn segment
    * walk), GIF (logical screen descriptor). These are public, stable
    * container formats whose dimensions live in fixed header fields — no
    * codec needed. Returns (kind, width, height); None for non-image
    * bytes. Never throws on truncated/garbage input.
    */
  def imageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    val n = b.length
    @inline def u8(i: Int) = b(i) & 0xff
    @inline def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    // PNG: 8-byte signature, then the IHDR chunk is mandatory-first:
    // length(4) "IHDR" width(4 BE) height(4 BE)
    if (n >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return Some(("png", be32(16), be32(20)))
    // GIF: "GIF87a"/"GIF89a", then width/height as LE u16
    if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return Some(("gif", le16(6), le16(8)))
    // JPEG: SOI then a segment walk to the first SOFn (C0–CF minus the
    // non-frame C4/C8/CC); dims are height(2 BE) width(2 BE) after the
    // segment length and precision byte
    if (n >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 3 < n) {
        if (u8(i) != 0xFF) return Some(("jpeg", 0, 0)) // damaged segment chain
        var j = i
        while (j < n && u8(j) == 0xFF) j += 1 // fill bytes
        if (j >= n) return Some(("jpeg", 0, 0))
        val marker = u8(j)
        if (marker == 0xD9 || marker == 0xDA) return Some(("jpeg", 0, 0)) // EOI/SOS before SOF
        if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          if (j + 8 < n) return Some(("jpeg", be16(j + 6), be16(j + 4)))
          return Some(("jpeg", 0, 0))
        }
        if (j + 2 >= n) return Some(("jpeg", 0, 0))
        i = j + 1 + be16(j + 1) // next segment
      }
      return Some(("jpeg", 0, 0))
    }
    None
  }

  /** REAL pure-JVM audio header parse: RIFF/WAVE chunk walk to the `fmt `
    * chunk — (sampleRate, channels). Same contract as [[imageHeader]]:
    * public stable container format, fixed header fields, no codec, never
    * throws on truncated/garbage input.
    */
  def wavHeader(b: Array[Byte]): Option[(Int, Int)] = {
    val n = b.length
    @inline def u8(i: Int) = b(i) & 0xff
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (n < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    // Long cursor: a lying chunk size near Int.MaxValue must walk off the
    // end, not wrap the index negative (b(negative) would throw and break
    // the never-throws contract)
    var i = 12L
    while (i + 8 <= n) {
      val j = i.toInt
      val size = le32(j + 4).toLong
      if (b(j) == 'f' && b(j + 1) == 'm' && b(j + 2) == 't' && b(j + 3) == ' ') {
        if (i + 8 + 8 > n || size < 16) return Some((0, 0)) // truncated fmt
        return Some((le32(j + 12), le16(j + 10)))
      }
      if (size < 0) return Some((0, 0)) // damaged chunk size
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    Some((0, 0)) // valid RIFF/WAVE but no fmt chunk found
  }

  /** Deterministic decode: REAL header parse for PNG/JPEG/GIF (kind +
    * width/height from the file's own header fields); for everything else
    * the declared STUB remains (this container has no pixel codecs) —
    * dimensions become a deterministic fake derived from the byte length.
    * A real deployment swaps ONLY the non-image fallback for a codec call;
    * schema, batching and partitioning stay identical.
    */
  def decodeStub(url: String, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val hist = new Array[Int](16)
    var i = 0
    while (i < n) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    // integer entropy in millinats over the 16 bins
    var ent = 0.0
    var b = 0
    while (b < 16) {
      val p = if (n == 0) 0.0 else hist(b).toDouble / n
      if (p > 0) ent -= p * math.log(p)
      b += 1
    }
    val head = bytes.take(8).map(x => f"${x & 0xff}%02x").mkString
    imageHeader(bytes) match {
      case Some((kind, w, h)) =>
        MediaFeatures(url, n, kind, w, h, 0, 0, hist, math.round(ent * 1000), head)
      case None => wavHeader(bytes) match {
        case Some((rate, ch)) =>
          MediaFeatures(url, n, "wav", 0, 0, rate, ch, hist,
            math.round(ent * 1000), head)
        case None =>
          val kind =
            if (n >= 4 && bytes(0) == '<'.toByte) "markup"
            else if (n == 0) "empty" else "binary"
          // fake dims: deterministic function of length (stand-in for a real
          // pixel decode)
          MediaFeatures(url, n, kind, (n % 1024) + 1, (n % 768) + 1, 0, 0, hist,
            math.round(ent * 1000), head)
      }
    }
  }

  /** Feature-extract a binary column: narrow mapPartitions, blob never
    * shuffled. Input must have (url string, html binary).
    */
  def features(pages: DataFrame): Dataset[MediaFeatures] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (u, b) =>
        decodeStub(u, if (b == null) Array.emptyByteArray else b)
      })
  }
}
