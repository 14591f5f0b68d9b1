package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat opaque `binary` payloads (image/audio/
  * video frames, or here the raw html bytes) as first-class columns with
  * typed, deterministic feature extraction running inside `mapPartitions`.
  *
  * Decode depth is format-tiered. REAL, pure-JVM, codec-free:
  * PNG/JPEG/GIF header parse (dims from the container's own fields),
  * RIFF/WAVE fmt parse (rate/channels), full PIXEL decode for uncompressed
  * 24-bit BMP and P6 PPM, and full SAMPLE decode for s16le PCM WAV
  * (mean/peak stats from actual content). Only the remaining COMPRESSED
  * payload families (JPEG entropy data, PNG IDAT pixels, lossy audio) keep
  * a declared stub — this container ships no codecs — and those rows carry
  * `decoded = false` so a consumer can tell. The Spark-side plumbing is
  * identical either way and is what matters at 100 TB: the binary column is
  * never exploded or copied, feature extraction is a single narrow
  * per-partition pass (no shuffle), and outputs are fixed-width columns so
  * downstream scans prune the blob away entirely.
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
      head_hex: String,
      // REAL content-level decode results (BMP/PPM pixels, PCM WAV
      // samples): pixel count / audio frame count; mean luma ×1000 (0..255
      // scale) for raster, mean |sample| ×1000 normalized to full scale
      // for audio; peak luma (0..255) / peak |sample| (0..32768);
      // `decoded` = true only when the actual payload was decoded (false
      // for header-only kinds and the length-derived stub)
      frames: Long,
      mean_x1000: Long,
      peak: Int,
      decoded: Boolean)

  /** Decoded raster stats from an UNCOMPRESSED pixel payload. */
  final case class RasterStats(kind: String, width: Int, height: Int,
                               pixels: Long, meanLumaX1000: Long, peakLuma: Int)

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

  /** REAL pure-JVM PIXEL decode for uncompressed raster containers —
    * 24-bit BI_RGB BMP and binary P6 PPM (maxval ≤ 255) — no codec
    * required, which is the point: for these format families the
    * histogram/entropy-style features are computed from actual pixels, not
    * a stub. Luma is integer Rec.709 `(2126 R + 7152 G + 722 B) / 10000`.
    * Returns None unless the complete pixel payload is present and
    * well-formed (the header-only/stub paths then apply); never throws on
    * truncated/garbage input. Dimensions are capped at 2^20 per axis so a
    * lying header cannot provoke a giant allocation or overflow.
    */
  def rasterPixels(b: Array[Byte]): Option[RasterStats] = {
    val n = b.length
    @inline def u8(i: Int) = b(i) & 0xff
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val dimCap = 1 << 20
    // --- BMP: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (>=40) ---
    if (n >= 54 && b(0) == 'B' && b(1) == 'M') {
      val off = le32(10)
      val w = le32(18)
      val hRaw = le32(22) // negative = top-down; row order is irrelevant
                          // for order-free stats
      val h = math.abs(hRaw)
      val bpp = le16(28)
      val comp = le32(30)
      if (w > 0 && h > 0 && w <= dimCap && h <= dimCap &&
          bpp == 24 && comp == 0 && off >= 54) {
        val rowSize = ((w * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
        if (off.toLong + rowSize.toLong * h <= n) {
          var sum = 0L
          var peak = 0
          var y = 0
          while (y < h) {
            var base = off + y * rowSize
            var x = 0
            while (x < w) {
              // BMP stores BGR
              val l = (2126 * u8(base + 2) + 7152 * u8(base + 1) +
                722 * u8(base)) / 10000
              sum += l
              if (l > peak) peak = l
              base += 3
              x += 1
            }
            y += 1
          }
          val pix = w.toLong * h
          return Some(RasterStats("bmp", w, h, pix,
            (sum * 1000 + pix / 2) / pix, peak))
        }
      }
      return None
    }
    // --- PPM P6: "P6" <ws/comments> w <ws> h <ws> maxval <one ws> pixels ---
    if (n >= 2 && b(0) == 'P' && b(1) == '6') {
      var i = 2
      @inline def isWs(c: Byte) =
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B
      def readInt(): Int = {
        var sawWs = false
        var going = true
        while (going && i < n) {
          if (isWs(b(i))) { sawWs = true; i += 1 }
          else if (b(i) == '#') { while (i < n && b(i) != '\n') i += 1 }
          else going = false
        }
        if (!sawWs || i >= n || b(i) < '0' || b(i) > '9') return -1
        var v = 0
        while (i < n && b(i) >= '0' && b(i) <= '9' && v <= dimCap) {
          v = v * 10 + (b(i) - '0')
          i += 1
        }
        v
      }
      val w = readInt()
      val h = readInt()
      val maxv = readInt()
      if (w > 0 && h > 0 && w <= dimCap && h <= dimCap &&
          maxv > 0 && maxv <= 255 &&
          i < n && isWs(b(i))) {
        i += 1 // exactly ONE whitespace byte separates header from pixels
        val pix = w.toLong * h
        if (i + pix * 3 <= n) {
          var sum = 0L
          var peak = 0
          var p = 0L
          var base = i
          while (p < pix) {
            val l = (2126 * u8(base) + 7152 * u8(base + 1) +
              722 * u8(base + 2)) / 10000
            sum += l
            if (l > peak) peak = l
            base += 3
            p += 1
          }
          return Some(RasterStats("ppm", w, h, pix,
            (sum * 1000 + pix / 2) / pix, peak))
        }
      }
      return None
    }
    None
  }

  /** REAL PCM SAMPLE decode for RIFF/WAVE with a 16-bit PCM `fmt ` chunk:
    * walks to the `data` chunk and computes (frames, mean |sample| ×1000
    * normalized to full scale 32768, peak |sample|) over every sample of
    * every channel. None when the format is not s16le PCM or the payload
    * is truncated (the header-only path still reports rate/channels).
    * Never throws.
    */
  def wavPcmStats(b: Array[Byte]): Option[(Long, Long, Int)] = {
    val n = b.length
    @inline def u8(i: Int) = b(i) & 0xff
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (n < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var fmtOk = false
    var blockAlign = 0
    var dataAt = -1L
    var dataLen = 0L
    var i = 12L
    while (i + 8 <= n) {
      val j = i.toInt
      val size = le32(j + 4).toLong
      if (size < 0) return None
      if (b(j) == 'f' && b(j + 1) == 'm' && b(j + 2) == 't' && b(j + 3) == ' ') {
        if (i + 8 + 16 > n || size < 16) return None
        val audioFormat = le16(j + 8)
        val bits = le16(j + 22)
        blockAlign = le16(j + 20)
        fmtOk = audioFormat == 1 && bits == 16 && blockAlign > 0
      } else if (b(j) == 'd' && b(j + 1) == 'a' && b(j + 2) == 't' && b(j + 3) == 'a') {
        dataAt = i + 8
        dataLen = size
      }
      i += 8 + size + (size & 1)
    }
    if (!fmtOk || dataAt < 0 || dataAt + dataLen > n) return None
    val samples = dataLen / 2
    if (samples == 0) return Some((0L, 0L, 0))
    var sumAbs = 0L
    var peak = 0
    var k = dataAt.toInt
    val end = (dataAt + samples * 2).toInt
    while (k + 1 < end) {
      val v = (u8(k) | (u8(k + 1) << 8)).toShort.toInt
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      k += 2
    }
    val frames = dataLen / blockAlign
    val scale = 32768L * samples
    Some((frames, (sumAbs * 1000 + scale / 2) / scale, peak))
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
    val entK = math.round(ent * 1000)
    imageHeader(bytes) match {
      case Some((kind, w, h)) =>
        // compressed image: header fields are real, pixels stay undecoded
        MediaFeatures(url, n, kind, w, h, 0, 0, hist, entK, head,
          0L, 0L, 0, decoded = false)
      case None => rasterPixels(bytes) match {
        case Some(rs) =>
          // uncompressed raster: REAL pixel decode (mean/peak luma)
          MediaFeatures(url, n, rs.kind, rs.width, rs.height, 0, 0, hist,
            entK, head, rs.pixels, rs.meanLumaX1000, rs.peakLuma,
            decoded = true)
        case None => wavHeader(bytes) match {
          case Some((rate, ch)) =>
            // s16le PCM payloads get a REAL sample decode; other codecs
            // stay header-only
            wavPcmStats(bytes) match {
              case Some((frames, mean, peak)) =>
                MediaFeatures(url, n, "wav", 0, 0, rate, ch, hist, entK,
                  head, frames, mean, peak, decoded = true)
              case None =>
                MediaFeatures(url, n, "wav", 0, 0, rate, ch, hist, entK,
                  head, 0L, 0L, 0, decoded = false)
            }
          case None =>
            val kind =
              if (n >= 4 && bytes(0) == '<'.toByte) "markup"
              else if (n == 0) "empty" else "binary"
            // fake dims: deterministic function of length (stand-in for a
            // real pixel decode of the remaining COMPRESSED families)
            MediaFeatures(url, n, kind, (n % 1024) + 1, (n % 768) + 1, 0, 0,
              hist, entK, head, 0L, 0L, 0, decoded = false)
        }
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
