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
      histogram: Array[Int],
      entropy_x1000: Long,
      head_hex: String)

  /** Deterministic fake decode. A real deployment swaps ONLY this function
    * for a codec call; schema, batching and partitioning stay identical.
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
    val kind =
      if (n >= 4 && bytes(0) == '<'.toByte) "markup"
      else if (n == 0) "empty" else "binary"
    // fake dims: deterministic function of length (stand-in for a real
    // image header parse)
    MediaFeatures(url, n, kind, (n % 1024) + 1, (n % 768) + 1, hist,
      math.round(ent * 1000), head)
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
