package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{CharsetSniffer, Extractor}

final case class SpanRow(start: Int, end: Int)

/** Output schema — FIXTURES.md §2 `extracted`. `html_hash` is the 64-bit
  * xxhash of the RAW input html bytes (seed 42, identical to Spark's
  * `xxhash64` column function — property-pinned in PipelineSpec): the
  * change-detection key that lets a later incremental re-crawl decide
  * unchanged/changed per url WITHOUT re-extracting
  * ([[IncrementalExtract]]).
  */
final case class ExtractedRow(
    url: String,
    text: String,
    text_sha: String,
    spans: Array[SpanRow],
    node_count: Int,
    html_hash: Long,
    part_id: Int)

/** Narrow projection carried into the typed map — never deserializes the
  * pre-existing `text`/`lang` columns (SURVEY.md §2.B.b: column pruning
  * reaches the parquet scan because we select before the map).
  */
final case class PageSlice(url: String, html: Array[Byte], part_id: Int)

/** The tokenize → node-array → boilerplate-strip → extract core as a typed
  * Dataset transformation (SURVEY.md §3.4). Declarative outer pipeline
  * (select/filter/repartition — all Catalyst-planned); the per-document parse
  * is a `mapPartitions` over the narrow projection, mirroring the reference's
  * single-pass, zero-copy ethos [R: HtmlParser.cpp · parseHtml].
  */
object ExtractPipeline {

  /** url-hash partition id — the explicit skew-defusing shuffle key
    * (north_rule: "explicit salting/repartition on url-hash"). pmod of
    * xxhash64 spreads giant pages independently of their Iceberg/source
    * partition, so one hot source partition cannot pin a straggler task.
    */
  def withPartId(pages: DataFrame, numParts: Int): DataFrame =
    pages.withColumn("part_id",
      pmod(xxhash64(col("url")), lit(numParts.toLong)).cast("int"))

  private val shaDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }
  private final val HexChars = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val d = shaDigest.get()
    d.reset()
    val h = d.digest(s.getBytes(UTF_8))
    val out = new Array[Char](h.length * 2)
    var i = 0
    while (i < h.length) {
      out(2 * i) = HexChars((h(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 64-bit content hash of raw html bytes — MUST equal Spark's
    * `xxhash64(col)` (same algorithm, seed 42) so a committed run's
    * `html_hash` column is directly comparable against a later crawl's
    * column-computed hashes without deserializing either side's blobs.
    * Hashed on the RAW bytes even under the transcode opt-in: change
    * detection keys on what the crawler fetched.
    */
  def htmlHash(raw: Array[Byte]): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      raw, org.apache.spark.sql.types.BinaryType, 42L)

  def extractOne(p: PageSlice): ExtractedRow =
    extractOne(p, Extractor.DefaultConfig, transcodeNonUtf8 = false)

  /** `extractCfg` tunes the boilerplate-strip policy (tag sets, link gate,
    * entity set); `transcodeNonUtf8` opt-in runs [[CharsetSniffer.toUtf8]]
    * first — NOTE: span offsets then index the TRANSCODED bytes, not the
    * raw crawl bytes (the pinned default keeps raw-byte offsets).
    */
  def extractOne(p: PageSlice, extractCfg: Extractor.ExtractConfig,
                 transcodeNonUtf8: Boolean): ExtractedRow = {
    // null html (allowed by the schema) → empty extraction, never an NPE
    val raw = if (p.html == null) Array.emptyByteArray else p.html
    val bytes = if (transcodeNonUtf8) CharsetSniffer.toUtf8(raw) else raw
    val r = Extractor.extractBytes(bytes, extractCfg)
    ExtractedRow(p.url, r.text, sha256Hex(r.text),
      r.spans.map(s => SpanRow(s.start, s.end)), r.nodeCount,
      htmlHash(raw), p.part_id)
  }

  /** Full transform: prune columns → assign part_id → spread rows evenly by
    * url within the requested parallelism → parse+extract. `repartitionSlices`
    * <= 0 skips the explicit exchange (callers that already partitioned).
    */
  def extractDS(pages: DataFrame, numParts: Int,
                repartitionSlices: Int = 0,
                extractCfg: Extractor.ExtractConfig = Extractor.DefaultConfig,
                transcodeNonUtf8: Boolean = false): Dataset[ExtractedRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // NOTE: no isNotNull filter here — a Filter between Project and
    // SerializeFromObject defeats ObjectSerializerPruning on object sources
    // (warc_ts/text/lang would be serialized just to be dropped). Null html
    // is handled inside extractOne instead; the batch job additionally
    // filters nulls at the parquet scan where the predicate pushes down.
    val sliced = withPartId(pages.select(col("url"), col("html")), numParts)
    val spread =
      if (repartitionSlices > 0) sliced.repartition(repartitionSlices, col("url"))
      else sliced
    spread.as[PageSlice]
      .mapPartitions(_.map(extractOne(_, extractCfg, transcodeNonUtf8)))
  }

  def extractDF(pages: DataFrame, numParts: Int,
                repartitionSlices: Int = 0,
                extractCfg: Extractor.ExtractConfig = Extractor.DefaultConfig,
                transcodeNonUtf8: Boolean = false): DataFrame =
    extractDS(pages, numParts, repartitionSlices, extractCfg, transcodeNonUtf8).toDF()
}
