package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One row of the Common-Crawl-style pages table — schema is authoritative
  * per BASELINE.json:15 / FIXTURES.md §1:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic pages source (SURVEY.md §2.B.a) — no external
  * data, no wall-clock, no Math.random: every byte derives from the row id
  * through a splitmix-style mixer, so any two runs (and any two partitionings)
  * generate identical tables.
  *
  * Size distribution is intentionally skewed: most pages are a few KB, every
  * [[PagesSynth.GiantEvery]]-th page is a multi-hundred-KB giant (E-05), so
  * the skew-handling path (url-hash repartition) is actually exercised.
  */
object PagesSynth {

  final val GiantEvery = 211L // ids divisible by this yield giant pages

  private val words = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "parser", "stream", "token", "node", "array", "spark", "scala",
    "content", "extraction", "pipeline", "partition", "shuffle",
    "density", "heuristic", "boilerplate", "corpus", "document",
    "crawl", "archive", "capture", "snapshot", "byte", "offset",
    "window", "watermark", "entity", "attribute", "element")

  private val cjkWords = Array("解析", "网页", "数据", "提取", "分布式", "引擎")

  private val langs = Array("en", "en", "en", "en", "en", "en", "en", "en",
    "de", "fr", "zh", "es") // ~2/3 en

  /** splitmix64 — deterministic per-id stream. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Stateless PRNG keyed on (id, counter). */
  private final class Rng(id: Long) {
    private var c = 0L
    def next(): Long = { c += 1; mix(id * 0x100000001B3L + c) }
    def nextInt(bound: Int): Int = (Math.floorMod(next(), bound.toLong)).toInt
  }

  def lang(id: Long): String = langs(Math.floorMod(mix(id ^ 0x5EED), langs.length.toLong).toInt)

  /** Deterministic page HTML: head (title/style/script), header+nav links,
    * an article with paragraphs (inline markup, entities, comments, the odd
    * CDATA), an inline script, and a link-heavy footer — so the extractor's
    * tag-blacklist AND link-density paths both run on every page.
    */
  def htmlFor(id: Long): String = {
    val r = new Rng(id)
    val isGiant = id % GiantEvery == 0L
    val nParas = if (isGiant) 600 + r.nextInt(300) else 2 + r.nextInt(12)
    val isZh = lang(id) == "zh"
    val sb = new java.lang.StringBuilder(if (isGiant) 400000 else 8192)

    def word(): String =
      if (isZh && r.nextInt(3) == 0) cjkWords(r.nextInt(cjkWords.length))
      else words(r.nextInt(words.length))

    def sentence(nw: Int): Unit = {
      var i = 0
      while (i < nw) {
        if (i > 0) sb.append(' ')
        sb.append(word())
        i += 1
      }
      sb.append(". ")
    }

    sb.append("<!DOCTYPE html>\n<html><head><title>Page ").append(id)
      .append("</title>\n<style>body{margin:0;padding:0}.x").append(id % 97)
      .append("{color:#333}</style>\n<script src=\"/static/app.js\"></script></head>\n<body>\n")
    sb.append("<header><a href=\"/\">Home</a> | <a href=\"/about\">About</a></header>\n")
    sb.append("<nav><ul>")
    var i = 0
    val nNav = 3 + r.nextInt(6)
    while (i < nNav) {
      sb.append("<li><a href=\"/cat/").append(r.nextInt(50)).append("\">")
        .append(word()).append("</a></li>")
      i += 1
    }
    sb.append("</ul></nav>\n<article>\n<h1>")
    sentence(3 + r.nextInt(5))
    sb.append("</h1>\n")
    var p = 0
    while (p < nParas) {
      sb.append("<p>")
      val nSent = 1 + r.nextInt(4)
      var s = 0
      while (s < nSent) {
        sentence(5 + r.nextInt(12))
        r.nextInt(10) match {
          case 0 => sb.append("<b>").append(word()).append("</b> ")
          case 1 => sb.append("<i>").append(word()).append("</i> ")
          case 2 => sb.append("&amp; ").append(word()).append(" &lt;").append(r.nextInt(100)).append("&gt; ")
          case 3 => sb.append("<a href=\"/ref/").append(r.nextInt(999)).append("\">").append(word()).append("</a> ")
          case _ =>
        }
        s += 1
      }
      sb.append("</p>\n")
      if (r.nextInt(7) == 0) sb.append("<!-- ad slot ").append(r.nextInt(10)).append(" -->\n")
      if (r.nextInt(23) == 0)
        sb.append("<script>track(").append(id).append(',').append(p).append(");</script>\n")
      if (r.nextInt(41) == 0)
        sb.append("<![CDATA[raw ").append(r.nextInt(100)).append(" block]]>\n")
      p += 1
    }
    sb.append("</article>\n<footer><ul>")
    i = 0
    val nFoot = 4 + r.nextInt(5)
    while (i < nFoot) {
      sb.append("<li><a href=\"/f/").append(r.nextInt(30)).append("\">")
        .append(word()).append("</a></li>")
      i += 1
    }
    sb.append("</ul><p>&copy; corpus ").append(2000 + (id % 26)).append("</p></footer>\n</body></html>\n")
    sb.toString
  }

  /** Fixed epoch (2024-01-01T00:00:00Z) + id seconds — no wall clock. */
  def tsFor(id: Long): Timestamp = new Timestamp(1704067200000L + id * 1000L)

  def urlFor(id: Long): String = {
    val host = Math.floorMod(mix(id ^ 0xD0C5L), 500L)
    s"https://site$host.example.org/page/$id"
  }

  def pageFor(id: Long): Page =
    Page(urlFor(id), tsFor(id), htmlFor(id).getBytes(UTF_8), "", lang(id))

  /** Distributed deterministic generation: `spark.range` gives each task a
    * disjoint id range; every page derives from its id alone, so the table
    * is identical at any parallelism (the basis of the parallelism-invariance
    * test, FIXTURES.md E-06).
    */
  def pages(spark: SparkSession, n: Long, numSlices: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val rng = if (numSlices > 0) spark.range(0L, n, 1L, numSlices) else spark.range(n)
    rng.as[Long].mapPartitions(_.map(pageFor))
  }

  def pagesDF(spark: SparkSession, n: Long): DataFrame = pages(spark, n).toDF()

  // ---- structured-data variant (schema.org JSON-LD planted in the head) ----

  private val ldTypes =
    Array("Article", "Product", "NewsArticle", "Event", "FAQPage")

  /** The JSON-LD payloads planted into page `id`'s head, in document order.
    * Coverage by construction: id%3==2 → none (absence path), id%7==0 → a
    * second block (multi-block path), id%11==3 → the first block truncated
    * mid-value (malformed-JSON path, parser must yield nulls, not throw).
    */
  def jsonldPayloads(id: Long): Seq[String] =
    if (id % 3 == 2) Seq.empty
    else {
      val t = ldTypes((id % 5).toInt)
      val whole =
        s"""{"@context":"https://schema.org","@type":"$t","name":"Entity $id","position":${id % 97}}"""
      val first = if (id % 11 == 3) whole.dropRight(2) else whole
      val extra =
        if (id % 7 == 0) Seq(s"""{"@type":"BreadcrumbList","name":"Trail $id"}""")
        else Seq.empty
      first +: extra
    }

  /** Expected extraction truth for page `id`: (block count, first block's
    * @type, first block's name) — nulls when absent or malformed.
    */
  def jsonldTruth(id: Long): (Int, String, String) = {
    val ps = jsonldPayloads(id)
    if (ps.isEmpty) (0, null, null)
    else if (id % 11 == 3) (ps.length, null, null)
    else (ps.length, ldTypes((id % 5).toInt), s"Entity $id")
  }

  /** [[htmlFor]] with the planted JSON-LD blocks inserted before `</head>`
    * — everything else byte-identical to the plain page, so the structured
    * corpus exercises the full scanner surface too.
    */
  def structuredHtmlFor(id: Long): String = {
    val blocks = jsonldPayloads(id).map(p =>
      s"""<script type="application/ld+json">$p</script>""").mkString
    val base = htmlFor(id)
    val at = base.indexOf("</head>")
    base.substring(0, at) + blocks + base.substring(at)
  }

  def structuredPages(spark: SparkSession, n: Long): Dataset[Page] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions(_.map(id =>
      Page(urlFor(id), tsFor(id), structuredHtmlFor(id).getBytes(UTF_8),
        "", lang(id))))
  }

  def structuredPagesDF(spark: SparkSession, n: Long): DataFrame =
    structuredPages(spark, n).toDF()
}
