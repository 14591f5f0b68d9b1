package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.sql.Timestamp
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal WARC/1.0 reader (public spec ISO 28500 — the container format of
  * Common Crawl): turns `.warc` / `.warc.gz` files into the engine's pages
  * schema `(url, warc_ts, html, text, lang)` so crawl archives feed the
  * extraction pipeline directly, without a pre-conversion step.
  *
  * Scale model: one WARC file = one Spark task (Common Crawl ships ~1 GB
  * files by the tens of thousands — file-level parallelism IS the
  * partitioning; the url-hash repartition inside [[graft.pipeline]] then
  * redistributes rows). `.gz` inputs are member-concatenated gzip, which
  * `GZIPInputStream` consumes natively. NOTE: [[pages]] goes through the
  * built-in `binaryFile` source, which materializes each file's bytes in
  * memory before [[records]] streams them record-by-record — fine to ~low
  * hundreds of MB per file; for full 1 GB Common Crawl files, call
  * [[records]] against a real InputStream-backed source (the record parser
  * is already streaming) or split archives.
  *
  * Only `WARC-Type: response` records with an http/https target URI become
  * rows. The HTTP response envelope (status line + headers) is stripped;
  * the body bytes are the `html` column. Truncated/garbage trailing bytes
  * end the file silently (crawl archives do get truncated) — never an
  * exception past the last whole record.
  */
object WarcReader {

  final case class WarcPage(url: String, warc_ts: Timestamp, html: Array[Byte],
                            text: String, lang: String)

  /** All response records of one WARC payload (plain or gzip). */
  def records(bytes: Array[Byte]): Iterator[WarcPage] =
    records(bytes, Set("response"))

  /** Records of the given WARC-Types ("response" for crawls, "conversion"
    * for WET extracted-text archives).
    */
  def records(bytes: Array[Byte], acceptTypes: Set[String]): Iterator[WarcPage] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
        // a truncated gzip HEADER throws in the constructor — treat as an
        // empty archive, same contract as a truncated record
        try new BufferedInputStream(new GZIPInputStream(raw), 1 << 16)
        catch { case _: java.io.IOException => return Iterator.empty }
      else new BufferedInputStream(raw, 1 << 16)
    new Iterator[WarcPage] {
      private var nextRec: WarcPage = _
      private var done = false
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !done) {
          readRecord(in, acceptTypes) match {
            case None => done = true
            case Some(p) => nextRec = p.orNull
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcPage = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** One record: None = clean EOF/truncation (stop); Some(None) = a whole
    * record that is not an http(s) response (skip); Some(Some(page)) = row.
    */
  private def readRecord(in: InputStream,
                         acceptTypes: Set[String]): Option[Option[WarcPage]] = {
    try {
      // skip blank lines between records
      var line = readLine(in)
      while (line != null && line.isEmpty) line = readLine(in)
      if (line == null || !line.startsWith("WARC/")) return None
      // headers until blank line
      var warcType = ""
      var uri = ""
      var date = ""
      var len = -1L
      var h = readLine(in)
      while (h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        if (i > 0) {
          val k = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
          val v = h.substring(i + 1).trim
          k match {
            case "warc-type" => warcType = v.toLowerCase(java.util.Locale.ROOT)
            case "warc-target-uri" => uri = stripAngles(v)
            case "warc-date" => date = v
            case "content-length" =>
              len = try v.toLong catch { case _: NumberFormatException => -1L }
            case _ =>
          }
        }
        h = readLine(in)
      }
      if (h == null || len < 0) return None // truncated header block
      val body = readFully(in, len)
      if (body == null) return None // truncated body
      if (!acceptTypes.contains(warcType) ||
          !(uri.startsWith("http://") || uri.startsWith("https://")))
        return Some(None)
      val html =
        if (warcType == "response") stripHttpEnvelope(body)
        else body // conversion (WET) records carry the bare text payload
      val ts = parseTs(date)
      Some(Some(WarcPage(uri, ts, html, null, null)))
    } catch {
      // ZipException (corrupt DEFLATE data / member trailer), EOFException,
      // any other stream fault: stop at the last whole record, never fail
      // the task over a damaged archive
      case _: java.io.IOException => None
    }
  }

  /** CRLF/LF line as UTF-8 (the WARC header charset — a non-ASCII
    * WARC-Target-URI must round-trip exactly against [[WetWriter]]);
    * null at EOF.
    */
  private def readLine(in: InputStream): String = {
    val sb = new java.io.ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.write(c)
      c = in.read()
    }
    new String(sb.toByteArray, UTF_8)
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    if (n > Int.MaxValue - 8) return null
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, (n - off).toInt)
      if (r < 0) return null
      off += r
    }
    buf
  }

  private def stripAngles(s: String): String =
    if (s.length >= 2 && s.charAt(0) == '<' && s.charAt(s.length - 1) == '>')
      s.substring(1, s.length - 1)
    else s

  /** Drop an HTTP response envelope (status line + headers + CRLFCRLF) if
    * present; raw-body records pass through unchanged.
    */
  private[sources] def stripHttpEnvelope(body: Array[Byte]): Array[Byte] = {
    if (body.length < 5) return body
    val head = new String(body, 0, math.min(5, body.length), ISO_8859_1)
    if (!head.startsWith("HTTP/")) return body
    var i = 0
    val n = body.length
    while (i + 1 < n) {
      // CRLFCRLF (conformant) or bare LFLF (real crawls capture those too)
      if (i + 3 < n && body(i) == '\r' && body(i + 1) == '\n' &&
          body(i + 2) == '\r' && body(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(body, i + 4, n)
      if (body(i) == '\n' && body(i + 1) == '\n')
        return java.util.Arrays.copyOfRange(body, i + 2, n)
      i += 1
    }
    body // no header terminator: treat whole payload as body
  }

  private def parseTs(iso: String): Timestamp =
    try Timestamp.from(java.time.Instant.parse(iso))
    catch { case _: Exception => new Timestamp(0L) }

  /** WARC directory → pages DataFrame (BASELINE.json input schema). Uses the
    * built-in `binaryFile` source: one file per row/task — Common Crawl's
    * natural parallelism unit — then streams records per file.
    */
  def pages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(records))
      .toDF()
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
  }
}
