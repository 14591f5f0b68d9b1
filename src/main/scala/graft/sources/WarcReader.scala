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
  * `GZIPInputStream` consumes natively. Two sources: [[pages]] goes through
  * the built-in `binaryFile` source (whole file on heap — fine to ~low
  * hundreds of MB per file); [[pagesStreamed]] opens each file as a Hadoop
  * FS stream, bounding per-task heap by one record — the path for full
  * 1 GB Common Crawl files.
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

  /** Records larger than this are skipped (stream-discarded, never
    * materialized). Real crawl responses are a few MB; a header-declared
    * length beyond this is either garbage or content no extraction
    * pipeline wants in one row.
    */
  final val MaxRecordBytes: Long = 256L * 1024 * 1024

  /** All response records of one WARC payload (plain or gzip). */
  def records(bytes: Array[Byte]): Iterator[WarcPage] =
    records(bytes, Set("response"))

  /** Records of the given WARC-Types ("response" for crawls, "conversion"
    * for WET extracted-text archives).
    */
  def records(bytes: Array[Byte], acceptTypes: Set[String]): Iterator[WarcPage] =
    records(new ByteArrayInputStream(bytes), acceptTypes)

  /** Streaming form: records from any InputStream (gzip sniffed from the
    * magic bytes) — the path for full-size 1 GB Common Crawl files, where
    * per-file heap is bounded by one record, not the archive. The caller
    * owns closing `raw` (see [[pagesStreamed]]).
    */
  def records(raw: InputStream, acceptTypes: Set[String]): Iterator[WarcPage] =
    records(raw, acceptTypes, MaxRecordBytes)

  /** `maxRecordBytes` caps per-record materialization (tests shrink it;
    * production keeps [[MaxRecordBytes]]).
    */
  def records(raw: InputStream, acceptTypes: Set[String],
              maxRecordBytes: Long): Iterator[WarcPage] = {
    // a JVM byte array cannot exceed ~Int.MaxValue: clamp a caller-raised
    // cap so the oversized-skip path (not an allocation) handles anything
    // bigger — new Array[Byte](n.toInt) on a wrapped size would throw a
    // non-IOException that escapes the damaged-archive catch
    val cap = math.min(maxRecordBytes, (Int.MaxValue - 8).toLong)
    val pb = new java.io.PushbackInputStream(raw, 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    if (b0 < 0) return Iterator.empty
    val in: InputStream =
      if (b0 == 0x1F && b1 == 0x8B)
        // a truncated gzip HEADER throws in the constructor — treat as an
        // empty archive, same contract as a truncated record
        try new BufferedInputStream(new GZIPInputStream(pb), 1 << 16)
        catch { case _: java.io.IOException => return Iterator.empty }
      else new BufferedInputStream(pb, 1 << 16)
    new Iterator[WarcPage] {
      private var nextRec: WarcPage = _
      private var done = false
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !done) {
          readRecord(in, acceptTypes, cap) match {
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
  private def readRecord(in: InputStream, acceptTypes: Set[String],
                         maxRecordBytes: Long): Option[Option[WarcPage]] = {
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
      if (len > maxRecordBytes) {
        // oversized/garbage declared length: discard the body from the
        // stream without materializing it; EOF mid-skip = truncation.
        // Logged (once per record, rare by construction) so a legitimate
        // >cap record leaving the corpus is visible in executor logs
        // rather than a silent row drop — raise maxRecordBytes to keep it.
        System.err.println(
          s"[WarcReader] skipping oversized record ($len bytes > cap $maxRecordBytes): ${if (uri == null) "<no uri>" else uri}")
        return if (skipFully(in, len)) Some(None) else None
      }
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

  /** Read exactly `n` bytes, allocating in chunks so a garbage
    * header-declared length never triggers an up-front Array[Byte](n)
    * (an OutOfMemoryError is an Error, not IOException — it would escape
    * readRecord's catch and kill the task, breaking the damaged-archive
    * contract). At most one chunk (8 MiB) is allocated beyond the bytes
    * the stream actually has; null = truncated.
    */
  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    val Chunk = 8 * 1024 * 1024
    if (n > Int.MaxValue - 8) return null // defense: callers clamp already
    if (n <= Chunk) {
      val buf = new Array[Byte](n.toInt)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, (n - off).toInt)
        if (r < 0) return null
        off += r
      }
      buf
    } else {
      val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var remaining = n
      while (remaining > 0) {
        val part = readFully(in, math.min(remaining, Chunk.toLong))
        if (part == null) return null
        parts += part
        remaining -= part.length
      }
      val out = new Array[Byte](n.toInt)
      var off = 0
      parts.foreach { p => System.arraycopy(p, 0, out, off, p.length); off += p.length }
      out
    }
  }

  /** Discard exactly `n` bytes; false = EOF before `n` (truncation). */
  private def skipFully(in: InputStream, n: Long): Boolean = {
    var remaining = n
    val sink = new Array[Byte](1 << 16)
    while (remaining > 0) {
      // read, not skip: skip() on a BufferedInputStream over gzip may
      // return 0 without progress guarantees near EOF
      val r = in.read(sink, 0, math.min(remaining, sink.length.toLong).toInt)
      if (r < 0) return false
      remaining -= r
    }
    true
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

  /** WARC directory → pages DataFrame (BASELINE.json input schema). THE
    * default path: delegates to [[pagesStreamed]], whose per-task heap is
    * bounded by one record rather than one file — the name a user reaches
    * for first must be the one that survives 1 GB Common Crawl archives
    * (round-3 verdict). The whole-file variant remains available,
    * explicitly named, as [[pagesMaterialized]].
    */
  def pages(spark: SparkSession, path: String): DataFrame =
    pagesStreamed(spark, path)

  /** Whole-file fallback: the built-in `binaryFile` source — one file per
    * row/task, then records parsed from the in-memory bytes. Whole-file
    * bytes live on the heap per task, so this is ONLY for small fixtures
    * or debugging; [[pages]]/[[pagesStreamed]] is the production path.
    */
  def pagesMaterialized(spark: SparkSession, path: String): DataFrame = {
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

  /** Streaming WARC directory source: same rows as [[pages]], but each task
    * opens its file through the Hadoop FS API (`FileSystem.open`) and feeds
    * the record parser an InputStream — per-task heap is bounded by ONE
    * record (≤ [[MaxRecordBytes]]), not the file, so 1 GB Common Crawl
    * archives run with the same memory as 1 MB test fixtures. File-level
    * parallelism is preserved (one file = one partition element); works on
    * any Hadoop-supported FS (local, HDFS, S3A) since both listing and open
    * go through the scheme's FileSystem.
    */
  def pagesStreamed(spark: SparkSession, path: String): DataFrame =
    streamed(spark, path, Set("response"))
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))

  /** WET directory → (url, warc_ts, text): Common Crawl's extracted-text
    * distribution read BACK as a table, closing the format round-trip with
    * [[WetWriter]] (whose `conversion` records carry text/plain payloads).
    * Same record-streamed, heap-bounded path as [[pagesStreamed]].
    */
  def wetExtracted(spark: SparkSession, path: String): DataFrame =
    streamed(spark, path, Set("conversion"))
      .select(col("url"), col("warc_ts"),
        org.apache.spark.sql.functions.decode(col("html"), "UTF-8").as("text"))

  private def streamed(spark: SparkSession, path: String,
                       acceptTypes: Set[String]): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new HPath(path)
    val fs = root.getFileSystem(hconf.value)
    val files: Seq[String] = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        // same visibility rules as pages()'s Spark file index: dot/underscore
        // prefixed names are temp/sidecar files (.tmp renames, .crc
        // checksums, _SUCCESS), not data
        if (st.isFile && name.contains(".warc") &&
            !name.startsWith(".") && !name.startsWith("_"))
          b += st.getPath.toString
      }
      b.result().sorted // deterministic partition → file assignment
    }
    val par = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files)
      .repartition(par)
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val hp = new HPath(p)
          val in: InputStream = hp.getFileSystem(hconf.value).open(hp)
          // close at exhaustion; task-completion listener covers early
          // termination (limit/take) and task failure
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => }
          }
          val base = records(in, acceptTypes)
          new Iterator[WarcPage] {
            override def hasNext: Boolean = {
              val h = base.hasNext
              if (!h) { try in.close() catch { case _: java.io.IOException => } }
              h
            }
            override def next(): WarcPage = base.next()
          }
        }
      }
      .toDF()
  }
}
