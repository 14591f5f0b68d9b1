package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** WARC reader: spec-shaped synthetic archives (warcinfo + request +
  * response records, HTTP envelopes, gzip member-per-record variant,
  * truncation) round-trip into the pages schema and feed the pipeline.
  */
class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def record(wtype: String, uri: String, date: String,
                     payload: Array[Byte]): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Date: $date\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8)
    hdr ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpResponse(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html).getBytes(UTF_8)

  private def archive(n: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record("warcinfo", null, "2024-01-01T00:00:00Z",
      "software: test\r\n".getBytes(UTF_8)))
    (0 until n).foreach { i =>
      out.write(record("request", s"http://ex.com/p$i", "2024-01-01T00:00:00Z",
        "GET /p HTTP/1.1\r\n\r\n".getBytes(UTF_8)))
      out.write(record("response", s"http://ex.com/p$i",
        f"2024-01-01T00:${i % 60}%02d:00Z",
        httpResponse(s"<html><body><p>page $i body words</p></body></html>")))
    }
    out.toByteArray
  }

  test("plain archive: only http response records become pages; envelope stripped") {
    val pages = WarcReader.records(archive(5)).toSeq
    assert(pages.length === 5)
    assert(pages.map(_.url) === (0 until 5).map(i => s"http://ex.com/p$i"))
    assert(new String(pages.head.html, UTF_8)
      === "<html><body><p>page 0 body words</p></body></html>")
    assert(pages(1).warc_ts.toInstant.toString === "2024-01-01T00:01:00Z")
  }

  test("gzip member-per-record archive parses identically") {
    // build one gzip member per record (the Common Crawl layout)
    val out = new ByteArrayOutputStream()
    def gz(b: Array[Byte]): Unit = {
      val g = new GZIPOutputStream(out); g.write(b); g.finish()
    }
    gz(record("warcinfo", null, "2024-01-01T00:00:00Z",
      "software: test\r\n".getBytes(UTF_8)))
    (0 until 3).foreach { i =>
      gz(record("response", s"https://ex.com/g$i", "2024-01-02T00:00:00Z",
        httpResponse(s"<p>gz page $i</p>")))
    }
    val pages = WarcReader.records(out.toByteArray).toSeq
    assert(pages.map(_.url) === (0 until 3).map(i => s"https://ex.com/g$i"))
    assert(new String(pages(2).html, UTF_8) === "<p>gz page 2</p>")
  }

  test("truncated and garbage archives never throw; yield whole records only") {
    val full = archive(3)
    // cut mid-body of the last record
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 30)
    val pages = WarcReader.records(cut).toSeq
    assert(pages.length >= 1 && pages.length <= 3)
    assert(WarcReader.records("not a warc at all".getBytes(UTF_8)).isEmpty)
    assert(WarcReader.records(Array.emptyByteArray).isEmpty)
    val rnd = new scala.util.Random(5)
    (0 until 50).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(b)
      WarcReader.records(b).size // must not throw
    }
  }

  test("corrupt gzip yields records up to the damage, never throws") {
    val out = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(out)
    g.write(archive(3)); g.finish()
    val gz = out.toByteArray
    // flip a byte inside the DEFLATE stream (past the 10-byte header)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x55).toByte
    WarcReader.records(gz).size // must not throw
    // truncated gzip header: empty, no throw
    assert(WarcReader.records(Array[Byte](0x1F.toByte, 0x8B.toByte)).isEmpty)
    assert(WarcReader.records(java.util.Arrays.copyOf(gz, 5)).isEmpty)
  }

  test("LF-only HTTP envelope is stripped; UTF-8 target URI round-trips") {
    val lfBody = "HTTP/1.1 200 OK\nContent-Type: text/html\n\n<p>lf page</p>"
      .getBytes(UTF_8)
    val uri = "http://ex.com/café/中文"
    val rec1 = record("response", uri, "2024-01-01T00:00:00Z", lfBody)
    val pages = WarcReader.records(rec1).toSeq
    assert(pages.head.url === uri, "non-ASCII URI must survive header decode")
    assert(new String(pages.head.html, UTF_8) === "<p>lf page</p>")
    // WET round-trip of a non-ASCII URI
    val wet = WetWriter.recordBytes(uri, "text body", "2024-01-01T00:00:00Z")
    val back = WarcReader.records(wet, Set("conversion")).toSeq
    assert(back.head.url === uri)
    assert(new String(back.head.html, UTF_8) === "text body")
  }

  test("raw-body response (no HTTP envelope) passes through unchanged") {
    val raw = record("response", "http://ex.com/raw", "2024-01-01T00:00:00Z",
      "<p>no envelope</p>".getBytes(UTF_8))
    val pages = WarcReader.records(raw).toSeq
    assert(new String(pages.head.html, UTF_8) === "<p>no envelope</p>")
  }

  test("WET writer round-trips: extract → .warc.wet.gz → WarcReader conversion records") {
    val dir = Files.createTempDirectory("wet").toString
    val pages = PagesSynth.pagesDF(spark, 40L)
    val extracted = graft.pipeline.ExtractPipeline.extractDS(pages, numParts = 4)
    WetWriter.write(extracted, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz"))
    assert(files.nonEmpty)
    val got = files.flatMap(f =>
        WarcReader.records(Files.readAllBytes(f.toPath), Set("conversion")))
      .map(p => p.url -> new String(p.html, UTF_8)).toMap
    val want = extracted.collect().map(r => r.url -> r.text).toMap
    assert(got === want, "WET round-trip must preserve every url's exact text")
    // …and through the DISTRIBUTED reader: the wetExtracted table equals
    // the same map (url, text), closing the format loop as a Spark source
    val table = WarcReader.wetExtracted(spark, dir)
    assert(table.columns.toSeq === Seq("url", "warc_ts", "text"))
    val viaTable = table.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(viaTable === want, "distributed WET source must match the writer")
  }

  test("oversized declared length: record skipped by streaming discard, rest still read") {
    val out = new ByteArrayOutputStream()
    out.write(record("response", "http://ex.com/small1", "2024-01-01T00:00:00Z",
      httpResponse("<p>one</p>")))
    out.write(record("response", "http://ex.com/big", "2024-01-01T00:00:00Z",
      httpResponse("x" * 5000))) // > test cap below
    out.write(record("response", "http://ex.com/small2", "2024-01-01T00:00:00Z",
      httpResponse("<p>two</p>")))
    val pages = WarcReader.records(
      new java.io.ByteArrayInputStream(out.toByteArray),
      Set("response"), maxRecordBytes = 1000L).toSeq
    assert(pages.map(_.url) === Seq("http://ex.com/small1", "http://ex.com/small2"),
      "oversized record must be skipped without breaking framing")
  }

  test("garbage huge Content-Length with few bytes left: no allocation blow-up, no throw") {
    val out = new ByteArrayOutputStream()
    out.write(record("response", "http://ex.com/ok", "2024-01-01T00:00:00Z",
      httpResponse("<p>ok</p>")))
    // header declares ~2 GB; the archive ends after 10 bytes of body
    out.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://ex.com/corrupt\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      "Content-Length: 2000000000\r\n\r\nten bytes.").getBytes(UTF_8))
    val pages = WarcReader.records(out.toByteArray).toSeq
    assert(pages.map(_.url) === Seq("http://ex.com/ok"),
      "parser must stop at the truncated record without materializing 2 GB")
    // same but declared length under the cap: chunked read hits EOF, no throw
    val out2 = new ByteArrayOutputStream()
    out2.write(record("response", "http://ex.com/ok2", "2024-01-01T00:00:00Z",
      httpResponse("<p>ok</p>")))
    out2.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://ex.com/t\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n" +
      "Content-Length: 20000000\r\n\r\nshort").getBytes(UTF_8))
    assert(WarcReader.records(out2.toByteArray).toSeq.map(_.url)
      === Seq("http://ex.com/ok2"))
  }

  test("WET header values: CR/LF in url percent-encoded; framing of later records intact") {
    val evil = "http://ex.com/a\r\nWARC-Type: injected\r\nX: b"
    val wet = WetWriter.recordBytes(evil, "body one", "2024-01-01T00:00:00Z") ++
      WetWriter.recordBytes("http://ex.com/clean", "body two", "2024-01-01T00:00:00Z")
    val back = WarcReader.records(wet, Set("conversion")).toSeq
    assert(back.length === 2, "injected newline must not corrupt record framing")
    assert(back.head.url === "http://ex.com/a%0D%0AWARC-Type: injected%0D%0AX: b")
    assert(new String(back.head.html, UTF_8) === "body one")
    assert(back(1).url === "http://ex.com/clean")
    // a clean url is untouched
    assert(WetWriter.sanitizeHeaderValue("http://ex.com/café?q=1")
      === "http://ex.com/café?q=1")
  }

  test("streamed pages source matches byte-materialized source exactly") {
    val dir = Files.createTempDirectory("warcstream")
    Files.write(dir.resolve("a.warc"), archive(6))
    val out = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(out)
    g.write(record("response", "http://ex.com/s", "2024-01-03T00:00:00Z",
      httpResponse("<body><p>streamed gz page</p></body>")))
    g.finish()
    Files.write(dir.resolve("b.warc.gz"), out.toByteArray)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("url"), col("warc_ts").cast("string"),
          sha2(col("html"), 256))
        .collect().map(_.toSeq).sortBy(_.head.toString)
    val a = rows(WarcReader.pagesMaterialized(spark, dir.toString))
    val b = rows(WarcReader.pagesStreamed(spark, dir.toString))
    assert(a.nonEmpty && (a.toSeq === b.toSeq),
      "streamed and materialized sources must produce identical rows")
  }

  test("Hadoop-FS WET write branch round-trips and leaves no tmp files") {
    val dir = Files.createTempDirectory("wethadoop").toString
    val pages = PagesSynth.pagesDF(spark, 30L)
    val extracted = graft.pipeline.ExtractPipeline.extractDS(pages, numParts = 4)
    WetWriter.write(extracted, dir, "1970-01-01T00:00:00Z", useHadoop = true)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.exists(_.endsWith(".warc.wet.gz")))
    assert(!names.exists(_.contains(".tmp")), s"tmp leftovers: ${names.mkString(",")}")
    val got = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz"))
      .flatMap(f => WarcReader.records(Files.readAllBytes(f.toPath), Set("conversion")))
      .map(p => p.url -> new String(p.html, UTF_8)).toMap
    val want = extracted.collect().map(r => r.url -> r.text).toMap
    assert(got === want)
  }

  test("caller-raised cap beyond Int.MaxValue: huge declared length skips, never throws") {
    val out = new ByteArrayOutputStream()
    out.write(record("response", "http://ex.com/ok", "2024-01-01T00:00:00Z",
      httpResponse("<p>ok</p>")))
    out.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://ex.com/huge\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      "Content-Length: 5000000000\r\n\r\nfew bytes").getBytes(UTF_8))
    val pages = WarcReader.records(
      new java.io.ByteArrayInputStream(out.toByteArray),
      Set("response"), maxRecordBytes = Long.MaxValue).toSeq
    assert(pages.map(_.url) === Seq("http://ex.com/ok"),
      "5 GB declared length must hit the skip path, not Array[Byte]((5e9).toInt)")
  }

  test("streamed source ignores dot/underscore temp and sidecar files like pages() does") {
    val dir = Files.createTempDirectory("warchidden")
    Files.write(dir.resolve("a.warc"), archive(3))
    // half-written tmp, checksum sidecar, marker — all contain '.warc'
    Files.write(dir.resolve(".part-00001-7.warc.wet.gz.tmp"),
      java.util.Arrays.copyOf(archive(2), 40))
    Files.write(dir.resolve(".a.warc.crc"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("_tmp.warc"), archive(1))
    val streamed = WarcReader.pagesStreamed(spark, dir.toString)
      .select(col("url")).collect().map(_.getString(0)).sorted
    val materialized = WarcReader.pagesMaterialized(spark, dir.toString)
      .select(col("url")).collect().map(_.getString(0)).sorted
    assert(streamed.toSeq === materialized.toSeq)
    assert(streamed.length === 3)
  }

  test("Hadoop WET commit never deletes an existing committed file (first rename wins)") {
    val dir = Files.createTempDirectory("wetrace").toString
    val pages = PagesSynth.pagesDF(spark, 20L)
    val extracted = graft.pipeline.ExtractPipeline.extractDS(pages, numParts = 2)
    WetWriter.write(extracted, dir, "1970-01-01T00:00:00Z", useHadoop = true)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz")).sortBy(_.getName)
    val before = files.map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    // re-run over the committed dir: dst files must survive byte-identical
    // (first-wins semantics) and no tmp litter
    WetWriter.write(extracted, dir, "1970-01-01T00:00:00Z", useHadoop = true)
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz"))
      .map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    assert(after === before, "committed WET files must be untouched by a re-run")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.contains(".tmp")))
  }

  test("WARC writer round-trips: synth pages → .warc.gz → WarcReader, byte-exact html") {
    val dir = Files.createTempDirectory("warcw").toString
    val pages = PagesSynth.pagesDF(spark, 50).repartition(4)
    WarcWriter.write(pages, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(files.length === 4)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.contains(".tmp")))
    val back = WarcReader.pages(spark, dir)
      .selectExpr("url", "unix_seconds(warc_ts) AS ts", "md5(html) AS h")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val orig = pages
      .selectExpr("url", "unix_seconds(warc_ts) AS ts", "md5(html) AS h")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(back === orig)
  }

  test("WARC writer: one gzip member per record — a member-truncated file still yields whole records") {
    val dir = Files.createTempDirectory("warcm").toString
    WarcWriter.write(PagesSynth.pagesDF(spark, 6).coalesce(1), dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val bytes = Files.readAllBytes(f.toPath)
    // our members start with the deterministic 8-byte java.util.zip header
    val magic = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0)
    val starts = bytes.indices.filter(i => i + 8 <= bytes.length &&
      magic.indices.forall(j => bytes(i + j) == magic(j)))
    assert(starts.length === 6, "expected one gzip member per record")
    // cut mid-3rd-member: the first two records must still parse cleanly
    val cut = bytes.take(starts(2) + 5)
    val recs = WarcReader.records(
      new java.io.ByteArrayInputStream(cut), Set("response")).toList
    assert(recs.length === 2)
    // deterministic re-run: identical bytes (first-rename-wins is safe)
    val dir2 = Files.createTempDirectory("warcm2").toString
    WarcWriter.write(PagesSynth.pagesDF(spark, 6).coalesce(1), dir2)
    val f2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    assert(Files.readAllBytes(f2.toPath).toSeq === bytes.toSeq)
  }

  test("CDX sidecar: entries tile the archive exactly; a range-read of one member yields that record") {
    val dir = Files.createTempDirectory("warcx").toString
    WarcWriter.write(PagesSynth.pagesDF(spark, 8).coalesce(1), dir)
    val d = new java.io.File(dir)
    val warc = d.listFiles().filter(_.getName.endsWith(".warc.gz")).head
    val cdx = d.listFiles().filter(_.getName.endsWith(".cdx.gz")).head
    val bytes = Files.readAllBytes(warc.toPath)
    val lines = scala.io.Source.fromInputStream(
      new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(cdx))).getLines().toList
    assert(lines.length === 8)
    val entries = lines.map { l =>
      // "<surt> <ts14> {json}"
      val Array(surt, ts, json) = l.split(" ", 3)
      val url = """"url":"([^"]+)"""".r.findFirstMatchIn(json).get.group(1)
      val off = """"offset":(\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
      val len = """"length":(\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
      val fn = """"filename":"([^"]+)"""".r.findFirstMatchIn(json).get.group(1)
      assert(ts.length === 14 && ts.forall(_.isDigit))
      assert(surt.contains(")") && surt === graft.core.Surt.key(url))
      assert(fn === warc.getName)
      (url, off, len)
    }
    // members tile the file: contiguous, in order, covering every byte
    entries.sliding(2).foreach { case List((_, o1, l1), (_, o2, _)) =>
      assert(o1 + l1 === o2)
    }
    assert(entries.head._2 === 0L)
    assert(entries.last._2 + entries.last._3 === bytes.length.toLong)
    // the pywb access pattern: range-read ONE member, inflate, one record
    val (url, off, len) = entries(4)
    val one = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
    val recs = WarcReader.records(
      new java.io.ByteArrayInputStream(one), Set("response")).toList
    assert(recs.length === 1)
    assert(recs.head.url === url)
  }

  test("incremental archive: unchanged pages become tiny revisit records, responses round-trip") {
    val dir = Files.createTempDirectory("warcr").toString
    val s = spark
    import s.implicits._
    val pages = PagesSynth.pagesDF(spark, 10).coalesce(1)
    val delta = pages.selectExpr("url",
      "CASE WHEN pmod(xxhash64(url), 2) = 0 THEN 'unchanged' ELSE 'changed' END AS status")
    val unchanged = delta.filter(col("status") === "unchanged")
      .select("url").as[String].collect().toSet
    assert(unchanged.nonEmpty && unchanged.size < 10)
    WarcWriter.writeIncremental(pages, delta, dir)
    // the pages source yields ONLY the full responses (revisits are not
    // content rows) — exactly the changed set
    val back = WarcReader.pages(spark, dir).select("url").as[String]
      .collect().toSet
    assert(back === pages.select("url").as[String].collect().toSet -- unchanged)
    // the revisit records are present, one per unchanged url, with the
    // payload digest of the body they deduplicate
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val raw = Files.readAllBytes(f.toPath)
    val revisits = WarcReader.records(
      new java.io.ByteArrayInputStream(raw), Set("revisit")).toList
    assert(revisits.map(_.url).toSet === unchanged)
    assert(revisits.forall(_.html.isEmpty), "revisit records carry no body")
    // container-level dedup is real: the archive is much smaller than a
    // full write of the same pages
    val dirFull = Files.createTempDirectory("warcrf").toString
    WarcWriter.write(pages.coalesce(1), dirFull)
    val fullLen = new java.io.File(dirFull).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head.length()
    assert(raw.length < fullLen * 3 / 4,
      s"revisit archive not smaller: ${raw.length} vs $fullLen")
    // CDX indexes BOTH kinds: entries still tile the archive exactly
    val cdx = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".cdx.gz")).head
    val lines = scala.io.Source.fromInputStream(
      new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(cdx))).getLines().toList
    assert(lines.length === 10)
    val ranges = lines.map { l =>
      val j = l.split(" ", 3)(2)
      (""""offset":(\d+)""".r.findFirstMatchIn(j).get.group(1).toLong,
        """"length":(\d+)""".r.findFirstMatchIn(j).get.group(1).toLong)
    }.sortBy(_._1)
    assert(ranges.head._1 === 0L)
    ranges.sliding(2).foreach {
      case List((o1, l1), (o2, _)) => assert(o1 + l1 === o2)
      case _ =>
    }
    assert(ranges.last._1 + ranges.last._2 === raw.length.toLong)
  }

  test("WARC writer Hadoop branch round-trips; header CR/LF sanitized") {
    val dir = Files.createTempDirectory("warch").toString
    val s = spark
    import s.implicits._
    val evil = "http://ex.com/a\r\nWARC-Type: fake"
    val pages = Seq(
      (evil, new java.sql.Timestamp(86400000L),
        "<p>one</p>".getBytes(UTF_8)),
      ("http://ex.com/b", new java.sql.Timestamp(86400000L),
        "<p>two</p>".getBytes(UTF_8)))
      .toDF("url", "warc_ts", "html").coalesce(1)
    WarcWriter.write(pages, dir, cdx = true, useHadoop = true)
    val back = WarcReader.pages(spark, dir)
      .selectExpr("url", "decode(html, 'UTF-8') AS h").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(back.size === 2)
    assert(back("http://ex.com/b") === "<p>two</p>")
    // the CR/LF was percent-encoded, not interpreted as a header line
    assert(back.keys.exists(_.startsWith("http://ex.com/a%0D%0A")))
  }

  test("warc directory → pages DataFrame → extraction pipeline end-to-end") {
    val dir = Files.createTempDirectory("warc")
    Files.write(dir.resolve("a.warc"), archive(4))
    val out = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(out)
    g.write(record("response", "http://ex.com/z", "2024-01-03T00:00:00Z",
      httpResponse("<body><p>gzip file page words</p></body>")))
    g.finish()
    Files.write(dir.resolve("b.warc.gz"), out.toByteArray)

    val pages = WarcReader.pages(spark, dir.toString)
    assert(pages.columns.toSeq ===
      Seq("url", "warc_ts", "html", "text", "lang"))
    val extracted = graft.pipeline.ExtractPipeline
      .extractDS(pages, numParts = 4).collect()
    assert(extracted.length === 5)
    assert(extracted.find(_.url == "http://ex.com/z").get.text
      === "gzip file page words")
    assert(extracted.find(_.url == "http://ex.com/p2").get.text
      === "page 2 body words")
  }
}
