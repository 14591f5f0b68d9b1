package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** WARC/1.0 `response` writer — the inverse of [[WarcReader]], closing the
  * crawl-container round-trip the way [[WetWriter]] closes it for
  * extracted text (spec: ISO 28500): pages `(url, warc_ts, html)` become
  * WARC response records wrapping a minimal stored HTTP/1.1 envelope, one
  * `.warc.gz` file per Spark partition, each record its OWN gzip member —
  * Common Crawl's layout, where member boundaries are record boundaries,
  * so downstream tooling can split or index archives without inflating
  * them (and [[WarcReader]] reads member-concatenated gzip natively).
  *
  * Why it exists: a curation engine that can only CONSUME crawl archives
  * forces every intermediate corpus back through parquet; re-emitting
  * filtered/repartitioned page sets as WARC keeps the engine composable
  * with the existing archive ecosystem (replayers, CDX indexers, other
  * extraction stacks) in both directions.
  *
  * Determinism: record order = partition row order; WARC-Record-ID is a
  * name-based UUID over (url, date); the stored HTTP envelope is fixed.
  * Re-runs emit identical archives, so [[ArchiveSink]]'s first-rename-wins
  * commit is sufficient.
  *
  * Round-trip contract (WarcSpec): reading what was written recovers url
  * byte-exactly (header values percent-sanitized exactly like WET —
  * injection-proof), warc_ts at WARC's second precision, and html
  * byte-exactly through [[WarcReader]]'s HTTP-envelope strip.
  */
object WarcWriter {

  /** WARC-Date: ISO-8601 UTC at second precision (the spec's granularity;
    * [[WarcReader.parseTs]] parses it back exactly).
    */
  def isoDate(ts: java.sql.Timestamp): String =
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      (if (ts == null) java.time.Instant.EPOCH else ts.toInstant)
        .truncatedTo(java.time.temporal.ChronoUnit.SECONDS))

  def recordBytes(url: String, date: String, html: Array[Byte]): Array[Byte] = {
    val u = WetWriter.sanitizeHeaderValue(url)
    val d = WetWriter.sanitizeHeaderValue(date)
    val body = if (html == null) Array.emptyByteArray else html
    val http = (s"HTTP/1.1 200 OK\r\n" +
      s"Content-Type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    // WARC-Record-ID is mandatory (ISO 28500); deterministic name-based
    // UUID over (url, date, type) so re-runs emit identical archives
    val rid = java.util.UUID.nameUUIDFromBytes(
      s"$u|$d|response".getBytes(UTF_8))
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$rid>\r\n" +
      s"WARC-Target-URI: $u\r\n" +
      s"WARC-Date: $d\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(UTF_8)
    val out = new Array[Byte](hdr.length + http.length + body.length + 4)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(http, 0, out, hdr.length, http.length)
    System.arraycopy(body, 0, out, hdr.length + http.length, body.length)
    val n = out.length
    out(n - 4) = '\r'; out(n - 3) = '\n'; out(n - 2) = '\r'; out(n - 1) = '\n'
    out
  }

  /** CDX timestamp: 14-digit UTC `yyyyMMddHHmmss` (the web-archive index
    * convention).
    */
  def cdxTs(ts: java.sql.Timestamp): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(if (ts == null) java.time.Instant.EPOCH else ts.toInstant)

  private def jsonStr(v: String): String = {
    val sb = new java.lang.StringBuilder(v.length + 8)
    sb.append('"')
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '"' || c == '\\') { sb.append('\\'); sb.append(c) }
      else if (c < 0x20) sb.append(f"\\u${c.toInt}%04x")
      else sb.append(c)
      i += 1
    }
    sb.append('"').toString
  }

  /** One CDXJ line: SURT key + 14-digit timestamp + a JSON blob carrying
    * the member's exact byte range — `offset`/`length` address one whole
    * gzip member, so a consumer can range-read `[offset, offset+length)`
    * from `filename`, inflate it, and get exactly this record (the
    * pywb/OpenWayback access pattern; tested in WarcSpec). The SURT field
    * percent-encodes spaces — CDX lines are space-delimited.
    */
  def cdxLine(url: String, ts: java.sql.Timestamp, file: String,
              offset: Long, length: Long): String =
    s"${graft.core.Surt.key(url).replace(" ", "%20")} ${cdxTs(ts)} " +
      s"""{"url":${jsonStr(url)},"offset":$offset,"length":$length,""" +
      s""""filename":${jsonStr(file)}}"""

  private def md5Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(if (b == null) Array.emptyByteArray else b)
    val sb = new java.lang.StringBuilder(32)
    d.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  /** WARC `revisit` record (identical-payload-digest profile, ISO 28500 /
    * the IIPC revisit extension): the web-archive convention for an
    * unchanged re-crawl — a few hundred BYTES referencing the earlier
    * capture by payload digest instead of re-storing the body. This is
    * container-level dedup, the exact counterpart of
    * [[graft.pipeline.IncrementalExtract]]'s scanner-skip.
    */
  def revisitRecordBytes(url: String, date: String,
                         payloadMd5Hex: String): Array[Byte] = {
    val u = WetWriter.sanitizeHeaderValue(url)
    val d = WetWriter.sanitizeHeaderValue(date)
    val rid = java.util.UUID.nameUUIDFromBytes(
      s"$u|$d|revisit".getBytes(UTF_8))
    (s"WARC/1.0\r\n" +
      s"WARC-Type: revisit\r\n" +
      s"WARC-Record-ID: <urn:uuid:$rid>\r\n" +
      s"WARC-Target-URI: $u\r\n" +
      s"WARC-Date: $d\r\n" +
      s"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
      s"WARC-Payload-Digest: md5:$payloadMd5Hex\r\n" +
      s"Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(UTF_8)
  }

  /** Write a pages DataFrame (`url`, `warc_ts`, `html`; extra columns
    * ignored) as `.warc.gz` response archives under `dir` — one file per
    * partition, one gzip member per record, a `.cdx.gz` CDXJ index
    * sidecar per archive, atomic per-partition commit (archive first,
    * then its index — a crash window can only lose the rebuildable
    * sidecar, never leave an index pointing at an uncommitted archive).
    */
  def write(pages: DataFrame, dir: String, cdx: Boolean = true): Unit =
    write(pages, dir, cdx, useHadoop = !ArchiveSink.isLocal(dir))

  private[sources] def write(pages: DataFrame, dir: String, cdx: Boolean,
                             useHadoop: Boolean): Unit = {
    val s = pages.sparkSession
    import s.implicits._
    val ds = pages.select("url", "warc_ts", "html")
      .as[(String, java.sql.Timestamp, Array[Byte])]
    val sidecar =
      if (cdx)
        Some((r: (String, java.sql.Timestamp, Array[Byte]), file: String,
              off: Long, len: Long) => cdxLine(r._1, r._2, file, off, len))
      else None
    ArchiveSink.write(ds, dir, "warc.gz", useHadoop, memberPerRecord = true,
      sidecar, "cdx.gz") {
      case (url, ts, html) => recordBytes(url, isoDate(ts), html)
    }
  }

  /** Incremental-crawl archive: pages whose delta `status` is `unchanged`
    * become `revisit` records (a few hundred bytes, identical-payload-
    * digest profile); changed/new pages are stored as full responses.
    * `delta` is [[graft.pipeline.IncrementalExtract]]'s table
    * (url, status, …) — the join ships (url, bool), never blobs. CDX
    * sidecars index both record kinds (a revisit's member range is as
    * range-readable as a response's).
    */
  def writeIncremental(pages: DataFrame, delta: DataFrame, dir: String,
                       cdx: Boolean = true): Unit =
    writeIncremental(pages, delta, dir, cdx,
      useHadoop = !ArchiveSink.isLocal(dir))

  private[sources] def writeIncremental(pages: DataFrame, delta: DataFrame,
                                        dir: String, cdx: Boolean,
                                        useHadoop: Boolean): Unit = {
    val s = pages.sparkSession
    import s.implicits._
    val ds = pages.select(col("url"), col("warc_ts"), col("html"))
      .join(delta.select(col("url"),
        (col("status") === "unchanged").as("revisit")), Seq("url"), "left")
      .na.fill(value = false, Seq("revisit"))
      .select(col("url"), col("warc_ts"), col("html"), col("revisit"))
      .as[(String, java.sql.Timestamp, Array[Byte], Boolean)]
    val sidecar =
      if (cdx)
        Some((r: (String, java.sql.Timestamp, Array[Byte], Boolean),
              file: String, off: Long, len: Long) =>
          cdxLine(r._1, r._2, file, off, len))
      else None
    ArchiveSink.write(ds, dir, "warc.gz", useHadoop, memberPerRecord = true,
      sidecar, "cdx.gz") {
      case (url, ts, html, true) =>
        revisitRecordBytes(url, isoDate(ts), md5Hex(html))
      case (url, ts, html, false) => recordBytes(url, isoDate(ts), html)
    }
  }
}
