package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Dataset
import graft.pipeline.ExtractedRow

/** WET output: the pipeline's extracted text as WARC/1.0 `conversion`
  * records (`.warc.wet.gz` — Common Crawl's extracted-text distribution
  * format), so downstream tooling built for WET archives consumes this
  * engine's output directly.
  *
  * One gzip'd WET file per Spark partition, written executor-side via
  * `foreachPartition` (no driver collect); temp-file + atomic rename per
  * partition, so a killed job leaves no half-written visible file.
  * Deterministic: a fixed `date` stamp (pass the crawl's capture date in
  * production) and record order = partition row order.
  *
  * Round-trips through [[WarcReader.records]] with
  * `acceptTypes = Set("conversion")` (tested in WarcSpec).
  */
object WetWriter {

  /** Percent-encode C0 control bytes (incl. CR/LF) and DEL in a header
    * value. A url containing a raw newline — impossible from
    * [[WarcReader]] (line-delimited) but possible from a parquet-sourced
    * pipeline — would otherwise inject header lines and corrupt the
    * framing of every record after it. Percent-encoding is URI-legal, so
    * a clean url round-trips unchanged.
    */
  private[sources] def sanitizeHeaderValue(v: String): String = {
    var needs = false
    var i = 0
    while (i < v.length && !needs) {
      val c = v.charAt(i)
      if (c < 0x20 || c == 0x7F) needs = true
      i += 1
    }
    if (!needs) v
    else {
      val sb = new StringBuilder(v.length + 8)
      v.foreach { c =>
        if (c < 0x20 || c == 0x7F) sb.append(f"%%${c.toInt}%02X")
        else sb.append(c)
      }
      sb.toString
    }
  }

  def recordBytes(url: String, text: String, date: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val u = sanitizeHeaderValue(url)
    val d = sanitizeHeaderValue(date)
    // WARC-Record-ID is mandatory (ISO 28500); deterministic name-based
    // UUID over (url, date) so re-runs emit identical archives
    val rid = java.util.UUID.nameUUIDFromBytes(s"$u|$d".getBytes(UTF_8))
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: conversion\r\n" +
      s"WARC-Record-ID: <urn:uuid:$rid>\r\n" +
      s"WARC-Target-URI: $u\r\n" +
      s"WARC-Date: $d\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8)
    val out = new Array[Byte](hdr.length + payload.length + 4)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(payload, 0, out, hdr.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Write `ds` as WET files under `dir`. Local paths use java.nio; any
    * Hadoop-supported scheme uses `FileSystem.create` + rename. Both keep
    * the temp-file + atomic-rename contract (shared [[ArchiveSink]]), so
    * a killed job leaves no half-written visible file.
    */
  def write(ds: Dataset[ExtractedRow], dir: String,
            date: String = "1970-01-01T00:00:00Z"): Unit =
    write(ds, dir, date, useHadoop = !ArchiveSink.isLocal(dir))

  /** Branch-selectable form so the Hadoop path is testable on the local FS
    * (Hadoop's RawLocalFileSystem serves schemeless paths).
    */
  private[sources] def write(ds: Dataset[ExtractedRow], dir: String,
                             date: String, useHadoop: Boolean): Unit =
    ArchiveSink.write(ds, dir, "warc.wet.gz", useHadoop,
      memberPerRecord = false)(r => recordBytes(r.url, r.text, date))
}
