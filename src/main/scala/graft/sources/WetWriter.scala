package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPOutputStream
import org.apache.spark.TaskContext
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

  def recordBytes(url: String, text: String, date: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    // WARC-Record-ID is mandatory (ISO 28500); deterministic name-based
    // UUID over (url, date) so re-runs emit identical archives
    val rid = java.util.UUID.nameUUIDFromBytes(s"$url|$date".getBytes(UTF_8))
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: conversion\r\n" +
      s"WARC-Record-ID: <urn:uuid:$rid>\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8)
    val out = new Array[Byte](hdr.length + payload.length + 4)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(payload, 0, out, hdr.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Write `ds` as WET files under `dir` (a shared/local path reachable
    * from every executor; on a real cluster point this at the mounted
    * distributed FS or swap the file IO for the Hadoop FS API).
    */
  def write(ds: Dataset[ExtractedRow], dir: String,
            date: String = "1970-01-01T00:00:00Z"): Unit = {
    Files.createDirectories(Paths.get(dir))
    ds.foreachPartition { (it: Iterator[ExtractedRow]) =>
      if (it.hasNext) {
        val pid = TaskContext.getPartitionId()
        // attempt id in the temp name: speculative/zombie attempts must not
        // interleave writes into one tmp file; the rename stays atomic
        val attempt = TaskContext.get().taskAttemptId()
        val tmp = Paths.get(dir, f".part-$pid%05d-$attempt.warc.wet.gz.tmp")
        val dst = Paths.get(dir, f"part-$pid%05d.warc.wet.gz")
        val os = new GZIPOutputStream(Files.newOutputStream(tmp), 1 << 16)
        try it.foreach(r => os.write(recordBytes(r.url, r.text, date)))
        finally os.close()
        Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }
}
