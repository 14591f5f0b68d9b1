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

  /** True when `dir` is a plain local path (no scheme, or file:) — those
    * keep the java.nio fast path; any other scheme (hdfs:, s3a:, …) goes
    * through the Hadoop FS API so the sink works on a real cluster's
    * distributed FS.
    */
  private def isLocal(dir: String): Boolean = {
    val i = dir.indexOf(':')
    i < 0 || dir.substring(0, i) == "file" || i == 1 /* windows drive */
  }

  /** Write `ds` as WET files under `dir`. Local paths use java.nio; any
    * Hadoop-supported scheme uses `FileSystem.create` + rename. Both keep
    * the temp-file + atomic-rename contract, so a killed job leaves no
    * half-written visible file.
    */
  def write(ds: Dataset[ExtractedRow], dir: String,
            date: String = "1970-01-01T00:00:00Z"): Unit =
    write(ds, dir, date, useHadoop = !isLocal(dir))

  /** Branch-selectable form so the Hadoop path is testable on the local FS
    * (Hadoop's RawLocalFileSystem serves schemeless paths).
    */
  private[sources] def write(ds: Dataset[ExtractedRow], dir: String,
                             date: String, useHadoop: Boolean): Unit = {
    val local = !useHadoop
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      ds.sparkSession.sparkContext.hadoopConfiguration)
    if (local) Files.createDirectories(Paths.get(stripFileScheme(dir)))
    else {
      val root = new org.apache.hadoop.fs.Path(dir)
      root.getFileSystem(hconf.value).mkdirs(root); ()
    }
    ds.foreachPartition { (it: Iterator[ExtractedRow]) =>
      if (it.hasNext) {
        val pid = TaskContext.getPartitionId()
        // attempt id in the temp name: speculative/zombie attempts must not
        // interleave writes into one tmp file; the rename stays atomic
        val attempt = TaskContext.get().taskAttemptId()
        val tmpName = f".part-$pid%05d-$attempt.warc.wet.gz.tmp"
        val dstName = f"part-$pid%05d.warc.wet.gz"
        if (local) {
          val base = stripFileScheme(dir)
          val tmp = Paths.get(base, tmpName)
          val dst = Paths.get(base, dstName)
          val os = new GZIPOutputStream(Files.newOutputStream(tmp), 1 << 16)
          try it.foreach(r => os.write(recordBytes(r.url, r.text, date)))
          finally os.close()
          // FIRST RENAME WINS on this path too — the local branch used to
          // REPLACE_EXISTING (last-wins) while the Hadoop branch kept an
          // existing dst, so re-run semantics silently depended on the
          // path scheme (review finding, round 3). A dst that must be
          // rebuilt from changed input is the manifest/resume layer's job
          // to clear, identically on every filesystem.
          if (Files.exists(dst)) Files.delete(tmp)
          else try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Files.delete(tmp) // lost the race — same bytes, fine
          }
        } else {
          import org.apache.hadoop.fs.Path
          val tmp = new Path(dir, tmpName)
          val dst = new Path(dir, dstName)
          val fs = tmp.getFileSystem(hconf.value)
          val os = new GZIPOutputStream(fs.create(tmp, true), 1 << 16)
          try it.foreach(r => os.write(recordBytes(r.url, r.text, date)))
          finally os.close()
          // FIRST RENAME WINS — never delete an existing dst: with
          // speculation, a zombie attempt dying between a delete and its
          // rename would silently lose the committed file. The writer is
          // deterministic (same partition → identical bytes, fixed date),
          // so a dst left by another attempt or a previous run over the
          // same input is the same content; our tmp is then redundant.
          if (fs.exists(dst)) fs.delete(tmp, false)
          else if (!fs.rename(tmp, dst)) {
            if (fs.exists(dst)) fs.delete(tmp, false) // lost the race — fine
            else throw new java.io.IOException(
              s"WET commit rename failed: $tmp -> $dst")
          }
        }
        ()
      }
    }
  }

  private def stripFileScheme(dir: String): String =
    if (dir.startsWith("file:")) new java.net.URI(dir).getPath else dir
}
