package graft.sources

import java.io.OutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPOutputStream
import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset

/** Shared executor-side partition-file sink for the WARC-family writers
  * ([[WetWriter]], [[WarcWriter]]): one gzip'd archive file per Spark
  * partition via `foreachPartition` (no driver collect), temp-file +
  * atomic-rename with FIRST-RENAME-WINS on both the local and Hadoop
  * branches — speculative/zombie attempts and re-runs can never lose a
  * committed file, and because both writers are deterministic (fixed
  * date, record order = partition row order) any committed dst already
  * holds the same bytes.
  *
  * `memberPerRecord = true` writes each record as its OWN gzip member —
  * Common Crawl's `.warc.gz` layout, where member boundaries are record
  * boundaries so downstream tooling can split archives without inflating
  * them ([[WarcReader]] consumes member-concatenated gzip natively).
  * `false` writes one gzip stream per file (the `.warc.wet.gz` layout).
  *
  * `sidecar` (member mode only): one text line per record, given the
  * row, the committed archive file name, and the record's gzip member
  * [offset, length) in that file — the hook [[WarcWriter]] uses to emit
  * CDX index sidecars, which is the whole point of the member layout
  * (a reader can range-read one record without touching the rest).
  * The sidecar gzips into `part-NNNNN.<sidecarExt>` beside the archive
  * and commits AFTER it (a crash between the two renames leaves a
  * readable archive missing only its rebuildable index, never the
  * reverse).
  */
private[sources] object ArchiveSink {

  /** True when `dir` is a plain local path (no scheme, or file:) — those
    * keep the java.nio fast path; any other scheme (hdfs:, s3a:, …) goes
    * through the Hadoop FS API so the sink works on a real cluster's
    * distributed FS.
    */
  def isLocal(dir: String): Boolean = {
    val i = dir.indexOf(':')
    i < 0 || dir.substring(0, i) == "file" || i == 1 /* windows drive */
  }

  def stripFileScheme(dir: String): String =
    if (dir.startsWith("file:")) new java.net.URI(dir).getPath else dir

  private final class CountingOutputStream(under: OutputStream)
      extends OutputStream {
    var count: Long = 0L
    override def write(b: Int): Unit = { under.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      under.write(b, off, len); count += len
    }
    override def flush(): Unit = under.flush()
    override def close(): Unit = under.close()
  }

  def write[T](ds: Dataset[T], dir: String, ext: String,
               useHadoop: Boolean, memberPerRecord: Boolean)
              (rec: T => Array[Byte]): Unit =
    write(ds, dir, ext, useHadoop, memberPerRecord, None, "")(rec)

  def write[T](ds: Dataset[T], dir: String, ext: String,
               useHadoop: Boolean, memberPerRecord: Boolean,
               sidecar: Option[(T, String, Long, Long) => String],
               sidecarExt: String)
              (rec: T => Array[Byte]): Unit = {
    require(sidecar.isEmpty || memberPerRecord,
      "sidecar offsets are only meaningful with memberPerRecord = true")
    val local = !useHadoop
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      ds.sparkSession.sparkContext.hadoopConfiguration)
    if (local) Files.createDirectories(Paths.get(stripFileScheme(dir)))
    else {
      val root = new org.apache.hadoop.fs.Path(dir)
      root.getFileSystem(hconf.value).mkdirs(root); ()
    }
    ds.foreachPartition { (it: Iterator[T]) =>
      if (it.hasNext) {
        val pid = TaskContext.getPartitionId()
        // attempt id in the temp name: speculative/zombie attempts must not
        // interleave writes into one tmp file; the rename stays atomic
        val attempt = TaskContext.get().taskAttemptId()

        def create(name: String): OutputStream =
          if (local)
            Files.newOutputStream(Paths.get(stripFileScheme(dir), name))
          else {
            val p = new org.apache.hadoop.fs.Path(dir, name)
            p.getFileSystem(hconf.value).create(p, true)
          }
        // FIRST RENAME WINS on both branches — never delete an existing
        // dst: with speculation, a zombie attempt dying between a delete
        // and its rename would silently lose the committed file (and the
        // local branch must not silently differ from the Hadoop one —
        // review finding, round 3). A dst that must be rebuilt from
        // changed input is the manifest/resume layer's job to clear.
        def commit(tmpName: String, dstName: String): Unit =
          if (local) {
            val base = stripFileScheme(dir)
            val tmp = Paths.get(base, tmpName)
            val dst = Paths.get(base, dstName)
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
            if (fs.exists(dst)) fs.delete(tmp, false)
            else if (!fs.rename(tmp, dst)) {
              if (fs.exists(dst)) fs.delete(tmp, false) // lost the race
              else throw new java.io.IOException(
                s"archive commit rename failed: $tmp -> $dst")
            }
          }

        val tmpName = f".part-$pid%05d-$attempt.$ext.tmp"
        val dstName = f"part-$pid%05d.$ext"
        val sideTmp = f".part-$pid%05d-$attempt.$sidecarExt.tmp"
        val sideDst = f"part-$pid%05d.$sidecarExt"
        val counter = new CountingOutputStream(create(tmpName))
        val side = sidecar.map(_ => new GZIPOutputStream(create(sideTmp), 1 << 16))
        try {
          if (memberPerRecord)
            it.foreach { r =>
              val off = counter.count
              // gzip trailer per record (finish, not close) = one member
              // each; the underlying stream closes once at the end
              val gz = new GZIPOutputStream(counter, 1 << 16)
              gz.write(rec(r)); gz.finish()
              sidecar.foreach { f =>
                side.get.write(
                  (f(r, dstName, off, counter.count - off) + "\n")
                    .getBytes(UTF_8))
              }
            }
          else {
            val os = new GZIPOutputStream(counter, 1 << 16)
            try it.foreach(r => os.write(rec(r))) finally os.close()
          }
        } finally {
          counter.close()
          side.foreach(_.close())
        }
        commit(tmpName, dstName)
        if (sidecar.isDefined) commit(sideTmp, sideDst)
        ()
      }
    }
  }
}
