package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file COMPACTION for the extracted table — the maintenance job a
  * long-running 100 TB pipeline needs between ingest rounds: every
  * incremental batch write (and every resume) appends files, and a
  * partition accumulated over many batches ends up as hundreds of small
  * parquet files whose per-file open/footer costs dominate later scans.
  * This stage rewrites each url-hash partition into
  * `ceil(partitionBytes / targetFileBytes)` files.
  *
  * Semantics and safety:
  *   - row-preserving: the rewrite is read → repartition → overwrite; the
  *     (url, text_sha, …) multiset is untouched (spec-checked);
  *   - per-partition atomic + idempotent: the write goes through the same
  *     dynamic-partition-overwrite mode the extraction job commits with,
  *     so a crashed compaction leaves the old files in place and a re-run
  *     converges;
  *   - incremental: only partitions whose file count exceeds their target
  *     are rewritten (`filesRewritten` reports the work actually done).
  *
  * This is the session-catalog/parquet form of Iceberg's
  * `rewrite_data_files` compaction (docs/ICEBERG.md); on Iceberg the same
  * loop commits one snapshot per partition batch.
  */
object CompactStage {

  final case class Summary(parts: Int, partsRewritten: Int,
                           filesBefore: Int, filesAfter: Int,
                           bytes: Long)

  def run(spark: SparkSession, outDir: String,
          targetFileBytes: Long = 128L * 1024 * 1024): Summary = {
    require(targetFileBytes >= (1L << 20), s"target $targetFileBytes below 1 MiB")
    val root = ExtractJob.extractedPath(outDir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def partFiles(): Map[Int, Seq[org.apache.hadoop.fs.FileStatus]] = {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("part_id="))
      dirs.map { d =>
        val pid = d.getPath.getName.stripPrefix("part_id=").toInt
        val files = fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
        pid -> files
      }.toMap
    }

    val before = partFiles()
    val filesBefore = before.valuesIterator.map(_.size).sum
    val totalBytes = before.valuesIterator.flatten.map(_.getLen).sum
    var rewritten = 0
    before.toSeq.sortBy(_._1).foreach { case (pid, files) =>
      val bytes = files.map(_.getLen).sum
      val target = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      if (files.size > target) {
        // url-keyed repartition: deterministic spread, no giant-row
        // stacking. The eager localCheckpoint materializes the partition
        // BEFORE the overwrite — reading and overwriting the same files in
        // one plan is rejected by Spark (and rightly: a mid-write failure
        // would destroy the input). Prod: checkpoint to reliable storage /
        // Iceberg snapshot isolation makes this a non-issue.
        spark.read.parquet(root)
          .filter(col("part_id") === pid)
          .localCheckpoint()
          .repartition(target, col("url"))
          .write.mode("overwrite").partitionBy("part_id")
          // per-WRITE dynamic overwrite (replace only this partition's
          // dir) — scoping it here instead of flipping the session-global
          // conf, which would silently change every later partitioned
          // overwrite in the same session (round-4 review finding)
          .option("partitionOverwriteMode", "dynamic")
          .parquet(root)
        rewritten += 1
      }
    }
    val after = partFiles()
    Summary(before.size, rewritten, filesBefore,
      after.valuesIterator.map(_.size).sum, totalBytes)
  }
}
