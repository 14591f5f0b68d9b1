package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURT-ordered crawl index — the storage layout that makes "every URL of
  * example.com (and its subdomains)" a CONTIGUOUS byte range of a 100 TB
  * index instead of a full scan, the way web-archive CDX(J) files are laid
  * out (sorted by the [[graft.core.Surt]] key).
  *
  * Build = ONE range-shuffle: `repartitionByRange(surt)` +
  * `sortWithinPartitions(surt)` → parquet, so every output file covers one
  * key interval and parquet's native min/max row-group stats are tight.
  * After the write, a single column-pruned pass over the written key
  * column derives the per-FILE `[min_surt, max_surt]` manifest, committed
  * atomically (temp + rename) — the seam where an Iceberg/Delta catalog
  * would hold file-level stats (docs/ICEBERG.md).
  *
  * Lookup = manifest pruning: a domain-prefix query touches only the files
  * whose key interval can intersect `[prefix, next(prefix))`, then relies
  * on parquet row-group stats inside them. At 1000 executors × 100 TB the
  * planner schedules tasks for the 2–3 matching files, not 100 000.
  */
object SurtIndex {

  final case class FileRange(file: String, min_surt: String,
                             max_surt: String, rows: Long)

  private val ManifestName = "_surt_ranges.json"

  /** Build the index from `df`: derive `surt` from `urlCol`, range-sort,
    * write to `outDir/data`, commit the file-range manifest. Returns the
    * manifest rows in key order.
    */
  def build(spark: SparkSession, df: DataFrame, urlCol: String,
            outDir: String, numParts: Int): Seq[FileRange] = {
    require(numParts > 0, s"numParts $numParts")
    graft.functions.GraftExtensions.ensureRegistered(spark)
    val dataDir = s"$outDir/data"
    // r6: materialized — repartitionByRange runs a full range-boundary
    // SAMPLING pass over the input before the real shuffle, so without
    // this the surt_key derivation (and whatever feeds `df`) executes
    // twice per build
    val keyed = df.withColumn("surt", call_function("surt_key", col(urlCol)))
      .localCheckpoint()
    keyed
      .repartitionByRange(numParts, col("surt"))
      .sortWithinPartitions("surt")
      .write.mode("overwrite").parquet(dataDir)

    // One column-pruned pass over the WRITTEN files (ground truth — robust
    // to however the writer split tasks into files) for per-file ranges.
    val ranges = spark.read.parquet(dataDir)
      .select(input_file_name().as("file"), col("surt"))
      .groupBy("file")
      .agg(min("surt").as("min_surt"), max("surt").as("max_surt"),
        count(lit(1)).as("rows"))
      .collect()
      .map(r => FileRange(r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .sortBy(_.min_surt)
      .toSeq
    writeManifest(spark, outDir, ranges)
    ranges
  }

  /** Driver-side manifest read — O(files) metadata, not a Spark job (and
    * Spark's readers deliberately skip `_`-prefixed paths).
    */
  def manifest(spark: SparkSession, outDir: String): Seq[FileRange] = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/$ManifestName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    body.linesIterator.filter(_.nonEmpty).map { line =>
      val n = om.readTree(line)
      FileRange(n.get("file").asText(), n.get("min_surt").asText(),
        n.get("max_surt").asText(), n.get("rows").asLong())
    }.toSeq.sortBy(_.min_surt)
  }

  /** Smallest string strictly greater than every string with prefix `p`,
    * or None for "+infinity" (p empty or all chars at Char.MaxValue).
    */
  private[sources] def nextPrefix(p: String): Option[String] = {
    var i = p.length - 1
    while (i >= 0 && p.charAt(i) == Char.MaxValue) i -= 1
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  /** The files whose key interval can contain a key with prefix `p`. */
  def filesForPrefix(ranges: Seq[FileRange], p: String): Seq[FileRange] = {
    val hi = nextPrefix(p)
    ranges.filter(r => r.max_surt >= p && hi.forall(r.min_surt < _))
  }

  /** Prefix lookup through the manifest: reads ONLY the qualifying files.
    * Returns the matching rows; `filesForPrefix` exposes how many files
    * that touched (the pruning evidence the spec asserts).
    */
  def lookupPrefix(spark: SparkSession, outDir: String, p: String): DataFrame = {
    val sel = filesForPrefix(manifest(spark, outDir), p)
    if (sel.isEmpty) {
      // preserve the schema without reading data
      spark.read.parquet(s"$outDir/data").filter(lit(false))
    } else {
      spark.read.parquet(sel.map(_.file): _*)
        .filter(col("surt").startsWith(p))
    }
  }

  private def writeManifest(spark: SparkSession, outDir: String,
                            ranges: Seq[FileRange]): Unit = {
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val body = ranges.map { r =>
      s"""{"file": ${js(r.file)}, "min_surt": ${js(r.min_surt)}, "max_surt": ${js(r.max_surt)}, "rows": ${r.rows}}"""
    }.mkString("", "\n", "\n")
    val dir = new org.apache.hadoop.fs.Path(outDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$ManifestName.tmp")
    val out = fs.create(tmp, true)
    out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val fin = new org.apache.hadoop.fs.Path(dir, ManifestName)
    fs.delete(fin, false)
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"manifest rename failed: $fin")
  }
}
