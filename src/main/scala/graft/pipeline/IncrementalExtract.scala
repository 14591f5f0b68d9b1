package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental re-crawl ingest — the consumer of q69's crawl-delta
  * decision table ([[graft.queries.TextOps.q69CrawlDelta]] computes the
  * same four-way split as a standalone query; this stage ACTS on it):
  * given a previous run's committed output, the new crawl is classified
  * per url against the previous `extracted` table's `html_hash` column
  *
  *   - `unchanged` — same url, same 64-bit content hash: the previous
  *     extraction is still valid; the row is REUSED (no scanner run);
  *   - `changed`   — same url, different hash: re-extracted;
  *   - `new`       — url absent from the previous run: extracted;
  *   - `gone`      — url absent from the new crawl: tombstoned in the
  *     delta table and excluded from the new output.
  *
  * Output layout matches a full run (`<out>/extracted` + `_manifest`),
  * plus `<out>/delta` — (url, status, part_id) for every url of either
  * crawl, the lineage record of what was skipped/redone/tombstoned. The
  * kill-resume contract is inherited unchanged: unchanged rows flow
  * through [[ExtractJob.run]]'s `reuse` seam so each url-hash partition
  * commits fresh ∪ reused in one atomic write.
  *
  * Scale shape: the classification is one full-outer join of two
  * (url, hash) PROJECTIONS — 16 bytes a row, never the blobs; unchanged
  * docs then cost one parquet read + write instead of a parse (on
  * Iceberg the copy disappears too: unchanged data files are carried
  * into the new snapshot by metadata only, docs/ICEBERG.md). At a 90 %-
  * unchanged re-crawl the scanner runs on a tenth of the corpus.
  *
  * Caveats (by design): a url the PREVIOUS run's langFilter excluded is
  * absent from its extracted table, so it classifies as `new` here and
  * is re-fed to the (same) filter — the delta counts describe extraction
  * work, not corpus membership. Duplicate urls within one crawl multiply
  * through the classification join exactly as they would through a plain
  * extraction; dedup them upstream (url_canon + distinct) as any crawl
  * ingest does.
  */
object IncrementalExtract {

  final case class DeltaSummary(unchanged: Long, changed: Long,
                                newDocs: Long, gone: Long)

  final case class IncResult(delta: DeltaSummary, job: ExtractJob.Result)

  def deltaPath(outDir: String) = s"$outDir/delta"

  def run(spark: SparkSession, pages: DataFrame, outDir: String,
          prevOut: String, cfg: ExtractJob.Config = ExtractJob.Config()): IncResult = {
    require(prevOut != outDir,
      "--incremental needs a FRESH --out: the previous run's manifest would " +
        "mark every partition done and the delta would never be written")
    val prev = spark.read.parquet(ExtractJob.extractedPath(prevOut))
    // classification join: two narrow projections, url-keyed
    val cur = ExtractPipeline.withPartId(
        pages.filter(col("html").isNotNull).select(col("url"), col("html")),
        cfg.numParts)
      .select(col("url"), col("part_id"),
        xxhash64(col("html")).as("cur_hash"))
    val delta = cur
      .join(prev.select(col("url"), col("html_hash").as("prev_hash"),
        col("part_id").as("prev_part")), Seq("url"), "full_outer")
      .select(col("url"),
        when(col("prev_hash").isNull, "new")
          .when(col("cur_hash").isNull, "gone")
          .when(col("cur_hash") =!= col("prev_hash"), "changed")
          .otherwise("unchanged").as("status"),
        // gone urls have no current part_id: keep the previous one so the
        // tombstone stays joinable to the old manifest's partition grain
        coalesce(col("part_id"), col("prev_part")).as("part_id"))
    delta.write.mode("overwrite").parquet(deltaPath(outDir))
    val back = spark.read.parquet(deltaPath(outDir)).localCheckpoint()
    val counts = back.groupBy(col("status")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val summary = DeltaSummary(
      counts.getOrElse("unchanged", 0L), counts.getOrElse("changed", 0L),
      counts.getOrElse("new", 0L), counts.getOrElse("gone", 0L))

    // unchanged rows: previous extraction reused verbatim, but part_id
    // recomputed under THIS run's numParts (a re-crawl may repartition)
    val reuse = ExtractPipeline.withPartId(
      prev.drop(col("part_id"))
        .join(back.filter(col("status") === "unchanged").select(col("url")),
          Seq("url"), "left_semi"),
      cfg.numParts)
    // fresh input: only changed + new urls reach the scanner
    val fresh = pages.join(
      back.filter(col("status").isin("changed", "new")).select(col("url")),
      Seq("url"), "left_semi")
    val job = ExtractJob.run(spark, fresh, outDir, cfg, reuse = Some(reuse))
    IncResult(summary, job)
  }
}
