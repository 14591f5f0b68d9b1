package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optional post-extraction CURATION stage — the composition the round-3
  * verdict asked for: the extraction job's committed output feeds the
  * production dedup API ([[graft.queries.ClusterOps.dedupClusters]]: exact
  * md5 stars ∪ threshold-derived MinHash candidates, exact-Jaccard
  * verified, component-closed) and emits
  *
  *   - `<out>/dedup/clusters`    — (url, part_id, doc_id, cluster_id,
  *     cluster_size, is_keeper) for every extracted doc (singleton docs
  *     carry null cluster_id and is_keeper = true);
  *   - `<out>/dedup/kept`        — the keepers-only corpus view (the table
  *     a training pipeline consumes), partitioned like the extracted
  *     output;
  *   - `<out>/dedup/accounting`  — per input partition: docs,
  *     clustered_docs, dups_dropped, kept — the dedup analog of the
  *     extraction manifest rows, keyed by the same part_id.
  *
  * Scale shape: one 64-bit url-hash id projection, the dedupClusters
  * closure (bucketed candidates only, O(log² n) component rounds), one
  * left join back on doc_id, one anti-join for the kept view, one
  * low-cardinality accounting aggregate. Nothing here is all-pairs and no
  * collect exceeds the O(1) summary read-back.
  */
object DedupStage {

  final case class Summary(docs: Long, clusteredDocs: Long, clusters: Long,
                           dupsDropped: Long, kept: Long)

  def clustersPath(outDir: String) = s"$outDir/dedup/clusters"
  def keptPath(outDir: String) = s"$outDir/dedup/kept"
  def accountingPath(outDir: String) = s"$outDir/dedup/accounting"

  def run(spark: SparkSession, outDir: String,
          threshold: Double = 0.8): Summary = {
    val extracted = spark.read.parquet(ExtractJob.extractedPath(outDir))
    // stable numeric id for the closure: 64-bit url hash (the keeper rule
    // "min doc_id" then means "min url hash" — arbitrary but deterministic;
    // collision odds n²/2⁶⁵ are negligible below ~10⁸ docs per run)
    val docs = extracted
      .select(col("url"), col("part_id"), col("text"),
        xxhash64(col("url")).as("doc_id"))
      .localCheckpoint() // read twice: edge building + the join back
    val clusters = graft.queries.ClusterOps.dedupClusters(
      docs.select(col("doc_id"), col("text")), threshold)
    docs.select(col("url"), col("part_id"), col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("url"), col("part_id"), col("doc_id"), col("cluster_id"),
        col("cluster_size"),
        coalesce(col("is_keeper"), lit(true)).as("is_keeper"))
      .write.mode("overwrite").parquet(clustersPath(outDir))
    val back = spark.read.parquet(clustersPath(outDir))
    // keepers-only corpus: drop every non-keeper from the extracted table.
    // STATIC overwrite pinned per-write: this is a full rewrite of the
    // view, so stale part_id dirs from a previous run with more partitions
    // must be truncated even if the session was left in dynamic mode by an
    // earlier stage (round-4 review finding)
    extracted
      .join(back.filter(!col("is_keeper")).select(col("url")),
        Seq("url"), "left_anti")
      .write.mode("overwrite").partitionBy("part_id")
      .option("partitionOverwriteMode", "static")
      .parquet(keptPath(outDir))
    // per-partition accounting — the dedup counts the manifest consumer
    // joins on part_id
    back.groupBy(col("part_id"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L)).as("clustered_docs"),
        sum(when(!col("is_keeper"), 1L).otherwise(0L)).as("dups_dropped"),
        sum(when(col("is_keeper"), 1L).otherwise(0L)).as("kept"))
      .write.mode("overwrite").parquet(accountingPath(outDir))
    val acct = spark.read.parquet(accountingPath(outDir))
      .agg(sum(col("docs")), sum(col("clustered_docs")),
        sum(col("dups_dropped")), sum(col("kept"))).head()
    val nClusters = back.filter(col("cluster_id").isNotNull)
      .select(col("cluster_id")).distinct().count()
    Summary(acct.getLong(0), acct.getLong(1), nClusters,
      acct.getLong(2), acct.getLong(3))
  }
}
