package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NO-SPLIT training-shard packing as a pipeline stage — the alternative
  * last mile to [[ExportStage]]: where `--export` tiles the token stream
  * and may split a document across shard boundaries, `--pack` bin-packs
  * whole documents into `cap`-token bins by distributed
  * first-fit-decreasing (the q126 operator,
  * [[graft.queries.CurationOps.binPack]] — see its doc for the
  * algorithm, the one-shuffle distribution shape, and the FFD
  * half-empty invariant). Document integrity is what attention-mask /
  * no-cross-doc-contamination training setups require.
  *
  * Output: per-doc assignment at `<out>/pack/assign` (url, bucket,
  * bin_id, n_tokens, pack_ok) and a distributed bin-manifest TABLE at
  * `<out>/pack/bins` (bucket, bin_id, docs, fill) — like the export
  * shard manifest, never a driver collect. Resumable under the
  * [[StageManifest]] contract: one commit unit fingerprinted by the
  * upstream digests + parameters; re-runs are byte-identical (the
  * packing is deterministic at any arrival order — total-order sort
  * inside each bucket).
  *
  * The url key rides through the packing kernel directly (the kernel is
  * typed on the id column, so no hash-surrogate join is needed and a
  * hash collision cannot mis-assign a document).
  */
object PackStage {

  final case class Summary(docs: Long, tokens: Long, bins: Long,
                           maxFill: Long, allOk: Boolean)

  def assignPath(outDir: String) = s"$outDir/pack/assign"
  def binsPath(outDir: String) = s"$outDir/pack/bins"
  def manifestDir(outDir: String) =
    java.nio.file.Paths.get(outDir, "pack", "_pack_manifest")

  def runResumable(spark: SparkSession, outDir: String, cap: Int,
                   nBuckets: Int = 16,
                   maxUnits: Int = Int.MaxValue): Option[Summary] = {
    val fp = StageManifest.fingerprint(outDir, s"pack:cap=$cap:b=$nBuckets")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("pack", fp)) {
      val i = sm.info("pack")
      return Some(Summary(i("docs"), i("tokens"), i("bins"), i("max_fill"),
        i("all_ok") == 1L))
    }
    if (maxUnits < 1) return None
    val summary = compute(spark, outDir, cap, nBuckets)
    sm.commit("pack", fp, Map(
      "docs" -> summary.docs, "tokens" -> summary.tokens,
      "bins" -> summary.bins, "max_fill" -> summary.maxFill,
      "all_ok" -> (if (summary.allOk) 1L else 0L)))
    Some(summary)
  }

  def run(spark: SparkSession, outDir: String, cap: Int,
          nBuckets: Int = 16): Summary =
    runResumable(spark, outDir, cap, nBuckets)
      .getOrElse(sys.error("unreachable: unbounded run returned partial"))

  private def compute(spark: SparkSession, outDir: String, cap: Int,
                      nBuckets: Int): Summary = {
    // same source precedence as --export/--index: the deduped kept view
    // when one exists, else the raw extracted table
    val kept = new java.io.File(DedupStage.keptPath(outDir))
    val src =
      if (kept.isDirectory && kept.list().nonEmpty)
        spark.read.parquet(DedupStage.keptPath(outDir))
      else spark.read.parquet(ExtractJob.extractedPath(outDir))
    val sized = src.select(col("url").as("doc_id"),
      size(split(lower(trim(col("text"))), graft.queries.TextOps.WS))
        .as("n_tokens"))
    val assigned = graft.queries.CurationOps.binPack(sized, cap, nBuckets)
      .withColumnRenamed("doc_id", "url")
      .localCheckpoint() // feeds the write, the bins table, and the summary
    assigned
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("bin_id"), col("url"))
      .write.mode("overwrite").parquet(assignPath(outDir))
    val bins = assigned.groupBy(col("bucket"), col("bin_id"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("fill"))
      .localCheckpoint() // one aggregate feeds the manifest and the summary
    bins.sort(col("bucket"), col("bin_id"))
      .write.mode("overwrite").parquet(binsPath(outDir))
    val s = assigned.agg(count(lit(1)), sum(col("n_tokens")),
      min(col("pack_ok").cast("int"))).head()
    val b = bins.agg(count(lit(1)), max(col("fill"))).head()
    Summary(s.getLong(0), s.getLong(1), b.getLong(0), b.getLong(1),
      s.getInt(2) == 1)
  }
}
