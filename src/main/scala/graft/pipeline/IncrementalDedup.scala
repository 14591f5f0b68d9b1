package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL content-level dedup across corpus RELEASES — the missing
  * production twin of [[DedupStage]] (which closes clusters WITHIN one
  * corpus) and [[IncrementalExtract]] (which skips url-level unchanged
  * pages): a recurring crawl must also drop increment docs whose CONTENT
  * duplicates the previous release, and at 100 TB it cannot afford to
  * re-read (let alone re-shingle) the released text to do it. The
  * contract here is therefore split in two:
  *
  *   - [[buildIndex]] runs ONCE per release: it persists a SIGNATURE
  *     INDEX — (url, doc_id, fp = md5 of the text bytes, h0..h7 = the
  *     MinHash signature; [[graft.queries.TextOps.signatureIndex]]) —
  *     under `<out>/dedup/signatures`. Constant bytes per doc,
  *     independent of document size: the only thing the next increment
  *     ever needs from this corpus.
  *   - [[dedupAgainst]] runs per increment: it dedups THIS run's
  *     extracted docs against a PREVIOUS run's persisted index — exact
  *     md5 matches, then LSH-band candidates verified by
  *     sketch-estimated Jaccard (matching-minhash fraction) — and writes
  *     the per-doc decision table to `<out>/dedup/incremental`. It reads
  *     `prevOut`'s signatures artifact ONLY; PipelineSpec proves this by
  *     deleting the release's text before the batch run.
  *
  * Both halves commit through a [[StageManifest]] (same idempotence
  * contract as the other curation stages): a fully committed unit
  * answers from the manifest without recompute, and a fingerprint
  * mismatch (recommitted extraction partitions, different threshold or
  * upstream index) wipes and recomputes rather than mixing generations.
  *
  * Scale shape: the index is one signature pass over the release (one
  * explode→groupBy shuffle) paid once; each increment pays the same pass
  * over ONLY its own docs, one fp equi-join, one melted-band equi-join
  * (increment side broadcast-able) and an 8-comparison agreement on
  * candidates. Nothing is all-pairs; released text is never re-read.
  */
object IncrementalDedup {

  final case class IndexSummary(docs: Long, shingled: Long)
  final case class BatchSummary(docs: Long, exactDups: Long, nearDups: Long,
                                kept: Long)

  def signaturesPath(outDir: String) = s"$outDir/dedup/signatures"
  def incrementalPath(outDir: String) = s"$outDir/dedup/incremental"
  private def manifestDir(outDir: String) =
    java.nio.file.Paths.get(outDir, "dedup", "_incremental_manifest")

  /** The corpus a release publishes: the deduped kept view when
    * [[DedupStage]] ran, else the raw extracted table.
    */
  private def releaseCorpus(spark: SparkSession, outDir: String): DataFrame = {
    val kept = new java.io.File(DedupStage.keptPath(outDir))
    if (kept.isDirectory && kept.list().nonEmpty)
      spark.read.parquet(DedupStage.keptPath(outDir))
    else spark.read.parquet(ExtractJob.extractedPath(outDir))
  }

  /** Build + persist the release's signature index. Idempotent: a
    * committed index with a matching fingerprint answers from the
    * manifest; a stale fingerprint (recommitted extraction) is wiped and
    * rebuilt.
    */
  def buildIndex(spark: SparkSession, outDir: String): IndexSummary = {
    val fp = StageManifest.fingerprint(outDir, "dedup-index")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("signatures", fp)) {
      val i = sm.info("signatures")
      return IndexSummary(i("docs"), i("shingled"))
    }
    val docs = releaseCorpus(spark, outDir)
      .select(col("url"), xxhash64(col("url")).as("doc_id"), col("text"))
    val idx = docs.select(col("url"), col("doc_id"))
      .join(graft.queries.TextOps.signatureIndex(
        docs.select(col("doc_id"), col("text"))), Seq("doc_id"))
    idx.write.mode("overwrite").parquet(signaturesPath(outDir))
    val back = spark.read.parquet(signaturesPath(outDir))
    val s = IndexSummary(back.count(),
      back.where(col("h0").isNotNull).count())
    sm.commit("signatures", fp,
      Map("docs" -> s.docs, "shingled" -> s.shingled))
    s
  }

  /** Dedup THIS run's extracted docs against `prevOut`'s persisted
    * signature index. Writes (url, decision, match_id, match_url,
    * agree_x1000) to `<outDir>/dedup/incremental`; decisions follow
    * [[graft.queries.TextOps.incrementalDedupAgainst]] (exact_dup |
    * near_dup | kept, keeper = min frozen doc_id, sentinels -1/0 on
    * kept rows — match_url additionally resolves the keeper's url from
    * the index, empty on kept rows).
    */
  def dedupAgainst(spark: SparkSession, outDir: String, prevOut: String,
                   thresholdX1000: Long = 500L): BatchSummary = {
    val prevSm = new StageManifest(manifestDir(prevOut))
    val prevFp = prevSm.committed("signatures").getOrElse(sys.error(
      s"no committed signature index at $prevOut — run buildIndex " +
        "(--dedup-index) on the release first"))
    val fp = StageManifest.fingerprint(outDir,
      s"dedup-against:$thresholdX1000:$prevFp")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("incremental", fp)) {
      val i = sm.info("incremental")
      return BatchSummary(i("docs"), i("exact_dups"), i("near_dups"),
        i("kept"))
    }
    val frozen = spark.read.parquet(signaturesPath(prevOut))
    val batch = spark.read.parquet(ExtractJob.extractedPath(outDir))
      .select(col("url"), xxhash64(col("url")).as("doc_id"), col("text"))
      .localCheckpoint() // read twice: decisions + url join-back
    val decisions = graft.queries.TextOps.incrementalDedupAgainst(
      frozen.select((Seq("doc_id", "fp") ++
        (0 until 8).map(i => s"h$i")).map(col): _*),
      batch.select(col("doc_id"), col("text")), thresholdX1000)
    decisions
      .join(batch.select(col("doc_id"), col("url")), Seq("doc_id"))
      .join(frozen.select(col("doc_id").as("match_id"),
        col("url").as("match_url")), Seq("match_id"), "left")
      .select(col("url"), col("decision"), col("match_id"),
        coalesce(col("match_url"), lit("")).as("match_url"),
        col("agree_x1000"))
      .write.mode("overwrite").parquet(incrementalPath(outDir))
    val back = spark.read.parquet(incrementalPath(outDir))
    val r = back.agg(count(lit(1)),
      sum(when(col("decision") === "exact_dup", 1L).otherwise(0L)),
      sum(when(col("decision") === "near_dup", 1L).otherwise(0L)),
      sum(when(col("decision") === "kept", 1L).otherwise(0L))).head()
    val s = BatchSummary(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    sm.commit("incremental", fp, Map("docs" -> s.docs,
      "exact_dups" -> s.exactDups, "near_dups" -> s.nearDups,
      "kept" -> s.kept))
    s
  }
}
