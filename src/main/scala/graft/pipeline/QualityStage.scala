package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Document-level QUALITY FILTERING as a pipeline stage — the gate a
  * curation run applies to the extracted table before (cheaper than)
  * dedup: word-count bounds, Gopher duplicate-token fraction, and the
  * compression-ratio band ([[graft.queries.TextOps.qualityScores]]).
  * Output at `<out>/quality/scores`, partitioned like the extracted
  * table: (url, part_id, words, dup_tok_x1000, ratio_x1000, len_ok,
  * rep_ok, compress_ok, keep) — flags, not a filtered table, so the
  * decision is auditable and the kept view is one pushed-down filter
  * away.
  *
  * Scale shape: a stateless per-row projection over the extracted scan
  * (every gate is codegen-friendly, the deflate kernel is a native
  * Expression) + one partitioned write; the summary is a low-cardinality
  * aggregate. Resumable under the [[StageManifest]] contract: one commit
  * unit fingerprinted by the extraction manifest digests + parameters.
  */
object QualityStage {

  final case class Summary(docs: Long, kept: Long, failLen: Long,
                           failRep: Long, failCompress: Long)

  def scoresPath(outDir: String) = s"$outDir/quality/scores"
  def manifestDir(outDir: String) =
    java.nio.file.Paths.get(outDir, "quality", "_quality_manifest")

  /** Resumable wrapper: a committed run with a matching fingerprint
    * answers from the manifest; `maxUnits < 1` simulates a kill before
    * the unit completes.
    */
  def runResumable(spark: SparkSession, outDir: String, minWords: Int = 20,
                   maxUnits: Int = Int.MaxValue): Option[Summary] = {
    val fp = StageManifest.fingerprint(outDir, s"quality:minWords=$minWords")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("quality", fp)) {
      val i = sm.info("quality")
      return Some(Summary(i("docs"), i("kept"), i("fail_len"),
        i("fail_rep"), i("fail_compress")))
    }
    if (maxUnits < 1) return None
    val summary = compute(spark, outDir, minWords)
    sm.commit("quality", fp, Map(
      "docs" -> summary.docs, "kept" -> summary.kept,
      "fail_len" -> summary.failLen, "fail_rep" -> summary.failRep,
      "fail_compress" -> summary.failCompress))
    Some(summary)
  }

  def run(spark: SparkSession, outDir: String, minWords: Int = 20): Summary =
    runResumable(spark, outDir, minWords)
      .getOrElse(sys.error("unreachable: unbounded run returned partial"))

  private def compute(spark: SparkSession, outDir: String,
                      minWords: Int): Summary = {
    val extracted = spark.read.parquet(ExtractJob.extractedPath(outDir))
    graft.queries.TextOps
      .qualityScores(extracted.select(col("url"), col("text")), "url", minWords)
      .join(extracted.select(col("url"), col("part_id")), Seq("url"))
      .select(col("url"), col("part_id"), col("words"),
        col("dup_tok_x1000"), col("ratio_x1000"),
        col("len_ok"), col("rep_ok"), col("compress_ok"), col("keep"))
      .write.mode("overwrite").partitionBy("part_id")
      .option("partitionOverwriteMode", "static")
      .parquet(scoresPath(outDir))
    val r = spark.read.parquet(scoresPath(outDir))
      .agg(count(lit(1)),
        sum(when(col("keep"), 1L).otherwise(0L)),
        sum(when(!col("len_ok"), 1L).otherwise(0L)),
        sum(when(!col("rep_ok"), 1L).otherwise(0L)),
        sum(when(!col("compress_ok"), 1L).otherwise(0L))).head()
    Summary(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
  }
}
