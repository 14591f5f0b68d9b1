package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** C4-style span-level cleanup as a pipeline stage (Raffel et al. 2020
  * §2.2): over the committed extracted table, every `spanTokens`-token
  * span that occurs more than once corpus-wide is kept only at its first
  * occurrence (smallest (url, position)), and each document's text is
  * REBUILT from its surviving spans — the step that strips cross-page
  * boilerplate (navigation crumbs, cookie banners, licence blocks) without
  * dropping documents, complementing [[DedupStage]]'s whole-document
  * clusters. Output at `<out>/dedup/span_clean`, partitioned like the
  * extracted table: (url, part_id, n_spans, n_dropped, clean_text).
  *
  * Note the rebuilt text is token-normalized (lowercased, single-space) —
  * the span identity must be; a byte-faithful variant would carry span
  * offsets instead, which is exactly what the extraction output's `spans`
  * column already provides for the document grain.
  *
  * Scale shape ([[graft.queries.TextOps.spanDedup]]): one explode to
  * (span, url, pos), one window shuffle keyed on the span (global-first =
  * min over that key; at 100 TB hash the span first so the key is 128-bit,
  * not text), one per-doc rebuild aggregate, one partitioned write.
  */
object SpanCleanStage {

  final case class Summary(docs: Long, spans: Long, spansDropped: Long,
                           docsTouched: Long)

  def cleanedPath(outDir: String) = s"$outDir/dedup/span_clean"
  def manifestDir(outDir: String) =
    java.nio.file.Paths.get(outDir, "dedup", "_span_clean_manifest")

  /** Resumable wrapper ([[StageManifest]] contract, round-4 verdict item
    * 2): the span window is one global computation, so the stage is a
    * single commit unit — a committed run with a matching input
    * fingerprint answers from the manifest without recomputing; a
    * fingerprint change (recommitted extraction, different span length)
    * recomputes and overwrites. `maxUnits < 1` simulates a kill before
    * the unit completes.
    */
  def runResumable(spark: SparkSession, outDir: String, spanTokens: Int = 10,
                   maxUnits: Int = Int.MaxValue): Option[Summary] = {
    val fp = StageManifest.fingerprint(outDir, s"span_clean:n=$spanTokens")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("span_clean", fp)) {
      val i = sm.info("span_clean")
      return Some(Summary(i("docs"), i("spans"), i("spans_dropped"),
        i("docs_touched")))
    }
    if (maxUnits < 1) return None
    val summary = compute(spark, outDir, spanTokens)
    sm.commit("span_clean", fp, Map(
      "docs" -> summary.docs, "spans" -> summary.spans,
      "spans_dropped" -> summary.spansDropped,
      "docs_touched" -> summary.docsTouched))
    Some(summary)
  }

  def run(spark: SparkSession, outDir: String,
          spanTokens: Int = 10): Summary =
    runResumable(spark, outDir, spanTokens)
      .getOrElse(sys.error("unreachable: unbounded run returned partial"))

  private def compute(spark: SparkSession, outDir: String,
                      spanTokens: Int): Summary = {
    val extracted = spark.read.parquet(ExtractJob.extractedPath(outDir))
    graft.queries.TextOps
      .spanDedup(extracted.select(col("url"), col("text")), "url", spanTokens)
      .join(extracted.select(col("url"), col("part_id")), Seq("url"))
      .select(col("url"), col("part_id"), col("n_spans"), col("n_dropped"),
        col("clean_text"))
      .write.mode("overwrite").partitionBy("part_id")
      .option("partitionOverwriteMode", "static")
      .parquet(cleanedPath(outDir))
    val r = spark.read.parquet(cleanedPath(outDir))
      .agg(count(lit(1)), sum(col("n_spans")), sum(col("n_dropped")),
        sum(when(col("n_dropped") > 0, 1L).otherwise(0L))).head()
    Summary(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }
}
