package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PII redaction as a pipeline stage — the RELEASE GATE a publicly
  * distributable corpus passes last: emails, E.164-style phone numbers
  * and IPv4 addresses in the extracted text are masked to typed
  * placeholders (`[EMAIL]` / `[PHONE]` / `[IP]`), per-document detection
  * counts are kept for audit, and the redacted view lands at
  * `<out>/pii/redacted` partitioned like the extracted table, so every
  * downstream emitter (`--export`, `--pack`, `--warc-out`) can read it in
  * place of the raw text. The regex family is q151's
  * ([[graft.queries.TextOps.q151PiiRedact]]): ASCII classes, bounded
  * repetition, `\b` boundaries — the C4/Dolma-style scrub, and the
  * Java∩RE2 dialect intersection the oracle already proved span-exact.
  *
  * Scale shape: stateless per-row projection over the extracted table —
  * zero shuffle beyond the partitioned write; counts travel, text stays
  * in its row.
  *
  * Resumable ([[StageManifest]] contract): one commit unit fingerprinted
  * on the extraction manifest — a committed run answers from the
  * manifest; a recommitted extraction recomputes.
  */
object PiiStage {

  final case class Summary(docs: Long, emails: Long, phones: Long,
                           ips: Long, docsTouched: Long)

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{2} [0-9]{3} [0-9]{6}"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def redactedPath(outDir: String) = s"$outDir/pii/redacted"
  def manifestDir(outDir: String) =
    java.nio.file.Paths.get(outDir, "pii", "_pii_manifest")

  def runResumable(spark: SparkSession, outDir: String,
                   maxUnits: Int = Int.MaxValue): Option[Summary] = {
    val fp = StageManifest.fingerprint(outDir, "pii:v1")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("pii", fp)) {
      val i = sm.info("pii")
      return Some(Summary(i("docs"), i("emails"), i("phones"), i("ips"),
        i("docs_touched")))
    }
    if (maxUnits < 1) return None
    val summary = compute(spark, outDir)
    sm.commit("pii", fp, Map(
      "docs" -> summary.docs, "emails" -> summary.emails,
      "phones" -> summary.phones, "ips" -> summary.ips,
      "docs_touched" -> summary.docsTouched))
    Some(summary)
  }

  def run(spark: SparkSession, outDir: String): Summary =
    runResumable(spark, outDir)
      .getOrElse(sys.error("unreachable: unbounded run returned partial"))

  private def compute(spark: SparkSession, outDir: String): Summary = {
    val extracted = spark.read.parquet(ExtractJob.extractedPath(outDir))
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      IpRe, "[IP]")
    extracted.select(col("url"), col("part_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("text"), lit(IpRe), lit(0)))
          .cast("long").as("n_ips"),
        red.as("red_text"))
      .write.mode("overwrite").partitionBy("part_id")
      .option("partitionOverwriteMode", "static")
      .parquet(redactedPath(outDir))
    val r = spark.read.parquet(redactedPath(outDir))
      .agg(count(lit(1)), sum(col("n_emails")), sum(col("n_phones")),
        sum(col("n_ips")),
        sum(when(col("n_emails") + col("n_phones") + col("n_ips") > 0, 1L)
          .otherwise(0L))).head()
    Summary(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
  }
}
