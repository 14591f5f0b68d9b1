package graft.pipeline

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.CurationOps

/** CALIBRATED weighted corpus sampling as a pipeline stage — the last
  * mile between [[ClfGateStage]]'s raw margins and a training draw. A
  * raw classifier margin is NOT a probability: thresholding it (the clf
  * gate) keeps a hard set, but a weighted draw that treats margins as
  * weights over- or under-samples entire quality strata. This stage
  * (1) CALIBRATES: buckets the margin, measures the heuristic-agreement
  * rate per bucket, and fits the monotone score→P(quality) map by
  * pool-adjacent-violators in exact rational arithmetic (the q137
  * operator, [[CurationOps.pav]]); then (2) DRAWS: each document gets
  * `1 + floor(63·p)` integer lottery tickets (md5 of (url, ticket-index)
  * — the q118 race, first-draw probability exactly ∝ weight, no float
  * anywhere), and the winners are the `n` smallest ticket minima.
  *
  * Output: `<out>/sample/picks` — (url, part_id, bucket, p_x1e6, w, key)
  * for the n winners. Resumable under the [[StageManifest]] contract,
  * fingerprinted by the upstream manifest digests + parameters; the draw
  * is deterministic (hash tickets, total-order tie-break), so re-runs
  * are byte-identical and first-rename-wins semantics hold everywhere.
  *
  * Scale shape: one O(1) min/max read-back, one map-combined
  * B-bucket aggregate, an O(B) driver PAV, the B-row calibration table
  * broadcast back, a stateless ticket projection, and
  * TakeOrderedAndProject for the top-n — the corpus never shuffles.
  */
object SampleStage {

  final case class Summary(docs: Long, sampled: Long, buckets: Int,
                           pMinX1e6: Long, pMaxX1e6: Long)

  val Buckets = 16

  def picksPath(outDir: String) = s"$outDir/sample/picks"
  def manifestDir(outDir: String) =
    java.nio.file.Paths.get(outDir, "sample", "_sample_manifest")

  def runResumable(spark: SparkSession, outDir: String, n: Int,
                   minWords: Int = 20, iters: Int = ClfGateStage.GateIters,
                   maxUnits: Int = Int.MaxValue): Option[Summary] = {
    val fp = StageManifest.fingerprint(outDir,
      s"sample:n=$n:b=$Buckets:minWords=$minWords:iters=$iters")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("sample", fp)) {
      val i = sm.info("sample")
      return Some(Summary(i("docs"), i("sampled"), i("buckets").toInt,
        i("p_min_micro"), i("p_max_micro")))
    }
    if (maxUnits < 1) return None
    val summary = compute(spark, outDir, n, minWords, iters)
    sm.commit("sample", fp, Map(
      "docs" -> summary.docs, "sampled" -> summary.sampled,
      // manifest keys must match StageManifest.info's [a-z_]+ key grammar
      "buckets" -> summary.buckets.toLong,
      "p_min_micro" -> summary.pMinX1e6, "p_max_micro" -> summary.pMaxX1e6))
    Some(summary)
  }

  def run(spark: SparkSession, outDir: String, n: Int, minWords: Int = 20,
          iters: Int = ClfGateStage.GateIters): Summary =
    runResumable(spark, outDir, n, minWords, iters)
      .getOrElse(sys.error("unreachable: unbounded run returned partial"))

  private def compute(spark: SparkSession, outDir: String, n: Int,
                      minWords: Int, iters: Int): Summary = {
    // scores from the model gate (resumable — a committed clf run
    // answers from its manifest and its parquet is reread here)
    ClfGateStage.run(spark, outDir, minWords, iters)
    val scores = spark.read.parquet(ClfGateStage.scoresPath(outDir))
      .select(col("url"), col("part_id"), col("y_heur"), col("z_x1e6"))
      .localCheckpoint() // one read feeds range, histogram, and the draw
    // margin range: O(1) read-back; degenerate range ⇒ one bucket
    val mm = scores.agg(min(col("z_x1e6")), max(col("z_x1e6"))).head()
    val (zMin, zMax) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, zMax - zMin + 1)
    // `div` (integer floor), never `/` (double) — a bucket id must be exact
    val bucketOf: Column => Column = _ =>
      expr(s"CAST(least(${Buckets - 1}, " +
        s"((z_x1e6 - ${zMin}L) * ${Buckets}L) div ${span}L) AS BIGINT)")
    // per-bucket (n, heuristic-agreements), ascending margin order; PAV
    // fits the monotone calibration over them (exact rationals)
    val hist = scores
      .groupBy(bucketOf(col("z_x1e6")).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y_heur"), 1L).otherwise(0L)).as("pos"))
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fit = CurationOps.pav(hist.map { case (_, c, p) => (c, p) }.toSeq)
    import spark.implicits._
    val calib = hist.zip(fit).map { case ((b, _, _), (fn, fy)) =>
      // integer tickets 1..64 from the exact rational p = fy/fn; the
      // x1e6 rendering is reporting only — no float enters the draw
      (b, 1L + 63L * fy / fn, math.round(1e6 * fy.toDouble / fn.toDouble))
    }.toSeq.toDF("bucket", "w", "p_x1e6")
    val ticket = (i: Column) => conv(substring(md5(
      concat(col("url"), lit("#"), i.cast("string")).cast("binary")),
      1, 15), 16, 10).cast("long")
    val picks = scores
      .withColumn("bucket", bucketOf(col("z_x1e6")))
      .join(broadcast(calib), "bucket")
      .withColumn("key",
        array_min(transform(sequence(lit(0L), col("w") - 1), ticket)))
      .orderBy(col("key"), col("url"))
      .limit(n)
      .select(col("url"), col("part_id"), col("bucket"), col("p_x1e6"),
        col("w"), col("key"))
    picks.write.mode("overwrite").parquet(picksPath(outDir))
    val docs = scores.count()
    val sampled = spark.read.parquet(picksPath(outDir)).count()
    val ps = calib.agg(min(col("p_x1e6")), max(col("p_x1e6"))).head()
    Summary(docs, sampled, Buckets, ps.getLong(0), ps.getLong(1))
  }
}
