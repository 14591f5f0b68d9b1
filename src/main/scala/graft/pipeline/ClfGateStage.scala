package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.LmOps

/** MODEL-BASED quality gate as a pipeline stage — the DCLM/fastText
  * self-training pattern: the heuristic [[QualityStage]] flags become the
  * TRAINING LABELS for a hashed-feature logistic-regression classifier
  * (the q117 trainer: every cross-row accumulation a fixed-point LONG, so
  * the learned weights — and therefore the gate decisions — are
  * bit-identical on any partitioning/core count), and every document is
  * then scored by the model. The model generalizes the hand rules: its
  * score is a single margin that downstream stages can threshold, rank,
  * or importance-weight, where the heuristic gate is a hard AND of three
  * rules.
  *
  * Output at `<out>/clf/scores`, partitioned like the extracted table:
  * (url, part_id, y_heur, z_x1e6, keep) — the heuristic label, the model
  * margin in 1e-6 LONG units, and the model decision, so heuristic-vs-
  * model disagreements are one filter away (they are the audit surface:
  * exactly the docs a human reviews when tuning the gate).
  *
  * Scale shape: training pays `iters` rounds of one posexplode +
  * map-combined LONG aggregate over the 80% hash split (model rides as a
  * typedLit array, no shuffle); scoring is one stateless projection.
  * Resumable under the [[StageManifest]] contract, fingerprinted by the
  * extraction manifest + parameters (the quality stage's own fingerprint
  * input covers the label provenance).
  */
object ClfGateStage {

  final case class Summary(docs: Long, kept: Long, agree: Long,
                           lossFirst: Long, lossLast: Long, iters: Int)

  /** Default gradient iterations: measured on the synthetic corpus, the
    * model reaches 99% heuristic agreement at 48 (93% at 24, majority
    * collapse at 8 — the gate's labels are harder than q117's planted
    * vocabulary, so it needs the longer schedule).
    */
  val GateIters = 48

  def scoresPath(outDir: String) = s"$outDir/clf/scores"
  def manifestDir(outDir: String) =
    java.nio.file.Paths.get(outDir, "clf", "_clf_manifest")

  def runResumable(spark: SparkSession, outDir: String, minWords: Int = 20,
                   iters: Int = GateIters,
                   maxUnits: Int = Int.MaxValue): Option[Summary] = {
    val fp = StageManifest.fingerprint(outDir,
      s"clf:minWords=$minWords:iters=$iters:dim=${LmOps.ClfDim}")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("clf", fp)) {
      val i = sm.info("clf")
      return Some(Summary(i("docs"), i("kept"), i("agree"),
        i("loss_first"), i("loss_last"), i("iters").toInt))
    }
    if (maxUnits < 1) return None
    val summary = compute(spark, outDir, minWords, iters)
    sm.commit("clf", fp, Map(
      "docs" -> summary.docs, "kept" -> summary.kept,
      "agree" -> summary.agree, "loss_first" -> summary.lossFirst,
      "loss_last" -> summary.lossLast, "iters" -> summary.iters.toLong))
    Some(summary)
  }

  def run(spark: SparkSession, outDir: String, minWords: Int = 20,
          iters: Int = GateIters): Summary =
    runResumable(spark, outDir, minWords, iters)
      .getOrElse(sys.error("unreachable: unbounded run returned partial"))

  private def compute(spark: SparkSession, outDir: String, minWords: Int,
                      iters: Int): Summary = {
    // labels from the heuristic gate (resumable - a committed quality run
    // answers from its manifest)
    QualityStage.run(spark, outDir, minWords)
    val labels = spark.read.parquet(QualityStage.scoresPath(outDir))
      .select(col("url"), col("part_id"), col("keep"), col("words"),
        col("dup_tok_x1000"), col("ratio_x1000"))
    val extracted = spark.read
      .parquet(ExtractJob.extractedPath(outDir))
      .select(col("url"), col("text"))
    // the wire the model sees = lexical tokens + QUANTIZED SIGNAL TOKENS
    // (dup-token fraction, log-length, compression band, plus a constant
    // bias token — the model's intercept). Pure bag-of-words cannot
    // express dispersion properties like repetition; production quality
    // classifiers concatenate handcrafted signals with lexical features
    // for exactly this reason, and the signal tokens hash into the same
    // feature space as any word.
    // each signal token is emitted 16× — term frequency is the linear
    // model's only amplitude dial, and a once-per-doc token would carry
    // 1/ntok of the mass of the lexical bulk
    val sig = concat(lit(" qbias qdup"),
      floor(col("dup_tok_x1000") / 50).cast("int").cast("string"),
      lit(" qlen"), length(bin(col("words"))).cast("string"),
      lit(" qcmp"), floor(col("ratio_x1000") / 100).cast("int").cast("string"))
    val wire = concat(col("text"), repeat(sig, 16))
    // numeric doc key for the 80/20 hash split the trainer applies;
    // the url map joins scores back at the end
    val wirev = extracted.join(labels, Seq("url"))
      .select(xxhash64(col("url")).as("doc_id"),
        col("keep").cast("long").as("y"), wire.as("wire"),
        col("url"), col("part_id"))
    val feats = LmOps.clfFeatures(
      wirev.select(col("doc_id"), col("y"), col("wire")), LmOps.ClfDim)
      .localCheckpoint()
    val (w, losses) = LmOps.trainClassifier(feats, LmOps.ClfDim, iters)
    LmOps.scoreAll(feats, w)
      .join(wirev.select(col("doc_id"), col("url"), col("part_id")),
        Seq("doc_id"))
      .select(col("url"), col("part_id"), (col("y") === 1L).as("y_heur"),
        col("z_x1e6"), col("pred").as("keep"))
      .write.mode("overwrite").partitionBy("part_id")
      .option("partitionOverwriteMode", "static")
      .parquet(scoresPath(outDir))
    val r = spark.read.parquet(scoresPath(outDir))
      .agg(count(lit(1)),
        sum(when(col("keep"), 1L).otherwise(0L)),
        sum(when(col("keep") === col("y_heur"), 1L).otherwise(0L))).head()
    Summary(r.getLong(0), r.getLong(1), r.getLong(2),
      losses.head, losses.last, iters)
  }
}
