package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard export — the last mile of a curation pipeline: the kept
  * corpus written as token-bounded JSONL.gz shards a trainer streams
  * directly (one shard ≈ one data-loader unit, sized in TOKENS because
  * that is the unit training budgets are written in).
  *
  * Shard assignment is a deterministic global token prefix-sum in
  * (bucket, hash, id) order, computed WITHOUT a single-partition window:
  * per-bucket token sums (one map-combined aggregate, `buckets` rows)
  * are prefix-summed on the driver (O(buckets), the established O(1)-ish
  * read-back), broadcast back as bucket offsets, and each bucket then
  * runs its own within-bucket cumulative window in parallel — the
  * two-level distributed prefix sum. A document is never split, so a
  * shard can exceed the budget only by the tail of its last document
  * (or when one document alone exceeds it).
  *
  * Every shard directory receives exactly one gzip file (the shard id is
  * the repartition key), rows inside are hash-ordered, so re-runs are
  * byte-identical — the property that makes shard manifests cacheable.
  *
  * Scale shape: one narrow token count, one `buckets`-row aggregate, one
  * bucket-keyed window shuffle, one shard-keyed write shuffle. At 100 TB
  * raise `buckets` so each bucket's window fits an executor (the window
  * state is one running long, the sort is the shuffle's sort) — there is
  * no global-order bottleneck anywhere.
  */
object ExportStage {

  final case class Summary(docs: Long, tokens: Long, shards: Long,
                           maxShardTokens: Long)

  def exportPath(outDir: String) = s"$outDir/export"
  def shardManifestPath(outDir: String) = s"$outDir/export_shards"
  def manifestDir(outDir: String) =
    java.nio.file.Paths.get(outDir, "_export_manifest")

  /** Deterministic 48-bit per-doc hash both engines can compute (the
    * q54/q88 md5-conv idiom) — the global shuffle order of the corpus.
    */
  private def hashOf(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long")

  /** The operator proper: assign every document a shard id such that
    * cumulative tokens-before in (bucket, hash, id) order tile the
    * corpus into `tokensPerShard`-sized shards. Adds columns
    * `tok_len, h, b, cum_before, shard`; never reorders or drops rows.
    */
  def shardAssign(docs: DataFrame, idCol: String, textCol: String,
                  tokensPerShard: Long, buckets: Int = 64): DataFrame = {
    require(tokensPerShard > 0 && buckets > 0)
    val d = docs
      .withColumn("tok_len",
        size(split(lower(trim(col(textCol))), graft.queries.TextOps.WS))
          .cast("long"))
      .withColumn("h", hashOf(col(idCol)))
      .withColumn("b", pmod(col("h"), lit(buckets.toLong)))
    // two-level prefix sum: O(buckets) driver read-back, never the corpus
    val sums = d.groupBy(col("b")).agg(sum(col("tok_len")).as("bt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.scanLeft((0L, 0L)) { case ((_, acc), (b, bt)) =>
      (b, acc + bt)
    }.sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("b", "off")
    val w = Window.partitionBy(col("b")).orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(offDf), Seq("b"))
      .withColumn("cum_before",
        coalesce(sum(col("tok_len")).over(w), lit(0L)) + col("off"))
      .withColumn("shard",
        floor(col("cum_before") / tokensPerShard).cast("long"))
      .drop("off")
  }

  /** Resumable wrapper ([[StageManifest]] contract): the assignment is
    * one global computation, so the stage is a single commit unit.
    */
  def runResumable(spark: SparkSession, outDir: String,
                   tokensPerShard: Long, buckets: Int = 64,
                   maxUnits: Int = Int.MaxValue): Option[Summary] = {
    val fp = StageManifest.fingerprint(outDir,
      s"export:t=$tokensPerShard:b=$buckets")
    val sm = new StageManifest(manifestDir(outDir))
    if (sm.isCommitted("export", fp)) {
      val i = sm.info("export")
      return Some(Summary(i("docs"), i("tokens"), i("shards"),
        i("max_shard_tokens")))
    }
    if (maxUnits < 1) return None
    val summary = compute(spark, outDir, tokensPerShard, buckets)
    sm.commit("export", fp, Map(
      "docs" -> summary.docs, "tokens" -> summary.tokens,
      "shards" -> summary.shards,
      "max_shard_tokens" -> summary.maxShardTokens))
    Some(summary)
  }

  def run(spark: SparkSession, outDir: String, tokensPerShard: Long,
          buckets: Int = 64): Summary =
    runResumable(spark, outDir, tokensPerShard, buckets)
      .getOrElse(sys.error("unreachable: unbounded run returned partial"))

  private def compute(spark: SparkSession, outDir: String,
                      tokensPerShard: Long, buckets: Int): Summary = {
    // the curated kept view when the dedup stage produced one, else the
    // raw extracted table — same precedence as --index
    val kept = new java.io.File(DedupStage.keptPath(outDir))
    val src =
      if (kept.isDirectory && kept.list().nonEmpty)
        spark.read.parquet(DedupStage.keptPath(outDir))
      else spark.read.parquet(ExtractJob.extractedPath(outDir))
    val assigned = shardAssign(
      src.select(col("url"), col("text"), col("text_sha")),
      "url", "text", tokensPerShard, buckets)
    assigned
      .select(col("shard"), col("h"),
        to_json(struct(col("url"), col("text_sha"), col("tok_len"),
          col("text"))).as("line"))
      .repartition(col("shard")) // one task per shard ⇒ one file per dir
      .sortWithinPartitions(col("shard"), col("h"))
      .select(col("shard"), col("line"))
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "gzip")
      .text(exportPath(outDir))
    // the train-loader contract: a shard manifest TABLE (shard → docs,
    // tokens) written distributed — at corpus scale the shard count is
    // itself large, so the manifest must never be a driver collect
    val perShard = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("docs"), sum(col("tok_len")).as("tokens"))
      .localCheckpoint() // one aggregate feeds the manifest and the summary
    perShard.sort(col("shard")) // range-partitioned: stays parallel when
      .write.mode("overwrite")  // the shard count is itself corpus-scale
      .parquet(shardManifestPath(outDir))
    val r = perShard
      .agg(sum(col("docs")), sum(col("tokens")), count(lit(1)),
        max(col("tokens"))).head()
    Summary(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }
}
