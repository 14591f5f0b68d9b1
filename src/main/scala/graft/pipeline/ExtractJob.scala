package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.AccumulatorV2
import scala.collection.concurrent.TrieMap

/** Per-partition (bytes, docs) counters merged at the driver. Accumulator
  * updates can double-count on task retry, so these feed only the
  * informational `bytes` metric; `docs`/`nodes` in the manifest come from an
  * exact read-back of the committed output.
  */
final class PartBytesAcc extends AccumulatorV2[(Int, Long), Map[Int, Long]] {
  private val m = TrieMap.empty[Int, Long]
  override def isZero: Boolean = m.isEmpty
  override def copy(): PartBytesAcc = {
    val c = new PartBytesAcc
    m.foreach { case (k, v) => c.m.put(k, v) }
    c
  }
  override def reset(): Unit = m.clear()
  override def add(v: (Int, Long)): Unit =
    m.updateWith(v._1) { case Some(x) => Some(x + v._2); case None => Some(v._2) }
  override def merge(o: AccumulatorV2[(Int, Long), Map[Int, Long]]): Unit =
    o.value.foreach { case (k, v) => add((k, v)) }
  override def value: Map[Int, Long] = m.toMap
}

/** The spark-submit batch job of the north_rule: read pages → tokenize →
  * extract → write per-partition with checkpoint/resume (SURVEY.md §3.4,
  * §2.k/§2.l).
  *
  * Unit of commit = one url-hash partition (`part_id`). Partitions are
  * processed in batches; each batch is one Spark write (dynamic partition
  * overwrite → idempotent under retry/re-run) followed by a manifest commit.
  * Resume = skip committed part_ids; a killed job recomputes only
  * uncommitted partitions and the final output is byte-identical to an
  * uninterrupted run (resume test, FIXTURES.md/BASELINE.md).
  */
object ExtractJob {

  final case class Config(
      numParts: Int = 32,
      batchSize: Int = 8,
      /** slices per batch for the pre-parse spread (0 → 3× default parallelism) */
      repartitionSlices: Int = 0,
      langFilter: Option[String] = None,
      inputSnapshot: String = "synthetic",
      codeVer: String = "0.1.0",
      /** stop after this many batches (kill-simulation for the resume test) */
      maxBatches: Int = Int.MaxValue,
      /** pathological-page guard: docs whose html exceeds this are excluded
        * from extraction (counted via `observe`, reported in Result). At
        * crawl scale a handful of near-2GB pages would otherwise pin whole
        * executors (and byte offsets are Int-bounded) — route them to a
        * quarantine pass instead of the main job.
        */
      maxDocBytes: Long = 512L * 1024 * 1024,
      /** boilerplate-strip policy for this job (tag sets, link gate,
        * entity set) — defaults to the fixture-pinned policy
        */
      extract: graft.core.Extractor.ExtractConfig = graft.core.Extractor.DefaultConfig,
      /** opt-in: sniff + transcode non-UTF-8 pages before scanning; span
        * offsets then index the transcoded bytes (ExtractPipeline note)
        */
      transcodeNonUtf8: Boolean = false)

  final case class Result(batchesRun: Int, partsCommitted: Seq[Int],
      oversizedSkipped: Long = 0L,
      /** rows observed entering the write (df.observe), summed over batches —
        * cross-checked against the read-back manifest docs as a write audit
        */
      docsObserved: Long = 0L)

  def extractedPath(outDir: String) = s"$outDir/extracted"

  /** `reuse`: pre-extracted rows (the full `extracted` schema incl.
    * part_id) merged into each batch's write WITHOUT re-running the
    * scanner — the incremental re-crawl path feeds unchanged documents
    * through here ([[IncrementalExtract]]). Rows are filtered to the
    * batch's part_ids so each dynamic-partition overwrite stays complete:
    * a partition dir must be written with fresh ∪ reused in ONE commit,
    * or the second write would clobber the first.
    */
  def run(spark: SparkSession, pages: DataFrame, outDir: String,
          cfg: Config = Config(), reuse: Option[DataFrame] = None): Result = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // multi-KB binary html rows: cap reader batches at ~1MB instead of the
    // default 4096 rows (~13MB humongous G1 allocations per batch per task)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "256")
    val committer = new LocalManifestCommitter(outDir)

    val filtered = cfg.langFilter match {
      case Some(l) => pages.filter(col("lang") === l) // pushed to the scan
      case None    => pages
    }
    val oversized = spark.sparkContext.longAccumulator("oversizedDocs")
    val withPart = ExtractPipeline.withPartId(
      filtered.filter(col("html").isNotNull).select(col("url"), col("html")),
      cfg.numParts)

    val done = committer.done()
    val pending = (0 until cfg.numParts).filterNot(done)
    val slices =
      if (cfg.repartitionSlices > 0) cfg.repartitionSlices
      else spark.sparkContext.defaultParallelism * 3
    var batchesRun = 0
    var totalObserved = 0L
    val committed = Seq.newBuilder[Int]

    pending.grouped(cfg.batchSize).takeWhile(_ => batchesRun < cfg.maxBatches)
      .foreach { batch =>
        val t0 = System.nanoTime()
        val bytesAcc = new PartBytesAcc
        spark.sparkContext.register(bytesAcc, s"htmlBytes-batch$batchesRun")

        val sub = withPart.filter(col("part_id").isin(batch: _*))
        // even row spread by url inside the batch — giant pages land alone,
        // not stacked on one task (row-cost skew mitigation, SURVEY.md §2.k)
        import spark.implicits._
        val extracted = sub.repartition(slices, col("url"))
          .as[PageSlice]
          .mapPartitions(_.map { p =>
            bytesAcc.add((p.part_id, p.html.length.toLong))
            if (p.html.length > cfg.maxDocBytes) {
              // pathological-page guard: quarantine marker, dropped below
              oversized.add(1L)
              ExtractedRow(p.url, "", "", Array.empty, -1, 0L, p.part_id)
            } else ExtractPipeline.extractOne(p, cfg.extract, cfg.transcodeNonUtf8)
          })

        // streamside metrics (SURVEY.md §2.B.d): observe counts rows as they
        // flow into the write — no extra pass; compared below against the
        // committed files as a write audit
        val obs = org.apache.spark.sql.Observation(s"extract-batch$batchesRun")
        val freshDF = extracted.toDF()
          .filter(col("node_count") >= 0) // drop quarantine markers
        val toWrite = reuse match {
          case Some(r) => freshDF.unionByName(
            r.filter(col("part_id").isin(batch: _*)))
          case None => freshDF
        }
        toWrite
          .observe(obs, count(lit(1)).as("docs"),
            coalesce(sum(length(col("text"))), lit(0L)).as("text_bytes"))
          .write.mode("overwrite").partitionBy("part_id")
          .parquet(extractedPath(outDir))
        val observedDocs = obs.get("docs").asInstanceOf[Long]

        // exact docs/nodes from the committed files (reads 2 small columns);
        // out_sha = order-independent digest of per-doc text hashes
        val stats = spark.read.parquet(extractedPath(outDir))
          .filter(col("part_id").isin(batch: _*))
          .groupBy(col("part_id"))
          .agg(count(lit(1)).as("docs"), sum(col("node_count")).as("nodes"),
            expr("hex(bit_xor(xxhash64(text_sha)))").as("out_sha"))
          .collect()
          .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getString(3))))
          .toMap

        // write audit: rows that flowed into the write must equal rows read
        // back from the committed files — a mismatch means lost/duplicated
        // output (e.g. a partial overwrite) and must not be silently committed
        val readBack = stats.valuesIterator.map(_._1).sum
        require(observedDocs == readBack,
          s"write audit failed for batch $batchesRun: observed $observedDocs rows, read back $readBack")
        totalObserved += observedDocs

        val wallMs = (System.nanoTime() - t0) / 1000000L
        val bytes = bytesAcc.value
        val rows = batch.map { pid =>
          val (docs, nodes, sha) = stats.getOrElse(pid, (0L, 0L, ""))
          ManifestRow(pid, cfg.inputSnapshot, docs, nodes,
            bytes.getOrElse(pid, 0L), wallMs, "done", sha, cfg.codeVer)
        }
        committer.commit(rows)
        committed ++= batch
        batchesRun += 1
      }
    Result(batchesRun, committed.result(), oversized.value, totalObserved)
  }
}
