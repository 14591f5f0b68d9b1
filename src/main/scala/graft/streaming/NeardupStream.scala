package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming NEAR-dup gate — the continuous-ingest counterpart of the
  * batch MinHash/LSH candidate pass (q22,
  * [[graft.queries.TextOps.minhashCandidates]]): an arriving document is
  * dropped when any of its threshold-derived LSH band hashes was already
  * claimed by a kept document inside the dedup horizon; otherwise it is
  * emitted and claims its bands.
  *
  * Design choice — `foreachBatch` + a STORAGE-BACKED band table, not a
  * `flatMapGroupsWithState` seen-set: at web scale the seen-band state is
  * corpus-sized (one row per kept doc per band), which outgrows executor
  * state stores; a partitioned parquet table with DIRECTORY-LEVEL TTL
  * eviction is the shape that survives (the same "state as a table, TTL
  * on partitions" pattern the batch manifests use). Exact-duplicate
  * streaming stays on the engine-owned
  * `dropDuplicatesWithinWatermark` ([[DedupStream]]) where the state is
  * genuinely small-keyed.
  *
  * Semantics (all pinned in NeardupStreamSpec):
  *   - cross-batch: any band hit against the live state drops the doc;
  *   - within-batch: per band, the earliest (ts, doc_id) wins; a doc
  *     loses if ANY of its bands has an earlier claimant — transitive
  *     chains collapse to the earliest doc, matching the batch closure's
  *     keeper choice on these inputs;
  *   - this is the CANDIDATE gate (LSH recall/precision contract as
  *     q22): the batch [[graft.pipeline.DedupStage]] at rest remains the
  *     exact-verified authority, exactly as its docstring already states
  *     for post-horizon stragglers;
  *   - restart-safe and replay-IDEMPOTENT: each micro-batch commits an
  *     atomic manifest (batch id, stats, state max-ts); a replayed batch
  *     id returns its recorded summary without re-writing outputs;
  *   - state is horizon-bounded: before each batch, whole state
  *     directories whose recorded max event time has fallen more than
  *     `horizonMs` behind the incoming batch's max are DELETED (one
  *     directory unlink per expired batch — no state rewrite), so a
  *     copy arriving after the horizon re-emits, the bounded-state
  *     price [[DedupStream]] documents.
  */
object NeardupStream {

  final case class Summary(batchId: Long, in: Long, kept: Long,
                           dupCross: Long, dupWithin: Long)

  def outBatchDir(outDir: String, batchId: Long) = s"$outDir/batch=$batchId"
  def stateBatchDir(stateDir: String, batchId: Long) =
    s"$stateDir/bands/batch=$batchId"
  private def manifestFile(stateDir: String, batchId: Long) =
    Paths.get(stateDir, "_manifest", s"batch-$batchId.json")

  /** Wire the gate into a streaming query (AvailableNow by default —
    * the drain-then-stop trigger the specs use).
    */
  def start(docs: DataFrame, outDir: String, stateDir: String, ckpt: String,
            threshold: Double = 0.8, horizonMs: Long = 3600000L): StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        processBatch(b.toDF(), id, outDir, stateDir, threshold, horizonMs)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One micro-batch of (doc_id, ts, text) through the gate. Public so a
    * replay (and the spec) can drive it directly.
    */
  def processBatch(batch: DataFrame, batchId: Long, outDir: String,
                   stateDir: String, threshold: Double,
                   horizonMs: Long): Summary = {
    val spark = batch.sparkSession
    val mf = manifestFile(stateDir, batchId)
    if (Files.isRegularFile(mf)) { // replayed batch: answer, touch nothing
      val s = new String(Files.readAllBytes(mf), UTF_8)
      def f(k: String) = s.split(s""""$k":""")(1).split("[,}]")(0).toLong
      return Summary(batchId, f("in"), f("kept"), f("dup_cross"), f("dup_within"))
    }
    val docs = batch.select(col("doc_id"), col("ts"), col("text"))
      .localCheckpoint()
    val in = docs.count()
    if (in == 0L) {
      commit(mf, batchId, 0, 0, 0, 0, maxTsMs = Long.MinValue)
      return Summary(batchId, 0, 0, 0, 0)
    }
    val maxTsMs = docs.agg(max(unix_millis(col("ts")))).head().getLong(0)

    // ---- horizon eviction: drop WHOLE expired state dirs (O(dirs)) ----
    val mdir = Paths.get(stateDir, "_manifest")
    if (Files.isDirectory(mdir)) {
      import scala.jdk.CollectionConverters._
      val ls = Files.list(mdir)
      val manifests = try ls.iterator().asScala.toArray finally ls.close()
      manifests.foreach { f =>
        val txt = new String(Files.readAllBytes(f), UTF_8)
        val bid = txt.split("\"batch\":")(1).split("[,}]")(0).toLong
        val mts = txt.split("\"max_ts_ms\":")(1).split("[,}]")(0).toLong
        if (bid != batchId && mts != Long.MinValue && mts < maxTsMs - horizonMs) {
          val dir = Paths.get(stateBatchDir(stateDir, bid))
          if (Files.isDirectory(dir)) {
            val walk = Files.walk(dir)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.delete(p))
            finally walk.close()
          }
        }
      }
    }

    val bands = graft.queries.TextOps
      .minhashBandTable(docs.select(col("doc_id"), col("text")), threshold)
      .join(docs.select(col("doc_id"), col("ts")), "doc_id")
      .select(col("doc_id"), unix_millis(col("ts")).as("ts_ms"),
        col("col").as("bh"))
      .localCheckpoint() // one materialization: state probe + within-batch

    // ---- cross-batch: any band claimed by the live state drops the doc ----
    val bandsRoot = new java.io.File(s"$stateDir/bands")
    val live = Option(bandsRoot.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.list().nonEmpty)
    val dupCrossIds =
      if (live.isEmpty) docs.select(col("doc_id")).limit(0)
      else bands
        .join(spark.read.parquet(live.map(_.getPath): _*).select("bh"), "bh")
        .select(col("doc_id")).distinct()
    val fresh = bands.join(dupCrossIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // ---- within-batch: per band the earliest (ts_ms, doc_id) wins ----
    val w = Window.partitionBy(col("bh"))
    val dupWithinIds = fresh
      .withColumn("min_ts", min(struct(col("ts_ms"), col("doc_id"))).over(w))
      .where(struct(col("ts_ms"), col("doc_id")) =!= col("min_ts"))
      .select(col("doc_id")).distinct()

    val keptDocs = docs
      .join(dupCrossIds, Seq("doc_id"), "left_anti")
      .join(dupWithinIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val kept = keptDocs.count()
    val dupCross = dupCrossIds.count()
    val dupWithin = dupWithinIds.count()

    keptDocs.write.mode("overwrite").parquet(outBatchDir(outDir, batchId))
    fresh.join(dupWithinIds, Seq("doc_id"), "left_anti")
      .select(col("bh"), col("ts_ms"))
      .write.mode("overwrite").parquet(stateBatchDir(stateDir, batchId))
    commit(mf, batchId, in, kept, dupCross, dupWithin, maxTsMs)
    Summary(batchId, in, kept, dupCross, dupWithin)
  }

  private def commit(mf: java.nio.file.Path, batchId: Long, in: Long,
                     kept: Long, dupCross: Long, dupWithin: Long,
                     maxTsMs: Long): Unit = {
    Files.createDirectories(mf.getParent)
    val json = s"""{"batch":$batchId,"in":$in,"kept":$kept,""" +
      s""""dup_cross":$dupCross,"dup_within":$dupWithin,"max_ts_ms":$maxTsMs}"""
    val tmp = mf.resolveSibling(mf.getFileName.toString + ".tmp")
    Files.write(tmp, json.getBytes(UTF_8))
    Files.move(tmp, mf, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
