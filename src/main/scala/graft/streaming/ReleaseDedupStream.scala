package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming CROSS-RELEASE dedup — continuous ingest decided against a
  * FROZEN release's persisted signature index
  * ([[graft.pipeline.IncrementalDedup]]) via STREAM–STATIC joins: the
  * sixth canonical Structured Streaming shape in this repo (custom state,
  * storage-backed gate, within-watermark dedup, windowed aggregate,
  * stream–stream join, and now stream–static).
  *
  * The stream stays COMPLETELY STATELESS: the per-doc MinHash signature
  * is a row-local HOF projection ([[graft.queries.TextOps.signatureCols]]
  * — identical values to the batch aggregation, zero shuffle, no
  * aggregation state), and both the exact (fp) and near (LSH band)
  * checks are joins against the STATIC index DataFrame. No state store
  * at all — which is exactly the production argument for persisting the
  * index: at ingest rates the release corpus itself could never sit in
  * stream state, but its constant-bytes-per-doc signature table joins as
  * an ordinary static side.
  *
  * Emitted is a MATCH-EVENT stream, one row per piece of decisive
  * evidence: `kind = 'exact'` (content md5 equals a release fingerprint;
  * f_id is the release keeper = min doc_id for that fingerprint) or
  * `kind = 'near'` (shares an LSH band AND sketch-estimated Jaccard ≥
  * threshold). A doc with NO emitted row is kept. Collapsing events to
  * per-doc decisions (exact beats near, min f_id, max agreement — the
  * q243 rule) is the consumer's batch step; ReleaseDedupStreamSpec pins
  * collapsed(events) == [[graft.queries.TextOps.incrementalDedupAgainst]]
  * on the same input, plus checkpoint-restart exactly-once. A pair whose
  * signatures agree on BOTH bands emits one event per band (multiplicity
  * ≤ 2, deterministic; `band_idx` is in the output so consumers can see
  * why) — collapsing removes it.
  */
object ReleaseDedupStream {

  /** Match events for a stream of [[DocEvent]]s against a release
    * signature index of shape (doc_id, fp, h0..h7[, url…]).
    *
    * Output: (doc_id, ts, kind, band_idx, f_id, agree_x1000) —
    * band_idx = -1 on exact events, agree_x1000 = 1000 on exact events.
    */
  def matches(docs: Dataset[DocEvent], frozenIndex: DataFrame,
              thresholdX1000: Long = 500L): DataFrame = {
    val idx = frozenIndex.select(
      (Seq("doc_id", "fp") ++ (0 until 8).map(i => s"h$i")).map(col): _*)
    // per-doc signature: a stateless projection (HOF MinHash + md5 fp)
    val sig = docs.toDF().select(
      Seq(col("doc_id"), col("ts"),
        md5(col("text").cast("binary")).as("fp")) ++
        graft.queries.TextOps.signatureCols(col("text")): _*)
    // exact: stream fp → static (fp, keeper); keeper collapse happens on
    // the STATIC side (a plain groupBy before the stream ever starts)
    val exact = sig
      .join(idx.groupBy(col("fp")).agg(min(col("doc_id")).as("f_id")), "fp")
      .select(col("doc_id"), col("ts"), lit("exact").as("kind"),
        lit(-1).as("band_idx"), col("f_id"), lit(1000L).as("agree_x1000"))
    // near: melt each side's 2 band digests (q22's banding, identical
    // md5 form to the batch path), equi-join stream bands against the
    // static band table with the full signatures riding along for the
    // row-wise agreement check, keep qualifying candidates only
    def bandCol(a: Column, b: Column, c: Column, d: Column): Column =
      md5(concat_ws("|", a, b, c, d).cast("binary"))
    val bandArr = array(
      bandCol(col("h0"), col("h1"), col("h2"), col("h3")),
      bandCol(col("h4"), col("h5"), col("h6"), col("h7")))
    val streamBands = sig.where(col("h0").isNotNull)
      .select(Seq(col("doc_id"), col("ts")) ++
        (0 until 8).map(i => col(s"h$i")) :+ posexplode(bandArr): _*)
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "digest")
    val idxBands = idx.where(col("h0").isNotNull)
      .select(Seq(col("doc_id").as("f_id")) ++
        (0 until 8).map(i => col(s"h$i").as(s"f_h$i")) :+
        posexplode(bandArr): _*)
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "digest")
    val agree = (0 until 8)
      .map(i => when(col(s"h$i") === col(s"f_h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val near = streamBands
      .join(idxBands, Seq("band_idx", "digest"))
      .select(col("doc_id"), col("ts"), lit("near").as("kind"),
        col("band_idx"), col("f_id"), (agree * lit(125L)).as("agree_x1000"))
      .where(col("agree_x1000") >= thresholdX1000)
    exact.unionByName(near)
  }

  /** Batch collapse of a match-event table to per-doc q243 decisions —
    * the consumer step (exact beats near, keeper = min f_id, agreement =
    * strongest qualifying). Docs absent from `events` are kept and do
    * not appear here; anti-join the ingest log to list them.
    */
  def collapse(events: DataFrame): DataFrame =
    events
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("kind") === "exact", 1L).otherwise(0L)).as("ex"),
        min(when(col("kind") === "exact", col("f_id"))).as("exact_match"),
        min(when(col("kind") === "near", col("f_id"))).as("near_match"),
        max(when(col("kind") === "near", col("agree_x1000"))).as("near_ag"))
      .select(col("doc_id"),
        when(col("ex") === 1L, lit("exact_dup")).otherwise(lit("near_dup"))
          .as("decision"),
        when(col("ex") === 1L, col("exact_match")).otherwise(col("near_match"))
          .as("match_id"),
        when(col("ex") === 1L, lit(1000L)).otherwise(col("near_ag"))
          .as("agree_x1000"))
}
