package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window token-trend aggregation — the BUILT-IN
  * windowed-aggregate streaming pattern (watermark + `window()` groupBy in
  * APPEND mode), complementing the family's custom-state members
  * (SessionStream's flatMapGroupsWithState, NeardupStream's storage-backed
  * gate, DedupStream's dropDuplicatesWithinWatermark): a (window, token)
  * count row is emitted EXACTLY ONCE, when the event-time watermark passes
  * the window end — the freshness/completeness trade a crawl-monitoring
  * dashboard ("what is trending this 10 minutes") actually runs.
  *
  * The streaming plan is the batch plan plus a watermark: TrendStreamSpec
  * proves streamed == batch on the same rows across a checkpoint restart
  * (two runs, one checkpoint, zero duplicates — the append contract).
  *
  * Scale notes: state is one count row per (window, token) inside the
  * watermark horizon — bounded by vocabulary × horizon/window, never by
  * stream length; the shuffle key is the same (window, token) the batch
  * aggregate uses. Top-k per window is a batch query over the emitted
  * sink (a per-window rank inside the stream would violate append mode).
  */
object TrendStream {

  /** Tumbling window width, seconds. */
  val WindowS = 600

  /** Streaming counts: input must have an event-time `ts` timestamp and a
    * `text` string column.
    */
  def trends(docs: DataFrame, watermark: String = "30 minutes"): DataFrame =
    counts(docs.withWatermark("ts", watermark))

  /** Batch twin — the identical plan minus the watermark. */
  def trendsBatch(docs: DataFrame): DataFrame = counts(docs)

  private def counts(docs: DataFrame): DataFrame =
    docs
      .select(col("ts"),
        explode(split(lower(trim(col("text"))), graft.queries.TextOps.WS))
          .as("tok"))
      .where(col("tok") =!= "")
      .groupBy(window(col("ts"), s"$WindowS seconds"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("tok"), col("n"))
}
