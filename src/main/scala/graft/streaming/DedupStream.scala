package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One incoming document for streaming dedup: arrival event time + text. */
final case class DocEvent(doc_id: Long, ts: Timestamp, text: String)

/** Streaming EXACT dedup — the continuous-ingest counterpart of the batch
  * q15 operator: the first document carrying a given content fingerprint
  * is emitted, every later copy inside the dedup horizon is dropped, and
  * the horizon is enforced by the EVENT-TIME WATERMARK so the seen-set
  * state is bounded by time, never by corpus size.
  *
  * Spark-first: this composes the built-in
  * `dropDuplicatesWithinWatermark` stateful operator over an md5 content
  * fingerprint column instead of hand-rolling `mapGroupsWithState` — the
  * engine owns state storage (RocksDB-backed in production), checkpoint
  * recovery, and watermark-driven eviction. Custom state remains the
  * right tool only when the semantics aren't expressible (sessionization:
  * [[SessionStream]]).
  *
  * Semantics and their 100 TB reading:
  *   - state is keyed on the 128-bit fingerprint — one shuffle on `fp`,
  *     never on the text; the blob rides along but is not a key;
  *   - a duplicate arriving within `watermark` of the kept copy is
  *     dropped, across micro-batches and across restarts (checkpointed
  *     state);
  *   - state for a fingerprint is evicted once the watermark passes its
  *     event time + delay, so a copy arriving AFTER the horizon is
  *     re-emitted — the deliberate price of bounded state; the batch
  *     dedup pass downstream (pipeline/DedupStage) removes those
  *     stragglers at rest. Both halves are pinned in DedupStreamSpec.
  */
object DedupStream {

  /** Deduplicate a stream of documents by content fingerprint.
    *
    * @param watermark dedup horizon, e.g. "1 hour": copies of a document
    *                  seen within this event-time window are dropped.
    */
  def dedup(docs: Dataset[DocEvent], watermark: String = "1 hour"): DataFrame =
    docs.toDF()
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
}
