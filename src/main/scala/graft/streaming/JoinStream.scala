package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM–STREAM inner join — the fifth canonical Structured
  * Streaming pattern in the family (alongside SessionStream's custom
  * state, NeardupStream's storage-backed gate, DedupStream's
  * within-watermark dedup, and TrendStream's windowed aggregate): two
  * live streams joined on key + an event-time RANGE condition, the shape
  * Spark can only execute when both sides carry watermarks, because the
  * join buffers each side's rows in state until the other side's
  * watermark proves no further match can arrive.
  *
  * The production story: the crawl FETCH event stream attributed to the
  * EXTRACTION result stream — every extracted document joined to the
  * fetch that produced it, provided extraction landed within
  * [[HorizonS]] of the fetch (the crawl→extract latency pipeline
  * monitor). The range condition is what bounds the state: a fetch older
  * than watermark + horizon can never match again and its buffered row
  * is dropped, so state is (arrival rate × horizon), never stream
  * length.
  *
  * JoinStreamSpec proves streamed == the batch twin (same inner join on
  * static frames) across a checkpoint restart with zero duplicates, and
  * that an out-of-horizon extraction never joins.
  *
  * Scale notes: both sides shuffle on the join key (url) — the same
  * Exchange the batch join pays; state lives in the same url-keyed store.
  * Append mode: an inner join emits a row exactly when its match arrives,
  * and the checkpoint makes re-emission impossible across restarts.
  */
object JoinStream {

  /** Max fetch→extraction latency eligible for attribution, seconds. */
  val HorizonS = 3600

  /** Streaming join: `fetches` must carry (f_url, fetch_ts, bytes),
    * `extracts` (e_url, ex_ts, n_tokens); both get event-time watermarks.
    */
  def attributed(fetches: DataFrame, extracts: DataFrame,
                 watermark: String = "30 minutes"): DataFrame =
    join(fetches.withWatermark("fetch_ts", watermark),
      extracts.withWatermark("ex_ts", watermark))

  /** Batch twin — the identical join minus the watermarks. */
  def attributedBatch(fetches: DataFrame, extracts: DataFrame): DataFrame =
    join(fetches, extracts)

  private def join(f: DataFrame, e: DataFrame): DataFrame =
    f.join(e,
        col("f_url") === col("e_url") &&
          col("ex_ts") >= col("fetch_ts") &&
          col("ex_ts") <= col("fetch_ts") + expr(s"INTERVAL $HorizonS SECONDS"))
      .select(col("f_url").as("url"), col("fetch_ts"), col("ex_ts"),
        (unix_timestamp(col("ex_ts")) - unix_timestamp(col("fetch_ts")))
          .as("latency_s"),
        col("bytes"), col("n_tokens"))
}
