package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.{ExtractPipeline, ExtractedRow}

/** Structured Streaming variant of the extraction pipeline (SURVEY.md §2.j —
  * optional; the north_rule job is batch). Continuous ingestion of page
  * captures → the SAME fused tokenize/extract core → idempotent parquet
  * sink. Late/duplicate captures of a url are dropped with a watermark +
  * `dropDuplicates`, state bounded by the watermark horizon.
  *
  * Scale notes: the transform is stateless per row (the parser keeps no
  * cross-row state), so the only streaming state is the dedup map — keyed on
  * url, expired by watermark. Checkpointing and exactly-once file output are
  * Spark's own (`checkpointLocation` + file-sink manifest); the per-batch
  * sink writes through the same partition layout as the batch job, so batch
  * and streaming outputs are interchangeable downstream.
  */
object ExtractStream {

  /** The streaming transform — identical semantics to the batch pipeline:
    * watermarked url-dedup (keep first capture inside the horizon), then the
    * typed extraction map.
    */
  def transform(pages: DataFrame, numParts: Int,
                watermark: String = "1 hour",
                extractCfg: graft.core.Extractor.ExtractConfig =
                  graft.core.Extractor.DefaultConfig,
                transcodeNonUtf8: Boolean = false): Dataset[ExtractedRow] = {
    // dropDuplicatesWithinWatermark: plain dropDuplicates("url") would keep
    // every url ever seen in the state store forever (the watermark only
    // evicts when the event-time column is part of the dedup key) — state
    // must stay bounded by the watermark horizon on an unbounded crawl feed
    val deduped = pages
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("url")
    // per-micro-batch metrics surface through StreamingQueryProgress
    // .observedMetrics (same counters the batch job records per partition
    // in its manifest) — zero extra pass, computed inside the sink stage
    ExtractPipeline.extractDS(deduped, numParts, extractCfg = extractCfg,
        transcodeNonUtf8 = transcodeNonUtf8)
      .observe("extract_metrics",
        count(lit(1)).as("docs"),
        // coalesce: an all-dropped micro-batch (every row deduped away)
        // must report 0, not null — same guard as the batch job's observe
        coalesce(sum(col("node_count")), lit(0L)).as("nodes"),
        coalesce(sum(length(col("text"))), lit(0L)).as("text_chars"))
  }

  /** Start the stream from a directory of pages-parquet files (the sandbox
    * stand-in for a Kafka/Iceberg CDC source — swap `readStream.format`).
    */
  def start(spark: SparkSession, inputDir: String, outDir: String,
            numParts: Int = 32, watermark: String = "1 hour",
            trigger: Trigger = Trigger.AvailableNow(),
            extractCfg: graft.core.Extractor.ExtractConfig =
              graft.core.Extractor.DefaultConfig,
            transcodeNonUtf8: Boolean = false): StreamingQuery = {
    val pages = spark.readStream
      .schema("url string, warc_ts timestamp, html binary, text string, lang string")
      .option("maxFilesPerTrigger", "8")
      .parquet(inputDir)
    transform(pages, numParts, watermark, extractCfg, transcodeNonUtf8).writeStream
      .option("checkpointLocation", s"$outDir/_stream_checkpoint")
      .partitionBy("part_id")
      .format("parquet")
      .option("path", s"$outDir/extracted")
      .trigger(trigger)
      .start()
  }
}
