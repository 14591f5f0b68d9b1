package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ExtractPipeline
import graft.sources.PagesSynth

/** Streaming = batch equivalence: the AvailableNow streaming run over a
  * static input directory must produce byte-identical extracted text to the
  * batch pipeline, and re-delivered (duplicate) captures must be dropped by
  * the watermarked dedup.
  */
class ExtractStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming output is byte-identical to the batch pipeline") {
    val in = Files.createTempDirectory("stream_in").toString
    val out = Files.createTempDirectory("stream_out").toString
    val pages = PagesSynth.pagesDF(spark, 120L)
    pages.write.mode("overwrite").parquet(in)
    // duplicate captures: same urls re-delivered as a second file batch
    pages.limit(30).write.mode("append").parquet(in)

    val q = ExtractStream.start(spark, in, out, numParts = 4)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$out/extracted")
      .select("url", "text_sha").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val batch = ExtractPipeline.extractDS(pages, numParts = 4)
      .select(col("url"), col("text_sha")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    assert(streamed.size === 120, "dedup must drop re-delivered captures")
    assert(streamed === batch)

    // observe-based stream metrics: summed across micro-batches they must
    // account for every extracted (post-dedup) document
    val observed = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("extract_metrics")))
    assert(observed.nonEmpty, "extract_metrics missing from stream progress")
    val docs = observed.map(_.getAs[Long]("docs")).sum
    val nodes = observed.map(_.getAs[Long]("nodes")).sum
    assert(docs === 120L, s"observed docs=$docs")
    assert(nodes > 0L)
  }
}
