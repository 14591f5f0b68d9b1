package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The windowed-aggregate stream must equal its batch twin on the same
  * rows, and a checkpoint restart must emit the remaining windows exactly
  * once (append contract: no duplicates, no losses). Far-future sentinel
  * rows advance the watermark so every real window seals inside an
  * AvailableNow run; the second batch's rows sit ABOVE the first
  * sentinel's watermark horizon so none of them are late-dropped.
  */
class TrendStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("streamed window counts == batch twin across a checkpoint restart") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("trend_in").toString
    val ckpt = Files.createTempDirectory("trend_ckpt").toString
    val outDir = Files.createTempDirectory("trend_out").toString
    val base = 1700000000L

    // batch 1: three 10-min windows of deterministic word soup,
    // including out-of-order arrival inside the watermark
    val rows1 = (0 until 300).map { i =>
      val t = base + (i * 7) % 1800            // out of order by construction
      (i.toLong, ts(t), s"alpha tok${i % 5} beta tok${(i * 3) % 7}")
    }
    val sent1 = Seq((-1L, ts(base + 200000L), "sentinel"))
    (rows1 ++ sent1).toDF("doc_id", "ts", "text")
      .write.mode("overwrite").parquet(in)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("doc_id long, ts timestamp, text string")
        .parquet(in)
      val q = TrendStream.trends(src).writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    def emitted() = spark.read.parquet(outDir)
      .filter(col("tok") =!= "sentinel")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    runOnce()
    val out1 = emitted()
    assert(out1.nonEmpty)

    // batch 2: rows ABOVE sentinel1's watermark horizon, plus sentinel2
    val rows2 = (0 until 120).map { i =>
      val t = base + 210000L + (i * 11) % 1200
      (1000L + i, ts(t), s"gamma tok${i % 4}")
    }
    val sent2 = Seq((-2L, ts(base + 400000L), "sentinel"))
    (rows2 ++ sent2).toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(in)
    runOnce()
    val all = emitted()

    // exactly-once: the restart added rows, duplicated none
    assert(all.length > out1.length)
    assert(all.distinct.length === all.length, "append emitted a duplicate")

    // equality with the batch twin over everything but the sentinels
    val batch = TrendStream.trendsBatch(
      spark.read.parquet(in).filter(col("doc_id") >= 0))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(all.toSet === batch.toSet)
    assert(all.length === batch.length)
  }
}
