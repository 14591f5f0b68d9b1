package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: first copy of each content fingerprint emitted,
  * later copies inside the watermark horizon dropped — across micro-batches
  * AND across a checkpoint restart — while copies arriving after the
  * horizon re-emit (the bounded-state contract).
  */
class DedupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val t0 = 1700000000000L // fixed epoch base
  private def ts(offsetMin: Long) = new Timestamp(t0 + offsetMin * 60000L)

  private def runOnce(in: String, ckpt: String, out: String): Unit = {
    val s = spark
    import s.implicits._
    val src = spark.readStream
      .schema("doc_id long, ts timestamp, text string")
      .parquet(in)
      .as[DocEvent]
    val q = DedupStream.dedup(src, "1 hour").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
  }

  test("duplicates dropped across micro-batches and a checkpoint restart") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("dds_in").toString
    val ckpt = Files.createTempDirectory("dds_ckpt").toString
    val out = Files.createTempDirectory("dds_out").toString

    // run 1: 20 docs over 10 distinct contents -> 10 kept
    (1L to 20L).map(i => (i, ts(i % 30), s"content-${i % 10}"))
      .toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(in)
    runOnce(in, ckpt, out)
    val r1 = spark.read.parquet(out)
    assert(r1.count() === 10L)
    assert(r1.select("fp").distinct().count() === 10L)

    // run 2 (same checkpoint): re-deliver every content within the horizon
    // + one genuinely new doc. Only the new one may come out — the seen-set
    // must have survived the restart.
    ((21L to 30L).map(i => (i, ts(30 + i % 5), s"content-${i % 10}")) :+
      ((31L, ts(35), "content-new")))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    runOnce(in, ckpt, out)
    val r2 = spark.read.parquet(out)
    assert(r2.count() === 11L, "restart lost the dedup state")
    assert(r2.filter(col("text") === "content-new").count() === 1L)
    // exactly one survivor per fingerprint, and the set of kept
    // fingerprints == the batch-distinct fingerprints of the whole input
    val streamedFps = r2.select("fp").collect().map(_.getString(0)).sorted
    val batchFps = spark.read.parquet(in)
      .select(md5(col("text").cast("binary")).as("fp"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(streamedFps.toSeq === batchFps.toSeq)
  }

  test("state is watermark-bounded: a copy arriving after the horizon re-emits") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("ddw_in").toString
    val ckpt = Files.createTempDirectory("ddw_ckpt").toString
    val out = Files.createTempDirectory("ddw_out").toString

    // batch 1: the original at T0
    Seq((1L, ts(0), "expiring-content"))
      .toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(in)
    runOnce(in, ckpt, out)
    // batch 2: advance the watermark far past T0 + 1h (evicts the state)
    Seq((2L, ts(300), "advancer"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    runOnce(in, ckpt, out)
    // batch 3: the same content again, above the current watermark but
    // long after the original's horizon -> state is gone -> re-emitted
    Seq((3L, ts(290), "expiring-content"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    runOnce(in, ckpt, out)

    val kept = spark.read.parquet(out)
    assert(kept.filter(col("text") === "expiring-content").count() === 2L,
      "expired fingerprint was not re-emitted — state would grow unboundedly")
    assert(kept.count() === 3L)
  }
}
