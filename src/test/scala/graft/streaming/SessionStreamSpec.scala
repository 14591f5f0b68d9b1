package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational

/** Streaming sessionization must agree with the batch q47 operator on the
  * same events: every session the watermark has passed is emitted exactly
  * once, with identical (n_events, duration, value-sum) per user. A
  * far-future sentinel event advances the watermark past every real
  * session so the event-time timeouts all fire within the AvailableNow
  * run (the engine schedules the extra timeout batch itself).
  */
class SessionStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  test("streaming sessions == batch q47 sessions once the watermark passes") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("sess_in").toString
    val ckpt = Files.createTempDirectory("sess_ckpt").toString

    // the harness parquet stores ts as TIMESTAMP_NTZ; cast to an instant
    // (deterministic under the fixed UTC session timezone) so the
    // java.sql.Timestamp encoder in SessionEvent applies
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
    events.write.mode("overwrite").parquet(in)
    // sentinel: one far-future event for a user id outside the real range,
    // so the final watermark clears every real session's timeout
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelUser = -1L
    Seq((sentinelUser, -1L,
        new java.sql.Timestamp(maxTs.getTime + 36L * 3600 * 1000), 0.0))
      .toDF("user_id", "event_id", "ts", "value")
      .write.mode("append").parquet(in)

    val src = spark.readStream
      .schema("user_id long, event_id long, ts timestamp, value double")
      .parquet(in)
      .as[SessionEvent]
    val q = SessionStream.sessionize(src).writeStream
      .format("memory").queryName("sessions")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val streamed = spark.table("sessions")
      .filter(col("user_id") =!= sentinelUser)
      .select(col("user_id"), col("n_events"),
        (col("end_s") - col("start_s")).as("dur_s"), col("val_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3, t._4)).toList).toMap

    val batch = Relational.q47Sessionize(spark, sfDir)
      .select(col("user_id"), col("n_events"), col("dur_s"), col("val_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3, t._4)).toList).toMap

    assert(streamed.keySet == batch.keySet)
    streamed.keys.foreach { u => assert(streamed(u) == batch(u), s"user $u") }
  }

  test("open-session state survives a stream restart (checkpoint resume)") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("sessr_in").toString
    val ckpt = Files.createTempDirectory("sessr_ckpt").toString
    val outDir = Files.createTempDirectory("sessr_out").toString

    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
      .cache()
    // time-split: run 1 sees the first half, run 2 the second + sentinel.
    // Sessions spanning the boundary exist ONLY in recovered state — if
    // checkpoint recovery dropped them, the final comparison fails.
    val mid = events.selectExpr("percentile(unix_timestamp(ts), 0.5)").head().getDouble(0)
    val firstHalf = events.filter(unix_timestamp(col("ts")) <= mid)
    val secondHalf = events.filter(unix_timestamp(col("ts")) > mid)
    assert(firstHalf.count() > 0 && secondHalf.count() > 0)
    firstHalf.write.mode("overwrite").parquet(in)

    def runStream(): Unit = {
      val src = spark.readStream
        .schema("user_id long, event_id long, ts timestamp, value double")
        .parquet(in)
        .as[SessionEvent]
      val q = SessionStream.sessionize(src).writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }

    runStream() // run 1: first half only; boundary sessions stay in state

    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    secondHalf.write.mode("append").parquet(in)
    Seq((-1L, -1L, new java.sql.Timestamp(maxTs.getTime + 36L * 3600 * 1000), 0.0))
      .toDF("user_id", "event_id", "ts", "value")
      .write.mode("append").parquet(in)

    runStream() // run 2: NEW query instance, same checkpoint — state resumes

    val streamed = spark.read.parquet(outDir)
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("n_events"),
        (col("end_s") - col("start_s")).as("dur_s"), col("val_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3, t._4)).toList).toMap
    val batch = Relational.q47Sessionize(spark, sfDir)
      .select(col("user_id"), col("n_events"), col("dur_s"), col("val_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3, t._4)).toList).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.keys.foreach { u => assert(streamed(u) == batch(u), s"user $u") }
    events.unpersist()
  }

  test("out-of-order delivery across batches still matches batch sessions") {
    // events split by PARITY, not time: batch 2 delivers events that fall
    // BEFORE, INSIDE, and BRIDGING the intervals opened by batch 1 — the
    // case a single-open-session state mis-starts (review finding). A
    // 60-day watermark over the 30-day corpus means nothing is ever late,
    // so the streamed result must equal batch q47 EXACTLY.
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("sesso_in").toString
    val ckpt = Files.createTempDirectory("sesso_ckpt").toString
    val outDir = Files.createTempDirectory("sesso_out").toString

    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
      .cache()
    events.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(in)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)

    def runStream(): Unit = {
      val src = spark.readStream
        .schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .as[SessionEvent]
      val q = SessionStream.sessionize(src, watermark = "1440 hours").writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    runStream() // run 1: even event_ids only — half-built sessions in state
    events.filter(col("event_id") % 2 === 1).write.mode("append").parquet(in)
    Seq((-1L, -1L,
        new java.sql.Timestamp(maxTs.getTime + 70L * 24 * 3600 * 1000), 0.0))
      .toDF("user_id", "event_id", "ts", "value")
      .write.mode("append").parquet(in)
    runStream() // run 2: odd event_ids arrive BEHIND the open intervals

    val streamed = spark.read.parquet(outDir)
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("n_events"),
        (col("end_s") - col("start_s")).as("dur_s"), col("val_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3, t._4)).toList).toMap
    val batch = Relational.q47Sessionize(spark, sfDir)
      .select(col("user_id"), col("n_events"), col("dur_s"), col("val_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3, t._4)).toList).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.keys.foreach { u => assert(streamed(u) == batch(u), s"user $u") }
    events.unpersist()
  }
}
