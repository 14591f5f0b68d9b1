package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextOps

/** Stream–static cross-release dedup: the match-event stream against a
  * frozen signature index must collapse to EXACTLY the batch q243
  * decisions on the same input, stay stateless (no state store), and be
  * exactly-once across a checkpoint restart.
  */
class ReleaseDedupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val t0 = 1700000000000L
  private def ts(m: Long) = new Timestamp(t0 + m * 60000L)

  private val longA = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra " +
    "tango uniform victor whiskey xray yankee zulu one two three four"
  private val longB = "the curation stack replays every increment against " +
    "the frozen release index because re shingling released petabytes is " +
    "not an option at web scale ever"

  test("match events collapse to the batch decisions; restart is exactly-once") {
    val s = spark
    import s.implicits._
    val frozen = Seq(10L -> longA, 11L -> longB, 12L -> "solo",
      13L -> "exact twin content for the incremental dedup spec")
      .toDF("doc_id", "text")
    val index = TextOps.signatureIndex(frozen).cache()

    val in = Files.createTempDirectory("rds_in").toString
    val ckpt = Files.createTempDirectory("rds_ckpt").toString
    val out = Files.createTempDirectory("rds_out").toString

    val batch1 = Seq(
      (100L, ts(1), "exact twin content for the incremental dedup spec"),
      (101L, ts(2), longA + " appended"),
      (102L, ts(3), "completely different words about gardening tulips " +
        "and watering cans in spring"),
      (103L, ts(4), "solo"),
      (104L, ts(5), "unique"))
    batch1.toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(in)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("doc_id long, ts timestamp, text string")
        .parquet(in).as[DocEvent]
      val q = ReleaseDedupStream.matches(src, index).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    runOnce()

    def collapsed(): Set[(Long, String, Long, Long)] =
      ReleaseDedupStream.collapse(spark.read.parquet(out)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    def batchDecisions(docs: Seq[(Long, Timestamp, String)]) =
      TextOps.incrementalDedupAgainst(index,
          docs.map(d => (d._1, d._3)).toDF("doc_id", "text"), 500L)
        .where(col("decision") =!= "kept").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet

    val c1 = collapsed()
    assert(c1 === batchDecisions(batch1),
      "streamed collapse diverged from the batch operator")
    // kept docs never emit an event
    val evDocs1 = spark.read.parquet(out).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!evDocs1.contains(102L) && !evDocs1.contains(104L))
    // stateless contract: no state store directory under the checkpoint
    assert(!Files.isDirectory(java.nio.file.Paths.get(ckpt, "state")),
      "stream grew a state store — the stream-static shape must be stateless")

    // restart with the SAME checkpoint: already-processed files must not
    // re-emit (exactly-once), new docs are decided
    val n1 = spark.read.parquet(out).count()
    val batch2 = Seq(
      (200L, ts(10), longA),     // exact copy of a release doc
      (201L, ts(11), "another novel document about entirely new things"))
    batch2.toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    runOnce()
    val ev2 = spark.read.parquet(out)
    assert(ev2.where(col("doc_id") < 200L).count() === n1,
      "restart re-emitted events for already-processed docs")
    assert(collapsed() === batchDecisions(batch1 ++ batch2))
    val exact200 = ev2.where(col("doc_id") === 200L && col("kind") === "exact")
    assert(exact200.count() === 1L &&
      exact200.head().getAs[Long]("f_id") === 10L)
    assert(!ev2.select("doc_id").collect().map(_.getLong(0)).contains(201L))
  }
}
