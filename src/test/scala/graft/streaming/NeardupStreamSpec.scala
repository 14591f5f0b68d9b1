package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup gate: planted MinHash near-duplicates dropped
  * across micro-batches AND across a checkpoint restart; kept docs are
  * pairwise band-disjoint (the gate's own invariant, checked through the
  * same band table); replayed batches are idempotent; state is
  * horizon-bounded by whole-directory eviction, so an expired near-dup
  * re-emits.
  */
class NeardupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

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
  private def ts(offsetMin: Long) = new Timestamp(t0 + offsetMin * 60000L)

  /** A base text and a jittered near-copy (well above the 0.8 threshold). */
  private def base(i: Int): String =
    (0 until 60).map(j => s"w${(i * 7 + j * 3) % 97}x$i").mkString(" ")
  private def jitter(i: Int): String = base(i) + " tailword"

  private def runOnce(in: String, out: String, state: String,
                      ckpt: String): Unit = {
    val src = spark.readStream
      .schema("doc_id long, ts timestamp, text string")
      .parquet(in)
    val q = NeardupStream.start(src, out, state, ckpt)
    q.awaitTermination(180000)
  }

  test("near-dups dropped across batches and restarts; kept set band-disjoint; replay idempotent") {
    val s = spark; import s.implicits._
    val in = Files.createTempDirectory("nds_in").toString
    val out = Files.createTempDirectory("nds_out").toString
    val state = Files.createTempDirectory("nds_state").toString
    val ckpt = Files.createTempDirectory("nds_ckpt").toString

    // batch 1: 8 distinct bases + 4 within-batch jittered copies
    val b1 = (0 until 8).map(i => (i.toLong, ts(i), base(i))) ++
      (0 until 4).map(i => (100L + i, ts(10 + i), jitter(i)))
    b1.toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(in)
    runOnce(in, out, state, ckpt)
    val r1 = spark.read.parquet(s"$out/*")
    assert(r1.count() === 8L, "within-batch near-dups survived the gate")
    assert(r1.select("doc_id").as[Long].collect().sorted.toSeq ===
      (0L until 8L), "a jittered copy beat its earlier base")

    // batch 2 (restart, same checkpoint): cross-batch copies of bases
    // 4..7 + two genuinely new docs — the state must have survived
    val b2 = (4 until 8).map(i => (200L + i, ts(20 + i), jitter(i))) ++
      Seq((300L, ts(25), base(50)), (301L, ts(26), base(51)))
    b2.toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    runOnce(in, out, state, ckpt)
    val r2 = spark.read.parquet(s"$out/*")
    assert(r2.count() === 10L, "cross-batch near-dup state lost on restart")
    assert(r2.filter(col("doc_id") >= 200L && col("doc_id") < 300L).count() === 0L)

    // the gate's own invariant: kept docs share NO band inside the horizon
    val keptBands = graft.queries.TextOps.minhashBandTable(
      r2.select(col("doc_id"), col("text")), 0.8)
    val shared = keptBands.groupBy(col("col"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .where(col("n") > 1).count()
    assert(shared === 0L, "two kept docs share an LSH band")

    // replay idempotence: re-driving a committed batch id changes nothing
    val outStamp = new java.io.File(s"$out/batch=0").listFiles()
      .map(f => f.getName -> f.lastModified()).toSeq.sortBy(_._1)
    val summary = NeardupStream.processBatch(
      b1.toDF("doc_id", "ts", "text"), 0L, out, state, 0.8, 3600000L)
    assert(summary.in === 12L && summary.kept === 8L &&
      summary.dupWithin === 4L && summary.dupCross === 0L)
    val outStamp2 = new java.io.File(s"$out/batch=0").listFiles()
      .map(f => f.getName -> f.lastModified()).toSeq.sortBy(_._1)
    assert(outStamp2 === outStamp, "replayed batch rewrote its output")
  }

  test("state is horizon-bounded: expired band dirs deleted, expired near-dup re-emits") {
    val s = spark; import s.implicits._
    val in = Files.createTempDirectory("ndw_in").toString
    val out = Files.createTempDirectory("ndw_out").toString
    val state = Files.createTempDirectory("ndw_state").toString
    val ckpt = Files.createTempDirectory("ndw_ckpt").toString

    Seq((1L, ts(0), base(1))).toDF("doc_id", "ts", "text")
      .write.mode("overwrite").parquet(in)
    runOnce(in, out, state, ckpt)
    assert(new java.io.File(NeardupStream.stateBatchDir(state, 0L)).isDirectory)

    // 5 hours later (far past the 1 h horizon): the old state dir must be
    // evicted and the jittered copy of an expired base re-emits
    Seq((2L, ts(300), jitter(1))).toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(in)
    runOnce(in, out, state, ckpt)
    assert(!new java.io.File(NeardupStream.stateBatchDir(state, 0L)).exists,
      "expired state directory was not evicted — state would grow unboundedly")
    val kept = spark.read.parquet(s"$out/*")
    assert(kept.count() === 2L, "expired near-dup was not re-emitted")
  }
}
