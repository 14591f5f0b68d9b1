package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The stream–stream join must equal its batch twin on the same rows,
  * out-of-horizon extractions must never join, and a checkpoint restart
  * must emit the remaining matches exactly once. Sentinel rows far in the
  * future advance BOTH sides' watermarks (join state cleanup needs the
  * min of the two); batch-2 rows sit above batch-1's watermark horizon so
  * none are late-dropped.
  */
class JoinStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("streamed fetch->extract attribution == batch twin across a restart") {
    val s = spark
    import s.implicits._
    val fin = Files.createTempDirectory("js_f").toString
    val ein = Files.createTempDirectory("js_e").toString
    val ckpt = Files.createTempDirectory("js_ckpt").toString
    val outDir = Files.createTempDirectory("js_out").toString
    val base = 1700000000L

    // batch 1: 40 fetches; extraction lands in-horizon for i%4!=3,
    // OUT of horizon (HorizonS + 600 late) for i%4==3 — must never join.
    // Extraction rows arrive out of order by construction.
    val f1 = (0 until 40).map { i =>
      (s"u$i", ts(base + i * 60), 1000L + i)
    }
    val e1 = (0 until 40).reverse.map { i =>
      val lag = if (i % 4 == 3) JoinStream.HorizonS + 600 else 120 + (i % 7) * 30
      (s"u$i", ts(base + i * 60 + lag), 50L + i)
    }
    val fSent1 = Seq(("sentinel", ts(base + 200000L), -1L))
    val eSent1 = Seq(("sentinel", ts(base + 200000L), -1L))
    (f1 ++ fSent1).toDF("f_url", "fetch_ts", "bytes")
      .write.mode("overwrite").parquet(fin)
    (e1 ++ eSent1).toDF("e_url", "ex_ts", "n_tokens")
      .write.mode("append").parquet(ein)

    def runOnce(): Unit = {
      val fs = spark.readStream
        .schema("f_url string, fetch_ts timestamp, bytes long").parquet(fin)
      val es = spark.readStream
        .schema("e_url string, ex_ts timestamp, n_tokens long").parquet(ein)
      val q = JoinStream.attributed(fs, es).writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    def emitted() = spark.read.parquet(outDir)
      .filter(col("url") =!= "sentinel")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    runOnce()
    val out1 = emitted()
    assert(out1.nonEmpty)
    // in-horizon fetches attributed, out-of-horizon never
    assert(out1.forall(_._4 <= JoinStream.HorizonS))
    assert(!out1.exists(_._1 == "u3"), "out-of-horizon extraction joined")

    // batch 2: above batch-1's sentinel horizon; u103 planted out-of-horizon
    val b2 = base + 210000L
    val f2 = (100 until 120).map { i =>
      (s"u$i", ts(b2 + (i - 100) * 30), 2000L + i)
    }
    val e2 = (100 until 120).map { i =>
      val lag = if (i == 103) JoinStream.HorizonS + 900 else 60
      (s"u$i", ts(b2 + (i - 100) * 30 + lag), 80L + i)
    }
    val fSent2 = Seq(("sentinel", ts(base + 500000L), -2L))
    val eSent2 = Seq(("sentinel", ts(base + 500000L), -2L))
    (f2 ++ fSent2).toDF("f_url", "fetch_ts", "bytes")
      .write.mode("append").parquet(fin)
    (e2 ++ eSent2).toDF("e_url", "ex_ts", "n_tokens")
      .write.mode("append").parquet(ein)
    runOnce()
    val all = emitted()

    // exactly-once across the restart: more rows, zero duplicates
    assert(all.length > out1.length)
    assert(all.distinct.length === all.length, "join emitted a duplicate")
    assert(!all.exists(_._1 == "u103"), "out-of-horizon extraction joined (run 2)")

    // equality with the batch twin over everything but sentinels
    val batch = JoinStream.attributedBatch(
        spark.read.parquet(fin).filter(col("f_url") =!= "sentinel"),
        spark.read.parquet(ein).filter(col("e_url") =!= "sentinel"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(all.toSet === batch.toSet)
    assert(all.length === batch.length)
  }
}
