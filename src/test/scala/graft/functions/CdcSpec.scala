package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The gear-CDC chunker must equal an INDEPENDENT sequential
  * implementation (gear table and FNV re-derived here from their public
  * definitions), reassemble the input exactly, and exhibit the defining
  * CDC property: an insertion shifts only local chunks and the stream
  * realigns, where fixed-width chunking loses everything downstream.
  */
class CdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.ensureRegistered(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // independent gear table: splitmix64 per Steele et al. 2014
  private val gear: Array[Long] = {
    (0 until 256).map { i =>
      var z = i.toLong + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }.toArray
  }

  private def refFnv(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    (from until until).foreach { i => h ^= (b(i) & 0xffL); h *= 0x100000001b3L }
    h
  }

  /** Independent sequential chunker (same public algorithm, fresh code). */
  private def refChunks(text: String, min: Int, maskBits: Int,
                        max: Int): Seq[(Int, Int, Long)] = {
    val b = text.getBytes("UTF-8")
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var start = 0
    var h = 0L
    for (i <- b.indices) {
      h = (h << 1) + gear(b(i) & 0xff)
      val len = i - start + 1
      if ((len >= min && (h & mask) == 0) || len >= max) {
        out += ((start, len, refFnv(b, start, i + 1)))
        start = i + 1
        h = 0L
      }
    }
    if (start < b.length) out += ((start, b.length - start, refFnv(b, start, b.length)))
    out.toSeq
  }

  private def jvmChunks(text: String, min: Int, maskBits: Int,
                        max: Int): Seq[(Int, Int, Long)] = {
    val a = CdcOps.chunks(UTF8String.fromString(text), min, maskBits, max)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getLong(2))
    }
  }

  private def randText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => "abcdefghijklmnop qrstuvwxyz,.".charAt(rnd.nextInt(29))).mkString
  }

  test("chunks == independent sequential reference (random texts, several params)") {
    for (seed <- 1 to 5; (min, bits, max) <- Seq((64, 5, 256), (64, 6, 512), (128, 7, 1024))) {
      val t = randText(seed, 200 + seed * 1700)
      assert(jvmChunks(t, min, bits, max) === refChunks(t, min, bits, max),
        s"seed $seed params ($min,$bits,$max)")
    }
  }

  test("chunks reassemble the input bytes exactly; bounds hold") {
    val t = randText(99, 8000)
    val cs = jvmChunks(t, 64, 5, 256)
    val b = t.getBytes("UTF-8")
    assert(cs.map(_._2).sum === b.length)
    assert(cs.head._1 === 0)
    cs.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 === o2)
      case _ =>
    }
    assert(cs.init.forall(c => c._2 >= 64 && c._2 <= 256))
    assert(cs.last._2 <= 256)
    // fingerprints are really content hashes
    cs.foreach { case (o, l, h) => assert(h === refFnv(b, o, o + l)) }
  }

  test("empty and sub-min inputs: one short final chunk or none") {
    assert(jvmChunks("", 64, 5, 256) === Seq.empty)
    val s = "short text"
    assert(jvmChunks(s, 64, 5, 256) ===
      Seq((0, s.length, refFnv(s.getBytes("UTF-8"), 0, s.length))))
  }

  test("insertion realigns: CDC shares the tail, fixed-width loses it") {
    val a = randText(7, 12000)
    val b = "Z" + a // one byte inserted at the front
    val ca = jvmChunks(a, 64, 5, 256).map(_._3).toSet
    val cb = jvmChunks(b, 64, 5, 256).map(_._3).toSet
    val shared = ca.intersect(cb).size.toDouble / ca.size
    assert(shared >= 0.7, s"CDC chunk survival $shared after 1-byte insertion")
    // fixed-width control: every 128-byte window shifts — near-zero survival
    val fa = a.getBytes("UTF-8").grouped(128).map(c => refFnv(c, 0, c.length)).toSet
    val fb = b.getBytes("UTF-8").grouped(128).map(c => refFnv(c, 0, c.length)).toSet
    val fixedShared = fa.intersect(fb).size.toDouble / fa.size
    assert(fixedShared <= 0.05, s"fixed-width survival $fixedShared should collapse")
  }

  test("SQL surface == JVM path and chunk dedup finds planted twins") {
    val s = spark; import s.implicits._
    val docs = (1 to 6).map(i => (i.toLong, randText(i % 3 + 1, 4000))).toDF("doc_id", "text")
    val viaSql = docs.select(col("doc_id"),
        explode(call_function("cdc_chunks", col("text"), lit(64), lit(5), lit(256))).as("c"))
      .select(col("doc_id"), col("c.off"), col("c.len"), col("c.hash"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val viaJvm = docs.collect().flatMap { r =>
      jvmChunks(r.getString(1), 64, 5, 256)
        .map(c => (r.getLong(0), c._1, c._2, c._3))
    }.toSet
    assert(viaSql === viaJvm)
    // docs 1/4, 2/5, 3/6 are twins: all their chunks duplicate
    val q = graft.queries.TextOps.cdcDedup(docs)
    val rows = q.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    rows.foreach { case (id, (n, dup, ok)) =>
      assert(ok, s"doc $id cdc_ok")
      assert(dup === n, s"doc $id fully duplicated")
    }
  }
}
