package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: the two-level distributed prefix sum must equal the
  * sequential concat-and-chunk, for every bucket count, including empty
  * docs and doc_id gaps.
  */
class PackingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // (doc_id, text) with deterministic pseudo-random token counts, gaps in
  // the id space, and planted empty docs
  private def corpus(n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val id = i.toLong * 3 + (i % 5) // non-contiguous ids
      val words = if (i % 11 == 0) 0 else 1 + (i * 2654435761L % 97).toInt
      (id, Seq.fill(words)("w").mkString(" "))
    }

  private def reference(rows: Seq[(Long, String)], seqLen: Int)
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    var off = 0L
    rows.sortBy(_._1).map { case (id, text) =>
      val len = text.trim.toLowerCase.split("[ \\t\\n\\f\\r\\x0B]+")
        .length.toLong // split("") -> Array("") -> 1, matching Spark's split
      val start = off
      off += len
      val first = start / seqLen
      val last = if (len > 0) (start + len - 1) / seqLen else first
      val n = if (len > 0) last - first + 1 else 0L
      (id, len, start, first, last, n)
    }
  }

  test("distributed packing == sequential reference across bucket counts") {
    val s = spark; import s.implicits._
    val rows = corpus(400)
    val df = rows.toDF("doc_id", "text")
    val want = reference(rows, 64)
    for (b <- Seq(1, 3, 8, 64, 1000)) {
      val got = TextOps.packSequences(df, 64, b)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      assert(got === want, s"buckets=$b")
    }
  }

  test("stream is contiguous: each start is the previous end, total preserved") {
    val s = spark; import s.implicits._
    val rows = corpus(300)
    val got = TextOps.packSequences(rows.toDF("doc_id", "text"), 128, 7)
      .orderBy("doc_id").collect()
    var expect = 0L
    got.foreach { r =>
      assert(r.getAs[Long]("start_off") === expect, s"doc ${r.get(0)}")
      expect += r.getAs[Long]("tok_len")
    }
    val totalTokens = rows.map(_._2.trim.toLowerCase
      .split("[ \\t\\n\\f\\r\\x0B]+").length.toLong).sum
    assert(expect === totalTokens)
  }

  test("empty input returns an empty frame with the packing schema") {
    val s = spark; import s.implicits._
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextOps.packSequences(df, 512, 8)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("doc_id", "tok_len", "start_off",
      "first_seq", "last_seq", "n_seqs"))
  }

  test("the corpus-sized window is bucket-partitioned — only the B-row offsets table pays a global window") {
    val s = spark; import s.implicits._
    val df = corpus(200).toDF("doc_id", "text")
    val plan = TextOps.packSequences(df, 64, 8).queryExecution.executedPlan.toString
    // every Window over the full data must carry a partition spec; the
    // single empty-partition window is the B-row bucket-offset one, which
    // sits under the broadcast side of the join
    val windows = "(?i)Window ".r.findAllIn(plan).size
    assert(windows >= 2, plan)
    val globalWindows = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition(bucket#")).size
    assert(globalWindows >= 1, "bucket-partitioned window missing\n" + plan)
    assert(plan.toLowerCase.contains("broadcast"),
      "bucket offsets not broadcast\n" + plan)
  }

  /** Driver-side first-fit over (n_tokens desc, doc_id)-sorted members —
    * the sequential ground truth for [[CurationOps.binPack]], applied to
    * whatever bucket membership Spark's hash produced.
    */
  private def refFirstFit(members: Seq[(Long, Int)], cap: Int): Map[Long, Int] = {
    val fills = scala.collection.mutable.ArrayBuffer.empty[Int]
    // ids tie-break in STRING order — the kernel's one encoder for both
    // long and url ids (CurationOps.binPack)
    members.sortBy { case (id, n) => (-n, id.toString) }.map { case (id, n) =>
      var b = 0
      while (b < fills.length && fills(b) + n > cap) b += 1
      if (b == fills.length) fills += 0
      fills(b) += n
      id -> b
    }.toMap
  }

  test("binPack == per-bucket sequential first-fit-decreasing; certificates hold") {
    val s = spark; import s.implicits._
    val cap = 100
    val sized = (0 until 300).map { i =>
      // skewed sizes incl. exact-cap and oversize docs
      val n = (i * 2654435761L % 147).toInt + (if (i % 37 == 0) 120 else 1)
      (i.toLong * 7 % 1000, n) // gappy, shuffled ids
    }.distinct
    val out = CurationOps.binPack(sized.toDF("doc_id", "n_tokens"), cap, 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
    assert(out.length === sized.length && out.forall(_._5), "pack_ok must be all-true")
    out.groupBy(_._2).foreach { case (_, rows) =>
      val want = refFirstFit(rows.map(r => (r._1, r._4)).toSeq, cap)
      rows.foreach { r =>
        assert(r._3 === want(r._1), s"doc ${r._1}: bin ${r._3} != ref ${want(r._1)}")
      }
      // oversize docs sit alone in their bin
      val byBin = rows.groupBy(_._3)
      rows.filter(_._4 > cap).foreach { r =>
        assert(byBin(r._3).length === 1, s"oversize doc ${r._1} not isolated")
      }
    }
  }
}
