package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The distributed prefix-doubling suffix array must equal the
  * driver-side sorted-suffixes reference exactly, and repeatPositions
  * must equal the brute-force all-windows reference — on planted corpora
  * with known repeats and on randomized ones.
  */
class SuffixSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Driver-side reference: concatenate with NUL in doc order, sort all
    * suffix indices lexicographically.
    */
  private def refSuffixOrder(texts: Seq[(Long, String)]): Seq[(Long, Long)] = {
    val full = texts.sortBy(_._1).map(_._2 + "\u0000").mkString
    val owners = texts.sortBy(_._1).flatMap { case (id, t) =>
      (0 to t.length).map(off => (id, off.toLong))
    }
    val idx = full.indices.sortBy(i => full.substring(i))
    idx.map(owners)
  }

  private def refRepeats(texts: Seq[(Long, String)], l: Int): Set[(Long, Long)] = {
    val wins = texts.flatMap { case (id, t) =>
      (0 to t.length - l).map(off => (t.substring(off, off + l), (id, off.toLong)))
    }
    wins.groupBy(_._1).filter(_._2.size >= 2).values.flatten.map(_._2).toSet
  }

  private def toDf(texts: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    texts.toDF("doc_id", "text")
  }

  test("suffix ranks equal the driver-side sorted-suffix reference (planted corpus)") {
    val texts = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"),
      (7L, "pack my box with five dozen liquor jugs"),
      (9L, "the quick brown fox naps under the lazy sun"),
      (12L, "sphinx of black quartz judge my vow"))
    val got = SuffixOps.suffixRanks(toDf(texts))
      .orderBy(col("rank")).select("doc_id", "off").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === refSuffixOrder(texts))
  }

  test("suffix ranks equal the reference on randomized corpora (repetition-heavy alphabet)") {
    val rnd = new scala.util.Random(777)
    for (round <- 1 to 4) {
      val texts = (0L until 12L).map { id =>
        id -> (1 to (20 + rnd.nextInt(60)))
          .map(_ => "ab".charAt(rnd.nextInt(2))).mkString
      }
      val got = SuffixOps.suffixRanks(toDf(texts))
        .orderBy(col("rank")).select("doc_id", "off").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === refSuffixOrder(texts), s"round $round")
    }
  }

  test("repeatPositions == brute-force all-windows reference; planted 30-char repeat found") {
    val shared = "this exact thirty char string!"
    require(shared.length == 30)
    val rnd = new scala.util.Random(42)
    def noise(n: Int) =
      (1 to n).map(_ => "abcdefgh ".charAt(rnd.nextInt(9))).mkString
    val texts = Seq(
      (1L, noise(40) + shared + noise(25)),
      (2L, noise(33)),
      (5L, noise(20) + shared + noise(41)),
      (8L, noise(55)))
    val got = SuffixOps.repeatPositions(toDf(texts), minLen = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = refRepeats(texts, 24)
    assert(got === exp)
    // the planted copy participates: every in-repeat window offset of the
    // shared string in doc 1 must appear (40 .. 40 + 30 - 24)
    (40L to 46L).foreach(off => assert(got.contains((1L, off)), s"off $off"))
    assert(got.exists(_._1 == 5L))
    assert(!got.exists(_._1 == 2L) && !got.exists(_._1 == 8L))
  }

  test("no false repeats on an all-distinct corpus") {
    val texts = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "ABCDEFGHIJKLMNOPQRSTUVWXYZ!@#$%^&*()"))
    assert(SuffixOps.repeatPositions(toDf(texts), minLen = 10).count() === 0L)
  }

  /** Driver-side cut reference: remove every char covered by any repeated
    * L-window (all occurrences — the Lee et al. policy).
    */
  private def refClean(texts: Seq[(Long, String)], l: Int): Map[Long, String] = {
    val reps = refRepeats(texts, l)
    texts.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      reps.iterator.filter(_._1 == id).foreach { case (_, off) =>
        (off.toInt until off.toInt + l).foreach(covered(_) = true)
      }
      id -> t.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
    }.toMap
  }

  test("exactSubstrClean == driver-side cut of the brute-force covered set") {
    val shared = "this exact thirty char string!"
    val also = "another twenty-five chars"
    require(shared.length == 30 && also.length == 25)
    val rnd = new scala.util.Random(4242)
    def noise(n: Int) =
      (1 to n).map(_ => "abcdefgh ".charAt(rnd.nextInt(9))).mkString
    val texts = Seq(
      (1L, noise(18) + shared + noise(9) + also + noise(14)),
      (2L, noise(41)),
      (5L, noise(7) + also + noise(12) + shared + noise(20)),
      (8L, noise(36)))
    val got = SuffixOps.exactSubstrClean(toDf(texts), minLen = 24)
      .collect().map(r => (r.getLong(0),
        (r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    val exp = refClean(texts, 24)
    texts.foreach { case (id, t) =>
      val (clean, covered, _) = got(id)
      assert(clean === exp(id), s"doc $id")
      assert(covered === t.length - exp(id).length, s"doc $id covered")
    }
    // both planted strings are fully cut from both carriers, survivors intact
    assert(!got(1L)._1.contains(shared) && !got(1L)._1.contains(also))
    assert(!got(5L)._1.contains(shared) && !got(5L)._1.contains(also))
    assert(got(2L)._1 === texts.find(_._1 == 2L).get._2)
    assert(got(8L)._1 === texts.find(_._1 == 8L).get._2)
  }

  test("overlapping repeat windows merge into one maximal span") {
    val shared = "x" * 9 + "X" + "y" * 9 + "Y" + "z" * 9 + "Z" + "w" * 9 + "W" // 40 chars, aperiodic markers
    require(shared.length == 40)
    // boundary chars deliberately DIFFER between the docs ('.'/',' vs
    // 'x'/'y') so the maximal common substring is exactly the 40 chars
    val texts = Seq(
      (1L, "HEAD-1234." + shared + ",TAIL-5678"),
      (2L, "left/pad!x" + shared + "yother end"))
    val rows = SuffixOps.exactSubstrClean(toDf(texts), minLen = 24)
      .collect().map(r => (r.getLong(0),
        (r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // windows at offsets 10..26 all overlap -> exactly ONE span of 40 chars
    texts.foreach { case (id, _) =>
      val (clean, covered, nSpans) = rows(id)
      assert(nSpans === 1L, s"doc $id spans")
      assert(covered === 40L, s"doc $id covered")
      assert(clean === refClean(texts, 24)(id), s"doc $id text")
    }
  }

  test("all-distinct corpus passes through exactSubstrClean unchanged") {
    val texts = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "ABCDEFGHIJKLMNOPQRSTUVWXYZ!@#$%^&*()"))
    val rows = SuffixOps.exactSubstrClean(toDf(texts), minLen = 10)
      .collect().map(r => (r.getLong(0), (r.getString(2), r.getLong(3)))).toMap
    texts.foreach { case (id, t) =>
      assert(rows(id) === ((t, 0L)))
    }
  }

  test("q100 runs with all es_ok true and cuts the word-salad repeats") {
    val df = SuffixOps.q100ExactSubstrCut(spark, "/root/testdata/sf0.001")
    assert(df.filter(!col("es_ok")).count() === 0L)
    assert(df.count() > 0)
    assert(df.agg(sum("covered")).head().getLong(0) > 0L)
  }

  test("q99 runs with all sa_ok true and finds the word-salad repeats") {
    val df = SuffixOps.q99ExactRepeats(spark, "/root/testdata/sf0.001")
    assert(df.filter(!col("sa_ok")).count() === 0L)
    assert(df.count() > 0)
    // the 31-word salad corpus necessarily repeats 24-char strings
    assert(df.agg(sum("n_repeat_pos")).head().getLong(0) > 0L)
  }
}
