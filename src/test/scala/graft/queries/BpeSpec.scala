package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Distributed BPE training must produce EXACTLY the merge table of an
  * independent sequential implementation of the published algorithm
  * (Sennrich et al. 2016): same pairs, same order, same counts — on the
  * harness corpus, on randomized corpora, and on hand-built tie-break and
  * overlap cases.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential clean-room reference: word-histogram BPE with greedy
    * leftmost non-overlapping merge application and (count desc, pair asc)
    * selection — written against the paper, sharing no code with BpeOps.
    */
  private def referenceBpe(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    val hist = mutable.Map.empty[String, Long]
    texts.foreach(_.toLowerCase.trim.split("[ \t\n\f\r]+")
      .filter(_.nonEmpty).foreach(w => hist(w) = hist.getOrElse(w, 0L) + 1))
    var words: Vector[(Vector[String], Long)] =
      hist.toVector.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= n && continue) {
      val pc = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) continue = false
      else {
        val ((l, r), c) = pc.toVector
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((rank, l, r, c))
        words = words.map { case (syms, cnt) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), cnt)
        }
        rank += 1
      }
    }
    out.result()
  }

  private def sparkBpe(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    val s = spark
    import s.implicits._
    BpeOps.trainBpe(texts.toDF("text"), n)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
  }

  test("merge table == sequential reference on the harness corpus") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val got = BpeOps.trainBpe(
      spark.read.parquet(s"$sfDir/documents.parquet"), 12)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
    val exp = referenceBpe(texts, 12)
    assert(got === exp)
  }

  test("merge table == sequential reference on randomized corpora") {
    val rnd = new scala.util.Random(4242)
    val alphabet = "abcde"
    for (seed <- 1 to 8) {
      val texts = (1 to 30).map { _ =>
        (1 to (2 + rnd.nextInt(8))).map { _ =>
          (1 to (1 + rnd.nextInt(6)))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      assert(sparkBpe(texts, 8) === referenceBpe(texts, 8), s"round $seed")
    }
  }

  test("tie-break is deterministic: equal counts choose the lexicographically smallest pair") {
    // "xy" and "pq" both appear exactly 3 times; (p,q) < (x,y)
    val texts = Seq("xy xy xy pq pq pq")
    val got = sparkBpe(texts, 2)
    assert(got.head._2 == "p" && got.head._3 == "q", s"got $got")
    assert(got === referenceBpe(texts, 2))
  }

  test("overlapping runs merge greedily leftmost: aaaa -> (aa)(aa)") {
    val texts = Seq("aaaa aaaa aaaa")
    val got = sparkBpe(texts, 2)
    // merge 1: (a,a) count 9 (3 per word, greedy pairs counted adjacently)
    assert(got.head._2 == "a" && got.head._3 == "a")
    // merge 2 must see each word as [aa, aa]: pair (aa,aa) count 3
    assert(got(1)._2 == "aa" && got(1)._3 == "aa" && got(1)._4 == 3L, s"got $got")
    assert(got === referenceBpe(texts, 2))
  }

  test("runs out of pairs early: single-char vocabulary stops the loop") {
    val texts = Seq("a b c a b")
    assert(sparkBpe(texts, 5) === Seq.empty)
  }

  test("encodeWord applies learned merges by rank: the classic low/lower/lowest case") {
    // 'lo' dominates, then 'low'; unseen suffixes stay characters
    val texts = Seq("low low low low lower lowest")
    val merges = sparkBpe(texts, 2).map(m => (m._2, m._3))
    assert(merges === Seq(("l", "o"), ("lo", "w")))
    assert(BpeOps.encodeWord("low", merges).toSeq === Seq("low"))
    assert(BpeOps.encodeWord("lower", merges).toSeq === Seq("low", "e", "r"))
    assert(BpeOps.encodeWord("lowest", merges).toSeq ===
      Seq("low", "e", "s", "t"))
    assert(BpeOps.encodeWord("slow", merges).toSeq === Seq("s", "low"))
    assert(BpeOps.encodeWord("", merges).toSeq === Seq.empty)
  }

  test("q98 flag: JVM encoder and the Catalyst HOF fold agree on every doc") {
    val df = BpeOps.q98BpeEncode(spark, sfDir)
    assert(df.filter(!org.apache.spark.sql.functions.col("enc_ok")).count() === 0L)
    // and encoding genuinely compresses: merges fire somewhere
    val r = df.agg(
      org.apache.spark.sql.functions.sum("n_words"),
      org.apache.spark.sql.functions.sum("n_subwords"),
      org.apache.spark.sql.functions.sum("n_whole")).head()
    assert(r.getLong(2) > 0, "no word was fully merged — training is off")
    assert(r.getLong(1) > r.getLong(0), "every word collapsed to one token")
  }
}
