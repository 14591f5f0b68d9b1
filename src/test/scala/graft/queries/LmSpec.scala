package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The distributed stupid-backoff scorer and Naive-Bayes classifier must
  * equal independent SEQUENTIAL implementations of the same integer-bits
  * formulas on planted corpora, and the planted-class q105 must classify
  * the harness corpus perfectly (the classes are vocabulary-disjoint by
  * construction).
  */
class LmSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def tok(s: String): Seq[String] =
    s.trim.toLowerCase.split("[ \t\n\f\r]+").toSeq

  private def bitlen(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Sequential stupid-backoff reference: same split, same formulas. */
  private def refBackoff(texts: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val pairs = texts.map { case (id, t) =>
      id -> tok(t).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
    }
    val trainT = texts.filter(_._1 % 5 != 0).flatMap(t => tok(t._2))
    val uni = trainT.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bi = pairs.filter(_._1 % 5 != 0).flatMap(_._2)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tv = uni.values.sum + uni.size
    pairs.map { case (id, ps) =>
      var bits = 0L
      var backs = 0L
      ps.foreach { case (a, b) =>
        bi.get((a, b)) match {
          case Some(c2) => bits += bitlen(uni(a)) - bitlen(c2)
          case None =>
            backs += 1
            bits += 2 + bitlen(tv) - bitlen(uni.getOrElse(b, 0L) + 1)
        }
      }
      id -> (ps.size.toLong, backs, bits)
    }.toMap
  }

  /** Sequential Naive-Bayes reference: same counts, same bits, same
    * (bits, class) tie-break.
    */
  private def refNb(docs: Seq[(Long, Long, String)]): Map[Long, (Long, Long)] = {
    val train = docs.filter(_._1 % 5 != 0)
    val cw = train.flatMap { case (_, c, w) => tok(w).map(t => (c, t)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ct = cw.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val vocab = train.flatMap(d => tok(d._3)).distinct.size.toLong
    val pd = train.groupBy(_._2).map { case (c, ds) => c -> ds.size.toLong }
    val tdocs = train.size.toLong
    docs.map { case (id, _, w) =>
      val scored = pd.keys.toSeq.sorted.map { c =>
        val prior = bitlen(tdocs) - bitlen(pd(c))
        val tb = tok(w).map(t =>
          (bitlen(ct(c) + vocab) - bitlen(cw.getOrElse((c, t), 0L) + 1)).toLong).sum
        (tb + prior, c)
      }
      val (bits, c) = scored.min
      id -> (c, bits)
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat and the cat ran"),
    (2L, "the dog sat on the rug and then slept"),
    (3L, "a cat and a dog met on the mat"),
    (4L, "the cat sat on the mat again and again"),
    (5L, "entirely novel words appear in this held out document"), // id%5==0: held out
    (10L, "the cat sat on the unknown trampoline today"))          // id%5==0: part OOV

  test("bigramBackoff == sequential reference (hits, backoffs, bits)") {
    val s = spark; import s.implicits._
    val df = LmOps.bigramBackoff(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exp = refBackoff(corpus)
    assert(df.keySet === exp.keySet)
    exp.foreach { case (id, e) => assert(df(id) === e, s"doc $id") }
    // the fully-novel held-out doc backs off on every bigram
    assert(df(5L)._2 === df(5L)._1)
    // train docs never back off on their own bigrams
    assert(df(1L)._2 === 0L)
  }

  test("naiveBayes == sequential reference and planted classes separate") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    def noise(n: Int) =
      (1 to n).map(_ => Seq("lorem", "ipsum", "dolor", "sit")(rnd.nextInt(4))).mkString(" ")
    val docs = (0L until 30L).map { id =>
      val c = id % 3
      val sig = Seq("alpha beta", "gamma delta", "epsilon zeta")(c.toInt)
      (id, c, s"${noise(6)} $sig $sig $sig ${noise(4)}")
    }
    val got = LmOps.naiveBayes(docs.toDF("doc_id", "cls_true", "wire"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val exp = refNb(docs)
    docs.foreach { case (id, c, _) =>
      assert((got(id)._1, got(id)._2) === exp(id), s"doc $id")
      assert(got(id)._1 === c, s"doc $id should classify correctly")
      assert(got(id)._3, s"doc $id correct flag")
    }
  }

  test("q105 over the harness corpus: planted classes recovered perfectly") {
    val df = LmOps.q105NaiveBayes(spark, "/root/testdata/sf0.001")
    assert(df.count() === 500L)
    assert(df.filter(!col("correct")).count() === 0L)
  }

  test("q102 over the harness corpus: rows, internal consistency, kept split") {
    val df = LmOps.q102BigramBackoff(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() === 500L)
    // avg is exactly the rounded ratio; kept is exactly the threshold test
    assert(df.filter(col("avg_bits_x100") =!=
      round(lit(100.0) * col("sb_bits") / col("bigrams")).cast("long")).count() === 0L)
    assert(df.filter(col("kept") =!= (col("avg_bits_x100") <= 490)).count() === 0L)
    // held-out docs exist on both sides of the threshold at this corpus
    assert(df.filter(col("kept")).count() > 0L)
    assert(df.filter(!col("kept")).count() > 0L)
    df.unpersist()
  }
}
