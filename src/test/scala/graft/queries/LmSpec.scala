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

  // ------------------------------------------------------------------ q117

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(t: String, dim: Int): Int =
    (java.lang.Long.parseLong(md5hex(t).substring(0, 8), 16) % dim).toInt

  /** Sequential reference for the fixed-point-GD classifier, mirroring the
    * distributed arithmetic OPERATION FOR OPERATION: per-doc doubles in
    * ascending-bucket order, long truncation at the same points, integer
    * weight updates. Because every cross-row accumulation is a long sum,
    * the distributed trainer must equal this EXACTLY — not approximately.
    */
  private def refClf(docs: Seq[(Long, Long, String)], dim: Int,
      iters: Int): (Array[Long], Seq[Long]) = {
    case class Feat(id: Long, y: Long, ntok: Long, fs: Seq[(Int, Long)])
    val feats = docs.map { case (id, y, wire) =>
      val tk = wire.trim.toLowerCase.split("[ \t\n\f\r]+").toSeq
      val fs = tk.groupBy(t => bucket(t, dim))
        .map { case (f, v) => (f, v.size.toLong) }.toSeq.sortBy(_._1)
      Feat(id, y, tk.size.toLong, fs)
    }
    val train = feats.filter(_.id % 5 != 0)
    val n = train.size.toLong
    val w = new Array[Long](dim)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (_ <- 1 to iters) {
      val wd = w.map(_.toDouble / 1e9)
      var loss = 0L
      val g = new Array[Long](dim)
      train.foreach { d =>
        var acc = 0.0d
        d.fs.foreach { case (f, c) => acc += wd(f) * c }
        val z = acc / d.ntok
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - d.y.toDouble
        loss += (-(d.y * math.log(math.max(p, 1e-12)) +
          (1L - d.y) * math.log(math.max(1.0 - p, 1e-12))) * 1e6).toLong
        d.fs.foreach { case (f, c) =>
          g(f) += (err * c / d.ntok * 1e9).toLong
        }
      }
      losses += loss
      var f = 0
      while (f < dim) { w(f) -= g(f) * 8L / n; f += 1 }
    }
    (w, losses.toSeq)
  }

  test("fixed-point GD classifier == sequential reference, bit-exact") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val fill = Vector("lorem", "ipsum", "dolor", "sit", "amet", "tempor",
      "labore", "magna", "aliqua", "veniam", "nostrud", "ullamco")
    val good = Vector("research", "study", "method", "results")
    val spam = Vector("buy", "cheap", "free", "offer")
    val docs = (0L until 80L).map { i =>
      val planted = if (i % 2 == 0) good else spam
      val words = Seq.fill(20)(fill(rnd.nextInt(fill.length))) ++
        Seq.fill(6)(planted(rnd.nextInt(4)))
      (i, i % 2, rnd.shuffle(words).mkString(" "))
    }
    val feats = LmOps.clfFeatures(docs.toDF("doc_id", "y", "wire"),
      LmOps.ClfDim).localCheckpoint()
    val (w, losses) = LmOps.trainClassifier(feats, LmOps.ClfDim, LmOps.ClfIters)
    // 1. EXACT equality with the sequential reference — the fixed-point
    //    reproducibility claim, not a tolerance check
    val (wr, lossesR) = refClf(docs, LmOps.ClfDim, LmOps.ClfIters)
    assert(losses === lossesR)
    assert(w.toSeq === wr.toSeq)
    // 2. partitioning invariance: 1 partition vs 7 → identical trajectory
    val (w1, l1) = LmOps.trainClassifier(feats.repartition(1),
      LmOps.ClfDim, LmOps.ClfIters)
    val (w7, l7) = LmOps.trainClassifier(feats.repartition(7),
      LmOps.ClfDim, LmOps.ClfIters)
    assert(w1.toSeq === w7.toSeq)
    assert(l1 === l7)
    assert(w1.toSeq === w.toSeq)
    // 3. it actually learns: loss decreases, planted holdout separates
    assert(losses.sliding(2).forall(p => p(1) < p.head))
    assert(LmOps.holdoutAccX1000(feats, w) >= 900L)
  }
}
