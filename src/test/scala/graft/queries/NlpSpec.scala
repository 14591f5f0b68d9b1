package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Planted-input checks for the NLP analysis operators (q182/q184), beyond
  * the DuckDB hash-equality the driver enforces: RAKE must prefer a
  * repeated multiword phrase over its member words, TextRank must surface
  * the hub sentence, and both must be partitioning-invariant (the
  * fixed-point integer arithmetic claim, tested rather than asserted).
  */
class NlpSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docs(rows: Seq[(Long, String)], parts: Int = 4) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text").repartition(parts)
  }

  test("RAKE: repeated multiword phrase outranks any single word") {
    // "minimal generating set" appears 3x as an unbroken candidate run;
    // every other content word appears in shorter/rarer phrases.
    val d = docs(Seq(
      (1L, "minimal generating set of the group. we study a minimal " +
        "generating set, and the minimal generating set.")))
    val top = NlpOps.rake(d).orderBy("rank").collect()
    assert(top.head.getAs[String]("phrase") === "minimal generating set")
    // deg/freq: each of the 3 words has freq 3, deg 9 (three 3-phrases)
    // -> wscore 3000 each -> phrase score 9000
    assert(top.head.getAs[Long]("score") === 9000L)
  }

  test("RAKE: stopwords and punctuation break phrases exactly") {
    val d = docs(Seq((7L, "alpha beta. gamma, delta of epsilon")))
    val phrases = NlpOps.rake(d, k = 10).collect()
      .map(_.getAs[String]("phrase")).toSet
    // "alpha beta" (brk after beta.), "gamma" (brk after gamma,),
    // "delta" (stopword 'of' cuts), "epsilon"
    assert(phrases === Set("alpha beta", "gamma", "delta", "epsilon"))
  }

  test("TextRank: hub sentence wins; scores partitioning-invariant") {
    val text = "ocean currents move heat. ocean heat drives storms. " +
      "storms move inland? currents move heat and storms inland."
    val run1 = NlpOps.textrank(docs(Seq((1L, text)), parts = 1), k = 4)
      .orderBy("rank").collect().map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val run7 = NlpOps.textrank(docs(Seq((1L, text)), parts = 7), k = 4)
      .orderBy("rank").collect().map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run1 === run7, "fixed-point TextRank must not depend on partitioning")
    // sentence 4 shares tokens with every other sentence -> rank 1
    assert(run1.head._2 === 4L)
  }

  test("TextRank: single-sentence and empty docs degrade gracefully") {
    val d = docs(Seq((1L, "just one sentence"), (2L, ""), (3L, "   ")))
    val out = NlpOps.textrank(d).collect()
    assert(out.length === 1)          // docs 2/3 vanish, doc 1 has no edges
    // an edge-less sentence converges to the bare teleport term 0.15
    assert(out.head.getAs[Long]("score") === 150000L)
  }

  test("TextTiling: planted two-topic seam is the deepest, flagged gap") {
    // 5-word cycles divide the TileW=10 pseudo-sentence evenly, so every
    // interior block pair is count-identical (sim exactly 1000)
    val topicA = Seq.fill(20)("apple banana cherry date elder").mkString(" ")
    val topicB = Seq.fill(20)("zebra yak xylo wolf vex").mkString(" ")
    val run1 = NlpOps.texttile(docs(Seq((1L, s"$topicA $topicB")), parts = 1))
      .collect().map(r => (r.getAs[Long]("gap"), r.getAs[Long]("sim"),
        r.getAs[Long]("depth"), r.getAs[Boolean]("boundary"))).sortBy(_._1)
    val run7 = NlpOps.texttile(docs(Seq((1L, s"$topicA $topicB")), parts = 7))
      .collect().map(r => (r.getAs[Long]("gap"), r.getAs[Long]("sim"),
        r.getAs[Long]("depth"), r.getAs[Boolean]("boundary"))).sortBy(_._1)
    assert(run1.toSeq === run7.toSeq)
    // 100 tokens per topic, TileW=10 -> the seam sits exactly at gap 10
    val seam = run1.find(_._1 == 10L).get
    assert(seam._2 === 0L, "blocks across the seam share no tokens")
    assert(seam._3 === run1.map(_._3).max, "seam gap has the max depth")
    assert(seam._4, "seam gap must be flagged as a boundary")
    // deep-interior gaps (all-A vs all-A) are identical blocks: sim 1000
    assert(run1.find(_._1 == 5L).get._2 === 1000L)
  }

  test("unseen-vocab: hand-computed Good-Turing / Chao1 on a tiny corpus") {
    val s = spark; import s.implicits._
    // s1 tokens: a a a b b c d -> N=7 V=4 f1=2(c,d) f2=1(b)
    // p0_x1e6 = 2*1e6 div 7 = 285714; chao1_x100 = 400 + 2*2*100 div 2 = 600
    // s2 tokens: x y -> f2=0 fallback: chao1_x100 = 200 + 2*1*100 div 2 = 300
    val out = NlpOps.unseenVocab(
      Seq((1L, "a a a b b", "s1"), (2L, "c d", "s1"), (3L, "x y", "s2"))
        .toDF("doc_id", "text", "source"))
      .orderBy("source").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq === Seq(
      ("s1", 7L, 4L, 2L, 1L, 285714L, 600L),
      ("s2", 2L, 2L, 2L, 0L, 1000000L, 300L)))
  }

  test("readability: hand-computed ARI / CLI on a planted doc") {
    // tokens: the(3) cat(3) sat.(4) it(2) ran(3) fast!(5)
    //   -> chars 20, words 6; sentences: "the cat sat" / " it ran fast" -> 2
    // ari_x100 = 471*20 div 6 + 50*6 div 2 - 2143 = 1570 + 150 - 2143 = -423
    // cli_x100 = 588*20 div 6 - 2960*2 div 6 - 1580 = 1960 - 986 - 1580 = -606
    val out = NlpOps.readability(docs(Seq((1L, "the cat sat. it ran fast!"))))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_chars") === 20L)
    assert(r.getAs[Long]("n_words") === 6L)
    assert(r.getAs[Long]("n_sents") === 2L)
    assert(r.getAs[Long]("ari_x100") === -423L)
    assert(r.getAs[Long]("cli_x100") === -606L)
    assert(r.getAs[String]("band") === "elementary")
  }

  test("readability: fragment-only doc floors sentences at 1, empty doc drops") {
    val out = NlpOps.readability(docs(Seq((1L, "no terminator here"),
      (2L, "   ")))).collect()
    assert(out.length === 1, "whitespace-only doc has 0 words and is dropped")
    assert(out.head.getAs[Long]("n_sents") === 1L)
  }

  test("burstiness: constant-per-doc token fano 0, single-doc burst fano 9000") {
    // "uniform" once in each of 10 docs: D=10 T=10 S2=10
    //   -> fano = (10*10 - 100)*1000 div (10*10) = 0 (sub-Poisson)
    // "bursty" 10x in one doc: T=10 S2=100
    //   -> fano = (10*100 - 100)*1000 div 100 = 9000
    val rows = (0L until 10L).map { i =>
      val burst = if (i == 0) " bursty" * 10 else ""
      (i, s"filler$i uniform$burst")
    }
    val out = NlpOps.burstiness(docs(rows)).collect()
      .map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("fano_x1000"), r.getAs[Boolean]("bursty"))).toMap
    assert(out("uniform") === ((0L, false)))
    assert(out("bursty") === ((9000L, true)))
  }

  test("SPPMI: constructed synonyms are mutual top neighbors at cos2 = 1e6") {
    // alpha and beta occur in IDENTICAL contexts (left/right), so their
    // SPPMI vectors are equal -> squared cosine exactly 1e6; no other
    // token shares a context with them.
    val d = docs(Seq((1L, "alpha left alpha right"),
      (2L, "beta left beta right")))
    val out = NlpOps.sppmiNeighbors(d).collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("nbr"), r.getAs[Long]("cos2_x1e6"))).toMap
    assert(out(("alpha", 1L)) === (("beta", 1000000L)))
    assert(out(("beta", 1L)) === (("alpha", 1000000L)))
    assert(out(("left", 1L)) === (("right", 1000000L)))
  }
}
