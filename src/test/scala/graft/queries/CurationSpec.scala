package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The distributed DSIR weigher, domain rollup, and segment cleaner must
  * equal independent SEQUENTIAL implementations of the same integer
  * formulas on small corpora (including the edge cases the harness corpus
  * lacks: a fully-dropped document, an even-sized median group), and the
  * planted-class q103 must actually separate — the importance weights
  * recover the planted target slice.
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    s.trim.toLowerCase.split("[ \t\n\f\r]+").toSeq

  private def bitlen(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent 256-bucket hashed-bigram DSIR reference. */
  private def refDsir(docs: Seq[(Long, Boolean, String)]): Map[Long, (Long, Long)] = {
    def buckets(t: String): Seq[Int] =
      tok(t).sliding(2).filter(_.size == 2)
        .map(p => Integer.parseInt(md5hex(s"${p(0)} ${p(1)}").take(2), 16)).toSeq
    val all = docs.flatMap { case (id, tgt, t) => buckets(t).map(b => (b, tgt)) }
    val cr = all.groupBy(_._1).map { case (b, v) => b -> v.size.toLong }
    val ct = all.filter(_._2).groupBy(_._1).map { case (b, v) => b -> v.size.toLong }
    val k = bitlen(cr.values.sum + 256) - bitlen(ct.values.sum + 256)
    docs.map { case (id, _, t) =>
      val bs = buckets(t)
      val w = bs.map(b => bitlen(ct.getOrElse(b, 0L) + 1) - bitlen(cr(b) + 1) + k).sum.toLong
      id -> (bs.size.toLong, w)
    }.toMap
  }

  test("dsirWeights == sequential reference (feats, w_bits)") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, true, "alpha beta gamma alpha beta delta epsilon"),
      (2L, true, "alpha beta alpha beta alpha beta zeta"),
      (3L, false, "omega psi chi omega psi phi upsilon"),
      (4L, false, "omega psi omega psi omega psi tau"),
      (5L, false, "alpha omega beta psi gamma chi mixed"))
    val got = CurationOps.dsirWeights(
        docs.toDF("doc_id", "tgt", "text"), col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = refDsir(docs)
    assert(got.keySet === exp.keySet)
    exp.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
  }

  test("q103 over the harness corpus: planted target slice recovered") {
    val df = CurationOps.q103DsirWeights(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(df.size === 500)
    // 100% recall on the planted target class at the fixed threshold
    val targets = df.keys.filter(_ % 3 == 0)
    assert(targets.nonEmpty && targets.forall(df(_)), "every class-0 doc kept")
    // and the gate is a real gate: a majority of non-targets are dropped
    val others = df.keys.filterNot(_ % 3 == 0).toSeq
    val kept = others.count(df(_))
    assert(kept.toDouble / others.size < 0.5, s"non-target keep rate $kept/${others.size}")
  }

  test("domain rollup: exact rank-median incl. even group and tie ordering") {
    val s = spark; import s.implicits._
    // srcA even (4 docs): lower median = rank 2; srcB has q ties broken by doc_id
    val docs = Seq(
      (1L, "srcA", "the the alpha beta"),       // q=500
      (2L, "srcA", "alpha beta gamma delta"),   // q=0
      (3L, "srcA", "the alpha beta gamma"),     // q=250
      (4L, "srcA", "the the the alpha"),        // q=750
      (5L, "srcB", "the alpha"),                // q=500
      (6L, "srcB", "a beta"),                   // q=500
      (7L, "srcB", "gamma delta"))              // q=0
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet("/tmp/graft-curation-docs/documents.parquet")
    val got = CurationOps.q106DomainRollup(spark, "/tmp/graft-curation-docs")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // srcA sorted q: 0,250,500,750 → rank (4+1)/2=2 → 250; avg=round(1500/4)=375
    assert(got("srcA") === ((4L, 375L, 250L, 0L, 750L)))
    // srcB sorted (q,doc_id): (0,7),(500,5),(500,6) → rank 2 → 500
    assert(got("srcB") === ((3L, 333L, 500L, 0L, 500L)))
  }

  /** Sequential segment cleaner: same split/LM/threshold/rebuild. */
  private def refClean(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    val train = docs.filter(_._1 % 5 != 0).flatMap(d => tok(d._2))
    val freq = train.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tv = freq.values.sum + freq.size
    docs.map { case (id, t) =>
      val segs = tok(t).zipWithIndex.groupBy(_._2 / 25).toSeq.sortBy(_._1)
      val verdicts = segs.map { case (_, ws) =>
        val b = ws.map(w => (bitlen(tv) - bitlen(freq.getOrElse(w._1, 0L) + 1)).toLong).sum
        val keep = Math.round(100.0 * b / ws.size) <= 510
        (keep, ws.map(_._1))
      }
      val keptToks = verdicts.filter(_._1).flatMap(_._2)
      id -> (segs.size.toLong, verdicts.count(!_._1).toLong,
        keptToks.size.toLong, md5hex(keptToks.mkString(" ")))
    }.toMap
  }

  test("paragraphClean == sequential reference incl. fully-dropped doc") {
    val s = spark; import s.implicits._
    val common = (1 to 30).map(i => s"w${i % 5}").mkString(" ")
    val docs = Seq(
      (1L, common + " " + common),                        // all common → kept
      (2L, (1 to 30).map(i => s"rare$i").mkString(" ")),  // all rare → dropped fully
      (3L, common + " " + (1 to 25).map(i => s"odd$i").mkString(" ")),
      (4L, common), (6L, common), (7L, common))           // train mass
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/graft-curation-docs2/documents.parquet")
    val got = CurationOps.q107ParagraphClean(spark, "/tmp/graft-curation-docs2")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val exp = refClean(docs)
    assert(got.keySet === exp.keySet)
    exp.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
    // the edge cases really occurred: a fully-dropped doc ships md5("")
    assert(got(2L)._3 === 0L && got(2L)._4 === md5hex(""))
    assert(got(3L)._2 > 0L && got(3L)._3 > 0L) // partial drop + rebuild
  }

  test("host budget: tiers from the median, hash-order fill, full audit rows") {
    val s = spark; import s.implicits._
    // srcHi median 750 → tier 15; srcMid median 60x → tier 10; srcLo → 5
    def doc(id: Long, src: String, q: Int): (Long, String, String) = {
      // q stopwords out of 1000 tokens → density exactly q‰
      val toks = Seq.fill(q)("the") ++ Seq.fill(1000 - q)("alpha")
      (id, src, toks.mkString(" "))
    }
    val docs = (0L until 8L).map(i => doc(i, "srcHi", 750)) ++
      (10L until 18L).map(i => doc(i, "srcMid", 65)) ++
      (20L until 28L).map(i => doc(i, "srcLo", 10))
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet("/tmp/graft-curation-docs3/documents.parquet")
    val got = CurationOps.q112HostBudget(spark, "/tmp/graft-curation-docs3")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(got.size === 24) // every doc audited, none silently dropped
    assert(got(0L)._3 === 15L && got(10L)._3 === 10L && got(20L)._3 === 5L)
    // hash-order fill: rank sequence == sequential md5 sort per source
    for ((src, ids) <- Seq("srcHi" -> (0L until 8L), "srcMid" -> (10L until 18L),
                           "srcLo" -> (20L until 28L))) {
      val expOrder = ids.sortBy(i => (md5hex(i.toString), i))
      expOrder.zipWithIndex.foreach { case (id, i) =>
        assert(got(id)._4 === i + 1L, s"$src doc $id rank")
      }
      val budget = got(ids.head)._3
      ids.foreach(id => assert(got(id)._5 === (got(id)._4 <= budget)))
      // the budget is a real cut: 8 docs/source > lo tier of 5
      if (src == "srcLo") assert(ids.count(got(_)._5) === 5)
    }
  }

  test("model sides broadcast: dsir dist table and cleaner vocabulary") {
    for (q <- Seq("q103_dsir_weights", "q107_paragraph_clean")) {
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"$q lost its broadcast model side:\n${plan.take(2000)}")
    }
  }

  test("PAV == brute-force minimax (property); fit monotone; mass conserved") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val b = Seq.fill(1 + rnd.nextInt(12)) {
        val n = 1L + rnd.nextInt(9)
        (n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val fit = CurationOps.pav(b)
      val means = fit.map { case (n, sy) => sy.toDouble / n }
      // 1) monotone nondecreasing
      means.sliding(2).foreach {
        case Seq(a, c) => assert(a <= c + 1e-12, s"not monotone: $b -> $fit")
        case _         =>
      }
      // 2) equals the minimax characterization, bucket by bucket
      val cn = b.scanLeft(0L)(_ + _._1)
      val cy = b.scanLeft(0L)(_ + _._2)
      b.indices.foreach { i =>
        val mm = (0 to i).map { l =>
          (i until b.length).map { r =>
            (cy(r + 1) - cy(l)).toDouble / (cn(r + 1) - cn(l))
          }.min
        }.max
        assert(math.abs(means(i) - mm) < 1e-9,
          s"minimax mismatch at $i: $b -> ${means(i)} vs $mm")
      }
      // 3) pools conserve counts: same-length output, per-pool constant
      assert(fit.length == b.length)
    }
  }

  test("q133: global rank computed with NO global window; offsets broadcast") {
    val df = CurationOps.q133QualityDeciles(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // every Window must carry a partition spec (the score groups); an
    // empty windowspecdefinition() would be the single-partition
    // global-sort anti-pattern this operator exists to avoid
    val globalWindow = plan.linesIterator.exists(l =>
      l.contains("windowspecdefinition(") &&
        l.replaceAll("\\s", "").contains("windowspecdefinition(doc_id"))
    assert(!globalWindow, "q133 fell back to a global window:\n" + plan.take(2000))
    assert(plan.contains("windowspecdefinition(score"),
      "score-partitioned window missing:\n" + plan.take(2000))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "offsets not broadcast:\n" + plan.take(2000))
    // rank really is the global (score desc, doc_id) order
    val rows = df.collect().sortBy(_.getLong(2))
    val resorted = rows.sortBy(r => (-r.getLong(1), r.getLong(0)))
    assert(rows.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq)
    assert((rows.toSeq == resorted.toSeq) && rows.forall(r =>
      r.getInt(3) == ((r.getLong(2) - 1) * 10 / rows.length).toInt))
  }

  /** Sequential reference for q172's repetition runs: longest run of
    * positions i (within the first maxToks tokens) with t(i) == t(i−p).
    */
  private def refReps(text: String, maxToks: Int = 2048): (Long, Long, Long) = {
    val t = tok(text).take(maxToks)
    def longest(p: Int): Long = {
      var best = 0; var cur = 0
      for (i <- t.indices) {
        if (i >= p && t(i) == t(i - p)) { cur += 1; best = math.max(best, cur) }
        else cur = 0
      }
      best.toLong
    }
    (longest(1), longest(2), longest(3))
  }

  test("repetitionRuns == sequential reference; loops gate, prose doesn't") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(172)
    val planted: Seq[(Long, String)] = Seq(
      1L -> ("intro words then " + Seq.fill(15)("the").mkString(" ")),
      2L -> ("x " + Seq.fill(9)("click here").mkString(" ") + " end"),
      3L -> Seq.fill(7)("buy cheap pills").mkString(" "),
      4L -> "a perfectly ordinary sentence with no repeats at all",
      5L -> "",
      // loop planted to straddle the 2048-token cap: only its head counts
      6L -> ((0 until 2040).map(i => s"w$i").mkString(" ") + " " +
        Seq.fill(30)("loop").mkString(" "))
    ) ++ (7L to 20L).map(i =>
      i -> Seq.fill(60)(s"t${rnd.nextInt(4)}").mkString(" "))
    val got = TextOps.repetitionRuns(planted.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    planted.foreach { case (id, text) =>
      val want = refReps(text)
      val g = got.getOrElse(id, (0L, 0L, 0L))
      assert(g == want, s"doc $id: got $g want $want")
    }
    def mx(id: Long) = {
      val g = got.getOrElse(id, (0L, 0L, 0L)); Seq(g._1, g._2, g._3).max
    }
    // the q172 gate: the planted unigram/bigram/trigram loops all cross
    // 12; natural prose, empty text, and the beyond-cap loop stay below
    assert(mx(1L) >= 12 && mx(2L) >= 12 && mx(3L) >= 12)
    assert(mx(4L) < 12 && mx(5L) < 12 && mx(6L) < 12)
  }
  test("q244 code/math detection: planted code, LaTeX, and prose classify correctly") {
    val s = spark; import s.implicits._
    val py =
      "def main():\n  import os\n  handler = lambda x: x\n" +
      "  if ready:\n    return handler(os)\n  elif done:\n    pass"
    val cSrc =
      "#include <stdio.h>\nint main(void) {\n  struct point p;\n" +
      "  printf(\"%d\", sizeof(p));\n  return 0;\n}"
    val rust =
      "fn run() {\n  let mut total = 0;\n  impl Display match total {\n" +
      "    _ => total += 1,\n  }\n}"
    val js =
      "function add(a, b) {\n  const sum = a + b;\n  var out = sum;\n" +
      "  return (x) => out + x;\n}"
    val latex =
      "the closed form uses \\frac{a}{b} inside \\begin{equation} with " +
      "\\int f dx and \\sum terms, ending with $$E = mc^2$$"
    val prose =
      "ordinary narrative text flows here with no markup of any kind " +
      "and keeps talking about gardens weather and travel plans"
    val docs = Seq(1L -> py, 2L -> cSrc, 3L -> rust, 4L -> js,
      5L -> latex, 6L -> prose).toDF("doc_id", "text")
    val got = CurationOps.codeDetect(docs).collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("cls"),
        r.getAs[String]("kw_lang"), r.getAs[Long]("has_brace")))).toMap
    assert(got(1L)._1 === "code" && got(1L)._2 === "python")
    assert(got(2L)._1 === "code" && got(2L)._2 === "c")
    assert(got(3L)._1 === "code" && got(3L)._2 === "rust")
    assert(got(4L)._1 === "code" && got(4L)._2 === "js")
    assert(got(5L)._1 === "math" && got(5L)._3 === 1L) // C4 would drop it
    assert(got(6L) === (("prose", "none", 0L)))
  }
}
