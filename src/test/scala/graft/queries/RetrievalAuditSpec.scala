package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sequential-reference checks for the retrieval/gate audit operators,
  * beyond the DuckDB hash equality the driver enforces:
  *
  *  - [[TextOps.maxscoreAudit]] against an independent driver-side
  *    recomputation of the integer BM25, upper bounds, θ and skip set —
  *    including the SAFETY property MaxScore pruning rests on: no
  *    document of the exact top-k is ever classified skippable
  *    (UB(doc) ≥ score(doc) ≥ θ for top-k docs).
  *  - [[TextOps.gateAuc]] against a brute-force O(P·N) pair count of
  *    the Mann–Whitney statistic (the rank-sum identity the query uses
  *    must equal literal pair enumeration).
  */
class RetrievalAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val WS = "[ \\t\\n\\u000B\\f\\r]+"
  private def toks(text: String): Seq[String] =
    text.toLowerCase.trim.split(WS).toSeq

  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  test("maxscoreAudit == sequential reference; top-k docs never skippable") {
    val s = spark; import s.implicits._
    val terms = Seq("web", "data")
    val k = 3
    val corpus: Seq[(Long, String)] = Seq(
      (1L, "web data web data web extraction at scale"),
      (2L, "data pipelines and data lakes hold data"),
      (3L, "web crawling the open web"),
      (4L, "nothing relevant here at all"),
      (5L, "web"),
      (6L, "data quality for web data pipelines in production today"),
      (7L, "one more filler document without the magic words"),
      (8L, "web data"))
    // ---- independent reference ----
    val tks = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val dl = tks.map { case (id, t) => id -> t.size.toLong }
    val nDocs = corpus.size.toLong
    val avgdl = dl.values.sum / nDocs
    val tf = (for ((id, t) <- tks.toSeq; term <- terms;
                   c = t.count(_ == term) if c > 0)
      yield (id, term) -> c.toLong).toMap
    val df = terms.map(t => t -> tf.keys.count(_._2 == t).toLong).toMap
    def termScore(id: Long, term: String): Long = {
      val f = tf((id, term))
      (bitlen(nDocs) - bitlen(df(term))).toLong * 22000L * f * avgdl /
        (10L * avgdl * f + 3L * avgdl + 9L * dl(id))
    }
    // .toSeq before .map: mapping a Set would dedup EQUAL term scores
    // (doc 8 scores 1325 for both terms) and silently drop score mass
    val scores = tf.keys.toSeq.groupBy(_._1).map { case (id, ks) =>
      id -> ks.map { case (_, t) => termScore(id, t) }.sum
    }
    val topk = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(k)
    val theta = topk.map(_._2).min
    val uBound = terms.map(t =>
      t -> tf.keys.filter(_._2 == t).map(kk => termScore(kk._1, t)).max).toMap
    val ub = tf.keys.toSeq.groupBy(_._1).map { case (id, ks) =>
      id -> ks.map(kk => uBound(kk._2)).sum
    }
    val skippable = ub.count(_._2 < theta).toLong
    // the safety property the whole optimization rests on
    topk.foreach { case (id, sc) =>
      assert(ub(id) >= sc && sc >= theta,
        s"top-k doc $id must not be skippable")
    }
    // ---- compare to the distributed audit ----
    val got = TextOps.maxscoreAudit(
      corpus.toDF("doc_id", "text").repartition(4), terms, k).collect()
    assert(got.length === terms.size)
    got.foreach { r =>
      val t = r.getAs[String]("tok")
      assert(r.getAs[Long]("u_bound") === uBound(t), s"u_bound($t)")
      assert(r.getAs[Long]("df") === df(t), s"df($t)")
      assert(r.getAs[Long]("theta") === theta)
      assert(r.getAs[Long]("candidates") === ub.size.toLong)
      assert(r.getAs[Long]("skippable") === skippable)
      assert(r.getAs[Long]("skip_bp") === skippable * 10000L / ub.size)
    }
  }

  test("gateAuc == brute-force Mann-Whitney pair enumeration") {
    val s = spark; import s.implicits._
    val corpus: Seq[(Long, String)] = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "dup dup dup dup other other"),
      (4L, "eta theta iota kappa lambda mu"),
      (5L, "loop loop loop loop loop tail"),
      (6L, "nu xi omicron pi rho sigma"),
      (7L, "mix mix alpha beta gamma mix"),
      (8L, "tau upsilon phi chi psi omega"))
    val thr = 500L
    // ---- independent reference: corpus-level surprisal + brute pairs ----
    val tks = corpus.map { case (id, t) => id -> toks(t) }
    val freq = tks.flatMap(_._2).groupBy(identity).map { case (t, o) =>
      t -> o.size.toLong
    }
    val total = freq.values.sum
    val x = tks.map { case (id, t) =>
      val sbits = t.map(w => (bitlen(total) - bitlen(freq(w))).toLong).sum
      id -> 100L * sbits / t.size
    }.toMap
    val lab = tks.map { case (id, t) =>
      val w = t.size.toLong
      val u = t.distinct.size.toLong
      id -> (if (1000L * (w - u) / w >= thr) 1L else 0L)
    }.toMap
    val pos = lab.filter(_._2 == 1L).keys.toSeq
    val neg = lab.filter(_._2 == 0L).keys.toSeq
    assert(pos.nonEmpty && neg.nonEmpty, "planted corpus must split")
    val num2 = (for (p <- pos; n <- neg) yield {
      if (x(p) > x(n)) 2L else if (x(p) == x(n)) 1L else 0L
    }).sum
    val auc = num2 * 1000000L / (2L * pos.size * neg.size)
    // ---- compare ----
    val r = TextOps.gateAuc(
      corpus.toDF("doc_id", "text").repartition(4), thr).collect().head
    assert(r.getAs[Long]("pos") === pos.size.toLong)
    assert(r.getAs[Long]("neg") === neg.size.toLong)
    assert(r.getAs[Long]("num2") === num2)
    assert(r.getAs[Long]("auc_x1e6") === auc)
  }
}
