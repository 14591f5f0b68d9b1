package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The production (corpus-scaled) near-dup entry point: candidate recall
  * against brute force on a small synthetic corpus with planted near-dups.
  */
class NeardupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("corpus-scaled banding finds planted near-dups, never all-pairs") {
    val s = spark
    import s.implicits._
    val dims = 64
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(dims)(rnd.nextGaussian().toFloat)
    // 200 random vectors + 20 planted near-dups (tiny perturbation of an
    // existing vector → identical sign pattern with high probability)
    val base = (0L until 200L).map(i => (i, vec()))
    val dups = (0L until 20L).map { i =>
      val src = base(i.toInt * 7 % 200)._2
      (200L + i, src.map(x => x + (if (math.abs(x) > 0.05) 0.0f else 1e-4f)))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val got = VectorOps.neardupPairs(df, dims)
      .filter(col("cos_x1000") >= 990).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair must surface as a candidate with cos ≈ 1
    val planted = (0L until 20L).map(i => (i * 7 % 200, 200L + i)).toSet
    assert(planted.subsetOf(got), s"missing: ${planted -- got}")
    // and the candidate set must be far below all-pairs (the scale point)
    val all = VectorOps.neardupPairs(df, dims).count()
    assert(all < 220L * 219L / 2 / 4, s"candidate set too dense: $all")
  }

  test("threshold-derived MinHash banding finds planted duplicate docs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lumen", "metric", "nova", "orbit")
    def doc(): String =
      Seq.fill(60)(words(rnd.nextInt(words.length))).mkString(" ")
    val base = (0L until 100L).map(i => (i, doc()))
    // planted near-dups: same doc with one word changed (Jaccard >> 0.8)
    val dups = (0L until 10L).map { i =>
      val src = base(i.toInt * 9 % 100)._2
      (100L + i, src.replaceFirst("\\w+", "changed"))
    }
    val df = (base ++ dups).toDF("doc_id", "text")
    val got = TextOps.minhashCandidates(df, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 10L).map(i => (i * 9 % 100, 100L + i)).toSet
    assert(planted.subsetOf(got), s"missing: ${planted -- got}")
    assert(got.size < 110 * 109 / 2 / 4, s"candidate set too dense: ${got.size}")
  }

  test("production dedupClusters: planted dup groups collapse to one keeper each") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    // wide vocabulary: random docs share almost no bigrams (J ≈ 0.01), so
    // the 0.6-threshold banding cannot produce false-positive merges that
    // would chain unrelated docs into one cluster
    val words = Vector.tabulate(240)(i => s"w$i")
    def doc(): String =
      Seq.fill(60)(words(rnd.nextInt(words.length))).mkString(" ")
    val base = (0L until 80L).map(i => (i, doc()))
    // 5 planted groups of 4: one base doc + an EXACT copy + two near copies
    // — the exact edge and the minhash edge must land in ONE cluster
    // variants are single-word edits (Jaccard ≈ 0.95) and the threshold sits
    // well below them (0.6 → 8 OR-ed bands): this test pins the CLUSTER
    // CLOSURE semantics; recall at marginal similarity is NeardupSpec's
    // other tests' job
    val groups = (0L until 5L).map { g =>
      val src = base((g * 11 % 80).toInt)._2
      Seq((100 + g * 10, src),
        (101 + g * 10, src.replaceFirst("\\w+", "changedone")),
        (102 + g * 10, src.replaceFirst("(\\w+ )\\w+", "$1zzboundary")))
    }
    val df = (base ++ groups.flatten).toDF("doc_id", "text")
    val out = ClusterOps.dedupClusters(df, threshold = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byCluster = out.groupBy(_._2)
    // each planted group (base + 3 variants) forms one cluster whose
    // keeper is the base doc (smallest id in the component)
    (0L until 5L).foreach { g =>
      val baseId = g * 11 % 80
      val members = Seq(baseId, 100 + g * 10, 101 + g * 10, 102 + g * 10)
      val cluster = out.find(_._1 == baseId)
        .getOrElse(fail(s"base doc $baseId not clustered"))._2
      assert(cluster === baseId, "keeper must be the smallest member")
      val got = byCluster(cluster).map(_._1).toSet
      assert(members.toSet.subsetOf(got), s"group $g: $got")
      assert(byCluster(cluster).count(_._4) === 1, "exactly one keeper")
    }
  }

  /** Measured recall of 4×16-bit simhash banding at hamming 4–6, where
    * the pigeonhole bound (ham ≤ 3 ⇒ found) gives NO guarantee. Planted
    * pairs with exactly d random flipped bits; analytic expectation for
    * plain banding is P(some band untouched) ≈ 0.897 / 0.742 / 0.583 for
    * d = 4/5/6. The multi-probe knob (bandedPairsProbed) must find ALL of
    * them: ham ≤ 7 ⇒ some band differs by ≤ 1 bit ⇒ a single-bit probe
    * matches.
    */
  test("simhash banding recall at hamming 4-6: measured plain, guaranteed multi-probe") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val perD = 120
    // base signatures far apart (random 64-bit), plus planted flips
    val base = (0 until 3 * perD).map(i => (i.toLong, rnd.nextLong()))
    val planted = (0 until 3 * perD).map { i =>
      val d = 4 + i / perD
      val flips = rnd.shuffle((0 until 64).toList).take(d)
      val sig = flips.foldLeft(base(i)._2)((v, b) => v ^ (1L << b))
      (10000L + i, sig)
    }
    def melt(rows: Seq[(Long, Long)]) = rows.flatMap { case (id, sig) =>
      (0 until 4).map(b => (id, b, (sig >>> (16 * b)) & 0xFFFFL))
    }.toDF("id", "band_idx", "k")
    val melted = melt(base ++ planted)
    def recallOf(pairs: org.apache.spark.sql.DataFrame): Array[Double] = {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (0 until 3).map { g =>
        val want = (g * perD until (g + 1) * perD)
          .map(i => (i.toLong, 10000L + i)).toSet
        want.count(got.contains).toDouble / want.size
      }.toArray
    }
    val plain = recallOf(LshParams.bandedPairs(melted))
    val probed = recallOf(LshParams.bandedPairsProbed(melted, bandBits = 16))
    info(f"plain banding recall  ham4=${plain(0)}%.3f ham5=${plain(1)}%.3f ham6=${plain(2)}%.3f")
    info(f"multi-probe recall    ham4=${probed(0)}%.3f ham5=${probed(1)}%.3f ham6=${probed(2)}%.3f")
    // plain: within sampling noise of the analytic 0.897 / 0.742 / 0.583
    assert(plain(0) > 0.80 && plain(0) < 0.97, s"ham4 plain ${plain(0)}")
    assert(plain(1) > 0.62 && plain(1) < 0.86, s"ham5 plain ${plain(1)}")
    assert(plain(2) > 0.46 && plain(2) < 0.72, s"ham6 plain ${plain(2)}")
    // multi-probe: pigeonhole guarantee to ham 7 — exact, not statistical
    assert(probed.forall(_ == 1.0), s"multi-probe must be lossless to ham 7: ${probed.toSeq}")
  }

  test("chunked winnowing == unchunked fingerprints (giant-doc skew split is exact)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(19)
    val alpha = "ab d" // tiny alphabet with whitespace → repeated grams,
                       // window-min ties, and normalization collapses
    def txt(n: Int): String = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    // lengths straddle every edge: < 11 (no complete window), exactly 11,
    // one-chunk, exact multiples of step, and many-chunk giants
    val docs = (Seq(5, 10, 11, 12, 21, 22, 23, 53, 54, 200, 1001) ++
      Seq.fill(20)(30 + rnd.nextInt(400))).zipWithIndex
      .map { case (n, i) => (i.toLong, txt(n)) }
    val df = docs.toDF("doc_id", "text")
    def fps(chunk: Int): Set[(Long, Long)] =
      TextOps.winnowFingerprints(df, chunk).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unchunked = fps(1 << 20) // one chunk holds every doc
    for (chunk <- Seq(11, 12, 16, 32, 64, 4096)) {
      assert(fps(chunk) == unchunked, s"chunkChars=$chunk diverged")
    }
    assert(unchunked.nonEmpty)
  }

  test("prefix-filtered exact Jaccard join == naive all-pairs, 4 thresholds") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lumen", "metric", "nova", "orbit",
      "prism", "quark", "ridge", "sable", "tidal", "umber")
    def doc(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    val base = (0L until 120L).map(i => (i, doc(30 + rnd.nextInt(40))))
    // planted near-dups: one word mutated → Jaccard well above 0.7
    val dups = (0L until 15L).map { i =>
      val toks = base((i * 11 % 120).toInt)._2.split(" ").toVector
      (500L + i, toks.updated(rnd.nextInt(toks.length), s"mut$i").mkString(" "))
    }
    // degenerate shapes: empty text, single token (no bigram), and an
    // exact-dup pair whose shingle set has size 1 (prefix length 1 path)
    val edge = Seq((900L, ""), (901L, "single"),
      (902L, "two words"), (903L, "two words"))
    val corpus = base ++ dups ++ edge
    val df = corpus.toDF("doc_id", "text")
    def shingles(t: String): Set[String] = {
      val tk = t.trim.toLowerCase.split("[ \\t\\n\\f\\r\\x0B]+")
      if (tk.length < 2) Set.empty else tk.sliding(2).map(_.mkString(" ")).toSet
    }
    val sets = corpus.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = sets.keys.toVector
    for (thr <- Seq(300, 500, 700, 900)) {
      val expected = (for {
        a <- ids; b <- ids if a < b
        inter = (sets(a) & sets(b)).size if inter > 0
        j = math.round(1000.0 * inter /
          (sets(a).size + sets(b).size - inter)) if j >= thr
      } yield (a, b, inter.toLong, j)).toSet
      val got = TextOps.prefixJaccardPairs(df, thr).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected,
        s"thr=$thr missing=${expected -- got} extra=${got -- expected}")
      if (thr <= 700)
        assert((0L until 15L).forall(i =>
          got.exists(p => p._2 == 500L + i)), "planted dup lost")
    }
  }

  // ---- sequential JVM twin of the signature/decision pipeline ----
  // (MessageDigest md5, first 15 hex chars as a Long, min over distinct
  // word-bigram shingles — shares nothing with the Spark implementation)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def seqSig(text: String): Seq[Option[Long]] = {
    val tk = text.trim.toLowerCase.split("[ \\t\\n\\f\\r\\x0B]+")
      .filter(_.nonEmpty)
    val sh =
      if (tk.length < 2) Set.empty[String]
      else tk.sliding(2).map(_.mkString(" ")).toSet
    (0 until 8).map { seed =>
      if (sh.isEmpty) None
      else Some(sh.map(g =>
        java.lang.Long.parseLong(md5hex(s"$seed|$g").take(15), 16)).min)
    }
  }

  /** Sequential reference of the full q243 decision rule. */
  private def refDecisions(frozen: Seq[(Long, String)],
                           batch: Seq[(Long, String)],
                           thr: Long): Map[Long, (String, Long, Long)] = {
    def bandsOf(sig: Seq[Option[Long]]): Seq[(Int, String)] =
      if (sig.head.isEmpty) Nil
      else Seq(
        0 -> md5hex(sig.slice(0, 4).map(_.get).mkString("|")),
        1 -> md5hex(sig.slice(4, 8).map(_.get).mkString("|")))
    val fz = frozen.map { case (id, t) => (id, md5hex(t), seqSig(t)) }
    val keeperByFp = fz.groupBy(_._2).map { case (fp, xs) =>
      fp -> xs.map(_._1).min
    }
    val fzByBand = fz.flatMap { case (id, _, sig) =>
      bandsOf(sig).map(b => b -> ((id, sig)))
    }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2) }
    batch.map { case (id, t) =>
      val fp = md5hex(t)
      val sig = seqSig(t)
      keeperByFp.get(fp) match {
        case Some(k) => id -> (("exact_dup", k, 1000L))
        case None =>
          val cands = bandsOf(sig).flatMap(b =>
            fzByBand.getOrElse(b, Nil)).distinct
          val qual = cands.map { case (fid, fsig) =>
            val agree = (0 until 8).count(i =>
              sig(i).isDefined && sig(i) == fsig(i))
            (fid, agree.toLong * 125L)
          }.filter(_._2 >= thr)
          if (qual.isEmpty) id -> (("kept", -1L, 0L))
          else id -> (("near_dup", qual.map(_._1).min, qual.map(_._2).max))
      }
    }.toMap
  }

  test("incremental dedup decisions == sequential reference on randomized corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4243)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "web", "scale",
      "index", "release", "token", "corpus", "crawl", "dedup", "the",
      "of", "and", "x", "y", "z", "ничего", "больше")
    def randDoc(): String =
      Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (1 to 3).foreach { round =>
      val frozen = (0L until 40L).map(i => i -> randDoc())
      val batch = (100L until 125L).map { i =>
        val r = rnd.nextInt(4)
        val t =
          if (r == 0) frozen(rnd.nextInt(40))._2              // exact copy
          else if (r == 1) {                                  // perturbed
            val src = frozen(rnd.nextInt(40))._2
            if (src.isEmpty) randDoc() else src + " " + vocab(rnd.nextInt(vocab.size))
          } else randDoc()                                    // fresh
        i -> t
      }
      val got = TextOps.incrementalDedupAgainst(
          TextOps.signatureIndex(frozen.toDF("doc_id", "text")),
          batch.toDF("doc_id", "text"), 500L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3)))).toMap
      val want = refDecisions(frozen, batch, 500L)
      assert(got === want, s"round $round diverged: " +
        (got.toSet diff want.toSet).take(3).toString)
    }
  }

  test("HOF signature index equals a sequential JVM MinHash reference") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "",                       // no tokens
      4L -> "single",                 // one token → no shingles
      5L -> "два слова ещё раз два слова",  // unicode, repeated shingles
      6L -> "a b a b a b c",          // heavy shingle repeats
      7L -> ("w" + "x " * 300 + "tail")) // longer doc
    val docs = corpus.toDF("doc_id", "text")
    val got = TextOps.signatureIndex(docs).collect()
      .map(r => r.getLong(0) -> (0 until 8).map(i =>
        if (r.isNullAt(2 + i)) None else Some(r.getLong(2 + i)))).toMap
    corpus.foreach { case (id, txt) =>
      assert(got(id) === seqSig(txt), s"doc $id signature diverged")
    }
  }

  test("incremental cross-corpus dedup: planted exact/near/novel batch docs " +
       "decided correctly against the frozen signature index") {
    val s = spark
    import s.implicits._
    val longA = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu one two three four"
    val longB = "the curation stack replays every increment against the " +
      "frozen release index because re shingling released petabytes is " +
      "not an option at web scale ever"
    val frozen = Seq(
      10L -> longA,
      11L -> longB,
      12L -> "solo", // <2 tokens: exact-only index row (null minhashes)
      13L -> "exact twin content for the incremental dedup spec"
    ).toDF("doc_id", "text")
    val batch = Seq(
      100L -> "exact twin content for the incremental dedup spec", // = f13
      101L -> (longA + " appended"),  // near variant of f10
      102L -> ("completely different words about gardening tulips and " +
        "watering cans in spring"),   // novel
      103L -> "solo",                 // exact twin of the shingle-less f12
      104L -> "unique"                // novel AND shingle-less
    ).toDF("doc_id", "text")
    val got = TextOps.incrementalDedupAgainst(
        TextOps.signatureIndex(frozen), batch, 500L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size === 5)
    // exact beats near: b100's bands also match f13's, but md5 wins
    assert(got(100L) === (("exact_dup", 13L, 1000L)))
    val (d101, m101, ag101) = got(101L)
    assert(d101 === "near_dup" && m101 === 10L,
      s"appended-word variant must near-match its source, got ${got(101L)}")
    assert(ag101 >= 500L && ag101 <= 1000L && ag101 % 125 == 0)
    assert(got(102L) === (("kept", -1L, 0L)))
    // the exact path needs no shingles on either side…
    assert(got(103L) === (("exact_dup", 12L, 1000L)))
    // …and a shingle-less novel doc is kept, not crashed on null minhashes
    assert(got(104L) === (("kept", -1L, 0L)))
  }
}
