package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** connectedComponents is validated against a driver-side union-find on
  * random graphs (the brute-force ground truth), plus shape cases the
  * random generator is unlikely to hit: long chains (worst case for
  * label propagation, the algorithm large-star/small-star replaces),
  * stars, and already-converged inputs.
  *
  * (ScalaCheck driven directly — the scalatestplus bridge is not in the
  * offline resolver cache.)
  */
class ClusterOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Ground truth: path-compressing union-find. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.groupBy(find).valuesIterator.flatMap { ns =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  private def ccSpark(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ClusterOps.connectedComponents(
        spark.createDataFrame(edges).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches union-find on random graphs (property)") {
    val genEdges = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es
    val prop = Prop.forAll(genEdges) { es =>
      val nonLoop = es.filter(e => e._1 != e._2)
      nonLoop.isEmpty || ccSpark(nonLoop) == unionFind(nonLoop)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"cc==unionFind: ${res.status}")
  }

  test("long chain collapses to one component (worst case for label-prop)") {
    val chain = (0L until 60L).map(i => (i, i + 1))
    val got = ccSpark(chain)
    assert(got.size == 61 && got.values.forall(_ == 0L))
  }

  test("star graphs and disjoint cliques are stable and separate") {
    val star = (1L to 10L).map(i => (0L, i))
    val clique = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val got = ccSpark(star ++ clique)
    assert(got.filter(_._1 < 100).values.toSet == Set(0L))
    assert(got.filter(_._1 >= 100).values.toSet == Set(100L))
  }

  test("empty edge set and dup-free corpora yield empty results, not errors") {
    assert(ccSpark(Seq.empty[(Long, Long)]).isEmpty)
    val s = spark
    import s.implicits._
    // every text unique and dissimilar: no exact edges, no surviving
    // candidates → the production entry returns an empty keeper table
    val docs = (0L until 30L)
      .map(i => (i, (0 until 40).map(j => s"u${i}w$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(ClusterOps.dedupClusters(docs, threshold = 0.8).count() === 0L)
  }

  /** Ground truth for triangles: brute-force a<b<c enumeration over the
    * adjacency set — the independent shape (no degree ordering at all).
    */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.flatMap(e => Seq(e, e.swap)).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tris = for {
      a <- nodes; b <- nodes if b > a && und((a, b))
      c <- nodes if c > b && und((a, c)) && und((b, c))
    } yield (a, b, c)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  private def triSpark(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ClusterOps.triangleCounts(
        spark.createDataFrame(
            edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
              .distinct.filter(e => e._1 != e._2))
          .toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("degree-ordered triangle counts match brute enumeration (property)") {
    val genEdges = for {
      n <- Gen.choose(3, 25)
      m <- Gen.choose(1, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es.filter(e => e._1 != e._2)
    val prop = Prop.forAll(genEdges) { es =>
      es.isEmpty || triSpark(es) == bruteTriangles(es)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(120L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"tri==brute: ${res.status}")
  }

  test("triangle shapes: clique K5, triangle-free star, shared-edge bowtie") {
    // K5: every node sits in C(4,2) = 6 triangles
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(triSpark(k5) == (0L to 4L).map(_ -> 6L).toMap)
    // a star has no triangles at all → empty result, not zero rows per node
    val star = (1L to 8L).map(i => (0L, i))
    assert(triSpark(star).isEmpty)
    // bowtie: two triangles sharing node 0
    val bowtie = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (0L, 4L), (3L, 4L))
    assert(triSpark(bowtie) ==
      Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("q120/q121 are non-degenerate on sf0.001") {
    val tri = ClusterOps.q120TriangleCount(spark, "/root/testdata/sf0.001")
      .agg(sum(col("tri_cnt"))).head().getLong(0)
    // Σ per-node counts ≡ 0 (mod 3): every triangle touches exactly 3 nodes
    assert(tri > 0 && tri % 3 == 0)
    val co = ClusterOps.q121Cocitation(spark, "/root/testdata/sf0.001").collect()
    assert(co.nonEmpty && co.forall(r => r.getLong(0) < r.getLong(1) && r.getLong(2) >= 3))
  }

  /** Ground truth for coreness: the textbook sequential peeling — repeatedly
    * delete a minimum-degree node; its coreness is the running maximum of
    * the degrees seen at deletion time.
    */
  private def peelCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
      }
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 0L
    while (adj.nonEmpty) {
      val (v, ns) = adj.minBy { case (v, ns) => (ns.size, v) }
      k = math.max(k, ns.size.toLong)
      core(v) = k
      ns.foreach(u => adj.get(u).foreach(_ -= v))
      adj -= v
    }
    core.toMap
  }

  private def coreSpark(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ClusterOps.coreness(
        spark.createDataFrame(edges).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("h-index coreness == sequential peeling (property)") {
    val genEdges = for {
      n <- Gen.choose(3, 22)
      m <- Gen.choose(1, 70)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es.filter(e => e._1 != e._2)
    val prop = Prop.forAll(genEdges) { es =>
      es.isEmpty || coreSpark(es) == peelCoreness(es)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(129L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"core==peel: ${res.status}")
  }

  test("coreness shapes: clique K5 all 4, chain all 1, clique+tail mixed") {
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(coreSpark(k5).values.toSet == Set(4L))
    val chain = (0L until 10L).map(i => (i, i + 1))
    assert(coreSpark(chain).values.toSet == Set(1L))
    // K4 on {0..3} with a pendant path 3-10-11: clique nodes core 3, tail 1
    val mixed = (for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)) ++
      Seq((3L, 10L), (10L, 11L))
    val got = coreSpark(mixed)
    assert((0L to 3L).forall(got(_) == 3L) && got(10L) == 1L && got(11L) == 1L)
  }

  test("q49 output is internally consistent on sf0.001") {
    val df = ClusterOps.q49DedupClusters(spark, "/root/testdata/sf0.001").cache()
    try {
      val rows = df.collect()
      assert(rows.nonEmpty)
      // cluster_id is the min doc_id of its cluster; sizes agree; exactly
      // one keeper per cluster and it is the cluster_id row
      val byCluster = rows.groupBy(_.getLong(1))
      byCluster.foreach { case (cid, rs) =>
        assert(rs.map(_.getLong(0)).min == cid)
        assert(rs.forall(_.getLong(2) == rs.length))
        assert(rs.count(_.getBoolean(3)) == 1)
        assert(rs.find(_.getBoolean(3)).get.getLong(0) == cid)
      }
      // every cluster has ≥ 2 members (edges only — no singletons)
      assert(byCluster.values.forall(_.length >= 2))
    } finally df.unpersist()
  }

  test("q134: split is leak-free (one split per cluster) and covers q49") {
    val dir = "/root/testdata/sf0.001"
    val split = ClusterOps.q134ClusterSplit(spark, dir).collect()
    val q49 = ClusterOps.q49DedupClusters(spark, dir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // covers the whole corpus, reps agree with q49 (singletons = own id)
    assert(split.length == spark.read.parquet(s"$dir/documents.parquet").count())
    split.foreach { r =>
      val (doc, rep, clustered) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(q49.get(doc) match {
        case Some(cid) => clustered && rep == cid
        case None      => !clustered && rep == doc
      }, s"rep mismatch for doc $doc")
    }
    // THE leak-safety property: every cluster lands in exactly one split
    split.groupBy(_.getLong(1)).foreach { case (rep, rs) =>
      assert(rs.map(_.getString(4)).distinct.length == 1,
        s"cluster $rep straddles splits")
    }
    // the split is non-degenerate (all three splits populated at sf0.001)
    assert(split.map(_.getString(4)).distinct.sorted.toSeq ==
      Seq("test", "train", "val"))
  }

  /** Sequential synchronous LPA reference: all updates read the previous
    * round's labels; argmax ties break to the smallest label.
    */
  private def lpaRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      val prev = lab
      lab = adj.map { case (u, ns) =>
        val cnt = ns.groupBy(prev).map { case (l, xs) => (l, xs.size) }
        val mx = cnt.values.max
        u -> cnt.collect { case (l, c) if c == mx => l }.min
      }
    }
    lab
  }

  private def norm(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct

  private def lpaSpark(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    ClusterOps.labelPropagation(
        spark.createDataFrame(edges).toDF("a", "b"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation == sequential synchronous reference (property)") {
    val genEdges = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 50)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
      r <- Gen.choose(1, 5)
    } yield (es, r)
    val prop = Prop.forAll(genEdges) { case (es, r) =>
      val e = norm(es)
      e.isEmpty || lpaSpark(e, r) == lpaRef(e, r)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(170L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"lpa==ref: ${res.status}")
  }

  test("labelPropagation: bridged cliques resolve to their own communities") {
    val c1 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c2 = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val got = lpaSpark(c1 ++ c2 :+ (4L, 10L), rounds = 4)
    // each clique is internally uniform, and the two differ
    val l1 = got.filter(_._1 <= 4).values.toSet
    val l2 = got.filter(_._1 >= 10).values.toSet
    assert(l1.size == 1 && l2.size == 1 && l1 != l2,
      s"cliques not separated: $got")
  }

  /** Brute-force Adamic–Adar with the same integer bitlen surrogate. */
  private def aaRef(edges: Seq[(Long, Long)], cap: Int,
      minCommon: Int): Map[(Long, Long), (Long, Long)] = {
    val es = norm(edges)
    val adj = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val acc = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    for {
      (z, ns) <- adj if ns.size <= cap
      w = 1000000L / (64 - java.lang.Long.numberOfLeadingZeros(ns.size.toLong))
      s = ns.toSeq.sorted
      i <- s.indices; j <- (i + 1) until s.length
    } {
      val (c, sm) = acc.getOrElse((s(i), s(j)), (0L, 0L))
      acc((s(i), s(j))) = (c + 1, sm + w)
    }
    val eset = es.toSet
    acc.filter { case (k, (c, _)) => c >= minCommon && !eset(k) }.toMap
  }

  private def aaSpark(edges: Seq[(Long, Long)], cap: Int,
      minCommon: Int): Map[(Long, Long), (Long, Long)] =
    ClusterOps.adamicAdar(
        spark.createDataFrame(edges).toDF("a", "b"), cap, minCommon)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("adamicAdar == brute force (property, incl. the degree cap)") {
    val genEdges = for {
      n <- Gen.choose(3, 25)
      m <- Gen.choose(2, 50)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
      cap <- Gen.oneOf(2, 4, 1000)
    } yield (es, cap)
    val prop = Prop.forAll(genEdges) { case (es, cap) =>
      val e = norm(es)
      e.isEmpty || aaSpark(e, cap, 1) == aaRef(e, cap, 1)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(171L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"aa==ref: ${res.status}")
  }

  test("adamicAdar: capped hub contributes no wedges; shared rare neighbor outscores shared hub") {
    // hub 0 adjacent to 1..12 (degree 12 > cap 10) — its wedges drop;
    // rare z=20 shared by (1,2) scores via deg(20)=2 → 1000000/2 bits
    val hub = (1L to 12L).map(i => (0L, i))
    val rare = Seq((1L, 20L), (2L, 20L))
    val got = aaSpark(hub ++ rare, cap = 10, minCommon = 1)
    // pair (1,2) scores ONLY via z=20 (hub dropped): one wedge, 500000;
    // (0,20) scores via pivots 1 and 2 (deg 2 each): two wedges, 1000000.
    // No wedge from the hub itself — C(12,2)=66 hub pairs all absent.
    assert(got == Map((1L, 2L) -> (1L, 500000L), (0L, 20L) -> (2L, 1000000L)),
      s"unexpected AA table: $got")
  }

  test("harmonicCentrality: hand graph + BFS-rounds invariance past diameter") {
    val s = spark; import s.implicits._
    // 0 -> 1 -> 2 -> 3 plus shortcut 0 -> 3; seeds (mod 17) = {0}
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("src", "dst")
    val got = ClusterOps.harmonicCentrality(e, seedMod = 17, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // d(0,1)=1, d(0,2)=2, d(0,3)=1 (shortcut beats the 3-hop path)
    assert(got === Set((0L, 0L, 0L), (1L, 1L, 1000000L),
      (2L, 1L, 500000L), (3L, 1L, 1000000L)))
    // rounds past the diameter change nothing (converged BFS)
    val r3 = ClusterOps.harmonicCentrality(e, 17, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r3 === got)
  }

  test("bowtie: hand graph classifies SCC / IN / OUT / OTHER exactly") {
    val s = spark; import s.implicits._
    // 0 -> 1 <-> 2 -> 3 ; 0 -> 4 ; 5 -> 6
    // seed = min(src ∩ dst) = 1; F(1)={1,2,3}, B(1)={0,1,2}
    // scc {1,2}, in {0}, out {3}, other {4,5,6} of 7 nodes
    val e = Seq((0L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (0L, 4L), (5L, 6L))
      .toDF("src", "dst")
    val got = ClusterOps.bowtie(e).collect()
      .map(r => (r.getAs[String]("component"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_total"), r.getAs[Long]("share_bp"))).toSet
    assert(got === Set(
      ("scc", 2L, 7L, 2857L), ("in", 1L, 7L, 1428L),
      ("out", 1L, 7L, 1428L), ("other", 3L, 7L, 4285L)))
  }

  test("eigenKatz: matches a sequential double-precision reference") {
    val s = spark; import s.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L))
    def round9(x: Double): Double = math.round(x * 1e9) / 1e9
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var eig = nodes.map(_ -> 1.0).toMap
    var kat = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val raw = nodes.map(v => v -> round9(
        edges.filter(_._2 == v).map(e => eig(e._1)).sum)).toMap
      val s1 = raw.values.sum
      eig = raw.map { case (v, x) => v -> round9(x / s1) }
      kat = nodes.map(v => v -> round9(
        1.0 + 0.1 * edges.filter(_._2 == v).map(e => kat(e._1)).sum)).toMap
    }
    val want = nodes.map(v => (v, math.round(eig(v) * 1e9),
      math.round(kat(v) * 1e9))).toSet
    val got = ClusterOps.eigenKatz(edges.toDF("src", "dst")).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("eig_x1e9"),
        r.getAs[Long]("katz_x1e9"))).toSet
    assert(got === want)
  }
}
