package graft.queries

import org.apache.spark.sql.SparkSession
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
}
