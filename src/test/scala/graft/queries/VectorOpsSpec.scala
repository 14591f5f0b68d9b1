package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** IVF/k-means unit coverage beyond q52's all-lists flag: quantizer
  * determinism across runs (the property the grid-snap buys), and the
  * measured recall of the lossy nprobe<k production search against
  * brute force.
  */
class VectorOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("k-means centroids are identical across independent runs") {
    def runOnce(): Map[Int, Seq[Double]] =
      VectorOps.kmeansCentroids(vecs, k = 8, iters = 4).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val a = runOnce()
    val b = runOnce()
    assert(a.keySet == b.keySet && a.keySet.size == 8)
    a.keys.foreach(k => assert(a(k) == b(k), s"centroid $k differs"))
  }

  test("q52 flag: all-lists IVF reproduces brute-force top-10 exactly") {
    val df = VectorOps.q52AnnIvf(spark, sfDir)
    assert(df.filter(!col("ivf_ok")).count() === 0L)
    assert(df.count() === 10L)
  }

  test("non-dense vec_ids: cids stay 0..k-1 and no centroid is lost") {
    // raw seed vec_ids used as cids would break the dist*1024+cid packing
    // on any table whose ids don't start at 0 (review finding)
    val shifted = vecs.select((col("vec_id") + 5000).as("vec_id"), col("e"))
    val cents = VectorOps.kmeansCentroids(shifted, k = 8, iters = 2)
    val cids = cents.select("cid").collect().map(_.getInt(0)).sorted
    assert(cids.toSeq == (0 until 8), s"got ${cids.toSeq}")
    val assignedCids = VectorOps.assign(shifted, cents)
      .select("cid").distinct().collect().map(_.getInt(0)).toSet
    assert(assignedCids.subsetOf((0 until 8).toSet))
  }

  test("a centroid with an empty cluster keeps its position, not dropped") {
    // two far clusters + 3 seeds; at least one seed ends up owning no
    // vectors after an iteration on this degenerate input — k must hold
    val s = spark
    import s.implicits._
    val pts = ((0 until 10).map(i => (i.toLong, Seq(0.0, 0.0 + i * 1e-6))) ++
      (10 until 20).map(i => (i.toLong, Seq(100.0, 100.0 + i * 1e-6))))
      .toDF("vec_id", "e")
    val cents = VectorOps.kmeansCentroids(pts, k = 3, iters = 3)
    assert(cents.count() === 3L)
  }

  test("assign is a pure narrow projection: no shuffle, no sort, no join") {
    val cents = VectorOps.kmeansCentroids(vecs, k = 8, iters = 1)
    val plan = VectorOps.assign(vecs, cents)
      .queryExecution.executedPlan.toString
    Seq("Exchange", "SortAggregate", "Join", "Sort ").foreach(op =>
      assert(!plan.contains(op), s"unexpected $op in:\n${plan.take(1200)}"))
  }

  test("nprobe=2 of 8 IVF search: measured recall@10 vs brute force") {
    val cents = VectorOps.kmeansCentroids(vecs, k = 8, iters = 4)
    val assigned = VectorOps.assign(vecs, cents)
    val queryIds = Seq(0L, 7L, 23L, 41L)
    val recalls = queryIds.map { qid =>
      val ivf = VectorOps.ivfSearch(assigned, cents, qid, nprobe = 2, topK = 10)
        .collect().map(_.getLong(0)).toSet
      val brute = assigned.crossJoin(
          broadcast(assigned.filter(col("vec_id") === qid).select(col("e").as("q"))))
        .select(col("vec_id"),
          (aggregate(zip_with(col("e"), col("q"), (x, y) => x * y),
            lit(0.0), (a, x) => a + x) /
            (sqrt(aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
              lit(0.0), (a, x) => a + x)) *
             sqrt(aggregate(zip_with(col("q"), col("q"), (x, y) => x * y),
               lit(0.0), (a, x) => a + x)))).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10).collect().map(_.getLong(0)).toSet
      ivf.intersect(brute).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF nprobe=2/8 recall@10 per query: ${recalls.map(r => f"$r%.2f").mkString(" ")} (mean $mean%.2f)")
    // probing 2 of 8 lists must beat the 25%-of-corpus floor by a wide
    // margin on every query — the lists concentrate neighbors
    assert(recalls.forall(_ >= 0.5), recalls.toString)
  }

  test("q141 flag: every ADC sum matches the centroid-lookup twin path") {
    val df = VectorOps.q141PqAnn(spark, sfDir)
    assert(df.count() === 10L)
    assert(df.filter(!col("pq_ok")).count() === 0L)
  }

  test("pqEncode is a pure narrow projection: no shuffle, no sort, no join") {
    val cbs = VectorOps.pqCodebooks(vecs, m = 4, k = 8, iters = 1)
    val plan = VectorOps.pqEncode(vecs, cbs)
      .queryExecution.executedPlan.toString
    Seq("Exchange", "SortAggregate", "Join", "Sort ").foreach(op =>
      assert(!plan.contains(op), s"unexpected $op in:\n${plan.take(1200)}"))
  }

  test("PQ codes are identical across independent trainings (determinism)") {
    def runOnce(): Map[Long, Seq[Int]] = {
      val cbs = VectorOps.pqCodebooks(vecs, m = 4, k = 8, iters = 3)
      VectorOps.pqEncode(vecs, cbs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    }
    val a = runOnce()
    val b = runOnce()
    assert(a.size == b.size && a.forall { case (k, v) => b(k) == v })
  }

  test("PQ ADC shortlist + exact re-rank: measured recall@10 vs brute force") {
    val cbs = VectorOps.pqCodebooks(vecs, m = 8, k = 8, iters = 3)
    val coded = VectorOps.pqEncode(vecs, cbs).localCheckpoint()
    val queryIds = Seq(0L, 7L, 23L, 41L)
    val byDepth = queryIds.map { qid =>
      val q = vecs.filter(col("vec_id") === qid).select(col("e"))
        .head().getSeq[Double](0)
      val brute = vecs
        .select(col("vec_id"),
          aggregate(zip_with(col("e"), typedLit(q), (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x).as("d"))
        .orderBy(col("d"), col("vec_id"))
        .limit(10).collect().map(_.getLong(0)).toSet
      Seq(50, 100).map { s =>
        val got = VectorOps.pqSearch(coded, cbs, q, shortlist = s, topK = 10)
          .collect().map(_.getLong(0)).toSet
        got.intersect(brute).size.toDouble / brute.size
      }
    }
    val Seq(r50, r100) = Seq(0, 1).map(i => byDepth.map(_(i)))
    info(f"PQ m=8 k=8 re-ranked recall@10 — shortlist 50/500: " +
      f"${r50.map(r => f"$r%.2f").mkString(" ")}; 100/500: " +
      f"${r100.map(r => f"$r%.2f").mkString(" ")}")
    // the §III.C two-stage contract: a deeper ADC shortlist is never worse,
    // and a 20%-of-corpus shortlist recovers most true neighbors exactly
    byDepth.foreach(d => assert(d(1) >= d(0), byDepth.toString))
    assert(r50.forall(_ >= 0.5), byDepth.toString)
    assert(r100.forall(_ >= 0.7) &&
      r100.sum / r100.size >= 0.8, byDepth.toString)
  }

  test("IVF recall curve holds at a 10x corpus (3000 synthesized vectors, k=16)") {
    // round-3 verdict #10: the recall measurement existed at one n only.
    // Second scale: a deterministic 16-component Gaussian-mixture corpus,
    // ~10x the sf0.001 embeddings table, k=16 lists, nprobe 2/4/8 curve +
    // the all-lists==brute exactness invariant.
    val s = spark
    import s.implicits._
    val dims = 16
    val centers = (0 until 16).map { c =>
      val r = new scala.util.Random(1000 + c)
      Array.fill(dims)(r.nextGaussian() * 2.0)
    }
    val data = (0L until 3000L).map { id =>
      val r = new scala.util.Random(id)
      val c = (id % 16).toInt
      // noise comparable to the center spread: clusters OVERLAP, so true
      // neighbors spill across lists and the nprobe curve is informative
      (id, centers(c).map(x => x * 0.4 + r.nextGaussian() * 1.2).toSeq)
    }
    val vecs10 = data.toDF("vec_id", "e").localCheckpoint()
    val cents = VectorOps.kmeansCentroids(vecs10, k = 16, iters = 3)
    val assigned = VectorOps.assign(vecs10, cents).localCheckpoint()
    val queryIds = Seq(1L, 500L, 1777L, 2903L)
    // brute force under the SAME ranking contract as ivfSearch (cos
    // rounded to x1000, ties on vec_id) — full-precision ordering would
    // disagree on x1000 ties, which is a ranking-grain choice, not a loss
    def brute(qid: Long): Set[Long] = assigned.crossJoin(
        broadcast(assigned.filter(col("vec_id") === qid).select(col("e").as("q"))))
      .select(col("vec_id"),
        round(lit(1000) *
          (aggregate(zip_with(col("e"), col("q"), (x, y) => x * y),
            lit(0.0), (a, x) => a + x) /
           (sqrt(aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
             lit(0.0), (a, x) => a + x)) *
            sqrt(aggregate(zip_with(col("q"), col("q"), (x, y) => x * y),
              lit(0.0), (a, x) => a + x))))).cast("long").as("cos_x1000"))
      .orderBy(col("cos_x1000").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val curve = queryIds.map { qid =>
      val b = brute(qid)
      val byProbe = Seq(2, 4, 8, 16).map { np =>
        val got = VectorOps.ivfSearch(assigned, cents, qid, nprobe = np, topK = 10)
          .collect().map(_.getLong(0)).toSet
        np -> got.intersect(b).size.toDouble / b.size
      }.toMap
      info(f"q$qid: recall@10 nprobe2=${byProbe(2)}%.2f nprobe4=${byProbe(4)}%.2f " +
        f"nprobe8=${byProbe(8)}%.2f all=${byProbe(16)}%.2f")
      byProbe
    }
    curve.foreach { r =>
      // candidate sets nest with nprobe, so recall is provably monotone
      assert(r(2) <= r(4) && r(4) <= r(8) && r(8) <= r(16),
        s"recall not monotone in nprobe: $r")
      assert(r(16) == 1.0, "all-lists probe must equal brute force exactly")
    }
    val mean8 = curve.map(_(8)).sum / curve.size
    assert(mean8 >= 0.7, s"nprobe=8/16 mean recall $mean8 below floor")
  }

  test("planted near-dup cluster straddling a centroid boundary: nprobe=2 recovers it") {
    // round-4 verdict #10 — the adversarial case for coarse quantizers: a
    // tight near-duplicate cluster sitting ON the boundary between two
    // k-means cells gets SPLIT across inverted lists, so probing only the
    // query's own list must lose the half that landed on the other side,
    // and probing the two nearest lists must recover all of it.
    val s = spark
    import s.implicits._
    val dims = 8
    def pt(base: Array[Double], seed: Long, noise: Double): Seq[Double] = {
      val r = new scala.util.Random(seed)
      base.map(_ + r.nextGaussian() * noise).toSeq
    }
    val a = Array(5.0, 0, 0, 0, 0, 0, 0, 0)
    val b = Array(-5.0, 0, 0, 0, 0, 0, 0, 0)
    val c = Array(0.0, 0, 8.0, 0, 0, 0, 0, 0)
    val mid = Array(0.0, 0.7, 0, 0, 0, 0, 0, 0) // on the a|b bisector
    val centers = Array(a, b, c)
    val data =
      (0L until 300L).map(i => (i, pt(centers((i % 3).toInt), i, 0.5))) ++
      // 12 planted near-dups (6 per side): tiny intra-cluster noise, but
      // x jittered across the boundary so the quantizer cannot keep them
      // together — and small enough that the cosine top-10 MUST reach
      // across the boundary (6 same-side points cannot fill it)
      (400L until 412L).map { i =>
        val x = if (i % 2 == 0) 0.04 else -0.04
        (i, pt(Array(x) ++ mid.drop(1), i, 0.005))
      }
    val vecs = data.toDF("vec_id", "e").localCheckpoint()
    // FIXED quantizer, not Lloyd's: training on this data converges to the
    // CAPTURE attractor (the nearest centroid drifts onto the planted
    // cluster and owns all of it — verified empirically), which is the
    // benign case. The adversarial case this test exists for is a
    // quantizer whose cell boundary bisects a near-dup cluster — exactly
    // what an offline-trained production quantizer does to clusters that
    // appear AFTER training. Centroids at the true cluster centers put
    // the a|b bisector at x=0, splitting the ±0.04 planted points 10/10.
    val cents = Seq((0, a.toSeq), (1, b.toSeq), (2, c.toSeq)).toDF("cid", "c")
    val assigned = VectorOps.assign(vecs, cents).localCheckpoint()
    // premise check: the planted cluster really is split across ≥2 lists
    // (otherwise this test pins nothing)
    val plantedLists = assigned.filter(col("vec_id") >= 400)
      .select("cid").distinct().count()
    assert(plantedLists >= 2, "planted near-dups were not split — adjust geometry")
    def brute(qid: Long): Set[Long] = assigned.crossJoin(
        broadcast(assigned.filter(col("vec_id") === qid).select(col("e").as("q"))))
      .select(col("vec_id"),
        round(lit(1000) *
          (aggregate(zip_with(col("e"), col("q"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x) /
           (sqrt(aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
             lit(0.0), (acc, x) => acc + x)) *
            sqrt(aggregate(zip_with(col("q"), col("q"), (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x))))).cast("long").as("cos_x1000"))
      .orderBy(col("cos_x1000").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val queryIds = Seq(400L, 405L, 411L)
    queryIds.foreach { qid =>
      val truth = brute(qid)
      def recall(np: Int): Double =
        VectorOps.ivfSearch(assigned, cents, qid, nprobe = np, topK = 10)
          .collect().map(_.getLong(0)).toSet.intersect(truth).size.toDouble / truth.size
      val r1 = recall(1)
      val r2 = recall(2)
      info(f"planted q$qid: recall@10 nprobe1=$r1%.2f nprobe2=$r2%.2f")
      // single-list probing must demonstrably LOSE straddled neighbors…
      assert(r1 < 1.0, s"q$qid: nprobe=1 recall $r1 — boundary case not adversarial")
      // …and two lists must recover the full cluster: the planted points'
      // two nearest centroids are exactly the cells the cluster straddles
      assert(r2 === 1.0, s"q$qid: nprobe=2 recall $r2 — straddled cluster not recovered")
    }
  }

  test("SemDeDup: planted jittered copies dropped (min-id keeper), ordinary cluster-mates kept") {
    val s = spark
    import s.implicits._
    val dims = 32
    val tau = 930L
    val centers = (0 until 4).map { c =>
      val r = new scala.util.Random(7000 + c)
      Array.fill(dims)(r.nextGaussian() * 2.0)
    }
    // 40 base members per cluster (σ=1 noise: cluster-mate cos ≈ 0.8) +
    // for every base id % 10 == 0, two σ=0.05 jitter copies (cos ≈ 0.999)
    val base = (0L until 160L).map { id =>
      val r = new scala.util.Random(id)
      val c = (id % 4).toInt
      (id, centers(c).map(_ + r.nextGaussian() * 1.0).toSeq)
    }
    val copies = base.filter(_._1 % 10 == 0).flatMap { case (id, v) =>
      (1 to 2).map { j =>
        val r = new scala.util.Random(id * 100 + j)
        (1000L + id * 10 + j, v.map(_ + r.nextGaussian() * 0.05).toSeq)
      }
    }
    val all = base ++ copies
    val vecsDf = all.toDF("vec_id", "e").localCheckpoint()
    val assigned = VectorOps
      .assign(vecsDf, VectorOps.kmeansCentroids(vecsDf, k = 4, iters = 4))
      .localCheckpoint()

    // plain-Scala within-cluster reference on the SAME assignment
    val rows = assigned.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def cosX1000(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      math.round(1000.0 * dot /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val expDropped = rows.filter { case (id, v, c) =>
      rows.exists { case (id2, v2, c2) =>
        id2 < id && c2 == c && cosX1000(v2, v) >= tau }
    }.map(_._1).toSet

    // every planted copy must be dropped (it has a lower-id original in
    // its cluster); a few σ=1 base pairs may legitimately cross τ too, so
    // containment + the exact reference equality below is the contract
    assert(copies.map(_._1).toSet.subsetOf(expDropped),
      s"planting broken: expected drops ${expDropped.toSeq.sorted}")
    assert((expDropped -- copies.map(_._1).toSet).size <= 5,
      "far more natural near-dups than the noise tail should produce")

    val gotDropped = VectorOps.semDedupAssigned(assigned, tau)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(gotDropped === expDropped)

    val kept = VectorOps.semDedup(vecsDf, k = 4, iters = 4, tauX1000 = tau)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === rows.map(_._1).toSet -- expDropped)
  }

  test("SemDeDup: exact duplicates always dedup to the single min-id copy") {
    val s = spark
    import s.implicits._
    val v = Seq.fill(8)(1.0) // one direction, four exact copies + noise ids
    val data = Seq(
      (5L, v), (9L, v), (12L, v), (3L, v),
      (20L, Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)))
    val df = data.toDF("vec_id", "e").localCheckpoint()
    val kept = VectorOps.semDedup(df, k = 2, iters = 2, tauX1000 = 999L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(3L) && kept.contains(20L))
    assert(!kept.exists(Set(5L, 9L, 12L)), s"kept $kept")
  }

  test("k-center: planted clusters each get exactly one exemplar; tight cover") {
    val s = spark; import s.implicits._
    // 8 well-separated clusters on dim 0 (centers 0,10,...,70), 5 points
    // each jittered by i*0.01; intra sqDist <= 0.04^2 = 0.0016 -> x1000
    // rounds to <= 2, inter >= ~99 -> greedy k=8 MUST pick one per
    // cluster (any doubled cluster leaves another uncovered at dist ~1e5)
    val data = for (j <- 0 until 8; i <- 0 until 5) yield
      (j * 5L + i, Seq(j * 10.0 + i * 0.01, 0.0, 0.0, 0.0))
    val out = VectorOps.kcenterSelect(data.toDF("vec_id", "e"), k = 8)
      .collect()
    assert(out.length === 8)
    val clusters = out.map(_.getAs[Long]("vec_id") / 5).toSet
    assert(clusters.size === 8, s"one exemplar per cluster, got $clusters")
    assert(out.head.getAs[Long]("dist_x1000") === 0L, "seed distance is 0")
    assert(out.forall(_.getAs[Long]("cover_x1000") <= 2L),
      "cover radius bounded by the intra-cluster jitter")
  }
}
