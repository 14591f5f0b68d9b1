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
}
