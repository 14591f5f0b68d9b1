package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketch: accuracy across magnitudes, EXACT merge semantics
  * (union == sketch-of-union, register-wise), SQL/codegen surface.
  */
class HyperLogLogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.ensureRegistered(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // deterministic stand-in for a 64-bit hash stream (splitmix64)
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def sketchOf(hashes: Iterable[Long], p: Int = 12): Array[Byte] = {
    val b = new HllBuild(p)
    hashes.foldLeft(b.zero)((buf, h) => b.reduce(buf, h))
  }

  test("estimate within 3σ of theory across magnitudes (p=12: σ≈1.6%)") {
    for (n <- Seq(10, 100, 1000, 10000, 200000)) {
      val est = HllOps.estimate(sketchOf((1 to n).map(i => mix(i.toLong))))
      val tol = math.max(4.0, 3 * 0.0163 * n)
      assert(math.abs(est - n) <= tol, s"n=$n est=$est tol=$tol")
    }
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    val once = sketchOf((1 to 5000).map(i => mix(i.toLong)))
    val thrice = sketchOf((1 to 15000).map(i => mix((i % 5000 + 1).toLong)))
    assert(HllOps.estimate(once) === HllOps.estimate(thrice))
  }

  test("merge is exact union: merge(sk(A), sk(B)) register-identical to sk(A ∪ B)") {
    val a = (1 to 4000).map(i => mix(i.toLong))
    val b = (3000 to 7000).map(i => mix(i.toLong)) // overlapping
    val merged = HllOps.merge(sketchOf(a), sketchOf(b))
    val direct = sketchOf(a ++ b)
    assert(merged.toSeq === direct.toSeq)
  }

  test("merge is commutative, associative, idempotent; null/mismatch permissive") {
    val x = sketchOf((1 to 100).map(i => mix(i.toLong)))
    val y = sketchOf((50 to 200).map(i => mix(i.toLong)))
    val z = sketchOf((150 to 400).map(i => mix(i.toLong)))
    assert(HllOps.merge(x, y).toSeq === HllOps.merge(y, x).toSeq)
    assert(HllOps.merge(HllOps.merge(x, y), z).toSeq ===
      HllOps.merge(x, HllOps.merge(y, z)).toSeq)
    assert(HllOps.merge(x, x).toSeq === x.toSeq)
    assert(HllOps.merge(null, x) eq x)
    assert(HllOps.merge(x, null) eq x)
    assert(HllOps.merge(x, new Array[Byte](64)) eq x) // size mismatch → left
  }

  test("estimate on malformed input is 0, never a throw") {
    assert(HllOps.estimate(null) === 0L)
    assert(HllOps.estimate(Array.emptyByteArray) === 0L)
    assert(HllOps.estimate(new Array[Byte](100)) === 0L) // not a power of two
    assert(HllOps.estimate(new Array[Byte](4096)) === 0L) // all-zero regs → LC(0)
  }

  test("Spark surface: groupBy sketch + HllUnion rollup == whole-corpus sketch; hll_estimate is codegen'd") {
    val s = spark; import s.implicits._
    val df = (1 to 20000).map(i => (i % 4, s"key-$i")).toDF("g", "k")
      .select(col("g"), xxhash64(col("k")).as("h"))
    val perGroup = df.groupBy("g").agg(HllBuild.udafColumn(col("h"), 12).as("sk"))
    val rolled = perGroup.agg(HllUnion.udafColumn(col("sk")).as("sk"))
      .select(call_function("hll_estimate", col("sk"))).as[Long].head()
    val direct = df.agg(HllBuild.udafColumn(col("h"), 12).as("sk"))
      .select(call_function("hll_estimate", col("sk"))).as[Long].head()
    assert(rolled === direct)
    assert(math.abs(rolled - 20000L) <= 3 * 0.0163 * 20000)
    // partial aggregation must apply (constant-size buffer): two-phase agg
    val plan = perGroup.queryExecution.executedPlan.toString
    assert("(?i)partial".r.findFirstIn(plan).isDefined, plan)
  }
}
