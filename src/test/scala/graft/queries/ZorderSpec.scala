package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout (q96): the Morton key must be an exact bijective bit
  * interleave, and the payoff must be MEASURABLE — on the bucket-envelope
  * manifest, a selective filter on EITHER dimension prunes most buckets,
  * while the x-sorted control layout prunes only x.
  */
class ZorderSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("morton key is the exact bit interleave (round-trips every (x, y))") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(99)
    val pts = (1 to 500).map(_ => (r.nextInt(1 << AdvancedOps.ZBits).toLong,
      r.nextInt(1 << AdvancedOps.ZBits).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        AdvancedOps.zkey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      // independent de-interleave: even bits -> x, odd bits -> y
      var (dx, dy) = (0L, 0L)
      for (i <- 0 until AdvancedOps.ZBits) {
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert((dx, dy) === (x, y), s"z=$z did not round-trip")
    }
  }

  test("z-order buckets prune on BOTH dimensions; the x-sorted control only on x") {
    val env = AdvancedOps.q96Zorder(spark, sfDir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // (n, min_x, max_x, min_y, max_y)
    // the Morton space is sparse when the dims use unequal bit widths
    // (y < 2^8 here), so of the 32 fixed-width key ranges only the
    // populated ones appear — a dozen is the expected occupancy, one or
    // two would mean the interleave collapsed
    val nBuckets = env.length
    assert(nBuckets >= 8, s"degenerate layout: $nBuckets buckets")

    // the same rows bucketed by an x-only sort (equal-count quantiles)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("x"), col("l_partkey").as("y"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("x"))
    val ctrl = li
      .withColumn("bucket", ((row_number().over(w) - 1) * nBuckets /
        lit(li.count())).cast("long"))
      .groupBy("bucket")
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    def overlapFrac(envs: Seq[(Long, Long)], lo: Long, hi: Long): Double =
      envs.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / envs.size

    // a 1/8-wide range query on each dimension
    val zX = overlapFrac(env.map(e => (e._2, e._3)).toSeq, 700, 887)
    val zY = overlapFrac(env.map(e => (e._4, e._5)).toSeq, 96, 120)
    val cX = overlapFrac(ctrl.map(e => (e._1, e._2)).toSeq, 700, 887)
    val cY = overlapFrac(ctrl.map(e => (e._3, e._4)).toSeq, 96, 120)
    info(f"bucket overlap: zorder x=$zX%.2f y=$zY%.2f | x-sorted x=$cX%.2f y=$cY%.2f")
    assert(zX <= 0.5, f"z-order failed to prune on x ($zX%.2f)")
    assert(zY <= 0.5, f"z-order failed to prune on y ($zY%.2f)")
    assert(cX <= 0.5, "control should prune on its own sort key")
    assert(cY >= 0.9, "x-sorted control should NOT prune on y — measurement broken")
  }
}
