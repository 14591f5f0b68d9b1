package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** saltedJoin contract: exact row preservation vs the plain inner join on
  * any distribution (the value half — q62's oracle covers it end-to-end on
  * the harness tables) and the skew mechanics (the plan half): the join
  * key includes the salt and a hot key's rows actually land on multiple
  * reducers. Broadcast is disabled so the demonstration can't degenerate.
  */
class AdvancedOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("saltedJoin returns exactly the plain inner-join rows (hot key, gaps, nulls)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    // 60% of fact rows on key 0; some keys absent from dim; some null keys
    val fact = (0 until 5000).map { i =>
      val k: java.lang.Long =
        if (i % 100 == 0) null
        else if (rnd.nextInt(10) < 6) 0L
        else rnd.nextInt(20).toLong
      (k, i.toLong, rnd.nextInt(1000))
    }.toDF("k", "row_id", "v")
    val dim = (0L until 15L).map(k => (k, s"dim-$k")).toDF("k", "attr")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "row_id", "v", "attr").collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val salted = rows(AdvancedOps.saltedJoin(fact, dim, "k", salts = 8))
    val plain = rows(fact.join(dim, "k"))
    assert(salted === plain)
    assert(plain.nonEmpty)
    // salts = 1 degenerates to the plain join too
    assert(rows(AdvancedOps.saltedJoin(fact, dim, "k", salts = 1)) === plain)
  }

  test("the hot key's rows spread over multiple reducers; unsalted they pin one") {
    val s = spark
    import s.implicits._
    val fact = (0 until 4000).map(i => (0L, i.toLong)).toDF("k", "row_id")
      .union((0 until 100).map(i => (1L + i % 5, 10000L + i)).toDF("k", "row_id"))
    val dim = (0L until 6L).map(k => (k, k * 7)).toDF("k", "attr")

    val salted = AdvancedOps.saltedJoin(fact, dim, "k", salts = 8)
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"),
      "join key lost the salt")
    def hotPartitions(df: org.apache.spark.sql.DataFrame): Long = df
      .select(spark_partition_id().as("pid"), col("k"))
      .where(col("k") === 0L)
      .select(col("pid")).distinct().count()
    // partition ids on the join output reflect the join exchange: salted
    // spreads key 0 across reducers, plain pins it to exactly one
    assert(hotPartitions(salted) > 1, "hot key still on one reducer")
    assert(hotPartitions(fact.join(dim, "k")) === 1L)
  }
}
