package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-bucketed co-located joins: the write-once-shuffle-never pattern
  * must actually eliminate the Exchange on join AND aggregate, and must
  * return exactly the shuffled formulation's rows. Broadcast is disabled in
  * this session so the join cannot cheat its way around the claim.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed-by-key tables join and aggregate with ZERO Exchange, values exact") {
    val s = spark
    import s.implicits._
    // two document-shaped sides sharing the doc_id key space
    val a = (0L until 2000L).map(i => (i, s"text-$i", (i % 7).toInt))
      .toDF("doc_id", "text", "grp")
    val b = (0L until 2000L by 2L).map(i => (i, i * 10))
      .toDF("doc_id", "score")
    BucketedTables.writeBucketed(a, "bk_docs", "doc_id", buckets = 8)
    BucketedTables.writeBucketed(b, "bk_scores", "doc_id", buckets = 8)
    val ta = spark.table("bk_docs")
    val tb = spark.table("bk_scores")

    val joined = ta.join(tb, "doc_id")
    val jplan = joined.queryExecution.executedPlan.toString
    assert(!jplan.contains("Exchange"),
      s"bucketed join still shuffles:\n${jplan.take(1500)}")
    assert(jplan.contains("SortMergeJoin"), jplan.take(600))
    // same rows as the shuffled formulation over the raw frames
    val expect = a.join(b, "doc_id")
      .collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    val got = joined.select("doc_id", "text", "grp", "score")
      .collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    assert(got.toSeq === expect.toSeq)

    // aggregation on the bucket key also runs in place (no Exchange before
    // the final HashAggregate pair — partial==final per bucket)
    val agg = ta.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val aplan = agg.queryExecution.executedPlan.toString
    assert(!aplan.contains("Exchange"),
      s"bucketed aggregate still shuffles:\n${aplan.take(1500)}")
    assert(agg.count() === 2000L)

    // the non-bucketed twin DOES shuffle — the assert above is meaningful
    val shuffled = a.join(b, "doc_id").queryExecution.executedPlan.toString
    assert(shuffled.contains("Exchange"))
  }
}
