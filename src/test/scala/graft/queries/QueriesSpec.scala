package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Suite-wide invariants for the driver-checked queries: every oracle key
  * has a query, every query runs, and every query is RUN-TO-RUN
  * DETERMINISTIC (collected rows identical across two executions) — the
  * property the driver's hash compare silently depends on.
  */
class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query runs, returns rows, and is run-to-run deterministic") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def snapshot(): (Int, Seq[String]) = {
        val rows = fn(spark, sfDir).collect()
        (rows.length, rows.take(500).map(_.toString).toSeq)
      }
      val a = snapshot()
      val b = snapshot()
      assert(a._1 > 0, s"$name returned no rows")
      assert(a === b, s"$name is not deterministic across runs")
    }
  }
}
