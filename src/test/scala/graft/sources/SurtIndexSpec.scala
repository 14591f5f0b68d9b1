package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SURT-ordered index layout: disjoint per-file key ranges, manifest-pruned
  * prefix lookups that lose nothing vs a full scan, range-shuffle build.
  */
class SurtIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var out: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    out = java.nio.file.Files.createTempDirectory("surtidx-spec").toString
    val urls = spark.range(0, 5000).selectExpr(
      "id",
      """concat('http://', CASE WHEN id % 7 = 0 THEN 'www.' ELSE '' END,
        | 'host', CAST(id % 40 AS STRING),
        | CASE WHEN id % 3 = 0 THEN '.news' ELSE '' END,
        | '.example', CAST(id % 5 AS STRING), '.org/p/', CAST(id AS STRING))
        |""".stripMargin.replace("\n", " ").trim + " AS url")
    SurtIndex.build(spark, urls, "url", out, 8)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("manifest covers every file, ranges are ordered and disjoint") {
    val m = SurtIndex.manifest(spark, out)
    val files = new java.io.File(s"$out/data").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(m.size === files.length)
    assert(m.map(_.rows).sum === 5000L)
    m.foreach(r => assert(r.min_surt <= r.max_surt))
    // range-partitioned: key intervals of distinct files never interleave
    m.sliding(2).foreach {
      case Seq(a, b) => assert(a.max_surt <= b.min_surt,
        s"overlap: ${a.max_surt} > ${b.min_surt}")
      case _ =>
    }
  }

  test("prefix lookup == full-scan filter, touching a strict subset of files") {
    val full = spark.read.parquet(s"$out/data")
    val m = SurtIndex.manifest(spark, out)
    for (p <- Seq("org,example0", "org,example3,host1", "org,example2,host17)")) {
      val sel = SurtIndex.filesForPrefix(m, p)
      assert(sel.nonEmpty && sel.size < m.size,
        s"prefix $p selected ${sel.size} of ${m.size} files — no pruning")
      val got = SurtIndex.lookupPrefix(spark, out, p)
        .select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      val want = full.filter(col("surt").startsWith(p))
        .select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      assert(got.toSeq === want.toSeq, s"prefix $p")
      assert(got.nonEmpty, s"prefix $p matched nothing — weak test")
    }
  }

  test("absent prefix selects zero files and zero rows, schema preserved") {
    val m = SurtIndex.manifest(spark, out)
    assert(SurtIndex.filesForPrefix(m, "zzz,nosuch").isEmpty)
    val df = SurtIndex.lookupPrefix(spark, out, "zzz,nosuch")
    assert(df.count() === 0L)
    assert(df.columns.contains("surt") && df.columns.contains("url"))
  }

  test("empty prefix selects every file (a full range scan, not an error)") {
    val m = SurtIndex.manifest(spark, out)
    assert(SurtIndex.filesForPrefix(m, "").size === m.size)
  }

  test("nextPrefix edge cases") {
    assert(SurtIndex.nextPrefix("abc") === Some("abd"))
    assert(SurtIndex.nextPrefix("a" + Char.MaxValue) === Some("b"))
    assert(SurtIndex.nextPrefix("" + Char.MaxValue) === None)
    assert(SurtIndex.nextPrefix("") === None)
    // the computed bound really is the least upper bound of the prefix set
    assert("abc" + Char.MaxValue < "abd")
  }

  test("build plan is a single range shuffle (RangePartitioning, no extra exchange)") {
    graft.functions.GraftExtensions.ensureRegistered(spark)
    val df = spark.range(100).selectExpr("concat('http://h', id % 9, '.com/', id) AS url")
      .withColumn("surt", call_function("surt_key", col("url")))
      .repartitionByRange(4, col("surt"))
      .sortWithinPartitions("surt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"))
    assert("(?i)exchange".r.findAllIn(plan).size === 1, plan)
  }
}
