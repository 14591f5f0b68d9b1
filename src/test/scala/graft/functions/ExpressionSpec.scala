package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Extractor
import graft.sources.PagesSynth
import graft.queries.{Relational, TextOps}

/** Custom Catalyst expression + plan-shape assertions: the properties that
  * make the plans scale (broadcast dims, pruned scans, hash aggregation,
  * top-k rewrite) are locked in here so a regression shows up as a test
  * failure, not as a silent 10× slowdown at the next scale-up.
  */
class ExpressionSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    GraftExtensions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("extract_text SQL function matches the core extractor byte-for-byte") {
    val pages = PagesSynth.pages(spark, 50L).toDF()
    pages.createOrReplaceTempView("pages_v")
    val got = spark.sql(
      "SELECT url, extract_text(html) AS t, html_node_count(html) AS n " +
      "FROM pages_v ORDER BY url").collect()
    val expected = (0L until 50L).map(PagesSynth.pageFor).map { p =>
      val r = Extractor.extractBytes(p.html)
      (p.url, r.text, r.nodeCount)
    }.sortBy(_._1)
    assert(got.length === 50)
    got.zip(expected).foreach { case (row, (url, text, n)) =>
      assert(row.getString(0) === url)
      assert(row.getString(1) === text, s"text mismatch for $url")
      assert(row.getInt(2) === n)
    }
  }

  test("extract_text stays inside WholeStageCodegen (no codegen fence)") {
    // over a parquet-backed table (the synthesized Dataset source is itself
    // an object map, which would fence regardless of the expression)
    val tmp = java.nio.file.Files.createTempDirectory("cg").toString
    PagesSynth.pagesDF(spark, 10L).write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("pages_cg")
    val plan = spark.sql(
      "SELECT length(extract_text(html)) FROM pages_cg WHERE lang = 'en'")
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("extract_text") && l.trim.startsWith("*")), plan.take(1500))
  }

  test("vec kernels: values identical to the higher-order composition, and WSCG-kept") {
    val tmp = java.nio.file.Files.createTempDirectory("vec").toString
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("emb_cg")
    // byte-identical values: same left-fold order as aggregate(zip_with(..))
    val rows = spark.sql(
      """SELECT vec_id,
        |  vec_dot(e, e) AS d,
        |  aggregate(zip_with(e, e, (x, y) -> x * y), 0.0D, (a, x) -> a + x) AS d0,
        |  vec_norm(e) AS nm,
        |  vec_cos(e, e) AS c
        |FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS e FROM emb_cg)
        |""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"dot differs for ${r.getLong(0)}")
      assert(r.getDouble(3) == math.sqrt(r.getDouble(1)))
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-12) // cos(e, e) == 1
    }
    // null semantics match the composition: length mismatch and null element
    val edge = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D)) AS mism,
        |       vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS nul
        |""".stripMargin).collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(1))
    // the kernel stays inside WholeStageCodegen (the HOF composition fences)
    val plan = spark.sql(
      "SELECT vec_cos(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) FROM emb_cg")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("vec_cos") && l.trim.startsWith("*")), plan.take(1500))
  }

  test("decode_entities SQL function matches core Entities.decode") {
    val cases = Seq("a &lt;b&gt; &amp;&quot; &nbsp; &#65;&#x42; &unknown;",
      "no entities", "&", "&amp", "trailing &#")
    cases.foreach { c =>
      val got = spark.sql(s"SELECT decode_entities('${c.replace("'", "''")}')")
        .collect()(0).getString(0)
      assert(got === graft.core.Entities.decode(c), s"case: $c")
    }
  }

  test("extract_title: first title wins, decoded+collapsed, '' when absent") {
    val cases = Seq(
      "<html><head><title>My   Page &amp; More</title></head><body>x</body></html>"
        -> "My Page & More",
      "<title>first</title><title>second</title>" -> "first",
      "<title></title><title>later</title>" -> "", // first (empty) wins, pinned
      "<p>no title here</p>" -> "",
      "<title>  padded \n lines  </title>" -> "padded lines",
      "<title/><title>Real</title>" -> "Real") // self-closing title skipped
    cases.foreach { case (html, want) =>
      val got = spark.sql(
        s"SELECT extract_title(CAST('${html.replace("'", "''")}' AS BINARY))")
        .collect()(0).getString(0)
      assert(got === want, s"html: $html")
    }
  }

  test("extract_meta: name/property lookup, head-scoped, '' when absent") {
    val html = """<html><head>
      |<meta charset="utf-8">
      |<meta name="description" content="A &amp; B   site">
      |<meta property="og:title" content="OG Title">
      |</head><body>
      |<meta name="description" content="body meta must not count">
      |</body></html>""".stripMargin
    val q = html.replace("'", "''").replace("\n", " ")
    val row = spark.sql(
      s"""SELECT extract_meta(CAST('$q' AS BINARY), 'description'),
         |  extract_meta(CAST('$q' AS BINARY), 'OG:TITLE'),
         |  extract_meta(CAST('$q' AS BINARY), 'missing')""".stripMargin)
      .collect()(0)
    assert(row.getString(0) === "A & B site")
    assert(row.getString(1) === "OG Title", "property= + case-insensitive key")
    assert(row.getString(2) === "")
    // body-only meta: head scan stops at <body>
    val bodyOnly = "<body><meta name=x content=y></body>".replace("'", "''")
    assert(spark.sql(s"SELECT extract_meta(CAST('$bodyOnly' AS BINARY), 'x')")
      .collect()(0).getString(0) === "")
    // a tag carrying BOTH name and property: either key must hit
    val both = "<meta name=\"twitter:title\" property=\"og:title\" content=\"X\">"
      .replace("'", "''")
    val r2 = spark.sql(
      s"""SELECT extract_meta(CAST('$both' AS BINARY), 'og:title'),
         |  extract_meta(CAST('$both' AS BINARY), 'twitter:title')""".stripMargin)
      .collect()(0)
    assert(r2.getString(0) === "X" && r2.getString(1) === "X")
  }

  test("decode_entities_ext decodes the extended set; base stays pinned") {
    val row = spark.sql(
      "SELECT decode_entities('&copy; a &mdash; b &bogus;'), " +
      "decode_entities_ext('&copy; a &mdash; b &bogus;')").collect()(0)
    assert(row.getString(0) === "&copy; a &mdash; b &bogus;")
    assert(row.getString(1) === "© a — b &bogus;")
  }

  test("extract_text handles null and empty html") {
    val rows = spark.sql(
      "SELECT extract_text(CAST(NULL AS BINARY)), extract_text(CAST('' AS BINARY))")
      .collect()(0)
    assert(rows.isNullAt(0))
    assert(rows.getString(1) === "")
  }

  test("q03 join plan broadcasts the dimension tables") {
    val plan = Relational.q03JoinRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("extraction pipeline scan reads only url+html (column pruning)") {
    val tmp = java.nio.file.Files.createTempDirectory("prune").toString
    PagesSynth.pagesDF(spark, 20L).write.mode("overwrite").parquet(tmp)
    val plan = graft.pipeline.ExtractPipeline
      .extractDF(spark.read.parquet(tmp), numParts = 4)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("url") && scanLine.contains("html"))
    assert(!scanLine.contains("warc_ts") && !scanLine.contains("lang"),
      s"scan not pruned: $scanLine")
  }

  test("minhash signature aggregates with HashAggregate, not SortAggregate") {
    val plan = TextOps.q21MinhashSig(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), "min() fell back to SortAggregate")
    assert(plan.contains("HashAggregate"))
  }

  test("html_nodes generator matches the scanner node-for-node") {
    val pages = PagesSynth.pages(spark, 10L).toDF()
    pages.createOrReplaceTempView("pages_g")
    val got = spark.sql(
      """SELECT url, n.idx, n.ntype, n.tag, n.self_closing, n.start, n.end,
        |       n.attrs['href'] AS href
        |FROM pages_g LATERAL VIEW html_nodes(html) n
        |ORDER BY url, n.idx""".stripMargin).collect()
    val expected = (0L until 10L).map(PagesSynth.pageFor).flatMap { p =>
      graft.core.HtmlScanner.parse(p.html).map(nd => (p.url, nd))
    }.sortBy { case (u, nd) => (u, nd.idx) }
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (row, (url, nd)) =>
      assert(row.getString(0) === url)
      assert(row.getInt(1) === nd.idx)
      assert(row.getString(2) === graft.core.NodeType.name(nd.nodeType))
      assert(row.getString(3) === nd.tagName)
      assert(row.getBoolean(4) === nd.selfClosing)
      assert(row.getInt(5) === nd.start && row.getInt(6) === nd.end)
      if (nd.nodeType == graft.core.NodeType.StartTag)
        // bare attributes are NULL map values — identical to the typed API
        assert(Option(row.getString(7)) === nd.attr("href"))
    }
  }

  test("bare attribute surfaces as NULL map value, empty-valued as ''") {
    val s = spark
    import s.implicits._
    Seq(("u", "<input checked disabled=\"\" name=x>".getBytes("UTF-8")))
      .toDF("url", "html").createOrReplaceTempView("pages_bare")
    val row = spark.sql(
      """SELECT n.attrs['checked'] AS c, n.attrs['disabled'] AS d,
        |       n.attrs['name'] AS nm, n.attrs['nope'] AS missing
        |FROM pages_bare LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START'""".stripMargin).collect()(0)
    assert(row.isNullAt(0), "bare attr must be NULL, not ''")
    assert(row.getString(1) === "", "explicit empty value stays ''")
    assert(row.getString(2) === "x")
    assert(row.isNullAt(3))
  }

  test("q42 as-of join plans as union+window, never a nested-loop theta join") {
    val plan = graft.queries.AdvancedOps.q42AsofJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("q43 range join plans as a bucketed equi-join, not a theta product") {
    val plan = graft.queries.AdvancedOps.q43RangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("bloom sketch: NO false negatives ever, low measured fp rate, merge-safe") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val members = Array.fill(5000)(rnd.nextLong())
    // distributed build across 4 partitions == the merge path is exercised
    val sketch = members.toSeq.toDF("h").repartition(4)
      .agg(BloomBuild.udafColumn(org.apache.spark.sql.functions.col("h"),
        numBits = 1 << 16, k = 6))
      .collect()(0).getAs[Array[Byte]](0)
    // the exactness contract: every inserted hash is found
    members.foreach(h => assert(BloomOps.contains(sketch, h), s"false negative on $h"))
    // false positives are a rate, not a correctness issue — but it must be
    // a sketch, not all-ones: measure on fresh non-members
    val nonMembers = Array.fill(20000)(rnd.nextLong())
      .filterNot(members.contains)
    val fp = nonMembers.count(BloomOps.contains(sketch, _)).toDouble / nonMembers.length
    info(f"bloom fp rate at n=5000, m=65536, k=6: $fp%.4f")
    assert(fp < 0.05, s"fp rate $fp")
    // malformed sketches answer permissive-true (pre-filter may never drop
    // a potential match)
    assert(BloomOps.contains(null, 1L))
    assert(BloomOps.contains(Array[Byte](1, 2, 3), 1L))
    BloomOps.contains(new Array[Byte](24), -7L) // all-zero words: no throw
  }

  test("cms sketch: never underestimates, merge-safe, mostly-exact when sparse") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    // Zipf-ish multiset: key i appears ~1000/(i+1) times
    val keys = (0 until 200).flatMap(i => Seq.fill(1000 / (i + 1))(rnd.nextLong()
      * 0 + i * 0x9E3779B97F4A7C15L)) // deterministic distinct hashes
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // distributed build across 8 partitions == the merge path is exercised
    val sketch = keys.toDF("h").repartition(8)
      .agg(CmsBuild.udafColumn(org.apache.spark.sql.functions.col("h"),
        depth = 4, width = 1024))
      .collect()(0).getAs[Array[Byte]](0)
    // the exactness contract: estimate >= true count, ALWAYS
    truth.foreach { case (h, n) =>
      assert(CmsOps.estimate(sketch, h) >= n, s"underestimate on $h") }
    // sparse load (200 distinct keys into 4x1024 counters): most estimates
    // exact; overestimate bounded by the total stream length
    val total = keys.size.toLong
    val exact = truth.count { case (h, n) => CmsOps.estimate(sketch, h) == n }
    assert(exact >= 180, s"only $exact/200 exact at sparse load")
    truth.foreach { case (h, n) =>
      assert(CmsOps.estimate(sketch, h) <= n + total, s"wild overestimate on $h") }
    // single-partition build == merged build (addition is order-free)
    val one = keys.toDF("h").coalesce(1)
      .agg(CmsBuild.udafColumn(org.apache.spark.sql.functions.col("h"),
        depth = 4, width = 1024))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sketch, one), "merge path diverges from single build")
    // malformed sketches answer permissive MaxValue (pre-filter may never
    // drop a potential heavy hitter)
    assert(CmsOps.estimate(null, 1L) == Long.MaxValue)
    assert(CmsOps.estimate(Array[Byte](1, 2, 3), 1L) == Long.MaxValue)
    assert(CmsOps.estimate(new Array[Byte](24), -7L) == Long.MaxValue) // d=0
  }

  test("q82 cms pre-filter returns exactly the plain exact aggregate; probe in codegen") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exactDf = docs
      .select(explode(split(lower(trim(col("text"))), "[ \\t\\n\\f\\r\\x0B]+")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 40).orderBy(col("tok"))
    val a = exactDf.collect().map(_.toSeq).toSeq
    val b = TextOps.q82CmsHeavy(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
    val plan = TextOps.q82CmsHeavy(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_cms_estimate"), plan.take(800))
  }

  test("q64 bloom pre-filter returns exactly q60's rows; probe stays in codegen") {
    val a = TextOps.q60Decontaminate(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = TextOps.q64BloomDecontaminate(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
    val plan = TextOps.q64BloomDecontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan.take(800))
  }

  test("nfc_normalize matches java.text.Normalizer on adversarial strings; SQL surface") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val chars = Gen.oneOf('a', 'e', 'A', 'o', '́', '̊', '̈',
      'é', 'Å', ' ', 'ḋ')
    val strs = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, chars).map(_.mkString))
    val prop = Prop.forAll(strs) { t =>
      val got = ExtractOps.nfcNormalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString
      got == java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(1000)
      .withInitialSeed(org.scalacheck.rng.Seed(17L)), prop)
    assert(res.passed, res.status.toString)
    // SQL surface + composition actually fires on a DECOMPOSED input —
    // via the SQL parser's \u escape (Spark's chr() is ASCII-mod-256,
    // unlike DuckDB's codepoint chr(), so it cannot build U+0301)
    val r = spark.sql(
      "SELECT length('cafe\\u0301') AS raw, " +
      "length(nfc_normalize('cafe\\u0301')) AS n").collect()(0)
    assert(r.getInt(0) === 5 && r.getInt(1) === 4)
    assert(spark.sql("SELECT nfc_normalize(NULL) IS NULL").collect()(0).getBoolean(0))
  }

  test("fix_mojibake: repairs Latin-1/CP1252 mis-decodes, never touches clean text") {
    import org.apache.spark.unsafe.types.UTF8String
    def fix(s: String): String =
      ExtractOps.fixMojibake(UTF8String.fromString(s)).toString
    def corrupt(s: String, cs: String): String =
      new String(s.getBytes("UTF-8"), java.nio.charset.Charset.forName(cs))
    val cleans = Seq("café", "don’t — “smart” quotes…", "№ 5 за ₽",
      "日本語テキスト", "mixed ascii + émojis? ±5€", "†‡•‰")
    for (c <- cleans) {
      assert(fix(corrupt(c, "ISO-8859-1")) == c, s"latin1 repair of <$c>")
      assert(fix(corrupt(corrupt(c, "ISO-8859-1"), "ISO-8859-1")) == c,
        s"double-encoded repair of <$c>")
    }
    // CP1252 flavor: U+2019 mis-decodes to ’ (0x92→U+2019 via CP1252),
    // which the sloppy inverse maps back to byte 0x92
    assert(fix(corrupt("don’t", "windows-1252")) == "don’t")
    // never touch: pure ASCII (fast path), genuine Latin-1/Greek text
    // whose bytes are NOT valid UTF-8, lone lead-like chars, empty
    for (s <- Seq("", "plain ascii", "déjà vu à Paris", "Ã", "ñandú ôter",
        "α β γ Ã")) assert(fix(s) == s, s"must not alter <$s>")
    // SQL surface + null
    graft.functions.GraftExtensions.register(spark)
    assert(spark.sql("SELECT fix_mojibake(NULL) IS NULL").collect()(0).getBoolean(0))
    val got = spark.sql(
      "SELECT fix_mojibake(decode(encode('№ż€', 'UTF-8'), 'ISO-8859-1')) AS r")
      .collect()(0).getString(0)
    assert(got == "№ż€")
  }

  test("deflate_ratio_x1000: repetition < prose < noise; deterministic; SQL surface") {
    import org.apache.spark.unsafe.types.UTF8String
    def ratio(s: String): Long =
      ExtractOps.deflateRatioX1000(UTF8String.fromString(s))
    val repetitive = "click here to accept cookies " * 200
    val prose = (0 until 200).map(i =>
      s"sentence $i mixes fresh tokens like alpha${i * 7} and beta${i % 13}.")
      .mkString(" ")
    val rnd = new scala.util.Random(59)
    val noise = Seq.fill(4000)(rnd.nextPrintableChar()).mkString
    val (r1, r2, r3) = (ratio(repetitive), ratio(prose), ratio(noise))
    info(s"ratios x1000: repetitive=$r1 prose=$r2 noise=$r3")
    assert(r1 < r2 && r2 < r3,
      "compression ratio must order repetitive < prose < noise")
    assert(r1 < 100, "boilerplate repetition should compress >10x")
    // deterministic, positive on non-empty, zero on empty
    assert(ratio(prose) === r2)
    assert(ratio("") === 0L)
    assert(ratio("x") > 0L)
    // self-doubling: deflate finds the duplicate of text||text
    assert(ratio(prose + prose) <= r2 + 10)
    // SQL surface through the registered expression
    GraftExtensions.ensureRegistered(spark)
    val viaSql = spark.sql(
      "SELECT deflate_ratio_x1000('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS r")
      .collect()(0).getLong(0)
    assert(viaSql === ratio("a" * 32))
    assert(spark.sql("SELECT deflate_ratio_x1000(NULL) IS NULL")
      .collect()(0).getBoolean(0))
  }

  test("top-k rewrites to TakeOrderedAndProject (no global sort)") {
    val plan = Relational.q09TopkOrders(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1000))
  }

  test("blocklist_hits SQL == core automaton, overlaps through codegen") {
    val s = spark
    import s.implicits._
    val pats = Seq("scan", "can", "win", "window", "a-a")
    val subjects = Seq("spark-scan-window", "", "a-a-a", "wwindowin",
      "scancan", "nothing here")
    val got = subjects.toDF("s")
      .selectExpr("s", "blocklist_hits(s, array('scan','can','win'," +
        "'window','a-a')) AS hits")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ac = graft.core.AhoCorasick.buildStrings(pats)
    subjects.foreach(x => assert(got(x) === ac.count(x), s"subject '$x'"))
    // "a-a-a": self-overlapping "a-a" counted at both ends
    assert(got("a-a-a") === 2L)
    assert(spark.sql("SELECT blocklist_hits(CAST(NULL AS STRING), " +
      "array('x')) IS NULL").collect()(0).getBoolean(0))
  }

  test("sorted_inter_count == size(array_intersect) on sorted-distinct arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(61)
    def arr(): Seq[Long] =
      Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
    val rows = Seq.fill(300)((arr(), arr())) ++
      Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq.empty[Long], Seq.empty[Long]),
        (Seq(5L), Seq(5L)), (Seq(Long.MinValue, 0L, Long.MaxValue),
          Seq(Long.MinValue, Long.MaxValue)))
    val df = rows.toDF("a", "b")
    val got = df.selectExpr("sorted_inter_count(a, b) AS k",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS r")
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // null array -> null (BinaryExpression null propagation)
    assert(spark.sql("SELECT sorted_inter_count(CAST(NULL AS ARRAY<BIGINT>), " +
      "array(1L)) IS NULL").collect()(0).getBoolean(0))
  }
}
