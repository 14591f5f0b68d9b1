package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{LinkExtractor, UrlCanon}
import graft.sources.PagesSynth
import java.nio.charset.StandardCharsets.UTF_8

/** Link-graph coverage beyond the q71/q72 driver flags: the distributed
  * extraction equals a sequential driver-side oracle page for page, and
  * the distributed PageRank equals an independent plain-Scala model of
  * the same damped iteration on the same extracted edges.
  */
class LinkGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("q71 flags all-true and distributed links equal the sequential oracle") {
    val df = PagesOps.q71LinkGraph(spark, "unused")
    assert(df.filter(!col("links_ok")).count() === 0L)
    val got = df.select("url", "link_idx", "href", "anchor", "nofollow", "abs_url")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getString(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    val expected = (0L until PagesOps.VerifyDocs).flatMap { id =>
      val url = PagesSynth.urlFor(id)
      LinkExtractor.outlinks(PagesSynth.htmlFor(id).getBytes(UTF_8))
        .zipWithIndex.map { case (l, i) =>
          (url, i, l.href, l.anchor, l.nofollow,
            UrlCanon.resolve(url, l.href).orNull)
        }
    }.sortBy(t => (t._1, t._2))
    assert(got.size === expected.size)
    assert(got === expected)
    // the synthesized corpus plants absolute-path links only — every one
    // must have resolved against its page's host
    assert(got.forall(t => t._6 != null && t._6.startsWith("https://site")))
  }

  test("q72 PageRank equals an independent driver-side model exactly") {
    val df = PagesOps.q72LinkRank(spark, "unused")
    assert(df.filter(!col("rank_ok")).count() === 0L)
    val got = df.select("node", "rank_x1e9").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // independent model: same edges from the sequential extractor, same
    // damped iteration with the same per-iteration 1e-9 grid snap
    val edges = (0L until PagesOps.VerifyDocs).flatMap { id =>
      val url = PagesSynth.urlFor(id)
      LinkExtractor.outlinks(PagesSynth.htmlFor(id).getBytes(UTF_8)).iterator
        .filter(!_.nofollow)
        .flatMap(l => UrlCanon.resolve(url, l.href).map(url -> _))
    }.distinct.filter(e => e._1 != e._2)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val nn = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    def snap9(x: Double): Double = math.round(x * 1e9) / 1e9
    var r = nodes.map(_ -> snap9(1.0 / nn)).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      edges.foreach { case (s, d) => contrib(d) += r(s) / out(s) }
      r = nodes.map(n => n -> snap9(0.15 / nn + 0.85 * contrib(n))).toMap
    }
    val model = r.map { case (n, v) => n -> math.round(v * 1e9) }
    assert(got.keySet === model.keySet)
    val diffs = model.count { case (n, v) => got(n) != v }
    assert(diffs === 0, s"$diffs nodes differ from the model")
    // structure sanity: the universally-linked targets outrank everything
    val top = df.limit(2).collect().map(_.getString(0)).toSet
    assert(top.forall(u => u.endsWith("/") || u.endsWith("/about")),
      s"expected the header targets on top, got $top")
  }

  test("q110 crawl-BFS equals an independent driver-side BFS node-for-node") {
    val df = PagesOps.q110CrawlHops(spark, "unused")
    assert(df.filter(!col("bfs_ok")).count() === 0L)
    val got = df.select("node", "hop").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // independent model: same edges from the sequential extractor, plain
    // queue BFS from the same id%97==0 seed set
    val edges = (0L until PagesOps.VerifyDocs).flatMap { id =>
      val url = PagesSynth.urlFor(id)
      LinkExtractor.outlinks(PagesSynth.htmlFor(id).getBytes(UTF_8)).iterator
        .filter(!_.nofollow)
        .flatMap(l => UrlCanon.resolve(url, l.href).map(url -> _))
    }.distinct.filter(e => e._1 != e._2)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = (0L until PagesOps.VerifyDocs).filter(_ % 97 == 0)
      .map(PagesSynth.urlFor).distinct
    val hop = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    var level = 0L
    var f = seeds.toSet
    while (f.nonEmpty) {
      level += 1
      val next = f.flatMap(adj.getOrElse(_, Nil)).filterNot(hop.contains)
      next.foreach(hop(_) = level)
      f = next
    }
    assert(got.keySet === hop.keySet)
    val diffs = hop.count { case (n, h) => got(n) != h }
    assert(diffs === 0, s"$diffs nodes differ from the BFS model")
    // structure sanity: seeds at 0, the universally-linked header targets
    // one hop out, and multiple hop levels actually occur
    assert(seeds.forall(s => got.get(s).contains(0L)))
    assert(got.values.toSet.size >= 2, "BFS collapsed to a single level")
  }

  test("q95 HITS equals an independent driver-side model exactly") {
    val df = PagesOps.q95Hits(spark, "unused")
    assert(df.filter(!col("hits_ok")).count() === 0L)
    val got = df.select("node", "auth_x1e9", "hub_x1e9").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // independent model: same edges from the sequential extractor, same
    // L1-normalized mutual reinforcement with the same 1e-9 grid snaps
    val edges = (0L until PagesOps.VerifyDocs).flatMap { id =>
      val url = PagesSynth.urlFor(id)
      LinkExtractor.outlinks(PagesSynth.htmlFor(id).getBytes(UTF_8)).iterator
        .filter(!_.nofollow)
        .flatMap(l => UrlCanon.resolve(url, l.href).map(url -> _))
    }.distinct.filter(e => e._1 != e._2)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val nn = nodes.size.toDouble
    def snap9(x: Double): Double = math.round(x * 1e9) / 1e9
    var h = nodes.map(_ -> snap9(1.0 / nn)).toMap
    var a = nodes.map(_ -> 0.0).toMap
    for (_ <- 1 to 3) {
      val ra = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      edges.foreach { case (s, d) => ra(d) += h(s) }
      val raS = ra.map { case (n, v) => n -> snap9(v) }
      val aTot = snap9(raS.values.sum)
      a = nodes.map(n => n -> snap9(raS.getOrElse(n, 0.0) / aTot)).toMap
      val rh = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      edges.foreach { case (s, d) => rh(s) += a(d) }
      val rhS = rh.map { case (n, v) => n -> snap9(v) }
      val hTot = snap9(rhS.values.sum)
      h = nodes.map(n => n -> snap9(rhS.getOrElse(n, 0.0) / hTot)).toMap
    }
    val model = nodes.map(n =>
      n -> (math.round(a(n) * 1e9), math.round(h(n) * 1e9))).toMap
    assert(got.keySet === model.keySet)
    val diffs = model.count { case (n, v) => got(n) != v }
    assert(diffs === 0, s"$diffs nodes differ from the model")
    // structure sanity: the universally-linked header targets are the top
    // authorities, and leaf pages (linked-to only) have hub exactly 0
    val topAuth = df.limit(2).collect().map(_.getString(0)).toSet
    assert(topAuth.forall(u => u.endsWith("/") || u.endsWith("/about")),
      s"expected the header targets as top authorities, got $topAuth")
  }

  test("q73 frontier equals a sequential replay of all four engines") {
    import graft.core.{RobotsTxt, SitemapParser}
    val sfDir = "/root/testdata/sf0.001"
    val df = Relational.q73Frontier(spark, sfDir)
    assert(df.filter(!col("frontier_ok")).count() === 0L)
    val got = df.select("h", "url", "priority", "fetch_ms").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4, t._2)).toSeq

    // sequential model: same fixtures, the in-JVM matcher instead of the
    // compiled-regex admission, plain Scala scheduling
    val FS = Relational.FrontierSynth
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val smCands = (0L until 20L).flatMap { h =>
      assert(SitemapParser.sitemapUrls(FS.robots(h)) ===
        Seq(s"https://${FS.host(h)}/sitemap.xml"))
      SitemapParser.parse(FS.sitemapXml(h)).map(e => (h, e.loc, e.priority))
    }
    val linkCands = li.map { case (ok, sk) =>
      (sk % 20, s"https://site${sk % 20}.example/order/$ok", 0.5)
    }.distinct
    val crawled: Set[String] =
      (0L until 20L).flatMap(h => (0 until 10).filter(_ % 4 == 0)
        .map(n => s"https://${FS.host(h)}/page/$n")).toSet ++
      li.filter(_._1 % 3 == 0).map { case (ok, sk) =>
        s"https://site${sk % 20}.example/order/$ok"
      }
    val rules = (0L until 20L)
      .map(h => h -> RobotsTxt.rulesFor(FS.robots(h), "graftbot")).toMap
    val delays = (0L until 20L).map(h =>
      h -> (RobotsTxt.crawlDelayFor(FS.robots(h), "graftbot").get * 1000).toLong).toMap
    val admitted = (smCands ++ linkCands).distinct
      .filterNot(c => crawled(c._2))
      .filter { case (h, url, _) =>
        RobotsTxt.allowed(rules(h), url.replaceFirst("^https://[^/]+", ""))
      }
    val model = admitted.groupBy(_._1).toSeq.flatMap { case (h, cs) =>
      cs.sortBy(c => (-c._3, c._2)).zipWithIndex.map { case ((_, url, pri), i) =>
        (h, url, pri, i.toLong * delays(h))
      }
    }.sortBy(t => (t._1, t._4, t._2))
    assert(got.size === model.size, s"${got.size} vs model ${model.size}")
    assert(got === model)
    // the planted exclusions really bit: some candidates were dropped
    assert(model.size < (smCands ++ linkCands).distinct.size)
  }
}
