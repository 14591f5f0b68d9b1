package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class SitemapParserSpec extends AnyFunSuite {

  test("urlset: loc/lastmod/priority parsed, protocol default priority, entities decoded") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://a.example/p?x=1&amp;y=2</loc>
        |  <lastmod>2026-01-01</lastmod><priority>0.8</priority></url>
        |<url><loc> https://a.example/q </loc></url>
        |<url><priority>0.9</priority></url>
        |</urlset>""".stripMargin.getBytes(UTF_8)
    val got = SitemapParser.parse(xml).toSeq
    assert(got === Seq(
      SitemapEntry("https://a.example/p?x=1&y=2", "2026-01-01", 0.8),
      SitemapEntry("https://a.example/q", "", 0.5))) // loc-less entry dropped
  }

  test("sitemapindex: nested pointers flagged, never fetched") {
    val xml =
      """<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc></sitemap>
        |<sitemap><loc>https://a.example/s2.xml</loc><lastmod>2026-02-02</lastmod></sitemap>
        |</sitemapindex>""".stripMargin.getBytes(UTF_8)
    val got = SitemapParser.parse(xml).toSeq
    assert(got.map(_.loc) === Seq("https://a.example/s1.xml", "https://a.example/s2.xml"))
    assert(got.forall(_.priority == SitemapParser.IndexPointer))
    assert(got(1).lastmod === "2026-02-02")
  }

  test("damaged input: truncation, junk values, out-of-range priority, never throws") {
    val xml = Fixtures.urlsetOf("https://x.example/a" -> "2",
      "https://x.example/b" -> "junk")
    val got = SitemapParser.parse(xml).toSeq
    assert(got.map(_.priority) === Seq(1.0, 0.5)) // clamped; junk → default
    (0 to xml.length).foreach(k =>
      SitemapParser.parse(java.util.Arrays.copyOf(xml, k))) // no throw
    val rnd = new scala.util.Random(47)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(b)
      SitemapParser.parse(b)
    }
    // unclosed trailing entry still yields its loc
    val cut = "<urlset><url><loc>https://x.example/tail</loc>".getBytes(UTF_8)
    assert(SitemapParser.parse(cut).map(_.loc).toSeq === Seq("https://x.example/tail"))
  }

  private object Fixtures {
    def urlsetOf(entries: (String, String)*): Array[Byte] =
      ("<urlset>" + entries.map { case (loc, pri) =>
        s"<url><loc>$loc</loc><priority>$pri</priority></url>"
      }.mkString + "</urlset>").getBytes(UTF_8)
  }

  test("entry cap early-stops the scan") {
    val big = ("<urlset>" + (0 until 100)
      .map(n => s"<url><loc>https://x.example/$n</loc></url>").mkString +
      "</urlset>").getBytes(UTF_8)
    assert(SitemapParser.parse(big, maxEntries = 7).length === 7)
  }

  test("robots Sitemap: pointers extracted, comments and junk ignored") {
    val body =
      """User-agent: *
        |Disallow: /x
        |Sitemap: https://a.example/sm.xml  # comment
        |sitemap: https://a.example/sm2.xml
        |Sitemap:
        |NotSitemap: https://a.example/no.xml
        |""".stripMargin
    assert(SitemapParser.sitemapUrls(body) ===
      Seq("https://a.example/sm.xml", "https://a.example/sm2.xml"))
    assert(SitemapParser.sitemapUrls("") === Seq.empty)
    assert(SitemapParser.sitemapUrls(null) === Seq.empty)
  }
}
