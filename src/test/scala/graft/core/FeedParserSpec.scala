package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class FeedParserSpec extends AnyFunSuite {

  private def parse(xml: String, max: Int = 1000): Feed =
    FeedParser.parse(xml.getBytes(UTF_8), max)

  test("RSS 2.0: channel title, items with CDATA titles, guid, pubDate, description") {
    val f = parse(
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>My &amp; Feed</title><link>https://ex.org/</link>
        |<item><title><![CDATA[Q & A <1>]]></title>
        |  <link>https://ex.org/a</link><guid>g-1</guid>
        |  <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
        |  <description>first &lt;b&gt;post&lt;/b&gt;</description></item>
        |<item><title>Two</title><link>https://ex.org/b</link></item>
        |</channel></rss>""".stripMargin)
    assert(f.kind === "rss")
    assert(f.title === "My & Feed")
    assert(f.items.length === 2)
    assert(f.items(0) === FeedItem("Q & A <1>", "https://ex.org/a", "g-1",
      "Mon, 01 Jan 2024 00:00:00 GMT", "first <b>post</b>"))
    // missing guid falls back to the link; missing date/summary empty
    assert(f.items(1) === FeedItem("Two", "https://ex.org/b", "https://ex.org/b", "", ""))
  }

  test("Atom: entry links from href attrs, rel=alternate wins, updated beats published") {
    val f = parse(
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>A</title>
        |<link href="https://ex.org/feed" rel="self"/>
        |<entry><title>E1</title><id>tag:1</id>
        |  <link href="https://ex.org/self" rel="self"/>
        |  <link href="https://ex.org/alt" rel="alternate"/>
        |  <published>2024-01-01T00:00:00Z</published>
        |  <updated>2024-02-02T00:00:00Z</updated>
        |  <summary>sum</summary></entry>
        |<entry><title>E2</title><id>tag:2</id>
        |  <link href="https://ex.org/only"/></entry>
        |</feed>""".stripMargin)
    assert(f.kind === "atom")
    assert(f.title === "A")
    assert(f.items.length === 2)
    assert(f.items(0) === FeedItem("E1", "https://ex.org/alt", "tag:1",
      "2024-02-02T00:00:00Z", "sum"))
    // rel absent counts as alternate
    assert(f.items(1).link === "https://ex.org/only")
    // self-only link is used when no alternate exists
    val g = parse("""<feed><entry><title>x</title>
      |<link href="https://s" rel="self"/></entry></feed>""".stripMargin)
    assert(g.items(0).link === "https://s")
  }

  test("RSS 1.0 RDF items and namespace-prefixed elements (dc:date)") {
    val f = parse(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        |<channel><title>R</title></channel>
        |<item><title>I</title><link>https://r/1</link>
        |  <dc:date>2023-05-05</dc:date></item>
        |</rdf:RDF>""".stripMargin)
    assert(f.kind === "rss")
    assert(f.items.length === 1)
    assert(f.items(0).ts === "2023-05-05")
    // a later pubDate outranks dc:date
    val g = parse("""<rss><channel><item><title>t</title>
      |<dc:date>low</dc:date><pubDate>high</pubDate></item></channel></rss>""".stripMargin)
    assert(g.items(0).ts === "high")
  }

  test("tolerance: unclosed trailing item, item limit, empty/garbage input") {
    val f = parse("<rss><channel><item><title>tail</title><link>https://t", max = 10)
    assert(f.items.length === 1 && f.items(0).title === "tail")
    val many = (1 to 50).map(i =>
      s"<item><title>t$i</title><link>https://x/$i</link></item>").mkString
    assert(parse(s"<rss><channel>$many</channel></rss>", max = 7).items.length === 7)
    assert(parse("").items.isEmpty)
    assert(parse("").kind === "unknown")
    assert(parse("<html><body>not a feed</body></html>").items.isEmpty)
    val rnd = new scala.util.Random(5)
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      FeedParser.parse(b) // never throws
    }
    val base =
      """<feed><entry><title>T</title><link href="https://a"/></entry></feed>"""
    (0 to base.length).foreach(k => parse(base.take(k)))
  }
}
