package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class LinkExtractorSpec extends AnyFunSuite {

  private def links(html: String): Seq[OutLink] =
    LinkExtractor.outlinks(html.getBytes(UTF_8)).toSeq

  test("basic links: href, anchor text across child elements, order preserved") {
    val got = links(
      """<p><a href="/x">first</a> text <a href="/y"><b>bold</b> tail</a></p>""")
    assert(got === Seq(OutLink("/x", "first", nofollow = false),
      OutLink("/y", "bold tail", nofollow = false)))
  }

  test("entity decoding in href and anchor; whitespace trimmed") {
    val got = links("""<a href="/q?a=1&amp;b=2"> A &lt;&amp;&gt; B </a>""")
    assert(got === Seq(OutLink("/q?a=1&b=2", "A <&> B", nofollow = false)))
  }

  test("rel=nofollow (any position in the rel list, any case)") {
    val got = links(
      """<a href="/a" rel="nofollow">x</a><a href="/b" rel="noopener NOFOLLOW">y</a>
        |<a href="/c" rel="noopener">z</a>""".stripMargin)
    assert(got.map(l => l.href -> l.nofollow) ===
      Seq("/a" -> true, "/b" -> true, "/c" -> false))
  }

  test("unclosed <a> implicitly closes at the next <a> and at EOF (browser behavior)") {
    val got = links("""<a href="/1">one <a href="/2">two""")
    assert(got === Seq(OutLink("/1", "one", nofollow = false),
      OutLink("/2", "two", nofollow = false)))
  }

  test("href-less, empty-href and self-closing anchors") {
    val got = links("""<a name="top">not a link</a><a href="">empty</a>
      |<a href="/s"/>after<a href="/t">t</a>""".stripMargin)
    assert(got === Seq(OutLink("/s", "", nofollow = false),
      OutLink("/t", "t", nofollow = false)))
  }

  test("no phantom links from raw-text script/style content") {
    val got = links(
      """<script>var s = '<a href="/phantom">x</a>';</script>
        |<style>a[href="/sneak"]{color:red}</style>
        |<a href="/real">r</a>""".stripMargin)
    assert(got === Seq(OutLink("/real", "r", nofollow = false)))
  }

  test("anchor length cap and never-throws on damaged/binary input") {
    val long = "<a href=\"/l\">" + "word " * 1000
    val capped = LinkExtractor.outlinks(long.getBytes(UTF_8), maxAnchor = 64)
    assert(capped.length === 1 && capped(0).anchor.length <= 64)
    val rnd = new scala.util.Random(41)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      LinkExtractor.outlinks(b) // no throw
    }
    assert(LinkExtractor.outlinks(Array.emptyByteArray).isEmpty)
  }

  private def hd(html: String): LinkExtractor.HeadDirectives =
    LinkExtractor.headDirectives(html.getBytes(UTF_8))

  test("headDirectives: canonical link found in head, entity-decoded, first wins") {
    val d = hd("""<html><head><title>t</title>
      |<link rel="stylesheet" href="/s.css">
      |<link rel="canonical" href="/page?a=1&amp;b=2">
      |<link rel="canonical" href="/second"></head><body></body></html>""".stripMargin)
    assert(d === LinkExtractor.HeadDirectives(Some("/page?a=1&b=2"), false, false))
    // rel token list, any case
    assert(hd("""<head><link rel="alternate CANONICAL" href="/c"></head>""")
      .canonical === Some("/c"))
    // empty/absent href → None
    assert(hd("""<head><link rel="canonical" href=""></head>""").canonical === None)
    assert(hd("""<head><link rel="canonical"></head>""").canonical === None)
  }

  test("headDirectives: scan is head-bounded — body links/metas ignored") {
    assert(hd("""<head></head><body><link rel="canonical" href="/x">
      |<meta name="robots" content="noindex"></body>""".stripMargin) ===
      LinkExtractor.HeadDirectives(None, false, false))
    // close-of-head bounds it even without <body>
    assert(hd("""<head></head><link rel="canonical" href="/y">""").canonical === None)
  }

  test("headDirectives: robots meta bits union across tags; none = both") {
    assert(hd("""<head><meta name="robots" content="noindex, follow"></head>""") ===
      LinkExtractor.HeadDirectives(None, true, false))
    assert(hd("""<head><meta name="ROBOTS" content="NOFOLLOW"></head>""") ===
      LinkExtractor.HeadDirectives(None, false, true))
    assert(hd("""<head><meta name="robots" content="none"></head>""") ===
      LinkExtractor.HeadDirectives(None, true, true))
    assert(hd("""<head><meta name="robots" content="noindex">
      |<meta name="robots" content="nofollow"></head>""".stripMargin) ===
      LinkExtractor.HeadDirectives(None, true, true))
    // non-robots metas and index,follow don't set bits
    assert(hd("""<head><meta name="viewport" content="noindex">
      |<meta name="robots" content="index, follow"></head>""".stripMargin) ===
      LinkExtractor.HeadDirectives(None, false, false))
  }

  test("headDirectives: never throws on damaged/binary input; canonicalHref delegates") {
    val rnd = new scala.util.Random(47)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      LinkExtractor.headDirectives(b) // no throw
    }
    assert(LinkExtractor.headDirectives(Array.emptyByteArray) ===
      LinkExtractor.HeadDirectives(None, false, false))
    val h = """<head><link rel="canonical" href="/c"></head>"""
    assert(LinkExtractor.canonicalHref(h.getBytes(UTF_8)) === Some("/c"))
  }

  test("resolve: RFC 3986 merge against the planted base, crawlable edges only") {
    val base = "https://sub.example.org/dir/page.html?x=1"
    assert(UrlCanon.resolve(base, "/cat/3") ===
      Some("https://sub.example.org/cat/3"))
    assert(UrlCanon.resolve(base, "other.html") ===
      Some("https://sub.example.org/dir/other.html"))
    assert(UrlCanon.resolve(base, "../up") === Some("https://sub.example.org/up"))
    assert(UrlCanon.resolve(base, "?y=2") ===
      Some("https://sub.example.org/dir/page.html?y=2"))
    assert(UrlCanon.resolve(base, "//cdn.example.net/a.js") ===
      Some("https://cdn.example.net/a.js"))
    assert(UrlCanon.resolve(base, "HTTP://OTHER.example/P") ===
      Some("http://other.example/P"))
    // no crawlable edge: fragment-only, empty, non-http schemes, garbage
    assert(UrlCanon.resolve(base, "#sec") === None)
    assert(UrlCanon.resolve(base, "") === None)
    assert(UrlCanon.resolve(base, "mailto:x@example.org") === None)
    assert(UrlCanon.resolve(base, "javascript:void(0)") === None)
    assert(UrlCanon.resolve(base, "data:text/plain,hi") === None)
    assert(UrlCanon.resolve(base, "ht tp://broken") === None)
    assert(UrlCanon.resolve("not a url", "/x") === None)
    // never throws, result always canonical (idempotence through resolve)
    val rnd = new scala.util.Random(43)
    val chars = "ab/.:?#%&= \n".toCharArray
    (0 until 2000).foreach { _ =>
      val ref = Seq.fill(rnd.nextInt(12))(chars(rnd.nextInt(chars.length))).mkString
      UrlCanon.resolve(base, ref).foreach { abs =>
        assert(UrlCanon.canonicalize(abs) === abs, s"non-canonical for ref '$ref'")
      }
    }
  }
}
