package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Extraction fixtures — FIXTURES.md §5 (boilerplate strip). */
class ExtractorSpec extends AnyFunSuite {

  private def text(html: String): String = Extractor.extractString(html).text

  test("E-01 link-density drops nav/footer link lists; body kept byte-exact") {
    val html =
      """<html><head><title>T</title></head><body>
        |<nav><a href=1>Home</a> <a href=2>About</a></nav>
        |<div><a href=x>L1</a> <a href=y>L2</a> <a href=z>L3</a></div>
        |<article><p>Real content &amp; more.</p><p>Second para with <a href=q>one link</a> inside lots of words here.</p></article>
        |<footer><a href=3>Contact</a></footer>
        |</body></html>""".stripMargin
    val got = text(html)
    assert(got.contains("Real content & more."))
    assert(got.contains("Second para with one link inside lots of words here."))
    assert(!got.contains("Home"))    // nav dropped by tag
    assert(!got.contains("Contact")) // footer dropped by tag
    assert(!got.contains("L1"))      // pure link-list div dropped by density
    assert(!got.contains("T"))       // head subtree dropped
  }

  test("E-02 script/style content fully removed") {
    val html = "<body><script>var a=1;</script><style>p{}</style><p>keep</p></body>"
    assert(text(html) === "keep")
  }

  test("E-03 comments never in output; CDATA kept verbatim, not decoded") {
    val html = "<p>a<!-- secret -->b</p><p><![CDATA[x &amp; y]]></p>"
    val got = text(html)
    assert(got === "ab\nx &amp; y")
  }

  test("E-04 unclosed-div soup: stable, all content kept") {
    val html = "<div><p>a<div>b"
    assert(text(html) === "a\nb")
    // unbalanced closes of drop tags are ignored, not underflowed
    val html2 = "</script></nav><p>still here</p>"
    assert(text(html2) === "still here")
  }

  test("entity decoding applied to kept content") {
    assert(text("<p>a &lt; b &#65;</p>") === "a < b A")
  }

  test("ExtractConfig tunes the policy (keep nav, stricter link gate)") {
    val html = "<body><nav><p>menu item words here</p></nav>" +
      "<p>body text with <a href=x>link word</a> plus words</p></body>"
    val default = Extractor.extractString(html)
    assert(!default.text.contains("menu"), "default drops nav")
    val keepNav = Extractor.extractString(html,
      Extractor.ExtractConfig(dropTags = Extractor.DropTags - "nav"))
    assert(keepNav.text.contains("menu item words here"))
    val strict = Extractor.extractString(html,
      Extractor.ExtractConfig(maxLinkDensity = 0.05))
    assert(!strict.text.contains("body text"), "strict gate drops linky block")
  }

  test("spans point at raw content bytes of kept nodes") {
    val html = "<p>Hello</p><script>x</script><p>World</p>"
    val r = Extractor.extractString(html)
    assert(r.text === "Hello\nWorld")
    val fromSpans = r.spans.map(s => html.substring(s.start, s.end)).mkString
    assert(fromSpans === "HelloWorld")
    assert(r.nodeCount === 9)
  }

  test("blocks joined with single newline; whitespace-only blocks dropped") {
    val html = "<p>one</p>  \n  <p>two</p>"
    assert(text(html) === "one\ntwo")
  }

  test("rejected block with empty-decoding pieces leaks no spans") {
    // an empty CDATA before any kept text: the block is rejected (zero
    // non-ws chars) and its span must be rolled back — text=="" AND
    // spans==empty (the spans-compose-text invariant)
    val r = Extractor.extractString("<![CDATA[]]>")
    assert(r.text === "")
    assert(r.spans.isEmpty)
    // same inside a page with later kept content
    val r2 = Extractor.extractString("<p><![CDATA[]]></p><p>keep</p>")
    assert(r2.text === "keep")
    val composed = "<p><![CDATA[]]></p><p>keep</p>"
    assert(r2.spans.map(s => composed.substring(s.start, s.end)).mkString === "keep")
  }

  test("extended entities: opt-in decodes WHATWG-core names, default verbatim") {
    val html = "<p>&copy; 2024 &mdash; caf&eacute;&hellip; &bogus; &amp;</p>"
    // pinned default: only the 5-entity set decodes
    assert(text(html) === "&copy; 2024 &mdash; caf&eacute;&hellip; &bogus; &")
    val ext = Extractor.extractString(html,
      Extractor.ExtractConfig(extendedEntities = true))
    assert(ext.text === "© 2024 — café… &bogus; &")
  }

  test("E-05 giant page extracts correctly") {
    val paraText = "Some real sentence with enough words to keep. "
    val para = s"<p>$paraText</p>"
    val html = "<body>" + (para * 50000) + "</body>" // ~2.7 MB
    val r = Extractor.extractString(html)
    assert(r.text === List.fill(50000)(paraText).mkString("\n"))
    assert(r.nodeCount === 2 + 3 * 50000)
  }
}
