package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The full WHATWG named-entity table (resource-generated, 2 125 canonical
  * `name;` forms): long-tail names, multi-codepoint values, control-char
  * values — and the pinned 5-entity default staying untouched.
  */
class EntitiesSpec extends AnyFunSuite {

  private def ext(s: String) = Entities.decode(s, extended = true)

  test("long-tail names real crawl text hits decode in extended mode") {
    assert(ext("&oelig;&scaron;&alpha;") === "œšα")
    assert(ext("&CounterClockwiseContourIntegral;") === "∳")
    assert(ext("&Auml; vs &auml;") === "Ä vs ä", "names are case-sensitive")
    assert(ext("caf&eacute; &mdash; &hellip;") === "café — …")
  }

  test("multi-codepoint entities append every codepoint") {
    assert(ext("&NotEqualTilde;") === "≂̸")
    assert(ext("&fjlig;") === "fj")
    assert(ext("&ThickSpace;") === "\u205F\u200A")
  }

  test("control-char values (the reason the resource stores hex codepoints)") {
    assert(ext("a&Tab;b&NewLine;c") === "a\tb\nc")
  }

  test("unknown and unterminated names stay verbatim even in extended mode") {
    assert(ext("&bogusname; &amp x &oelig") === "&bogusname; &amp x &oelig")
  }

  test("pinned default is unaffected by the full table") {
    val s = "&copy; &oelig; &lt;&gt;&amp;&quot;&nbsp; &#65;&#x42;"
    assert(Entities.decode(s) === "&copy; &oelig; <>&\"\u00A0 AB")
  }
}
