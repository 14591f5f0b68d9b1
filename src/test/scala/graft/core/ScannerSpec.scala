package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Fixture replay for the scanner — FIXTURES.md §4 is the operative spec
  * (reference mount empty, SURVEY.md §0). Expected dumps are hand-computed
  * and pin every observable semantic; golden files under
  * src/test/resources/fixtures mirror these.
  */
class ScannerSpec extends AnyFunSuite {

  private def dump(html: String): String =
    HNode.dump(HtmlScanner.parseString(html))

  test("F-01 plain tags + text") {
    assert(dump("<p>Hello <b>world</b>!</p>") ===
      """START(p) @0,3
        |TEXT("Hello ") @3,9
        |START(b) @9,12
        |TEXT("world") @12,17
        |CLOSE(b) @17,21
        |TEXT("!") @21,22
        |CLOSE(p) @22,26""".stripMargin)
  }

  test("F-02 attributes: double/single/unquoted/bare, order preserved") {
    val html = """<a href="x.htm" title='t' data-k=v checked>y</a>"""
    val nodes = HtmlScanner.parseString(html)
    assert(nodes(0).render ===
      "START(a){href=\\\"x.htm\\\" title='t' data-k=v checked} @0,43")
    assert(nodes(1).render === "TEXT(\"y\") @43,44")
    assert(nodes(2).render === "CLOSE(a) @44,48")
    val attrs = nodes(0).attrs
    assert(attrs.toList === List(
      HAttr("href", "x.htm"), HAttr("title", "t"),
      HAttr("data-k", "v"), HAttr("checked", null)))
    // case-insensitive first-match lookup (A12)
    assert(nodes(0).attr("HREF") === Some("x.htm"))
    assert(nodes(0).attr("checked") === None) // bare attr has null value
    assert(nodes(0).attr("missing") === None)
  }

  test("F-03 self-closing: flag set, no synthetic close node") {
    assert(dump("<br/> <img src=a.png />") ===
      """START(br)[self] @0,5
        |TEXT(" ") @5,6
        |START(img)[self]{src=a.png} @6,23""".stripMargin)
  }

  test("F-04 comments, incl. unterminated to EOF") {
    assert(dump("a<!-- hi -->b") ===
      """TEXT("a") @0,1
        |REMARKS(" hi ") @1,12
        |TEXT("b") @12,13""".stripMargin)
    assert(dump("a<!-- hi") ===
      """TEXT("a") @0,1
        |REMARKS(" hi") @1,8""".stripMargin)
  }

  test("F-05 CDATA: one content node, inner verbatim, '<' inside not a tag") {
    assert(dump("<![CDATA[ x < y && z ]]>") ===
      """TEXT(" x < y && z ")[cdata] @0,24""")
  }

  test("F-06 script raw-text: inner is ONE text node, no tags parsed") {
    assert(dump("""<script>if(a<b){d.write("<p>no</p>")}</script>""") ===
      """START(script) @0,8
        |TEXT("if(a<b){d.write(\"<p>no</p>\")}") @8,37
        |CLOSE(script) @37,46""".stripMargin)
  }

  test("F-07 style raw-text") {
    assert(dump("<style>a>b{color:red}</style>") ===
      """START(style) @0,7
        |TEXT("a>b{color:red}") @7,21
        |CLOSE(style) @21,29""".stripMargin)
  }

  test("F-08 malformed tags never throw; classification pinned") {
    assert(dump("<p <b>x") ===
      """START(p){<b} @0,6
        |TEXT("x") @6,7""".stripMargin)
    assert(dump("< notatag") === """TEXT("< notatag") @0,9""")
    assert(dump("<>") === """TEXT("<>") @0,2""")
    assert(dump("""<a href=">y""") ===
      """START(a){href=\"} @0,10
        |TEXT("y") @10,11""".stripMargin)
  }

  test("F-09 doctype / PI consumed to '>' as Remarks") {
    assert(dump("<!DOCTYPE html><?xml v?>") ===
      """REMARKS("DOCTYPE html") @0,15
        |REMARKS("xml v?") @15,24""".stripMargin)
  }

  test("F-10 unclosed elements: opens as seen, no synthesized closes") {
    assert(dump("<div><p>a<div>b") ===
      """START(div) @0,5
        |START(p) @5,8
        |TEXT("a") @8,9
        |START(div) @9,14
        |TEXT("b") @14,15""".stripMargin)
  }

  test("F-11 tag-name truncation at 15 bytes; scan consumes to real '>'") {
    assert(dump("<averyveryverylongtagname attr=1>") ===
      """START(averyveryverylo){attr=1} @0,33""")
  }

  test("F-12 case-insensitive raw-text close + tag id; case preserved") {
    assert(dump("<SCRIPT>x</ScRiPt><A HREF=1></A>") ===
      """START(SCRIPT) @0,8
        |TEXT("x") @8,9
        |CLOSE(ScRiPt) @9,18
        |START(A){HREF=1} @18,28
        |CLOSE(A) @28,32""".stripMargin)
  }

  test("F-13 entity decoding: pinned set + numeric; unknown verbatim") {
    assert(Entities.decode("a &lt;b&gt; &amp;&quot; &nbsp; &#65;&#x42; &unknown;")
      === "a <b> &\" \u00A0 AB &unknown;") // nbsp decodes to U+00A0
    assert(Entities.decode("no entities") === "no entities")
    assert(Entities.decode("&") === "&")
    assert(Entities.decode("&amp") === "&amp")           // unterminated
    assert(Entities.decode("&#;") === "&#;")             // empty numeric
    assert(Entities.decode("&#x;") === "&#x;")
    assert(Entities.decode("&#1114112;") === "&#1114112;") // > MAX_CODE_POINT
    assert(Entities.decode("&#x1F642;") === "🙂") // emoji
  }

  test("F-14 UTF-8 multibyte: spans are BYTE offsets") {
    val html = "<p>你好 🙂</p>" // <p>你好 🙂</p>
    assert(dump(html) ===
      "START(p) @0,3\n" +
      "TEXT(\"你好 🙂\") @3,14\n" +
      "CLOSE(p) @14,18")
  }

  test("F-14b invalid UTF-8 decodes deterministically to replacement") {
    val bytes = Array[Byte]('<', 'p', '>', 0xC3.toByte, '<', '/', 'p', '>')
    val nodes = HtmlScanner.parse(bytes)
    assert(nodes.map(_.nodeType).toList ===
      List(NodeType.StartTag, NodeType.Content, NodeType.CloseTag))
    assert(nodes(1).text === "�")
    assert((nodes(1).start, nodes(1).end) === (3, 4))
  }

  test("F-15 empty / degenerate inputs") {
    assert(HtmlScanner.parseString("").isEmpty)
    assert(dump("<") === """TEXT("<") @0,1""")
    assert(dump("a") === """TEXT("a") @0,1""")
    assert(dump(" \n ") === "TEXT(\" \\n \") @0,3")
  }

  test("F-16 early stop: visitor aborting after 3 nodes stops the scan") {
    val got = scala.collection.mutable.ArrayBuffer[HNode]()
    val emitted = HtmlScanner.scan(
      "<p>Hello <b>world</b>!</p>".getBytes("UTF-8")) { n =>
      got += n
      got.length < 3
    }
    assert(emitted === 3)
    assert(got.map(_.render).toList === List(
      "START(p) @0,3", "TEXT(\"Hello \") @3,9", "START(b) @9,12"))
  }

  test("F-17 lazy and eager attribute parse agree") {
    val html = """<a href="x.htm" title='t' data-k=v checked>y</a>"""
    val lazyN = HtmlScanner.parseString(html, eagerAttrs = false)
    val eagerN = HtmlScanner.parseString(html, eagerAttrs = true)
    assert(!lazyN(0).attrsParsed)
    assert(eagerN(0).attrsParsed)
    assert(lazyN(0).attrs.toList === eagerN(0).attrs.toList)
  }

  test("raw-text unterminated: inner runs to EOF, no close node") {
    assert(dump("<script>var x=1;") ===
      """START(script) @0,8
        |TEXT("var x=1;") @8,16""".stripMargin)
  }

  test("self-closing script does not enter raw-text mode") {
    assert(dump("<script/><p>a</p>") ===
      """START(script)[self] @0,9
        |START(p) @9,12
        |TEXT("a") @12,13
        |CLOSE(p) @13,17""".stripMargin)
  }

  test("</scriptx> does not terminate raw-text; </script > does") {
    assert(dump("<script>a</scriptx>b</script >c") ===
      """START(script) @0,8
        |TEXT("a</scriptx>b") @8,20
        |CLOSE(script) @20,30
        |TEXT("c") @30,31""".stripMargin)
  }
}
