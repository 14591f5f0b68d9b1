package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property invariants — FIXTURES.md §6: on ARBITRARY bytes the scanner never
  * throws, and node spans are in-bounds, non-overlapping, monotonically
  * increasing, and cover every input byte. These invariants are what make
  * per-document parallelism safe: a document's parse depends only on its own
  * bytes, so output is independent of partitioning.
  *
  * (ScalaCheck driven directly — the scalatestplus bridge is not in the
  * offline resolver cache.)
  */
class ScannerPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val htmlish: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("<", ">", "</", "<!--", "-->", "<![CDATA[", "]]>", "<!",
        "<?", "\"", "'", "=", "/", " ", "\n", "&amp;", "&#65;", "&",
        "<p>", "</p>", "<script>", "</script>", "<br/>",
        "<a href=\"x\">", "</a>", "<div>", "</div>", "你", "🙂"))
    Gen.listOf(frag).map(_.mkString)
  }

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  private def spansOk(b: Array[Byte]): Boolean = {
    val nodes = HtmlScanner.parse(b)
    var pos = 0
    var ok = true
    nodes.foreach { n =>
      ok &&= (n.start == pos) && (n.end > n.start)
      pos = n.end
    }
    ok && pos == b.length &&
      nodes.zipWithIndex.forall { case (n, i) => n.idx == i }
  }

  test("arbitrary html-ish strings: never throws, spans cover input") {
    check("htmlish spans", Prop.forAll(htmlish)(s => spansOk(s.getBytes("UTF-8"))))
  }

  test("arbitrary raw bytes: never throws, spans cover input") {
    check("raw bytes spans", Prop.forAll(rawBytes)(spansOk))
  }

  test("lazy and eager attribute parsing agree on arbitrary input") {
    check("lazy==eager", Prop.forAll(htmlish) { s =>
      val l = HtmlScanner.parseString(s, eagerAttrs = false)
      val e = HtmlScanner.parseString(s, eagerAttrs = true)
      l.length == e.length && l.zip(e).forall { case (a, b) =>
        a.render == b.render && a.attrs.toList == b.attrs.toList
      }
    })
  }

  test("early stop after k nodes emits exactly min(k, total) nodes") {
    check("early stop", Prop.forAll(htmlish, Gen.chooseNum(0, 20)) { (s, k) =>
      val total = HtmlScanner.parseString(s).length
      var seen = 0
      HtmlScanner.scan(s.getBytes("UTF-8")) { _ => seen += 1; seen < k }
      val expected = math.min(math.max(k, if (total > 0) 1 else 0), total)
      seen == expected
    })
  }

  test("extractor is deterministic and spans are in-bounds") {
    check("extractor", Prop.forAll(htmlish) { s =>
      val bytes = s.getBytes("UTF-8")
      val r1 = Extractor.extractString(s)
      val r2 = Extractor.extractString(s)
      r1.text == r2.text && r1.spans.toList == r2.spans.toList &&
        r1.spans.forall(sp => sp.start >= 0 && sp.end <= bytes.length)
    })
  }

  test("fused streaming extraction equals the node-array path") {
    check("fused == array", Prop.forAll(htmlish) { s =>
      val bytes = s.getBytes("UTF-8")
      val fused = Extractor.extractBytes(bytes) // scan-visitor path
      val array = Extractor.extract(HtmlScanner.parse(bytes)) // array path
      fused.text == array.text &&
        fused.spans.toList == array.spans.toList &&
        fused.nodeCount == array.nodeCount
    })
  }

  test("lazy-count fast path equals always-exact counting") {
    check("fast == exact", Prop.forAll(htmlish) { s =>
      val fast = Extractor.extractString(s)
      val exact = Extractor.extractStringExact(s)
      fast.text == exact.text && fast.spans.toList == exact.spans.toList &&
        fast.nodeCount == exact.nodeCount
    })
  }

  test("entity decode never throws; idempotent when output has no '&'") {
    check("entities", Prop.forAll(htmlish) { s =>
      val d = Entities.decode(s)
      d.contains('&') || Entities.decode(d) == d
    })
  }
}
