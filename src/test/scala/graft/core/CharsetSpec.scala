package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class CharsetSpec extends AnyFunSuite {

  test("meta charset variants") {
    assert(CharsetSniffer.sniff(
      "<html><head><meta charset=\"GBK\">".getBytes) === Some("gbk"))
    assert(CharsetSniffer.sniff(
      "<meta charset=utf-8>".getBytes) === Some("utf-8"))
    assert(CharsetSniffer.sniff(
      ("<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=ISO-8859-1\">").getBytes) === Some("iso-8859-1"))
    assert(CharsetSniffer.sniff("<html>no declaration".getBytes) === None)
    assert(CharsetSniffer.sniff("charset please".getBytes) === None)
  }

  test("charset outside a meta tag does not trigger") {
    assert(CharsetSniffer.sniff(
      "<!-- charset=iso-8859-1 --><p>utf8 text</p>".getBytes) === None)
    assert(CharsetSniffer.sniff(
      "<form accept-charset=\"iso-8859-1\">x</form>".getBytes) === None)
    assert(CharsetSniffer.sniff(
      "<script>var charset='koi8-r';</script>".getBytes) === None)
    // ...but a meta later in the window still wins
    assert(CharsetSniffer.sniff(
      "<!-- charset=junk --><meta charset=gbk>".getBytes) === Some("gbk"))
  }

  test("BOMs") {
    assert(CharsetSniffer.sniff(
      Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte, 'x')) === Some("UTF-8"))
    assert(CharsetSniffer.sniff(
      Array(0xFE.toByte, 0xFF.toByte, 0, 'x')) === Some("UTF-16BE"))
  }

  test("toUtf8 transcodes Latin-1 so the scanner extracts correct text") {
    val html = "<meta charset=iso-8859-1><p>café über</p>"
    val latin1 = html.getBytes(StandardCharsets.ISO_8859_1)
    // raw Latin-1 bytes are NOT valid UTF-8 for the accented chars
    val viaSniffer = CharsetSniffer.toUtf8(latin1)
    val r = Extractor.extractBytes(viaSniffer)
    assert(r.text === "café über")
    // unknown charset / already-utf8: bytes pass through unchanged
    assert(CharsetSniffer.toUtf8("<meta charset=bogus-enc-9>x".getBytes) sameElements
      "<meta charset=bogus-enc-9>x".getBytes)
  }

  test("charset word in an earlier attribute value does not mask the real declaration") {
    // the first "charset" occurrence inside the tag is not followed by '=',
    // but the real declaration later in the SAME tag must still win
    assert(CharsetSniffer.sniff(
      "<meta content=\"charset info\" charset=gbk>".getBytes) === Some("gbk"))
    assert(CharsetSniffer.sniff(
      "<meta name=\"charset-hint\" content=\"text/html; charset=ISO-8859-1\">".getBytes)
      === Some("iso-8859-1"))
  }

  test("UTF-16 BOM is consumed on transcode; UTF-8 BOM stripped on passthrough") {
    val html = "<p>hi</p>"
    // UTF-16 with BOM (String.getBytes("UTF-16") emits a BE BOM)
    val be = html.getBytes("UTF-16")
    val outBe = CharsetSniffer.toUtf8(be)
    assert(new String(outBe, StandardCharsets.UTF_8) === html,
      "no U+FEFF may survive the transcode")
    assert(Extractor.extractBytes(outBe).text === "hi")
    // explicit LE BOM
    val leBody = html.getBytes(StandardCharsets.UTF_16LE)
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ leBody
    assert(new String(CharsetSniffer.toUtf8(le), StandardCharsets.UTF_8) === html)
    // UTF-8 BOM: passthrough must drop the 3 BOM bytes
    val u8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      html.getBytes(StandardCharsets.UTF_8)
    assert(new String(CharsetSniffer.toUtf8(u8), StandardCharsets.UTF_8) === html)
  }

  test("meta-declared utf-16 on BOM-less bytes passes through (WHATWG rule)") {
    // mislabeled page: ASCII bytes declaring utf-16le — a UTF-16 decode
    // would turn every byte pair into a CJK char; WHATWG maps the
    // declaration to UTF-8, so bytes must pass through unchanged
    for (decl <- Seq("utf-16le", "utf-16be", "utf-16", "utf16", "unicode")) {
      val raw = s"<meta charset=$decl><p>plain ascii</p>"
        .getBytes(StandardCharsets.US_ASCII)
      assert(CharsetSniffer.toUtf8(raw) sameElements raw, s"decl=$decl")
      assert(Extractor.extractBytes(CharsetSniffer.toUtf8(raw)).text === "plain ascii")
    }
  }

  test("never throws on garbage") {
    val r = new scala.util.Random(11)
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](r.nextInt(300))
      r.nextBytes(b)
      CharsetSniffer.toUtf8(b)
    }
  }
}
