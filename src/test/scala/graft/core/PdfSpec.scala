package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PdfSynth

/** PDF text extraction: synthesized structurally-complete PDFs (raw and
  * FlateDecode content streams) must round-trip their known text; arbitrary
  * garbage must never throw.
  */
class PdfSpec extends AnyFunSuite {

  test("raw content stream round-trips the synthesized text") {
    (0L until 50L).foreach { id =>
      val got = PdfTextScanner.extractText(PdfSynth.pdfFor(id, flate = false))
      assert(got === PdfSynth.textFor(id), s"id=$id")
    }
  }

  test("FlateDecode content stream round-trips the synthesized text") {
    (0L until 50L).foreach { id =>
      val got = PdfTextScanner.extractText(PdfSynth.pdfFor(id, flate = true))
      assert(got === PdfSynth.textFor(id), s"id=$id flate")
    }
  }

  test("escapes, hex strings, TJ arrays, quote operators") {
    def pdfWith(content: String): Array[Byte] = {
      val c = content.getBytes("ISO-8859-1")
      (s"%PDF-1.4\n4 0 obj\n<< /Length ${c.length} >>\nstream\n" +
        content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    }
    assert(PdfTextScanner.extractText(pdfWith(
      "BT (a\\(b\\)c \\\\ \\101) Tj ET")) === "a(b)c \\ A\n")
    assert(PdfTextScanner.extractText(pdfWith(
      "BT <48656C6C6F> Tj ET")) === "Hello\n")
    assert(PdfTextScanner.extractText(pdfWith(
      "BT [(ker) -20 (ned)] TJ ET")) === "kerned\n")
    assert(PdfTextScanner.extractText(pdfWith(
      "BT (line1) Tj (line2) ' ET")) === "line1\nline2\n")
    assert(PdfTextScanner.extractText(pdfWith(
      "BT (par one) Tj 0 -14 Td (par two) Tj ET")) === "par one\npar two\n")
  }

  test("inline marked-content dict inside BT is skipped, not read as hex") {
    def pdfWith(content: String): Array[Byte] = {
      val c = content.getBytes("ISO-8859-1")
      (s"%PDF-1.4\n4 0 obj\n<< /Length ${c.length} >>\nstream\n" +
        content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    }
    assert(PdfTextScanner.extractText(pdfWith(
      "BT /P <</MCID 0>> BDC (Hello) Tj EMC ET")) === "Hello\n")
    assert(PdfTextScanner.extractText(pdfWith(
      "BT /P <</T (s>>neaky)>> BDC (World) Tj ET")) === "World\n")
  }

  test("nested /DecodeParms dict does not hide /FlateDecode") {
    val raw = "BT (deep) Tj ET".getBytes("ISO-8859-1")
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf); d.end()
    val data = java.util.Arrays.copyOf(buf, n)
    val head = (s"%PDF-1.4\n4 0 obj\n<< /Filter /FlateDecode " +
      s"/DecodeParms << /Foo 1 >> /Length $n >>\nstream\n").getBytes("ISO-8859-1")
    val tail = "\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1")
    assert(PdfTextScanner.extractText(head ++ data ++ tail) === "deep\n")
  }

  test("/Length is authoritative: wide flate sweep (incl. 0x0D-final data)") {
    // 300 ids: several compressed payloads naturally end with 0x0D/0x0A,
    // which the EOL-trim fallback would truncate were /Length not honored
    (50L until 350L).foreach { id =>
      val got = PdfTextScanner.extractText(PdfSynth.pdfFor(id, flate = true))
      assert(got === PdfSynth.textFor(id), s"id=$id flate sweep")
    }
  }

  test("non-PDF and garbage bytes never throw, return empty for non-PDF") {
    assert(PdfTextScanner.extractText("not a pdf".getBytes) === "")
    assert(PdfTextScanner.extractText(Array.emptyByteArray) === "")
    val r = new scala.util.Random(3)
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](r.nextInt(400))
      r.nextBytes(b)
      // force the PDF path on random bytes too
      val withHeader = "%PDF-1.4\n".getBytes ++ b
      PdfTextScanner.extractText(withHeader) // must not throw
    }
  }
}
