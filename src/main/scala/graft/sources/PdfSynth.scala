package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** Deterministic synthetic single-page PDFs (structurally complete: header,
  * object table, content stream, xref with computed offsets, trailer) for
  * testing/benching the PDF leg — no external data, every byte derives from
  * the id. `flate` toggles /FlateDecode on the content stream.
  */
object PdfSynth {

  private val words = Array(
    "alpha", "beta", "gamma", "delta", "report", "table", "figure",
    "result", "method", "corpus", "sample", "metric", "spark", "engine")

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The text the synthesized PDF carries — the extraction oracle. */
  def textFor(id: Long): String = {
    val nLines = 3 + Math.floorMod(mix(id), 6L).toInt
    (0 until nLines).map { ln =>
      val nw = 4 + Math.floorMod(mix(id * 31 + ln), 5L).toInt
      (0 until nw).map(w =>
        words(Math.floorMod(mix(id ^ (ln * 131 + w)), words.length.toLong).toInt))
        .mkString(" ")
    }.mkString("\n") + "\n"
  }

  /** Content stream showing [[textFor]] line by line (Td line moves). */
  private def contentFor(id: Long): Array[Byte] = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("BT\n/F1 12 Tf\n72 720 Td\n")
    textFor(id).stripSuffix("\n").split('\n').zipWithIndex.foreach {
      case (line, i) =>
        if (i > 0) sb.append("0 -14 Td\n")
        sb.append('(').append(line.replace("\\", "\\\\")
          .replace("(", "\\(").replace(")", "\\)")).append(") Tj\n")
    }
    sb.append("ET")
    sb.toString.getBytes(ISO_8859_1)
  }

  def pdfFor(id: Long, flate: Boolean): Array[Byte] = {
    val raw = contentFor(id)
    val (data, filter) =
      if (flate) {
        val d = new Deflater()
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length * 2 + 64)
        val n = d.deflate(buf)
        d.end()
        (java.util.Arrays.copyOf(buf, n), "/Filter /FlateDecode ")
      } else (raw, "")

    val objs = Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n",
      s"4 0 obj\n<< ${filter}/Length ${data.length} >>\nstream\n" // + data + "\nendstream\nendobj\n"
    )
    val out = new java.io.ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = new Array[Int](6)
    objs.zipWithIndex.foreach { case (o, i) =>
      offsets(i + 1) = out.size()
      w(o)
      if (i == 3) { out.write(data, 0, data.length); w("\nendstream\nendobj\n") }
    }
    offsets(5) = out.size()
    w("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xref = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }
}
