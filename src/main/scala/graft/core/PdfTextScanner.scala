package graft.core

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Minimal, dependency-free PDF text extraction — the "PDF/layout parse"
  * leg of the north_rule's extraction triple (HTML boilerplate strip,
  * PDF/layout parse, DOM heuristics). Built from scratch on the public PDF
  * 1.7 spec (ISO 32000-1), same single-pass ethos as [[HtmlScanner]].
  *
  * Supported subset (documented, deterministic):
  *  - content streams located by scanning `stream`/`endstream` keywords
  *    (no xref/object graph walk — robust to damaged files, like the HTML
  *    scanner is to tag soup);
  *  - `/FlateDecode` streams inflated via `java.util.zip.Inflater` (the
  *    overwhelmingly common filter); other filters and encrypted files are
  *    skipped;
  *  - text operators inside `BT … ET`: `Tj`, `'`, `"` (show string), `TJ`
  *    (array show, kerning numbers ignored), with full PDF string syntax —
  *    nested parens, escapes (\\n \\r \\t \\b \\f \\( \\) \\\\, octal,
  *    line continuations) and hex strings `<…>` (Latin-1 interpreted);
  *  - layout: `Td`/`TD`/`T*` line moves and `'`/`"` start a new output
  *    line; BT blocks are separated by newlines. Font CMaps/encodings are
  *    out of scope — bytes are treated as Latin-1 (correct for the
  *    standard-encoding ASCII text that dominates real corpora).
  *
  * Never throws on arbitrary bytes (fuzz-tested like the HTML scanner).
  */
object PdfTextScanner {

  def isPdf(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' &&
      b(3) == 'F' && b(4) == '-'

  /** Extract text from all content streams, in file order. */
  def extractText(pdf: Array[Byte]): String = {
    if (!isPdf(pdf)) return ""
    val out = new java.lang.StringBuilder(256)
    var from = 0
    var guard = 0
    while (from < pdf.length && guard < 100000) {
      guard += 1
      val si = indexOf(pdf, from, "stream")
      if (si < 0) { from = pdf.length }
      else {
        // stream data starts after "stream" + EOL
        var ds = si + 6
        if (ds < pdf.length && pdf(ds) == '\r') ds += 1
        if (ds < pdf.length && pdf(ds) == '\n') ds += 1
        val de = indexOf(pdf, ds, "endstream")
        if (de < 0) { from = pdf.length }
        else {
          // the stream's dict: walk BACKWARD balanced over '<<'/'>>' so a
          // nested dict (e.g. /DecodeParms <<...>>) can't hide the filter
          val dictStart = dictStartBefore(pdf, si)
          val flate = dictStart >= 0 &&
            indexOf(pdf, dictStart, si, "/FlateDecode") >= 0
          // /Length is authoritative when it parses as a plain integer —
          // EOL-stripping heuristics can eat a real trailing 0x0D of the
          // compressed data otherwise
          val lengthVal =
            if (dictStart >= 0) parseLength(pdf, dictStart, si) else -1
          val dataEnd =
            if (lengthVal >= 0 && ds + lengthVal <= de) ds + lengthVal
            else trimEol(pdf, ds, de)
          val data = slice(pdf, ds, dataEnd)
          val content = if (flate) inflate(data) else data
          if (content.length > 0) appendTextOps(content, out)
          from = de + 9
        }
      }
    }
    out.toString
  }

  // ---- content-stream text operators ----

  private def appendTextOps(c: Array[Byte], out: java.lang.StringBuilder): Unit = {
    var i = 0
    val n = c.length
    var inText = false
    val startLen = out.length
    var lineHasText = false

    def newline(): Unit =
      if (lineHasText) { out.append('\n'); lineHasText = false }

    while (i < n) {
      val b = c(i)
      if (!inText) {
        if (b == 'B' && i + 1 < n && c(i + 1) == 'T' && wordEnd(c, i + 2)) {
          inText = true; i += 2
        } else i += 1
      } else {
        b match {
          case 'E' if i + 1 < n && c(i + 1) == 'T' && wordEnd(c, i + 2) =>
            inText = false; newline(); i += 2
          case '(' =>
            val (s, ni) = pdfString(c, i)
            // lookahead for the operator after the string
            val op = nextOp(c, ni)
            if (op == "'" || op == "\"") newline()
            if (s.nonEmpty) { out.append(s); lineHasText = true }
            i = ni
          case '<' if i + 1 < n && c(i + 1) == '<' =>
            // inline dictionary (e.g. '/P <</MCID 0>> BDC'): skip balanced,
            // or its contents would be misread as hex strings/operators
            i = skipInlineDict(c, i)
          case '<' =>
            val (s, ni) = hexString(c, i)
            if (s.nonEmpty) { out.append(s); lineHasText = true }
            i = ni
          case 'T' if i + 1 < n =>
            val o = c(i + 1)
            if ((o == 'd' || o == 'D' || o == '*') && wordEnd(c, i + 2)) newline()
            i += 2
          // the ' and " show operators are handled by lookahead at their
          // string argument; the bare operator byte itself is a no-op here
          case _ => i += 1
        }
      }
    }
    if (out.length > startLen && lineHasText) out.append('\n')
  }

  /** PDF literal string starting at `(`: nested parens + escapes. */
  private def pdfString(c: Array[Byte], open: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder(32)
    var i = open + 1
    var depth = 1
    val n = c.length
    while (i < n && depth > 0) {
      c(i) match {
        case '\\' if i + 1 < n =>
          c(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' =>
              i += 2; if (i < n && c(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0
              var k = 0
              i += 1
              while (k < 3 && i < n && c(i) >= '0' && c(i) <= '7') {
                v = v * 8 + (c(i) - '0'); i += 1; k += 1
              }
              sb.append((v & 0xFF).toChar)
            case other => sb.append(other.toChar); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case ch => sb.append((ch & 0xFF).toChar); i += 1
      }
    }
    (sb.toString, i)
  }

  /** PDF hex string `<...>` → Latin-1 chars; odd final digit padded with 0. */
  private def hexString(c: Array[Byte], open: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder(16)
    var i = open + 1
    val n = c.length
    var hi = -1
    while (i < n && c(i) != '>') {
      val d = hexVal(c(i))
      if (d >= 0) {
        if (hi < 0) hi = d
        else { sb.append(((hi << 4) | d).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar)
    (sb.toString, math.min(i + 1, n))
  }

  @inline private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  /** The next operator token after position i (skipping ws/numbers/brackets). */
  private def nextOp(c: Array[Byte], from: Int): String = {
    var i = from
    val n = c.length
    while (i < n) {
      val b = c(i)
      if (b == ' ' || b == '\t' || b == '\r' || b == '\n' ||
          (b >= '0' && b <= '9') || b == '-' || b == '.' ||
          b == ']' || b == '[') i += 1
      else if (b == '\'') return "'"
      else if (b == '"') return "\""
      else if (b == '(') return "(" // another string in a TJ array
      else if (b == '<') return "<"
      else {
        val s = i
        var j = i
        while (j < n && j < i + 2 &&
          ((c(j) >= 'A' && c(j) <= 'Z') || (c(j) >= 'a' && c(j) <= 'z') || c(j) == '*')) j += 1
        return new String(c, s, j - s, ISO_8859_1)
      }
    }
    ""
  }

  /** Skip a balanced inline `<< ... >>` dictionary starting at `open`. */
  private def skipInlineDict(c: Array[Byte], open: Int): Int = {
    var i = open + 2
    var depth = 1
    val n = c.length
    while (i < n && depth > 0) {
      if (c(i) == '<' && i + 1 < n && c(i + 1) == '<') { depth += 1; i += 2 }
      else if (c(i) == '>' && i + 1 < n && c(i + 1) == '>') { depth -= 1; i += 2 }
      else if (c(i) == '(') i = pdfString(c, i)._2 // strings may contain >>
      else i += 1
    }
    i
  }

  @inline private def wordEnd(c: Array[Byte], i: Int): Boolean =
    i >= c.length || !((c(i) >= 'A' && c(i) <= 'Z') || (c(i) >= 'a' && c(i) <= 'z'))

  // ---- byte utilities ----

  private def indexOf(b: Array[Byte], from: Int, s: String): Int =
    indexOf(b, from, b.length, s)

  private def indexOf(b: Array[Byte], from: Int, until: Int, s: String): Int = {
    if (s.isEmpty) return from
    val first = s.charAt(0).toByte
    var i = math.max(from, 0)
    val last = math.min(until, b.length) - s.length
    while (i <= last) {
      if (b(i) == first) {
        var j = 1
        while (j < s.length && b(i + j) == s.charAt(j)) j += 1
        if (j == s.length) return i
      }
      i += 1
    }
    -1
  }

  /** Start of the dict whose `>>` immediately precedes `before` — backward
    * scan balancing nested `<< >>` pairs; -1 if unbalanced/absent.
    */
  private def dictStartBefore(b: Array[Byte], before: Int): Int = {
    var i = math.min(before, b.length) - 2
    var depth = 0
    while (i >= 0) {
      if (b(i) == '>' && b(i + 1) == '>') { depth += 1; i -= 2 }
      else if (b(i) == '<' && b(i + 1) == '<') {
        depth -= 1
        if (depth == 0) return i
        i -= 2
      } else i -= 1
    }
    -1
  }

  /** `/Length N` with a plain integer N inside [from, until); -1 when
    * absent or an indirect reference (`N 0 R`).
    */
  private def parseLength(b: Array[Byte], from: Int, until: Int): Int = {
    val k = indexOf(b, from, until, "/Length")
    if (k < 0) return -1
    var i = k + 7
    while (i < until && (b(i) == ' ' || b(i) == '\r' || b(i) == '\n')) i += 1
    var v = 0L
    val s = i
    while (i < until && b(i) >= '0' && b(i) <= '9' && v < Int.MaxValue) {
      v = v * 10 + (b(i) - '0'); i += 1
    }
    if (i == s || v > Int.MaxValue) return -1
    // indirect reference "N 0 R" → not a literal length
    var j = i
    while (j < until && b(j) == ' ') j += 1
    val indirect = j + 2 < until && b(j) >= '0' && b(j) <= '9'
    if (indirect) -1 else v.toInt
  }

  /** Fallback when /Length is absent: strip at most ONE EOL separator
    * before `endstream` ("\r\n" | "\n" | "\r") — never a second byte that
    * might be real stream data.
    */
  private def trimEol(b: Array[Byte], ds: Int, de: Int): Int = {
    var e = de
    if (e > ds && b(e - 1) == '\n') {
      e -= 1
      if (e > ds && b(e - 1) == '\r') e -= 1 // the "\r\n" pair
    } else if (e > ds && b(e - 1) == '\r') e -= 1
    e
  }

  private def slice(b: Array[Byte], s: Int, e: Int): Array[Byte] =
    if (e <= s) Array.emptyByteArray
    else java.util.Arrays.copyOfRange(b, s, e)

  /** zlib-inflate; on any corruption returns what decoded so far. */
  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ArrayBuffer[Byte](data.length * 4)
    val chunk = new Array[Byte](8192)
    try {
      var n = 1
      var guard = 0
      while (n > 0 && !inf.finished() && guard < 100000) {
        n = inf.inflate(chunk)
        var i = 0
        while (i < n) { out += chunk(i); i += 1 }
        if (n == 0 && inf.needsInput()) n = -1 // truncated input
        guard += 1
      }
    } catch { case _: Exception => /* corrupted: keep partial output */ }
    finally inf.end()
    out.toArray
  }
}
