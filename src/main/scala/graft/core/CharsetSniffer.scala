package graft.core

import java.nio.charset.{Charset, StandardCharsets}

/** Charset detection for raw crawl bytes — BOM, then `<meta charset=…>` /
  * `<meta http-equiv="Content-Type" content="…; charset=…">` within the
  * first [[SniffWindow]] bytes (the WHATWG prescan approach, reimplemented
  * from the public spec).
  *
  * OPT-IN utility: the pipeline's pinned invariant is "scan bytes as UTF-8,
  * spans are byte offsets" (SURVEY.md §7) — byte-identity would not survive
  * silent transcoding. Callers targeting non-UTF-8 corpora transcode
  * explicitly up front:
  *   `CharsetSniffer.toUtf8(bytes)` → UTF-8 bytes for the scanner.
  */
object CharsetSniffer {

  final val SniffWindow = 1024

  /** Detected charset name, or None (callers default to UTF-8). */
  def sniff(b: Array[Byte]): Option[String] = {
    if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
        (b(2) & 0xFF) == 0xBF) return Some("UTF-8")
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      return Some("UTF-16BE")
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE)
      return Some("UTF-16LE")
    val n = math.min(b.length, SniffWindow)
    val head = new String(b, 0, n, StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    // only declarations INSIDE a <meta …> tag count — a bare "charset"
    // in a comment, script or accept-charset attribute must not trigger a
    // (corpus-corrupting) transcode
    var m = head.indexOf("<meta")
    while (m >= 0) {
      val tagEnd = head.indexOf('>', m) match {
        case -1 => head.length
        case e  => e
      }
      // try EVERY "charset" occurrence inside this tag: an earlier attribute
      // value may contain the word without being a declaration (e.g.
      // <meta content="charset info" charset=gbk>)
      var i = head.indexOf("charset", m)
      while (i >= 0 && i < tagEnd) {
        var j = i + 7
        while (j < tagEnd && head.charAt(j) == ' ') j += 1
        if (j < tagEnd && head.charAt(j) == '=') {
          j += 1
          while (j < tagEnd && head.charAt(j) == ' ') j += 1
          if (j < tagEnd && (head.charAt(j) == '"' || head.charAt(j) == '\'')) j += 1
          val s = j
          while (j < tagEnd && (head.charAt(j).isLetterOrDigit ||
              head.charAt(j) == '-' || head.charAt(j) == '_')) j += 1
          val name = head.substring(s, j)
          if (name.nonEmpty) return Some(name)
        }
        i = head.indexOf("charset", i + 7)
      }
      m = head.indexOf("<meta", m + 5)
    }
    None
  }

  /** Transcode to UTF-8 if a known non-UTF-8 charset is declared; bytes are
    * returned unchanged when already UTF-8(-declared), undetected, or the
    * declared charset is unknown to the JVM (never throws).
    */
  def toUtf8(b: Array[Byte]): Array[Byte] =
    sniff(b) match {
      case Some(name) if {
            val n = name.toLowerCase(java.util.Locale.ROOT)
            n.startsWith("utf-16") || n == "utf16" || n == "unicode"
          } =>
        // Only an ACTUAL BOM justifies a UTF-16 decode; a meta-DECLARED
        // utf-16 (any spelling: utf-16, utf-16le/be, utf16, unicode) on
        // BOM-less bytes is by construction wrong (the ASCII prescan found
        // the tag, so the bytes aren't UTF-16) — WHATWG maps such
        // declarations to UTF-8, i.e. pass through unchanged.
        val hasBom = b.length >= 2 &&
          (((b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF) ||
           ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE))
        if (!hasBom) b
        else
          // "UTF-16" (not the BE/LE variants) consumes the BOM — otherwise
          // U+FEFF re-encodes as EF BB BF and pollutes the first extracted
          // content block with a ZWNBSP.
          try new String(b, Charset.forName("UTF-16")).getBytes(StandardCharsets.UTF_8)
          catch { case _: Exception => b }
      case Some(name) if name.equalsIgnoreCase("utf-8") || name.equalsIgnoreCase("utf8") =>
        // strip a UTF-8 BOM on passthrough (same ZWNBSP hazard)
        if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
            (b(2) & 0xFF) == 0xBF) java.util.Arrays.copyOfRange(b, 3, b.length)
        else b
      case Some(name) =>
        try {
          val cs = Charset.forName(name)
          new String(b, cs).getBytes(StandardCharsets.UTF_8)
        } catch { case _: Exception => b }
      case _ => b
    }
}
