package graft.core

/** HTML entity decoding (A13) — applied in the EXTRACTION stage, never in the
  * tokenizer, so raw node spans stay byte-exact (SURVEY.md §2.A A13).
  *
  * DEFAULT (reference-faithful, pinned by F-13): exactly `lt gt amp quot
  * nbsp` plus numeric `&#nnn;` / `&#xhh;`. Anything else (including a lone
  * `&` or an unterminated entity) is left verbatim.
  *
  * EXTENDED (opt-in, `extended = true` / `ExtractConfig(extendedEntities =
  * true)`): additionally decodes the WHATWG-core named entities real crawl
  * text actually hits (`&copy; &mdash; &rsquo; &hellip; …`). The default
  * stays the pinned 5-entity set so golden fixtures and byte-identity with
  * the reference are untouched; extraction consumers opt in per job.
  */
object Entities {

  /** Common named entities beyond the pinned five — a reimplemented subset
    * of the public WHATWG named-character-references table (most-frequent
    * names in web text; Latin-1 letters, punctuation, currency, arrows).
    */
  private val ExtendedNames: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    def p(k: String, v: String): Unit = m.put(k, v)
    p("apos", "'"); p("copy", "©"); p("reg", "®")
    p("trade", "™"); p("deg", "°"); p("plusmn", "±")
    p("frac12", "½"); p("frac14", "¼"); p("frac34", "¾")
    p("sup2", "²"); p("sup3", "³"); p("micro", "µ")
    p("para", "¶"); p("sect", "§"); p("middot", "·")
    p("laquo", "«"); p("raquo", "»")
    p("ndash", "–"); p("mdash", "—")
    p("lsquo", "‘"); p("rsquo", "’")
    p("ldquo", "“"); p("rdquo", "”")
    p("sbquo", "‚"); p("bdquo", "„")
    p("hellip", "…"); p("dagger", "†"); p("Dagger", "‡")
    p("permil", "‰"); p("prime", "′"); p("Prime", "″")
    p("lsaquo", "‹"); p("rsaquo", "›")
    p("bull", "•"); p("times", "×"); p("divide", "÷")
    p("cent", "¢"); p("pound", "£"); p("yen", "¥")
    p("euro", "€"); p("curren", "¤")
    p("iexcl", "¡"); p("iquest", "¿")
    p("szlig", "ß"); p("agrave", "à"); p("aacute", "á")
    p("acirc", "â"); p("atilde", "ã"); p("auml", "ä")
    p("aring", "å"); p("aelig", "æ"); p("ccedil", "ç")
    p("egrave", "è"); p("eacute", "é"); p("ecirc", "ê")
    p("euml", "ë"); p("igrave", "ì"); p("iacute", "í")
    p("icirc", "î"); p("iuml", "ï"); p("ntilde", "ñ")
    p("ograve", "ò"); p("oacute", "ó"); p("ocirc", "ô")
    p("otilde", "õ"); p("ouml", "ö"); p("oslash", "ø")
    p("ugrave", "ù"); p("uacute", "ú"); p("ucirc", "û")
    p("uuml", "ü"); p("yacute", "ý"); p("yuml", "ÿ")
    p("Auml", "Ä"); p("Ouml", "Ö"); p("Uuml", "Ü")
    p("shy", "­"); p("ensp", " "); p("emsp", " ")
    p("thinsp", " "); p("zwnj", "‌"); p("zwj", "‍")
    p("larr", "←"); p("uarr", "↑"); p("rarr", "→")
    p("darr", "↓"); p("harr", "↔")
    p("minus", "−"); p("infin", "∞"); p("ne", "≠")
    p("le", "≤"); p("ge", "≥"); p("asymp", "≈")
    m
  }

  def decode(s: String): String = decode(s, extended = false)

  def decode(s: String, extended: Boolean): String = {
    if (s == null) return null
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (amp >= 0) {
      sb.append(s, i, amp)
      val semi = indexOfSemi(s, amp + 1, n)
      var consumed = false
      if (semi > amp + 1) {
        val body = s.substring(amp + 1, semi)
        if (body.charAt(0) == '#') {
          val cp = parseNumeric(body)
          if (cp >= 0) { sb.appendCodePoint(cp); consumed = true }
        } else {
          body match {
            case "lt"   => sb.append('<'); consumed = true
            case "gt"   => sb.append('>'); consumed = true
            case "amp"  => sb.append('&'); consumed = true
            case "quot" => sb.append('"'); consumed = true
            case "nbsp" => sb.append('\u00A0'); consumed = true
            case _ =>
              if (extended) {
                val v = ExtendedNames.get(body)
                if (v != null) { sb.append(v); consumed = true }
              } // else unknown entity: verbatim (F-13)
          }
        }
      }
      if (consumed) i = semi + 1
      else { sb.append('&'); i = amp + 1 }
      amp = s.indexOf('&', i)
    }
    sb.append(s, i, n)
    sb.toString
  }

  /** `;` within the next 32 chars, else -1 (unterminated → verbatim). */
  private def indexOfSemi(s: String, from: Int, n: Int): Int = {
    var i = from
    val limit = math.min(n, from + 32)
    while (i < limit) {
      if (s.charAt(i) == ';') return i
      i += 1
    }
    -1
  }

  /** Parse `#nnn` / `#xhh` → code point, or -1 if invalid/out of range. */
  private def parseNumeric(body: String): Int = {
    try {
      val v =
        if (body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
          java.lang.Long.parseLong(body.substring(2), 16)
        else if (body.length > 1)
          java.lang.Long.parseLong(body.substring(1), 10)
        else -1L
      if (v > 0 && v <= Character.MAX_CODE_POINT &&
          !(v >= Character.MIN_SURROGATE && v <= Character.MAX_SURROGATE)) v.toInt
      else -1
    } catch { case _: NumberFormatException => -1 }
  }
}
