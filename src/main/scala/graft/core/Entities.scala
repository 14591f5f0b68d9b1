package graft.core

/** HTML entity decoding (A13) — applied in the EXTRACTION stage, never in the
  * tokenizer, so raw node spans stay byte-exact (SURVEY.md §2.A A13).
  *
  * DEFAULT (reference-faithful, pinned by F-13): exactly `lt gt amp quot
  * nbsp` plus numeric `&#nnn;` / `&#xhh;`. Anything else (including a lone
  * `&` or an unterminated entity) is left verbatim.
  *
  * EXTENDED (opt-in, `extended = true` / `ExtractConfig(extendedEntities =
  * true)`): additionally decodes the full WHATWG named-entity table. The
  * default stays the pinned 5-entity set so golden fixtures and
  * byte-identity with the reference are untouched; extraction consumers opt
  * in per job.
  */
object Entities {

  /** The FULL WHATWG named-character-references table (canonical `name;`
    * forms only — this decoder requires the terminating semicolon per the
    * pinned F-13 contract, so the spec's legacy semicolon-less names are
    * out of scope by design). Loaded from a packaged resource generated
    * off the public table (2 125 names, 93 of them multi-codepoint like
    * `&NotEqualTilde;` → U+2242 U+0338); values are stored as hex
    * codepoints because some entity values ARE tab/newline.
    */
  private lazy val ExtendedNames: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](4096)
    val in = getClass.getResourceAsStream("/graft/entities.tsv")
    require(in != null, "graft/entities.tsv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().foreach { line =>
        val tab = line.indexOf('\t')
        if (tab > 0) {
          val sb = new java.lang.StringBuilder(4)
          line.substring(tab + 1).split(',')
            .foreach(h => sb.appendCodePoint(Integer.parseInt(h, 16)))
          m.put(line.substring(0, tab), sb.toString)
        }
      }
    } finally src.close()
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
