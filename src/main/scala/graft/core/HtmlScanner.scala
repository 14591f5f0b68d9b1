package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** Node kind codes — numbering mirrors the reference enum
  * `HtmlNodeType { NODE_UNKNOWN, NODE_START_TAG, NODE_CLOSE_TAG, NODE_CONTENT,
  * NODE_REMARKS }` [R: HtmlParser.h · enum HtmlNodeType] so node dumps stay
  * comparable (SURVEY.md §1.2).
  */
object NodeType {
  final val Unknown: Byte  = 0
  final val StartTag: Byte = 1
  final val CloseTag: Byte = 2
  final val Content: Byte  = 3
  final val Remarks: Byte  = 4

  def name(t: Byte): String = t match {
    case StartTag => "START"
    case CloseTag => "CLOSE"
    case Content  => "TEXT"
    case Remarks  => "REMARKS"
    case _        => "UNKNOWN"
  }
}

/** One parsed attribute; `value == null` for bare attributes (`checked`),
  * matching the reference's `HtmlNodeProp { szName, szValue }` where szValue
  * may be NULL [R: HtmlParser.h · struct HtmlNodeProp].
  */
final case class HAttr(name: String, value: String)

/** One node of the flat per-document node array (no tree is ever built —
  * [R: HtmlParser.h · struct HtmlNode], SURVEY.md §1.2).
  *
  *  - `tagName`: truncated at [[HtmlScanner.MaxTagName]] bytes, source case
  *    preserved; empty for content/remarks nodes.
  *  - `text`: content text for Content/Remarks nodes; the RAW unparsed
  *    attribute string for StartTag nodes (pre lazy-parse, A3/A11).
  *  - `start`/`end`: BYTE offsets of this node's source span in the input.
  *    Spans of all nodes of a document are non-overlapping, monotonically
  *    increasing, and cover every input byte (property-tested).
  *  - `attrs`: lazily parsed on first access (reference entry point 3,
  *    SURVEY.md §3.3); eager when requested at parse time.
  */
final class HNode(
    val idx: Int,
    val nodeType: Byte,
    val tagName: String,
    src: Array[Byte],
    tStart: Int,
    tEnd: Int,
    val selfClosing: Boolean,
    val isCdata: Boolean,
    val start: Int,
    val end: Int,
    private var _attrs: Array[HAttr]) {

  private var _text: String = null

  /** Content/remarks text (raw attribute string for start tags), decoded
    * LAZILY from the source buffer on first access — the JVM analog of the
    * reference's pointer-into-arena nodes [R: HtmlParser.h · MemBuffer]:
    * content inside dropped subtrees (script/style/nav/…) is never
    * materialized as a String at all, which is most of the byte volume of
    * real pages. Idempotent; the 100 TB hot path touches it only for kept
    * blocks.
    */
  def text: String = {
    if (_text == null)
      _text =
        if (tEnd <= tStart) ""
        else new String(src, tStart, tEnd - tStart, UTF_8)
    _text
  }

  def attrsParsed: Boolean = _attrs != null

  /** Lazy, idempotent attribute parse [R: HtmlParser.cpp · parseNodeProps]. */
  def attrs: Array[HAttr] = {
    if (_attrs == null) _attrs = Attrs.parse(text)
    _attrs
  }

  /** First-match, case-insensitive attribute lookup
    * [R: HtmlParser.cpp · getNodePropStringValue].
    */
  def attr(name: String): Option[String] =
    attrs.find(_.name.equalsIgnoreCase(name)).flatMap(a => Option(a.value))

  def attrInt(name: String): Option[Int] =
    attr(name).flatMap(v => scala.util.Try(v.trim.toInt).toOption)

  /** One-line textual rendering, the golden-file / byte-identity canary
    * [R: HtmlParser.cpp · dumpHtmlNodes]. Format is pinned by
    * src/test/resources/fixtures/NN.nodes.
    */
  def render: String = {
    val sb = new StringBuilder(64)
    sb.append(NodeType.name(nodeType)).append('(')
    nodeType match {
      case NodeType.StartTag | NodeType.CloseTag => sb.append(tagName)
      case _ => sb.append('"').append(HNode.esc(text)).append('"')
    }
    sb.append(')')
    if (selfClosing) sb.append("[self]")
    if (isCdata) sb.append("[cdata]")
    if (nodeType == NodeType.StartTag && text.nonEmpty)
      sb.append('{').append(HNode.esc(text)).append('}')
    sb.append(" @").append(start).append(',').append(end)
    sb.toString
  }

  override def toString: String = render
}

object HNode {
  /** Span-based constructor (the scanner's path — zero text allocation). */
  def span(idx: Int, nodeType: Byte, tagName: String, src: Array[Byte],
           tStart: Int, tEnd: Int, selfClosing: Boolean, isCdata: Boolean,
           start: Int, end: Int, attrs: Array[HAttr] = null): HNode =
    new HNode(idx, nodeType, tagName, src, tStart, tEnd, selfClosing, isCdata,
      start, end, attrs)

  /** String-based constructor (tests / ad-hoc use). */
  def apply(idx: Int, nodeType: Byte, tagName: String, text: String,
            selfClosing: Boolean, isCdata: Boolean, start: Int, end: Int,
            attrs: Array[HAttr] = null): HNode = {
    val n = new HNode(idx, nodeType, tagName, null, 0, 0, selfClosing, isCdata,
      start, end, attrs)
    n._text = if (text == null) "" else text
    n
  }

  private[core] def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def dump(nodes: Array[HNode]): String = nodes.map(_.render).mkString("\n")
}

/** Single-pass, non-validating HTML tokenizer over raw bytes — a from-scratch
  * JVM re-expression of the reference's scanner
  * [R: HtmlParser.cpp · parseHtml + main scan loop] (SURVEY.md §2.A).
  *
  * Pure Scala, zero Spark imports: invoked per-row inside `mapPartitions`.
  * No regex, no backtracking; bounded lookahead only for `-->`, `]]>` and
  * `</script` / `</style` (A9). Invalid UTF-8 decodes to U+FFFD
  * deterministically (F-14).
  *
  * Semantics are pinned by FIXTURES.md §4 (the operative spec — the reference
  * mount was empty at survey time, SURVEY.md §0):
  *  - `<` followed by anything other than an ASCII letter, `/`, `!` or `?`
  *    is literal text (F-08, F-15).
  *  - tag names are ASCII letters/digits; `tagName` truncates at 15 bytes but
  *    the scan still consumes to the real tag end (F-11).
  *  - the rest-of-tag attribute string is kept RAW on the node; attribute
  *    parsing is lazy (F-17). Scan to `>` is quote-unaware (F-08 pins
  *    `<a href=">y` → START(a){href="} TEXT("y")).
  *  - trailing `/` sets the self-closing flag, no synthetic close node (F-03).
  *  - `<!-- -->` → Remarks; unterminated runs to EOF (F-04).
  *  - `<![CDATA[ ]]>` → one Content node flagged cdata, bytes verbatim (F-05).
  *  - other `<!…>` and `<?…>` → Remarks up to `>` (F-09).
  *  - after a non-self-closing `<script>`/`<style>`: raw-text mode — inner
  *    bytes become ONE Content node, terminated only by the case-insensitive
  *    matching close tag (F-06, F-07, F-12).
  */
object HtmlScanner {

  /** Reference pins MAX_HTML_TAG_LENGTH = 15 — observable behavior: longer
    * names truncate in output [R: HtmlParser.h · MAX_HTML_TAG_LENGTH].
    */
  final val MaxTagName = 15

  /** Interning table for common lowercase tag names: a scan of a real page
    * emits hundreds of tag nodes whose names are drawn from a tiny set;
    * returning the canonical String instead of allocating per node removes
    * the dominant small-allocation source in the hot loop. Case-preserving
    * semantics are kept — only exact (lowercase) byte matches intern.
    */
  private val InternedTags: Array[Array[String]] = {
    val names = Array(
      "a", "b", "i", "p", "u", "br", "hr", "td", "th", "tr", "ul", "ol",
      "li", "em", "h1", "h2", "h3", "h4", "h5", "h6", "div", "img", "pre",
      "nav", "dl", "dt", "dd", "span", "body", "html", "head", "form",
      "meta", "link", "code", "table", "tbody", "thead", "tfoot", "style",
      "title", "input", "label", "small", "script", "strong", "select",
      "option", "footer", "header", "button", "article", "section", "aside",
      "main", "figure", "iframe", "noscript", "blockquote", "textarea")
    val byLen = Array.fill(MaxTagName + 1)(Array.empty[String])
    names.groupBy(_.length).foreach { case (l, ns) => byLen(l) = ns }
    byLen
  }

  /** Tag name at b[from, from+len): interned common name or a fresh String. */
  private def tagNameOf(b: Array[Byte], from: Int, len: Int): String = {
    if (len <= MaxTagName) {
      val cands = InternedTags(len)
      var c = 0
      while (c < cands.length) {
        val s = cands(c)
        var i = 0
        var ok = true
        while (ok && i < len) {
          if (b(from + i) != s.charAt(i)) ok = false
          i += 1
        }
        if (ok) return s
        c += 1
      }
    }
    new String(b, from, len, UTF_8)
  }

  /** Tag identification (A10): the scanner itself only needs script/style to
    * drive raw-text mode; consumers extend via the `rawTextTags` parameter
    * (the analog of overriding onIdentifyHtmlTag
    * [R: HtmlParser.h · onIdentifyHtmlTag]).
    */
  val DefaultRawTextTags: Set[String] = Set("script", "style")

  /** Eager full parse (reference entry point 1, SURVEY.md §3.1). */
  def parse(bytes: Array[Byte], eagerAttrs: Boolean = false,
            rawTextTags: Set[String] = DefaultRawTextTags): Array[HNode] = {
    val buf = new ArrayBuffer[HNode](64)
    scan(bytes, eagerAttrs, rawTextTags)(n => { buf += n; true })
    buf.toArray
  }

  def parseString(html: String, eagerAttrs: Boolean = false): Array[HNode] =
    parse(html.getBytes(UTF_8), eagerAttrs)

  /** Streaming/callback parse with early stop (reference entry point 2,
    * SURVEY.md §3.2): `onNodeReady` returning false aborts the scan
    * [R: HtmlParser.h · virtual onNodeReady]. Returns number of nodes emitted.
    */
  def scan(b: Array[Byte], eagerAttrs: Boolean = false,
           rawTextTags: Set[String] = DefaultRawTextTags)
          (onNodeReady: HNode => Boolean): Int = {
    val n = b.length
    var i = 0
    var idx = 0
    var stop = false
    val bb = longView(b) // one long-view wrap for the whole scan

    @inline def str(from: Int, until: Int): String =
      if (until <= from) "" else new String(b, from, until - from, UTF_8)

    def emit(node: HNode): Unit = {
      idx += 1
      if (!onNodeReady(node)) stop = true
    }

    def mkStart(ts: Int): Int = {
      // tag name: ASCII letters/digits; truncate stored name at 15 bytes but
      // consume the full identifier (A3 / F-11)
      var j = ts + 1
      while (j < n && isNameByte(b(j))) j += 1
      val nameLen = math.min(j - (ts + 1), MaxTagName)
      val name = tagNameOf(b, ts + 1, nameLen)
      // quote-unaware scan to '>' (F-08); raw rest-of-tag kept for lazy attrs
      var k = j
      while (k < n && b(k) != '>') k += 1
      var rs = j
      var re = k
      while (rs < re && isWs(b(rs))) rs += 1
      while (re > rs && isWs(b(re - 1))) re -= 1
      var self = false
      if (re > rs && b(re - 1) == '/') {
        self = true
        re -= 1
        while (re > rs && isWs(b(re - 1))) re -= 1
      }
      val end = if (k < n) k + 1 else n
      val node = HNode.span(idx, NodeType.StartTag, name, b, rs, re, self,
        isCdata = false, ts, end)
      if (eagerAttrs) node.attrs // force the lazy parse (A11 eager mode)
      emit(node)
      // raw-text mode (A9): script/style content is one Content node
      if (!stop && !self && end < n && rawTextTags.contains(name.toLowerCase(java.util.Locale.ROOT))) {
        val m = indexOfCloseTag(b, end, n, name)
        val contentEnd = if (m >= 0) m else n
        if (contentEnd > end)
          emit(HNode.span(idx, NodeType.Content, "", b, end, contentEnd,
            selfClosing = false, isCdata = false, end, contentEnd))
        // the close tag itself (if found) is parsed by the main loop
        return contentEnd
      }
      end
    }

    while (i < n && !stop) {
      // content: bytes up to the next byte that opens a real construct (A2).
      // SWAR skip to the next '<' (8 bytes/step — content is most of the
      // bytes on real pages), then the cheap opener check; a bare '<' that
      // opens nothing stays content, exactly as the byte loop did.
      val cs = i
      var scanning = true
      while (scanning) {
        i = indexOfByteBB(bb, b, i, n, '<')
        if (i >= n || isTagOpen(b, i, n)) scanning = false
        else i += 1
      }
      if (i > cs)
        emit(HNode.span(idx, NodeType.Content, "", b, cs, i,
          selfClosing = false, isCdata = false, cs, i))
      if (!stop && i < n) {
        val c1 = b(i + 1)
        if (c1 == '/') { // close tag (A4) — no matching against opens
          val ts = i
          var j = i + 2
          val ns = j
          while (j < n && isNameByte(b(j))) j += 1
          val nameLen = math.min(j - ns, MaxTagName)
          val name = tagNameOf(b, ns, nameLen)
          var k = j
          while (k < n && b(k) != '>') k += 1
          val end = if (k < n) k + 1 else n
          emit(HNode.span(idx, NodeType.CloseTag, name, b, 0, 0,
            selfClosing = false, isCdata = false, ts, end))
          i = end
        } else if (c1 == '!') {
          if (regionMatches(b, i, "<!--")) { // comment (A5)
            val m = indexOf(b, i + 4, n, "-->")
            val (txtEnd, end) = if (m >= 0) (m, m + 3) else (n, n)
            emit(HNode.span(idx, NodeType.Remarks, "", b, i + 4, txtEnd,
              selfClosing = false, isCdata = false, i, end))
            i = end
          } else if (regionMatches(b, i, "<![CDATA[")) { // CDATA (A6)
            val m = indexOf(b, i + 9, n, "]]>")
            val (txtEnd, end) = if (m >= 0) (m, m + 3) else (n, n)
            emit(HNode.span(idx, NodeType.Content, "", b, i + 9, txtEnd,
              selfClosing = false, isCdata = true, i, end))
            i = end
          } else { // doctype / other bang decl (A7, F-09)
            var k = i + 2
            while (k < n && b(k) != '>') k += 1
            val end = if (k < n) k + 1 else n
            emit(HNode.span(idx, NodeType.Remarks, "", b, i + 2, k,
              selfClosing = false, isCdata = false, i, end))
            i = end
          }
        } else if (c1 == '?') { // processing instruction (A7, F-09)
          var k = i + 2
          while (k < n && b(k) != '>') k += 1
          val end = if (k < n) k + 1 else n
          emit(HNode.span(idx, NodeType.Remarks, "", b, i + 2, k,
            selfClosing = false, isCdata = false, i, end))
          i = end
        } else { // start tag (A3/A8)
          i = mkStart(i)
        }
      }
    }
    idx
  }

  @inline private def isAlpha(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isNameByte(c: Byte): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9')

  @inline private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** `<` opens a construct only before a letter, `/`, `!` or `?` (F-08). */
  @inline private def isTagOpen(b: Array[Byte], j: Int, n: Int): Boolean =
    b(j) == '<' && j + 1 < n && {
      val c = b(j + 1)
      isAlpha(c) || c == '/' || c == '!' || c == '?'
    }

  private def regionMatches(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(at + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  private val Lsb = 0x0101010101010101L
  private val Msb = 0x8080808080808080L

  /** SWAR memchr: first index of `target` in b[from, n), or n. Reads the
    * array 8 bytes at a time through a little-endian long view (HotSpot
    * intrinsifies `ByteBuffer.getLong` to a single load); the classic
    * zero-byte trick finds a match lane, `numberOfTrailingZeros/8` names
    * it. Byte-exact drop-in for the per-byte loop it replaces.
    */
  private def longView(b: Array[Byte]): java.nio.ByteBuffer =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  /** SWAR step over a pre-wrapped view — the wrap is hoisted to once per
    * scan/search (a wrap per candidate byte would put an allocation back
    * on the hot path whenever escape analysis bails).
    */
  private def indexOfByteBB(bb: java.nio.ByteBuffer, b: Array[Byte],
                            from: Int, n: Int, target: Byte): Int = {
    var i = from
    val pat = (target & 0xffL) * Lsb
    while (i + 8 <= n) {
      val x = bb.getLong(i) ^ pat
      val t = (x - Lsb) & ~x & Msb
      if (t != 0L)
        return i + (java.lang.Long.numberOfTrailingZeros(t) >> 3)
      i += 8
    }
    while (i < n && b(i) != target) i += 1
    i
  }

  private def indexOf(b: Array[Byte], from: Int, n: Int, s: String): Int = {
    val first = s.charAt(0).toByte
    val bb = longView(b)
    var i = from
    val last = n - s.length
    while (i <= last) {
      i = indexOfByteBB(bb, b, i, last + 1, first)
      if (i > last) return -1
      if (regionMatches(b, i, s)) return i
      i += 1
    }
    -1
  }

  /** Find `</name` (case-insensitive) followed by `>`, whitespace or EOF —
    * the only terminator of raw-text mode (F-06/F-12).
    */
  private def indexOfCloseTag(b: Array[Byte], from: Int, n: Int,
                              name: String): Int = {
    val lower = name.toLowerCase(java.util.Locale.ROOT)
    val len = lower.length
    val bb = longView(b)
    var i = from
    val last = n - (len + 2)
    while (i <= last) {
      i = indexOfByteBB(bb, b, i, last + 1, '<')
      if (i > last) return -1
      if (b(i + 1) == '/') {
        var j = 0
        var ok = true
        while (ok && j < len) {
          val c = b(i + 2 + j)
          val cl = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
          if (cl != lower.charAt(j)) ok = false
          j += 1
        }
        if (ok) {
          val after = i + 2 + len
          if (after >= n || b(after) == '>' || isWs(b(after)) || b(after) == '/')
            return i
        }
      }
      i += 1
    }
    -1
  }
}
