package graft.core

import scala.collection.mutable.ArrayBuffer

/** CSS selector engine over the flat node array — the query surface an
  * HTML-parser user reaches for first ("give me `div.article > p a[href]`").
  * Clean-room implementation of the public Selectors Level 3 subset that
  * covers web-scraping practice:
  *
  *   - compounds: `tag`, `*`, `#id`, `.class`, `[attr]`, `[attr=v]`,
  *     `[attr^=v]`, `[attr$=v]`, `[attr*=v]`, `[attr~=v]` (quoted or bare
  *     values)
  *   - combinators: descendant (whitespace), child `>`, adjacent sibling
  *     `+`, general sibling `~`; selector lists with `,`
  *   - unsupported syntax (pseudo-classes, namespaces, escapes) fails the
  *     PARSE (None) — never silently mis-matches
  *
  * The reference parser builds no tree ([R: HtmlParser.h · struct
  * HtmlNode] — flat array by design), so ancestry is derived here with a
  * tolerant stack in one linear pass, the way lenient HTML consumers do:
  * void elements (WHATWG §13.1.2) and self-closing tags never open; a
  * close tag pops to the NEAREST matching open element (implicitly closing
  * anything unclosed above it) and is ignored when nothing matches;
  * still-open elements close at EOF. Matching is the standard
  * right-to-left walk over parent/previous-sibling links.
  *
  * Scale shape: per-document linear tree build + per-candidate ancestor
  * walks, no allocation beyond the element table; runs inside the same
  * narrow per-partition pass as every other scanner consumer.
  */
object Selector {

  /** WHATWG §13.1.2 void elements — never open a subtree. */
  val VoidTags: Set[String] = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  // ---------------- AST ----------------

  /** One `[attr …]` test; op: 0 = present, '=', '^', '$', '*', '~'. */
  final case class AttrTest(name: String, op: Char, value: String)

  /** One compound selector (`div.article#x[href^="https"]`). `tag` is
    * lowercase, empty = any.
    */
  final case class Compound(tag: String, id: String, classes: List[String],
                            attrs: List[AttrTest])

  /** `comb` relates this compound to the one on its LEFT: ' ' descendant,
    * '>' child, '+' adjacent sibling, '~' general sibling. The first step
    * of a selector always carries ' '.
    */
  final case class Step(comb: Char, c: Compound)

  /** One element of the derived tree: indices are into the ELEMENT table,
    * `nodeIdx`/`closeIdx` into the node array (`closeIdx` = the close-tag
    * node that ended it, or `nodes.length` when closed by EOF; the
    * element's own index for void/self-closing).
    */
  final case class Elem(nodeIdx: Int, tagLower: String, parent: Int,
                        prevSib: Int, closeIdx: Int)

  private final class BadSelector extends RuntimeException(null, null, false, false)

  // ---------------- parser ----------------

  /** Parse a selector list; None on any syntax error (strict — an
    * unsupported selector must not silently match wrong things).
    */
  def parse(selector: String): Option[List[List[Step]]] =
    try Some(new Parser(selector).parseList())
    catch { case _: BadSelector => None }

  private final class Parser(s: String) {
    private var i = 0
    private val n = s.length
    private def bad(): Nothing = throw new BadSelector

    private def skipWs(): Int = {
      val from = i
      while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
      i - from
    }

    private def isIdentChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_'

    private def ident(): String = {
      val from = i
      while (i < n && isIdentChar(s.charAt(i))) i += 1
      if (i == from) bad()
      s.substring(from, i)
    }

    private def attrValue(): String = {
      if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
        val q = s.charAt(i)
        i += 1
        val from = i
        while (i < n && s.charAt(i) != q) i += 1
        if (i >= n) bad()
        val v = s.substring(from, i)
        i += 1
        v
      } else ident()
    }

    private def attrTest(): AttrTest = {
      i += 1 // '['
      skipWs()
      val name = ident()
      skipWs()
      if (i < n && s.charAt(i) == ']') { i += 1; return AttrTest(name, 0.toChar, null) }
      if (i >= n) bad()
      val c = s.charAt(i)
      val op =
        if (c == '=') { i += 1; '=' }
        else if ((c == '^' || c == '$' || c == '*' || c == '~') &&
          i + 1 < n && s.charAt(i + 1) == '=') { i += 2; c }
        else bad()
      skipWs()
      val v = attrValue()
      skipWs()
      if (i >= n || s.charAt(i) != ']') bad()
      i += 1
      AttrTest(name, op, v)
    }

    private def compound(): Compound = {
      var tag = ""
      var any = false
      if (i < n && s.charAt(i) == '*') { i += 1; any = true }
      else if (i < n && isIdentChar(s.charAt(i))) {
        tag = ident().toLowerCase(java.util.Locale.ROOT); any = true
      }
      var id: String = null
      var classes = List.empty[String]
      var attrs = List.empty[AttrTest]
      var going = true
      while (going && i < n) {
        s.charAt(i) match {
          case '#' => i += 1; id = ident(); any = true
          case '.' => i += 1; classes = ident() :: classes; any = true
          case '[' => attrs = attrTest() :: attrs; any = true
          case _   => going = false
        }
      }
      if (!any) bad()
      Compound(tag, id, classes.reverse, attrs.reverse)
    }

    private def sel(): List[Step] = {
      val steps = ArrayBuffer(Step(' ', compound()))
      var going = true
      while (going) {
        val ws = skipWs()
        if (i >= n || s.charAt(i) == ',') going = false
        else {
          var comb = ' '
          val c = s.charAt(i)
          if (c == '>' || c == '+' || c == '~') { comb = c; i += 1; skipWs() }
          else if (ws == 0) bad() // two compounds need a separator
          steps += Step(comb, compound())
        }
      }
      steps.toList
    }

    def parseList(): List[List[Step]] = {
      val sels = ArrayBuffer.empty[List[Step]]
      skipWs()
      if (i >= n) bad() // empty selector
      sels += sel()
      while (i < n) {
        if (s.charAt(i) != ',') bad()
        i += 1
        skipWs()
        sels += sel()
      }
      sels.toList
    }
  }

  // ---------------- tolerant element tree ----------------

  /** Derive the element table (parent / previous-element-sibling / close
    * span) from the flat node array in one pass. Policy documented on the
    * object; deterministic for any input.
    */
  def elements(nodes: Array[HNode]): Array[Elem] = {
    val out = ArrayBuffer.empty[Elem]
    // stack of element-table indices of open elements
    val stack = new ArrayBuffer[Int](16)
    // last completed-or-opened child element per open element (+ root at 0)
    val lastChild = new ArrayBuffer[Int](16)
    lastChild += -1 // root slot
    var i = 0
    while (i < nodes.length) {
      val nd = nodes(i)
      if (nd.nodeType == NodeType.StartTag) {
        val tl = nd.tagName.toLowerCase(java.util.Locale.ROOT)
        val parent = if (stack.isEmpty) -1 else stack(stack.length - 1)
        val prevSib = lastChild(stack.length) // slot 0 = root
        val ei = out.length
        lastChild(stack.length) = ei
        if (nd.selfClosing || VoidTags.contains(tl)) {
          out += Elem(i, tl, parent, prevSib, i)
        } else {
          out += Elem(i, tl, parent, prevSib, -1) // close patched on pop
          stack += ei
          lastChild += -1
        }
      } else if (nd.nodeType == NodeType.CloseTag) {
        val tl = nd.tagName.toLowerCase(java.util.Locale.ROOT)
        // nearest matching open element, searched top-down
        var d = stack.length - 1
        while (d >= 0 && out(stack(d)).tagLower != tl) d -= 1
        if (d >= 0) {
          // pop everything above and including d; all close HERE
          while (stack.length > d) {
            val ei = stack.remove(stack.length - 1)
            lastChild.remove(lastChild.length - 1)
            out(ei) = out(ei).copy(closeIdx = i)
          }
        } // unmatched close tag: ignored
      }
      i += 1
    }
    // EOF closes whatever is still open
    while (stack.nonEmpty) {
      val ei = stack.remove(stack.length - 1)
      lastChild.remove(lastChild.length - 1)
      out(ei) = out(ei).copy(closeIdx = nodes.length)
    }
    out.toArray
  }

  // ---------------- matcher ----------------

  private def hasToken(s: String, tok: String): Boolean = {
    // whitespace-separated token membership (class lists, [attr~=v])
    var from = 0
    val n = s.length
    while (from < n) {
      while (from < n && Character.isWhitespace(s.charAt(from))) from += 1
      var to = from
      while (to < n && !Character.isWhitespace(s.charAt(to))) to += 1
      if (to > from && to - from == tok.length && s.regionMatches(from, tok, 0, tok.length))
        return true
      from = to
    }
    false
  }

  private def matchesCompound(nodes: Array[HNode], e: Elem, c: Compound): Boolean = {
    if (c.tag.nonEmpty && e.tagLower != c.tag) return false
    val nd = nodes(e.nodeIdx)
    if (c.id != null && !nd.attr("id").contains(c.id)) return false
    if (c.classes.nonEmpty) {
      val cls = nd.attr("class").getOrElse(return false)
      if (!c.classes.forall(hasToken(cls, _))) return false
    }
    c.attrs.forall { t =>
      t.op match {
        case 0 => nd.attrs.exists(_.name.equalsIgnoreCase(t.name))
        case '=' => nd.attr(t.name).contains(t.value)
        case '^' => t.value.nonEmpty && nd.attr(t.name).exists(_.startsWith(t.value))
        case '$' => t.value.nonEmpty && nd.attr(t.name).exists(_.endsWith(t.value))
        case '*' => t.value.nonEmpty && nd.attr(t.name).exists(_.contains(t.value))
        case '~' => t.value.nonEmpty && nd.attr(t.name).exists(hasToken(_, t.value))
        case _ => false
      }
    }
  }

  /** Right-to-left match of one selector (steps reversed by the caller). */
  private def matchRev(nodes: Array[HNode], elems: Array[Elem], ei: Int,
                       rsteps: List[Step]): Boolean = rsteps match {
    case Nil => true
    case Step(comb, c) :: rest =>
      if (!matchesCompound(nodes, elems(ei), c)) false
      else if (rest.isEmpty) true
      else comb match {
        case '>' =>
          val p = elems(ei).parent
          p >= 0 && matchRev(nodes, elems, p, rest)
        case '+' =>
          val s = elems(ei).prevSib
          s >= 0 && matchRev(nodes, elems, s, rest)
        case '~' =>
          var s = elems(ei).prevSib
          while (s >= 0) {
            if (matchRev(nodes, elems, s, rest)) return true
            s = elems(s).prevSib
          }
          false
        case _ => // descendant
          var p = elems(ei).parent
          while (p >= 0) {
            if (matchRev(nodes, elems, p, rest)) return true
            p = elems(p).parent
          }
          false
      }
  }

  /** Elements matching the selector list, in document order. Empty on a
    * selector the grammar rejects (use [[parse]] to distinguish).
    */
  def select(nodes: Array[HNode], selector: String): Array[Elem] =
    parse(selector) match {
      case None => Array.empty
      case Some(sels) => selectParsed(nodes, sels)
    }

  def selectParsed(nodes: Array[HNode], sels: List[List[Step]]): Array[Elem] = {
    val elems = elements(nodes)
    // rightmost compound first; every step already carries the combinator
    // linking it to its LEFT neighbor, so a plain reverse lines up each
    // head's comb with the walk to the remaining steps
    val rsels = sels.map(_.reverse)
    elems.iterator.zipWithIndex.collect {
      case (e, ei) if rsels.exists(matchRev(nodes, elems, ei, _)) => e
    }.toArray
  }

  /** Entity-decoded, whitespace-collapsed text content of an element
    * (concatenated Content nodes inside its span, Remarks skipped) — the
    * same normalization as `extract_title`.
    */
  def innerText(nodes: Array[HNode], e: Elem): String = {
    val sb = new java.lang.StringBuilder()
    var i = e.nodeIdx + 1
    val end = math.min(e.closeIdx, nodes.length)
    while (i < end) {
      if (nodes(i).nodeType == NodeType.Content) sb.append(nodes(i).text)
      i += 1
    }
    collapseWs(Entities.decode(sb.toString))
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingWs = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == '\u00A0') pendingWs = true
      else {
        if (pendingWs && sb.length > 0) sb.append(' ')
        pendingWs = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
