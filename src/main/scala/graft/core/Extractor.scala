package graft.core

import scala.collection.mutable.ArrayBuffer

/** Byte span into the source html (offsets of a kept raw content node). */
final case class Span(start: Int, end: Int)

final case class ExtractResult(text: String, spans: Array[Span], nodeCount: Int)

/** Boilerplate strip + main-content extraction over the FLAT node array —
  * the layer the north_star adds above the reference parser (BASELINE.json:6:
  * "boilerplate strip (DOM heuristics: tag whitelist, text-density,
  * link-density scoring) → text extraction").
  *
  * Deterministic pure function; semantics pinned by FIXTURES.md §5:
  *  - subtree drop by tag blacklist (script/style/nav/header/footer/… — E-01,
  *    E-02); tracked with a depth counter on the flat array, tolerant of
  *    unclosed/unbalanced tags (E-04, F-10): a close with no open is ignored.
  *  - Remarks never contribute (E-03). CDATA content is kept verbatim —
  *    entity decoding applies only to ordinary content (E-03 policy).
  *  - block segmentation at block-level tags; a block is dropped when its
  *    link density (non-whitespace chars under `<a>` / total non-whitespace
  *    chars) exceeds [[Extractor.MaxLinkDensity]], or when it has no
  *    non-whitespace text (text-density floor).
  *  - kept blocks are joined with a single '\n'; inside a block, decoded
  *    content is concatenated verbatim (byte-exact gate).
  */
object Extractor {

  /** Tags whose entire subtree is boilerplate (tag whitelist/blacklist). */
  val DropTags: Set[String] = Set(
    "script", "style", "noscript", "nav", "header", "footer", "aside",
    "form", "iframe", "svg", "button", "select", "option", "textarea",
    "template", "head")

  /** Tags that delimit text blocks for density scoring. */
  val BlockTags: Set[String] = Set(
    "html", "body", "p", "div", "br", "hr",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "dl", "dt", "dd",
    "td", "th", "tr", "table", "thead", "tbody", "tfoot",
    "article", "section", "main", "blockquote", "pre",
    "figure", "figcaption")

  /** Max fraction of a block's non-whitespace chars allowed under `<a>`. */
  val MaxLinkDensity = 0.5

  def extractBytes(html: Array[Byte]): ExtractResult =
    extract(HtmlScanner.parse(html))

  def extractString(html: String): ExtractResult =
    extractBytes(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def extract(nodes: Array[HNode]): ExtractResult = {
    val out = new StringBuilder(256)
    val spans = new ArrayBuffer[Span](32)

    // current block accumulator
    var blockPieces = new ArrayBuffer[(String, Span)](8)
    var blockNonWs = 0
    var blockAnchorNonWs = 0

    var dropDepth = 0
    var anchorDepth = 0

    def flushBlock(): Unit = {
      if (blockNonWs > 0 &&
          blockAnchorNonWs.toDouble / blockNonWs <= MaxLinkDensity) {
        if (out.nonEmpty) out.append('\n')
        var i = 0
        while (i < blockPieces.length) {
          out.append(blockPieces(i)._1)
          spans += blockPieces(i)._2
          i += 1
        }
      }
      if (blockPieces.nonEmpty) blockPieces = new ArrayBuffer[(String, Span)](8)
      blockNonWs = 0
      blockAnchorNonWs = 0
    }

    var i = 0
    while (i < nodes.length) {
      val nd = nodes(i)
      nd.nodeType match {
        case NodeType.StartTag =>
          val t = nd.tagName.toLowerCase
          if (DropTags.contains(t)) {
            if (!nd.selfClosing) dropDepth += 1
          } else if (t == "a") {
            if (!nd.selfClosing) anchorDepth += 1
          }
          if (BlockTags.contains(t)) flushBlock()
        case NodeType.CloseTag =>
          val t = nd.tagName.toLowerCase
          if (DropTags.contains(t)) {
            if (dropDepth > 0) dropDepth -= 1 // unbalanced close: ignored
          } else if (t == "a") {
            if (anchorDepth > 0) anchorDepth -= 1
          }
          if (BlockTags.contains(t)) flushBlock()
        case NodeType.Content =>
          if (dropDepth == 0) {
            val decoded = if (nd.isCdata) nd.text else Entities.decode(nd.text)
            val nw = countNonWs(decoded)
            blockPieces += ((decoded, Span(nd.start, nd.end)))
            blockNonWs += nw
            if (anchorDepth > 0) blockAnchorNonWs += nw
          }
        case _ => // Remarks / Unknown never contribute (E-03)
      }
      i += 1
    }
    flushBlock()
    ExtractResult(out.toString, spans.toArray, nodes.length)
  }

  @inline private def countNonWs(s: String): Int = {
    var c = 0
    var i = 0
    while (i < s.length) {
      if (!Character.isWhitespace(s.charAt(i))) c += 1
      i += 1
    }
    c
  }
}
