package graft.core

import scala.collection.mutable.ArrayBuffer

/** Byte span into the source html (offsets of a kept raw content node). */
final case class Span(start: Int, end: Int)

final case class ExtractResult(text: String, spans: Array[Span], nodeCount: Int)

/** Boilerplate strip + main-content extraction over the FLAT node stream —
  * the layer the north_star adds above the reference parser (BASELINE.json:6:
  * "boilerplate strip (DOM heuristics: tag whitelist, text-density,
  * link-density scoring) → text extraction").
  *
  * Deterministic pure function; semantics pinned by FIXTURES.md §5:
  *  - subtree drop by tag blacklist (script/style/nav/header/footer/… — E-01,
  *    E-02); tracked with a depth counter on the flat stream, tolerant of
  *    unclosed/unbalanced tags (E-04, F-10): a close with no open is ignored.
  *  - Remarks never contribute (E-03). CDATA content is kept verbatim —
  *    entity decoding applies only to ordinary content (E-03 policy).
  *  - block segmentation at block-level tags; a block is dropped when its
  *    link density (non-whitespace chars under `<a>` / total non-whitespace
  *    chars) exceeds [[Extractor.MaxLinkDensity]], or when it has no
  *    non-whitespace text (text-density floor).
  *  - kept blocks are joined with a single '\n'; inside a block, decoded
  *    content is concatenated verbatim (byte-exact gate).
  *
  * Two entry points with identical results (property-tested):
  * [[extract]] over a materialized node array, and the hot-path
  * [[extractBytes]] which FUSES the state machine into the scanner's
  * onNodeReady visitor — one pass, no node array, no per-document
  * collection garbage (the 100 TB path; mirrors the reference's
  * single-pass ethos [R: HtmlParser.cpp · parseHtml + onNodeReady]).
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

  private final val FDrop = 1
  private final val FBlock = 2
  private final val FAnchor = 4

  /** Extraction policy — the graft's analog of the reference's
    * `onIdentifyHtmlTag` extension point [R: HtmlParser.h · onIdentifyHtmlTag]:
    * consumers tune which subtrees are boilerplate, where blocks break, and
    * the link-density gate. The flags map is precomputed once per config
    * instance (reuse one Config across a partition).
    */
  final case class ExtractConfig(
      dropTags: Set[String] = DropTags,
      blockTags: Set[String] = BlockTags,
      maxLinkDensity: Double = MaxLinkDensity,
      extendedEntities: Boolean = false) {
    private[Extractor] val tagFlags: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      dropTags.foreach(t => m.merge(t.toLowerCase(java.util.Locale.ROOT), FDrop, (a, b) => a | b))
      blockTags.foreach(t => m.merge(t.toLowerCase(java.util.Locale.ROOT), FBlock, (a, b) => a | b))
      m.merge("a", FAnchor, (a, b) => a | b)
      m
    }
    /** Zero-alloc on lowercase names (the scanner interns common lowercase
      * tags and `String.toLowerCase` returns `this` when unchanged).
      */
    @inline private[Extractor] def flagsOf(name: String): Int = {
      val f = tagFlags.get(name)
      if (f != null) f.intValue
      else {
        val g = tagFlags.get(name.toLowerCase(java.util.Locale.ROOT))
        if (g != null) g.intValue else 0
      }
    }
  }

  /** The pinned default policy (FIXTURES.md §5 semantics). */
  val DefaultConfig: ExtractConfig = ExtractConfig()

  /** Streaming extraction state machine — one instance per document.
    *
    * Block content is appended DIRECTLY to the output buffer as it arrives;
    * a block that fails the density gate at flush time is removed by
    * truncating back to the block's start offset (cheaper than buffering
    * pieces and re-copying every kept byte — kept text is most of the bytes).
    */
  // NOTE (measured): pre-sizing `out` from html.length/2 is ~20% SLOWER —
  // boilerplate-heavy pages keep far less text than half the bytes, so the
  // up-front char[] zeroing costs more than the few doubling copies. 256 it is.
  private final class State(cfg: ExtractConfig, forceExactCount: Boolean = false) {
    private val out = new java.lang.StringBuilder(256)
    private val spans = new ArrayBuffer[Span](32)

    // current block accumulator: [blockStartLen, out.length) is this block
    private var blockStartLen = 0
    private var spansStart = 0
    private var blockNonWs = 0
    private var blockAnchorNonWs = 0
    // fast path for anchor-free blocks (the common case): the density gate
    // then only needs "has any non-ws char", so the per-piece exact count
    // scan is skipped entirely. The first anchored piece PROMOTES the block
    // to exact counting, recounting the already-appended block prefix from
    // the output buffer — byte-identical keep/reject decisions either way.
    private var blockHasAnchor = false
    private var blockHasText = false
    // a negative maxLinkDensity (reject-everything config) breaks the
    // "anchor-free ⇒ ratio 0 ⇒ keep" shortcut; fall back to exact counting
    private val fastGate = !forceExactCount && cfg.maxLinkDensity >= 0

    private var dropDepth = 0
    private var anchorDepth = 0
    private var nodeCount = 0

    private def flushBlock(): Unit = {
      val keep =
        if (blockHasAnchor || !fastGate)
          blockNonWs > 0 &&
            blockAnchorNonWs.toDouble / blockNonWs <= cfg.maxLinkDensity
        else blockHasText
      if (keep) {
        // keep: block bytes are already in place
      } else {
        // reject: truncate the block (and its '\n' separator) back out.
        // Unconditional — a block whose pieces decode to empty (e.g. an
        // empty CDATA before any kept text) adds spans without adding
        // chars, and those must be rolled back too (spans-compose-text
        // invariant).
        out.setLength(blockStartLen)
        spans.takeInPlace(spansStart)
      }
      blockStartLen = out.length
      spansStart = spans.length
      blockNonWs = 0
      blockAnchorNonWs = 0
      blockHasAnchor = false
      blockHasText = false
    }

    def accept(nd: HNode): Unit = {
      nodeCount += 1
      nd.nodeType match {
        case NodeType.StartTag =>
          val f = cfg.flagsOf(nd.tagName)
          if ((f & FDrop) != 0) {
            if (!nd.selfClosing) dropDepth += 1
          } else if ((f & FAnchor) != 0) {
            if (!nd.selfClosing) anchorDepth += 1
          }
          if ((f & FBlock) != 0) flushBlock()
        case NodeType.CloseTag =>
          val f = cfg.flagsOf(nd.tagName)
          if ((f & FDrop) != 0) {
            if (dropDepth > 0) dropDepth -= 1 // unbalanced close: ignored
          } else if ((f & FAnchor) != 0) {
            if (anchorDepth > 0) anchorDepth -= 1
          }
          if ((f & FBlock) != 0) flushBlock()
        case NodeType.Content =>
          if (dropDepth == 0) {
            // nd.text decodes lazily — dropped subtrees never materialize
            val decoded =
              if (nd.isCdata) nd.text
              else Entities.decode(nd.text, cfg.extendedEntities)
            if (out.length == blockStartLen && blockStartLen > 0)
              out.append('\n') // first piece of a non-first block
            val pieceStart = out.length
            out.append(decoded)
            spans += Span(nd.start, nd.end)
            if (fastGate && !blockHasAnchor && anchorDepth > 0) {
              // first anchored piece: promote to exact counting; the block
              // prefix (incl. the whitespace '\n' separator) is recounted
              // from the buffer — same chars the skipped scans would have
              // counted
              blockNonWs = countNonWsRange(out, blockStartLen, pieceStart)
              blockHasAnchor = true
            }
            if (blockHasAnchor || !fastGate) {
              val nw = countNonWs(decoded)
              blockNonWs += nw
              if (anchorDepth > 0) blockAnchorNonWs += nw
            } else if (!blockHasText) {
              blockHasText = hasNonWs(decoded)
            }
          }
        case _ => // Remarks / Unknown never contribute (E-03)
      }
    }

    def finish(): ExtractResult = {
      flushBlock()
      ExtractResult(out.toString, spans.toArray, nodeCount)
    }
  }

  /** Hot path: fused scan+extract, no node array materialized. */
  def extractBytes(html: Array[Byte],
                   cfg: ExtractConfig = DefaultConfig): ExtractResult = {
    val st = new State(cfg)
    HtmlScanner.scan(html)(nd => { st.accept(nd); true })
    st.finish()
  }

  def extractString(html: String,
                    cfg: ExtractConfig = DefaultConfig): ExtractResult =
    extractBytes(html.getBytes(java.nio.charset.StandardCharsets.UTF_8), cfg)

  /** Test-only reference path: always-exact per-piece counting (the
    * pre-optimization semantics); the fast-path equivalence property pins
    * extract == extractExact on arbitrary input.
    */
  private[core] def extractStringExact(html: String,
                                       cfg: ExtractConfig = DefaultConfig): ExtractResult = {
    val st = new State(cfg, forceExactCount = true)
    HtmlScanner.scan(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))(
      nd => { st.accept(nd); true })
    st.finish()
  }

  /** Array path (analytical view / tests) — identical result to
    * [[extractBytes]] by construction (shared State).
    */
  def extract(nodes: Array[HNode],
              cfg: ExtractConfig = DefaultConfig): ExtractResult = {
    val st = new State(cfg)
    var i = 0
    while (i < nodes.length) { st.accept(nodes(i)); i += 1 }
    st.finish()
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

  @inline private def hasNonWs(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (!Character.isWhitespace(s.charAt(i))) return true
      i += 1
    }
    false
  }

  @inline private def countNonWsRange(sb: java.lang.StringBuilder,
                                      from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      if (!Character.isWhitespace(sb.charAt(i))) c += 1
      i += 1
    }
    c
  }
}
