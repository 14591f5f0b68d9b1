package graft.core

import scala.collection.mutable.ArrayBuffer

/** One extracted hyperlink: raw (entity-decoded, whitespace-trimmed)
  * `href`, the visible anchor text between `<a>` and `</a>`
  * (entity-decoded, length-capped), and whether the link's `rel`
  * attribute carries `nofollow` (links a ranking graph must exclude,
  * per the original public nofollow convention).
  */
final case class OutLink(href: String, anchor: String, nofollow: Boolean)

/** Outlink extraction over the single-pass scanner — the link-graph leg
  * of a web pipeline (crawl frontier discovery, host graph construction,
  * anchor-text training signals). One [[HtmlScanner.scan]] pass, no node
  * array materialized: an open `<a href=…>` starts accumulating Content
  * nodes as anchor text until its `</a>` (or the next `<a>` — browsers
  * implicitly close an unclosed anchor there, and so does this). Raw-text
  * elements (script/style) emit Content nodes the scanner never re-scans
  * for tags, so an `<a` inside JavaScript can't produce a phantom link.
  * Never throws on damaged input (unclosed `<a>` at EOF flushes).
  */
object LinkExtractor {

  def outlinks(html: Array[Byte], maxAnchor: Int = 512): Array[OutLink] = {
    val out = new ArrayBuffer[OutLink](16)
    var href: String = null
    var nofollow = false
    val anchor = new java.lang.StringBuilder(64)

    def flush(): Unit = {
      if (href != null) {
        out += OutLink(href, anchor.toString.trim, nofollow)
        href = null
        nofollow = false
      }
      anchor.setLength(0)
    }

    HtmlScanner.scan(html) { nd =>
      nd.nodeType match {
        case NodeType.StartTag if nd.tagName.equalsIgnoreCase("a") =>
          flush() // implicit close of a dangling previous anchor
          nd.attr("href").map(_.trim).filter(_.nonEmpty).foreach { h =>
            href = Entities.decode(h)
            nofollow = nd.attr("rel").exists(
              _.toLowerCase(java.util.Locale.ROOT)
                .split("[ \t\n\f\r]+").contains("nofollow"))
          }
          if (nd.selfClosing) flush() // <a href=… />: link, empty anchor
        case NodeType.CloseTag if nd.tagName.equalsIgnoreCase("a") =>
          flush()
        case NodeType.Content if href != null =>
          if (anchor.length < maxAnchor) {
            val t = Entities.decode(nd.text)
            anchor.append(t, 0, math.min(t.length, maxAnchor - anchor.length))
          }
        case _ =>
      }
      true
    }
    flush() // unclosed <a> at EOF still yields its link
    out.toArray
  }

  /** First `<link rel~="canonical" href=…>` of the document prologue —
    * the duplicate-consolidation hint a crawl pipeline must honor before
    * any content dedup (the site says which of its N urls is the page).
    * Early-stop scan (the onNodeReady=false analog of the title
    * extractor): the walk aborts at `</head>` or `<body>` — a canonical
    * link is only valid in the head, so a multi-MB body is never
    * scanned. The href is entity-decoded and trimmed; empty/absent
    * href → None; never throws on damaged input.
    */
  def canonicalHref(html: Array[Byte]): Option[String] =
    headDirectives(html).canonical

  /** The head-prologue indexing directives: first canonical link (as
    * [[canonicalHref]]) and the page-level robots bits from every
    * `<meta name="robots" content=…>` — `noindex` (drop the page from
    * any index/corpus) and `nofollow` (ignore ALL its outlinks), with
    * `none` meaning both, per the long-public robots-meta convention.
    * Directives union across multiple meta tags (conservative: any tag
    * saying noindex wins). One early-stop scan bounded by the head —
    * same contract as the title extractor: never throws, arbitrary
    * damage tolerated.
    */
  final case class HeadDirectives(
      canonical: Option[String], noindex: Boolean, nofollow: Boolean)

  def headDirectives(html: Array[Byte]): HeadDirectives = {
    var canonical: Option[String] = None
    var noindex = false
    var nofollow = false
    def relTokens(v: String): Array[String] =
      v.toLowerCase(java.util.Locale.ROOT).split("[ \t\n\f\r,]+")
    HtmlScanner.scan(html) { nd =>
      nd.nodeType match {
        case NodeType.StartTag if nd.tagName.equalsIgnoreCase("link") =>
          if (canonical.isEmpty &&
              nd.attr("rel").exists(relTokens(_).contains("canonical")))
            canonical = nd.attr("href").map(h => Entities.decode(h).trim)
              .filter(_.nonEmpty)
          true
        case NodeType.StartTag if nd.tagName.equalsIgnoreCase("meta") =>
          val isRobots = nd.attr("name").exists(
            _.trim.equalsIgnoreCase("robots"))
          if (isRobots) nd.attr("content").foreach { c =>
            val ts = relTokens(Entities.decode(c))
            if (ts.contains("noindex") || ts.contains("none")) noindex = true
            if (ts.contains("nofollow") || ts.contains("none")) nofollow = true
          }
          true
        case NodeType.StartTag if nd.tagName.equalsIgnoreCase("body") => false
        case NodeType.CloseTag if nd.tagName.equalsIgnoreCase("head") => false
        case _ => true
      }
    }
    HeadDirectives(canonical, noindex, nofollow)
  }
}
