package graft.core

import scala.collection.mutable.ArrayBuffer

/** One syndication item: entity-decoded title/summary, resolved link,
  * stable id (RSS `<guid>` / Atom `<id>`, falling back to the link), and
  * the raw timestamp string (`<pubDate>` / `<updated>` / `<published>` /
  * `<dc:date>` — RFC 822 vs RFC 3339 parsing is the query layer's job,
  * as with sitemap `<lastmod>`).
  */
final case class FeedItem(title: String, link: String, id: String,
                          ts: String, summary: String)

/** Parsed feed: `kind` is "rss" (RSS 0.9x/2.0 `<rss>` and RSS 1.0 RDF),
  * "atom" (`<feed>`), or "unknown" (no feed root seen — items may still
  * have been salvaged from stray `<item>` elements).
  */
final case class Feed(kind: String, title: String, items: Array[FeedItem])

/** RSS/Atom feed parser over the same single-pass scanner as the HTML and
  * sitemap legs — the discovery surface a crawl pipeline polls for fresh
  * urls between full crawls. Public formats only: RSS 2.0 (rssboard.org
  * spec), RSS 1.0 RDF items, Atom (RFC 4287). Structure-tolerant, never
  * throws, namespace prefixes stripped (`<atom:link>` ≡ `<link>`,
  * `<dc:date>` → timestamp fallback); Atom links come from the
  * `href` ATTRIBUTE with `rel="alternate"`-or-unset precedence, RSS links
  * from element text. CDATA titles/summaries (the RSS norm) capture
  * verbatim through the scanner's CDATA content nodes. `maxItems` bounds
  * work and memory via the scanner's early-stop hook.
  */
object FeedParser {

  def parse(xml: Array[Byte], maxItems: Int = 1000): Feed = {
    val items = new ArrayBuffer[FeedItem](16)
    var kind = "unknown"
    var feedTitle = ""
    var inItem = false
    var capture: String = null
    val text = new java.lang.StringBuilder(64)
    var title: String = null
    var link: String = null
    var id: String = null
    var ts: String = null
    var tsPrio = -1 // pubDate/updated(2) > published(1) > dc:date(0)
    var summary: String = null
    var linkFromAttr = false // an Atom rel="alternate" link wins element text

    // The scanner's tag names stop at ':' (names are letters/digits, by
    // the reference's contract), so `<dc:date>` tokenizes as tag "dc" with
    // raw rest ":date…". Recover the namespace-local name: for start tags
    // from the raw attr text, for close tags from the source span.
    def localName(nd: HNode): String = {
      val t = nd.tagName.toLowerCase(java.util.Locale.ROOT)
      if (nd.nodeType == NodeType.StartTag) {
        val raw = nd.text
        if (raw.length > 1 && raw.charAt(0) == ':') {
          var j = 1
          while (j < raw.length && !Character.isWhitespace(raw.charAt(j)) &&
            raw.charAt(j) != '/' && raw.charAt(j) != ':') j += 1
          if (j > 1) return raw.substring(1, j).toLowerCase(java.util.Locale.ROOT)
        }
        t
      } else { // close tag: scan `</prefix:local>` bytes
        var j = nd.start + 2
        var lastColon = -1
        while (j < xml.length && j < nd.end &&
          xml(j) != '>' && !Character.isWhitespace(xml(j).toChar)) {
          if (xml(j) == ':') lastColon = j
          j += 1
        }
        if (lastColon >= 0 && j > lastColon + 1)
          new String(xml, lastColon + 1, j - lastColon - 1,
            java.nio.charset.StandardCharsets.UTF_8)
            .toLowerCase(java.util.Locale.ROOT)
        else t
      }
    }

    def flush(): Unit = {
      if (inItem && (title != null || link != null || id != null) &&
          items.size < maxItems) {
        val l = if (link == null) "" else link
        items += FeedItem(
          if (title == null) "" else title,
          l,
          if (id == null || id.isEmpty) l else id,
          if (ts == null) "" else ts,
          if (summary == null) "" else summary)
      }
      title = null; link = null; id = null; ts = null; tsPrio = -1
      summary = null; linkFromAttr = false
    }

    HtmlScanner.scan(xml) { nd =>
      nd.nodeType match {
        case NodeType.StartTag =>
          localName(nd) match {
            case "rss" | "rdf"      => if (kind == "unknown") kind = "rss"
            case "feed"             => if (kind == "unknown") kind = "atom"
            case "item" | "entry"   => flush(); inItem = true
            case "link" if inItem =>
              // Atom: <link href=… rel=…/>; rel absent or "alternate" wins
              nd.attr("href") match {
                case Some(h) =>
                  val rel = nd.attr("rel").getOrElse("alternate")
                  if (!linkFromAttr && (rel == "alternate" || link == null)) {
                    link = h.trim
                    if (rel == "alternate") linkFromAttr = true
                  }
                case None => capture = "link"; text.setLength(0) // RSS text link
              }
            case t @ ("title" | "guid" | "id" | "pubdate" | "updated" |
                      "published" | "date" | "description" | "summary") =>
              capture = t
              text.setLength(0)
            case _ =>
          }
        case NodeType.CloseTag =>
          localName(nd) match {
            case "item" | "entry" => flush(); inItem = false
            case t if t == capture =>
              val v = Entities.decode(text.toString).trim
              if (inItem) t match {
                case "title"       => title = v
                case "link"        => if (!linkFromAttr) link = v
                case "guid" | "id" => id = v
                case "pubdate" | "updated" =>
                  if (tsPrio < 2) { ts = v; tsPrio = 2 }
                case "published" =>
                  if (tsPrio < 1) { ts = v; tsPrio = 1 }
                case "date" =>
                  if (tsPrio < 0) { ts = v; tsPrio = 0 }
                case "description" | "summary" =>
                  summary = if (v.length > 2048) v.substring(0, 2048) else v
                case _ =>
              } else if (t == "title" && feedTitle.isEmpty) feedTitle = v
              capture = null
            case _ =>
          }
        case NodeType.Content if capture != null =>
          if (text.length < 8192) text.append(nd.text)
        case _ =>
      }
      items.size < maxItems
    }
    flush() // unclosed trailing item still counts
    Feed(kind, feedTitle, items.toArray)
  }
}
