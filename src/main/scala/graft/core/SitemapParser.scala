package graft.core

import scala.collection.mutable.ArrayBuffer

/** One sitemap entry: the `<loc>` url (entity-decoded, trimmed), the raw
  * `<lastmod>` string if present (W3C datetime, kept as-is — parsing to a
  * timestamp is the query layer's job), and `<priority>` (0.0–1.0, the
  * protocol's default 0.5 when absent/unparsable).
  */
final case class SitemapEntry(loc: String, lastmod: String, priority: Double)

/** Sitemap-protocol parser (sitemaps.org, the public spec robots.txt's
  * `Sitemap:` lines point at) over the same single-pass scanner the HTML
  * leg uses — XML is a subset of what [[HtmlScanner]] tokenizes (tags,
  * text, CDATA). Handles both document kinds: `<urlset>` with
  * `<url><loc>…</loc><lastmod/><priority/></url>` entries, and
  * `<sitemapindex>` with nested `<sitemap><loc>…</loc></sitemap>`
  * pointers (returned as entries with `priority = -1` so the caller can
  * fetch-and-recurse — this parser never does IO). Damaged input never
  * throws; elements outside a `<url>`/`<sitemap>` container are ignored.
  */
object SitemapParser {

  /** Marker priority for sitemapindex pointers (nested sitemap urls). */
  final val IndexPointer = -1.0

  def parse(xml: Array[Byte], maxEntries: Int = 50000): Array[SitemapEntry] = {
    val out = new ArrayBuffer[SitemapEntry](64)
    var inUrl = false      // inside <url> … </url>
    var inIndex = false    // inside <sitemap> … </sitemap>
    var capture: String = null // element name whose text is being captured
    val text = new java.lang.StringBuilder(64)
    var loc: String = null
    var lastmod: String = null
    var priority = Double.NaN

    def flush(pointer: Boolean): Unit = {
      if (loc != null && loc.nonEmpty && out.size < maxEntries) {
        val p =
          if (pointer) IndexPointer
          else if (priority.isNaN) 0.5 // protocol default
          else math.max(0.0, math.min(1.0, priority))
        out += SitemapEntry(loc, if (lastmod == null) "" else lastmod, p)
      }
      loc = null
      lastmod = null
      priority = Double.NaN
    }

    HtmlScanner.scan(xml) { nd =>
      val tag = nd.tagName
      nd.nodeType match {
        case NodeType.StartTag =>
          tag.toLowerCase(java.util.Locale.ROOT) match {
            case "url"     => flush(pointer = false); inUrl = true
            case "sitemap" => flush(pointer = true); inIndex = true
            case t @ ("loc" | "lastmod" | "priority") if inUrl || inIndex =>
              capture = t
              text.setLength(0)
            case _ =>
          }
        case NodeType.CloseTag =>
          tag.toLowerCase(java.util.Locale.ROOT) match {
            case "url"     => flush(pointer = false); inUrl = false
            case "sitemap" => flush(pointer = true); inIndex = false
            case t if t == capture =>
              val v = Entities.decode(text.toString).trim
              t match {
                case "loc"     => loc = v
                case "lastmod" => lastmod = v
                case "priority" =>
                  priority = try v.toDouble catch {
                    case _: NumberFormatException => Double.NaN
                  }
                case _ =>
              }
              capture = null
            case _ =>
          }
        case NodeType.Content if capture != null =>
          if (text.length < 4096) text.append(nd.text)
        case _ =>
      }
      out.size < maxEntries // early-stop once full (A14's hook, reused)
    }
    flush(pointer = inIndex) // unclosed trailing entry still counts
    out.toArray
  }

  /** The `Sitemap:` pointers of a robots.txt body (RFC 9309 treats them
    * as group-neutral records; values are absolute urls by spec, returned
    * trimmed, order preserved, duplicates kept — the caller dedups after
    * canonicalization).
    */
  def sitemapUrls(robotsBody: String): Seq[String] = {
    if (robotsBody == null) return Seq.empty
    robotsBody.linesIterator.flatMap { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim
            .equalsIgnoreCase("sitemap")) {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toSeq
  }
}
