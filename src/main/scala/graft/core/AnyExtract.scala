package graft.core

/** Content-type dispatch over every text-bearing format this engine
  * parses — the single entry point a mixed crawl actually needs: a WARC
  * segment interleaves HTML pages with PDFs, RSS/Atom feeds and
  * subtitle assets, and each carries training text behind a different
  * parser. Sniffing is structural (magic bytes / a successful parse of
  * the format's skeleton), never extension-based — crawled URLs lie.
  *
  * Dispatch order is cheapest-and-most-specific first: `%PDF` magic →
  * subtitle (WEBVTT magic, or an SRT timing line actually parsing —
  * an HTML comment's `-->` never parses as a timestamp pair, so HTML
  * cannot shadow in) → feed (an `<rss>`/`<feed>`/RDF root recognized by
  * [[FeedParser]] — XHTML falls through as "unknown") → HTML (any tag
  * start) → ("other", "") for undecodable payloads. Each branch
  * delegates to the format's dedicated, separately-certified extractor;
  * this object owns ONLY the routing decision, which is what q164
  * certifies.
  */
object AnyExtract {

  /** (kind, extracted text); kind ∈ empty|pdf|subtitle|feed|html|other.
    * Never throws on truncated/garbage input (every delegate holds the
    * same contract).
    */
  def extract(bytes: Array[Byte]): (String, String) = {
    if (bytes == null || bytes.length == 0) return ("empty", "")
    if (bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
        bytes(2) == 'D' && bytes(3) == 'F')
      return ("pdf", PdfTextScanner.extractText(bytes))
    if (SubtitleParser.kind(bytes) != "unknown")
      return ("subtitle", SubtitleParser.text(bytes))
    val feed = FeedParser.parse(bytes)
    if (feed.kind != "unknown")
      return ("feed", feedText(feed))
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == '<') return ("html", Extractor.extractBytes(bytes).text)
      i += 1
    }
    ("other", "")
  }

  /** A feed's training-text surface: per item the title and (when
    * present) the summary, newline-joined in document order.
    */
  def feedText(feed: Feed): String = {
    val sb = new java.lang.StringBuilder(256)
    var i = 0
    while (i < feed.items.length) {
      val it = feed.items(i)
      if (sb.length > 0) sb.append('\n')
      sb.append(it.title)
      if (it.summary.nonEmpty) sb.append('\n').append(it.summary)
      i += 1
    }
    sb.toString
  }
}
