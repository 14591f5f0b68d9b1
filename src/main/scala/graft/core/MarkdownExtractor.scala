package graft.core

/** HTML → Markdown conversion over the single-pass scanner — the export
  * format modern training-data pipelines increasingly feed to models
  * (structure survives where plain text flattens it). One
  * [[HtmlScanner.scan]] pass, no DOM: a small open-element state machine
  * maps
  *
  *   - `h1..h6` → `#`…`######` headings,
  *   - `p`/`div`/table rows → paragraphs, `br` → line break, `hr` → `---`,
  *   - `a href` → `[anchor](href)` (fragment-only/empty hrefs: anchor
  *     text alone — no crawlable target),
  *   - `b`/`strong` → `**…**`, `i`/`em` → `*…*`,
  *   - `ul`/`ol`/`li` → `-` / `1.` items, two-space nesting, ordinal
  *     counters per `ol` level,
  *   - `blockquote` → `> ` prefixes,
  *   - `pre` → fenced code blocks (raw text, no inline markup), `code`
  *     outside pre → `` `inline` ``,
  *   - `img` → `![alt](src)`,
  *
  * while the boilerplate subtrees the extraction policy drops
  * ([[Extractor.DropTags]]: script/style/nav/header/footer/aside/…) are
  * dropped here too, so the markdown corresponds to the same content the
  * text pipeline keeps. Text is entity-decoded; markdown metacharacters
  * (`*`, `_`, `` ` ``, `[`, `]`, `\`, line-leading `#`) are escaped
  * outside code contexts. Inline whitespace collapses to single spaces,
  * blocks are separated by exactly one blank line. Never throws on
  * damaged/binary input.
  */
object MarkdownExtractor {

  def markdown(html: Array[Byte],
               dropTags: Set[String] = Extractor.DropTags): String = {
    val out = new java.lang.StringBuilder(256)
    var dropDepth = 0
    var listDepth = 0
    var quoteDepth = 0
    var pre = false
    var inlineCode = false
    var olCounters = List.empty[Int] // -1 marks a <ul> level
    var emphasis = List.empty[String]
    var href: String = null
    var inAnchor = false
    val anchor = new java.lang.StringBuilder(64)
    var lineStart = true    // the out buffer sits at a line start
    var blockGap = false    // one blank line owed before the next content
    var pendingOut = false  // one collapsed space owed before the next char

    @inline def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

    def prefix(): Unit = {
      var q = 0
      while (q < quoteDepth) { out.append("> "); q += 1 }
    }

    /** Position `out` for inline content: owed blank line, quote prefix,
      * owed collapsed space.
      */
    def startInlineOut(): Unit = {
      if (lineStart) {
        pendingOut = false
        if (blockGap) { prefix(); out.append('\n'); blockGap = false }
        prefix()
        lineStart = false
      } else if (pendingOut) {
        out.append(' ')
        pendingOut = false
      }
    }

    def newline(): Unit = {
      if (!lineStart) { out.append('\n'); lineStart = true }
      pendingOut = false
    }

    def blockBreak(): Unit = {
      closeEmphasis()
      newline()
      blockGap = out.length > 0
    }

    @inline def escapable(c: Char): Boolean =
      c == '*' || c == '_' || c == '`' || c == '[' || c == ']' || c == '\\'

    def textOut(s: String): Unit = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (isWs(c)) { if (!lineStart) pendingOut = true }
        else {
          val atLineStart = lineStart
          startInlineOut()
          if (!inlineCode && (escapable(c) || (c == '#' && atLineStart)))
            out.append('\\')
          out.append(c)
        }
        i += 1
      }
    }

    def textAnchor(s: String): Unit = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (isWs(c)) anchor.append(' ') // normalized at flush
        else {
          if (!inlineCode && escapable(c)) anchor.append('\\')
          anchor.append(c)
        }
        i += 1
      }
    }

    @inline def inlineMark(m: String): Unit =
      if (inAnchor) anchor.append(m)
      else { startInlineOut(); out.append(m) }

    def closeEmphasis(): Unit = {
      emphasis.foreach(inlineMark)
      emphasis = Nil
    }

    /** A destination containing spaces or parens breaks `[t](u)`;
      * CommonMark's `<…>` form carries it safely.
      */
    def dest(u: String): String =
      if (u.exists(c => c == '(' || c == ')' || c == ' ' || c == '<' || c == '>'))
        "<" + u.replace("<", "%3C").replace(">", "%3E") + ">"
      else u

    def flushLink(): Unit = {
      if (inAnchor) {
        val text = anchor.toString.replaceAll(" +", " ").trim
        startInlineOut()
        if (href == null || href.isEmpty || href.charAt(0) == '#')
          out.append(text)
        else out.append('[').append(text).append("](").append(dest(href)).append(')')
        href = null
        inAnchor = false
        anchor.setLength(0)
      }
    }

    HtmlScanner.scan(html) { nd =>
      val tag = nd.tagName.toLowerCase(java.util.Locale.ROOT)
      nd.nodeType match {
        case NodeType.StartTag if dropDepth > 0 =>
          if (dropTags.contains(tag) && !nd.selfClosing) dropDepth += 1
        case NodeType.CloseTag if dropDepth > 0 =>
          if (dropTags.contains(tag)) dropDepth -= 1
        case NodeType.StartTag =>
          tag match {
            case t if dropTags.contains(t) =>
              if (!nd.selfClosing) dropDepth += 1
            case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
              flushLink()
              blockBreak()
              startInlineOut()
              out.append("#" * (tag.charAt(1) - '0')).append(' ')
            case "p" | "div" | "table" | "tr" | "dt" | "dd" =>
              flushLink()
              blockBreak()
            case "br" => flushLink(); newline()
            case "hr" =>
              flushLink()
              blockBreak()
              startInlineOut()
              out.append("---")
              blockBreak()
            case "ul" | "ol" =>
              flushLink()
              if (listDepth == 0) blockBreak()
              else { closeEmphasis(); newline() }
              listDepth += 1
              olCounters = (if (tag == "ul") -1 else 0) :: olCounters
            case "li" =>
              closeEmphasis()
              flushLink()
              newline()
              startInlineOut() // emits the owed blank line before the list
              out.append("  " * math.max(listDepth - 1, 0))
              olCounters match {
                case n :: rest if n >= 0 =>
                  olCounters = (n + 1) :: rest
                  out.append(n + 1).append(". ")
                case _ => out.append("- ")
              }
            case "blockquote" =>
              flushLink()
              blockBreak()
              quoteDepth += 1
            case "pre" =>
              flushLink()
              blockBreak()
              startInlineOut()
              out.append("```")
              out.append('\n')
              lineStart = true
              pre = true
            case "code" if !pre =>
              inlineMark("`")
              inlineCode = true
            case "b" | "strong" =>
              inlineMark("**")
              emphasis = "**" :: emphasis
            case "i" | "em" =>
              inlineMark("*")
              emphasis = "*" :: emphasis
            case "a" =>
              flushLink()
              inAnchor = true
              href = nd.attr("href").map(h => Entities.decode(h.trim)).orNull
              if (nd.selfClosing) flushLink()
            case "img" =>
              nd.attr("src").map(_.trim).filter(_.nonEmpty).foreach { src =>
                val alt = nd.attr("alt").map(a => Entities.decode(a)
                  .replaceAll("([\\\\\\[\\]])", "\\\\$1")).getOrElse("")
                inlineMark("![" + alt + "](" + dest(Entities.decode(src)) + ")")
              }
            case _ =>
          }
        case NodeType.CloseTag =>
          tag match {
            case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" | "p" | "div" |
                 "table" | "tr" | "dt" | "dd" =>
              flushLink()
              blockBreak()
            case "ul" | "ol" =>
              flushLink()
              if (listDepth > 0) {
                listDepth -= 1
                olCounters = olCounters.drop(1)
              }
              if (listDepth == 0) blockBreak() else newline()
            case "li" =>
              closeEmphasis()
              flushLink()
              newline()
            case "blockquote" =>
              flushLink()
              blockBreak()
              if (quoteDepth > 0) quoteDepth -= 1
            case "pre" =>
              if (pre) {
                pre = false
                newline()
                out.append("```")
                lineStart = false
                blockBreak()
              }
            case "code" if inlineCode =>
              inlineCode = false
              inlineMark("`")
            case "b" | "strong" =>
              emphasis match {
                case "**" :: rest => inlineMark("**"); emphasis = rest
                case _ =>
              }
            case "i" | "em" =>
              emphasis match {
                case "*" :: rest => inlineMark("*"); emphasis = rest
                case _ =>
              }
            case "a" => flushLink()
            case _ =>
          }
        case NodeType.Content if dropDepth == 0 =>
          if (pre) {
            // raw text: no escaping, internal newlines preserved
            val txt = if (nd.isCdata) nd.text else Entities.decode(nd.text)
            if (txt.nonEmpty) {
              out.append(txt)
              lineStart = txt.charAt(txt.length - 1) == '\n'
            }
          } else {
            val txt = if (nd.isCdata) nd.text else Entities.decode(nd.text)
            if (inAnchor) textAnchor(txt) else textOut(txt)
          }
        case _ =>
      }
      true
    }
    closeEmphasis()
    flushLink()
    // trim trailing whitespace/newlines
    var end = out.length
    while (end > 0 && (out.charAt(end - 1) == '\n' || out.charAt(end - 1) == ' '))
      end -= 1
    out.substring(0, end)
  }
}
