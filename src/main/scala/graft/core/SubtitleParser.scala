package graft.core

import scala.collection.mutable.ArrayBuffer

/** One subtitle cue: the [startMs, endMs) interval and the cleaned text —
  * inline markup stripped (`<i>`, `<c.cls>`, `<v Name>`, mid-cue
  * `<00:00:01.000>` karaoke timestamps, ASS-style `{\an8}` overrides) and
  * the five default HTML entities decoded.
  */
final case class SubtitleCue(startMs: Long, endMs: Long, text: String)

/** SRT / WebVTT subtitle parser — the transcript text source of every
  * video-adjacent webtext pipeline (captions are clean, punctuated,
  * human-written prose, and crawls surface them as standalone `.srt` /
  * `.vtt` assets next to the media the multimodal family only
  * header-parses). Public formats only: SubRip's de-facto layout
  * (index line, `HH:MM:SS,mmm --> HH:MM:SS,mmm`, payload until a blank
  * line) and the W3C WebVTT spec (`WEBVTT` magic, optional cue ids, `.`
  * decimal separator, cue settings after the end time, NOTE/STYLE/REGION
  * blocks). Structure-tolerant and never-throws: a malformed timing line
  * drops that cue, never the file; `maxCues` bounds work and memory.
  */
object SubtitleParser {

  /** "vtt" (WEBVTT magic, BOM tolerated), "srt" (first timing line uses
    * the comma decimal), or "unknown" (nothing parseable).
    */
  def kind(bytes: Array[Byte]): String = {
    val s = asString(bytes)
    if (s.startsWith("WEBVTT")) "vtt"
    else if (parse(bytes, 1).nonEmpty) "srt"
    else "unknown"
  }

  /** All cue text joined with newlines — the extraction surface. */
  def text(bytes: Array[Byte], maxCues: Int = 10000): String = {
    val cues = parse(bytes, maxCues)
    val sb = new java.lang.StringBuilder(256)
    var i = 0
    while (i < cues.length) {
      if (i > 0) sb.append('\n')
      sb.append(cues(i).text)
      i += 1
    }
    sb.toString
  }

  def parse(bytes: Array[Byte], maxCues: Int = 10000): Array[SubtitleCue] = {
    val lines = asString(bytes).split("\r\n|\n|\r", -1)
    val out = new ArrayBuffer[SubtitleCue](16)
    var i = 0
    while (i < lines.length && out.length < maxCues) {
      val l = lines(i)
      // WebVTT comment/metadata blocks: skip to the next blank line
      if (l.startsWith("NOTE") || l.startsWith("STYLE") || l.startsWith("REGION")) {
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
      } else {
        val arrow = l.indexOf("-->")
        if (arrow >= 0) {
          val start = parseTs(l.substring(0, arrow).trim)
          // cue settings ("align:start line:0%") may follow the end time
          val rest = l.substring(arrow + 3).trim
          val sp = rest.indexOf(' ')
          val end = parseTs(if (sp < 0) rest else rest.substring(0, sp))
          val payload = new java.lang.StringBuilder(64)
          i += 1
          while (i < lines.length && lines(i).trim.nonEmpty) {
            if (payload.length > 0) payload.append('\n')
            payload.append(lines(i))
            i += 1
          }
          if (start >= 0 && end >= 0)
            out += SubtitleCue(start, end, clean(payload.toString))
        }
        i += 1
      }
    }
    out.toArray
  }

  /** `HH:MM:SS.mmm` / `HH:MM:SS,mmm` / `MM:SS.mmm` → milliseconds, or −1
    * when malformed (any non-digit where a digit belongs, missing parts).
    */
  private[core] def parseTs(s: String): Long = {
    val parts = s.split(':')
    if (parts.length < 2 || parts.length > 3) return -1L
    var acc = 0L
    var p = 0
    while (p < parts.length - 1) {
      val v = digits(parts(p))
      if (v < 0) return -1L
      acc = acc * 60 + v
      p += 1
    }
    val last = parts(parts.length - 1)
    val dot = math.max(last.indexOf('.'), last.indexOf(','))
    if (dot < 0) {
      val v = digits(last)
      if (v < 0) return -1L
      return (acc * 60 + v) * 1000
    }
    val sec = digits(last.substring(0, dot))
    val fracS = last.substring(dot + 1)
    val frac = digits(fracS)
    if (sec < 0 || frac < 0 || fracS.isEmpty || fracS.length > 3) return -1L
    // 1- or 2-digit fractions scale up ("...:01.5" = 500 ms)
    var ms = frac
    var k = fracS.length
    while (k < 3) { ms *= 10; k += 1 }
    (acc * 60 + sec) * 1000 + ms
  }

  private def digits(s: String): Long = {
    if (s.isEmpty || s.length > 9) return -1L
    var v = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return -1L
      v = v * 10 + (c - '0')
      i += 1
    }
    v
  }

  /** Strip `<...>` and `{...}` runs (unterminated runs drop to EOL, per
    * the WebVTT "bad cue" recovery), collapse the markup away, decode the
    * default entity set, trim.
    */
  private[core] def clean(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    var depthA = 0 // <...>
    var depthB = 0 // {...}
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '<') depthA += 1
      else if (c == '>' && depthA > 0) depthA -= 1
      else if (c == '{') depthB += 1
      else if (c == '}' && depthB > 0) depthB -= 1
      else if (depthA == 0 && depthB == 0) sb.append(c)
      i += 1
    }
    Entities.decode(sb.toString).trim
  }

  private def asString(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xEF &&
        (bytes(1) & 0xff) == 0xBB && (bytes(2) & 0xff) == 0xBF)
      new String(bytes, 3, bytes.length - 3, java.nio.charset.StandardCharsets.UTF_8)
    else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
