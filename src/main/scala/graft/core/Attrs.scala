package graft.core

import scala.collection.mutable.ArrayBuffer

/** Lazy attribute parsing — splits a start-tag's RAW rest-of-tag string into
  * `name[=value]` pairs [R: HtmlParser.cpp · parseNodeProps] (A11, SURVEY.md
  * §3.3). Single/double-quoted and unquoted values; bare attributes get a
  * null value; source order preserved; idempotent (F-02, F-17).
  */
object Attrs {

  val Empty: Array[HAttr] = Array.empty

  def parse(raw: String): Array[HAttr] = {
    if (raw == null || raw.isEmpty) return Empty
    val n = raw.length
    val out = new ArrayBuffer[HAttr](4)
    var i = 0
    @inline def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    while (i < n) {
      while (i < n && isWs(raw.charAt(i))) i += 1
      if (i < n) {
        // name: up to '=', whitespace or end
        val ns = i
        while (i < n && !isWs(raw.charAt(i)) && raw.charAt(i) != '=') i += 1
        val name = raw.substring(ns, i)
        while (i < n && isWs(raw.charAt(i))) i += 1
        var value: String = null
        if (i < n && raw.charAt(i) == '=') {
          i += 1
          while (i < n && isWs(raw.charAt(i))) i += 1
          if (i < n && (raw.charAt(i) == '"' || raw.charAt(i) == '\'')) {
            val q = raw.charAt(i)
            i += 1
            val vs = i
            while (i < n && raw.charAt(i) != q) i += 1
            value = raw.substring(vs, i)
            if (i < n) i += 1 // skip closing quote
          } else {
            val vs = i
            while (i < n && !isWs(raw.charAt(i))) i += 1
            value = raw.substring(vs, i)
          }
        }
        if (name.nonEmpty) out += HAttr(name, value)
        else if (value == null) i += 1 // stray '=' etc: make progress
      }
    }
    out.toArray
  }
}
