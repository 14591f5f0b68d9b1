package graft.core

/** Clean-room SURT (Sort-friendly URI Reordering Transform) — the
  * web-archive community's canonical URL key form, used by CDX(J) indexes
  * (Internet Archive / IIPC convention, as publicly documented for
  * OpenWayback and pywb): the host is reversed label-by-label and joined
  * with commas so that lexicographic sort groups all URLs of a domain and
  * its subdomains together — `http://maps.example.com/a` →
  * `com,example,maps)/a`. That sort-locality is exactly what a 100 TB
  * crawl index needs: a range scan over one registrable domain becomes one
  * contiguous key range instead of a full-index filter.
  *
  * Key form produced here, applied AFTER [[UrlCanon.canonicalize]] (so
  * hex-case, default ports, fragments, scheme case are already handled):
  *
  *   - scheme dropped (http and https collapse to one key — the archive
  *     convention, since the same content is served on both);
  *   - userinfo dropped;
  *   - one leading `www.` label stripped (pywb's default canonicalizer
  *     rule; `www2.` etc. are kept — they are real distinct hosts more
  *     often than aliases);
  *   - host labels reversed, comma-joined;
  *   - non-default port kept as `:port` after the reversed host;
  *   - `)` then path and query verbatim from the canonical form.
  *
  * Never throws; null → null; input without `scheme://` is returned
  * trimmed (same pass-through contract as [[UrlCanon.canonicalize]]).
  */
object Surt {

  def key(url: String): String = {
    if (url == null) return null
    val c = UrlCanon.canonicalize(url)
    val ss = c.indexOf("://")
    if (ss <= 0) return c
    var ae = ss + 3
    while (ae < c.length && c.charAt(ae) != '/' && c.charAt(ae) != '?' &&
      c.charAt(ae) != '#') ae += 1
    var auth = c.substring(ss + 3, ae)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1) // userinfo dropped
    val colon = auth.lastIndexOf(':')
    val (host0, port) =
      if (colon >= 0 && colon + 1 < auth.length &&
          auth.substring(colon + 1).forall(_.isDigit))
        (auth.substring(0, colon), auth.substring(colon)) // ":8080"
      else (auth, "")
    val host = if (host0.startsWith("www.")) host0.substring(4) else host0
    val labels = host.split('.')
    val sb = new java.lang.StringBuilder(c.length)
    var i = labels.length - 1
    while (i >= 0) {
      sb.append(labels(i))
      if (i > 0) sb.append(',')
      i -= 1
    }
    sb.append(port).append(')').append(c.substring(ae))
    sb.toString
  }
}
