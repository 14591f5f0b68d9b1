package graft.core

/** Clean-room URL canonicalization — the normalization pass a crawl
  * pipeline runs before url-keyed dedup/partitioning, so that
  * `HTTP://Example.COM:80/a%2Fb?x#frag` and `http://example.com/a%2Fb?x`
  * collapse to one key. Rules (RFC 3986 §6 syntax-based normalization,
  * the safe subset that never changes dereference semantics):
  *
  *   - ASCII whitespace trimmed;
  *   - scheme and host lowercased;
  *   - default ports stripped (http:80, https:443);
  *   - fragment removed;
  *   - percent-encodings: hex digits uppercased; octets that encode
  *     UNRESERVED characters (ALPHA / DIGIT / - . _ ~) are decoded;
  *     reserved octets (e.g. %2F) are left encoded — decoding them WOULD
  *     change semantics;
  *   - raw spaces in path/query encode to %20;
  *   - empty path before a query/end becomes "/";
  *   - query: percent-normalization (hex-case, unreserved-decode,
  *     space→%20) IS applied, but parameters are never reordered —
  *     reordering changes semantics on real sites, so the invariant is
  *     "no parameter reordering", not byte-preservation.
  *
  * Idempotent (property-tested), never throws; input that does not look
  * like scheme://… is returned trimmed-only.
  */
object UrlCanon {

  @inline private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  @inline private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Normalize percent-encodings in `s` (path/query portion). */
  private def normPercent(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else if (c == '%') {
        // a '%' NOT opening a valid escape is itself encoded: leaving it
        // raw lets a later unreserved-decode create a brand-new escape
        // next pass ("%%%42a" → "%%Ba" → "%%BA" — fuzz-found), breaking
        // idempotence; %25 is also what a conformant producer would emit
        sb.append("%25")
        i += 1
      } else if (c == ' ') {
        // spaces in path/query encode to %20: browsers emit them raw, but
        // a raw space left at the END of a path (after fragment strip)
        // would be eaten by the next pass's trim — encoding restores both
        // validity and idempotence
        sb.append("%20")
        i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** RFC 3986 §5 reference resolution for link-graph construction:
    * resolve `ref` (an href as it appears in a page) against `base` (the
    * page url) and canonicalize the result. Delegates the merge algorithm
    * to `java.net.URI.resolve` — the JDK's public implementation of the
    * same RFC — guarded to NEVER throw. None for references that yield no
    * crawlable edge: empty/fragment-only (same document), non-http(s)
    * schemes (mailto:, javascript:, data:), host-less results, and
    * unparsable input.
    */
  def resolve(base: String, ref: String): Option[String] = {
    if (base == null || ref == null) return None
    val r = ref.trim
    if (r.isEmpty || r.charAt(0) == '#') return None
    if (r.charAt(0) == '?') {
      // RFC 3986 §5.3: a query-only reference keeps the base PATH
      // ("page.html?y=2"); java.net.URI still implements the older RFC
      // 2396 merge here and drops the last segment — compose by hand and
      // re-enter with an absolute reference (which resolve() passes
      // through verbatim)
      val b = base.trim
      val cut = b.indexWhere(c => c == '?' || c == '#') match {
        case -1 => b
        case i  => b.substring(0, i)
      }
      return resolve(cut + r, cut + r)
    }
    try {
      val u = new java.net.URI(base.trim).resolve(r)
      val scheme = u.getScheme
      if (scheme == null ||
          !(scheme.equalsIgnoreCase("http") || scheme.equalsIgnoreCase("https")) ||
          u.getHost == null || u.getHost.isEmpty) None
      else {
        // strip the fragment before canonicalizing (canonicalize would
        // drop it anyway; doing it here keeps the URI round-trip exact)
        val s = u.toString
        val h = s.indexOf('#')
        Some(canonicalize(if (h >= 0) s.substring(0, h) else s))
      }
    } catch {
      case _: Exception => None // URISyntaxException and friends
    }
  }

  def canonicalize(url: String): String = {
    if (url == null) return null
    val t = url.trim
    val ss = t.indexOf("://")
    if (ss <= 0) return t
    val scheme = t.substring(0, ss).toLowerCase(java.util.Locale.ROOT)
    // authority ends at the first of / ? #
    var ae = ss + 3
    while (ae < t.length && t.charAt(ae) != '/' && t.charAt(ae) != '?' &&
      t.charAt(ae) != '#') ae += 1
    var auth = t.substring(ss + 3, ae)
    // userinfo (rare in crawls) kept verbatim; lowercase only the host part
    val at = auth.lastIndexOf('@')
    val (user, hostPort) =
      if (at >= 0) (auth.substring(0, at + 1), auth.substring(at + 1))
      else ("", auth)
    val colon = hostPort.lastIndexOf(':')
    val (host0, port) =
      if (colon >= 0 && hostPort.drop(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    val host = host0.toLowerCase(java.util.Locale.ROOT)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    auth = user + host + (if (keepPort) ":" + port else "")
    // rest: path[?query][#fragment] — fragment dropped
    var rest = t.substring(ae)
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    val q = rest.indexOf('?')
    val (path0, query) =
      if (q >= 0) (rest.substring(0, q), rest.substring(q)) else (rest, "")
    val path = if (path0.isEmpty) "/" else normPercent(path0)
    scheme + "://" + auth + path +
      (if (query.isEmpty) "" else "?" + normPercent(query.substring(1)))
  }
}
