package graft.core

/** Clean-room robots.txt parser + matcher, RFC 9309 (public spec):
  * user-agent groups, Allow/Disallow path rules, longest-match-wins with
  * Allow winning length ties, `*`-group fallback, case-insensitive
  * directive names, `#` comments, unknown directives ignored, damaged
  * input never throws. Path rules support the RFC 9309 §2.2.3 special
  * characters: `*` matches any character sequence (including empty and
  * `/`), and a FINAL `$` anchors the match at the end of the path (a `$`
  * anywhere else is literal, matching Google's published semantics).
  * Rules without either special character match as plain prefixes —
  * byte-identical to the RFC-baseline behavior of earlier rounds. Rule
  * precedence is by the as-written pattern length (wildcard and anchor
  * characters count), Allow winning length ties — the "most specific
  * match" rule of RFC 9309 §2.2.2 as implemented by Google's open-source
  * matcher.
  *
  * This is the crawl-politeness leg of an extraction pipeline: the parsed
  * rules become a per-host table and url admission is a longest-prefix
  * join (see queries.Relational.q59RobotsFilter for the distributed form,
  * oracle-checked through this parser).
  */
object RobotsTxt {

  /** One path rule: allow/disallow for a path prefix. */
  final case class Rule(path: String, allow: Boolean)

  /** Parse the robots.txt body and return the rules of the group that
    * governs `userAgent` (exact token match, case-insensitive), falling
    * back to the `*` group; empty if neither exists. Multiple groups for
    * the same agent merge, per RFC 9309 §2.2.1.
    */
  def rulesFor(body: String, userAgent: String): Vector[Rule] = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    val exact = Vector.newBuilder[Rule]
    val star = Vector.newBuilder[Rule]
    var exactSeen = false
    // current group's agent tokens; a UA line after rules starts a NEW group
    var agents: List[String] = Nil
    var groupHasRules = false
    body.linesIterator.foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (groupHasRules) { agents = Nil; groupHasRules = false }
            val v = value.toLowerCase(java.util.Locale.ROOT)
            agents = v :: agents
            // group EXISTENCE suppresses the * fallback, even if the group
            // ends up with zero rules (RFC 9309 group selection — an empty
            // matching group means "everything allowed", not "use *")
            if (v == ua) exactSeen = true
          case "allow" | "disallow" =>
            groupHasRules = true
            // empty Disallow means "allow everything" — no rule (RFC)
            if (value.nonEmpty) {
              val r = Rule(value, allow = key == "allow")
              if (agents.contains(ua)) { exact += r; exactSeen = true }
              if (agents.contains("*")) star += r
            } else if (agents.contains(ua)) exactSeen = true
          case "crawl-delay" =>
            // not a path rule, but it IS a group member line (Bing/Yandex
            // semantics): it must terminate user-agent accumulation here
            // exactly as it does in crawlDelayFor, or the two parsers
            // would attribute subsequent lines of the same body to
            // DIFFERENT groups (round-4 review finding)
            groupHasRules = true
          case _ => // sitemap, junk: ignored (group-neutral per RFC 9309)
        }
      }
    }
    if (exactSeen) exact.result() else star.result()
  }

  /** Crawl-delay in seconds for the group governing `userAgent` — the
    * de-facto extension (Bing/Yandex; not in RFC 9309, which is why it is
    * a separate accessor rather than a Rule). Group selection mirrors
    * [[rulesFor]]: an exact-agent group suppresses the `*` group even if
    * only the other group carries the delay; unparsable or negative values
    * are ignored; the LAST value of the winning group's merged sections
    * wins. None ⇒ no delay declared.
    */
  def crawlDelayFor(body: String, userAgent: String): Option[Double] = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    var exact: Option[Double] = None
    var star: Option[Double] = None
    var exactSeen = false
    var agents: List[String] = Nil
    var groupHasRules = false
    body.linesIterator.foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (groupHasRules) { agents = Nil; groupHasRules = false }
            val v = value.toLowerCase(java.util.Locale.ROOT)
            agents = v :: agents
            if (v == ua) exactSeen = true
          case "allow" | "disallow" =>
            groupHasRules = true
            if (agents.contains(ua)) exactSeen = true
          case "crawl-delay" =>
            groupHasRules = true
            val d = try {
              val x = value.toDouble
              if (java.lang.Double.isFinite(x) && x >= 0) Some(x) else None
            } catch { case _: NumberFormatException => None }
            if (d.isDefined) {
              if (agents.contains(ua)) { exact = d; exactSeen = true }
              if (agents.contains("*")) star = d
            }
          case _ =>
        }
      }
    }
    if (exactSeen) exact else star
  }

  /** Does `pattern` match `path`, anchored at the path start?
    * `*` matches any character sequence; a final `$` requires the match to
    * consume the whole path. Patterns with neither special character reduce
    * exactly to `path.startsWith(pattern)`. Greedy leftmost placement of
    * each literal segment is complete for this pattern language (the only
    * wildcard is unbounded `*`), so no backtracking is needed.
    */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    if (pat.indexOf('*') < 0) {
      // fast path: plain prefix (or exact match when anchored)
      if (anchored) path == pat else path.startsWith(pat)
    } else {
      val parts = pat.split("\\*", -1)
      if (!path.startsWith(parts(0))) return false
      var pos = parts(0).length
      var i = 1
      while (i < parts.length) {
        val seg = parts(i)
        if (i == parts.length - 1 && anchored) {
          // last literal must sit at the very end, at or after pos
          if (!(path.endsWith(seg) && path.length - seg.length >= pos))
            return false
          pos = path.length
        } else {
          val idx = path.indexOf(seg, pos)
          if (idx < 0) return false
          pos = idx + seg.length
        }
        i += 1
      }
      true
    }
  }

  /** Is `path` allowed under `rules`? Longest matching pattern (as-written
    * length) wins; Allow wins a length tie; no match ⇒ allowed
    * (RFC 9309 §2.2.2-2.2.3).
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (patternMatches(r.path, path)) {
        val l = r.path.length
        if (l > bestLen || (l == bestLen && r.allow && !bestAllow)) {
          bestLen = l
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** Translate a robots path pattern into an anchored Java/RE2-compatible
    * regex implementing [[patternMatches]]'s semantics — used by the
    * distributed q61 twin so Spark's `regexp_like` and DuckDB's
    * `regexp_matches` evaluate the SAME wildcard decision the in-JVM
    * matcher makes. All regex metacharacters in the pattern are escaped;
    * only `*` (→ `.*`, DOTALL-safe via `[\s\S]*`) and a final `$` survive
    * as operators. The end anchor is emitted as `\z` (end of TEXT), not
    * `$`: in Java regex `$` also matches just before a trailing line
    * terminator, so a path ending in `\n` would match an anchored pattern
    * under `regexp_like` but not under [[patternMatches]] (exact `==`) or
    * RE2's default `$` (round-4 advice finding). Both Java and RE2 accept
    * `\z` with identical end-of-input semantics.
    */
  def patternToRegex(pattern: String): String = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val sb = new StringBuilder("^")
    pat.foreach {
      case '*' => sb.append("[\\s\\S]*")
      case c if "\\^$.|?*+()[]{}".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append("\\z")
    sb.toString
  }
}
