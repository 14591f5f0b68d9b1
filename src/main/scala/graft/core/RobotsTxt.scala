package graft.core

/** Clean-room robots.txt parser + matcher, RFC 9309 subset (public spec):
  * user-agent groups, Allow/Disallow path rules, longest-match-wins with
  * Allow winning length ties, `*`-group fallback, case-insensitive
  * directive names, `#` comments, unknown directives ignored, damaged
  * input never throws. No wildcards-in-paths (`*`/`$` patterns are a
  * common extension, not core RFC) — a prefix match, as the RFC's
  * baseline requires.
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
          case _ => // crawl-delay, sitemap, junk: ignored
        }
      }
    }
    if (exactSeen) exact.result() else star.result()
  }

  /** Is `path` allowed under `rules`? Longest matching prefix wins; Allow
    * wins a length tie; no match ⇒ allowed (RFC 9309 §2.2.2).
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (path.startsWith(r.path)) {
        val l = r.path.length
        if (l > bestLen || (l == bestLen && r.allow && !bestAllow)) {
          bestLen = l
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }
}
