package graft.kernel

/** Robots Exclusion Protocol (RFC 9309, plus the de-facto extensions
  * every crawler honors: `Crawl-delay`, `Sitemap`) — the politeness
  * front door of a crawl pipeline. No library; the grammar is small and
  * the matching rules are where crawlers get it wrong:
  *
  *  - GROUP SELECTION: a group's `User-agent` token matches a crawler
  *    product token when it is a case-insensitive PREFIX of it; the
  *    crawler obeys the group(s) with the LONGEST matching token, and
  *    the `*` group only when nothing else matches. Multiple adjacent
  *    `User-agent` lines share one rule block; groups with the same
  *    selected token merge.
  *  - RULE SELECTION: among the group's `Allow`/`Disallow` rules whose
  *    pattern matches the URL path, the MOST SPECIFIC (longest pattern)
  *    wins; on a specificity tie ALLOW wins. No matching rule → allow.
  *    An empty `Disallow:` value matches nothing (allow-all idiom).
  *  - PATTERNS: literal path prefixes with `*` (any run of characters)
  *    and a trailing `$` (end anchor). Specificity is pattern length.
  *
  * Parsing is lenient the way the RFC demands for the open web: unknown
  * fields and malformed lines are skipped, `#` starts a comment, field
  * names are case-insensitive, BOM tolerated.
  */
object Robots {

  final case class Group(agents: Seq[String],
      rules: Seq[(Boolean, String)], // (isAllow, pattern), file order
      crawlDelay: Option[Double])

  final case class RobotsFile(groups: Seq[Group], sitemaps: Seq[String])

  def parse(text: String): RobotsFile = {
    val groups = Seq.newBuilder[Group]
    val sitemaps = Seq.newBuilder[String]
    var agents = Seq.empty[String]
    var rules = Seq.newBuilder[(Boolean, String)]
    var delay: Option[Double] = None
    var inGroup = false // false: collecting User-agent lines for the next group
    def closeGroup(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules.result(), delay)
      agents = Seq.empty
      rules = Seq.newBuilder
      delay = None
      inGroup = false
    }
    text.stripPrefix("\uFEFF").split("\r\n|\r|\n").foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case h => raw.substring(0, h)
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (inGroup) closeGroup() // a rule block ended; a new group starts
            agents :+= value.toLowerCase
          case "allow" | "disallow" if agents.nonEmpty =>
            inGroup = true
            // empty Disallow matches nothing; empty Allow is meaningless —
            // both drop (the RFC's allow-all idiom)
            if (value.nonEmpty) rules += ((field == "allow", value))
          case "crawl-delay" if agents.nonEmpty =>
            inGroup = true
            try { delay = Some(value.toDouble) } catch { case _: NumberFormatException => }
          case "sitemap" =>
            if (value.nonEmpty) sitemaps += value
          case _ =>
            if (agents.nonEmpty) inGroup = true // unknown field inside a group
        }
      }
    }
    closeGroup()
    RobotsFile(groups.result(), sitemaps.result())
  }

  /** The rules the given crawler token must obey: merge the group(s)
    * with the longest matching `User-agent` token (prefix,
    * case-insensitive); `*` only as fallback. Crawl delay: first
    * defined among the selected groups. */
  def select(rf: RobotsFile, agent: String): Group = {
    val tok = agent.toLowerCase
    val scored = rf.groups.flatMap { g =>
      val best = g.agents.filter(a => a != "*" && tok.startsWith(a))
        .map(_.length).maxOption
      best.map(_ -> g)
    }
    val chosen =
      if (scored.nonEmpty) {
        val top = scored.map(_._1).max
        scored.filter(_._1 == top).map(_._2)
      } else rf.groups.filter(_.agents.contains("*"))
    Group(Seq(tok), chosen.flatMap(_.rules),
      chosen.flatMap(_.crawlDelay).headOption)
  }

  /** Match a robots pattern against a URL path: literal prefix with `*`
    * wildcards and an optional trailing `$` anchor. Returns true when
    * the pattern matches at the START of the path. */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = splitKeepEmpty(p)
    // parts(0) must match at offset 0; later parts anywhere after, in
    // order; when anchored the final part must end at the path's end
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part, 0)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        // last literal must SUFFIX the path at or after pos
        if (path.length - part.length < pos) return false
        return path.endsWith(part)
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  private def splitKeepEmpty(p: String): Array[String] = {
    // split on '*' keeping empty segments ("a**b" → ["a","","b"],
    // "*x" → ["","x"]) so wildcard positions survive
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    while (i <= p.length) {
      if (i == p.length || p.charAt(i) == '*') {
        out += p.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.result().toArray
  }

  /** RFC 9309 verdict for a path under a selected group: most specific
    * (longest) matching pattern wins, Allow wins specificity ties, no
    * match → allowed. */
  def allowed(group: Group, path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    group.rules.foreach { case (isAllow, pattern) =>
      if (patternMatches(pattern, path)) {
        val len = pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = isAllow }
        else if (len == bestLen && isAllow) bestAllow = true
      }
    }
    bestAllow
  }
}
