package graft.ops

/** From-scratch robots.txt evaluation per RFC 9309 (the Robots
  * Exclusion Protocol) — the politeness filter every crawl pipeline
  * applies to its fetch list before fetching:
  *
  *   - groups: consecutive `User-agent:` lines share one group of
  *     `Allow:` / `Disallow:` rules; field names are case-insensitive;
  *     `#` starts a comment; unknown fields (Crawl-delay, Sitemap, …)
  *     do not split a group but are not rules;
  *   - group selection: the group whose user-agent token is the
  *     LONGEST case-insensitive substring match of the client's
  *     product token wins; the `*` group applies only when no specific
  *     group matches;
  *   - rule matching: patterns are path prefixes with `*` (any octet
  *     sequence) and a final `$` (end anchor); the MOST SPECIFIC match
  *     wins = longest pattern in octets; on a tie, Allow wins;
  *   - an empty `Disallow:` value matches nothing (allow-all), the
  *     historical convention RFC 9309 keeps; no matching rule = allowed.
  *
  * Pure per-row logic: in the query layer the (host → robots.txt) side
  * is small (one row per HOST, not per URL — hosts are ~10^7 when URLs
  * are 10^12) and broadcast-joins against the fetch list, so the
  * filter costs no shuffle on the URL side. */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  def parse(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var inAgents = true // consecutive User-agent lines accumulate
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.reverse, rules.reverse)
      agents = Nil; rules = Nil
    }
    txt.linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) { flush(); inAgents = true }
            agents ::= value.toLowerCase(java.util.Locale.ROOT)
          case "allow"    => inAgents = false; rules ::= Rule(allow = true, value)
          case "disallow" => inAgents = false; rules ::= Rule(allow = false, value)
          case _          => inAgents = false // Crawl-delay etc.: ends the UA run
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** Longest-substring-match group selection; `*` only as fallback. */
  def groupFor(groups: Seq[Group], userAgent: String): Option[Group] = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.flatMap { g =>
      g.agents.filter(a => a != "*" && ua.contains(a)).map(a => (a.length, g))
    }
    if (specific.nonEmpty) Some(specific.maxBy(_._1)._2)
    else groups.find(_.agents.contains("*"))
  }

  /** REP pattern match: literal prefix with `*` wildcards; a final `$`
    * anchors at the path end. */
  private[ops] def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false // empty Disallow: matches nothing
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    // first part must match at position 0; later parts greedy-scan
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        // last part must match at the END of the path
        return path.length - part.length >= pos && path.endsWith(part)
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** Most-specific-match decision: longest matching pattern wins;
    * Allow wins ties; no match = allowed. */
  def isAllowed(robotsTxt: String, userAgent: String, path: String): Boolean =
    groupFor(parse(robotsTxt), userAgent) match {
      case None => true
      case Some(g) =>
        val matching = g.rules.filter(r => matches(r.pattern, path))
        if (matching.isEmpty) true
        else {
          val bestLen = matching.map(_.pattern.length).max
          matching.filter(_.pattern.length == bestLen).exists(_.allow)
        }
    }
}
