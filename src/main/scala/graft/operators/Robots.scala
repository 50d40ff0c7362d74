package graft.operators

/** robots.txt parsing and rule evaluation per RFC 9309 — the
  * respect-robots filter a crawl-derived training corpus applies
  * before a document is even eligible. Implemented from the RFC:
  *
  *  - groups: consecutive `User-agent` lines share the rule block that
  *    follows; a crawler obeys ONLY the groups naming its own product
  *    token (case-insensitive identity, §2.2.1), falling back to `*` —
  *    never a union across DIFFERENT tokens (group exclusivity is the
  *    rule real parsers get wrong), but all groups naming the SAME
  *    token merge into one effective rule set;
  *  - rule matching: `Allow`/`Disallow` patterns match path prefixes
  *    with `*` wildcards and the `$` end anchor; the LONGEST matching
  *    pattern (in octets) wins; at equal length Allow wins;
  *  - an empty Disallow value disallows nothing; unknown directives
  *    (Crawl-delay, Sitemap) are skipped; comments (`#`) strip to end
  *    of line; directive names are case-insensitive; a UTF-8 BOM on
  *    the first line is tolerated; no matching rule → allowed.
  */
object Robots {

  final case class Group(agents: Seq[String],
                         rules: Seq[(Boolean, String)]) // (isAllow, pattern)

  /** Parse to groups. Lines that fit no grammar are skipped (the RFC
    * requires tolerance, not rejection). */
  def parse(text: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = Seq.newBuilder[String]
    var rules = Seq.newBuilder[(Boolean, String)]
    var agentCount = 0
    var ruleCount = 0
    def flush(): Unit = {
      if (agentCount > 0) groups += Group(agents.result(), rules.result())
      agents = Seq.newBuilder[String]; rules = Seq.newBuilder
      agentCount = 0; ruleCount = 0
    }
    text.replace("\uFEFF", "").split("\r\n|\n|\r", -1).foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case h => raw.substring(0, h)
      }
      val sep = line.indexOf(':')
      if (sep > 0) {
        val key = line.substring(0, sep).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(sep + 1).trim
        key match {
          case "user-agent" =>
            // a UA line after rules starts a NEW group
            if (ruleCount > 0) flush()
            agents += value.toLowerCase(java.util.Locale.ROOT)
            agentCount += 1
          case "allow" if agentCount > 0 =>
            rules += ((true, value)); ruleCount += 1
          case "disallow" if agentCount > 0 =>
            rules += ((false, value)); ruleCount += 1
          case _ => () // Crawl-delay, Sitemap, garbage: skipped
        }
      }
    }
    flush()
    groups.result()
  }

  /** Pattern match per RFC 9309 §2.2.3: literal octets, `*` matches
    * any sequence, `$` (only meaningful at pattern end) anchors to the
    * path end. Returns true when `pattern` matches a PREFIX of `path`
    * (or the whole path under `$`). */
  private[operators] def patternMatches(pattern: String,
                                        path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    // greedy-with-backtracking wildcard walk
    def walk(pi: Int, si: Int): Boolean = {
      var i = pi; var j = si
      var starP = -1; var starS = -1
      while (true) {
        if (i < p.length && p.charAt(i) == '*') {
          starP = i; starS = j; i += 1
        } else if (i < p.length && j < path.length &&
          p.charAt(i) == path.charAt(j)) {
          i += 1; j += 1
        } else if (i >= p.length && (!anchored || j >= path.length)) {
          return true // pattern consumed: prefix match (or exact if $)
        } else if (starP >= 0 && starS < path.length) {
          starS += 1; i = starP + 1; j = starS // backtrack the star
        } else return false
      }
      false
    }
    walk(0, 0)
  }

  /** The product token of a user-agent string: the portion before the
    * first '/' (the version separator), trimmed and lowercased —
    * RFC 9309 §2.2.1 matches on case-insensitive product-token
    * IDENTITY, not raw string prefix ("graftbot2/1.0" must NOT select
    * a "graftbot" group, and a robots token carrying its own version
    * suffix still matches the crawler it names). */
  private def productToken(s: String): String =
    s.takeWhile(_ != '/').trim.toLowerCase(java.util.Locale.ROOT)

  /** Select the crawler's rules per RFC 9309 §2.2.1: the rules of ALL
    * groups whose agent token equals the crawler's product token are
    * MERGED into one effective group (repeated `User-agent: x` blocks
    * are one group, not first-wins); on no specific match, all `*`
    * groups merge the same way; None = no group governs this crawler. */
  private def selectRules(groups: Seq[Group],
                          agent: String): Option[Seq[(Boolean, String)]] = {
    val a = productToken(agent)
    val specific = groups.filter(
      _.agents.exists(t => t != "*" && productToken(t) == a))
    if (specific.nonEmpty) Some(specific.flatMap(_.rules))
    else {
      val stars = groups.filter(_.agents.contains("*"))
      if (stars.nonEmpty) Some(stars.flatMap(_.rules)) else None
    }
  }

  /** The RFC decision: longest matching pattern wins, Allow on ties,
    * empty patterns never match as disallow, no rule → allowed. */
  def allowed(groups: Seq[Group], agent: String, path: String): Boolean =
    selectRules(groups, agent) match {
      case None => true
      case Some(rules) =>
        val matches = rules.filter { case (_, pat) =>
          pat.nonEmpty && patternMatches(pat, path)
        }
        if (matches.isEmpty) true
        else {
          val maxLen = matches.map(_._2.length).max
          // Allow wins among the longest matches
          matches.exists { case (isAllow, pat) =>
            isAllow && pat.length == maxLen }
        }
    }
}
