package graft.sources

/** robots.txt (RFC 9309) — the crawl-frontier gate every fetch fleet
  * applies before touching a host. Parsing: line-oriented, `#` comments,
  * case-insensitive field names, CR-tolerant; groups are runs of
  * consecutive `User-agent` lines followed by their rules; `Sitemap`
  * and unknown directives are ignored (per the RFC they are neither
  * group members nor group breaks for rule purposes — we treat unknown
  * lines as inert). Matching: a rule's path pattern supports `*`
  * (any octet sequence) and a trailing `$` (end anchor); the group is
  * selected by the LONGEST user-agent token that is a prefix of the
  * product token (falling back to `*`); within the group the rule with
  * the longest pattern (octet count) wins, and on a tie Allow beats
  * Disallow. No matching rule, or no matching group, means allowed.
  *
  * At cluster scale the parsed per-host rule set is a bounded broadcast
  * (one entry per host — control-plane state, never corpus-shaped), and
  * the allow decision is a map-side function of the URL path:
  * [[graft.engine.Crawl.robotsGate]] wires exactly that shape.
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  final case class Group(agents: Vector[String], rules: Vector[Rule])

  final case class Rules(groups: Vector[Group]) {

    /** The group whose agent token longest-prefix-matches `agent`
      * (case-insensitive), `*` as fallback. */
    private def groupFor(agent: String): Option[Group] = {
      val a = agent.toLowerCase(java.util.Locale.ROOT)
      val named = groups.flatMap { g =>
        g.agents.filter(t => t != "*" && a.startsWith(t))
          .map(t => (t.length, g))
      }
      if (named.nonEmpty) Some(named.maxBy(_._1)._2)
      else groups.find(_.agents.contains("*"))
    }

    /** RFC 9309 §2.2.2: longest-pattern rule wins; Allow wins ties. */
    def allowed(agent: String, path: String): Boolean =
      groupFor(agent) match {
        case None => true
        case Some(g) =>
          val hits = g.rules.filter(r =>
            r.pattern.nonEmpty && patternMatches(r.pattern, path))
          if (hits.isEmpty) true
          else {
            val best = hits.map(_.pattern.length).max
            hits.filter(_.pattern.length == best).exists(_.allow)
          }
      }
  }

  /** Glob match with `*` (any sequence) and a trailing `$` end anchor;
    * all other characters literal. Without `$` the pattern matches as a
    * prefix (implicit trailing `*`). Iterative two-pointer with star
    * backtracking — linear-ish, no regex compilation per URL. */
  private[graft] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat0 = if (anchored) pattern.dropRight(1) else pattern
    val pat = if (anchored) pat0 else pat0 + "*"
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (si < path.length) {
      if (pi < pat.length && (pat.charAt(pi) == path.charAt(si))) {
        pi += 1; si += 1
      } else if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (starPi >= 0) {
        pi = starPi + 1; starSi += 1; si = starSi
      } else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** Parse a robots.txt body. Tolerates blank lines anywhere; a
    * `User-agent` line after rules starts a NEW group (consecutive
    * agent lines share one). */
  def parse(text: String): Rules = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty
    }
    text.split("\n", -1).foreach { raw =>
      val line = raw.stripSuffix("\r")
      val noComment = {
        val h = line.indexOf('#')
        if (h >= 0) line.substring(0, h) else line
      }
      val colon = noComment.indexOf(':')
      if (colon > 0) {
        val field = noComment.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = noComment.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents :+= value.toLowerCase(java.util.Locale.ROOT)
            inAgents = true
          case "allow" =>
            inAgents = false
            if (agents.nonEmpty) rules :+= Rule(allow = true, value)
          case "disallow" =>
            inAgents = false
            // empty Disallow = no rule (allow everything)
            if (agents.nonEmpty && value.nonEmpty)
              rules :+= Rule(allow = false, value)
          case _ => () // sitemap, crawl-delay, unknown: inert
        }
      }
    }
    flush()
    Rules(groups.result())
  }
}
