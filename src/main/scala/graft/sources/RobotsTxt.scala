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

  final case class Group(agents: Vector[String], rules: Vector[Rule],
      crawlDelay: Option[Double] = None)

  final case class Rules(groups: Vector[Group],
      sitemaps: Vector[String] = Vector.empty) {

    /** The rules governing `agent`: RFC 9309 §2.2.1 requires MERGING
      * the rules of every group whose matching user-agent token ties
      * for the longest prefix match (case-insensitive) — a robots.txt
      * with two `User-agent: bot` groups applies BOTH groups' rules
      * (ADVICE r13). With no named match, the union of all `*` groups'
      * rules applies; with no `*` group either, there are no governing
      * rules (allow everything). */
    private def governing(agent: String): Option[Vector[Group]] = {
      val a = agent.toLowerCase(java.util.Locale.ROOT)
      val named = groups.flatMap { g =>
        g.agents.filter(t => t != "*" && a.startsWith(t))
          .map(t => (t.length, g))
      }
      if (named.nonEmpty) {
        val best = named.map(_._1).max
        Some(named.collect { case (len, g) if len == best => g }.distinct)
      } else {
        val wild = groups.filter(_.agents.contains("*"))
        if (wild.nonEmpty) Some(wild) else None
      }
    }

    private def rulesFor(agent: String): Option[Vector[Rule]] =
      governing(agent).map(_.flatMap(_.rules))

    /** The `Crawl-delay` governing `agent` (a de-facto extension, not
      * RFC 9309 — parsed because real fleets honor it): the MAX over
      * the governing groups' declared delays (the conservative read
      * when merged groups disagree); None when no governing group
      * declares one. */
    def crawlDelay(agent: String): Option[Double] =
      governing(agent).flatMap { gs =>
        val ds = gs.flatMap(_.crawlDelay)
        if (ds.isEmpty) None else Some(ds.max)
      }

    /** The resolved rule list governing `agent` — group selection and
      * merging applied, patterns untouched. Empty when no group governs
      * (everything allowed). This is the precompiled per-(host, agent)
      * relation the JOINED form of the frontier gate materializes as a
      * table ([[graft.engine.Crawl.robotsRulesDf]]): group selection
      * happens once per host at build time, and the per-URL decision is
      * [[decide]] over this list. */
    def effectiveRules(agent: String): Vector[Rule] =
      rulesFor(agent).getOrElse(Vector.empty)

    /** RFC 9309 §2.2.2: longest-pattern rule wins; Allow wins ties.
      * Delegates to [[RobotsTxt.decide]] over [[effectiveRules]] — the
      * single decision algebra both gate forms share. */
    def allowed(agent: String, path: String): Boolean =
      decide(effectiveRules(agent), path)
  }

  /** The RFC 9309 §2.2.2 decision over an already-resolved rule list
    * (the [[Rules.effectiveRules]] output): longest matching pattern
    * wins, Allow wins ties, no match means allowed. Shared by the
    * broadcast and joined forms of the frontier gate so the two forms
    * cannot drift. */
  def decide(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (r.pattern.nonEmpty && r.pattern.length >= bestLen &&
          patternMatches(r.pattern, path)) {
        if (r.pattern.length > bestLen) {
          bestLen = r.pattern.length; bestAllow = r.allow
        } else bestAllow ||= r.allow // tie: Allow wins
      }
    }
    bestLen < 0 || bestAllow
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
    var delay: Option[Double] = None
    var sitemaps = Vector.empty[String]
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
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
          case "crawl-delay" =>
            inAgents = false
            // non-numeric values are inert (tolerance, like unknowns)
            if (agents.nonEmpty)
              delay = value.toDoubleOption.orElse(delay)
          case "sitemap" =>
            // NOT group-scoped (per the sitemaps.org protocol the line
            // applies to the whole file, wherever it appears) and not a
            // group break either
            if (value.nonEmpty) sitemaps :+= value
          case _ => () // unknown: inert
        }
      }
    }
    flush()
    Rules(groups.result(), sitemaps)
  }
}
