package graft

import graft.engine.Crawl
import graft.sources.RobotsTxt

/** RFC 9309 robots.txt: pattern matching (`*`, `$`), longest-match
  * precedence with Allow winning ties, group selection by longest
  * user-agent token, parse tolerances (case, CR, comments, consecutive
  * agent lines, unknown directives), and the q234 corpus arms. */
class RobotsSpec extends SparkSpecBase {

  test("pattern matching: literals, *, $ anchor") {
    import RobotsTxt.patternMatches
    assert(patternMatches("/p/", "/p/123"))       // implicit prefix
    assert(!patternMatches("/p/", "/q/123"))
    assert(patternMatches("/p/*/x", "/p/a/b/x/y")) // * spans segments
    assert(patternMatches("/p/*/x", "/p//x"))
    assert(!patternMatches("/p/*/x", "/p/ab"))
    assert(patternMatches("/*.php", "/index.php"))
    assert(patternMatches("/*.php$", "/index.php")) // anchored hit
    assert(!patternMatches("/*.php$", "/index.php3")) // anchored miss
    assert(patternMatches("/fish$", "/fish"))
    assert(!patternMatches("/fish$", "/fishing"))
    assert(patternMatches("", "/anything")) // empty = match all
  }

  test("rule precedence: longest pattern wins, Allow wins ties") {
    val r = RobotsTxt.parse(
      """User-agent: bot
        |Disallow: /p/
        |Allow: /p/public/
        |Disallow: /dup
        |Allow: /dup
        |""".stripMargin)
    assert(!r.allowed("bot", "/p/secret"))
    assert(r.allowed("bot", "/p/public/x")) // longer allow overrides
    assert(r.allowed("bot", "/dup/x"))      // equal length: allow wins
    assert(r.allowed("bot", "/elsewhere"))  // no rule matches
  }

  test("group selection: longest agent token, * fallback, no-group " +
      "default-allow; consecutive agent lines share a group") {
    val r = RobotsTxt.parse(
      """# global
        |User-agent: *
        |Disallow: /
        |
        |User-agent: graft
        |Disallow: /a/
        |
        |USER-AGENT: graftbot
        |user-agent: graftbot-img
        |Disallow: /b/
        |""".stripMargin.replace("\n", "\r\n"))
    // longest token (graftbot) beats shorter (graft) and *
    assert(r.allowed("graftbot", "/a/x"))
    assert(!r.allowed("graftbot", "/b/x"))
    // shorter product token falls to the graft group
    assert(!r.allowed("graftling", "/a/x"))
    assert(r.allowed("graftling", "/b/x"))
    // unrelated agent gets the * group
    assert(!r.allowed("otherbot", "/anything"))
    // the shared group binds both agent aliases
    assert(!r.allowed("graftbot-img", "/b/x"))
    // no * group, no match → allowed
    val r2 = RobotsTxt.parse("User-agent: x\nDisallow: /\n")
    assert(r2.allowed("unrelated", "/a"))
  }

  test("equally-specific groups MERGE (RFC 9309 §2.2.1): two groups " +
      "naming the same token apply the union of their rules; multiple " +
      "* groups likewise") {
    val r = RobotsTxt.parse(
      """User-agent: bot
        |Disallow: /a/
        |
        |User-agent: other
        |Disallow: /
        |
        |User-agent: bot
        |Disallow: /b/
        |Allow: /a/ok
        |""".stripMargin)
    // rules from BOTH `bot` groups govern, and precedence runs over the
    // merged set (the second group's longer Allow carves the first
    // group's Disallow)
    assert(!r.allowed("bot", "/a/x"))
    assert(!r.allowed("bot", "/b/x"))
    assert(r.allowed("bot", "/a/ok"))
    assert(r.allowed("bot", "/c/x"))
    val w = RobotsTxt.parse(
      """User-agent: *
        |Disallow: /x/
        |
        |User-agent: *
        |Disallow: /y/
        |""".stripMargin)
    assert(!w.allowed("anybot", "/x/1"))
    assert(!w.allowed("anybot", "/y/1"))
    assert(w.allowed("anybot", "/z/1"))
  }

  test("parse tolerances: comments, empty Disallow, unknown directives") {
    val r = RobotsTxt.parse(
      """User-agent: bot  # trailing comment
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: https://x/sitemap.xml
        |Disallow: /real/  # this one counts
        |not-a-directive-line
        |""".stripMargin)
    assert(r.allowed("bot", "/anything")) // empty Disallow = no rule
    assert(!r.allowed("bot", "/real/x"))
  }

  test("q234 corpus arms: the graftbot group governs, not *") {
    for (h <- Seq(0L, 7L, 13L, 30L, 52L)) {
      val r = RobotsTxt.parse(Crawl.robotsText(h))
      val d = (h % 10).toString
      val e = (h % 7).toString
      // a path hitting the Disallow prefix but not the longer Allow
      val blocked = s"/p/$d${if (e == "9") "8" else (e.toInt + 1)}"
      assert(!r.allowed("graftbot", blocked), s"h=$h $blocked")
      // the longer Allow overrides
      assert(r.allowed("graftbot", s"/p/$d$e"), s"h=$h allow arm")
      // a path outside the prefix: allowed for graftbot, though * blocks
      val other = s"/p/${if (d == "9") "8" else (d.toInt + 1)}"
      assert(r.allowed("graftbot", other), s"h=$h $other")
      assert(!r.allowed("randombot", other), s"h=$h * group")
    }
  }

  test("decide over effectiveRules ≡ allowed; broadcast and joined " +
      "gate forms produce identical verdicts (q234 ≡ q239)") {
    // the shared decision algebra: decide(effectiveRules) IS allowed
    for (h <- Seq(0L, 13L, 52L); p <- Seq("/p/0", "/p/31", "/p/847")) {
      val r = RobotsTxt.parse(Crawl.robotsText(h))
      assert(RobotsTxt.decide(r.effectiveRules("graftbot"), p)
        == r.allowed("graftbot", p), s"h=$h $p")
    }
    // the two Spark forms, row-for-row
    val b = Crawl.robotsGateBroadcast(spark, sf).collect().toSeq
    val j = Crawl.robotsGateJoined(spark, sf).collect().toSeq
    assert(b.nonEmpty && b == j)
  }

  test("robotsGate dispatch flips on the host-cardinality argument: " +
      "demo count -> broadcast plan, beyond-ceiling count -> joined plan") {
    // BOTH branches through the ONE call site — the dispatch is a
    // mechanism, not a constant-folded literal. The branch taken is
    // observable in the plan: the joined form has a relational Join,
    // the broadcast form has none (map-side verdicts).
    val viaDefault = Crawl.robotsGate(spark, sf)
    assert(!viaDefault.queryExecution.optimizedPlan.toString
      .contains("Join"), "demo-domain count must take the broadcast form")
    val viaJoined = Crawl.robotsGate(spark, sf,
      hostCount = Crawl.ROBOTS_BROADCAST_MAX_HOSTS + 1)
    assert(viaJoined.queryExecution.optimizedPlan.toString.contains("Join"),
      "beyond-ceiling count must take the joined form")
    // and the verdicts are identical either way
    assert(viaDefault.collect().toSeq == viaJoined.collect().toSeq)
  }

  test("crawl-delay: group-scoped, merged-max, non-numeric inert, absent -> None") {
    val r = RobotsTxt.parse(
      """User-agent: bot
        |Crawl-delay: 3
        |Disallow: /x
        |
        |User-agent: bot
        |Crawl-delay: 7.5
        |
        |User-agent: other
        |Crawl-delay: 99
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin)
    // both 'bot' groups govern (equal-length match): max of their delays
    assert(r.crawlDelay("bot").contains(7.5))
    // the wildcard group declares none
    assert(r.crawlDelay("randombot").isEmpty)
    // the decoy group's 99 never leaks to bot
    assert(!r.crawlDelay("bot").contains(99.0))
    val bad = RobotsTxt.parse(
      "User-agent: bot\nCrawl-delay: fast\nDisallow: /x\n")
    assert(bad.crawlDelay("bot").isEmpty) // non-numeric: inert
    val none = RobotsTxt.parse("User-agent: bot\nDisallow: /x\n")
    assert(none.crawlDelay("bot").isEmpty)
    // the q234 corpus: graftbot's delay is the h%7+1 formula, and the
    // decoy/wildcard groups never contribute
    for (h <- Seq(0L, 6L, 13L, 52L))
      assert(RobotsTxt.parse(Crawl.robotsText(h))
        .crawlDelay("graftbot").contains((h % 7 + 1).toDouble), s"h=$h")
  }

  test("frontier schedule: fetch_at_s = wave * host delay; wave 0 fetches now") {
    val rows = Crawl.frontierSchedule(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getString(0).drop(1).takeWhile(_.isDigit).toLong
      assert(r.getLong(4) == r.getLong(3) * (h % 7 + 1), r.toString)
    }
    assert(rows.filter(_.getLong(3) == 0L).forall(_.getLong(4) == 0L))
  }
}
