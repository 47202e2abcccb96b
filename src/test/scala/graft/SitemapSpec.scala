package graft

import graft.engine.Crawl
import graft.sources.Sitemaps

/** sitemaps.org protocol: the XML-subset scanner's law passes (entity
  * decode, CDATA literal, local-name matching, extension skipping,
  * trim), the loud-rejection family, the generative wire arms, and the
  * q241 frontier composition's invariants. */
class SitemapSpec extends SparkSpecBase {

  // ------------------------------------------------ scanner law passes

  test("urlset parse: entities decode, CDATA literal, whitespace trims") {
    val doc = Sitemaps.parse(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>
        |    https://a.example/p?x=1&amp;y=2&#65;&#x42;
        |  </loc><priority>0.7</priority></url>
        |  <url><loc><![CDATA[https://a.example/q?r=1&amp;s=2]]></loc></url>
        |</urlset>""".stripMargin)
    assert(doc.kind == "urlset")
    assert(doc.entries.map(_.loc) == Vector(
      "https://a.example/p?x=1&y=2AB",     // decoded + trimmed
      "https://a.example/q?r=1&amp;s=2"))  // CDATA: literal, no decode
    assert(doc.entries.head.priority.contains(0.7))
    assert(doc.entries(1).priority.isEmpty)
  }

  test("namespace prefixes match by local name; quoted '>' in attributes") {
    val doc = Sitemaps.parse(
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9" data-trap="a>b">
        |  <sm:url><sm:loc>https://b.example/1</sm:loc>
        |    <sm:lastmod>2026-01-02</sm:lastmod></sm:url>
        |</sm:urlset>""".stripMargin)
    assert(doc.entries == Vector(Sitemaps.Entry(
      "https://b.example/1", Some("2026-01-02"), None, None)))
  }

  test("extension elements skip whole: nested decoy <image:loc> is not the entry's loc") {
    val doc = Sitemaps.parse(
      """<urlset>
        |  <url>
        |    <image:image><image:loc>https://decoy.example/x.png</image:loc>
        |      <image:caption>c</image:caption></image:image>
        |    <loc>https://c.example/real</loc>
        |    <mobile:mobile/>
        |    <changefreq>daily</changefreq>
        |  </url>
        |</urlset>""".stripMargin)
    assert(doc.entries == Vector(Sitemaps.Entry(
      "https://c.example/real", None, Some("daily"), None)))
  }

  test("sitemapindex parse: child locs with comments between entries") {
    val doc = Sitemaps.parse(
      """<sitemapindex>
        |  <sitemap><loc>https://d.example/s-0.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
        |  <!-- decoy -->
        |  <sitemap><loc>https://d.example/s-1.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin)
    assert(doc.kind == "sitemapindex")
    assert(doc.entries.map(_.loc) ==
      Vector("https://d.example/s-0.xml", "https://d.example/s-1.xml"))
  }

  // ------------------------------------------------ loud rejections

  private def rejects(xml: String, needle: String): Unit = {
    val e = intercept[IllegalArgumentException](Sitemaps.parse(xml))
    assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
  }

  test("rejection family: wrong root, missing loc, bad entity, structure") {
    rejects("<html><body>404</body></html>", "not a sitemap")
    rejects("<urlset><url><priority>0.1</priority></url></urlset>",
      "without <loc>")
    rejects("<urlset><url><loc>https://x&nbsp;y</loc></url></urlset>",
      "unknown entity")
    rejects("<urlset><url><loc>x&amp y</loc></url></urlset>",
      "unterminated entity")
    rejects("<urlset><url><urlset></urlset></url></urlset>", "nested")
    rejects("<urlset><url><loc>x</loc></url></urlset><urlset/>",
      "trailing content")
    rejects("<urlset><url><loc>x</loc></wrong></urlset>", "mismatched")
    rejects("<urlset><url><loc/></url></urlset>", "empty <loc/>")
    rejects("<urlset><url/></urlset>", "empty <url/>")
    rejects("<urlset><url><loc>x</loc></url><!-- open", "unterminated")
    rejects("<urlset><url><loc><![CDATA[x]]</loc></url></urlset>",
      "unterminated CDATA")
    rejects("<urlset><url><loc><b>x</b></loc></url></urlset>",
      "child element inside leaf")
    rejects("<urlset><url><priority>fast</priority><loc>x</loc></url></urlset>",
      "not a number")
  }

  // ------------------------------------------------ generative wires

  test("every wire arm round-trips through the parser (all hosts, both children)") {
    for (h <- 0L until 53L; c <- 0 to 1) {
      val doc = Sitemaps.parse(Crawl.sitemapChildWire(h, c))
      assert(doc.kind == "urlset")
      val n = Crawl.sitemapUrlCount(h, c)
      assert(doc.entries.length == n)
      doc.entries.zipWithIndex.foreach { case (e, k) =>
        val m = Crawl.sitemapPathNum(h, c, k)
        assert(e.loc.contains(s"/p/$m"), s"(h=$h c=$c k=$k): ${e.loc}")
        if (k % 5 == 4) assert(e.loc.endsWith(s"?x=$k&y=${h % 10}"))
        else assert(!e.loc.contains("?"))
        assert(e.lastmod.exists(_.startsWith("2026-")))
        assert((k % 3 == 1) == e.lastmod.exists(_.contains("T")))
        assert((k % 4 == 2) == e.priority.isEmpty)
        assert((k % 6 == 3) == e.changefreq.nonEmpty)
        assert(!e.loc.contains("decoy"), "extension loc leaked into entry loc")
      }
    }
  }

  test("index wire parses and its parsed locs fetch the right children") {
    for (h <- Seq(0L, 7L, 52L)) {
      val idx = Sitemaps.parse(Crawl.sitemapIndexWire(h))
      assert(idx.kind == "sitemapindex" && idx.entries.length == 2)
      idx.entries.zipWithIndex.foreach { case (child, c) =>
        val body = Crawl.fetchSitemap(h, child.loc)
        assert(Sitemaps.parseWire(body).entries.length ==
          Crawl.sitemapUrlCount(h, c))
      }
    }
  }

  test("gzipped wire share: gz magic exactly where the formula says, " +
      "parseWire ≡ parse on the decoded bytes, multi-member rejects") {
    def isGz(b: Array[Byte]) =
      (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b
    var sawGz = 0; var sawPlain = 0
    for (h <- 0L until 53L; which <- -1 to 1) {
      val loc =
        if (which == -1) s"https://${Crawl.host(h)}/sitemap.xml"
        else s"https://${Crawl.host(h)}/sitemap-$which.xml"
      val body = Crawl.fetchSitemap(h, loc)
      assert(isGz(body) == Crawl.sitemapGzipped(h, which),
        s"h=$h which=$which")
      if (isGz(body)) sawGz += 1 else sawPlain += 1
      // transport is invisible to the parsed entries
      val viaWire = Sitemaps.parseWire(body)
      val plainXml =
        if (which == -1) Crawl.sitemapIndexWire(h)
        else Crawl.sitemapChildWire(h, which)
      assert(viaWire == Sitemaps.parse(plainXml), s"h=$h which=$which")
    }
    assert(sawGz > 0 && sawPlain > 0, "both transports must be on the wire")
    // a concatenation of two valid gzip members must reject loudly,
    // never silently parse the first member
    val one = Crawl.fetchSitemap(1L, s"https://${Crawl.host(1L)}/sitemap.xml")
    assert(isGz(one))
    val e = intercept[IllegalArgumentException](
      Sitemaps.parseWire(one ++ one))
    assert(e.getMessage.contains("members"), s"got: ${e.getMessage}")
  }

  // ------------------------------------------------ frontier invariants

  test("frontier: waves respect the budget, paths are unseen and robots-allowed") {
    val f = Crawl.crawlFrontier(spark, sf)
    val rows = f.collect()
    assert(rows.nonEmpty)
    // budget: at most PER_HOST_FETCH_BUDGET URLs per (host, wave), and
    // waves are dense from 0 per host
    val byHost = rows.groupBy(_.getString(0))
    byHost.foreach { case (_, hs) =>
      val waves = hs.map(_.getLong(3))
      assert(waves.min == 0)
      assert(waves.toSet == (0L to waves.max).toSet)
      waves.groupBy(identity).foreach { case (w, g) =>
        assert(g.length <= Crawl.PER_HOST_FETCH_BUDGET)
        // only the last wave may be partial
        if (w < waves.max) assert(g.length == Crawl.PER_HOST_FETCH_BUDGET)
      }
    }
    // subtraction: no frontier path was ever captured
    val seen = engine.Tables.documents(spark, sf)
      .selectExpr("concat('h', doc_id % 53, '.example.com') AS host",
        "concat('/p/', (doc_id * 47) % 1009) AS path")
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    rows.foreach { r =>
      assert(!seen.contains((r.getString(0), r.getString(1))))
    }
    // gate: every frontier path is robots-allowed for graftbot
    rows.foreach { r =>
      val h = r.getString(0).drop(1).takeWhile(_.isDigit).toLong
      assert(graft.sources.RobotsTxt.parse(Crawl.robotsText(h))
        .allowed("graftbot", r.getString(1)))
    }
    // discovery is a superset: every frontier row is a discovered path
    val disc = Crawl.sitemapDiscover(spark, sf)
      .selectExpr("host",
        "substring_index(substring(loc, 9 + length(host)), '?', 1) AS path")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    rows.foreach(r => assert(disc.contains((r.getString(0), r.getString(1)))))
  }

  test("discovery via robots.txt Sitemap lines ≡ direct discovery (q247 ≡ q240)") {
    val direct = Crawl.sitemapDiscover(spark, sf).collect().toSeq
    val via = Crawl.sitemapDiscoverViaRobots(spark, sf).collect().toSeq
    assert(direct.nonEmpty && via == direct)
    // Sitemap lines are FILE-scoped: one declared inside a group and
    // one after it both surface, in file order; empty values drop
    val r = graft.sources.RobotsTxt.parse(
      """User-agent: bot
        |Disallow: /x
        |Sitemap: https://a.example/s1.xml
        |
        |Sitemap:
        |Sitemap: https://a.example/s2.xml
        |""".stripMargin)
    assert(r.sitemaps ==
      Vector("https://a.example/s1.xml", "https://a.example/s2.xml"))
    // ...and the Sitemap line neither joins nor breaks the group
    assert(!r.allowed("bot", "/x/1"))
  }

  test("writer: parse(write(e)) == e, entities re-encoded on the wire") {
    val entries = Vector(
      Sitemaps.Entry("https://w.example/p?a=1&b=2", Some("2026-03-04"),
        Some("daily"), Some(0.7)),
      Sitemaps.Entry("https://w.example/<odd>&", None, None, None),
      Sitemaps.Entry("https://w.example/plain",
        Some("2026-03-04T05:00:00+00:00"), None, Some(0.0)))
    val wire = Sitemaps.write("urlset", entries)
    // the decoded & / < / > must be ENCODED on the wire
    assert(wire.contains("https://w.example/p?a=1&amp;b=2"))
    assert(wire.contains("&lt;odd&gt;&amp;"))
    val back = Sitemaps.parse(wire)
    assert(back.kind == "urlset" && back.entries == entries)
    // index documents round-trip too
    val idx = Vector(Sitemaps.Entry("https://w.example/s-0.xml",
      Some("2026-01-01"), None, None))
    assert(Sitemaps.parse(Sitemaps.write("sitemapindex", idx)).entries == idx)
    intercept[IllegalArgumentException](Sitemaps.write("feed", entries))
  }

  test("writer priority is locale-stable: '0.7' even under fr_FR default") {
    // The `f"%.1f"` interpolator formats in the DEFAULT locale — under
    // fr/de it emits '0,7', which parse() then rejects ('priority is
    // not a number'). The writer must format in Locale.ROOT.
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.FRANCE)
      val entries = Vector(
        Sitemaps.Entry("https://w.example/p", None, None, Some(0.7)))
      val wire = Sitemaps.write("urlset", entries)
      assert(wire.contains("<priority>0.7</priority>"), wire)
      assert(Sitemaps.parse(wire).entries == entries)
    } finally java.util.Locale.setDefault(saved)
  }

  test("rewrite is invisible to discovery (q250 ≡ q240)") {
    val direct = Crawl.sitemapDiscover(spark, sf).collect().toSeq
    val rewritten = Crawl.sitemapRewrite(spark, sf).collect().toSeq
    assert(direct.nonEmpty && rewritten == direct)
  }

  test("recrawl-due: strict ISO-date comparison over discovered ∩ seen") {
    // sf0.001's 50 docs rarely intersect the discovery set — use the
    // 500-doc slice where both branches of `due` are populated
    val dir = "/root/testdata/sf0.01"
    val rows = Crawl.recrawlDue(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "corpus must exercise both due branches (incl. the same-day tie)")
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getString(3) > r.getString(2)))
      assert(r.getString(2).startsWith("2026-01-"),
        "captures are January by the corpus formula")
    }
    // every row's path was actually captured (it is in the seen set)
    val seen = engine.Tables.documents(spark, dir)
      .selectExpr("concat('h', doc_id % 53, '.example.com') AS host",
        "concat('/p/', (doc_id * 47) % 1009) AS path")
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    rows.foreach(r => assert(seen.contains((r.getString(0), r.getString(1)))))
  }
}
