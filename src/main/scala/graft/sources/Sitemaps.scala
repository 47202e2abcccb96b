package graft.sources

/** sitemap.xml (sitemaps.org protocol 0.9) — the URL-discovery side of
  * the crawl frontier: a host publishes either a `<urlset>` of page
  * entries or a `<sitemapindex>` pointing at child sitemaps. This is
  * the companion of [[RobotsTxt]]: robots.txt says what a crawler MAY
  * fetch, sitemaps say what the host WANTS fetched —
  * [[graft.engine.Crawl.crawlFrontier]] composes the two with the
  * seen-before set into fetch waves.
  *
  * Parsing is a documented LAW over a deliberately small XML subset —
  * exactly what the protocol emits — so the DuckDB twin can restate the
  * extracted entries without parsing XML (the q230 device):
  *
  *  1. `<?...?>` processing instructions and `<!--...-->` comments are
  *     skipped wherever markup is legal (unterminated ones reject).
  *  2. Element names match by LOCAL name: an optional namespace prefix
  *     up to `:` is dropped (`<sm:loc>` ≡ `<loc>`); attributes
  *     (xmlns declarations and friends) are skipped quote-aware and
  *     otherwise ignored.
  *  3. The root must be `urlset` or `sitemapindex`; its entry children
  *     must be `url` / `sitemap` respectively. Anything else rejects —
  *     a feed, an HTML error page, or an atom document served where a
  *     sitemap was promised must fail loudly, never parse as zero
  *     entries (the subset-decoder posture: wrongness-impossibility
  *     over best-effort).
  *  4. Inside an entry, leaf fields are read by local name: `loc`
  *     (required — an entry without one rejects), `lastmod`,
  *     `changefreq`, `priority` (optional). Unknown leaf elements are
  *     skipped whole (the protocol allows extensions); nested entry
  *     containers reject.
  *  5. Leaf text is the concatenation of character data — entity
  *     references decoded (`&amp;` `&lt;` `&gt;` `&quot;` `&apos;`,
  *     `&#d;`, `&#xh;`; an unknown or unterminated entity rejects) —
  *     and `<![CDATA[...]]>` sections taken LITERALLY; the assembled
  *     text is then trimmed.
  *
  * Scale shape: one sitemap is one bounded control-plane document per
  * host, parsed map-side next to the fetch; the parsed entries are the
  * row-shaped output, so discovery is a flatMap — never a driver-side
  * collection ([[graft.engine.Crawl.sitemapDiscover]]).
  */
object Sitemaps {

  /** One discovered entry: a page URL (`urlset`) or a child sitemap
    * URL (`sitemapindex`), with the protocol's optional metadata. */
  final case class Entry(loc: String, lastmod: Option[String],
      changefreq: Option[String], priority: Option[Double])

  /** A parsed sitemap document: `kind` is `"urlset"` or
    * `"sitemapindex"`. */
  final case class Doc(kind: String, entries: Vector[Entry])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"sitemap: $msg")

  /** Entity-encode character data for emission (law pass 5's inverse):
    * `&` `<` `>` must be escaped, everything else is literal. */
  private[graft] def encodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** Emit one sitemap document — the WRITER side of the protocol (a
    * host publishing its own sitemap): XML declaration, the default
    * namespace, one entry element per [[Entry]] with `<loc>` required
    * and the optional fields present when set. Priorities print with
    * one decimal (the protocol's 0.0–1.0 granularity in this engine's
    * corpora). [[parse]]([[write]](e)) == e is the round-trip law the
    * spec pins; the q250 gate proves it on the discovery surface by
    * reusing q240's oracle. */
  def write(kind: String, entries: Seq[Entry]): String = {
    require(kind == "urlset" || kind == "sitemapindex",
      s"cannot write a '$kind' document")
    val entryName = if (kind == "urlset") "url" else "sitemap"
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(s"""<$kind xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""")
    sb.append('\n')
    entries.foreach { e =>
      sb.append(s"  <$entryName><loc>")
        .append(encodeEntities(e.loc)).append("</loc>")
      e.lastmod.foreach(v =>
        sb.append("<lastmod>").append(encodeEntities(v)).append("</lastmod>"))
      e.changefreq.foreach(v =>
        sb.append("<changefreq>").append(encodeEntities(v))
          .append("</changefreq>"))
      e.priority.foreach(p =>
        sb.append("<priority>")
          // Locale.ROOT: the default-locale `f` interpolator would emit
          // a comma decimal separator under fr/de and break parse().
          .append(String.format(java.util.Locale.ROOT, "%.1f",
            java.lang.Double.valueOf(p)))
          .append("</priority>"))
      sb.append(s"</$entryName>\n")
    }
    sb.append(s"</$kind>\n")
    sb.toString
  }

  /** Parse a sitemap from WIRE BYTES — the fetch-side entry point.
    * Real-world sitemaps are predominantly gzipped (the protocol's
    * 50 MB / 50k-URL limits push publishers to compression, whether as
    * `.xml.gz` names or `Content-Encoding: gzip` transport): if the
    * bytes carry the RFC 1952 magic they are gunzipped through the
    * member reader the WARC ingest already owns
    * ([[WarcCodec.gunzipMembers]]) — a sitemap must be exactly ONE
    * member (a multi-member file is a concatenation accident or a
    * different format wearing gzip's magic; it rejects loudly, never
    * parses the first member silently). Plain bytes parse as UTF-8
    * XML directly. */
  def parseWire(bytes: Array[Byte]): Doc = {
    val xml =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
          (bytes(1) & 0xff) == 0x8b) {
        val members = WarcCodec.gunzipMembers(bytes)
        if (members.length != 1)
          fail(s"gzipped sitemap carries ${members.length} members " +
            "(want exactly 1)")
        new String(members(0), java.nio.charset.StandardCharsets.UTF_8)
      } else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    parse(xml)
  }

  /** Parse one sitemap document per the law above. */
  def parse(xml: String): Doc = {
    val p = new Parser(xml)
    p.skipMisc()
    val root = p.openTag()
    if (p.selfClosed) fail(s"self-closing root <$root/>")
    val kind = root match {
      case "urlset" | "sitemapindex" => root
      case other => fail(s"root element <$other> is not a sitemap")
    }
    val entryName = if (kind == "urlset") "url" else "sitemap"
    val entries = Vector.newBuilder[Entry]
    var done = false
    while (!done) {
      p.skipMisc()
      if (p.atEndTag()) {
        p.closeTag(kind); done = true
      } else {
        val name = p.openTag()
        if (name != entryName)
          fail(s"<$kind> child <$name> is not <$entryName>")
        if (p.selfClosed) fail(s"empty <$entryName/> entry")
        entries += parseEntry(p, entryName)
      }
    }
    p.skipMisc()
    if (!p.atEof) fail("trailing content after the root element")
    Doc(kind, entries.result())
  }

  private def parseEntry(p: Parser, container: String): Entry = {
    var loc: Option[String] = None
    var lastmod: Option[String] = None
    var changefreq: Option[String] = None
    var priority: Option[Double] = None
    var done = false
    while (!done) {
      p.skipMisc()
      if (p.atEndTag()) {
        p.closeTag(container); done = true
      } else {
        val name = p.openTag()
        name match {
          case "loc" | "lastmod" | "changefreq" | "priority"
              if p.selfClosed =>
            fail(s"empty <$name/> field")
          case "loc"        => loc = Some(p.leafText(name))
          case "lastmod"    => lastmod = Some(p.leafText(name))
          case "changefreq" => changefreq = Some(p.leafText(name))
          case "priority" =>
            val t = p.leafText(name)
            priority = Some(
              try t.toDouble
              catch { case _: NumberFormatException =>
                fail(s"priority '$t' is not a number") })
          case "url" | "sitemap" | "urlset" | "sitemapindex" =>
            fail(s"nested <$name> inside <$container> entry")
          case _ => // protocol extension: inert, skipped whole
            if (!p.selfClosed) p.skipElement(name)
        }
      }
    }
    Entry(loc.getOrElse(fail(s"<$container> entry without <loc>")),
      lastmod, changefreq, priority)
  }

  /** Decode the five named XML entities plus numeric/hex character
    * references; anything else rejects (law pass 5). */
  private[sources] def decodeEntities(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0) fail(s"unterminated entity at offset $i")
        val name = s.substring(i + 1, semi)
        name match {
          case "amp"  => out.append('&')
          case "lt"   => out.append('<')
          case "gt"   => out.append('>')
          case "quot" => out.append('"')
          case "apos" => out.append('\'')
          case n if n.startsWith("#x") || n.startsWith("#X") =>
            out.appendAll(Character.toChars(Integer.parseInt(n.drop(2), 16)))
          case n if n.startsWith("#") =>
            out.appendAll(Character.toChars(Integer.parseInt(n.drop(1))))
          case other => fail(s"unknown entity &$other;")
        }
        i = semi + 1
      }
    }
    out.toString
  }

  /** Cursor-based scanner for the subset. Element names are returned
    * as LOCAL names (prefix dropped); attributes are skipped
    * quote-aware. */
  private final class Parser(s: String) {
    private var pos = 0

    def atEof: Boolean = pos >= s.length

    private def require(cond: Boolean, msg: => String): Unit =
      if (!cond) fail(msg)

    /** Skip whitespace, comments, and processing instructions —
      * everything legal BETWEEN markup. */
    def skipMisc(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < s.length && s.charAt(pos).isWhitespace) {
          pos += 1; moved = true
        }
        if (s.startsWith("<!--", pos)) {
          val end = s.indexOf("-->", pos + 4)
          require(end >= 0, "unterminated comment")
          pos = end + 3; moved = true
        } else if (s.startsWith("<?", pos)) {
          val end = s.indexOf("?>", pos + 2)
          require(end >= 0, "unterminated processing instruction")
          pos = end + 2; moved = true
        }
      }
    }

    def atEndTag(): Boolean = s.startsWith("</", pos)

    private def localName(raw: String): String = {
      val c = raw.indexOf(':')
      if (c >= 0) raw.substring(c + 1) else raw
    }

    /** True iff the tag just read by [[openTag]] was self-closing
      * (`<x/>`). Only extension elements may be — the grammar's own
      * elements (root, entries, leaves) reject it at their use site. */
    var selfClosed: Boolean = false

    /** Read `<name attr...>` or `<name attr.../>`; returns the local
      * name and records self-closure in [[selfClosed]]. */
    def openTag(): String = {
      require(pos < s.length && s.charAt(pos) == '<',
        s"expected a start tag at offset $pos")
      pos += 1
      val start = pos
      while (pos < s.length && !s.charAt(pos).isWhitespace &&
          s.charAt(pos) != '>' && s.charAt(pos) != '/') pos += 1
      val name = s.substring(start, pos)
      require(name.nonEmpty, s"empty tag name at offset $start")
      skipAttributes()
      require(pos < s.length, s"unterminated tag <$name>")
      if (s.charAt(pos) == '/') {
        require(pos + 1 < s.length && s.charAt(pos + 1) == '>',
          s"malformed self-closing <$name>")
        selfClosed = true
        pos += 2
      } else {
        selfClosed = false
        pos += 1 // '>'
      }
      localName(name)
    }

    /** Quote-aware skip to the tag's closing `>` (the q230 HTML
      * lesson: a `>` inside a quoted attribute value is data). */
    private def skipAttributes(): Unit = {
      while (pos < s.length && s.charAt(pos) != '>' && s.charAt(pos) != '/') {
        val c = s.charAt(pos)
        if (c == '"' || c == '\'') {
          val end = s.indexOf(c, pos + 1)
          require(end >= 0, "unterminated attribute value")
          pos = end + 1
        } else pos += 1
      }
    }

    /** Consume `</name>` where the local name must equal `name`. */
    def closeTag(name: String): Unit = {
      require(s.startsWith("</", pos), s"expected </$name> at offset $pos")
      pos += 2
      val start = pos
      while (pos < s.length && s.charAt(pos) != '>') pos += 1
      require(pos < s.length, s"unterminated </$name>")
      val got = localName(s.substring(start, pos).trim)
      require(got == name, s"mismatched end tag: </$got> closes <$name>")
      pos += 1
    }

    /** Text content of a leaf element up to its end tag: character
      * data (entity-decoded) + CDATA (literal), then trimmed. A child
      * element inside a leaf rejects. */
    def leafText(name: String): String = {
      val out = new StringBuilder
      var done = false
      while (!done) {
        if (pos >= s.length) fail(s"unterminated <$name>")
        else if (s.startsWith("<![CDATA[", pos)) {
          val end = s.indexOf("]]>", pos + 9)
          require(end >= 0, "unterminated CDATA section")
          out.append(s.substring(pos + 9, end))
          pos = end + 3
        } else if (s.startsWith("<!--", pos)) {
          val end = s.indexOf("-->", pos + 4)
          require(end >= 0, "unterminated comment")
          pos = end + 3
        } else if (atEndTag()) {
          closeTag(name); done = true
        } else if (s.charAt(pos) == '<') {
          fail(s"child element inside leaf <$name>")
        } else {
          val next = s.indexOf('<', pos)
          require(next >= 0, s"unterminated <$name>")
          out.append(decodeEntities(s.substring(pos, next)))
          pos = next
        }
      }
      out.toString.trim
    }

    /** Skip an unknown (extension) element whole, including nested
      * children, tracking depth by tags; comments/CDATA inside are
      * skipped opaquely. */
    def skipElement(name: String): Unit = {
      var depth = 1
      while (depth > 0) {
        if (pos >= s.length) fail(s"unterminated extension <$name>")
        else if (s.startsWith("<![CDATA[", pos)) {
          val end = s.indexOf("]]>", pos + 9)
          require(end >= 0, "unterminated CDATA section")
          pos = end + 3
        } else if (s.startsWith("<?", pos)) {
          // a PI inside an extension is not an element — skipping it as
          // one would corrupt the depth count
          val end = s.indexOf("?>", pos + 2)
          require(end >= 0, "unterminated processing instruction")
          pos = end + 2
        } else if (s.startsWith("<!--", pos)) {
          val end = s.indexOf("-->", pos + 4)
          require(end >= 0, "unterminated comment")
          pos = end + 3
        } else if (s.startsWith("</", pos)) {
          val gt = s.indexOf('>', pos)
          require(gt >= 0, "unterminated end tag")
          pos = gt + 1; depth -= 1
        } else if (s.charAt(pos) == '<') {
          pos += 1
          while (pos < s.length && !s.charAt(pos).isWhitespace &&
              s.charAt(pos) != '>' && s.charAt(pos) != '/') pos += 1
          skipAttributes()
          require(pos < s.length, "unterminated extension tag")
          if (s.charAt(pos) == '/') { pos += 2 } // self-closing: '/>'
          else { pos += 1; depth += 1 }
        } else pos += 1
      }
    }
  }
}
