package graft

import scala.util.Random

import graft.engine.Crawl
import graft.sources.WarcCodec

/** Crawl-archive wire formats: gzip member framing over the hand-rolled
  * inflate (JDK `GZIPOutputStream`/`GZIPInputStream` as the spec oracle
  * in both directions), WARC record framing (binary-safe, by length),
  * the HTTP response envelope, the HTML→text extraction law's traps,
  * and the file-based archive reader (strict + permissive modes). The
  * QUERY gates are q230/q231/q233/q235 (DuckDB regenerates the
  * extracted text arithmetically); this spec pins the mechanisms and
  * the rejects no generative corpus reaches. */
class WarcSpec extends SparkSpecBase {

  private def jdkGzip(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload); gz.close()
    bos.toByteArray
  }

  private def jdkGunzip(wire: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(wire))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  // ------------------------------------------------------------ gzip

  test("gunzipMembers decodes JDK-written gzip (random + compressible)") {
    val rnd = new Random(4242)
    for (len <- Seq(1, 17, 1000, 65537)) {
      val random = Array.fill(len)(rnd.nextInt().toByte)
      assert(WarcCodec.gunzipMembers(jdkGzip(random)).head.toSeq
        == random.toSeq)
      val compressible = Array.tabulate(len)(i => (i % 7 + 'a').toByte)
      assert(WarcCodec.gunzipMembers(jdkGzip(compressible)).head.toSeq
        == compressible.toSeq)
    }
  }

  test("gzipMember wires are standards-readable (JDK reads them back) " +
      "at every level, with every optional header field") {
    val rnd = new Random(7)
    val payload = Array.fill(5000)(rnd.nextInt(40).toByte)
    for (level <- 0 to 9) {
      val wire = WarcCodec.gzipMember(payload, level,
        fname = if (level % 2 == 0) Some("f.bin") else None,
        fcomment = if (level % 3 == 0) Some("c") else None,
        fextra = if (level % 4 == 0) Some(Array[Byte](9, 9)) else None,
        fhcrc = level % 5 == 0)
      assert(jdkGunzip(wire).toSeq == payload.toSeq, s"level $level")
      assert(WarcCodec.gunzipMembers(wire).head.toSeq == payload.toSeq,
        s"level $level")
    }
  }

  test("multi-member concatenation decodes member-by-member") {
    val a = "first member".getBytes("UTF-8")
    val b = Array.tabulate(70000)(i => (i * 31 % 251).toByte)
    val c = Array.emptyByteArray
    val wire = WarcCodec.gzipMember(a, 1) ++ jdkGzip(b) ++
      WarcCodec.gzipMember(c, 9, fhcrc = true)
    val members = WarcCodec.gunzipMembers(wire)
    assert(members.length == 3)
    assert(members(0).toSeq == a.toSeq)
    assert(members(1).toSeq == b.toSeq)
    assert(members(2).isEmpty)
  }

  test("gzip corruption is rejected cleanly") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val wire = WarcCodec.gzipMember(payload, 6)
    def corrupt(at: Int, f: Byte => Byte): Array[Byte] = {
      val w = wire.clone(); w(at) = f(w(at)); w
    }
    // bad magic
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMembers(corrupt(0, _ => 0x1e.toByte))
    }
    // non-deflate method
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMembers(corrupt(2, _ => 7.toByte))
    }
    // reserved FLG bit
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMembers(corrupt(3, b => (b | 0x40).toByte))
    }
    // flipped CRC32 trailer byte
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMembers(
        corrupt(wire.length - 8, b => (b ^ 0x01).toByte))
    }
    // wrong ISIZE
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMembers(
        corrupt(wire.length - 4, b => (b ^ 0x01).toByte))
    }
    // truncated trailer
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMembers(wire.dropRight(3))
    }
    // header-CRC mismatch
    val hc = WarcCodec.gzipMember(payload, 6, fhcrc = true)
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMembers(hc.updated(10, (hc(10) ^ 0x01).toByte))
    }
  }

  // ------------------------------------------------------------ WARC

  test("WARC record framing is binary-safe (block may contain CRLF CRLF)") {
    val block = "top\r\n\r\nbottom \u0000 ÿ".getBytes("ISO-8859-1")
    val rec = WarcCodec.writeRecord("resource",
      Seq("WARC-Record-ID" -> "<urn:x:1>"), block)
    val second = WarcCodec.writeRecord("metadata",
      Seq("WARC-Record-ID" -> "<urn:x:2>"), "tail".getBytes("UTF-8"))
    val parsed = WarcCodec.parseRecords(rec ++ second)
    assert(parsed.length == 2)
    assert(parsed(0).warcType == "resource")
    assert(parsed(0).block.toSeq == block.toSeq)
    assert(parsed(0).header("warc-record-id").contains("<urn:x:1>"))
    assert(parsed(1).warcType == "metadata")
    assert(new String(parsed(1).block, "UTF-8") == "tail")
  }

  test("WARC envelope rejects: bad version, missing Content-Length, " +
      "overrunning length, missing terminator") {
    val good = WarcCodec.writeRecord("resource", Seq.empty,
      "x".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      WarcCodec.parseRecords("WARC/0.9\r\n\r\n".getBytes("UTF-8") ++ good)
    }
    intercept[IllegalArgumentException] {
      WarcCodec.parseRecords(
        "WARC/1.0\r\nWARC-Type: resource\r\n\r\nbody\r\n\r\n"
          .getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      WarcCodec.parseRecords(
        "WARC/1.0\r\nWARC-Type: r\r\nContent-Length: 9999\r\n\r\nshort\r\n\r\n"
          .getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      WarcCodec.parseRecords(good.dropRight(2))
    }
  }

  // ------------------------------------------------------------ HTTP

  test("HTTP response parse: status, ci headers, WARC-framed body") {
    val body = "<html>x</html>"
    val block = ("HTTP/1.1 404 Not Found\r\ncontent-type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body").getBytes("UTF-8")
    val r = WarcCodec.parseHttpResponse(block)
    assert(r.status == 404)
    assert(r.header("Content-Type").contains("text/html"))
    assert(new String(r.body, "UTF-8") == body)
    // the WARC block framing is authoritative: an HTTP Content-Length
    // that disagrees (Common Crawl's 1 MiB truncated captures keep the
    // server's original headers) is data, not an error (ADVICE r13)
    val truncated = WarcCodec.parseHttpResponse(
      "HTTP/1.1 200 OK\r\nContent-Length: 999999\r\n\r\ntruncated body"
        .getBytes("UTF-8"))
    assert(new String(truncated.body, "UTF-8") == "truncated body")
    assert(truncated.header("Content-Length").contains("999999"))
    intercept[IllegalArgumentException] {
      WarcCodec.parseHttpResponse("ICY 200 OK\r\n\r\n".getBytes("UTF-8"))
    }
  }

  // ------------------------------------------------------------ HTML

  test("HTML extraction law: each trap in isolation") {
    // quoted '>' inside an attribute does not end the tag
    assert(WarcCodec.htmlText("""a <b data-x="1>2" class='3>4'>c</b> d""")
      == "a c d")
    // script/style removed WITH content; raw '<' inside script
    assert(WarcCodec.htmlText(
      "<script>if (1 < 2) { x = \"<b>\"; }</script>keep") == "keep")
    assert(WarcCodec.htmlText("<style>p > a { }</style>keep") == "keep")
    // comments removed, unterminated comment drops to end
    assert(WarcCodec.htmlText("a<!-- hidden <b>bold</b> -->b") == "ab")
    assert(WarcCodec.htmlText("a<!-- open forever b c") == "a")
    // entities: named, decimal, hex, nbsp→space; unknown stays literal
    assert(WarcCodec.htmlText("x&amp;y &lt;z&gt; &#65;&#x42; &nbsp;w &zz; &amp")
      == "x&y <z> AB w &zz; &amp")
    // decoded '&lt;b&gt;' is TEXT, never re-parsed as markup
    assert(WarcCodec.htmlText("&lt;b&gt;not bold&lt;/b&gt;")
      == "<b>not bold</b>")
    // a lone '<' not opening a tag stays literal
    assert(WarcCodec.htmlText("1 < 2 and 2 > 1") == "1 < 2 and 2 > 1")
    // whitespace runs collapse, ends trim
    assert(WarcCodec.htmlText("  a\t\t b\n\n<p>   c   </p> ") == "a b c")
    // title
    assert(WarcCodec.htmlTitle(
      "<head><title>\n A &amp; B </title></head>") == "A & B")
    assert(WarcCodec.htmlTitle("<p>no title</p>") == "")
    // `<title` needs an element boundary: <titlebar> is NOT the title
    // element, and the real title after it must still be found
    assert(WarcCodec.htmlTitle("<titlebar>wrong</titlebar>") == "")
    assert(WarcCodec.htmlTitle(
      "<titlebar>wrong</titlebar><title>right</title>") == "right")
    assert(WarcCodec.htmlTitle("<title id=\"t\">attr ok</title>")
      == "attr ok")
  }

  test("synthWarcGz end-to-end: the extracted text equals the formula") {
    for ((id, nc) <- Seq((0L, 0L), (4L, 40L), (7L, 13L), (53L, 36L))) {
      val recs = WarcCodec.gunzipMembers(Crawl.synthWarcGz(id, nc))
        .flatMap(WarcCodec.parseRecords)
      assert(recs.map(_.warcType) ==
        (if (id % 4 == 0) Vector("warcinfo", "request", "response", "response")
         else Vector("warcinfo", "request", "response")))
      val http = recs.filter(_.warcType == "response")
        .map(r => WarcCodec.parseHttpResponse(r.block))
      val page = http.filter(_.status == 200)
      assert(page.length == 1)
      if (id % 4 == 0) assert(http.exists(_.status == 301))
      val html = new String(page.head.body, "UTF-8")
      val nt = (nc % 37 + 5).toInt
      val title = s"Doc $id :: crawl ${id % 53}"
      val tokens = (0 until nt).map { i =>
        if (i % 7 == 3) s"x&${(id + i) % 10}"
        else if (i % 11 == 5) s"AB${(id * 2 + i) % 10}"
        else s"w${(id * 61 + i * 29) % 9973}"
      }
      assert(WarcCodec.htmlTitle(html) == title)
      assert(WarcCodec.htmlText(html) ==
        s"$title $title ${tokens.mkString(" ")}")
      assert(!WarcCodec.htmlText(html).contains("EXCLUDED"))
    }
  }

  test("mainContent law: each arm in isolation") {
    val long = "this block has comfortably more than twenty five characters"
    // 1. chrome ancestry drops regardless of length
    assert(WarcCodec.mainContent(
      s"<body><nav><p>$long</p></nav><p>$long</p></body>") == long)
    assert(WarcCodec.mainContent(
      s"<aside><p>$long</p></aside><footer>$long</footer>" +
        s"<header>$long</header><p>$long</p>") == long)
    // 2. article/main override keeps short and link-dense blocks
    assert(WarcCodec.mainContent("<article><p>tiny</p></article>") == "tiny")
    assert(WarcCodec.mainContent(
      "<main><p><a href='/'>all link text here</a></p></main>")
      == "all link text here")
    // 3a. plain blocks need MAIN_MIN_BLOCK_CHARS
    assert(WarcCodec.mainContent("<p>short</p>") == "")
    assert(WarcCodec.mainContent(
      "<p>exactly-twenty-four-chr</p>") == "") // 23 < 25
    assert(WarcCodec.mainContent(s"<p>$long</p>") == long)
    // 3b. link density: a 25+ char block of mostly anchors drops
    assert(WarcCodec.mainContent(
      "<p><a href='/a'>twelve chars</a> <a href='/b'>dozen chars!</a></p>")
      == "")
    // a small link inside a long block survives, link text included
    assert(WarcCodec.mainContent(
      s"<p>$long <a href='/x'>ok</a> tail</p>") == s"$long ok tail")
    // head/title are not main content; chrome state is per-block
    assert(WarcCodec.mainContent(
      s"<head><title>T</title></head><body><p>$long</p></body>") == long)
    // kept blocks join with one space
    assert(WarcCodec.mainContent(s"<p>$long</p><div>$long</div>")
      == s"$long $long")
  }

  test("q237 corpus: the classifier's arms are all load-bearing") {
    for ((id, nc) <- Seq((0L, 0L), (3L, 17L), (7L, 36L), (12L, 9L))) {
      val nt = (nc % 37 + 5).toInt
      val html = Crawl.synthChromeHtml(id, nt)
      val text = WarcCodec.mainContent(html)
      // chrome families never survive
      assert(!text.contains("PROMO") && !text.contains("Home") &&
        !text.contains("Site") && !text.contains("rights") &&
        !text.contains("shorty") && !text.contains("Chrome"),
        s"id=$id: $text")
      // the kept text equals the law over the regenerated blocks
      def tok(p: Int, i: Int) = s"m${(id * 43 + p * 29 + i * 7) % 9973}"
      val b0 = (0 until nt / 2 + 3).map(tok(0, _)).mkString(" ")
      val b1 = (0 until (nt + 1) / 2 + 3).map(tok(1, _)).mkString(" ")
      val l0 = tok(0, 1)
      val kept = Seq(
        Option.when(b0.length >= 25 && 3 * l0.length < b0.length)(b0),
        Option.when(b1.length >= 25)(b1)).flatten
      assert(text == kept.mkString(" "), s"id=$id")
    }
  }

  test("charsetOf: parameter parse (case, quotes, absence, unknown)") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    assert(WarcCodec.charsetOf("text/html; charset=UTF-8") == UTF_8)
    assert(WarcCodec.charsetOf("text/html; CHARSET=\"iso-8859-1\"")
      == ISO_8859_1)
    assert(WarcCodec.charsetOf("text/html;charset=windows-1252").name()
      == "windows-1252")
    assert(WarcCodec.charsetOf("text/html") == UTF_8)
    intercept[Exception] {
      WarcCodec.charsetOf("text/html; charset=no-such-charset-xyz")
    }
  }

  test("charset corpus: each arm decodes to its codepoints; an " +
      "as-UTF-8 read of the legacy arms could not produce them") {
    for ((id, nc) <- Seq((0L, 10L), (1L, 11L), (2L, 12L), (7L, 33L))) {
      val recs = WarcCodec.gunzipMembers(Crawl.synthCharsetWarcGz(id, nc))
        .flatMap(WarcCodec.parseRecords)
      val http = WarcCodec.parseHttpResponse(recs.head.block)
      val cs = WarcCodec.charsetOf(http.header("Content-Type").get)
      val text = WarcCodec.htmlText(new String(http.body, cs))
      val special = (id % 3) match {
        case 0 => 'é'; case 1 => 'ñ'; case _ => '—'
      }
      assert(text.contains(special.toString + ((id + 2) % 10)))
      if (id % 3 != 0) {
        // the legacy bodies are NOT valid UTF-8 for these tokens: a
        // UTF-8 misread yields replacement/control chars, never the real
        // codepoint
        val misread = WarcCodec.htmlText(
          new String(http.body, java.nio.charset.StandardCharsets.UTF_8))
        assert(!misread.contains(special.toString))
      }
    }
  }

  // ------------------------------------------------- file-based reader

  test("readWarcArchives: per-file records from real .warc.gz on disk") {
    val dir = tmpDir("warc-read")
    for (id <- Seq(3L, 4L)) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"archive-$id.warc.gz"),
        Crawl.synthWarcGz(id, id * 11))
    }
    val df = Crawl.readWarcArchives(spark, dir)
    val rows = df.collect()
    assert(rows.length == 7) // 3 records + 4 (id=4 carries the 301)
    val byType = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byType == Map("warcinfo" -> 2, "request" -> 2, "response" -> 3))
    val statuses = rows.filter(_.getString(2) == "response")
      .map(r => r.getLong(4)).sorted
    assert(statuses.toSeq == Seq(200L, 200L, 301L))
    assert(rows.filter(_.getString(2) == "response")
      .forall(_.getString(3).startsWith("https://h")))
  }

  test("readWarcArchives permissive mode quarantines a corrupt archive " +
      "as one error row; strict mode names the file") {
    val dir = tmpDir("warc-quarantine")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "good.warc.gz"),
      Crawl.synthWarcGz(3L, 33L))
    val bad = Crawl.synthWarcGz(5L, 20L)
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x01).toByte // trailer bit
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.warc.gz"), bad)
    val rows = Crawl.readWarcArchives(spark, dir, permissive = true)
      .collect()
    val (errRows, okRows) = rows.partition(r => !r.isNullAt(7))
    assert(okRows.length == 3 &&
      okRows.forall(_.getString(0).endsWith("good.warc.gz")))
    assert(errRows.length == 1 &&
      errRows.head.getString(0).endsWith("bad.warc.gz"))
    assert(errRows.head.isNullAt(1) && errRows.head.isNullAt(4))
    // strict mode: fails, and the error chain names the file
    val e = intercept[Exception] {
      Crawl.readWarcArchives(spark, dir).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("bad.warc.gz"))
  }

  test("readWarcArchives: HTTP-level corruption is skip-and-count in " +
      "permissive mode (per-record row), loud with the file named in " +
      "strict mode") {
    val dir = tmpDir("warc-http-corrupt")
    // a structurally valid archive whose single response record carries
    // a NON-HTTP block — the archive-level parse succeeds, only the
    // per-record HTTP envelope parse fails
    val badRec = WarcCodec.writeRecord("response",
      Seq("WARC-Record-ID" -> "<urn:x:bad>",
        "WARC-Target-URI" -> "https://h0.example.com/p/0",
        "Content-Type" -> "application/http; msgtype=response"),
      "NOT-AN-HTTP/1.1 STATUS LINE\r\n\r\n".getBytes("US-ASCII"))
    val okRec = WarcCodec.writeRecord("metadata",
      Seq("WARC-Record-ID" -> "<urn:x:ok>"), "m".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "httpbad.warc.gz"),
      WarcCodec.gzipMember(okRec, 6) ++ WarcCodec.gzipMember(badRec, 6))
    val rows = Crawl.readWarcArchives(spark, dir, permissive = true)
      .collect().sortBy(_.getLong(1))
    assert(rows.length == 2)
    // the metadata record is untouched; the response record keeps its
    // envelope fields (seq, type, uri, block_len) with null http fields
    // and the error set
    assert(rows(0).getString(2) == "metadata" && rows(0).isNullAt(7))
    val bad = rows(1)
    assert(bad.getString(2) == "response")
    assert(bad.getString(3) == "https://h0.example.com/p/0")
    assert(bad.isNullAt(4) && bad.isNullAt(5) && !bad.isNullAt(6))
    assert(!bad.isNullAt(7))
    val e = intercept[Exception] {
      Crawl.readWarcArchives(spark, dir).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("httpbad.warc.gz"))
  }

  test("gzip member spans: random access decodes one member; drifted " +
      "spans fail CRC, never return wrong bytes") {
    val a = "alpha payload".getBytes("UTF-8")
    val b = Array.tabulate(5000)(i => (i * 13 % 251).toByte)
    val c = "gamma".getBytes("UTF-8")
    val wire = WarcCodec.gzipMember(a, 1, fname = Some("a")) ++
      WarcCodec.gzipMember(b, 9) ++ WarcCodec.gzipMember(c, 0)
    val spans = WarcCodec.gunzipMembersWithSpans(wire)
    assert(spans.length == 3)
    // spans tile the wire exactly
    assert(spans.head._2 == 0)
    assert(spans.map(s => s._2 + s._3).max == wire.length)
    for (((payload, off, len), i) <- spans.zipWithIndex) {
      assert(WarcCodec.gunzipMemberAt(wire, off, len).toSeq
        == payload.toSeq, s"member $i")
    }
    // a drifted offset cannot silently return wrong bytes
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMemberAt(wire, spans(1)._2 + 1, spans(1)._3)
    }
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMemberAt(wire, spans(1)._2, spans(1)._3 - 1)
    }
    // a span covering two members is rejected, not merged
    intercept[IllegalArgumentException] {
      WarcCodec.gunzipMemberAt(wire, 0, spans(0)._3 + spans(1)._3)
    }
  }

  test("CDX sidecar over real archives: probe ≡ full-decode " +
      "restriction; non-matching archives are never opened (a corrupt " +
      "one cannot fail the probe); rebuild is idempotent") {
    val dir = tmpDir("warc-cdx")
    val idx = tmpDir("warc-cdx-index")
    for (id <- Seq(3L, 4L, 8L, 9L)) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"archive-$id.warc.gz"),
        Crawl.synthWarcGz(id, id * 7))
    }
    Crawl.buildCdxIndex(spark, dir, idx)
    val index = spark.read.parquet(idx)
    // one row per response capture: ids 4 and 8 carry the 301 + 200
    assert(index.count() == 4 + 2)
    // probe one URL (id=4's): its 301 and 200 captures, nothing else
    val u4 = "https://h4.example.com/p/" + ((4 * 47) % 1009)
    val rows = Crawl.probeCdxRecords(spark, idx, Seq(u4)).collect()
    assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(200L, 301L))
    assert(rows.forall(_.getString(0) == u4))
    assert(rows.forall(_.getString(1).endsWith("archive-4.warc.gz")))
    // restriction equality against the full-decode reader
    val full = Crawl.readWarcArchives(spark, dir)
      .filter(s"warc_type = 'response' AND target_uri = '$u4'")
      .select("path", "http_status").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(full.toSeq == rows.map(r => (r.getString(1), r.getLong(3)))
      .sortBy(_._2).toSeq)
    // file pruning is REAL: corrupt a non-matching archive on disk —
    // a probe that opened it would die; ours must not
    val victim = java.nio.file.Paths.get(dir, "archive-9.warc.gz")
    val vb = java.nio.file.Files.readAllBytes(victim)
    vb(vb.length - 5) = (vb(vb.length - 5) ^ 0x01).toByte
    java.nio.file.Files.write(victim, vb)
    val again = Crawl.probeCdxRecords(spark, idx, Seq(u4)).collect()
    assert(again.length == 2)
    // ...while the same probe for the corrupted archive's URL fails loudly
    val u9 = "https://h9.example.com/p/" + ((9 * 47) % 1009)
    intercept[Exception] {
      Crawl.probeCdxRecords(spark, idx, Seq(u9)).collect()
    }
    // idempotent rebuild (same increment replaces itself)
    java.nio.file.Files.write(victim, Crawl.synthWarcGz(9L, 63L))
    Crawl.buildCdxIndex(spark, dir, idx)
    assert(spark.read.parquet(idx).count() == 6)
  }

  test("q235 corpus: stopword cadence drives every verdict arm") {
    // cadence (doc%5)+3: doc 42 -> 5 (ratio ~0.19 > 0.15: heavy), doc 4 ->
    // 7 (0.05 < ratio < 0.15: kept), doc 33 (33%11==0: no stopwords ->
    // non_en), doc 1 nc=0 (7 tokens: short)
    val verdicts = for ((id, nc) <- Seq((42L, 36L), (4L, 30L), (1L, 0L), (33L, 30L)))
      yield {
        val recs = WarcCodec.gunzipMembers(Crawl.synthEnWarcGz(id, nc))
          .flatMap(WarcCodec.parseRecords)
        val http = WarcCodec.parseHttpResponse(recs.head.block)
        // r14: the corpus gained nav/aside/footer chrome and the gate
        // path switched to mainContent — which must drop all of it
        val text = WarcCodec.mainContent(new String(http.body, "UTF-8"))
        assert(!text.contains("SIDEBAR") && !text.contains("Home") &&
          !text.contains("privacy"), s"chrome survived: $text")
        assert(text.startsWith(s"Page $id "))
        val toks = text.split(" ")
        val stop = toks.count(graft.engine.TextOps.STOPWORDS.contains(_))
        val ratio = stop.toDouble / toks.length
        if (toks.length < graft.engine.TextOps.MIN_TOKENS) "short"
        else if (ratio > graft.engine.TextOps.MAX_STOP_RATIO) "stopword_heavy"
        else if (ratio < graft.engine.TextOps.STOP_RATIO_EN) "non_en"
        else "kept"
      }
    assert(Set("stopword_heavy", "kept", "short", "non_en")
      .subsetOf(verdicts.toSet), verdicts.toString)
  }

  test("WET emission: real .warc.wet.gz files read back record-for-record") {
    val out = tmpDir("wet-out")
    Crawl.writeWetArchives(spark, sf, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz"))
    assert(files.length == Crawl.WET_SHARD_MOD)
    // read back through the user-facing reader (wet glob)
    val rows = Crawl.readWarcArchives(spark, out, glob = "*.warc.wet.gz")
      .collect()
    val nDocs = engine.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs.toInt)
    assert(rows.forall(_.getString(2) == "conversion"))
    // text equality: one shard decoded by hand matches the ingest law
    val bytes = java.nio.file.Files.readAllBytes(files.head.toPath)
    val recs = graft.sources.WarcCodec.gunzipMembers(bytes)
      .flatMap(graft.sources.WarcCodec.parseRecords)
    assert(recs.nonEmpty)
    val ingest = Crawl.warcIngest(spark, sf)
      .select("doc_id", "text_md5").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    recs.foreach { r =>
      val id = r.header("WARC-Record-ID").get
        .stripPrefix("<urn:graft:doc:").stripSuffix(">").toLong
      assert(id % Crawl.WET_SHARD_MOD == recs.head.header("WARC-Record-ID")
        .get.stripPrefix("<urn:graft:doc:").stripSuffix(">").toLong %
        Crawl.WET_SHARD_MOD)
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.block).map("%02x".format(_)).mkString
      assert(ingest(id) == md5hex, s"doc $id text drifted through WET")
    }
    // docs ascend within a shard (the Common Crawl layout)
    val ids = recs.map(_.header("WARC-Record-ID").get
      .stripPrefix("<urn:graft:doc:").stripSuffix(">").toLong)
    assert(ids == ids.sorted)
  }

  test("BOM sniff: the three HTML5 entries, precedence over lying " +
      "headers, BOM consumed, none falls back to the charset param") {
    import java.nio.charset.StandardCharsets._
    import graft.sources.WarcCodec
    val text = "caf\u00e9 page"
    val html = s"<html><body><p>$text</p></body></html>"
    def withBom(bom: Array[Int], body: Array[Byte]): Array[Byte] =
      bom.map(_.toByte).toArray ++ body
    // UTF-16LE behind a LYING latin-1 header: BOM wins
    val le = withBom(Array(0xff, 0xfe), html.getBytes(UTF_16LE))
    assert(WarcCodec.sniffBom(le).map(_._1).contains("utf-16le"))
    assert(WarcCodec.htmlText(WarcCodec.decodeHtml(le,
      "text/html; charset=iso-8859-1")) == text)
    // UTF-16BE with no charset param: BOM beats the UTF-8 default
    val be = withBom(Array(0xfe, 0xff), html.getBytes(UTF_16BE))
    assert(WarcCodec.sniffBom(be).map(_._1).contains("utf-16be"))
    assert(WarcCodec.htmlText(WarcCodec.decodeHtml(be, "text/html"))
      == text)
    // UTF-8 BOM under a lying cp1252 header: honored AND consumed
    val u8 = withBom(Array(0xef, 0xbb, 0xbf), html.getBytes(UTF_8))
    assert(WarcCodec.sniffBom(u8).map(_._1).contains("utf-8"))
    val decoded = WarcCodec.decodeHtml(u8, "text/html; charset=windows-1252")
    assert(!decoded.startsWith("\ufeff"), "BOM leaked into content")
    assert(WarcCodec.htmlText(decoded) == text)
    // no BOM: the charset parameter decides (the q233 path unchanged)
    val plain = html.getBytes(ISO_8859_1)
    assert(WarcCodec.sniffBom(plain).isEmpty)
    assert(WarcCodec.htmlText(WarcCodec.decodeHtml(plain,
      "text/html; charset=iso-8859-1")) == text)
    // a lone FE (too short for a BOM) is not sniffed
    assert(WarcCodec.sniffBom(Array(0xfe.toByte)).isEmpty)
  }

  test("q257 corpus: synthBomWarcGz serves one text law over four " +
      "transport arms") {
    for ((id, nc) <- Seq((0L, 9L), (1L, 21L), (2L, 13L), (3L, 30L),
        (5L, 17L))) {
      val nt = (nc % 21 + 4).toInt
      def tok(i: Int) =
        if (i % 3 == 1) s"\u00e9${(id + i) % 10}"
        else s"v${(id * 89 + i * 19) % 9973}"
      val expected = s"Bom $id " + (0 until nt).map(tok).mkString(" ")
      val recs = graft.sources.WarcCodec.gunzipMembers(
        Crawl.synthBomWarcGz(id, nc))
        .flatMap(graft.sources.WarcCodec.parseRecords)
      val http = graft.sources.WarcCodec.parseHttpResponse(recs.head.block)
      val got = graft.sources.WarcCodec.htmlText(
        graft.sources.WarcCodec.decodeHtml(http.body,
          http.header("Content-Type").getOrElse("")))
      assert(got == expected, s"id=$id: $got")
    }
  }

  test("chunked transfer coding: framing removed, extensions ignored, " +
      "trailers kept, TE wins over Content-Length, strict rejects") {
    import graft.sources.WarcCodec
    def resp(headers: String, wire: String): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n" + wire)
        .getBytes("ISO-8859-1")
    // basic: two chunks, one with an extension, a trailer field
    val r = WarcCodec.parseHttpResponse(resp(
      "Content-Type: text/plain\r\nTransfer-Encoding: chunked",
      "5\r\nhello\r\n6;ext=1\r\n world\r\n0\r\nX-T: v\r\n\r\n"))
    assert(new String(r.body, "US-ASCII") == "hello world")
    assert(r.header("X-T").contains("v"), "trailer lost")
    // TE wins over a (stale) Content-Length (RFC 9112 \u00a76.3)
    val both = WarcCodec.parseHttpResponse(resp(
      "Content-Length: 999\r\nTransfer-Encoding: chunked",
      "3\r\nabc\r\n0\r\n\r\n"))
    assert(new String(both.body, "US-ASCII") == "abc")
    // single-byte chunks reassemble exactly
    val tiny = WarcCodec.parseHttpResponse(resp(
      "Transfer-Encoding: chunked",
      "1\r\na\r\n1\r\nb\r\n1\r\nc\r\n0\r\n\r\n"))
    assert(new String(tiny.body, "US-ASCII") == "abc")
    // rejects: bad hex, missing CRLF after data, truncation, trailing
    // garbage, non-chunked codings
    def rejects(headers: String, wire: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](
        WarcCodec.parseHttpResponse(resp(headers, wire)))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects("Transfer-Encoding: chunked", "zz\r\nxx\r\n0\r\n\r\n",
      "bad chunk size")
    rejects("Transfer-Encoding: chunked", "3\r\nabcX\r\n0\r\n\r\n",
      "not followed by CRLF")
    rejects("Transfer-Encoding: chunked", "ff\r\nshort\r\n",
      "truncated")
    rejects("Transfer-Encoding: chunked", "1\r\na\r\n0\r\n\r\nJUNK",
      "after the final chunk")
    rejects("Transfer-Encoding: gzip", "x", "unsupported Transfer-Encoding")
  }

  test("q258 corpus: chunked and content-length framings serve one " +
      "text law; trailers surface on the %3 arm") {
    for ((id, nc) <- Seq((0L, 9L), (1L, 21L), (2L, 13L), (3L, 30L),
        (6L, 17L), (9L, 5L))) {
      val nt = (nc % 19 + 4).toInt
      def tok(i: Int) =
        if (i % 3 == 2) s"\u00e9${(id + i) % 10}"
        else s"c${(id * 101 + i * 23) % 9973}"
      val expected = s"Chunk $id " + (0 until nt).map(tok).mkString(" ")
      val recs = graft.sources.WarcCodec.gunzipMembers(
        Crawl.synthChunkedWarcGz(id, nc))
        .flatMap(graft.sources.WarcCodec.parseRecords)
      val http = graft.sources.WarcCodec.parseHttpResponse(recs.head.block)
      val got = graft.sources.WarcCodec.htmlText(
        graft.sources.WarcCodec.decodeHtml(http.body,
          http.header("Content-Type").getOrElse("")))
      assert(got == expected, s"id=$id: $got")
      val trail = http.header("X-Trail")
      if (id % 3 == 0) assert(trail.contains(s"t${id % 97}"), s"id=$id")
      else assert(trail.isEmpty, s"id=$id")
    }
  }
}
