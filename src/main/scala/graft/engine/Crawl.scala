package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.WarcCodec

/** Crawl-archive ingestion — the stage every LLM text pipeline starts
  * with: `.warc.gz` member decode (RFC 1952 over the hand-rolled
  * DEFLATE), WARC record parse (ISO 28500), HTTP response parse, and
  * rough HTML→text extraction, as Spark operators over
  * [[graft.sources.WarcCodec]].
  *
  * Oracle device (q230/q231): the corpus is GENERATIVE — every document
  * becomes a real multi-member `.warc.gz` byte stream
  * ([[synthWarcGz]]: warcinfo + request + optional 301 + the 200
  * text/html response, one gzip member per record, levels 0–9, FNAME /
  * FHCRC / FCOMMENT / FEXTRA header fields all exercised), and the
  * DuckDB twin regenerates the EXTRACTED TEXT arithmetically from the
  * same integer formulas. The Spark side can only reach that text
  * through the real decode chain (inflate → CRC32/ISIZE → WARC framing
  * → HTTP envelope → comment/script/style removal → quote-aware tag
  * strip → entity decode → whitespace collapse), and the gate compares
  * `md5(text)` cross-engine — any drift anywhere in the chain (a
  * mis-skipped gzip header field, a tag scanner that ends at the `>`
  * inside `data-trap="a>b"`, an undecoded `&amp;`, a surviving
  * EXCLUDEDSCRIPT token) flips the hash. Same family as the image
  * codec gates (q203/q218/q228), applied to the crawl wire.
  *
  * Scale shape: decode is map-only over documents (one scan, zero
  * shuffles before the final ordering; q231 adds one map-side-combined
  * host aggregate). At 100 TB the unit of parallelism is the archive
  * FILE (members are not block-splittable — see [[WarcCodec]] scaladoc),
  * which is exactly how Common Crawl shards: ~1 GiB archives, one task
  * each, [[readWarcArchives]] keys on `binaryFile` rows.
  */
object Crawl {

  // ---------------------------------------------- generative corpus

  private def host(docId: Long): String = s"h${docId % 53}.example.com"
  private def path(docId: Long): String = s"/p/${(docId * 47) % 1009}"
  private def url(docId: Long): String = s"https://${host(docId)}${path(docId)}"
  private def titleTxt(docId: Long): String =
    s"Doc $docId :: crawl ${docId % 53}"

  /** Token i as it appears in the EXTRACTED text: every 7th token (at
    * i%7==3) carries a decoded `&amp;`, every 11th (at i%11==5, when
    * not already an entity token) decoded numeric+hex references —
    * precedence is the %7 arm first, restated identically in the twin. */
  private def tokenWire(docId: Long, i: Int): String =
    if (i % 7 == 3) s"x&amp;${(docId + i) % 10}"
    else if (i % 11 == 5) s"&#65;&#x42;${(docId * 2 + i) % 10}"
    else s"w${(docId * 61 + i * 29) % 9973}"

  /** The page body tokens, separated by formula-varied RAW whitespace
    * (newline+indent / space / tab by i mod 3) the extractor must
    * collapse to single spaces. */
  private def tokensWire(docId: Long, nt: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < nt) {
      if (i > 0) sb.append((i % 3) match {
        case 0 => "\n  "
        case 1 => " "
        case _ => "\t"
      })
      sb.append(tokenWire(docId, i))
      i += 1
    }
    sb.toString
  }

  /** The synthetic page: DOCTYPE, head (meta/title/style/script —
    * style+script carry EXCLUDED decoy text that must be dropped with
    * their elements, the script contains a raw `<` that would survive a
    * naive tag-strip-without-element-removal), a body tag whose
    * attribute value contains `>` (the quoted-attribute trap), an HTML
    * comment decoy, the title repeated as `<h1>`, and the token
    * paragraph. Extracted text is exactly
    * `title + ' ' + title + ' ' + tokens.join(' ')`. */
  private[graft] def synthHtml(docId: Long, nt: Int): String = {
    val t = titleTxt(docId)
    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |<meta charset="utf-8">
       |<title>$t</title>
       |<style>.s${docId % 5} { color: #fff; } EXCLUDEDSTYLE</style>
       |<script type="text/javascript">var q = "EXCLUDEDSCRIPT"; if (1 < 2) { q = q + "$docId"; }</script>
       |</head>
       |<body class="c${docId % 7}" data-trap="a>b">
       |<!-- EXCLUDEDCOMMENT $docId -->
       |<h1>$t</h1>
       |<p id="t${docId % 3}">
       |${tokensWire(docId, nt)}
       |</p>
       |</body>
       |</html>""".stripMargin
  }

  private def httpResponse200(html: Array[Byte]): Array[Byte] = {
    val head = "HTTP/1.1 200 OK\r\n" +
      "Server: graft/1.0\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream(head.length + html.length)
    out.write(head.getBytes("US-ASCII"))
    out.write(html)
    out.toByteArray
  }

  private def httpResponse301(docId: Long): Array[Byte] =
    ("HTTP/1.1 301 Moved Permanently\r\n" +
      s"Location: https://${host(docId)}/old${path(docId)}\r\n" +
      "Content-Length: 0\r\n\r\n").getBytes("US-ASCII")

  private def httpRequest(docId: Long): Array[Byte] =
    (s"GET ${path(docId)} HTTP/1.1\r\n" +
      s"Host: ${host(docId)}\r\n" +
      "User-Agent: graftbot/1.0 (+https://example.com/bot)\r\n" +
      "Accept: text/html\r\n\r\n").getBytes("US-ASCII")

  private def warcDate(docId: Long): String =
    f"2026-01-${(docId % 28) + 1}%02dT00:00:00Z"

  private def record(docId: Long, seq: Int, warcType: String,
      contentType: String, block: Array[Byte],
      targetUri: Option[String]): Array[Byte] =
    WarcCodec.writeRecord(warcType,
      Seq("WARC-Record-ID" -> s"<urn:graft:$docId:$seq>",
        "WARC-Date" -> warcDate(docId),
        "Content-Type" -> contentType) ++
        targetUri.map("WARC-Target-URI" -> _),
      block)

  /** One document's `.warc.gz`: 3 records (4 when docId%4==0 — a 301
    * response precedes the 200), each in its OWN gzip member (the
    * Common Crawl layout), member compression level (docId+seq)%10 so
    * stored/fixed/dynamic DEFLATE blocks all occur, and the optional
    * gzip header fields spread across members so every header-walk arm
    * runs on real wires. */
  private[graft] def synthWarcGz(docId: Long, nChars: Long): Array[Byte] = {
    val nt = (nChars % 37 + 5).toInt
    val html = synthHtml(docId, nt).getBytes("UTF-8")
    val u = url(docId)
    val info = record(docId, 0, "warcinfo", "application/warc-fields",
      "software: graft-warc/13\r\nformat: WARC File Format 1.0\r\n"
        .getBytes("US-ASCII"), None)
    val req = record(docId, 1, "request",
      "application/http; msgtype=request", httpRequest(docId), Some(u))
    val redirect =
      if (docId % 4 == 0)
        Some(record(docId, 2, "response",
          "application/http; msgtype=response", httpResponse301(docId),
          Some(u)))
      else None
    val resp = record(docId, 3, "response",
      "application/http; msgtype=response", httpResponse200(html), Some(u))
    def lvl(seq: Int): Int = ((docId + seq) % 10).toInt
    val out = new java.io.ByteArrayOutputStream(html.length + 1024)
    out.write(WarcCodec.gzipMember(info, lvl(0), fname = Some("rec.warc")))
    out.write(WarcCodec.gzipMember(req, lvl(1), fhcrc = true))
    redirect.foreach(r =>
      out.write(WarcCodec.gzipMember(r, lvl(2), fcomment = Some("redirect"))))
    out.write(WarcCodec.gzipMember(resp, lvl(3),
      fextra = if (docId % 2 == 0) Some(Array[Byte](1, 2, 3, 4)) else None))
    out.toByteArray
  }

  // ---------------------------------------------- operators

  final case class CrawlDoc(doc_id: Long, url: String, status: Long,
      n_records: Long, title: String, text: String)

  /** Decode the whole generative archive corpus: one documents scan,
    * map-only (the decode chain runs per row inside one narrow
    * mapPartitions — no shuffle until the consumer aggregates/orders). */
  private[graft] def parsedDocs(spark: SparkSession,
      dir: String): Dataset[CrawlDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val recs = WarcCodec.gunzipMembers(synthWarcGz(id, nc))
          .flatMap(WarcCodec.parseRecords)
        val pages = recs.filter(_.warcType == "response")
          .map(r => (r, WarcCodec.parseHttpResponse(r.block)))
          .filter { case (_, h) => h.status == 200 &&
            h.header("Content-Type").exists(_.startsWith("text/html")) }
        require(pages.size == 1,
          s"doc $id: expected exactly one 200 text/html response record")
        val (rec, http) = pages.head
        val html = new String(http.body,
          java.nio.charset.StandardCharsets.UTF_8)
        CrawlDoc(id,
          rec.header("WARC-Target-URI").getOrElse(""),
          http.status.toLong, recs.size.toLong,
          WarcCodec.htmlTitle(html), WarcCodec.htmlText(html))
      })
  }

  /** q230: WARC ingest — per-document parsed fields plus the extracted
    * text's md5/length/token count (the text itself stays out of the
    * result; the hash is the gate). */
  def warcIngest(spark: SparkSession, dir: String): DataFrame =
    parsedDocs(spark, dir).toDF()
      .withColumn("text_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("text_md5", md5(col("text")))
      .drop("text")
      .orderBy("doc_id")

  /** q231: host-grain crawl stats — the decode feeding a
    * map-side-combined aggregate (the post-ingest shape: group the
    * extracted corpus by registrable host, count pages/tokens/chars and
    * redirect-carrying captures). */
  def crawlHostStats(spark: SparkSession, dir: String): DataFrame =
    parsedDocs(spark, dir).toDF()
      .select(
        regexp_extract(col("url"), "^https://([^/]+)/", 1).as("host"),
        length(col("text")).cast("long").as("chars"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        (col("n_records") === 4).cast("long").as("redir"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum("toks").as("sum_tokens"),
        sum("chars").as("sum_chars"),
        sum("redir").as("n_redirects"))
      .orderBy("host")

  // ---------------------------------------------- charset handling

  /** q233's corpus: one-response archives whose pages rotate through
    * UTF-8 / ISO-8859-1 / Windows-1252 by doc_id mod 3, each carrying
    * charset-revealing tokens (é / ñ / em-dash) that decode to
    * DIFFERENT codepoints than a wrong-charset read would produce —
    * an as-UTF-8 parse of the latin-1 é byte is a decode error, and an
    * as-latin-1 parse of the cp1252 em-dash byte lands on the C1
    * control U+0097, so either mistake flips `md5(text)`. */
  private def charsetName(docId: Long): String = (docId % 3) match {
    case 0 => "utf-8"
    case 1 => "iso-8859-1"
    case _ => "windows-1252"
  }

  private def charsetToken(docId: Long, i: Int): String = {
    val k = (docId + i) % 10
    (docId % 3) match {
      case 0 => s"é$k" // é — two bytes in UTF-8
      case 1 => s"ñ$k" // ñ — single byte 0xF1 in latin-1
      case _ => s"—$k" // em-dash — single byte 0x97 in cp1252
    }
  }

  private[graft] def synthCharsetWarcGz(docId: Long,
      nChars: Long): Array[Byte] = {
    val nt = (nChars % 29 + 4).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < nt) {
      if (i > 0) sb.append(if (i % 2 == 0) "\n " else " ")
      sb.append(
        if (i % 5 == 2) charsetToken(docId, i)
        else s"m${(docId * 37 + i * 13) % 9973}")
      i += 1
    }
    val html =
      s"""<html><head><title>Charset $docId</title></head>
         |<body><p>
         |${sb.toString}
         |</p></body></html>""".stripMargin
    val cs = java.nio.charset.Charset.forName(charsetName(docId))
    val body = html.getBytes(cs)
    // vary the header spelling so the parameter parse is exercised
    val ctParam = (docId % 3) match {
      case 0 => "charset=UTF-8"
      case 1 => "charset=\"ISO-8859-1\""
      case _ => "CHARSET=Windows-1252"
    }
    val head = "HTTP/1.1 200 OK\r\n" +
      s"Content-Type: text/html; $ctParam\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val block = new java.io.ByteArrayOutputStream(head.length + body.length)
    block.write(head.getBytes("US-ASCII"))
    block.write(body)
    val rec = record(docId, 0, "response",
      "application/http; msgtype=response", block.toByteArray,
      Some(url(docId)))
    WarcCodec.gzipMember(rec, ((docId % 9) + 1).toInt)
  }

  final case class CharsetDoc(doc_id: Long, charset: String, title: String,
      text: String)

  /** q233: charset-aware page decode — the [[warcIngest]] chain with the
    * body decoded through the Content-Type charset parameter instead of
    * assumed UTF-8. `md5(text)` is again the gate: the twin emits the
    * expected codepoints via `chr()`, so a wrong-charset decode (the
    * classic crawl bug) cannot hash-match. */
  def charsetPages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val recs = WarcCodec.gunzipMembers(synthCharsetWarcGz(id, nc))
          .flatMap(WarcCodec.parseRecords)
        require(recs.length == 1 && recs.head.warcType == "response",
          s"doc $id: expected the single response record")
        val http = WarcCodec.parseHttpResponse(recs.head.block)
        val ct = http.header("Content-Type").getOrElse("")
        val cs = WarcCodec.charsetOf(ct)
        val html = new String(http.body, cs)
        CharsetDoc(id, cs.name().toLowerCase(java.util.Locale.ROOT),
          WarcCodec.htmlTitle(html), WarcCodec.htmlText(html))
      }).toDF()
      .withColumn("text_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("text_md5", md5(col("text")))
      .drop("text")
      .orderBy("doc_id")
  }

  // ---------------------------------------------- robots frontier gate

  /** q234's per-host robots.txt, formula-generated: a decoy group
    * (`otherbot`: disallow all), the governing `graftbot` group — a
    * Disallow prefix `/p/<d>` with a LONGER Allow `/p/<d><e>` carved
    * out of it (d = host%10, e = host%7), so RFC 9309 longest-match
    * precedence decides every URL — and a `*` group that disallows all
    * of `/p/`: a parser that falls back to the wildcard group (or picks
    * the decoy) blocks everything and cannot match. Mixed field case,
    * comments, a Sitemap line and Crawl-delay exercise parse
    * tolerance on the gated path. */
  private[graft] def robotsText(h: Long): String = {
    val d = h % 10
    val e = h % 7
    s"""# robots for ${host(h)}
       |User-agent: otherbot
       |Disallow: /
       |
       |USER-AGENT: graftbot
       |Allow: /p/$d$e
       |Disallow: /p/$d
       |Crawl-delay: 5
       |Sitemap: https://${host(h)}/sitemap.xml
       |
       |User-agent: *
       |Disallow: /p/
       |""".stripMargin
  }

  /** q234: the crawl-frontier gate — every corpus URL judged against
    * its host's robots.txt as `graftbot`. The 53 parsed rule sets are
    * control-plane state: built driver-side, BROADCAST to the fetch
    * fleet, and applied map-side (one documents scan reading one
    * column; zero shuffles before the ordering) — the shape a
    * 100 TB frontier filter must have, since robots state is per-host
    * bounded while the URL stream is corpus-sized. */
  def robotsGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ruleSets = (0L until 53L)
      .map(h => host(h) -> graft.sources.RobotsTxt.parse(robotsText(h)))
      .toMap
    val bc = spark.sparkContext.broadcast(ruleSets)
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val hst = host(id)
        val pth = path(id)
        (id, hst, pth, bc.value(hst).allowed("graftbot", pth))
      }).toDF("doc_id", "host", "path", "allowed")
      .orderBy("doc_id")
  }

  // ---------------------------------------------- crawl → curation

  /** q235's corpus: the q230 archive machinery with ENGLISH-ISH tokens —
    * a per-doc stopword cadence (every ((doc%5)+3)rd token is one of
    * [[TextOps.STOPWORDS]]) so the downstream quality gates are
    * load-bearing: cadence 3 lands above MAX_STOP_RATIO
    * (stopword_heavy), cadence 7 between the en threshold and the cap
    * (kept), and short docs trip MIN_TOKENS. One gzip member, one 200
    * text/html response record. */
  private def enToken(docId: Long, i: Int): String =
    if (docId % 11 != 0 && i % ((docId % 5) + 3) == 1)
      TextOps.STOPWORDS(((docId + i) % 8).toInt)
    else s"v${(docId * 53 + i * 19) % 9973}" // doc%11==0: no stopwords → non_en

  private[graft] def synthEnWarcGz(docId: Long, nChars: Long): Array[Byte] = {
    val nt = (nChars % 37 + 5).toInt
    val toks = (0 until nt).map(enToken(docId, _))
    val html =
      s"""<html><head><title>Page $docId</title></head>
         |<body><p>
         |${toks.mkString(" ")}
         |</p></body></html>""".stripMargin
    val body = html.getBytes("UTF-8")
    val head = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val block = new java.io.ByteArrayOutputStream(head.length + body.length)
    block.write(head.getBytes("US-ASCII"))
    block.write(body)
    val rec = record(docId, 0, "response",
      "application/http; msgtype=response", block.toByteArray,
      Some(url(docId)))
    WarcCodec.gzipMember(rec, ((docId % 9) + 1).toInt)
  }

  /** q235: the END-TO-END crawl curation story — wire bytes through the
    * full decode chain into [[TextOps.langQualityOf]]'s quality gates
    * and the per-verdict corpus accounting. The twin rebuilds the
    * extracted text arithmetically and applies the SAME SQL text
    * algebra (split/stopword-filter/thresholds), so both the decode
    * chain and the gate composition are under one hash. */
  def crawlCuration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val recs = WarcCodec.gunzipMembers(synthEnWarcGz(id, nc))
          .flatMap(WarcCodec.parseRecords)
        val http = WarcCodec.parseHttpResponse(recs.head.block)
        val html = new String(http.body,
          java.nio.charset.StandardCharsets.UTF_8)
        (id, "web", WarcCodec.htmlText(html))
      }).toDF("doc_id", "lang", "text")
    TextOps.langQualityOf(docs)
      .withColumn("verdict",
        when(col("n_tokens") < TextOps.MIN_TOKENS, "short")
          .when(col("stop_ratio") > TextOps.MAX_STOP_RATIO, "stopword_heavy")
          .when(col("predicted_lang") =!= "en", "non_en")
          .otherwise("kept"))
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .orderBy("verdict")
  }

  // ---------------------------------------------- file-based reader

  /** User-facing archive reader: every record of every `.warc.gz` under
    * `dirGlob` as one row (path, record seq within its file, WARC type,
    * target URI, and — for HTTP responses — status and Content-Type).
    * Parallelism is per FILE (`binaryFile` source): gzip members are
    * not block-splittable, so the archive file is the task unit, the
    * same contract Common Crawl's ~1 GiB shards are sized for.
    *
    * `permissive = true` is the 100 TB posture: a corrupt archive (bad
    * CRC, truncated member, broken framing) yields ONE quarantine row
    * (`error` set, everything else null) instead of failing the job —
    * real crawl dumps contain damaged files, and an ingest's contract
    * is skip-and-count, not die. Strict mode (the default) keeps
    * corruption loud for curated stores, and names the failing FILE in
    * the error — at fleet scale an unattributed parse error is
    * undebuggable. WarcSpec drives both modes over real files on
    * disk. */
  def readWarcArchives(spark: SparkSession, dirGlob: String,
      permissive: Boolean = false): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz")
      .load(dirGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val parsed =
          try Right(WarcCodec.gunzipMembers(bytes)
            .flatMap(WarcCodec.parseRecords))
          catch {
            case e: Exception if permissive => Left(e.getMessage)
            case e: Exception =>
              throw new IllegalArgumentException(s"$p: ${e.getMessage}", e)
          }
        parsed match {
          case Left(err) =>
            Seq((p, None: Option[Long], None: Option[String],
              None: Option[String], None: Option[Long],
              None: Option[String], None: Option[Long],
              Some(Option(err).getOrElse("parse failure").take(200))))
          case Right(recs) =>
            recs.zipWithIndex.map { case (r, i) =>
              val http = if (r.warcType == "response")
                Some(WarcCodec.parseHttpResponse(r.block)) else None
              (p, Some(i.toLong), Some(r.warcType),
                r.header("WARC-Target-URI"),
                http.map(_.status.toLong),
                http.flatMap(_.header("Content-Type")),
                Some(r.block.length.toLong),
                None: Option[String])
            }
        }
      }
      .toDF("path", "seq", "warc_type", "target_uri", "http_status",
        "content_type", "block_len", "error")
  }
}
