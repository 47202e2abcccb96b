package graft.sources

import graft.multimodal.PngCodec

/** Crawl-archive wire formats, dependency-free: gzip member framing
  * (RFC 1952) over the hand-rolled DEFLATE inflate
  * ([[PngCodec.inflateDynamic]]), the WARC/1.0 record envelope
  * (ISO 28500 — the format web crawls such as Common Crawl actually
  * ship), the HTTP/1.1 response envelope a WARC response record
  * carries, and a rough HTML→text extractor (the first stage of every
  * LLM text-curation pipeline). Byte-level only — no Spark here; the
  * DataFrame operators live in [[graft.engine.Crawl]].
  *
  * The reference ingests rows from JDBC/CSV (SURVEY §2.1) and never
  * touches crawl archives; this module is part of the declared
  * LLM-pipeline extension surface (SURVEY §2 "beyond the reference").
  *
  * Scale note: a `.warc.gz` file is a CONCATENATION of gzip members,
  * one member per record (the Common Crawl convention) — members are
  * independently decodable, but the member boundaries are not
  * discoverable without decoding, so a single archive file is not
  * block-splittable (this is exactly why Common Crawl caps archives at
  * ~1 GiB: per-FILE parallelism is the distribution unit). The Spark
  * reader keys parallelism on files, never on byte ranges.
  *
  * Decode hardening follows the codec family's law (ADVICE r12): all
  * bounds arithmetic on wire-supplied lengths is done in Long before
  * narrowing, and every reject is a clean IllegalArgumentException,
  * never an AIOOBE.
  */
object WarcCodec {

  // ------------------------------------------------ gzip (RFC 1952)

  private val FTEXT = 1
  private val FHCRC = 2
  private val FEXTRA = 4
  private val FNAME = 8
  private val FCOMMENT = 16

  private def putLe32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    b.write((v & 0xff).toInt); b.write(((v >>> 8) & 0xff).toInt)
    b.write(((v >>> 16) & 0xff).toInt); b.write(((v >>> 24) & 0xff).toInt)
  }

  /** One gzip member. Encode-side compression is the JDK `Deflater`
    * (nowrap — raw RFC 1951, the member framing here is ours); the
    * DECODE side ([[gunzipMembers]]) is the gated path and runs the
    * hand-rolled inflate. Optional header fields exist so the decoder's
    * full header walk (FEXTRA length skip, zero-terminated FNAME /
    * FCOMMENT, FHCRC header checksum) is exercised by real wires, not
    * just by specs. */
  def gzipMember(payload: Array[Byte], level: Int = 6,
      fname: Option[String] = None, fcomment: Option[String] = None,
      fextra: Option[Array[Byte]] = None, fhcrc: Boolean = false,
      mtime: Long = 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    out.write(0x1f); out.write(0x8b); out.write(8)
    var flg = 0
    if (fextra.isDefined) flg |= FEXTRA
    if (fname.isDefined) flg |= FNAME
    if (fcomment.isDefined) flg |= FCOMMENT
    if (fhcrc) flg |= FHCRC
    out.write(flg)
    putLe32(out, mtime)
    out.write(0) // XFL
    out.write(255) // OS unknown
    fextra.foreach { x =>
      require(x.length <= 0xffff, "FEXTRA too long")
      out.write(x.length & 0xff); out.write((x.length >>> 8) & 0xff)
      out.write(x, 0, x.length)
    }
    fname.foreach { n => out.write(n.getBytes("ISO-8859-1")); out.write(0) }
    fcomment.foreach { c => out.write(c.getBytes("ISO-8859-1")); out.write(0) }
    if (fhcrc) {
      val hdr = out.toByteArray
      val c = PngCodec.crc32(hdr, 0, hdr.length)
      out.write(c & 0xff); out.write((c >>> 8) & 0xff)
    }
    val defl = new java.util.zip.Deflater(level, true)
    defl.setInput(payload)
    defl.finish()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      out.write(buf, 0, n)
    }
    defl.end()
    putLe32(out, PngCodec.crc32(payload, 0, payload.length) & 0xffffffffL)
    putLe32(out, payload.length & 0xffffffffL)
    out.toByteArray
  }

  private def le16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  /** Decode every gzip member in `wire` (a `.warc.gz` is a member
    * concatenation) through the hand-rolled inflate, verifying each
    * member's CRC32 and ISIZE trailer. Rejects reserved FLG bits,
    * non-deflate methods, header-CRC mismatches, and truncation —
    * cleanly, never with an index error. */
  def gunzipMembers(wire: Array[Byte]): Vector[Array[Byte]] =
    gunzipMembersWithSpans(wire).map(_._1)

  /** [[gunzipMembers]] plus each member's WIRE SPAN `(offset, length)`
    * within `wire` — the record-grain coordinates a CDX-style sidecar
    * index stores so a later probe can decode ONE member by byte range
    * ([[gunzipMemberAt]]) instead of the whole archive. */
  def gunzipMembersWithSpans(
      wire: Array[Byte]): Vector[(Array[Byte], Int, Int)] = {
    val members = Vector.newBuilder[(Array[Byte], Int, Int)]
    var p = 0
    require(wire.length >= 18, "gzip stream truncated (no room for a member)")
    while (p < wire.length) {
      require(p.toLong + 10 <= wire.length, "gzip header truncated")
      require((wire(p) & 0xff) == 0x1f && (wire(p + 1) & 0xff) == 0x8b,
        "bad gzip magic")
      require((wire(p + 2) & 0xff) == 8,
        s"gzip method ${wire(p + 2) & 0xff} != deflate")
      val flg = wire(p + 3) & 0xff
      require((flg & 0xe0) == 0, "reserved gzip FLG bits set")
      var q = p + 10
      if ((flg & FEXTRA) != 0) {
        require(q.toLong + 2 <= wire.length, "gzip FEXTRA truncated")
        val xlen = le16(wire, q)
        require(q.toLong + 2 + xlen <= wire.length, "gzip FEXTRA truncated")
        q += 2 + xlen
      }
      if ((flg & FNAME) != 0) {
        while (q < wire.length && wire(q) != 0) q += 1
        require(q < wire.length, "gzip FNAME unterminated")
        q += 1
      }
      if ((flg & FCOMMENT) != 0) {
        while (q < wire.length && wire(q) != 0) q += 1
        require(q < wire.length, "gzip FCOMMENT unterminated")
        q += 1
      }
      if ((flg & FHCRC) != 0) {
        require(q.toLong + 2 <= wire.length, "gzip FHCRC truncated")
        val stored = le16(wire, q)
        val computed = PngCodec.crc32(wire, p, q) & 0xffff
        require(stored == computed,
          f"gzip header CRC mismatch: stored $stored%04x != $computed%04x")
        q += 2
      }
      val (data, end) = PngCodec.inflateDynamic(wire, q)
      require(end.toLong + 8 <= wire.length, "gzip trailer truncated")
      val crcStored = le32(wire, end)
      val crcComputed = PngCodec.crc32(data, 0, data.length) & 0xffffffffL
      require(crcStored == crcComputed,
        f"gzip CRC32 mismatch: stored $crcStored%08x != $crcComputed%08x")
      val isize = le32(wire, end + 4)
      require(isize == (data.length & 0xffffffffL),
        s"gzip ISIZE mismatch: stored $isize != ${data.length}")
      members += ((data, p, end + 8 - p))
      p = end + 8
    }
    members.result()
  }

  /** Decode exactly ONE gzip member from its CDX-recorded span. The
    * slice must be a complete member — offset or length drift anywhere
    * (a stale index, a rewritten archive) fails the member's own
    * CRC32/ISIZE check or the completeness check here, never returns
    * wrong bytes silently. */
  def gunzipMemberAt(wire: Array[Byte], offset: Int,
      length: Int): Array[Byte] = {
    require(offset >= 0 && length > 0 &&
      offset.toLong + length <= wire.length,
      s"member span [$offset,+$length) outside the archive of ${wire.length}")
    val members = gunzipMembersWithSpans(
      java.util.Arrays.copyOfRange(wire, offset, offset + length))
    require(members.length == 1,
      s"member span decoded to ${members.length} members, expected 1")
    members.head._1
  }

  // ------------------------------------------------ WARC (ISO 28500)

  private val CRLF = "\r\n".getBytes("US-ASCII")

  /** One parsed WARC record: the record type (`warcinfo`, `request`,
    * `response`, ...), its named headers (original field names, looked
    * up case-insensitively via [[header]]), and the raw block bytes —
    * exactly `Content-Length` octets, framed by length, never by
    * delimiter scanning (a block may itself contain `CRLF CRLF`). */
  final case class WarcRecord(warcType: String,
      headers: Vector[(String, String)], block: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  /** Serialize one WARC/1.0 record: version line, named headers,
    * `Content-Length`, blank line, block, and the record-terminating
    * `CRLF CRLF`. */
  def writeRecord(warcType: String, headers: Seq[(String, String)],
      block: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(block.length + 256)
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    headers.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    out.write(sb.toString.getBytes("UTF-8"))
    out.write(block)
    out.write(CRLF); out.write(CRLF)
    out.toByteArray
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    require(i + 1 < b.length, "CRLF-terminated line truncated")
    i
  }

  /** Parse field lines (`Name: value`) up to and including the blank
    * line; returns (fields, offsetAfterBlankLine). */
  private def parseFields(b: Array[Byte],
      from: Int): (Vector[(String, String)], Int) = {
    val fields = Vector.newBuilder[(String, String)]
    var p = from
    var done = false
    while (!done) {
      val e = lineEnd(b, p)
      if (e == p) { done = true; p = e + 2 }
      else {
        val line = new String(b, p, e - p, "UTF-8")
        val colon = line.indexOf(':')
        require(colon > 0, s"malformed header line: $line")
        fields += ((line.substring(0, colon).trim,
          line.substring(colon + 1).trim))
        p = e + 2
      }
    }
    (fields.result(), p)
  }

  /** Parse every WARC record in `bytes` (one decompressed gzip member
    * usually carries one record, but multi-record buffers parse too).
    * Strict on the envelope: a known version line, a parseable
    * `Content-Length`, and the `CRLF CRLF` record terminator. */
  def parseRecords(bytes: Array[Byte]): Vector[WarcRecord] = {
    val records = Vector.newBuilder[WarcRecord]
    var p = 0
    while (p < bytes.length) {
      val ve = lineEnd(bytes, p)
      val version = new String(bytes, p, ve - p, "US-ASCII")
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"unsupported WARC version line: $version")
      val (fields, afterHdr) = parseFields(bytes, ve + 2)
      val rec = WarcRecord("", fields, Array.emptyByteArray)
      val lenStr = rec.header("Content-Length").getOrElse(
        throw new IllegalArgumentException("WARC record missing Content-Length"))
      val len = lenStr.toLong
      require(len >= 0 && afterHdr.toLong + len + 4 <= bytes.length,
        s"WARC block of $len octets overruns the buffer")
      val block = java.util.Arrays.copyOfRange(bytes, afterHdr,
        afterHdr + len.toInt)
      val after = afterHdr + len.toInt
      require(bytes(after) == '\r' && bytes(after + 1) == '\n' &&
        bytes(after + 2) == '\r' && bytes(after + 3) == '\n',
        "WARC record terminator (CRLF CRLF) missing after block")
      val wtype = rec.header("WARC-Type").getOrElse(
        throw new IllegalArgumentException("WARC record missing WARC-Type"))
      records += WarcRecord(wtype, fields, block)
      p = after + 4
    }
    records.result()
  }

  // ------------------------------------------------ HTTP/1.1 response

  /** The HTTP response a WARC `response` record's block carries. */
  final case class HttpResponse(status: Int,
      headers: Vector[(String, String)], body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  /** Parse an HTTP/1.1 response envelope: status line, field lines,
    * blank line, body = the rest of the block. The WARC record's
    * `Content-Length` (the block framing above us) is AUTHORITATIVE for
    * the body extent; the HTTP-level `Content-Length` header is kept as
    * data but NOT enforced against the body — real crawl archives
    * routinely violate it (e.g. Common Crawl truncates captures at
    * 1 MiB while keeping the server's original headers), so a hard
    * check would reject valid real-world archives (ADVICE r13).
    * Consumers that care can compare `header("Content-Length")` to
    * `body.length` themselves. */
  def parseHttpResponse(block: Array[Byte]): HttpResponse = {
    val se = lineEnd(block, 0)
    val statusLine = new String(block, 0, se, "US-ASCII")
    require(statusLine.startsWith("HTTP/1.1 ") ||
      statusLine.startsWith("HTTP/1.0 "),
      s"not an HTTP response status line: $statusLine")
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2, s"malformed status line: $statusLine")
    val status = parts(1).toInt
    val (fields, afterHdr) = parseFields(block, se + 2)
    val raw = java.util.Arrays.copyOfRange(block, afterHdr, block.length)
    // Transfer-Encoding wins over Content-Length (RFC 9112 §6.3) — a
    // WARC response record stores the RAW wire, so chunked captures
    // are common and passing the framing through as "body" would leave
    // chunk-size lines inside the extracted text
    val te = fields.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Transfer-Encoding") => v
    }
    te match {
      case Some(v) if v.toLowerCase(java.util.Locale.ROOT)
          .split(",").map(_.trim).contains("chunked") =>
        val (body, trailers) = dechunk(raw)
        HttpResponse(status, fields ++ trailers, body)
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported Transfer-Encoding: $other")
      case None => HttpResponse(status, fields, raw)
    }
  }

  /** Decode a `chunked` transfer coding (RFC 9112 §7.1), strictly:
    * `<hex-size>[;extensions]CRLF <data> CRLF` repeated, a `0`-size
    * last chunk, then trailer fields up to the final blank line.
    * Chunk EXTENSIONS are ignored per spec (MUST-ignore), trailer
    * fields are returned (they are part of the message); everything
    * else rejects loudly — a bad hex digit, a missing CRLF after a
    * chunk's data, truncation mid-chunk, or bytes after the final
    * CRLF (the framing is self-delimiting; trailing garbage means the
    * capture is corrupt, not that the body was longer). */
  def dechunk(raw: Array[Byte])
      : (Array[Byte], Seq[(String, String)]) = {
    val out = new java.io.ByteArrayOutputStream(raw.length)
    var p = 0
    var last = false
    while (!last) {
      val le = lineEnd(raw, p)
      val line = new String(raw, p, le - p, "US-ASCII")
      val sizeHex = line.indexOf(';') match {
        case -1 => line.trim
        case i => line.substring(0, i).trim // extensions: ignored
      }
      require(sizeHex.nonEmpty && sizeHex.forall(c =>
        Character.digit(c, 16) >= 0),
        s"bad chunk size line: '$line'")
      require(sizeHex.length <= 7, s"chunk size overflows: $sizeHex")
      val size = Integer.parseInt(sizeHex, 16)
      p = le + 2
      if (size == 0) last = true
      else {
        require(p + size + 2 <= raw.length,
          s"chunk of $size bytes truncated")
        out.write(raw, p, size)
        require(raw(p + size) == '\r' && raw(p + size + 1) == '\n',
          "chunk data not followed by CRLF")
        p = p + size + 2
      }
    }
    val (trailers, after) = parseFields(raw, p)
    require(after == raw.length,
      s"${raw.length - after} bytes after the final chunk trailer")
    (out.toByteArray, trailers)
  }

  /** The charset named by a `Content-Type` header's `charset=` parameter
    * (case-insensitive, optionally quoted), defaulting to UTF-8 when
    * absent — real crawls are NOT all UTF-8, and decoding a legacy page
    * as UTF-8 silently corrupts every high byte. Unknown charset names
    * reject loudly (a curation pipeline should count those pages, not
    * guess). */
  def charsetOf(contentType: String): java.nio.charset.Charset = {
    val m = java.util.regex.Pattern
      .compile("(?i)charset\\s*=\\s*\"?([\\w.:-]+)\"?")
      .matcher(contentType)
    if (m.find()) java.nio.charset.Charset.forName(m.group(1))
    else java.nio.charset.StandardCharsets.UTF_8
  }

  /** BOM sniff per the HTML5 encoding-sniffing algorithm's FIRST step:
    * a byte-order mark outranks everything, INCLUDING the transport's
    * `Content-Type` charset parameter (servers lie about charsets
    * constantly; the BOM is the document speaking for itself). Exactly
    * the three HTML5 table entries — UTF-8 `EF BB BF`, UTF-16BE
    * `FE FF`, UTF-16LE `FF FE`; UTF-32 is not in the table (HTML
    * forbids it). Returns (label, charset, bom length), or None. */
  def sniffBom(body: Array[Byte])
      : Option[(String, java.nio.charset.Charset, Int)] = {
    import java.nio.charset.StandardCharsets._
    if (body.length >= 3 && body(0) == 0xef.toByte &&
      body(1) == 0xbb.toByte && body(2) == 0xbf.toByte)
      Some(("utf-8", UTF_8, 3))
    else if (body.length >= 2 && body(0) == 0xfe.toByte &&
      body(1) == 0xff.toByte) Some(("utf-16be", UTF_16BE, 2))
    else if (body.length >= 2 && body(0) == 0xff.toByte &&
      body(1) == 0xfe.toByte) Some(("utf-16le", UTF_16LE, 2))
    else None
  }

  /** Decode an HTML body: BOM first (consumed — U+FEFF is not
    * content), Content-Type charset parameter otherwise, UTF-8 default
    * ([[charsetOf]]). The charset-confusion failure this forbids: a
    * UTF-16 page read through a lying `charset=iso-8859-1` header
    * decodes every other byte as NUL — "text" that passes a
    * best-effort reader and poisons every downstream gate. */
  def decodeHtml(body: Array[Byte], contentType: String): String =
    sniffBom(body) match {
      case Some((_, cs, skip)) =>
        new String(body, skip, body.length - skip, cs)
      case None => new String(body, charsetOf(contentType))
    }

  // ------------------------------------------------ HTML → text

  /** Rough text extraction — the documented LAW, in order:
    *  1. comments `<!-- ... -->` removed (unterminated: to end of input);
    *  2. `<script>`/`<style>` elements removed INCLUDING content, closed
    *     by the first matching `</script`/`</style` (case-insensitive);
    *  3. every remaining tag replaced by ONE space — tag scanning
    *     respects single- and double-quoted attribute values, so a `>`
    *     inside `data-x="a>b"` does not end the tag; a `<` not opening
    *     a tag (next char not a letter, `/`, `!` or `?`) stays literal;
    *  4. character entities decoded ON TEXT ONLY (after tag removal,
    *     so a decoded `&lt;` can never be re-parsed as markup): the
    *     named set amp/lt/gt/quot/apos/nbsp and numeric `&#NNN;` /
    *     `&#xHH;`; anything unrecognized stays literal;
    *  5. whitespace runs collapsed to one space, ends trimmed.
    * Head text (title) is kept — this is the rough-extraction grade a
    * curation pipeline then quality-filters, not a rendering engine.
    */
  def htmlText(html: String): String =
    collapseWs(decodeEntities(stripTags(stripElements(
      stripComments(html)))))

  /** First `<title>...</title>` content, entity-decoded and
    * whitespace-collapsed; empty when absent. The character after the
    * matched `<title` must be `>`, whitespace, or `/` — the same element
    * boundary check [[stripElement]] does — so `<titlebar>` (or `<title`
    * inside an attribute value) is never mistaken for the title element
    * (ADVICE r13). */
  def htmlTitle(html: String): String = {
    val s = stripComments(html)
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (from >= 0) {
      val open = lower.indexOf("<title", from)
      if (open < 0) return ""
      val after = open + "<title".length
      val boundary = after >= s.length || {
        val c = s.charAt(after)
        c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
          c == '/'
      }
      if (boundary) {
        val gt = s.indexOf('>', open)
        if (gt < 0) return ""
        val close = lower.indexOf("</title", gt + 1)
        if (close < 0) return ""
        return collapseWs(decodeEntities(s.substring(gt + 1, close)))
      }
      from = open + 1
    }
    ""
  }

  // ------------------------------------------------ main content

  /** Minimum characters for a plain block to count as content. */
  val MAIN_MIN_BLOCK_CHARS = 25

  /** A plain block is link-farm chrome when `linkChars * 3 >= chars`. */
  val MAIN_LINK_DENSITY_NUM = 3

  private val BLOCK_TAGS = Set("html", "head", "body", "title", "p",
    "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "thead", "tbody", "tr", "td", "th", "section", "article",
    "main", "aside", "nav", "header", "footer", "br", "blockquote",
    "pre", "form")

  /** MAIN-CONTENT extraction — the jusText/trafilatura-shaped block
    * classifier real crawl curation (C4, RefinedWeb) applies before any
    * quality gate, in pure integer arithmetic for cross-engine
    * determinism. After comment and script/style removal, the page
    * splits into BLOCKS at every block-level tag boundary; each block's
    * text (entity-decoded, whitespace-collapsed) is classified by the
    * documented LAW, in precedence order:
    *
    *  1. a block inside `<head>`, `<nav>`, `<header>`, `<footer>`, or
    *     `<aside>` is CHROME — dropped regardless of length (the
    *     ancestry rule; a sidebar promo paragraph is chrome even when
    *     long);
    *  2. a block inside `<article>` or `<main>` is CONTENT — kept
    *     regardless of length or link density (the main-container
    *     override: the page author named the payload);
    *  3. otherwise the block is content iff it has at least
    *     [[MAIN_MIN_BLOCK_CHARS]] characters AND its link-anchored
    *     characters satisfy `linkChars · MAIN_LINK_DENSITY_NUM <
    *     chars` (a menu of links fails density even outside `<nav>`).
    *
    * Kept blocks join with one space. Unlike [[htmlText]] (the
    * rough-extraction grade), head text — including the title — is NOT
    * part of main content. Ancestry is constant within a block because
    * every ancestry-changing tag is itself a block boundary. */
  def mainContent(html: String): String = {
    val s = stripElements(stripComments(html))
    val out = new StringBuilder
    val raw = new StringBuilder
    val linkRaw = new StringBuilder
    var chromeDepth = 0
    var mainDepth = 0
    var headDepth = 0
    var linkDepth = 0
    def flush(): Unit = {
      val text = collapseWs(decodeEntities(raw.toString))
      val link = collapseWs(decodeEntities(linkRaw.toString))
      raw.setLength(0); linkRaw.setLength(0)
      if (text.nonEmpty) {
        val keep =
          if (chromeDepth > 0 || headDepth > 0) false
          else if (mainDepth > 0) true
          else text.length >= MAIN_MIN_BLOCK_CHARS &&
            link.length * MAIN_LINK_DENSITY_NUM < text.length
        if (keep) {
          if (out.nonEmpty) out.append(' ')
          out.append(text)
        }
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < s.length && {
        val n = s.charAt(i + 1)
        n.isLetter || n == '/' || n == '!' || n == '?'
      }) {
        val closing = s.charAt(i + 1) == '/'
        var j = i + (if (closing) 2 else 1)
        val nameStart = j
        while (j < s.length && (s.charAt(j).isLetterOrDigit)) j += 1
        val name = s.substring(nameStart, j)
          .toLowerCase(java.util.Locale.ROOT)
        // scan to the tag's real '>' (quote-aware, like stripTags)
        var closed = false
        var selfClose = false
        while (j < s.length && !closed) {
          s.charAt(j) match {
            case '"' =>
              j += 1
              while (j < s.length && s.charAt(j) != '"') j += 1
              if (j < s.length) j += 1
            case '\'' =>
              j += 1
              while (j < s.length && s.charAt(j) != '\'') j += 1
              if (j < s.length) j += 1
            case '>' =>
              selfClose = j > nameStart && s.charAt(j - 1) == '/'
              closed = true; j += 1
            case _ => j += 1
          }
        }
        if (BLOCK_TAGS.contains(name)) {
          flush() // text before this tag belongs to the prior block
          if (!selfClose) {
            val d = if (closing) -1 else 1
            name match {
              case "nav" | "header" | "footer" | "aside" =>
                chromeDepth = math.max(0, chromeDepth + d)
              case "article" | "main" =>
                mainDepth = math.max(0, mainDepth + d)
              case "head" | "title" =>
                headDepth = math.max(0, headDepth + d)
              case _ => ()
            }
          }
        } else if (name == "a" && !selfClose) {
          linkDepth = math.max(0, linkDepth + (if (closing) -1 else 1))
          raw.append(' '); linkRaw.append(' ')
        } else {
          // inline tag: a word boundary in both streams
          raw.append(' ')
          if (linkDepth > 0) linkRaw.append(' ')
        }
        i = j
      } else {
        raw.append(c)
        if (linkDepth > 0) linkRaw.append(c)
        i += 1
      }
    }
    flush()
    out.toString
  }

  private[sources] def stripComments(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.startsWith("<!--", i)) {
        val end = s.indexOf("-->", i + 4)
        i = if (end < 0) s.length else end + 3
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def stripElement(s: String, name: String): String = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val hit = lower.startsWith("<" + name, i) && {
        val c = if (i + 1 + name.length < s.length)
          lower.charAt(i + 1 + name.length) else ' '
        c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/'
      }
      if (hit) {
        val close = lower.indexOf("</" + name, i)
        if (close < 0) i = s.length
        else {
          val gt = s.indexOf('>', close)
          i = if (gt < 0) s.length else gt + 1
        }
        out.append(' ')
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  private[sources] def stripElements(s: String): String =
    stripElement(stripElement(s, "script"), "style")

  private[sources] def stripTags(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < s.length && {
        val n = s.charAt(i + 1)
        n.isLetter || n == '/' || n == '!' || n == '?'
      }) {
        var j = i + 1
        var closed = false
        while (j < s.length && !closed) {
          s.charAt(j) match {
            case '"' =>
              j += 1
              while (j < s.length && s.charAt(j) != '"') j += 1
              if (j < s.length) j += 1
            case '\'' =>
              j += 1
              while (j < s.length && s.charAt(j) != '\'') j += 1
              if (j < s.length) j += 1
            case '>' => closed = true; j += 1
            case _ => j += 1
          }
        }
        out.append(' ')
        i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private[sources] def decodeEntities(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val decoded: Option[String] =
          if (semi < 0 || semi - i > 10) None
          else s.substring(i + 1, semi) match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try {
                val cp = Integer.parseInt(e.substring(2), 16)
                if (cp >= 0 && cp <= 0x10ffff && e.length > 2)
                  Some(new String(Character.toChars(cp)))
                else None
              } catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try {
                val cp = Integer.parseInt(e.substring(1), 10)
                if (cp >= 0 && cp <= 0x10ffff && e.length > 1)
                  Some(new String(Character.toChars(cp)))
                else None
              } catch { case _: Exception => None }
            case _ => None
          }
        decoded match {
          case Some(d) => out.append(d); i = semi + 1
          case None => out.append('&'); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private[sources] def collapseWs(s: String): String = {
    val out = new StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
          c == '\u00a0') pendingSpace = out.nonEmpty
      else {
        if (pendingSpace) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
