package graft.sources

import graft.multimodal.PngCodec

/** PDF text extraction, dependency-free, as a CONSTRAINED SUBSET of
  * ISO 32000-1 — the other dominant document format in real crawl
  * corpora (papers, books, reports; a large share of Common Crawl
  * response records) next to HTML. The subset covers what a text
  * curation pipeline needs and rejects everything else LOUDLY:
  *
  *  - classic cross-reference TABLES (`xref` … `trailer`); PDF 1.5+
  *    cross-reference STREAMS and object streams reject;
  *  - incremental updates (`/Prev`) and encryption (`/Encrypt`) reject;
  *  - content streams stored raw or `/FlateDecode` (RFC 1950 zlib over
  *    the hand-rolled DEFLATE inflate, [[PngCodec.inflateDynamic]] —
  *    the same engine PNG/WARC already run); any other filter, and any
  *    `/DecodeParms`, rejects;
  *  - simple fonts with `/WinAnsiEncoding` (≅ Windows-1252; the five
  *    undefined slots reject) or Standard/absent encoding (ASCII
  *    subset); `/Type0`/CID fonts reject when selected;
  *  - the text-showing operator family `Tj TJ ' "` with the positioning
  *    family `Td TD Tm T*` driving word separation; XObject draws
  *    (`Do`) and inline images (`BI`) reject — silently losing their
  *    text would be worse than failing.
  *
  * EXTRACTION LAW (the twin-restatable contract, like
  * [[WarcCodec.htmlText]]'s): each show operator appends its decoded
  * string; a single space is inserted before a show iff a positioning
  * operator (`Td`/`TD`/`Tm`/`T*`), a text-object start (`BT`), a
  * line-advancing show (`'`/`"`), a TJ kern ≤ [[TJ_SPACE_KERN]]
  * (thousandths of an em — the classic pdftotext word-break heuristic,
  * deterministic here because the corpus controls the numbers), or a
  * page boundary intervened since the last append; finally whitespace
  * runs collapse to one space and ends trim.
  *
  * The reference ingests rows from JDBC/CSV (SURVEY §2.1) and never
  * touches documents; this module is part of the declared LLM-pipeline
  * extension surface. Byte-level only — no Spark here; the operators
  * live in [[graft.engine.Crawl]] (q236 gates the full
  * xref → object graph → page tree → inflate → operator-machine chain
  * against a DuckDB twin that regenerates the text arithmetically).
  */
object PdfCodec {

  /** A TJ kern at or below this (thousandths of em, negative = gap)
    * reads as a word space. */
  val TJ_SPACE_KERN: Double = -180.0

  /** Extraction result: page count and the extracted text. */
  final case class PdfDoc(nPages: Int, text: String)

  // ------------------------------------------------ character decode

  // WinAnsiEncoding ≅ Windows-1252 on every defined code; cp1252's five
  // undefined slots are undefined in WinAnsi too and reject loudly.
  private val CP1252_UNDEF = Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)
  private val CP1252 = java.nio.charset.Charset.forName("windows-1252")

  private def decodeWinAnsi(bytes: Array[Byte]): String = {
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      require(!CP1252_UNDEF.contains(v),
        f"undefined WinAnsi code 0x$v%02x")
      i += 1
    }
    new String(bytes, CP1252)
  }

  // Standard/absent encoding: the ASCII-coincident subset only; high
  // bytes would need the Adobe StandardEncoding table and reject here.
  private def decodeStandard(bytes: Array[Byte]): String = {
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      require(v < 0x80,
        f"non-ASCII code 0x$v%02x under Standard/absent encoding")
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
  }

  // ------------------------------------------------ object model

  private final case class PName(s: String)
  private final case class PRef(num: Int)
  private case object PNull
  private final case class PStream(dict: Map[String, Any],
      data: Array[Byte])

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0

  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent lexer/parser over the raw bytes. Mutable
    * position; every parse method leaves `p` after what it consumed. */
  private final class Lex(val b: Array[Byte], var p: Int) {

    def peek: Int = if (p < b.length) b(p) & 0xff else -1

    def ws(): Unit = {
      var more = true
      while (more) {
        while (p < b.length && isWs(b(p) & 0xff)) p += 1
        if (peek == '%') { // comment to EOL
          while (p < b.length && b(p) != '\n' && b(p) != '\r') p += 1
        } else more = false
      }
    }

    /** True (and consumed) iff `kw` sits at `p` followed by a
      * whitespace/delimiter/EOF boundary. */
    def tryKeyword(kw: String): Boolean = {
      if (p + kw.length > b.length) return false
      var i = 0
      while (i < kw.length) {
        if ((b(p + i) & 0xff) != kw.charAt(i)) return false
        i += 1
      }
      val after =
        if (p + kw.length >= b.length) -1 else b(p + kw.length) & 0xff
      if (after == -1 || isWs(after) || isDelim(after)) {
        p += kw.length; true
      } else false
    }

    def expectKeyword(kw: String): Unit = {
      ws()
      require(tryKeyword(kw), s"expected '$kw' at offset $p")
    }

    def parseNumber(): Double = {
      val start = p
      if (peek == '+' || peek == '-') p += 1
      while (peek >= '0' && peek <= '9') p += 1
      if (peek == '.') { p += 1; while (peek >= '0' && peek <= '9') p += 1 }
      require(p > start && !(p == start + 1 && !Character.isDigit(b(start))),
        s"malformed number at offset $start")
      new String(b, start, p - start, "US-ASCII").toDouble
    }

    def parseName(): PName = {
      require(peek == '/', s"expected name at offset $p")
      p += 1
      val sb = new StringBuilder
      var done = false
      while (!done) {
        val c = peek
        if (c == -1 || isWs(c) || isDelim(c)) done = true
        else if (c == '#' && p + 2 < b.length) {
          sb.append(Integer.parseInt(
            new String(b, p + 1, 2, "US-ASCII"), 16).toChar)
          p += 3
        } else { sb.append(c.toChar); p += 1 }
      }
      PName(sb.toString)
    }

    /** Literal string `(...)`: balanced parens, the escape family,
      * embedded EOLs normalized to \n. Returns raw BYTES — decoding
      * happens at show time under the current font's encoding. */
    def parseLiteralString(): Array[Byte] = {
      require(peek == '(', s"expected string at offset $p")
      p += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        require(p < b.length, "unterminated literal string")
        val c = b(p) & 0xff
        p += 1
        c match {
          case '(' => depth += 1; out.write('(')
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
          case '\\' =>
            require(p < b.length, "unterminated string escape")
            val e = b(p) & 0xff
            p += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => // line continuation; swallow optional \n
                if (peek == '\n') p += 1
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && peek >= '0' && peek <= '7') {
                  v = v * 8 + (b(p) - '0'); p += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // unknown escape: literal
            }
          case '\r' => // EOL inside string → \n (CRLF is one EOL)
            if (peek == '\n') p += 1
            out.write('\n')
          case other => out.write(other)
        }
      }
      out.toByteArray
    }

    def parseHexString(): Array[Byte] = {
      require(peek == '<', s"expected hex string at offset $p")
      p += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        require(p < b.length, "unterminated hex string")
        val c = b(p) & 0xff
        p += 1
        if (c == '>') done = true
        else if (isWs(c)) ()
        else {
          val v = Character.digit(c, 16)
          require(v >= 0, f"bad hex digit 0x$c%02x in string")
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd count: implied trailing 0
      out.toByteArray
    }

    /** One PDF object. Integers followed by `<int> R` fold into a
      * [[PRef]] (with backtracking when the lookahead fails). */
    def parseObject(): Any = {
      ws()
      peek match {
        case '<' =>
          if (p + 1 < b.length && b(p + 1) == '<') {
            p += 2
            val m = Map.newBuilder[String, Any]
            var done = false
            while (!done) {
              ws()
              if (peek == '>' && p + 1 < b.length && b(p + 1) == '>') {
                p += 2; done = true
              } else {
                val k = parseName()
                m += ((k.s, parseObject()))
              }
            }
            m.result()
          } else parseHexString()
        case '[' =>
          p += 1
          val arr = Vector.newBuilder[Any]
          var done = false
          while (!done) {
            ws()
            if (peek == ']') { p += 1; done = true }
            else arr += parseObject()
          }
          arr.result()
        case '(' => parseLiteralString()
        case '/' => parseName()
        case c if c == '+' || c == '-' || c == '.' ||
            (c >= '0' && c <= '9') =>
          val n = parseNumber()
          if (n >= 0 && n == math.floor(n) && n <= Int.MaxValue) {
            val save = p
            ws()
            if (peek >= '0' && peek <= '9') {
              parseNumber() // generation
              ws()
              if (tryKeyword("R")) return PRef(n.toInt)
            }
            p = save
          }
          n
        case _ =>
          if (tryKeyword("true")) true
          else if (tryKeyword("false")) false
          else if (tryKeyword("null")) PNull
          else throw new IllegalArgumentException(
            s"unparseable object at offset $p")
      }
    }
  }

  // ------------------------------------------------ document reader

  /** The parsed document graph a caller walks: xref-resolved objects,
    * lazily fetched and memoized. */
  private final class Doc(bytes: Array[Byte]) {
    require(bytes.length >= 16 &&
      new String(bytes, 0, 5, "US-ASCII") == "%PDF-",
      "not a PDF (missing %PDF- header)")

    private val (xref: Map[Int, Int], trailer: Map[String, Any]) = {
      val sxAt = lastIndexOf(bytes, "startxref")
      require(sxAt >= 0, "missing startxref")
      val lx = new Lex(bytes, sxAt + "startxref".length)
      lx.ws()
      val off = lx.parseNumber()
      require(off >= 0 && off == math.floor(off) && off < bytes.length,
        s"bad startxref offset $off")
      val x = new Lex(bytes, off.toInt)
      x.ws()
      if (!x.tryKeyword("xref")) {
        // a `N G obj` at the xref offset is a PDF 1.5+ xref STREAM
        val probe = new Lex(bytes, off.toInt)
        probe.ws()
        val isObj =
          try { probe.parseNumber(); probe.ws(); probe.parseNumber()
            probe.ws(); probe.tryKeyword("obj") }
          catch { case _: Exception => false }
        throw new IllegalArgumentException(
          if (isObj) "cross-reference streams (PDF 1.5+) unsupported"
          else s"no xref table at offset ${off.toInt}")
      }
      val entries = Map.newBuilder[Int, Int]
      var done = false
      while (!done) {
        x.ws()
        if (x.tryKeyword("trailer")) done = true
        else {
          val start = x.parseNumber().toInt
          x.ws()
          val count = x.parseNumber().toInt
          require(start >= 0 && count >= 0, "bad xref subsection header")
          var i = 0
          while (i < count) {
            x.ws()
            val o = x.parseNumber()
            x.ws()
            x.parseNumber() // generation
            x.ws()
            val kind = x.peek
            require(kind == 'n' || kind == 'f',
              s"bad xref entry kind at offset ${x.p}")
            x.p += 1
            if (kind == 'n') entries += ((start + i, o.toInt))
            i += 1
          }
        }
      }
      val t = x.parseObject() match {
        case d: Map[_, _] => d.asInstanceOf[Map[String, Any]]
        case other => throw new IllegalArgumentException(
          s"trailer is not a dictionary: $other")
      }
      require(!t.contains("Encrypt"), "encrypted PDF unsupported")
      require(!t.contains("Prev"),
        "incremental updates (/Prev) unsupported")
      (entries.result(), t)
    }

    private val cache =
      scala.collection.mutable.Map.empty[Int, Any]

    def obj(num: Int): Any = cache.getOrElseUpdate(num, {
      val off = xref.getOrElse(num,
        throw new IllegalArgumentException(s"object $num not in xref"))
      val lx = new Lex(bytes, off)
      lx.ws()
      val n = lx.parseNumber().toInt
      require(n == num, s"xref offset for $num holds object $n")
      lx.ws()
      lx.parseNumber() // generation
      lx.expectKeyword("obj")
      val v = lx.parseObject()
      lx.ws()
      if (lx.tryKeyword("stream")) {
        // spec: `stream` is followed by CRLF or LF (never CR alone)
        if (lx.peek == '\r') lx.p += 1
        require(lx.peek == '\n', "missing EOL after 'stream'")
        lx.p += 1
        val dict = v match {
          case d: Map[_, _] => d.asInstanceOf[Map[String, Any]]
          case _ => throw new IllegalArgumentException(
            s"stream object $num lacks a dictionary")
        }
        val len = intOf(resolve(dict.getOrElse("Length",
          throw new IllegalArgumentException(
            s"stream object $num missing /Length"))))
        require(len >= 0 && lx.p.toLong + len <= bytes.length,
          s"stream of $len bytes overruns the file")
        val data = java.util.Arrays.copyOfRange(bytes, lx.p, lx.p + len)
        lx.p += len
        lx.expectKeyword("endstream")
        PStream(dict, data)
      } else v
    })

    def resolve(v: Any): Any = v match {
      case PRef(n) => resolve(obj(n))
      case other => other
    }

    def root: Map[String, Any] =
      dictOf(resolve(trailer.getOrElse("Root",
        throw new IllegalArgumentException("trailer missing /Root"))))
  }

  private def lastIndexOf(hay: Array[Byte], needle: String): Int = {
    val nb = needle.getBytes("US-ASCII")
    var i = hay.length - nb.length
    while (i >= 0) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i -= 1
    }
    -1
  }

  private def intOf(v: Any): Int = v match {
    case d: Double if d == math.floor(d) => d.toInt
    case other =>
      throw new IllegalArgumentException(s"expected integer, got $other")
  }

  private def dictOf(v: Any): Map[String, Any] = v match {
    case d: Map[_, _] => d.asInstanceOf[Map[String, Any]]
    case other =>
      throw new IllegalArgumentException(s"expected dictionary, got $other")
  }

  /** Decode a content stream's bytes: raw, or `/FlateDecode` through
    * the zlib wrapper over the hand-rolled inflate (header check,
    * Adler-32 verified). Any other filter, and any `/DecodeParms`,
    * rejects loudly. */
  private def decodeStream(s: PStream): Array[Byte] = {
    (s.dict.get("DecodeParms") orElse s.dict.get("DP")).foreach {
      case PNull => ()
      case parms => throw new IllegalArgumentException(
        s"/DecodeParms unsupported: $parms")
    }
    s.dict.get("Filter") match {
      case None | Some(PNull) => s.data
      case Some(PName("FlateDecode")) => zlibInflate(s.data)
      case Some(v: Vector[_]) if v == Vector(PName("FlateDecode")) =>
        zlibInflate(s.data)
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported stream filter: $other")
    }
  }

  /** RFC 1950 over [[PngCodec.inflateDynamic]] for unknown output size
    * (a content stream's decompressed length is not declared — the
    * gzip-member situation, not the PNG one): CMF/FLG checks, raw
    * inflate from offset 2, big-endian Adler-32 verified at the
    * inflate's returned end offset. */
  private def zlibInflate(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 6, "zlib stream truncated")
    val cmf = data(0) & 0xff
    val flg = data(1) & 0xff
    require((cmf & 0x0f) == 8, s"zlib method ${cmf & 0x0f} != deflate")
    require((cmf * 256 + flg) % 31 == 0, "zlib header checksum failed")
    require((flg & 0x20) == 0, "preset dictionary not supported")
    val (out, end) = PngCodec.inflateDynamic(data, 2)
    require(end + 4 <= data.length, "zlib Adler-32 trailer truncated")
    val stored = ((data(end) & 0xffL) << 24) | ((data(end + 1) & 0xffL) << 16) |
      ((data(end + 2) & 0xffL) << 8) | (data(end + 3) & 0xffL)
    val computed = PngCodec.adler32(out) & 0xffffffffL
    require(stored == computed,
      f"zlib Adler-32 mismatch: stored $stored%08x != computed $computed%08x")
    out
  }

  // ------------------------------------------------ text extraction

  private sealed trait Enc
  private case object WinAnsi extends Enc
  private case object StdAscii extends Enc

  /** Resolve a page's font resource to its decode arm; Type0/CID and
    * unknown encodings reject loudly. */
  private def encodingOf(doc: Doc, fontDict: Map[String, Any]): Enc = {
    fontDict.get("Subtype") match {
      case Some(PName("Type0")) => throw new IllegalArgumentException(
        "Type0/CID fonts unsupported")
      case _ => ()
    }
    doc.resolve(fontDict.getOrElse("Encoding", PNull)) match {
      case PName("WinAnsiEncoding") => WinAnsi
      case PName("StandardEncoding") | PNull => StdAscii
      case other => throw new IllegalArgumentException(
        s"unsupported font encoding: $other")
    }
  }

  /** Run the operator machine over one page's (decoded, concatenated)
    * content, appending to `sb` under the extraction law. */
  private def pageText(doc: Doc, page: Map[String, Any],
      sb: StringBuilder): Unit = {
    val resources = dictOf(doc.resolve(page.getOrElse("Resources",
      Map.empty[String, Any])))
    val fontRefs = resources.get("Font")
      .map(f => dictOf(doc.resolve(f))).getOrElse(Map.empty)
    val fontEnc = scala.collection.mutable.Map.empty[String, Enc]
    def encFor(name: String): Enc = fontEnc.getOrElseUpdate(name,
      encodingOf(doc, dictOf(doc.resolve(fontRefs.getOrElse(name,
        throw new IllegalArgumentException(s"font /$name not in resources"))))))
    // /Contents: one stream or an array; array parts concatenate with
    // an EOL between (ISO 32000-1 §7.8.2)
    val content: Array[Byte] = doc.resolve(page.getOrElse("Contents",
      throw new IllegalArgumentException("page missing /Contents"))) match {
      case s: PStream => decodeStream(s)
      case parts: Vector[_] =>
        val out = new java.io.ByteArrayOutputStream()
        parts.foreach { ref =>
          val s = doc.resolve(ref) match {
            case st: PStream => st
            case other => throw new IllegalArgumentException(
              s"contents element is not a stream: $other")
          }
          out.write(decodeStream(s))
          out.write('\n')
        }
        out.toByteArray
      case other => throw new IllegalArgumentException(
        s"unsupported /Contents: $other")
    }
    val lx = new Lex(content, 0)
    val operands = scala.collection.mutable.ArrayBuffer.empty[Any]
    var enc: Enc = null
    var needSep = true // page boundary separates
    def append(bytes: Array[Byte]): Unit = {
      require(enc != null, "text shown before any Tf font selection")
      val s = enc match {
        case WinAnsi => decodeWinAnsi(bytes)
        case StdAscii => decodeStandard(bytes)
      }
      if (needSep && sb.nonEmpty) sb.append(' ')
      needSep = false
      sb.append(s)
    }
    def strOperand(): Array[Byte] = operands.lastOption match {
      case Some(b: Array[Byte]) => b
      case other => throw new IllegalArgumentException(
        s"show operator without a string operand: $other")
    }
    var done = false
    while (!done) {
      lx.ws()
      val c = lx.peek
      if (c == -1) done = true
      else if (c == '(' || c == '<' || c == '[' || c == '/' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9'))
        operands += lx.parseObject()
      else {
        // operator token: regular characters (includes ' and ")
        val start = lx.p
        while (lx.peek != -1 && !isWs(lx.peek) && !isDelim(lx.peek))
          lx.p += 1
        require(lx.p > start, s"unparseable content at offset $start")
        val op = new String(content, start, lx.p - start, "US-ASCII")
        op match {
          case "BT" => needSep = true
          case "Td" | "TD" | "Tm" | "T*" => needSep = true
          case "Tf" =>
            require(operands.length >= 2, "Tf needs font and size")
            operands(operands.length - 2) match {
              case PName(n) => enc = encFor(n)
              case other => throw new IllegalArgumentException(
                s"Tf font operand is not a name: $other")
            }
          case "Tj" => append(strOperand())
          case "'" => needSep = true; append(strOperand())
          case "\"" => needSep = true; append(strOperand())
          case "TJ" => operands.lastOption match {
            case Some(arr: Vector[_]) => arr.foreach {
              case b: Array[Byte] => append(b)
              case n: Double => if (n <= TJ_SPACE_KERN) needSep = true
              case other => throw new IllegalArgumentException(
                s"bad TJ element: $other")
            }
            case other => throw new IllegalArgumentException(
              s"TJ without an array operand: $other")
          }
          case "Do" => throw new IllegalArgumentException(
            "form/image XObjects (Do) unsupported — their text would be lost")
          case "BI" => throw new IllegalArgumentException(
            "inline images (BI) unsupported")
          case _ => () // ET, graphics state, color, path ops: inert
        }
        operands.clear()
      }
    }
  }

  /** Collect `/Page` leaves of the page tree in document order. */
  private def collectPages(doc: Doc, node: Any,
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]]): Unit =
    dictOf(doc.resolve(node)) match {
      case d if d.get("Type").contains(PName("Pages")) =>
        doc.resolve(d.getOrElse("Kids",
          throw new IllegalArgumentException("/Pages missing /Kids"))) match {
          case kids: Vector[_] => kids.foreach(collectPages(doc, _, out))
          case other => throw new IllegalArgumentException(
            s"/Kids is not an array: $other")
        }
      case d if d.get("Type").contains(PName("Page")) => out += d
      case d => throw new IllegalArgumentException(
        s"unexpected page-tree node type: ${d.get("Type")}")
    }

  /** Extract the document's text per the extraction law. */
  def extractText(bytes: Array[Byte]): PdfDoc = {
    val doc = new Doc(bytes)
    val pagesRoot = doc.root.getOrElse("Pages",
      throw new IllegalArgumentException("catalog missing /Pages"))
    val pages = scala.collection.mutable.ArrayBuffer
      .empty[Map[String, Any]]
    collectPages(doc, pagesRoot, pages)
    val sb = new StringBuilder
    pages.foreach(pageText(doc, _, sb))
    PdfDoc(pages.length, collapse(sb.toString))
  }

  private def collapse(s: String): String = {
    val out = new StringBuilder(s.length)
    var pending = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f')
        pending = out.nonEmpty
      else {
        if (pending) out.append(' ')
        pending = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  // ------------------------------------------------ encoder

  /** Write a PDF 1.4 document: one content stream per page (source
    * text encoded Windows-1252 — the WinAnsi font's byte space),
    * FlateDecode-compressed at `level` (0 = stored DEFLATE blocks
    * still inside a valid zlib wrapper), classic xref table + trailer.
    * `/Resources` binds `/F1` = Helvetica (WinAnsiEncoding) and `/F2`
    * = Courier (no /Encoding — the ASCII arm). `indirectLength` emits
    * each stream's `/Length` as an indirect reference resolved from an
    * object AFTER the stream — the layout single-pass writers produce,
    * which a reader must resolve through the xref. Encode side is
    * corpus machinery (JDK Deflater, like the gzip member writer); the
    * gated path is [[extractText]]. */
  def encode(pages: Seq[String], level: Int = 6,
      indirectLength: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val nObjs = 4 + 2 * n + (if (indirectLength) n else 0)
    val offsets = new Array[Int](nObjs + 1)
    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n%")
    // binary-marker comment line (4 high bytes) per convention
    out.write(Array[Byte](0xe2.toByte, 0xe3.toByte, 0xcf.toByte,
      0xd3.toByte))
    w("\n")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    val kids = (0 until n).map(i => s"${5 + 2 * i} 0 R").mkString(" ")
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count $n >>\n"))
    obj(3)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>\n"))
    obj(4)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\n"))
    val lengths = new Array[Int](n)
    pages.zipWithIndex.foreach { case (content, i) =>
      val pageObj = 5 + 2 * i
      val contObj = 6 + 2 * i
      obj(pageObj)(w(s"<< /Type /Page /Parent 2 0 R" +
        " /MediaBox [0 0 612 792]" +
        " /Resources << /Font << /F1 3 0 R /F2 4 0 R >> >>" +
        s" /Contents $contObj 0 R >>\n"))
      val raw = content.getBytes(CP1252)
      val defl = new java.util.zip.Deflater(level) // zlib wrapper
      defl.setInput(raw)
      defl.finish()
      val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
      defl.end()
      val bytes = comp.toByteArray
      lengths(i) = bytes.length
      val lenRef =
        if (indirectLength) s"${4 + 2 * n + 1 + i} 0 R"
        else bytes.length.toString
      offsets(contObj) = out.size()
      w(s"$contObj 0 obj\n<< /Length $lenRef /Filter /FlateDecode >>\n" +
        "stream\n")
      out.write(bytes)
      w("\nendstream\nendobj\n")
    }
    if (indirectLength) (0 until n).foreach { i =>
      obj(4 + 2 * n + 1 + i)(w(s"${lengths(i)}\n"))
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${nObjs + 1}\n")
    w("0000000000 65535 f \n")
    (1 to nObjs).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
