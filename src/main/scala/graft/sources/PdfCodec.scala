package graft.sources

import graft.multimodal.PngCodec

/** PDF text extraction, dependency-free, as a CONSTRAINED SUBSET of
  * ISO 32000-1 — the other dominant document format in real crawl
  * corpora (papers, books, reports; a large share of Common Crawl
  * response records) next to HTML. The subset covers what a text
  * curation pipeline needs and rejects everything else LOUDLY:
  *
  *  - classic cross-reference TABLES (`xref` … `trailer`) AND PDF 1.5+
  *    cross-reference STREAMS (`/Type /XRef`, W-typed binary columns)
  *    with `/Type /ObjStm` object streams — the layout the majority of
  *    real-world PDFs written in the last ~20 years use; HYBRID
  *    reference files (`/XRefStm` in a classic trailer) reject;
  *  - incremental updates: `/Prev` chains of classic AND xref-stream
  *    sections merge newest-section-wins, with freed (`f`/type-0)
  *    rows MASKING older generations (a reference to a freed object
  *    reads as null, §7.3.10); chain loops, encryption (`/Encrypt`)
  *    and hybrid-reference files (`/XRefStm`) reject on any section;
  *  - content streams stored raw or `/FlateDecode` (RFC 1950 zlib over
  *    the hand-rolled DEFLATE inflate, [[PngCodec.inflateDynamic]] —
  *    the same engine PNG/WARC already run); `/DecodeParms` is accepted
  *    in exactly one shape — the PNG row-predictor family xref streams
  *    almost universally carry (`/Predictor 10–15`, one 8-bit
  *    component) — and rejects loudly otherwise;
  *  - simple fonts with `/WinAnsiEncoding` (≅ Windows-1252; the five
  *    undefined slots reject) or Standard/absent encoding (ASCII
  *    subset); `/Type0` composite fonts with `/Encoding /Identity-H`
  *    and a `/ToUnicode` CMap (bfchar + incrementing bfrange, 2-byte
  *    code space — the CJK/subset-embedding layout); `Identity-V`,
  *    named CMaps, array-destination bfranges, `usecmap` imports, and
  *    Type0 WITHOUT ToUnicode reject (glyph ids are not text);
  *  - the text-showing operator family `Tj TJ ' "` with the positioning
  *    family `Td TD Tm T*` driving word separation; FORM XObject draws
  *    (`Do` on `/Subtype /Form`) execute with the form's own resources
  *    under an implicit state save/restore (ISO 32000-1 §8.10.1), the
  *    form boundary separating words like a page boundary; image
  *    XObjects, recursive forms, and inline images (`BI`) reject —
  *    silently losing their text would be worse than failing.
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

  /** Where an object lives: at a byte offset in the file (classic
    * `n` entries and xref-stream type-1 rows), or compressed inside a
    * `/Type /ObjStm` object stream (type-2 rows: stream object number
    * + index within it). */
  private sealed trait XrefEntry
  private final case class InFile(off: Int) extends XrefEntry
  private final case class InObjStm(stm: Int, idx: Int) extends XrefEntry

  /** The parsed document graph a caller walks: xref-resolved objects,
    * lazily fetched and memoized. */
  private final class Doc(bytes: Array[Byte]) {
    require(bytes.length >= 16 &&
      new String(bytes, 0, 5, "US-ASCII") == "%PDF-",
      "not a PDF (missing %PDF- header)")

    /** Merged cross-reference over the `/Prev` chain: the NEWEST
      * section deciding each object number wins — including its `f`
      * (freed) rows, which must MASK an older generation's copy
      * rather than let it resurrect (an incremental save that deletes
      * an object writes exactly such a row). `None` = freed; a
      * reference to a freed object reads as null (ISO 32000-1
      * §7.3.10), which downstream consumers then reject in their own
      * terms. The trailer is the newest section's; `/Encrypt` and
      * hybrid-reference `/XRefStm` reject on EVERY section of the
      * chain; a `/Prev` loop or out-of-file offset rejects. */
    private val (xref: Map[Int, Option[XrefEntry]],
        trailer: Map[String, Any]) = {
      val sxAt = lastIndexOf(bytes, "startxref")
      require(sxAt >= 0, "missing startxref")
      val lx = new Lex(bytes, sxAt + "startxref".length)
      lx.ws()
      val off0 = lx.parseNumber()
      require(off0 >= 0 && off0 == math.floor(off0) &&
        off0 < bytes.length, s"bad startxref offset $off0")
      val decided =
        scala.collection.mutable.Map.empty[Int, Option[XrefEntry]]
      var newest: Map[String, Any] = null
      val seen = scala.collection.mutable.Set.empty[Int]
      var at = off0.toInt
      while (at >= 0) {
        require(seen.add(at), s"xref /Prev chain loops at offset $at")
        val x = new Lex(bytes, at)
        x.ws()
        val (entries, t) =
          if (x.tryKeyword("xref")) parseClassicXref(x)
          else parseXrefStream(at)
        entries.foreach { case (n, e) =>
          if (!decided.contains(n)) decided(n) = e
        }
        require(!t.contains("Encrypt"), "encrypted PDF unsupported")
        require(!t.contains("XRefStm"),
          "hybrid-reference files (/XRefStm) unsupported")
        if (newest == null) newest = t
        at = t.get("Prev") match {
          case None => -1
          case Some(v) =>
            val p = intOf(v)
            require(p >= 0 && p < bytes.length,
              s"/Prev offset $p outside the file")
            p
        }
      }
      (decided.toMap, newest)
    }

    /** Classic `xref` table + `trailer` dictionary. `x` sits just
      * after the `xref` keyword. Entries come back in SECTION order
      * (freed rows included) for the chain merge to arbitrate. */
    private def parseClassicXref(x: Lex)
        : (Seq[(Int, Option[XrefEntry])], Map[String, Any]) = {
      val entries = Seq.newBuilder[(Int, Option[XrefEntry])]
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
            entries += ((start + i,
              if (kind == 'n') Some(InFile(o.toInt)) else None))
            i += 1
          }
        }
      }
      val t = x.parseObject() match {
        case d: Map[_, _] => d.asInstanceOf[Map[String, Any]]
        case other => throw new IllegalArgumentException(
          s"trailer is not a dictionary: $other")
      }
      (entries.result(), t)
    }

    /** PDF 1.5+ cross-reference STREAM: the startxref offset holds
      * `N G obj` with a `/Type /XRef` stream whose DATA is the table —
      * binary rows of `/W`-typed columns over the `/Index` subsections,
      * FlateDecode'd (usually PNG-predicted) through the same
      * [[decodeStream]] every other stream runs. The stream's dict IS
      * the trailer. Its `/Length` must be direct: the xref is what
      * resolves indirect references, so it cannot depend on itself. */
    private def parseXrefStream(off: Int)
        : (Seq[(Int, Option[XrefEntry])], Map[String, Any]) = {
      val lx = new Lex(bytes, off)
      lx.ws()
      val okHeader =
        try { lx.parseNumber(); lx.ws(); lx.parseNumber(); lx.ws()
          lx.tryKeyword("obj") }
        catch { case _: Exception => false }
      require(okHeader, s"no xref table or xref stream at offset $off")
      val dict = lx.parseObject() match {
        case d: Map[_, _] => d.asInstanceOf[Map[String, Any]]
        case other => throw new IllegalArgumentException(
          s"object at startxref is not a stream dictionary: $other")
      }
      lx.ws()
      require(lx.tryKeyword("stream"),
        "object at startxref carries no stream (not an xref stream)")
      if (lx.peek == '\r') lx.p += 1
      require(lx.peek == '\n', "missing EOL after 'stream'")
      lx.p += 1
      val len = intOf(dict.getOrElse("Length",
        throw new IllegalArgumentException("xref stream missing /Length")))
      require(len >= 0 && lx.p.toLong + len <= bytes.length,
        s"xref stream of $len bytes overruns the file")
      val data = java.util.Arrays.copyOfRange(bytes, lx.p, lx.p + len)
      require(dict.get("Type").contains(PName("XRef")),
        s"stream at startxref is not /Type /XRef: ${dict.get("Type")}")
      val table = decodeStream(PStream(dict, data))
      val w = dict.getOrElse("W", throw new IllegalArgumentException(
        "xref stream missing /W")) match {
        case v: Vector[_] if v.length == 3 => v.map(intOf)
        case other => throw new IllegalArgumentException(
          s"/W is not a 3-array: $other")
      }
      require(w.forall(x => x >= 0 && x <= 4), s"bad /W widths $w")
      val size = intOf(dict.getOrElse("Size",
        throw new IllegalArgumentException("xref stream missing /Size")))
      val index: Vector[Int] = dict.get("Index") match {
        case None => Vector(0, size)
        case Some(v: Vector[_]) if v.length % 2 == 0 =>
          v.map(intOf).toVector
        case Some(other) => throw new IllegalArgumentException(
          s"/Index is not an even-length array: $other")
      }
      val rowW = w.sum
      require(rowW > 0, "/W declares zero-width rows")
      val nRows = index.grouped(2).map(_(1)).sum
      require(table.length == nRows * rowW,
        s"xref table of ${table.length} bytes != $nRows rows of $rowW")
      val entries = Seq.newBuilder[(Int, Option[XrefEntry])]
      var pos = 0
      def field(width: Int): Long = {
        var v = 0L
        var i = 0
        while (i < width) {
          v = (v << 8) | (table(pos) & 0xffL); pos += 1; i += 1
        }
        v
      }
      index.grouped(2).foreach { pair =>
        val start = pair(0)
        val count = pair(1)
        require(start >= 0 && count >= 0, s"bad /Index subsection $pair")
        var i = 0
        while (i < count) {
          // a zero-width type column defaults the type to 1 (ISO
          // 32000-1 Table 17)
          val tpe = if (w(0) == 0) 1L else field(w(0))
          val f2 = field(w(1))
          val f3 = field(w(2))
          tpe match {
            case 0 => entries += ((start + i, None)) // freed
            case 1 =>
              require(f2 <= Int.MaxValue, s"xref offset $f2 overruns")
              entries += ((start + i, Some(InFile(f2.toInt))))
            case 2 =>
              require(f2 <= Int.MaxValue && f3 <= Int.MaxValue,
                s"xref type-2 fields overrun: $f2 $f3")
              entries += ((start + i, Some(InObjStm(f2.toInt, f3.toInt))))
            case other => throw new IllegalArgumentException(
              s"xref entry type $other is outside the subset")
          }
          i += 1
        }
      }
      (entries.result(), dict)
    }

    private val cache =
      scala.collection.mutable.Map.empty[Int, Any]
    private val objStmCache =
      scala.collection.mutable.Map.empty[Int, Vector[(Int, Any)]]

    def obj(num: Int): Any = cache.getOrElseUpdate(num,
      xref.getOrElse(num, throw new IllegalArgumentException(
        s"object $num not in xref")) match {
        case None => PNull // freed by an incremental update (§7.3.10)
        case Some(InFile(off)) => objAt(num, off)
        case Some(InObjStm(stm, idx)) =>
          val objs = objStmObjects(stm)
          require(idx >= 0 && idx < objs.length,
            s"object $num: index $idx outside object stream $stm")
          val (foundNum, v) = objs(idx)
          require(foundNum == num,
            s"object stream $stm index $idx holds object $foundNum, " +
              s"xref says $num")
          v
      })

    private def objAt(num: Int, off: Int): Any = {
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
    }

    /** All objects of object stream `stm`, parsed once: `/N` pairs of
      * (object number, relative offset) head the DECODED bytes, each
      * object parsed at `/First` + offset. Streams cannot nest inside
      * an object stream (ISO 32000-1 §7.5.7) — a `stream` keyword
      * there rejects; so does an object stream not stored directly in
      * the file (a type-2 entry pointing at another type-2 object
      * would recurse). */
    private def objStmObjects(stm: Int): Vector[(Int, Any)] =
      objStmCache.getOrElseUpdate(stm, {
        require(xref.get(stm).flatten.exists(_.isInstanceOf[InFile]),
          s"object stream $stm must itself live in the file")
        val s = obj(stm) match {
          case st: PStream => st
          case other => throw new IllegalArgumentException(
            s"object $stm is not an object stream: $other")
        }
        require(s.dict.get("Type").contains(PName("ObjStm")),
          s"object $stm is not /Type /ObjStm: ${s.dict.get("Type")}")
        val n = intOf(resolve(s.dict.getOrElse("N",
          throw new IllegalArgumentException(
            s"object stream $stm missing /N"))))
        val first = intOf(resolve(s.dict.getOrElse("First",
          throw new IllegalArgumentException(
            s"object stream $stm missing /First"))))
        val data = decodeStream(s)
        require(first >= 0 && first <= data.length,
          s"object stream $stm: /First $first outside the data")
        val hdr = new Lex(data, 0)
        val pairs = (0 until n).map { _ =>
          hdr.ws()
          val num = hdr.parseNumber().toInt
          hdr.ws()
          val rel = hdr.parseNumber().toInt
          (num, rel)
        }
        require(hdr.p <= first,
          s"object stream $stm: header overruns /First")
        pairs.map { case (num, rel) =>
          require(rel >= 0 && first + rel < data.length,
            s"object stream $stm: object $num offset $rel outside data")
          val ox = new Lex(data, first + rel)
          val v = ox.parseObject()
          ox.ws()
          require(!ox.tryKeyword("stream"),
            "streams cannot live inside an object stream")
          (num, v)
        }.toVector
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

  /** Decode a stream's bytes: raw, or `/FlateDecode` through the zlib
    * wrapper over the hand-rolled inflate (header check, Adler-32
    * verified). `/DecodeParms` is accepted in exactly one shape — the
    * PNG row-predictor family cross-reference streams almost
    * universally carry (`/Predictor 10–15`, `/Colors 1`,
    * `/BitsPerComponent 8`, `/Columns N`) — and rejects loudly
    * otherwise (TIFF predictor 2, multi-component rows, parms on a
    * raw stream, a parms value that is not a direct dictionary). */
  private def decodeStream(s: PStream): Array[Byte] = {
    val parms: Option[Map[String, Any]] =
      (s.dict.get("DecodeParms") orElse s.dict.get("DP")) match {
        case None | Some(PNull) => None
        case Some(d: Map[_, _]) => Some(d.asInstanceOf[Map[String, Any]])
        case Some(other) => throw new IllegalArgumentException(
          s"/DecodeParms unsupported: $other")
      }
    val inflated = s.dict.get("Filter") match {
      case None | Some(PNull) =>
        require(parms.isEmpty, "/DecodeParms on an unfiltered stream")
        return s.data
      case Some(PName("FlateDecode")) => zlibInflate(s.data)
      case Some(v: Vector[_]) if v == Vector(PName("FlateDecode")) =>
        zlibInflate(s.data)
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported stream filter: $other")
    }
    parms match {
      case None => inflated
      case Some(d) => unpredict(inflated, d)
    }
  }

  /** Undo PNG row predictors (ISO 32000-1 §7.4.4.4 — the same filter
    * algebra as RFC 2083, which [[PngCodec]] already decodes for
    * rasters): one 8-bit component, so rows are `Columns` bytes each,
    * prefixed by a per-row filter tag, and the left/up neighbours are
    * single bytes (bpp = 1). Predictor 1 is the identity; 2 (TIFF)
    * and multi-component shapes are outside the subset. */
  private def unpredict(data: Array[Byte],
      parms: Map[String, Any]): Array[Byte] = {
    val pred = intOf(parms.getOrElse("Predictor", 1.0))
    if (pred == 1) return data
    require(pred >= 10 && pred <= 15, s"predictor $pred unsupported")
    val colors = intOf(parms.getOrElse("Colors", 1.0))
    val bpc = intOf(parms.getOrElse("BitsPerComponent", 8.0))
    require(colors == 1 && bpc == 8,
      s"predictor subset is Colors 1 / BitsPerComponent 8, " +
        s"got $colors/$bpc")
    val cols = intOf(parms.getOrElse("Columns",
      throw new IllegalArgumentException("/Predictor without /Columns")))
    require(cols > 0, s"bad /Columns $cols")
    require(data.length % (cols + 1) == 0,
      s"predicted data of ${data.length} bytes is not rows of ${cols + 1}")
    val nRows = data.length / (cols + 1)
    val out = new Array[Byte](nRows * cols)
    var r = 0
    while (r < nRows) {
      val tag = data(r * (cols + 1)) & 0xff
      var c = 0
      while (c < cols) {
        val x = data(r * (cols + 1) + 1 + c) & 0xff
        val a = if (c > 0) out(r * cols + c - 1) & 0xff else 0 // left
        val b = if (r > 0) out((r - 1) * cols + c) & 0xff else 0 // up
        val ul = if (r > 0 && c > 0) out((r - 1) * cols + c - 1) & 0xff
          else 0 // upper-left
        val v = tag match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth
            val p = a + b - ul
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - ul)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else ul)
          case other => throw new IllegalArgumentException(
            s"bad PNG filter tag $other in predicted stream")
        }
        out(r * cols + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
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
  private final case class CidIdentity(map: ToUnicode) extends Enc

  /** A parsed `/ToUnicode` CMap's mapping: single-CID entries
    * (`bfchar`) and incrementing ranges (`bfrange` with a hex-string
    * destination — the array form rejects at parse time). Destinations
    * are UTF-16BE, so one CID may expand to several code units (the
    * surrogate-pair path for astral characters is just the 2-unit
    * case, nothing special). */
  private final case class ToUnicode(singles: Map[Int, String],
      ranges: Vector[(Int, Int, String)]) {
    def decode(cid: Int): String = singles.get(cid) match {
      case Some(s) => s
      case None =>
        val r = ranges.find(r => cid >= r._1 && cid <= r._2)
          .getOrElse(throw new IllegalArgumentException(
            f"CID 0x$cid%04x has no ToUnicode mapping"))
        val (lo, _, dst) = r
        // bfrange increments the LAST UTF-16 code unit (ISO 32000-1
        // §9.10.3's "last byte" law lifted to the code-unit grain the
        // parser already validated against overflow)
        val last = dst.charAt(dst.length - 1) + (cid - lo)
        dst.substring(0, dst.length - 1) + last.toChar
    }
  }

  /** Parse a `/ToUnicode` CMap (decoded stream bytes): a PostScript
    * operand-stack walk where only the three block constructs matter —
    * `begincodespacerange` (the subset requires every range be 2-byte:
    * Identity-H CIDs are uint16 and a mixed-width code space would
    * make string segmentation stateful), `beginbfchar` (src/dst hex
    * pairs), `beginbfrange` (lo/hi/dst triples; the ARRAY destination
    * form and `usecmap` imports reject loudly). Every other token
    * (dict framing, `def`, CMap metadata) clears the operand stack and
    * is inert, like the graphics operators in the text machine. */
  private def parseToUnicode(bytes: Array[Byte]): ToUnicode = {
    val lx = new Lex(bytes, 0)
    val operands = scala.collection.mutable.ArrayBuffer.empty[Any]
    val singles = Map.newBuilder[Int, String]
    val ranges = Vector.newBuilder[(Int, Int, String)]
    var sawCodespace = false
    def hex(v: Any, what: String): Array[Byte] = v match {
      case b: Array[Byte] => b
      case other => throw new IllegalArgumentException(
        s"$what is not a hex string: $other")
    }
    def cid2(v: Any, what: String): Int = {
      val b = hex(v, what)
      require(b.length == 2, s"$what must be 2 bytes, got ${b.length}")
      ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    }
    def utf16(v: Any, what: String): String = {
      val b = hex(v, what)
      require(b.length >= 2 && b.length % 2 == 0,
        s"$what must be nonempty UTF-16BE bytes, got ${b.length}")
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    def block(end: String)(entry: () => Unit): Unit = {
      var done = false
      while (!done) {
        lx.ws()
        require(lx.peek != -1, s"CMap ends inside a block ($end missing)")
        if (lx.tryKeyword(end)) done = true else entry()
      }
    }
    var done = false
    while (!done) {
      lx.ws()
      val c = lx.peek
      if (c == -1) done = true
      else if (c == '<' || c == '[' || c == '(' || c == '/' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9'))
        operands += lx.parseObject()
      else {
        val start = lx.p
        while (lx.peek != -1 && !isWs(lx.peek) && !isDelim(lx.peek))
          lx.p += 1
        require(lx.p > start, s"unparseable CMap token at offset $start")
        val op = new String(lx.b, start, lx.p - start, "US-ASCII")
        op match {
          case "begincodespacerange" => block("endcodespacerange") { () =>
            val lo = lx.parseObject(); lx.ws(); val hi = lx.parseObject()
            cid2(lo, "codespace low"); cid2(hi, "codespace high")
            sawCodespace = true
          }
          case "beginbfchar" => block("endbfchar") { () =>
            val src = lx.parseObject(); lx.ws(); val dst = lx.parseObject()
            singles += ((cid2(src, "bfchar source"),
              utf16(dst, "bfchar destination")))
          }
          case "beginbfrange" => block("endbfrange") { () =>
            val lo = lx.parseObject(); lx.ws()
            val hi = lx.parseObject(); lx.ws()
            val dst = lx.parseObject()
            dst match {
              case _: Vector[_] => throw new IllegalArgumentException(
                "bfrange array destinations are outside the subset")
              case _ => ()
            }
            val l = cid2(lo, "bfrange low")
            val h = cid2(hi, "bfrange high")
            require(l <= h, f"bfrange low 0x$l%04x > high 0x$h%04x")
            val d = utf16(dst, "bfrange destination")
            val lastUnit = d.charAt(d.length - 1)
            require(lastUnit + (h - l) <= 0xffff,
              "bfrange increment overflows the last UTF-16 code unit")
            require(!Character.isHighSurrogate(lastUnit) || l == h,
              "bfrange cannot increment through a surrogate")
            ranges += ((l, h, d))
          }
          case "usecmap" => throw new IllegalArgumentException(
            "usecmap CMap imports are outside the subset")
          case _ => operands.clear() // def / begin / end / metadata
        }
        operands.clear()
      }
    }
    require(sawCodespace, "ToUnicode CMap missing codespacerange")
    ToUnicode(singles.result(), ranges.result())
  }

  /** Resolve a page's font resource to its decode arm. `/Type0` fonts
    * are in the subset iff `/Encoding /Identity-H` (CID = the 2-byte
    * big-endian code, the layout CJK and subset-embedded fonts
    * actually ship) with a single descendant CIDFont and a
    * `/ToUnicode` CMap — extraction without ToUnicode would need
    * per-font glyph knowledge this reader does not have, so its
    * absence rejects loudly rather than emitting glyph ids as text.
    * `Identity-V` (vertical) and named CMaps reject. */
  private def encodingOf(doc: Doc, fontDict: Map[String, Any]): Enc = {
    fontDict.get("Subtype") match {
      case Some(PName("Type0")) =>
        doc.resolve(fontDict.getOrElse("Encoding", PNull)) match {
          case PName("Identity-H") => ()
          case other => throw new IllegalArgumentException(
            s"Type0 encoding outside the subset (need Identity-H): $other")
        }
        doc.resolve(fontDict.getOrElse("DescendantFonts",
          throw new IllegalArgumentException(
            "Type0 font missing /DescendantFonts"))) match {
          case v: Vector[_] if v.length == 1 =>
            val d = dictOf(doc.resolve(v(0)))
            d.get("Subtype") match {
              case Some(PName("CIDFontType0")) |
                   Some(PName("CIDFontType2")) => ()
              case other => throw new IllegalArgumentException(
                s"descendant font subtype outside the subset: $other")
            }
          case other => throw new IllegalArgumentException(
            s"/DescendantFonts is not a 1-element array: $other")
        }
        val tu = doc.resolve(fontDict.getOrElse("ToUnicode",
          throw new IllegalArgumentException(
            "Type0 font without /ToUnicode (glyph ids are not text)")))
        val stream = tu match {
          case s: PStream => s
          case other => throw new IllegalArgumentException(
            s"/ToUnicode is not a stream: $other")
        }
        return CidIdentity(parseToUnicode(decodeStream(stream)))
      case _ => ()
    }
    doc.resolve(fontDict.getOrElse("Encoding", PNull)) match {
      case PName("WinAnsiEncoding") => WinAnsi
      case PName("StandardEncoding") | PNull => StdAscii
      case other => throw new IllegalArgumentException(
        s"unsupported font encoding: $other")
    }
  }

  /** The text-operator machine: runs content streams against the
    * extraction law, recursing through Form XObject draws (`Do`). One
    * instance per document; [[page]] resets the per-page text state
    * (the page boundary separates, and a page's first show needs its
    * own `Tf`). */
  private final class TextMachine(doc: Doc, sb: StringBuilder) {
    private var enc: Enc = null
    private var needSep = true
    private val executing = scala.collection.mutable.Set.empty[Int]

    def page(pg: Map[String, Any]): Unit = {
      enc = null
      needSep = true // page boundary separates
      val resources = dictOf(doc.resolve(pg.getOrElse("Resources",
        Map.empty[String, Any])))
      run(contentBytesOf(pg), resources)
    }

    // /Contents: one stream or an array; array parts concatenate with
    // an EOL between (ISO 32000-1 §7.8.2)
    private def contentBytesOf(pg: Map[String, Any]): Array[Byte] =
      doc.resolve(pg.getOrElse("Contents",
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

    private def append(bytes: Array[Byte]): Unit = {
      require(enc != null, "text shown before any Tf font selection")
      val s = enc match {
        case WinAnsi => decodeWinAnsi(bytes)
        case StdAscii => decodeStandard(bytes)
        case CidIdentity(map) =>
          // Identity-H: the string is a sequence of 2-byte big-endian
          // CIDs (the string MECHANISM — literal vs hex — is
          // irrelevant; both hand raw bytes here)
          require(bytes.length % 2 == 0,
            s"CID string of odd length ${bytes.length}")
          val out = new StringBuilder(bytes.length)
          var i = 0
          while (i < bytes.length) {
            out.append(map.decode(
              ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)))
            i += 2
          }
          out.toString
      }
      if (needSep && sb.nonEmpty) sb.append(' ')
      needSep = false
      sb.append(s)
    }

    /** One content stream under `resources` — a page's, or a form's
      * (with the FORM's resources, the shadowing the spec pins). */
    private def run(content: Array[Byte],
        resources: Map[String, Any]): Unit = {
      val fontRefs = resources.get("Font")
        .map(f => dictOf(doc.resolve(f))).getOrElse(Map.empty)
      val xobjRefs = resources.get("XObject")
        .map(f => dictOf(doc.resolve(f))).getOrElse(Map.empty)
      val fontEnc = scala.collection.mutable.Map.empty[String, Enc]
      def encFor(name: String): Enc = fontEnc.getOrElseUpdate(name,
        encodingOf(doc, dictOf(doc.resolve(fontRefs.getOrElse(name,
          throw new IllegalArgumentException(
            s"font /$name not in resources"))))))
      val lx = new Lex(content, 0)
      val operands = scala.collection.mutable.ArrayBuffer.empty[Any]
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
            case "Do" => doXObject(operands.toSeq, xobjRefs, resources)
            case "BI" => throw new IllegalArgumentException(
              "inline images (BI) unsupported")
            case _ => () // ET, graphics state, color, path ops: inert
          }
          operands.clear()
        }
      }
    }

    /** `Do` — execute a Form XObject (ISO 32000-1 §8.10.1): Do
      * brackets the form in an implicit graphics-state save/restore,
      * so the form INHERITS the current font and its own `Tf`
      * selections are discarded at exit; the form boundary separates
      * words on both sides (the page-boundary law one level down).
      * The form's OWN `/Resources` bind inside it (name SHADOWING: a
      * form's `/F1` may be a different font than the page's); a form
      * without `/Resources` inherits the caller's. Image XObjects and
      * recursive forms reject loudly — their content would otherwise
      * be lost or loop. */
    private def doXObject(operands: Seq[Any],
        xobjRefs: Map[String, Any],
        callerRes: Map[String, Any]): Unit = {
      val name = operands.lastOption match {
        case Some(PName(n)) => n
        case other => throw new IllegalArgumentException(
          s"Do without a name operand: $other")
      }
      val ref = xobjRefs.getOrElse(name,
        throw new IllegalArgumentException(
          s"XObject /$name not in resources"))
      val refNum = ref match {
        case PRef(n) => n
        case other => throw new IllegalArgumentException(
          s"XObject /$name is not an indirect stream: $other")
      }
      val st = doc.resolve(ref) match {
        case s: PStream => s
        case other => throw new IllegalArgumentException(
          s"XObject /$name is not a stream: $other")
      }
      st.dict.get("Subtype") match {
        case Some(PName("Form")) => ()
        case Some(PName("Image")) => throw new IllegalArgumentException(
          "image XObjects (Do) unsupported")
        case other => throw new IllegalArgumentException(
          s"unsupported XObject subtype: $other")
      }
      require(!executing.contains(refNum),
        s"recursive form XObject (object $refNum draws itself)")
      executing += refNum
      val savedEnc = enc
      needSep = true
      val formRes = st.dict.get("Resources")
        .map(r => dictOf(doc.resolve(r))).getOrElse(callerRes)
      run(decodeStream(st), formRes)
      enc = savedEnc
      needSep = true
      executing -= refNum
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
    val machine = new TextMachine(doc, sb)
    pages.foreach(machine.page)
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
    (1 to nObjs).foreach(i => w(s"${pad10(offsets(i))} 00000 n \n"))
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Zero-pad an xref offset in Locale.ROOT — the `f` interpolator's
    * `%010d` localizes digits under digit-localizing locales, and an
    * xref table with non-ASCII digits is unreadable. */
  private def pad10(n: Int): String =
    String.format(java.util.Locale.ROOT, "%010d",
      java.lang.Integer.valueOf(n))

  private def zlibDeflate(raw: Array[Byte], level: Int): Array[Byte] = {
    val defl = new java.util.zip.Deflater(level) // zlib wrapper
    defl.setInput(raw)
    defl.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    comp.toByteArray
  }

  private val BINARY_MARK = Array[Byte](0xe2.toByte, 0xe3.toByte,
    0xcf.toByte, 0xd3.toByte)

  /** Write a PDF 1.5 document — same page/font layout as [[encode]]
    * but with the cross-reference as a `/Type /XRef` STREAM (W-typed
    * binary rows `[1 4 2]`, FlateDecode'd), the modern layout the
    * majority of real-world PDFs use. `objStm = true` additionally
    * packs every NON-stream object (catalog, page tree, fonts, page
    * dicts) into one `/Type /ObjStm` object stream reached through
    * type-2 xref rows — content streams stay top-level (streams cannot
    * nest, ISO 32000-1 §7.5.7). `predictor = true` PNG-Up-predicts the
    * xref rows (`/DecodeParms << /Predictor 12 /Columns 7 >>`), the
    * shape single-pass writers actually emit. Encode side is corpus
    * machinery; the gated path is [[extractText]] (q251). */
  def encode15(pages: Seq[String], level: Int = 6,
      objStm: Boolean = false, predictor: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    // numbering mirrors [[encode]]: 1 catalog, 2 pages root, 3/4
    // fonts, 5+2i page dict, 6+2i content stream; then the ObjStm
    // (when packing) and the xref stream LAST
    val stmObj = if (objStm) Some(4 + 2 * n + 1) else None
    val xrefObj = 4 + 2 * n + (if (objStm) 2 else 1)
    val nObjs = xrefObj
    val offsets = new Array[Int](nObjs + 1)
    val inStm = Array.fill(nObjs + 1)(-1)
    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    w("%PDF-1.5\n%")
    out.write(BINARY_MARK)
    w("\n")
    val kids = (0 until n).map(i => s"${5 + 2 * i} 0 R").mkString(" ")
    val dictObjs: Seq[(Int, String)] = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>",
      3 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
        " /Encoding /WinAnsiEncoding >>"),
      4 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>") ++
      (0 until n).map { i =>
        (5 + 2 * i) -> (s"<< /Type /Page /Parent 2 0 R" +
          " /MediaBox [0 0 612 792]" +
          " /Resources << /Font << /F1 3 0 R /F2 4 0 R >> >>" +
          s" /Contents ${6 + 2 * i} 0 R >>")
      }
    pages.zipWithIndex.foreach { case (content, i) =>
      val contObj = 6 + 2 * i
      val bytes = zlibDeflate(content.getBytes(CP1252), level)
      offsets(contObj) = out.size()
      w(s"$contObj 0 obj\n<< /Length ${bytes.length}" +
        " /Filter /FlateDecode >>\nstream\n")
      out.write(bytes)
      w("\nendstream\nendobj\n")
    }
    if (objStm) {
      val dataSb = new StringBuilder
      val pairs = dictObjs.map { case (num, body) =>
        val off = dataSb.length
        dataSb.append(body).append('\n')
        (num, off)
      }
      val header = pairs.map { case (nn, oo) => s"$nn $oo" }
        .mkString(" ") + "\n"
      val stmRaw = (header + dataSb.toString).getBytes("US-ASCII")
      val stmDefl = zlibDeflate(stmRaw, 6)
      dictObjs.zipWithIndex.foreach { case ((num, _), idx) =>
        inStm(num) = idx
      }
      val sNum = stmObj.get
      offsets(sNum) = out.size()
      w(s"$sNum 0 obj\n<< /Type /ObjStm /N ${dictObjs.length}" +
        s" /First ${header.length} /Length ${stmDefl.length}" +
        " /Filter /FlateDecode >>\nstream\n")
      out.write(stmDefl)
      w("\nendstream\nendobj\n")
    } else dictObjs.foreach { case (num, body) =>
      offsets(num) = out.size()
      w(s"$num 0 obj\n$body\nendobj\n")
    }
    // the xref stream: one row per object 0..nObjs, W = [1 4 2]
    val xrefOff = out.size()
    val cols = 7
    val rows = new java.io.ByteArrayOutputStream()
    def row(t: Int, f2: Int, f3: Int): Unit = {
      rows.write(t)
      rows.write((f2 >> 24) & 0xff); rows.write((f2 >> 16) & 0xff)
      rows.write((f2 >> 8) & 0xff); rows.write(f2 & 0xff)
      rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
    }
    row(0, 0, 0xffff) // object 0: head of the free list
    (1 to nObjs).foreach { num =>
      if (num == xrefObj) row(1, xrefOff, 0)
      else if (inStm(num) >= 0) row(2, stmObj.get, inStm(num))
      else row(1, offsets(num), 0)
    }
    val rowBytes = rows.toByteArray
    val predicted =
      if (!predictor) rowBytes
      else {
        // PNG Up filter (tag 2) per row: filt(x) = raw(x) − up(x)
        val nr = rowBytes.length / cols
        val o = new java.io.ByteArrayOutputStream()
        var r = 0
        while (r < nr) {
          o.write(2)
          var c = 0
          while (c < cols) {
            val cur = rowBytes(r * cols + c) & 0xff
            val up = if (r > 0) rowBytes((r - 1) * cols + c) & 0xff else 0
            o.write((cur - up) & 0xff)
            c += 1
          }
          r += 1
        }
        o.toByteArray
      }
    val xdefl = zlibDeflate(predicted, 6)
    val parms =
      if (predictor) s" /DecodeParms << /Predictor 12 /Columns $cols >>"
      else ""
    w(s"$xrefObj 0 obj\n<< /Type /XRef /Size ${nObjs + 1} /W [1 4 2]" +
      s" /Root 1 0 R /Filter /FlateDecode$parms" +
      s" /Length ${xdefl.length} >>\nstream\n")
    out.write(xdefl)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Write a PDF 1.4 document whose text rides FORM XObjects: each
    * page's content draws `/Fm1` (classic xref — q251 owns the 1.5
    * layout). `/Fm1`'s OWN resources bind `/F9` = Courier (a name the
    * PAGE resources do not know — a reader resolving the form's fonts
    * from the page map fails loudly) and, when `form2` is set, `/Fm2`;
    * `/Fm2`'s resources bind `/F1` = the WinAnsi font (a name the
    * FORM-1 map does not know — nested resource scoping is
    * load-bearing in both directions). Encode side is corpus
    * machinery; the gated path is [[extractText]] (q252). */
  def encodeForms(pages: Seq[String], form1: String,
      form2: Option[String], level: Int = 6): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val f1Obj = 4 + 2 * n + 1
    val f2Obj = f1Obj + 1
    val nObjs = if (form2.isDefined) f2Obj else f1Obj
    val offsets = new Array[Int](nObjs + 1)
    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    def streamObj(num: Int, dictHead: String, content: String): Unit = {
      val bytes = zlibDeflate(content.getBytes(CP1252), level)
      offsets(num) = out.size()
      w(s"$num 0 obj\n$dictHead /Length ${bytes.length}" +
        " /Filter /FlateDecode >>\nstream\n")
      out.write(bytes)
      w("\nendstream\nendobj\n")
    }
    w("%PDF-1.4\n%")
    out.write(BINARY_MARK)
    w("\n")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    val kids = (0 until n).map(i => s"${5 + 2 * i} 0 R").mkString(" ")
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count $n >>\n"))
    obj(3)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>\n"))
    obj(4)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\n"))
    pages.zipWithIndex.foreach { case (content, i) =>
      obj(5 + 2 * i)(w(s"<< /Type /Page /Parent 2 0 R" +
        " /MediaBox [0 0 612 792]" +
        " /Resources << /Font << /F1 3 0 R /F2 4 0 R >>" +
        s" /XObject << /Fm1 $f1Obj 0 R >> >>" +
        s" /Contents ${6 + 2 * i} 0 R >>\n"))
      streamObj(6 + 2 * i, "<<", content)
    }
    val fm2Res =
      if (form2.isDefined) s" /XObject << /Fm2 $f2Obj 0 R >>" else ""
    streamObj(f1Obj, "<< /Type /XObject /Subtype /Form" +
      " /BBox [0 0 612 792]" +
      s" /Resources << /Font << /F9 4 0 R >>$fm2Res >>", form1)
    form2.foreach { f2 =>
      streamObj(f2Obj, "<< /Type /XObject /Subtype /Form" +
        " /BBox [0 0 612 60]" +
        " /Resources << /Font << /F1 3 0 R >> >>", f2)
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${nObjs + 1}\n")
    w("0000000000 65535 f \n")
    (1 to nObjs).foreach(i => w(s"${pad10(offsets(i))} 00000 n \n"))
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------- Type0/CID encoder

  /** The corpus CID law [[encodeType0]]'s CMap publishes and
    * [[type0Hex]] applies: printable ASCII rides ONE bfrange shifted
    * by 0xDF (CID 0x0100–0x015D → U+0021–U+007E — extraction must
    * walk the range arithmetic, not a table), and two bfchar singles
    * carry the non-ASCII proofs: CID 2 → é (one UTF-16 unit) and CID
    * 3 → 𝐀 U+1D400 (TWO units — the surrogate-pair path). */
  private[graft] val CID_ASCII_SHIFT = 0xdf
  private[graft] val CID_EACUTE = 2
  private[graft] val CID_MATH_A = 3

  /** Encode `s` as an Identity-H hex string under the corpus CID law;
    * code points outside the law reject (the corpus controls its
    * alphabet). */
  private[graft] def type0Hex(s: String): String = {
    val sb = new StringBuilder(s.length * 4 + 2)
    sb.append('<')
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cid =
        if (cp == 0xe9) CID_EACUTE
        else if (cp == 0x1d400) CID_MATH_A
        else if (cp >= 0x21 && cp <= 0x7e) cp + CID_ASCII_SHIFT
        else throw new IllegalArgumentException(
          f"code point U+$cp%04X outside the corpus CID law")
      sb.append(String.format(java.util.Locale.ROOT, "%04X",
        java.lang.Integer.valueOf(cid)))
      i += Character.charCount(cp)
    }
    sb.append('>')
    sb.toString
  }

  /** The ToUnicode CMap [[encodeType0]] embeds (the read side must
    * parse the block constructs, the bfrange increment, and both
    * bfchar shapes to undo [[type0Hex]]). */
  private[graft] def corpusCMap: String =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |/CMapName /Graft-Identity-UCS def
      |/CMapType 2 def
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0002> <00E9>
      |<0003> <D835DC00>
      |endbfchar
      |1 beginbfrange
      |<0100> <015D> <0021>
      |endbfrange
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end
      |end
      |""".stripMargin

  /** Write a PDF 1.4 document whose `/F1` is a `/Type0` font
    * (`/Encoding /Identity-H`, CIDFontType2 descendant, `/ToUnicode`
    * = [[corpusCMap]]) — the layout CJK text and subset-embedded
    * fonts ship. Page content strings must carry 2-byte CIDs (build
    * them with [[type0Hex]], or literal strings with the same bytes).
    * `rawCMap` stores the CMap unfiltered; otherwise FlateDecode.
    * Encode side is corpus machinery; the gated path is
    * [[extractText]] (q254). */
  def encodeType0(pages: Seq[String], level: Int = 6,
      rawCMap: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val nObjs = 5 + 2 * n
    val offsets = new Array[Int](nObjs + 1)
    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    def streamObj(num: Int, dictHead: String, bytes: Array[Byte],
        filtered: Boolean): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n$dictHead /Length ${bytes.length}" +
        (if (filtered) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      out.write(bytes)
      w("\nendstream\nendobj\n")
    }
    w("%PDF-1.4\n%")
    out.write(BINARY_MARK)
    w("\n")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    val kids = (0 until n).map(i => s"${6 + 2 * i} 0 R").mkString(" ")
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count $n >>\n"))
    obj(3)(w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftSynth" +
      " /Encoding /Identity-H /DescendantFonts [4 0 R]" +
      " /ToUnicode 5 0 R >>\n"))
    obj(4)(w("<< /Type /Font /Subtype /CIDFontType2" +
      " /BaseFont /GraftSynth /CIDSystemInfo" +
      " << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >>" +
      " /CIDToGIDMap /Identity >>\n"))
    val cmapRaw = corpusCMap.getBytes("US-ASCII")
    if (rawCMap) streamObj(5, "<<", cmapRaw, filtered = false)
    else streamObj(5, "<<", zlibDeflate(cmapRaw, 6), filtered = true)
    pages.zipWithIndex.foreach { case (content, i) =>
      obj(6 + 2 * i)(w(s"<< /Type /Page /Parent 2 0 R" +
        " /MediaBox [0 0 612 792]" +
        " /Resources << /Font << /F1 3 0 R >> >>" +
        s" /Contents ${7 + 2 * i} 0 R >>\n"))
      // content streams carry only ASCII operators + hex/escaped
      // strings; CP1252 passes the bytes through 1:1
      streamObj(7 + 2 * i, "<<",
        zlibDeflate(content.getBytes(CP1252), level), filtered = true)
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${nObjs + 1}\n")
    w("0000000000 65535 f \n")
    (1 to nObjs).foreach(i => w(s"${pad10(offsets(i))} 00000 n \n"))
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // --------------------------------------- incremental updates

  /** An object body an incremental update (re)writes: a plain
    * dictionary/value body, or a FlateDecode'd content stream. */
  private[graft] sealed trait UpdObj
  private[graft] final case class UpdDict(body: String) extends UpdObj
  private[graft] final case class UpdStream(content: String,
      level: Int = 6) extends UpdObj

  /** Append ONE incremental-save generation to `base` (any PDF this
    * module wrote — or a previous appendUpdate output; chains
    * compose): the updated/new object bodies, then a cross-reference
    * SECTION covering exactly those numbers (plus `freed` rows
    * masking deleted objects) with `/Prev` pointing at the base's
    * newest section — classic table by default, or a `/Type /XRef`
    * stream when `xrefStream` carries the stream's own object number
    * (the 1.5+ incremental layout; the stream indexes itself like
    * real writers do). Non-contiguous numbers emit MULTIPLE
    * subsections — the sparse layout incremental saves actually
    * produce, and the shape that exercises the reader's subsection
    * walk. `size` is the new `/Size` (max object number + 1 across
    * all generations). `prevOverride` exists for the chain-loop
    * rejection device. Corpus machinery; the gated path is
    * [[extractText]] (q255). */
  private[graft] def appendUpdate(base: Array[Byte], size: Int,
      objs: Seq[(Int, UpdObj)], freed: Seq[Int] = Nil,
      xrefStream: Option[Int] = None,
      prevOverride: Option[Int] = None): Array[Byte] = {
    val prev = prevOverride.getOrElse {
      val sxAt = lastIndexOf(base, "startxref")
      require(sxAt >= 0, "base has no startxref")
      val lx = new Lex(base, sxAt + "startxref".length)
      lx.ws()
      lx.parseNumber().toInt
    }
    val out = new java.io.ByteArrayOutputStream(base.length + 1024)
    out.write(base)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val written = objs.map { case (num, body) =>
      val off = out.size()
      body match {
        case UpdDict(b) => w(s"$num 0 obj\n$b\nendobj\n")
        case UpdStream(content, level) =>
          val bytes = zlibDeflate(content.getBytes(CP1252), level)
          w(s"$num 0 obj\n<< /Length ${bytes.length}" +
            " /Filter /FlateDecode >>\nstream\n")
          out.write(bytes)
          w("\nendstream\nendobj\n")
      }
      num -> off
    }.toMap
    require(written.keySet.intersect(freed.toSet).isEmpty,
      "an update cannot both write and free an object")
    val xrefOff = out.size()
    // rows this section decides, ascending; None = freed
    val rows: Seq[(Int, Option[Int])] =
      (written.map { case (n, o) => n -> Some(o) } ++
        freed.map(_ -> None) ++
        xrefStream.map(_ -> Some(xrefOff))).toSeq.sortBy(_._1)
    require(rows.nonEmpty, "an update must decide at least one object")
    require(rows.map(_._1).max < size, s"/Size $size too small")
    // consecutive-run subsections (the sparse incremental layout)
    val runs = rows.foldLeft(Vector.empty[Vector[(Int, Option[Int])]]) {
      case (acc, r) =>
        if (acc.nonEmpty && acc.last.last._1 + 1 == r._1)
          acc.init :+ (acc.last :+ r)
        else acc :+ Vector(r)
    }
    xrefStream match {
      case None =>
        w("xref\n")
        runs.foreach { run =>
          w(s"${run.head._1} ${run.length}\n")
          run.foreach {
            case (_, Some(off)) => w(s"${pad10(off)} 00000 n \n")
            case (_, None) => w("0000000000 65535 f \n")
          }
        }
        w(s"trailer\n<< /Size $size /Root 1 0 R /Prev $prev >>\n" +
          s"startxref\n$xrefOff\n%%EOF\n")
      case Some(xn) =>
        val body = new java.io.ByteArrayOutputStream()
        runs.foreach(_.foreach {
          case (_, Some(off)) =>
            body.write(1)
            body.write((off >> 24) & 0xff); body.write((off >> 16) & 0xff)
            body.write((off >> 8) & 0xff); body.write(off & 0xff)
            body.write(0); body.write(0)
          case (_, None) =>
            body.write(0)
            body.write(0); body.write(0); body.write(0); body.write(0)
            body.write(0xff); body.write(0xff)
        })
        val defl = zlibDeflate(body.toByteArray, 6)
        val index = runs.map(r => s"${r.head._1} ${r.length}")
          .mkString(" ")
        w(s"$xn 0 obj\n<< /Type /XRef /Size $size /W [1 4 2]" +
          s" /Index [$index] /Root 1 0 R /Prev $prev" +
          s" /Filter /FlateDecode /Length ${defl.length} >>\nstream\n")
        out.write(defl)
        w("\nendstream\nendobj\n")
        w(s"startxref\n$xrefOff\n%%EOF\n")
    }
    out.toByteArray
  }

  /** Assemble a classic-xref PDF from raw OBJECT BODIES — a
    * test/corpus device for graphs the real encoders refuse to
    * produce (rejection suites: recursive forms, hybrid-reference
    * trailers, malformed page trees). Object i+1 gets body `objs(i)`
    * verbatim, including any `stream … endstream` section (the caller
    * computes `/Length`); the xref table and trailer are computed.
    * `extraTrailer` splices additional trailer keys (e.g. `/XRefStm 9`
    * for the hybrid-reference rejection). */
  private[graft] def assemble(objs: Seq[String], root: Int = 1,
      extraTrailer: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes(CP1252))
    w("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.size()
      w(s"${i + 1} 0 obj\n$body\nendobj\n")
      off
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(s"${pad10(o)} 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root $root 0 R" +
      s"$extraTrailer >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
