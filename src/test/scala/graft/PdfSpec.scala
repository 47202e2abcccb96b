package graft

import graft.engine.Crawl
import graft.sources.{PdfCodec, WarcCodec}

/** The PDF subset ([[PdfCodec]]): document structure (classic xref
  * tables AND 1.5+ xref/object streams, trailer, object graph, page
  * tree), stream decode (zlib FlateDecode over the hand-rolled
  * inflate, indirect /Length, PNG row predictors), the text-operator
  * machine's extraction law (separator family, TJ kern threshold,
  * string escapes, hex strings, WinAnsi, Form XObjects with their
  * scoped resources), and the loud rejects no generative corpus
  * reaches (/Prev, hybrid /XRefStm, /Encrypt, foreign filters, Type0
  * fonts, image XObjects, recursive forms). The QUERY gates are
  * q236/q251/q252 (DuckDB regenerates the extracted text
  * arithmetically); this spec pins the mechanisms. */
class PdfSpec extends SparkSpecBase {

  private def pdf(content: String, level: Int = 6,
      indirect: Boolean = false): Array[Byte] =
    PdfCodec.encode(Seq(content), level, indirect)

  private def text(bytes: Array[Byte]): String =
    PdfCodec.extractText(bytes).text

  test("round trip: every compression level, direct and indirect " +
      "/Length, multi-page") {
    for (level <- 0 to 9; indirect <- Seq(false, true)) {
      val c1 = "BT /F1 12 Tf 72 720 Td (alpha) Tj T* (beta) Tj ET"
      val c2 = "BT /F1 12 Tf 72 720 Td (gamma) Tj ET"
      val d = PdfCodec.extractText(
        PdfCodec.encode(Seq(c1, c2), level, indirect))
      assert(d.nPages == 2, s"level=$level indirect=$indirect")
      assert(d.text == "alpha beta gamma",
        s"level=$level indirect=$indirect")
    }
  }

  test("extraction law: separators, kern threshold, concatenation") {
    // shows with NO positioning op between them CONCATENATE
    assert(text(pdf("BT /F1 9 Tf (ab) Tj (cd) Tj ET")) == "abcd")
    // each positioning op separates
    assert(text(pdf("BT /F1 9 Tf (a) Tj 0 -14 Td (b) Tj " +
      "1 0 0 1 72 700 Tm (c) Tj T* (d) Tj ET")) == "a b c d")
    // ' and " advance the line before showing
    assert(text(pdf("BT /F1 9 Tf (a) Tj (b) ' 0 0 (c) \" ET")) == "a b c")
    // TJ: kern at/below −180 is a word break, above it is kerning only
    assert(text(pdf("BT /F1 9 Tf [ (a) -250 (b) -179 (c) -180 (d) ] TJ ET"))
      == "a bc d")
    // a second BT block separates
    assert(text(pdf("BT /F1 9 Tf (a) Tj ET BT /F1 9 Tf (b) Tj ET"))
      == "a b")
    // graphics/state ops are inert and clear operands
    assert(text(pdf("q 0.5 0 0 0.5 10 20 cm BT /F1 9 Tf 2 Tr 14 TL " +
      "(x) Tj ET Q")) == "x")
  }

  test("string decode: escapes, octal, hex strings, WinAnsi bytes") {
    assert(text(pdf("""BT /F1 9 Tf (p\(3\) q\\r) Tj ET""")) == "p(3) q\\r")
    assert(text(pdf("BT /F1 9 Tf (\\101\\102\\60) Tj ET")) == "AB0")
    // hex string, whitespace inside, mixed case, odd digit count pads 0
    assert(text(pdf("BT /F1 9 Tf <68 65 6C 6c 6> Tj ET")) == "hell`")
    // é (0xE9) under /F1 WinAnsiEncoding decodes to U+00E9
    assert(text(pdf("BT /F1 9 Tf (café) Tj ET")) == "café")
    // nested balanced parens need no escapes
    assert(text(pdf("BT /F1 9 Tf (a(b)c) Tj ET")) == "a(b)c")
    // F2 has no /Encoding: ASCII passes, a high byte rejects
    assert(text(pdf("BT /F2 9 Tf (plain) Tj ET")) == "plain")
    intercept[IllegalArgumentException] {
      text(pdf("BT /F2 9 Tf (café) Tj ET"))
    }
    // cp1252's undefined slot 0x81 rejects even under WinAnsi
    intercept[IllegalArgumentException] {
      text(pdf("BT /F1 9 Tf (\\201) Tj ET"))
    }
  }

  test("rejects: structure corruption is loud, never wrong text") {
    val good = pdf("BT /F1 9 Tf (ok) Tj ET")
    // missing header
    intercept[IllegalArgumentException] {
      PdfCodec.extractText("XPDF-1.4\n".getBytes("US-ASCII") ++ good.drop(9))
    }
    // startxref pointing nowhere useful
    val s = new String(good, "ISO-8859-1")
    val bad = s.replaceAll("startxref\n\\d+", "startxref\n17")
    intercept[IllegalArgumentException] {
      PdfCodec.extractText(bad.getBytes("ISO-8859-1"))
    }
    // startxref at a NON-stream object: the 1.5+ bootstrap engages
    // (it is `N G obj` there) but must reject loudly — object 1 is the
    // catalog, which carries no stream
    val obj1At = s.indexOf("1 0 obj")
    val xs = s.replaceAll("startxref\n\\d+", s"startxref\n$obj1At")
    val e = intercept[IllegalArgumentException] {
      PdfCodec.extractText(xs.getBytes("ISO-8859-1"))
    }
    assert(e.getMessage.contains("carries no stream"), e.getMessage)
    // /Encrypt rejects; /Prev is now WALKED (r15) — a garbage offset
    // fails loudly at the chain step, never silently ignored
    val enc = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
    val encErr = intercept[IllegalArgumentException] {
      PdfCodec.extractText(enc.getBytes("ISO-8859-1"))
    }
    assert(encErr.getMessage.contains("unsupported"), encErr.getMessage)
    val prevGarbage = s.replace("/Root 1 0 R", "/Root 1 0 R /Prev 99")
    val prevErr = intercept[IllegalArgumentException] {
      PdfCodec.extractText(prevGarbage.getBytes("ISO-8859-1"))
    }
    assert(prevErr.getMessage.contains("no xref table or xref stream"),
      prevErr.getMessage)
    // truncated stream (endstream gone)
    intercept[IllegalArgumentException] {
      PdfCodec.extractText(good.take(
        new String(good, "ISO-8859-1").indexOf("endstream") - 2)
        ++ good.takeRight(200))
    }
    // corrupted zlib byte inside the content stream
    val streamAt = s.indexOf("stream\n") + "stream\n".length
    val z = good.clone()
    z(streamAt + 4) = (z(streamAt + 4) ^ 0x5a).toByte
    intercept[Exception] { PdfCodec.extractText(z) }
  }

  test("rejects: foreign filters, DecodeParms, Type0 fonts, XObjects, " +
      "unknown fonts, show before Tf") {
    val s = new String(pdf("BT /F1 9 Tf (ok) Tj ET"), "ISO-8859-1")
    // dict edits below shift bytes AFTER every object header (the edits
    // land inside the last object), so only the startxref value needs
    // re-pointing at the moved xref keyword
    def rebuilt(edited: String): Array[Byte] = {
      val at = edited.lastIndexOf("\nxref\n") + 1
      edited.replaceAll("startxref\n\\d+", s"startxref\n$at")
        .getBytes("ISO-8859-1")
    }
    val lzw = rebuilt(s.replace("/Filter /FlateDecode",
      "/Filter /LZWDecode"))
    assert(intercept[IllegalArgumentException] {
      PdfCodec.extractText(lzw)
    }.getMessage.contains("filter"))
    // the TIFF predictor is outside the /DecodeParms subset (only the
    // PNG family 10–15 decodes); so is a predictor without /Columns
    val parms = rebuilt(s.replace("/Filter /FlateDecode",
      "/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns 3 >>"))
    assert(intercept[IllegalArgumentException] {
      PdfCodec.extractText(parms)
    }.getMessage.contains("predictor 2"))
    val noCols = rebuilt(s.replace("/Filter /FlateDecode",
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 >>"))
    assert(intercept[IllegalArgumentException] {
      PdfCodec.extractText(noCols)
    }.getMessage.contains("/Columns"))
    val t0 = rebuilt(s.replace("/Subtype /Type1 /BaseFont /Helvetica",
      "/Subtype /Type0 /BaseFont /Helvetica"))
    assert(intercept[IllegalArgumentException] {
      PdfCodec.extractText(t0)
    }.getMessage.contains("Type0"))
    intercept[IllegalArgumentException] {
      text(pdf("BT /F9 9 Tf (x) Tj ET")) // unknown font name
    }
    intercept[IllegalArgumentException] {
      text(pdf("BT (x) Tj ET")) // show before any Tf
    }
    assert(intercept[IllegalArgumentException] {
      text(pdf("/Im1 Do BT /F1 9 Tf (x) Tj ET"))
    }.getMessage.contains("XObject"))
  }

  test("q236 corpus: synthPdf extracts to the token formula; the WARC " +
      "dispatch chooses the arm by Content-Type") {
    for ((id, nc) <- Seq((1L, 0L), (2L, 17L), (4L, 40L), (5L, 23L),
        (7L, 9L), (10L, 31L), (35L, 12L))) {
      val nt = (nc % 33 + 6).toInt
      val expected = (0 until nt).map { i =>
        val k = (id + i) % 10
        if (i % 9 == 2) s"p($k)"
        else if (i % 9 == 5) s"A$k"
        else if (i % 9 == 7) s"hx$k"
        else if (i % 7 == 4) s"é$k"
        else s"t${(id * 67 + i * 31) % 9973}"
      }.mkString(" ")
      val d = PdfCodec.extractText(Crawl.synthPdf(id, nt))
      assert(d.nPages == (if (id % 2 == 0) 2 else 1), s"id=$id pages")
      assert(d.text == expected, s"id=$id")
      // and through the full archive + dispatch
      val recs = WarcCodec.gunzipMembers(Crawl.synthPdfWarcGz(id, nc))
        .flatMap(WarcCodec.parseRecords)
      val http = WarcCodec.parseHttpResponse(recs.head.block)
      val (fmt, nPages, text) = Crawl.extractResponse(
        http.header("Content-Type").get, http.body)
      if (id % 3 == 0) {
        assert(fmt == "html" && nPages == 1L)
        assert(text.startsWith(s"Web $id "))
      } else {
        assert(fmt == "pdf" && text == expected, s"id=$id dispatch")
      }
    }
    // the dispatch rejects types it has no extractor for
    intercept[IllegalArgumentException] {
      Crawl.extractResponse("application/octet-stream", Array[Byte](1))
    }
  }

  // ------------------------------------------- PDF 1.5+ layout (r15)

  test("encode15 round trips through all four machinery arms; the " +
      "arms are actually on the wire") {
    val c1 = "BT /F1 12 Tf 72 720 Td (alpha) Tj T* (beta é) Tj ET"
    val c2 = "BT /F2 10 Tf 72 720 Td (gamma) Tj ET"
    for (objStm <- Seq(false, true); predictor <- Seq(false, true);
        level <- Seq(0, 6, 9)) {
      val wire = PdfCodec.encode15(Seq(c1, c2), level, objStm, predictor)
      val s = new String(wire, "ISO-8859-1")
      assert(s.contains("/Type /XRef"))
      assert(s.contains("/ObjStm") == objStm, s"objStm=$objStm")
      assert(s.contains("/Predictor 12") == predictor,
        s"predictor=$predictor")
      val d = PdfCodec.extractText(wire)
      assert(d.nPages == 2 &&
        d.text == "alpha beta é gamma",
        s"objStm=$objStm predictor=$predictor level=$level: ${d.text}")
    }
  }

  test("1.5+ rejection family: garbage /Prev, hybrid /XRefStm, bad /W, bad " +
      "predictor parms, non-XRef stream at startxref") {
    val wire = PdfCodec.encode15(Seq("BT /F1 9 Tf (ok) Tj ET"),
      objStm = true, predictor = true)
    val s = new String(wire, "ISO-8859-1")
    // edits land INSIDE the xref stream's dict, which sits at the
    // startxref offset — nothing before it moves, so no re-pointing
    def patched(from: String, to: String): Array[Byte] = {
      assert(s.contains(from), s"wire lacks '$from'")
      s.replace(from, to).getBytes("ISO-8859-1")
    }
    def rejects(bad: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](
        PdfCodec.extractText(bad))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    // /Prev is walked since r15: a mid-file garbage offset is loud
    rejects(patched("/Type /XRef", "/Type /XRef /Prev 99"),
      "no xref table or xref stream")
    rejects(patched("/W [1 4 2]", "/W [1 4 2 1]"), "3-array")
    rejects(patched("/Predictor 12", "/Predictor 12 /Colors 2"),
      "Colors 1")
    rejects(patched("/Predictor 12 /Columns 7",
      "/Predictor 2 /Columns 7"), "predictor 2")
    rejects(patched("/Type /XRef", "/Type /XXX"), "not /Type /XRef")
    // a classic trailer carrying /XRefStm is a HYBRID-reference file
    val hybrid = PdfCodec.assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [] /Count 0 >>"),
      extraTrailer = " /XRefStm 9")
    rejects(hybrid, "hybrid-reference")
  }

  test("q251 corpus: synthPdf15 extracts to the token formula " +
      "through every docId%4 layout arm") {
    for ((id, nc) <- Seq((0L, 7L), (1L, 18L), (2L, 29L), (3L, 40L),
        (6L, 11L), (13L, 23L))) {
      val nt = (nc % 29 + 5).toInt
      val expected = (0 until nt).map { i =>
        if (i % 5 == 3) s"é${(id + i) % 10}"
        else s"z${(id * 73 + i * 37) % 9973}"
      }.mkString(" ")
      val d = PdfCodec.extractText(Crawl.synthPdf15(id, nt))
      assert(d.nPages == (if (id % 2 == 0) 2 else 1), s"id=$id pages")
      assert(d.text == expected, s"id=$id")
    }
  }

  // ------------------------------------------- Form XObjects (r15)

  test("forms: body/form/nested order, boundary separators, resource " +
      "scoping, Do's state restore") {
    // body (WinAnsi, é after the Do WITHOUT a new Tf), form under its
    // OWN /F9, nested form under ITS /F1 — all three resource scopes
    val page = "BT /F1 12 Tf 72 720 Td (body1) Tj ET /Fm1 Do " +
      "BT 0 -14 Td (café) Tj ET"
    val form1 = "BT /F9 9 Tf 30 760 Td (hdr1) Tj 0 -10 Td (hdr2) Tj ET " +
      "/Fm2 Do"
    val form2 = "BT /F1 8 Tf 30 20 Td (ftré) Tj ET"
    val d = PdfCodec.extractText(
      PdfCodec.encodeForms(Seq(page), form1, Some(form2), level = 6))
    assert(d.nPages == 1)
    assert(d.text == "body1 hdr1 hdr2 ftré café", d.text)
    // without the nested form
    val d2 = PdfCodec.extractText(
      PdfCodec.encodeForms(Seq(page), form1.stripSuffix(" /Fm2 Do"),
        None, level = 0))
    assert(d2.text == "body1 hdr1 hdr2 café", d2.text)
    // scoping is load-bearing in BOTH directions: the page knows no
    // /F9, the form knows no /F1 — a Tf against the wrong map rejects
    intercept[IllegalArgumentException] {
      PdfCodec.extractText(PdfCodec.encodeForms(
        Seq("BT /F9 9 Tf (x) Tj ET /Fm1 Do"), "BT /F9 9 Tf (h) Tj ET",
        None))
    }
    intercept[IllegalArgumentException] {
      PdfCodec.extractText(PdfCodec.encodeForms(
        Seq("BT /F1 9 Tf (x) Tj ET /Fm1 Do"), "BT /F1 9 Tf (h) Tj ET",
        None))
    }
  }

  test("forms rejection family: recursive form, image XObject, " +
      "unknown XObject name") {
    // a form whose own resources point back at itself must reject,
    // never loop — built through the raw assembler (the real encoder
    // refuses to produce this graph)
    def stream(dict: String, data: String) =
      s"$dict\nstream\n$data\nendstream"
    val recursive = PdfCodec.assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
        " /Resources << /Font << /F1 5 0 R >>" +
        " /XObject << /Fm1 4 0 R >> >> /Contents 6 0 R >>",
      stream("<< /Type /XObject /Subtype /Form /BBox [0 0 10 10]" +
        " /Resources << /XObject << /Fm1 4 0 R >> >> /Length 8 >>",
        "/Fm1 Do"),
      "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
      stream("<< /Length 8 >>", "/Fm1 Do")))
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(recursive))
    assert(e.getMessage.contains("recursive form"), e.getMessage)
    // an image XObject draw rejects by subtype
    val image = PdfCodec.assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
        " /Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
      stream("<< /Type /XObject /Subtype /Image /Width 1 /Height 1" +
        " /Length 1 >>", "x"),
      stream("<< /Length 7 >>", "/Im1 Do")))
    val e2 = intercept[IllegalArgumentException](
      PdfCodec.extractText(image))
    assert(e2.getMessage.contains("image XObjects"), e2.getMessage)
  }

  test("q252 corpus: synthPdfForms extracts to the token order " +
      "formula (body, header, nested, body)") {
    for ((id, nc) <- Seq((1L, 9L), (2L, 21L), (4L, 13L), (7L, 30L),
        (10L, 5L))) {
      val nt = (nc % 27 + 4).toInt
      val nb = nt / 2
      def pageTok(i: Int) =
        if (i % 4 == 1) s"é${(id + i) % 10}"
        else s"b${(id * 59 + i * 13) % 9973}"
      val expected = ((0 until nb).map(pageTok) ++
        (0 until 3).map(i => s"f${(id * 61 + i * 17) % 9973}") ++
        (if (id % 3 == 1) Seq(s"w${(id * 3) % 10}é") else Nil) ++
        (nb until nt).map(pageTok)).mkString(" ")
      val d = PdfCodec.extractText(Crawl.synthPdfForms(id, nt))
      assert(d.nPages == 1 && d.text == expected, s"id=$id: ${d.text}")
    }
  }

  // ------------------------------------------ Type0/CID (q254)

  test("Type0: Identity-H CIDs decode through the ToUnicode CMap " +
      "(bfrange shift, bfchar singles, surrogate pair, all three " +
      "string mechanisms)") {
    for (raw <- Seq(false, true)) {
      val hexShow = PdfCodec.type0Hex("Hi!") + " Tj"
      val tjShow = s"[${PdfCodec.type0Hex("zap")} -300 " +
        s"${PdfCodec.type0Hex("q9")}] TJ"
      // é (bfchar CID 2) and 𝐀 (bfchar CID 3 → TWO UTF-16 units) as
      // an octal-escaped LITERAL string: bytes 00 02 00 03
      val litShow = "(\\000\\002\\000\\003) Tj"
      val content = s"BT /F1 11 Tf 72 720 Td $hexShow 0 -14 Td " +
        s"$tjShow 0 -14 Td $litShow ET"
      val d = PdfCodec.extractText(
        PdfCodec.encodeType0(Seq(content), rawCMap = raw))
      assert(d.text == "Hi! zap q9 é𝐀", s"raw=$raw: ${d.text}")
    }
  }

  test("Type0 rejects: odd CID string, unmapped CID, Identity-V, " +
      "missing ToUnicode, bfrange array destination, usecmap") {
    def cidPdf(cmap: String, fontExtra: String = "",
        content: String = s"BT /F1 9 Tf ${PdfCodec.type0Hex("A")} Tj ET")
        : Array[Byte] = {
      def stream(dict: String, data: String) =
        s"$dict /Length ${data.length} >>\nstream\n$data\nendstream"
      PdfCodec.assemble(Seq(
        "<< /Type /Catalog /Pages 2 0 R >>",
        "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          " /Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>",
        "<< /Type /Font /Subtype /Type0 /BaseFont /S" +
          s" /Encoding /Identity-H /DescendantFonts [5 0 R]$fontExtra" +
          " /ToUnicode 7 0 R >>",
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /S >>",
        stream("<<", content),
        stream("<<", cmap)))
    }
    val goodCMap = PdfCodec.corpusCMap
    // the assemble-built good shape extracts (the devices below each
    // differ from it by exactly one defect)
    assert(PdfCodec.extractText(cidPdf(goodCMap)).text == "A")
    // odd-length CID string
    val odd = intercept[IllegalArgumentException](PdfCodec.extractText(
      cidPdf(goodCMap, content = "BT /F1 9 Tf <0100A1> Tj ET")))
    assert(odd.getMessage.contains("odd length"), odd.getMessage)
    // unmapped CID (0x9999 is in no bfchar/bfrange)
    val unmapped = intercept[IllegalArgumentException](
      PdfCodec.extractText(
        cidPdf(goodCMap, content = "BT /F1 9 Tf <9999> Tj ET")))
    assert(unmapped.getMessage.contains("no ToUnicode mapping"),
      unmapped.getMessage)
    // Identity-V rejects (vertical writing is outside the subset)
    val vert = intercept[IllegalArgumentException] {
      val b = cidPdf(goodCMap)
      val s = new String(b, "ISO-8859-1").replace(
        "/Identity-H", "/Identity-V")
      PdfCodec.extractText(s.getBytes("ISO-8859-1"))
    }
    assert(vert.getMessage.contains("Identity-H"), vert.getMessage)
    // bfrange with an ARRAY destination
    val arrCMap = goodCMap.replace("<0100> <015D> <0021>",
      "<0100> <0101> [<0041> <0042>]")
    val arr = intercept[IllegalArgumentException](
      PdfCodec.extractText(cidPdf(arrCMap)))
    assert(arr.getMessage.contains("array destinations"), arr.getMessage)
    // usecmap imports
    val useCMap = goodCMap.replace("endcmap",
      "/Adobe-Identity-UCS usecmap\nendcmap")
    val use = intercept[IllegalArgumentException](
      PdfCodec.extractText(cidPdf(useCMap)))
    assert(use.getMessage.contains("usecmap"), use.getMessage)
    // a Type0 font WITHOUT /ToUnicode must reject, not emit glyph ids
    def noTuPdf: Array[Byte] = {
      def stream(dict: String, data: String) =
        s"$dict /Length ${data.length} >>\nstream\n$data\nendstream"
      PdfCodec.assemble(Seq(
        "<< /Type /Catalog /Pages 2 0 R >>",
        "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          " /Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>",
        "<< /Type /Font /Subtype /Type0 /BaseFont /S" +
          " /Encoding /Identity-H /DescendantFonts [5 0 R] >>",
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /S >>",
        stream("<<", s"BT /F1 9 Tf ${PdfCodec.type0Hex("A")} Tj ET")))
    }
    val noTu = intercept[IllegalArgumentException](
      PdfCodec.extractText(noTuPdf))
    assert(noTu.getMessage.contains("ToUnicode"), noTu.getMessage)
  }

  test("q254 corpus: synthPdfType0 extracts to the token formula") {
    for ((id, nc) <- Seq((0L, 9L), (1L, 21L), (3L, 13L), (6L, 30L),
        (9L, 5L))) {
      val nt = (nc % 25 + 4).toInt
      def tok(i: Int) =
        if (i % 7 == 2) s"é${(id + i) % 10}"
        else if (i % 7 == 5) "𝐀" + ((id + i) % 10)
        else s"k${(id * 79 + i * 41) % 9973}"
      val expected = (0 until nt).map(tok).mkString(" ")
      val d = PdfCodec.extractText(Crawl.synthPdfType0(id, nt))
      assert(d.nPages == (if (id % 2 == 0) 2 else 1), s"id=$id")
      assert(d.text == expected, s"id=$id: ${d.text}")
    }
  }

  // ------------------------------------- incremental updates (q255)

  test("incremental: replace, append, two-generation chains, " +
      "xref-stream updates over ObjStm bases") {
    val base = pdf("BT /F1 9 Tf (old) Tj ET")
    // one classic update replaces the content: newest wins
    val g1 = PdfCodec.appendUpdate(base, 7,
      Seq(6 -> PdfCodec.UpdStream("BT /F1 9 Tf (new) Tj ET")))
    assert(text(g1) == "new")
    // a second generation re-replaces: chain of three sections
    val g2 = PdfCodec.appendUpdate(g1, 7,
      Seq(6 -> PdfCodec.UpdStream("BT /F1 9 Tf (newest) Tj ET")))
    assert(text(g2) == "newest")
    // appending a page rewrites the tree and lands non-contiguous
    // subsections (2; 7–8)
    val added = PdfCodec.appendUpdate(base, 9, Seq(
      2 -> PdfCodec.UpdDict(
        "<< /Type /Pages /Kids [5 0 R 7 0 R] /Count 2 >>"),
      7 -> PdfCodec.UpdDict("<< /Type /Page /Parent 2 0 R" +
        " /MediaBox [0 0 612 792]" +
        " /Resources << /Font << /F1 3 0 R >> >> /Contents 8 0 R >>"),
      8 -> PdfCodec.UpdStream("BT /F1 9 Tf (p2) Tj ET")))
    val dAdded = PdfCodec.extractText(added)
    assert(dAdded.nPages == 2 && dAdded.text == "old p2")
    // xref-STREAM update over a 1.5 ObjStm base: a type-1 row shadows
    // the ObjStm page dict, the old content object is freed
    val base15 = PdfCodec.encode15(Seq("BT /F1 9 Tf (old15) Tj ET"),
      objStm = true, predictor = true)
    val g15 = PdfCodec.appendUpdate(base15, 11, Seq(
      5 -> PdfCodec.UpdDict("<< /Type /Page /Parent 2 0 R" +
        " /MediaBox [0 0 612 792]" +
        " /Resources << /Font << /F1 3 0 R >> >> /Contents 9 0 R >>"),
      9 -> PdfCodec.UpdStream("BT /F1 9 Tf (new15) Tj ET")),
      freed = Seq(6), xrefStream = Some(10))
    assert(text(g15) == "new15")
  }

  test("incremental rejects and masking: freed reads as null, /Prev " +
      "loops and hybrid chains are loud") {
    val base = pdf("BT /F1 9 Tf (old) Tj ET")
    // an update that FREES the live content object: the page's
    // /Contents reference now reads null → loud, not stale rev-0 text
    val freedLive = PdfCodec.appendUpdate(base, 7,
      Seq(5 -> PdfCodec.UpdDict("<< /Type /Page /Parent 2 0 R" +
        " /MediaBox [0 0 612 792]" +
        " /Resources << /Font << /F1 3 0 R >> >> /Contents 6 0 R >>")),
      freed = Seq(6))
    val e = intercept[IllegalArgumentException](text(freedLive))
    assert(e.getMessage.contains("/Contents"), e.getMessage)
    // /Prev pointing at the update's own section: loop, loud
    val loopAt = base.length
    val loop = PdfCodec.appendUpdate(base, 7,
      Seq(6 -> PdfCodec.UpdStream("BT /F1 9 Tf (x) Tj ET")),
      prevOverride = Some(-1))
    // find the update's xref offset (after the base bytes) and point
    // /Prev at it — parse startxref from the tail
    val tail = new String(loop, loopAt, loop.length - loopAt,
      "ISO-8859-1")
    val xOff = tail.substring(tail.lastIndexOf("startxref") + 9)
      .trim.takeWhile(_.isDigit).toInt
    val looped = new String(loop, "ISO-8859-1")
      .replace("/Prev -1", s"/Prev $xOff")
    val e2 = intercept[IllegalArgumentException](
      PdfCodec.extractText(looped.getBytes("ISO-8859-1")))
    assert(e2.getMessage.contains("loop"), e2.getMessage)
    // hybrid /XRefStm still rejects even mid-chain
    val hybrid = new String(PdfCodec.appendUpdate(base, 7,
      Seq(6 -> PdfCodec.UpdStream("BT /F1 9 Tf (x) Tj ET"))),
      "ISO-8859-1").replace("/Prev", "/XRefStm 9 /Prev")
    val e3 = intercept[IllegalArgumentException](
      PdfCodec.extractText(hybrid.getBytes("ISO-8859-1")))
    assert(e3.getMessage.contains("XRefStm"), e3.getMessage)
  }

  test("q255 corpus: synthPdfIncr extracts to the final-generation " +
      "formula on every arm") {
    for ((id, nc) <- Seq((0L, 9L), (1L, 21L), (2L, 13L), (3L, 30L),
        (4L, 5L), (7L, 17L))) {
      val nt = (nc % 23 + 4).toInt
      def tok(rev: Int, i: Int) =
        if (i % 5 == 3) s"é${(id + rev + i) % 10}"
        else s"u${(id * 83 + rev * 101 + i * 43) % 9973}"
      def toks(rev: Int) = (0 until nt).map(tok(rev, _)).mkString(" ")
      val expected = (id % 4) match {
        case 0 => toks(1)
        case 1 => toks(0) + " " + toks(1)
        case 2 => toks(2)
        case _ => toks(1)
      }
      val d = PdfCodec.extractText(Crawl.synthPdfIncr(id, nt))
      assert(d.nPages == (if (id % 4 == 1) 2 else 1), s"id=$id")
      assert(d.text == expected, s"id=$id: ${d.text}")
    }
  }
}
