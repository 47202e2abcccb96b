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
    // /Prev (incremental update) and /Encrypt reject
    for (extra <- Seq("/Prev 99", "/Encrypt 9 0 R")) {
      val t = s.replace("/Root 1 0 R", s"/Root 1 0 R $extra")
      val err = intercept[IllegalArgumentException] {
        PdfCodec.extractText(t.getBytes("ISO-8859-1"))
      }
      assert(err.getMessage.contains("unsupported"), err.getMessage)
    }
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

  test("1.5+ rejection family: /Prev, hybrid /XRefStm, bad /W, bad " +
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
    rejects(patched("/Type /XRef", "/Type /XRef /Prev 99"), "/Prev")
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
}
