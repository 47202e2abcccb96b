package graft

import graft.engine.Crawl
import graft.sources.{PdfCodec, WarcCodec}

/** The PDF subset ([[PdfCodec]]): document structure (xref, trailer,
  * object graph, page tree), stream decode (zlib FlateDecode over the
  * hand-rolled inflate, indirect /Length), the text-operator machine's
  * extraction law (separator family, TJ kern threshold, string escapes,
  * hex strings, WinAnsi), and the loud rejects no generative corpus
  * reaches (xref streams, /Prev, /Encrypt, foreign filters, Type0
  * fonts, XObjects). The QUERY gate is q236 (DuckDB regenerates the
  * extracted text arithmetically); this spec pins the mechanisms. */
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
    // a (synthetic) xref STREAM at the offset rejects with its own
    // message: point startxref at object 1's header
    val obj1At = s.indexOf("1 0 obj")
    val xs = s.replaceAll("startxref\n\\d+", s"startxref\n$obj1At")
    val e = intercept[IllegalArgumentException] {
      PdfCodec.extractText(xs.getBytes("ISO-8859-1"))
    }
    assert(e.getMessage.contains("cross-reference streams"))
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
    val parms = rebuilt(s.replace("/Filter /FlateDecode",
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 >>"))
    assert(intercept[IllegalArgumentException] {
      PdfCodec.extractText(parms)
    }.getMessage.contains("DecodeParms"))
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
}
