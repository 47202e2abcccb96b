package graft

import graft.engine.Crawl
import graft.sources.ZipCodec

/** ZIP codec: write→list→extract round trips over stored and DEFLATE
  * members, EOCD comment scan-back, the loud-rejection family over
  * hand-corrupted wires, and the selective-decode law (a probe never
  * touches a non-matched member's data span). */
class ZipSpec extends SparkSpecBase {

  private def m(name: String, data: String, stored: Boolean = false,
      level: Int = 6) =
    ZipCodec.ZipMember(name, data.getBytes("US-ASCII"), stored, level)

  test("round trip: stored + deflate members, all levels, EOCD comment") {
    val members = Seq(
      m("a/stored.txt", "plain stored payload", stored = true),
      m("a/tiny.txt", "x"),
      m("a/rep.txt", "ab" * 4000, level = 9),
      m("a/mixed.txt", (0 until 500).map(i => (i * 37 % 251).toChar).mkString,
        level = 1))
    val wire = ZipCodec.write(members, comment = "shard comment here")
    val cd = ZipCodec.centralDirectory(wire)
    assert(cd.map(_.name) == members.map(_.name).toVector)
    assert(cd(0).method == 0 && cd(1).method == 8)
    members.zip(cd).foreach { case (mm, e) =>
      assert(e.usize == mm.data.length)
      assert(ZipCodec.extract(wire, e).toSeq == mm.data.toSeq)
    }
    // deflate actually compressed the repetitive member
    assert(cd(2).csize < cd(2).usize / 10)
  }

  test("rejection family: EOCD, ZIP64 markers, methods, flags, CRC") {
    val wire = ZipCodec.write(Seq(m("d.txt", "data data data")))
    def rejects(bad: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        val cd = ZipCodec.centralDirectory(bad)
        cd.foreach(ZipCodec.extract(bad, _))
      }
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects(wire.dropRight(1), "no end-of-central-directory")
    // comment length lies
    rejects(wire ++ Array[Byte](1, 2, 3), "no end-of-central-directory")
    val eocd = wire.length - 22
    rejects({ val w = wire.clone(); w(eocd + 4) = 1; w }, "multi-disk")
    rejects({ val w = wire.clone()
      java.util.Arrays.fill(w, eocd + 16, eocd + 20, 0xff.toByte); w },
      "ZIP64")
    // central entry: set method to 12 (bzip2)
    val cdOff = {
      val b = wire; (b(eocd + 16) & 0xff) | ((b(eocd + 17) & 0xff) << 8) |
        ((b(eocd + 18) & 0xff) << 16) | ((b(eocd + 19) & 0xff) << 24)
    }
    rejects({ val w = wire.clone(); w(cdOff + 10) = 12; w }, "method")
    rejects({ val w = wire.clone(); w(cdOff + 8) = 1; w }, "encrypted")
    rejects({ val w = wire.clone(); w(cdOff + 8) = 8; w }, "data descriptor")
    // corrupt one compressed byte: CRC (or the inflate itself) must fail
    val e2 = intercept[Exception] {
      val w = wire.clone(); w(40) = (w(40) ^ 0x7f).toByte
      val cd = ZipCodec.centralDirectory(w)
      cd.foreach(ZipCodec.extract(w, _))
    }
    assert(e2.getMessage != null)
  }

  test("selective decode: a corrupt non-seed member cannot fail a probe") {
    // two members; corrupt the FIRST member's data span, extract only
    // the second — the probe must succeed (its span is untouched)
    val wire = ZipCodec.write(Seq(
      m("docs/1.txt", "first member payload"),
      m("docs/2.txt", "second member payload")))
    val cd = ZipCodec.centralDirectory(wire)
    val w = wire.clone()
    // flip a byte inside member 1's data (after its 30+name local header)
    val dataOff = cd(0).offset + 30 + "docs/1.txt".length
    w(dataOff) = (w(dataOff) ^ 0x55).toByte
    // probing member 2 succeeds; probing member 1 fails loudly
    assert(new String(ZipCodec.extract(w, cd(1)), "US-ASCII") ==
      "second member payload")
    intercept[Exception](ZipCodec.extract(w, cd(0)))
  }

  test("compressed-span law: a lying (oversized) central csize rejects") {
    // Two members so the inflated span of member 1, extended past its
    // true csize, runs into member 2's local header — the DEFLATE
    // stream ends before the declared span's end, which must reject
    // (span validity on the COMPRESSED side, not just CRC on output).
    val wire = ZipCodec.write(Seq(
      m("docs/1.txt", "payload one payload one payload one"),
      m("docs/2.txt", "payload two")))
    val cd = ZipCodec.centralDirectory(wire)
    val lying = cd(0).copy(csize = cd(0).csize + 4)
    val e = intercept[IllegalArgumentException](
      ZipCodec.extract(wire, lying))
    assert(e.getMessage.contains("deflate stream ends at"),
      s"got: ${e.getMessage}")
  }

  test("q243 grain: one row per doc, md5 only on seeds, methods by formula") {
    val rows = Crawl.zipArchiveProbe(spark, sf).collect()
    val n = engine.Tables.documents(spark, sf).count()
    assert(rows.length == n.toInt)
    rows.foreach { r =>
      val id = r.getString(0).stripPrefix("docs/").stripSuffix(".txt").toLong
      assert(r.getString(1) == (if (id % 4 == 0) "stored" else "deflate"))
      assert(r.isNullAt(3) == (id % 31 != 5))
    }
  }
}
