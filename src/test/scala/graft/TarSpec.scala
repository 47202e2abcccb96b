package graft

import graft.multimodal.Multimodal
import graft.sources.TarCodec

/** POSIX ustar codec: write→parse round trips (both octal terminators,
  * both file typeflags, prefix-split long names), the loud-rejection
  * family over hand-corrupted headers, and the WebDataset shard
  * reader over real `.tar` files on disk. */
class TarSpec extends SparkSpecBase {

  private def member(name: String, data: String, tf: Byte = '0'.toByte) =
    TarCodec.TarMember(name, 12345L, data.getBytes("US-ASCII"), tf)

  test("write → parse round trip: names, sizes, mtimes, payloads, dirs skipped") {
    val wire = TarCodec.write(Seq(
      TarCodec.TarMember("data/", 7L, Array.emptyByteArray, '5'.toByte),
      member("data/a.txt", "hello tar"),
      member("data/b.cls", "7", 0.toByte), // old-style NUL typeflag
      member("data/c.bin", "x" * 513)))    // spans two data blocks
    assert(wire.length % 512 == 0)
    val es = TarCodec.parseEntries(wire)
    assert(es.map(_.name) == Vector("data/a.txt", "data/b.cls", "data/c.bin"))
    assert(es.map(_.size) == Vector(9L, 1L, 513L))
    assert(es.forall(_.mtime == 12345L))
    assert(new String(es(0).data, "US-ASCII") == "hello tar")
    assert(new String(es(2).data, "US-ASCII") == "x" * 513)
  }

  test("names over 100 bytes ride the ustar prefix field and rejoin on parse") {
    val long = ("d" * 80) + "/" + ("e" * 40) + "/file.txt"
    assert(long.length > 100)
    val es = TarCodec.parseEntries(TarCodec.write(Seq(member(long, "p"))))
    assert(es.map(_.name) == Vector(long))
    // a name whose tail segment alone exceeds 100 bytes cannot split
    val bad = ("d" * 60) + "/" + ("e" * 120) + ".txt"
    val ex = intercept[IllegalArgumentException](
      TarCodec.write(Seq(member(bad, "p"))))
    assert(ex.getMessage.contains("cannot split"))
  }

  private def corrupt(wire: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
    val c = wire.clone(); f(c); c
  }

  test("rejection family: checksum, magic, octal, truncation, subset flags") {
    val wire = TarCodec.write(Seq(member("a.txt", "hello")))
    def rejects(bad: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](TarCodec.parseEntries(bad))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    def rechecksum(w: Array[Byte]): Unit = {
      java.util.Arrays.fill(w, 148, 156, ' '.toByte)
      var s = 0L; (0 until 512).foreach(i => s += w(i) & 0xff)
      val oct = java.lang.Long.toOctalString(s)
      (("0" * (6 - oct.length)) + oct).getBytes("US-ASCII").copyToArray(w, 148)
      w(154) = 0; w(155) = ' '.toByte
    }
    rejects(corrupt(wire)(_(0) = 'Z'.toByte), "checksum")
    rejects(corrupt(wire)(_(257) = 'v'.toByte), "magic") // checked before sum
    rejects(corrupt(wire)(w => { w(124) = 0x80.toByte; rechecksum(w) }),
      "base-256")
    rejects(wire.dropRight(512), "terminator")          // one zero block
    rejects(wire.take(512), "data runs past")           // header, no data
    rejects(wire :+ 1.toByte, "multiple of 512")
    val pax = corrupt(wire) { w => w(156) = 'x'.toByte; rechecksum(w) }
    rejects(pax, "PAX")
    val trailingGarbage = wire ++ new Array[Byte](511) :+ 9.toByte
    rejects(trailingGarbage, "garbage after the terminator")
  }

  test("historic signed checksum is accepted") {
    val wire = TarCodec.write(Seq(member("a.txt", "hi")))
    // force a high byte into the header so signed and unsigned differ,
    // then store the SIGNED sum
    val w = wire.clone()
    w(265) = 0xC3.toByte // uname field: non-ASCII byte
    java.util.Arrays.fill(w, 148, 156, ' '.toByte)
    var sumS = 0L; (0 until 512).foreach(i => sumS += w(i))
    val oct = java.lang.Long.toOctalString(sumS)
    (("0" * (6 - oct.length)) + oct).getBytes("US-ASCII").copyToArray(w, 148)
    w(154) = 0; w(155) = ' '.toByte
    assert(TarCodec.parseEntries(w).map(_.name) == Vector("a.txt"))
  }

  test("generative shard: every sample groups its members; keys, labels, text pin") {
    val docs = Array((0L, 40L), (3L, 25L), (13L, 31L), (26L, 17L), (7L, 50L))
    val es = TarCodec.parseEntries(Multimodal.buildShardTar(docs))
    // 5 docs: all get .txt + .cls; 0 and 3 get .ppm (doc%3==0)
    assert(es.length == 12)
    val byKey = es.groupBy(e => e.name.substring(0, e.name.lastIndexOf('.')))
    assert(byKey.size == 5)
    assert(byKey(Multimodal.tarKey(0L)).map(_.name.split('.').last).sorted
      == Vector("cls", "ppm", "txt"))
    assert(byKey(Multimodal.tarKey(13L)).map(_.name.split('.').last).sorted
      == Vector("cls", "txt")) // 13 % 3 != 0: no image member
    // 0, 13 and 26 ride the >100-byte prefix-split arm (doc%13==0)
    assert(byKey.keySet.count(_.startsWith("x" * 90)) == 3)
  }

  test("readTarShards over real files: per-file rows, corrupt file fails loudly") {
    val dir = tmpDir("tar-shards")
    val w1 = TarCodec.write(Seq(member("s/a.txt", "one"), member("s/a.cls", "1")))
    val w2 = TarCodec.write(Seq(member("s/b.txt", "two")))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "sh-0.tar"), w1)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "sh-1.tar"), w2)
    val rows = Multimodal.readTarShards(spark, dir)
      .orderBy("path", "name").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("s/a.cls", "s/a.txt", "s/b.txt"))
    assert(rows.map(_.getString(4)).toSeq == Seq("cls", "txt", "txt"))
  }

  test("reshard is invisible to the sample set (q248 ≡ q242)") {
    val orig = Multimodal.tarShardSamples(spark, sf).collect().toSeq
    val rs = Multimodal.tarReshard(spark, sf).collect().toSeq
    assert(orig.nonEmpty && rs == orig)
  }

  test("q242 grain: one row per document, image stats only on doc%3==0") {
    val df = Multimodal.tarShardSamples(spark, sf)
    val n = engine.Tables.documents(spark, sf).count()
    val rows = df.collect()
    assert(rows.length == n.toInt)
    rows.foreach { r =>
      val key = r.getString(0)
      val hasImg = !r.isNullAt(4)
      val id = key.substring(key.lastIndexOf("sample") + 6).toLong
      assert(hasImg == (id % 3 == 0))
      assert(r.getLong(1) == id % 10)
      if (id % 13 == 0) assert(key.startsWith("x" * 90))
    }
  }
}
