package graft

import graft.sources.AvroCodec
import graft.sources.AvroCodec.{AvroField, Row}

/** Avro OCF codec: both-direction cross-checks against avro-core (the
  * reference implementation ships with Spark — the ImageIO device for
  * the container layer), JSON/schema subset arms, and the
  * loud-rejection family over hand-corrupted wires. */
class AvroSpec extends SparkSpecBase {

  private val fields = Vector(
    AvroField("id", "long"), AvroField("name", "string"),
    AvroField("score", "double"), AvroField("ok", "boolean"))

  private def rows(n: Int): Seq[Row] =
    (0 until n).map(i => Vector[Any](
      i.toLong * 3 - 7, s"row $i é${i % 4}", i * 0.125, i % 2 == 0))

  test("write → read round trip: null and deflate codecs, multi-block") {
    for (codec <- Seq("null", "deflate")) {
      val wire = AvroCodec.write(fields, rows(23), codec,
        rowsPerBlock = 5, seed = 9L)
      val ocf = AvroCodec.read(wire)
      assert(ocf.fields == fields && ocf.codec == codec)
      assert(ocf.rows == rows(23).toVector)
    }
  }

  test("avro-core reads our wire (both codecs)") {
    for (codec <- Seq("null", "deflate")) {
      val wire = AvroCodec.write(fields, rows(11), codec,
        rowsPerBlock = 4, seed = 3L)
      val f = java.io.File.createTempFile("graft", ".avro")
      java.nio.file.Files.write(f.toPath, wire)
      val reader = new org.apache.avro.file.DataFileReader(
        f, new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      val got = Iterator.continually(reader)
        .takeWhile(_.hasNext).map(_.next()).map { r =>
          Vector[Any](r.get("id").asInstanceOf[Long],
            r.get("name").toString,
            r.get("score").asInstanceOf[Double],
            r.get("ok").asInstanceOf[Boolean])
        }.toVector
      reader.close(); f.delete()
      assert(got == rows(11).toVector, s"codec=$codec")
    }
  }

  test("our reader decodes avro-core's wire (both codecs)") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"t","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"},
        |{"name":"score","type":"double"},{"name":"ok","type":"boolean"}
        |]}""".stripMargin)
    for (deflate <- Seq(false, true)) {
      val f = java.io.File.createTempFile("core", ".avro")
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema))
      if (deflate) w.setCodec(
        org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(schema, f)
      rows(9).foreach { r =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", r(0)); rec.put("name", r(1))
        rec.put("score", r(2)); rec.put("ok", r(3))
        w.append(rec)
      }
      w.close()
      val ocf = AvroCodec.read(java.nio.file.Files.readAllBytes(f.toPath))
      f.delete()
      assert(ocf.fields == fields.map(x =>
        AvroField(Map("id" -> "id", "name" -> "name", "score" -> "score",
          "ok" -> "ok")(x.name), x.tpe)))
      assert(ocf.rows == rows(9).toVector, s"deflate=$deflate")
    }
  }

  test("schema subset rejects by name: unions, nested, logical, enums") {
    def rejects(schema: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](
        AvroCodec.parseSchema(schema))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects("""{"type":"record","name":"t","fields":[
      {"name":"x","type":["null","long"]}]}""", "unions")
    rejects("""{"type":"record","name":"t","fields":[
      {"name":"x","type":{"type":"record","name":"n","fields":[]}}]}""",
      "nested")
    rejects("""{"type":"record","name":"t","fields":[
      {"name":"x","type":"bytes"}]}""", "outside the subset")
    rejects("""{"type":"array","items":"long"}""", "not a record")
    rejects("""{"type":"record","name":"t","fields":[{"type":"long"}]}""",
      "without a name")
  }

  test("rejection family: magic, sync, codec, boolean byte, truncation") {
    val wire = AvroCodec.write(fields, rows(8), "null",
      rowsPerBlock = 3, seed = 1L)
    def rejects(bad: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](AvroCodec.read(bad))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects(bad = { val w = wire.clone(); w(0) = 'X'.toByte; w }, "magic")
    rejects(wire.dropRight(3), "truncated")
    // flip a byte in the LAST sync marker (the final 16 bytes)
    rejects({ val w = wire.clone()
      w(w.length - 8) = (w(w.length - 8) ^ 0x41).toByte; w }, "sync")
    // unknown codec: rewrite the wire with a forged codec value
    val forged = {
      val w = wire.clone()
      val i = indexOfSlice(w, "deflate".getBytes("US-ASCII"))
      assert(i < 0) // null-codec wire carries no 'deflate'
      val j = indexOfSlice(w, "null".getBytes("US-ASCII"))
      "zstd".getBytes("US-ASCII").copyToArray(w, j); w
    }
    rejects(forged, "codec")
    // boolean byte: the last field of the first row in the first block;
    // easier to construct directly
    val badBool = AvroCodec.write(fields, rows(1), "null", 1, 2L)
    val k = badBool.length - 17 // last payload byte before trailing sync
    badBool(k) = 7
    rejects(badBool, "boolean byte")
  }

  private def indexOfSlice(h: Array[Byte], n: Array[Byte]): Int =
    h.indexOfSlice(n)

  private def zigzagVar(v: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var z = (v << 1) ^ (v >> 63)
    var done = false
    while (!done) {
      val b = (z & 0x7f).toInt; z >>>= 7
      if (z == 0) { bos.write(b); done = true } else bos.write(b | 0x80)
    }
    bos.toByteArray
  }

  test("deflate block with trailing bytes after the stream rejects") {
    // Hand-built OCF: one long field, one deflate block whose payload
    // carries one garbage byte AFTER the DEFLATE stream's final block.
    // The null codec rejects trailing payload bytes; the deflate codec
    // must be symmetric (the end index of inflateDynamic is checked).
    val schema =
      """{"type":"record","name":"t","fields":[{"name":"id","type":"long"}]}"""
    def kv(k: String, v: Array[Byte]): Array[Byte] =
      zigzagVar(k.length.toLong) ++ k.getBytes("UTF-8") ++
        zigzagVar(v.length.toLong) ++ v
    val rowBytes = zigzagVar(42L)
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(rowBytes); d.finish()
    val buf = new Array[Byte](64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val payload = out.toByteArray :+ 0x5a.toByte // trailing garbage
    val sync = Array.tabulate(16)(i => (i * 7 + 3).toByte)
    val wire = Array[Byte]('O', 'b', 'j', 1) ++
      zigzagVar(2L) ++ kv("avro.schema", schema.getBytes("UTF-8")) ++
      kv("avro.codec", "deflate".getBytes("US-ASCII")) ++
      zigzagVar(0L) ++ sync ++
      zigzagVar(1L) ++ zigzagVar(payload.length.toLong) ++ payload ++ sync
    val e = intercept[IllegalArgumentException](AvroCodec.read(wire))
    assert(e.getMessage.contains("trailing bytes"), s"got: ${e.getMessage}")
  }

  test("near-Int.MaxValue varint length fails as the named 'truncated'") {
    // A length whose pos + n overflows Int must hit the codec's own
    // Long-space check, not a raw JDK copyOfRange error or allocation.
    val wire = Array[Byte]('O', 'b', 'j', 1) ++
      zigzagVar(1L) ++ zigzagVar((Int.MaxValue - 2).toLong)
    val e = intercept[IllegalArgumentException](AvroCodec.read(wire))
    assert(e.getMessage.contains("truncated"), s"got: ${e.getMessage}")
  }

  test("q249 grain: one row per doc; title é arm survives UTF-8 lengths") {
    val rows = graft.engine.Crawl.avroRoundTrip(spark, sf).collect()
    val nDocs = engine.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs.toInt)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert((id % 5 == 0) == r.getString(1).contains("é"))
      assert(r.getDouble(2) == ((id * 7) % 1000).toDouble / 8.0)
      assert(r.getBoolean(3) == (id % 3 == 0))
    }
  }

  test("readAvroFiles: real files on disk, per-file rows") {
    val dir = tmpDir("avro-files")
    val w1 = AvroCodec.write(fields, rows(4), "deflate", 2, 5L)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.avro"), w1)
    val got = graft.engine.Crawl.readAvroFiles(spark, dir)
      .orderBy("row").collect()
    assert(got.length == 4)
    assert(got(2).getMap[String, String](2).get("name").contains("row 2 é2"))
  }
}
