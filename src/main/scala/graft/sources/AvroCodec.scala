package graft.sources

import graft.multimodal.PngCodec

/** Avro Object Container Files (the Apache Avro 1.x spec) — the
  * row-oriented interchange container training-metadata pipelines ship
  * next to parquet. The Spark distribution here carries avro-core but
  * NOT the spark-avro data source, so the reader is hand-rolled from
  * the public spec over the shared raw-DEFLATE inflate — same posture
  * as WARC/tar/ZIP.
  *
  * Subset law (loud wrongness-impossibility):
  *
  *  1. The header is `Obj\x01`, a file-metadata map (block-counted
  *     string→bytes entries, zero-terminated), and a 16-byte sync
  *     marker. `avro.codec` may be `null` (absent = null) or
  *     `deflate` (raw DEFLATE, RFC 1951); anything else rejects by
  *     name.
  *  2. The embedded `avro.schema` JSON must be a RECORD of primitive
  *     fields — `long`, `int`, `double`, `string`, `boolean` — in
  *     declaration order. Unions, nested records, enums, fixeds,
  *     logical types, and aliases reject BY NAME: silently flattening
  *     a union or skipping a nested field would decode WRONG rows
  *     (the PDF/PAX posture).
  *  3. Data blocks are (row count varint, byte length varint, payload,
  *     sync). Every block's sync must equal the header's — a mismatch
  *     is corruption, not tolerance. Counts/lengths are zigzag
  *     varints; a varint running past 10 bytes rejects.
  *  4. Values decode per the spec: zigzag varint ints/longs,
  *     little-endian IEEE double, length-prefixed UTF-8 strings,
  *     single-byte booleans (any value other than 0/1 rejects).
  *
  * Scale shape: like the other containers, the FILE is the task unit
  * (blocks are sync-delimited but the codec needs the header schema);
  * [[graft.engine.Crawl.avroRoundTrip]] runs write → parse inside one
  * row's computation and the real-file reader keys on `binaryFile`
  * rows.
  */
object AvroCodec {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"avro: $msg")

  // ------------------------------------------------ minimal JSON

  /** Minimal JSON for the embedded schema document: objects, arrays,
    * strings (with escapes), numbers, booleans, null. */
  sealed trait Json
  final case class JObj(fields: Vector[(String, Json)]) extends Json {
    def get(k: String): Option[Json] = fields.find(_._1 == k).map(_._2)
  }
  final case class JArr(items: Vector[Json]) extends Json
  final case class JStr(s: String) extends Json
  final case class JNum(n: Double) extends Json
  final case class JBool(b: Boolean) extends Json
  case object JNull extends Json

  private[graft] def parseJson(s: String): Json = {
    val p = new JsonParser(s)
    val v = p.value()
    p.skipWs()
    if (!p.atEof) fail("trailing JSON content")
    v
  }

  private final class JsonParser(s: String) {
    private var pos = 0
    def atEof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      if (pos >= s.length || s.charAt(pos) != c)
        fail(s"JSON: expected '$c' at $pos")
      pos += 1
    }
    def value(): Json = {
      skipWs()
      if (atEof) fail("JSON: truncated")
      s.charAt(pos) match {
        case '{' =>
          pos += 1
          val fs = Vector.newBuilder[(String, Json)]
          skipWs()
          if (pos < s.length && s.charAt(pos) == '}') { pos += 1 }
          else {
            var done = false
            while (!done) {
              skipWs()
              val k = string()
              skipWs(); expect(':')
              fs += (k -> value())
              skipWs()
              if (pos < s.length && s.charAt(pos) == ',') pos += 1
              else { expect('}'); done = true }
            }
          }
          JObj(fs.result())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Json]
          skipWs()
          if (pos < s.length && s.charAt(pos) == ']') { pos += 1 }
          else {
            var done = false
            while (!done) {
              items += value()
              skipWs()
              if (pos < s.length && s.charAt(pos) == ',') pos += 1
              else { expect(']'); done = true }
            }
          }
          JArr(items.result())
        case '"' => JStr(string())
        case 't' =>
          if (!s.startsWith("true", pos)) fail("JSON: bad literal")
          pos += 4; JBool(true)
        case 'f' =>
          if (!s.startsWith("false", pos)) fail("JSON: bad literal")
          pos += 5; JBool(false)
        case 'n' =>
          if (!s.startsWith("null", pos)) fail("JSON: bad literal")
          pos += 4; JNull
        case _ =>
          val start = pos
          while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0)
            pos += 1
          if (pos == start) fail(s"JSON: unexpected char at $pos")
          JNum(s.substring(start, pos).toDouble)
      }
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (pos >= s.length) fail("JSON: truncated escape")
          s.charAt(pos) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u' =>
              if (pos + 4 >= s.length) fail("JSON: truncated \\u escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16)
                .toChar)
              pos += 4
            case other => fail(s"JSON: unknown escape \\$other")
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      expect('"')
      sb.toString
    }
  }

  // ------------------------------------------------ schema subset

  /** One primitive field of the record schema. */
  final case class AvroField(name: String, tpe: String)

  private[graft] def parseSchema(json: String): Vector[AvroField] = {
    val root = parseJson(json) match {
      case o: JObj => o
      case _ => fail("schema is not a JSON object")
    }
    root.get("type") match {
      case Some(JStr("record")) => ()
      case other => fail(s"schema type $other is not a record")
    }
    val fields = root.get("fields") match {
      case Some(JArr(fs)) => fs
      case _ => fail("record schema without a fields array")
    }
    fields.map {
      case o: JObj =>
        val name = o.get("name") match {
          case Some(JStr(n)) => n
          case _ => fail("field without a name")
        }
        val tpe = o.get("type") match {
          case Some(JStr(t)) => t
          case Some(JArr(_)) =>
            fail(s"field '$name': unions are outside the subset")
          case Some(_: JObj) =>
            fail(s"field '$name': nested/complex types are outside the subset")
          case other => fail(s"field '$name': bad type $other")
        }
        tpe match {
          case "long" | "int" | "double" | "string" | "boolean" =>
            AvroField(name, tpe)
          case other =>
            fail(s"field '$name': type '$other' is outside the subset")
        }
      case _ => fail("field entry is not an object")
    }
  }

  // ------------------------------------------------ binary primitives

  private final class Reader(b: Array[Byte], var pos: Int) {
    def varLong(what: String): Long = {
      var shift = 0
      var acc = 0L
      var n = 0
      var done = false
      while (!done) {
        if (pos >= b.length) fail(s"$what: truncated varint")
        if (n >= 10) fail(s"$what: varint over 10 bytes")
        val v = b(pos) & 0xff
        pos += 1; n += 1
        acc |= (v & 0x7fL) << shift
        shift += 7
        done = (v & 0x80) == 0
      }
      // zigzag
      (acc >>> 1) ^ -(acc & 1)
    }
    def bytes(n: Long, what: String): Array[Byte] = {
      // Compare in Long space: a varint length near Int.MaxValue would
      // overflow pos + n.toInt to negative and slip past an Int check.
      if (n < 0 || n > (b.length - pos).toLong)
        fail(s"$what: truncated ($n bytes)")
      val ni = n.toInt
      val out = java.util.Arrays.copyOfRange(b, pos, pos + ni)
      pos += ni
      out
    }
    def str(what: String): String = {
      val n = varLong(what)
      new String(bytes(n, what),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    def atEof: Boolean = pos >= b.length
  }

  /** A decoded row: values in field order, typed Long / Double /
    * String / Boolean. */
  type Row = Vector[Any]

  final case class Ocf(fields: Vector[AvroField], codec: String,
      rows: Vector[Row])

  /** Parse one OCF byte stream per the law. */
  def read(bytes: Array[Byte]): Ocf = {
    if (bytes.length < 4 || bytes(0) != 'O' || bytes(1) != 'b' ||
        bytes(2) != 'j' || bytes(3) != 1)
      fail("bad magic (not an Avro object container file)")
    val r = new Reader(bytes, 4)
    // file metadata map: blocks of (count, entries...), 0 ends
    var meta = Map.empty[String, Array[Byte]]
    var n = r.varLong("meta count")
    while (n != 0) {
      val count = if (n < 0) { r.varLong("meta block size"); -n } else n
      var i = 0L
      while (i < count) {
        val k = r.str("meta key")
        val vLen = r.varLong("meta value length")
        meta += (k -> r.bytes(vLen, s"meta value of $k"))
        i += 1
      }
      n = r.varLong("meta count")
    }
    val schemaJson = meta.getOrElse("avro.schema",
      fail("missing avro.schema"))
    val fields = parseSchema(new String(schemaJson,
      java.nio.charset.StandardCharsets.UTF_8))
    val codec = meta.get("avro.codec")
      .map(new String(_, java.nio.charset.StandardCharsets.US_ASCII))
      .getOrElse("null")
    if (codec != "null" && codec != "deflate")
      fail(s"codec '$codec' is outside the subset")
    val sync = r.bytes(16, "sync marker")
    val rows = Vector.newBuilder[Row]
    while (!r.atEof) {
      val rowCount = r.varLong("block row count")
      if (rowCount < 0) fail("negative block row count")
      val byteLen = r.varLong("block byte length")
      val payload0 = r.bytes(byteLen, "block payload")
      val payload =
        if (codec == "null") payload0
        else {
          // Symmetric strictness with the null codec's trailing-bytes
          // check: the DEFLATE stream must end exactly at the declared
          // block length, not leave silent garbage after its last block.
          val (out, end) = PngCodec.inflateDynamic(payload0, 0)
          if (end != payload0.length)
            fail("deflate block has trailing bytes after the stream")
          out
        }
      val blockSync = r.bytes(16, "block sync")
      if (!java.util.Arrays.equals(sync, blockSync))
        fail("block sync marker differs from the header's")
      val br = new Reader(payload, 0)
      var i = 0L
      while (i < rowCount) {
        rows += fields.map { f =>
          f.tpe match {
            case "long" | "int" => br.varLong(f.name)
            case "double" =>
              val raw = br.bytes(8, f.name)
              java.lang.Double.longBitsToDouble(
                java.nio.ByteBuffer.wrap(raw)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
            case "string" => br.str(f.name)
            case "boolean" =>
              br.bytes(1, f.name)(0) match {
                case 0 => false
                case 1 => true
                case other => fail(s"${f.name}: boolean byte $other")
              }
          }
        }
        i += 1
      }
      if (!br.atEof) fail("block payload has trailing bytes")
    }
    Ocf(fields, codec, rows.result())
  }

  // ------------------------------------------------ writer

  private def writeVar(bos: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63) // zigzag
    var done = false
    while (!done) {
      val b = (z & 0x7f).toInt
      z >>>= 7
      if (z == 0) { bos.write(b); done = true }
      else bos.write(b | 0x80)
    }
  }

  private def writeRow(bos: java.io.ByteArrayOutputStream,
      fields: Vector[AvroField], row: Row): Unit =
    fields.zip(row).foreach {
      case (AvroField(_, "long" | "int"), v: Long) => writeVar(bos, v)
      case (AvroField(_, "double"), v: Double) =>
        val bits = java.lang.Double.doubleToLongBits(v)
        val bb = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(bits)
        bos.write(bb.array())
      case (AvroField(_, "string"), v: String) =>
        val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        writeVar(bos, b.length.toLong); bos.write(b)
      case (AvroField(_, "boolean"), v: Boolean) =>
        bos.write(if (v) 1 else 0)
      case (f, v) => fail(s"${f.name}: value $v does not match ${f.tpe}")
    }

  /** Write an OCF: schema from `fields`, `rowsPerBlock` rows per data
    * block, codec `null` or `deflate`, a deterministic sync marker
    * derived from `seed`. */
  def write(fields: Vector[AvroField], rows: Seq[Row], codec: String,
      rowsPerBlock: Int, seed: Long): Array[Byte] = {
    val schema = "{\"type\":\"record\",\"name\":\"graft\",\"fields\":[" +
      fields.map(f => s"""{"name":"${f.name}","type":"${f.tpe}"}""")
        .mkString(",") + "]}"
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("Obj".getBytes("US-ASCII")); bos.write(1)
    val meta = Seq(
      "avro.schema" -> schema.getBytes(
        java.nio.charset.StandardCharsets.UTF_8),
      "avro.codec" -> codec.getBytes("US-ASCII"))
    writeVar(bos, meta.length.toLong)
    meta.foreach { case (k, v) =>
      val kb = k.getBytes("US-ASCII")
      writeVar(bos, kb.length.toLong); bos.write(kb)
      writeVar(bos, v.length.toLong); bos.write(v)
    }
    writeVar(bos, 0L)
    val sync = Array.tabulate[Byte](16)(i =>
      ((seed * 31 + i * 17) % 251).toByte)
    bos.write(sync)
    rows.grouped(rowsPerBlock).foreach { block =>
      val payload = new java.io.ByteArrayOutputStream()
      block.foreach(writeRow(payload, fields, _))
      val raw = payload.toByteArray
      val packed =
        if (codec == "null") raw
        else {
          val d = new java.util.zip.Deflater(6, true)
          d.setInput(raw); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](raw.length + 64)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end()
          out.toByteArray
        }
      writeVar(bos, block.length.toLong)
      writeVar(bos, packed.length.toLong)
      bos.write(packed)
      bos.write(sync)
    }
    bos.toByteArray
  }
}
