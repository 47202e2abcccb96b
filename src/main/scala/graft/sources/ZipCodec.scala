package graft.sources

import graft.multimodal.PngCodec

/** ZIP (PKWARE APPNOTE) — the other dominant document-dump container
  * next to tar: unlike tar, ZIP carries a CENTRAL DIRECTORY at the end,
  * so an archive supports record-grain random access natively — the
  * format's own CDX ([[graft.engine.Crawl]]'s sidecar law built into
  * the wire). Dependency-free over the hand-rolled raw-DEFLATE inflate
  * ([[PngCodec.inflate]]) and CRC32.
  *
  * Subset law (loud wrongness-impossibility, as with PDF/PAX):
  *
  *  1. The End-Of-Central-Directory record (`PK\x05\x06`) is found by
  *     scanning backwards over a possible trailing comment; the comment
  *     length field must agree with the actual tail, and exactly one
  *     disk is supported (multi-disk fields must be zero).
  *  2. ZIP64 markers (0xFFFFFFFF sizes/offsets, 0xFFFF counts) reject
  *     by name — silently truncating 64-bit sizes reads wrong spans.
  *  3. Central entries (`PK\x01\x02`) carry name, method, CRC32,
  *     compressed/uncompressed sizes, and the local-header offset.
  *     Methods: 0 (stored, sizes must agree) and 8 (DEFLATE); anything
  *     else rejects by number.
  *  4. [[extract]] validates the local header (`PK\x03\x04`) against
  *     the central entry (name equality — a mismatch means the offsets
  *     are lying), honors the local extra-field length (it may differ
  *     from the central one), and rejects encryption (bit 0) and data
  *     descriptors (bit 3: sizes live AFTER the data — a streaming-
  *     writer convention this subset does not read).
  *  5. Decoded bytes must inflate to EXACTLY the declared uncompressed
  *     size and match the stored CRC32 — a drifted offset fails loudly,
  *     never answers wrongly (the CDX span-validity law, here enforced
  *     by the format itself).
  *
  * Scale shape: [[centralDirectory]] reads only the archive tail; a
  * probe [[extract]]s only matched entries' byte spans — probe cost
  * tracks the probed set, never the archive
  * ([[graft.engine.Crawl.zipArchiveProbe]]).
  */
object ZipCodec {

  final case class ZipEntry(name: String, method: Int, crc: Long,
      csize: Int, usize: Int, offset: Int)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"zip: $msg")

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def sigAt(b: Array[Byte], off: Int, c3: Int, c4: Int): Boolean =
    off + 4 <= b.length && b(off) == 'P'.toByte && b(off + 1) == 'K'.toByte &&
      (b(off + 2) & 0xff) == c3 && (b(off + 3) & 0xff) == c4

  /** Locate and parse the EOCD, then the central directory — the
    * metadata-only read a listing or probe pays (law passes 1–3). */
  def centralDirectory(bytes: Array[Byte]): Vector[ZipEntry] = {
    // EOCD is 22 bytes + comment (≤ 65535); scan back for the signature
    var eocd = -1
    var off = bytes.length - 22
    val floor = math.max(0, bytes.length - 22 - 0xffff)
    while (eocd < 0 && off >= floor) {
      if (sigAt(bytes, off, 0x05, 0x06) &&
          u16(bytes, off + 20) == bytes.length - off - 22) eocd = off
      else off -= 1
    }
    if (eocd < 0) fail("no end-of-central-directory record")
    if (u16(bytes, eocd + 4) != 0 || u16(bytes, eocd + 6) != 0)
      fail("multi-disk archives are not supported")
    val n = u16(bytes, eocd + 10)
    val total = u16(bytes, eocd + 8)
    if (n != total) fail("per-disk and total entry counts disagree")
    if (n == 0xffff) fail("ZIP64 entry count is outside the subset")
    val cdSize = u32(bytes, eocd + 12)
    val cdOff = u32(bytes, eocd + 16)
    if (cdOff == 0xffffffffL || cdSize == 0xffffffffL)
      fail("ZIP64 central directory is outside the subset")
    if (cdOff + cdSize != eocd)
      fail("central directory does not abut the EOCD")
    val out = Vector.newBuilder[ZipEntry]
    var p = cdOff.toInt
    var i = 0
    while (i < n) {
      if (!sigAt(bytes, p, 0x01, 0x02))
        fail(s"central entry $i: bad signature at $p")
      val flags = u16(bytes, p + 8)
      if ((flags & 0x1) != 0) fail(s"central entry $i is encrypted")
      if ((flags & 0x8) != 0)
        fail(s"central entry $i uses a data descriptor (streamed sizes)")
      val method = u16(bytes, p + 10)
      if (method != 0 && method != 8)
        fail(s"central entry $i: compression method $method unsupported")
      val crc = u32(bytes, p + 16)
      val csize = u32(bytes, p + 20)
      val usize = u32(bytes, p + 24)
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      val lho = u32(bytes, p + 42)
      if (csize == 0xffffffffL || usize == 0xffffffffL ||
          lho == 0xffffffffL)
        fail(s"central entry $i carries ZIP64 markers")
      if (method == 0 && csize != usize)
        fail(s"central entry $i: stored entry with csize != usize")
      val name = new String(bytes, p + 46, nameLen,
        java.nio.charset.StandardCharsets.US_ASCII)
      out += ZipEntry(name, method, crc, csize.toInt, usize.toInt, lho.toInt)
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    if (p != eocd) fail("central directory size disagrees with its entries")
    out.result()
  }

  /** Decode ONE entry's bytes by its central-directory record — the
    * random-access read (law passes 4–5). Touches only the local
    * header and the entry's own data span. */
  def extract(bytes: Array[Byte], e: ZipEntry): Array[Byte] = {
    if (!sigAt(bytes, e.offset, 0x03, 0x04))
      fail(s"${e.name}: no local header at offset ${e.offset}")
    val flags = u16(bytes, e.offset + 6)
    if ((flags & 0x1) != 0) fail(s"${e.name} is encrypted")
    if ((flags & 0x8) != 0) fail(s"${e.name} uses a data descriptor")
    val method = u16(bytes, e.offset + 8)
    if (method != e.method)
      fail(s"${e.name}: local method $method != central ${e.method}")
    val nameLen = u16(bytes, e.offset + 26)
    val extraLen = u16(bytes, e.offset + 28)
    val localName = new String(bytes, e.offset + 30, nameLen,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (localName != e.name)
      fail(s"local name '$localName' != central '${e.name}' — lying offset")
    val data = e.offset + 30 + nameLen + extraLen
    if (data + e.csize > bytes.length)
      fail(s"${e.name}: data span runs past the archive end")
    val out =
      if (e.method == 0) java.util.Arrays.copyOfRange(bytes, data, data + e.csize)
      else {
        // Inflate over a SLICE bounded at data + csize so the DEFLATE
        // stream cannot read past the declared compressed span (into the
        // next member or the central directory), and require the stream
        // to end exactly at csize — span validity on the compressed side,
        // not just CRC/usize on the decoded side.
        val span = java.util.Arrays.copyOfRange(bytes, data, data + e.csize)
        val (inflated, end) = PngCodec.inflateDynamic(span, 0)
        if (end != span.length)
          fail(s"${e.name}: deflate stream ends at $end, csize ${e.csize}")
        inflated
      }
    if (out.length != e.usize)
      fail(s"${e.name}: inflated ${out.length} != declared ${e.usize}")
    val crc = PngCodec.crc32(out, 0, out.length) & 0xffffffffL
    if (crc != e.crc)
      fail(f"${e.name}: CRC32 $crc%08x != stored ${e.crc}%08x")
    out
  }

  /** One member to write: name, payload, stored-vs-deflate, and the
    * Deflater level for the deflate arm (encode is corpus
    * construction — the JDK Deflater is fine here, as in PNG). */
  final case class ZipMember(name: String, data: Array[Byte],
      stored: Boolean, level: Int = 6)

  /** Encode an archive (local headers + central directory + EOCD with
    * the given comment). */
  def write(members: Seq[ZipMember], comment: String = ""): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    val central = members.map { m =>
      val offset = bos.size()
      val crc = PngCodec.crc32(m.data, 0, m.data.length) & 0xffffffffL
      val packed =
        if (m.stored) m.data
        else {
          val d = new java.util.zip.Deflater(m.level, true)
          d.setInput(m.data); d.finish()
          val buf = new Array[Byte](m.data.length + 64)
          val out = new java.io.ByteArrayOutputStream()
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end()
          out.toByteArray
        }
      val nameB = m.name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      bos.write(Array[Byte]('P', 'K', 3, 4))
      w16(20); w16(0); w16(if (m.stored) 0 else 8)
      w16(0); w16(0x5500) // DOS time 10:40:00, date 2026-08-00-ish constant
      w32(crc); w32(packed.length.toLong); w32(m.data.length.toLong)
      w16(nameB.length); w16(0)
      bos.write(nameB); bos.write(packed)
      (m, nameB, crc, packed.length, offset)
    }
    val cdOff = bos.size()
    central.foreach { case (m, nameB, crc, csize, offset) =>
      bos.write(Array[Byte]('P', 'K', 1, 2))
      w16(20); w16(20); w16(0); w16(if (m.stored) 0 else 8)
      w16(0); w16(0x5500)
      w32(crc); w32(csize.toLong); w32(m.data.length.toLong)
      w16(nameB.length); w16(0); w16(0)
      w16(0); w16(0); w32(0)
      w32(offset.toLong)
      bos.write(nameB)
    }
    val cdSize = bos.size() - cdOff
    val cB = comment.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    bos.write(Array[Byte]('P', 'K', 5, 6))
    w16(0); w16(0); w16(members.length); w16(members.length)
    w32(cdSize.toLong); w32(cdOff.toLong)
    w16(cB.length); bos.write(cB)
    bos.toByteArray
  }
}
