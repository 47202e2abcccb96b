package graft.sources

/** POSIX ustar tar — the shard wrapper real training pipelines
  * distribute multimodal sample corpora in (the WebDataset convention:
  * one `.tar` per shard, one sample = consecutive members sharing a
  * basename key, e.g. `000000123.jpg` + `000000123.txt` +
  * `000000123.cls`). Dependency-free, from the public IEEE 1003.1
  * ustar layout.
  *
  * Parsing law:
  *
  *  1. The stream is 512-byte blocks: a header block, then
  *     `ceil(size/512)` data blocks per entry; the archive ends with
  *     two consecutive ZERO blocks (required — a missing terminator is
  *     truncation and rejects); trailing zero padding after them is
  *     tolerated (tar's -b blocking).
  *  2. Numeric fields are octal: optional leading spaces/zeros, digits,
  *     terminated by NUL or space. A set high bit (GNU base-256
  *     binary) rejects by name — silently misreading it would produce
  *     wrong sizes and desync every later entry.
  *  3. The header checksum (unsigned byte sum with the chksum field as
  *     eight spaces) must match; the historic SIGNED-byte sum is also
  *     accepted (old tars wrote it — decode strictness tracks the
  *     format's real population), anything else rejects.
  *  4. `magic` must be `ustar` (POSIX `ustar\0` or the old GNU
  *     `ustar `). Pre-POSIX headers reject.
  *  5. `typeflag`: `'0'` or NUL = regular file (emitted), `'5'` =
  *     directory (skipped). PAX (`x`/`g`) and GNU long-name (`L`/`K`)
  *     headers REJECT BY NAME: they change how the following entry's
  *     name must be read, and a subset reader that skipped them would
  *     emit entries under WRONG names — the loud-wrongness-
  *     impossibility posture. Links and specials reject too (they have
  *     no place in a data shard).
  *  6. The entry name is `prefix + '/' + name` when the ustar prefix
  *     field is non-empty.
  *
  * Scale shape: like gzip members ([[WarcCodec]]), tar entries are not
  * block-splittable without reading headers, so the FILE is the task
  * unit — exactly how WebDataset shards are sized (a few hundred MB
  * each); [[graft.multimodal.Multimodal.readTarShards]] keys on
  * `binaryFile` rows.
  */
object TarCodec {

  final case class TarEntry(name: String, size: Long, mtime: Long,
      data: Array[Byte])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"tar: $msg")

  private val BLOCK = 512

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < BLOCK) {
      if (b(off + i) != 0) return false
      i += 1
    }
    true
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Octal numeric field per law pass 2. */
  private def octal(b: Array[Byte], off: Int, len: Int,
      field: String): Long = {
    if ((b(off) & 0x80) != 0)
      fail(s"$field uses GNU base-256 numbers (not ustar octal)")
    var i = off
    val max = off + len
    while (i < max && (b(i) == ' '.toByte)) i += 1
    var v = 0L
    var digits = 0
    while (i < max && b(i) >= '0'.toByte && b(i) <= '7'.toByte) {
      v = v * 8 + (b(i) - '0'.toByte)
      digits += 1
      i += 1
    }
    if (digits == 0) fail(s"$field holds no octal digits")
    if (i < max && b(i) != 0 && b(i) != ' '.toByte)
      fail(s"$field has a non-octal byte")
    v
  }

  /** Parse a whole `.tar` byte stream; returns REGULAR FILE entries
    * (directories skipped), in archive order. */
  def parseEntries(bytes: Array[Byte]): Vector[TarEntry] = {
    if (bytes.length % BLOCK != 0)
      fail(s"length ${bytes.length} is not a multiple of 512")
    val out = Vector.newBuilder[TarEntry]
    var off = 0
    var terminated = false
    while (!terminated) {
      if (off + BLOCK > bytes.length) fail("missing end-of-archive blocks")
      if (isZeroBlock(bytes, off)) {
        if (off + 2 * BLOCK > bytes.length ||
            !isZeroBlock(bytes, off + BLOCK))
          fail("single zero block is not a valid terminator")
        // trailing blocks after the terminator must be zero padding
        var t = off + 2 * BLOCK
        while (t < bytes.length) {
          if (!isZeroBlock(bytes, t)) fail("garbage after the terminator")
          t += BLOCK
        }
        terminated = true
      } else {
        val magic = str(bytes, off + 257, 6)
        if (magic != "ustar" && magic != "ustar ")
          fail(s"bad magic '$magic' (pre-POSIX header?)")
        // checksum over the header with the chksum field as spaces
        var sumU = 0L
        var sumS = 0L
        var i = 0
        while (i < BLOCK) {
          val raw =
            if (i >= 148 && i < 156) ' '.toByte else bytes(off + i)
          sumU += raw & 0xff
          sumS += raw
          i += 1
        }
        val stored = octal(bytes, off + 148, 8, "chksum")
        if (stored != sumU && stored != sumS)
          fail(s"checksum $stored matches neither unsigned $sumU nor signed $sumS")
        val name0 = str(bytes, off, 100)
        val prefix = str(bytes, off + 345, 155)
        val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
        val size = octal(bytes, off + 124, 12, s"size of $name")
        if (size > Int.MaxValue - 2L * BLOCK)
          fail(s"$name: size $size exceeds this reader's in-memory bound")
        val mtime = octal(bytes, off + 136, 12, s"mtime of $name")
        val tf = bytes(off + 156)
        val dataBlocks = ((size + BLOCK - 1) / BLOCK).toInt
        if (off + BLOCK + dataBlocks * BLOCK > bytes.length)
          fail(s"$name: data runs past the archive end")
        tf match {
          case b if b == '0'.toByte || b == 0 =>
            val data = new Array[Byte](size.toInt)
            System.arraycopy(bytes, off + BLOCK, data, 0, size.toInt)
            out += TarEntry(name, size, mtime, data)
          case b if b == '5'.toByte =>
            if (size != 0) fail(s"directory $name with non-zero size")
          case b if b == 'x'.toByte || b == 'g'.toByte =>
            fail(s"PAX extended header at $name is outside the ustar subset")
          case b if b == 'L'.toByte || b == 'K'.toByte =>
            fail(s"GNU long-name header at $name is outside the ustar subset")
          case b =>
            fail(s"$name: typeflag '${b.toChar}' has no place in a data shard")
        }
        off += BLOCK + dataBlocks * BLOCK
      }
    }
    out.result()
  }

  private def putStr(h: Array[Byte], off: Int, len: Int, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length > len) fail(s"field value '$s' exceeds $len bytes")
    System.arraycopy(b, 0, h, off, b.length)
  }

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long,
      spaceTerm: Boolean): Unit = {
    // len-1 digits + terminator (NUL or the historic space)
    val digits = java.lang.Long.toOctalString(v)
    if (digits.length > len - 1) fail(s"octal value $v exceeds field")
    val padded = ("0" * (len - 1 - digits.length)) + digits
    putStr(h, off, len - 1, padded)
    h(off + len - 1) = if (spaceTerm) ' '.toByte else 0
  }

  /** One member to write: full path, mtime, payload, and the typeflag
    * byte (`'0'` file, `0` old-style file, `'5'` directory). */
  final case class TarMember(name: String, mtime: Long, data: Array[Byte],
      typeflag: Byte = '0'.toByte)

  /** Encode members into a ustar stream. A name over 100 bytes is
    * split into (prefix, name) at the last `/` whose tail fits —
    * rejecting names the format cannot carry. `spaceTerm` writes the
    * historic space-terminated octal in half the numeric fields so
    * readers see both terminators on the wire. */
  def write(members: Seq[TarMember]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    members.zipWithIndex.foreach { case (m, mi) =>
      val h = new Array[Byte](BLOCK)
      val (prefix, base) =
        if (m.name.length <= 100) ("", m.name)
        else {
          val cut = m.name.lastIndexWhere(_ == '/',
            math.min(m.name.length - 1, 155))
          if (cut < 0 || m.name.length - cut - 1 > 100)
            fail(s"name '${m.name}' cannot split into ustar prefix/name")
          (m.name.substring(0, cut), m.name.substring(cut + 1))
        }
      putStr(h, 0, 100, base)
      val spaceTerm = mi % 2 == 1
      putStr(h, 100, 8, "0000644")
      putOctal(h, 108, 8, 0, spaceTerm)            // uid
      putOctal(h, 116, 8, 0, spaceTerm)            // gid
      putOctal(h, 124, 12, m.data.length.toLong, spaceTerm)
      putOctal(h, 136, 12, m.mtime, spaceTerm)
      h(156) = m.typeflag
      putStr(h, 257, 6, "ustar")                   // + NUL from zeroed array
      putStr(h, 263, 2, "00")                      // version
      putStr(h, 265, 32, "graft")
      putStr(h, 297, 32, "graft")
      putOctal(h, 329, 8, 0, spaceTerm)
      putOctal(h, 337, 8, 0, spaceTerm)
      putStr(h, 345, 155, prefix)
      // checksum: unsigned sum with chksum as spaces
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < BLOCK) { sum += h(i) & 0xff; i += 1 }
      putOctal(h, 148, 7, sum, spaceTerm = false)
      h(155) = ' '.toByte // historic "NUL then space" chksum terminator
      bos.write(h)
      bos.write(m.data)
      val pad = (BLOCK - (m.data.length % BLOCK)) % BLOCK
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](2 * BLOCK))
    bos.toByteArray
  }
}
