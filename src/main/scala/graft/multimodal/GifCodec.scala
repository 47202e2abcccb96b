package graft.multimodal

import graft.multimodal.PpmCodec.PpmImage

/** GIF (87a/89a), dependency-free — the fifth real image wire format
  * behind [[Multimodal.decodeImage]]'s sniffing dispatch and the THIRD
  * compression family the codec suite hand-rolls: LZW with GIF's
  * variable-width LSB-first code packing (3→12 bits, width growth as
  * the dictionary fills, CLEAR/EOI control codes, the KwKwK
  * code==next special case, and deferred-clear streams where a full
  * dictionary keeps coding at 12 bits without growing). Container
  * grammar: logical screen descriptor, global/local color tables,
  * extension blocks (skipped by sub-block walk), image descriptor with
  * the 4-pass interlace flag, 255-byte data sub-block framing,
  * trailer.
  *
  * Decode lands in the shared top-down-RGB [[PpmImage]] like every
  * other codec, so the downstream resize/feature/stat operators stay
  * format-independent. The encoder exists for corpus construction
  * (q232's generative device) and is a REAL LZW compressor
  * (dictionary-building greedy parse, width sync with the decoder,
  * clear-on-full) — GifSpec cross-checks both directions against
  * `javax.imageio`'s GIF reader/writer.
  *
  * Decode hardening per the codec-family law: wire-supplied lengths
  * are bounds-checked before use and every reject is a clean
  * IllegalArgumentException, never an index error.
  */
object GifCodec {

  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  // ------------------------------------------------- LZW (GIF variant)

  /** Compress `indices` (each < 2^minCodeSize). Emits an initial CLEAR,
    * grows code width when the next assignable code would not fit
    * (encoder bumps at nextCode > 2^width; the decoder — whose
    * dictionary lags one entry — bumps at nextCode == 2^width: the
    * classic off-by-one pair that keeps both sides reading the same
    * widths), and clears when the dictionary reaches 4096. */
  private[graft] def lzwEncode(indices: Array[Byte],
      minCodeSize: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"bad LZW min code size $minCodeSize")
    val CLEAR = 1 << minCodeSize
    val EOI = CLEAR + 1
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCodeSize + 1
    def write(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = EOI + 1
    write(CLEAR)
    var prefix = -1
    var i = 0
    while (i < indices.length) {
      val b = indices(i) & 0xff
      require(b < CLEAR, s"index $b exceeds palette for $minCodeSize-bit LZW")
      if (prefix < 0) prefix = b
      else {
        val k = Integer.valueOf((prefix << 8) | b)
        val hit = dict.get(k)
        if (hit != null) prefix = hit.intValue()
        else {
          write(prefix)
          dict.put(k, Integer.valueOf(nextCode))
          nextCode += 1
          if (nextCode > (1 << codeSize) && codeSize < 12) codeSize += 1
          if (nextCode == 4096) {
            write(CLEAR)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = EOI + 1
            codeSize = minCodeSize + 1
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) write(prefix)
    write(EOI)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Decompress exactly `expected` indices. Handles width growth, the
    * KwKwK case (code == next free entry), and deferred clear (full
    * dictionary, no CLEAR: keep decoding at 12 bits without adds —
    * what other encoders may emit even though [[lzwEncode]] always
    * clears). EOI after the raster is optional (stops at `expected`
    * either way); producing FEWER indices is corruption. */
  private[graft] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"bad LZW min code size $minCodeSize")
    val CLEAR = 1 << minCodeSize
    val EOI = CLEAR + 1
    var codeSize = minCodeSize + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var nextCode = EOI + 1
    val out = new Array[Byte](expected)
    var o = 0
    var bitBuf = 0L
    var bitCnt = 0
    var p = 0
    def read(): Int = {
      while (bitCnt < codeSize) {
        require(p < data.length, "LZW stream truncated")
        bitBuf |= (data(p) & 0xffL) << bitCnt; p += 1; bitCnt += 8
      }
      val v = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      v
    }
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= EOI + 1) c = prefix(c)
      require(c < CLEAR, "corrupt LZW chain")
      c
    }
    def emit(code: Int): Unit = {
      var sp = 0
      var c = code
      while (c >= EOI + 1) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      require(c < CLEAR, "corrupt LZW chain")
      require(o + sp + 1 <= expected,
        "LZW output overruns the declared raster")
      out(o) = c.toByte; o += 1
      while (sp > 0) { sp -= 1; out(o) = stack(sp); o += 1 }
    }
    var prev = -1
    var done = false
    while (!done && o < expected) {
      val code = read()
      if (code == CLEAR) {
        codeSize = minCodeSize + 1; nextCode = EOI + 1; prev = -1
      } else if (code == EOI) done = true
      else if (prev < 0) {
        require(code < CLEAR, "first LZW code after clear must be a literal")
        emit(code)
        prev = code
      } else {
        require(code <= nextCode && code < 4096,
          s"LZW code $code beyond dictionary (next $nextCode)")
        if (code == nextCode) { // KwKwK: the entry being defined
          require(nextCode < 4096, "KwKwK against a full dictionary")
          prefix(nextCode) = prev
          suffix(nextCode) = firstOf(prev).toByte
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          emit(code)
        } else {
          emit(code)
          if (nextCode < 4096) {
            prefix(nextCode) = prev
            suffix(nextCode) = firstOf(code).toByte
            nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
        }
        prev = code
      }
    }
    require(o == expected, s"LZW produced $o indices, expected $expected")
    out
  }

  // ------------------------------------------------- interlace (4-pass)

  /** File-row k ↦ image row, in GIF's 4-pass order
    * (0,8,16,… / 4,12,… / 2,6,… / 1,3,…). */
  private def interlacedRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var k = 0
    for ((s, st) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = s
      while (y < h) { rows(k) = y; k += 1; y += st }
    }
    rows
  }

  private def interleave(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    val rows = interlacedRows(h)
    var k = 0
    while (k < h) {
      System.arraycopy(idx, rows(k) * w, out, k * w, w); k += 1
    }
    out
  }

  private def deinterlace(stored: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val out = new Array[Byte](stored.length)
    val rows = interlacedRows(h)
    var k = 0
    while (k < h) {
      System.arraycopy(stored, k * w, out, rows(k) * w, w); k += 1
    }
    out
  }

  // ------------------------------------------------- container

  /** Encode an indexed image: `indices(y*w + x)` into `palette`
    * (0xRRGGBB entries; length a power of two in 4..256). `gce = true`
    * writes a GIF89a with a graphic-control extension block (exercising
    * the decoder's extension walk); otherwise plain GIF87a. */
  def encode(w: Int, h: Int, palette: Array[Int], indices: Array[Byte],
      interlace: Boolean = false, gce: Boolean = false): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, "bad GIF dims")
    require(indices.length == w * h, "index plane does not match dims")
    val psize = palette.length
    require(psize >= 4 && psize <= 256 && Integer.bitCount(psize) == 1,
      s"palette size $psize not a power of two in 4..256")
    val bpp = 31 - Integer.numberOfLeadingZeros(psize)
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    out.write((if (gce) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >>> 8)
    out.write(h & 0xff); out.write(h >>> 8)
    out.write(0x80 | ((bpp - 1) << 4) | (bpp - 1)) // GCT, colorRes, size
    out.write(0) // background index
    out.write(0) // aspect
    palette.foreach { c =>
      out.write((c >>> 16) & 0xff); out.write((c >>> 8) & 0xff)
      out.write(c & 0xff)
    }
    if (gce) {
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(0); out.write(0); out.write(0) // no delay
      out.write(0) // terminator
    }
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xff); out.write(w >>> 8)
    out.write(h & 0xff); out.write(h >>> 8)
    out.write(if (interlace) 0x40 else 0) // no LCT
    val minCode = math.max(2, bpp)
    out.write(minCode)
    val lzw = lzwEncode(
      if (interlace) interleave(indices, w, h) else indices, minCode)
    var i = 0
    while (i < lzw.length) {
      val n = math.min(255, lzw.length - i)
      out.write(n); out.write(lzw, i, n); i += n
    }
    out.write(0) // data terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode the FIRST image of a GIF87a/89a stream (still-image
    * contract, like the rest of the codec family): skips extension
    * blocks by sub-block walk, honors a local color table over the
    * global one, de-interlaces, and maps indices through the palette
    * into top-down RGB. Returns the image and the palette size it
    * actually used. */
  def decodeWithPalette(bytes: Array[Byte]): (PpmImage, Int) = {
    require(sniff(bytes), "not a GIF stream")
    var p = 6
    def u8(): Int = {
      require(p < bytes.length, "GIF stream truncated")
      val v = bytes(p) & 0xff; p += 1; v
    }
    def u16(): Int = { val lo = u8(); val hi = u8(); lo | (hi << 8) }
    def colorTable(n: Int): Array[Int] = Array.fill(n) {
      val r = u8(); val g = u8(); val b = u8()
      (r << 16) | (g << 8) | b
    }
    val sw = u16(); val sh = u16() // logical screen dims
    val packed = u8()
    u8(); u8() // background index, aspect
    val gct =
      if ((packed & 0x80) != 0) colorTable(2 << (packed & 7)) else null
    var result: (PpmImage, Int) = null
    while (result == null) {
      u8() match {
        case 0x21 => // extension: label, then sub-blocks to terminator
          u8()
          var n = u8()
          while (n != 0) {
            require(p.toLong + n <= bytes.length, "GIF extension truncated")
            p += n
            n = u8()
          }
        case 0x2c =>
          // still-image contract: the single frame must BE the logical
          // screen. A first frame offset within (or smaller than) the
          // screen is animation-style compositing — returning it as a
          // full-size image would be silently wrong geometry, so reject
          // loudly instead (ADVICE r13).
          val left = u16(); val top = u16()
          val w = u16()
          val h = u16()
          require(left == 0 && top == 0,
            s"GIF frame offset ($left,$top) != (0,0): composited frame")
          require(w == sw && h == sh,
            s"GIF frame ${w}x$h != logical screen ${sw}x$sh")
          val ip = u8()
          val pal =
            if ((ip & 0x80) != 0) colorTable(2 << (ip & 7)) else gct
          require(pal != null, "GIF image has no color table")
          require(w > 0 && h > 0, "empty GIF image")
          val minCode = u8()
          val data = new java.io.ByteArrayOutputStream()
          var n = u8()
          while (n != 0) {
            require(p.toLong + n <= bytes.length, "GIF image data truncated")
            data.write(bytes, p, n)
            p += n
            n = u8()
          }
          val stored = lzwDecode(data.toByteArray, minCode, w * h)
          val idx = if ((ip & 0x40) != 0) deinterlace(stored, w, h)
            else stored
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val ix = idx(i) & 0xff
            require(ix < pal.length, s"palette index $ix out of range")
            val c = pal(ix)
            rgb(3 * i) = (c >>> 16).toByte
            rgb(3 * i + 1) = (c >>> 8).toByte
            rgb(3 * i + 2) = c.toByte
            i += 1
          }
          result = (PpmImage(w, h, 255, rgb), pal.length)
        case 0x3b =>
          throw new IllegalArgumentException("GIF trailer before any image")
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x")
      }
    }
    result
  }

  def decode(bytes: Array[Byte]): PpmImage = decodeWithPalette(bytes)._1
}
