package graft.multimodal

import PpmCodec.PpmImage

/** A second REAL image codec — uncompressed 24-bit Windows BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB). Deliberately a
  * different wire-format family from [[PpmCodec]]'s ASCII-headed PPM:
  * little-endian binary headers, BGR channel order, BOTTOM-UP row
  * storage, and 4-byte row padding — four independent parsing hazards a
  * symmetric encode/decode bug cannot hide behind once the wire layout
  * itself is pinned (q203 gates the file size and the first raster byte
  * on the wire; BmpSpec decodes hand-authored byte arrays).
  *
  * In-memory raster is the shared [[PpmCodec.PpmImage]] (top-down RGB),
  * so [[PpmCodec.resizeNearest]] and every downstream feature/stat
  * operator are format-independent — the q204 mixed-format decode runs
  * both parsers into one statistics pipeline.
  *
  * Decode accepts both row orders (positive height = bottom-up, the
  * common case; negative = top-down) and honors the header's declared
  * pixel-data offset rather than assuming 54 (palettes/gaps are legal
  * even for 24-bit files).
  */
object BmpCodec {

  private val FILE_HEADER = 14
  private val INFO_HEADER = 40

  private def rowStride(w: Int): Int = (3 * w + 3) / 4 * 4

  /** Encoded file size for a w×h 24-bit BMP — header + padded rows.
    * Exposed so the q203 oracle can pin the wire length arithmetically. */
  def wireSize(w: Int, h: Int): Int = FILE_HEADER + INFO_HEADER + rowStride(w) * h

  private def putU16(b: Array[Byte], pos: Int, v: Int): Unit = {
    b(pos) = (v & 0xff).toByte
    b(pos + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def putU32(b: Array[Byte], pos: Int, v: Long): Unit = {
    var i = 0
    while (i < 4) { b(pos + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def u16(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], pos: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def i32(b: Array[Byte], pos: Int): Int = u32(b, pos).toInt

  /** Serialize top-down RGB as a bottom-up BI_RGB 24-bit BMP. */
  def encode(img: PpmImage): Array[Byte] = {
    require(img.maxVal <= 255, "BMP stores 8-bit channels")
    val (w, h) = (img.width, img.height)
    val stride = rowStride(w)
    val out = new Array[Byte](wireSize(w, h))
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong)
    putU32(out, 10, (FILE_HEADER + INFO_HEADER).toLong) // pixel data offset
    putU32(out, 14, INFO_HEADER.toLong)
    putU32(out, 18, w.toLong)
    putU32(out, 22, h.toLong) // positive: bottom-up
    putU16(out, 26, 1)        // planes
    putU16(out, 28, 24)       // bpp
    putU32(out, 30, 0L)       // BI_RGB
    putU32(out, 34, (stride * h).toLong)
    putU32(out, 38, 2835L)    // 72 DPI
    putU32(out, 42, 2835L)
    var y = 0
    while (y < h) {
      val rowBase = FILE_HEADER + INFO_HEADER + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val src = 3 * (y * w + x)
        out(rowBase + 3 * x) = img.rgb(src + 2)     // B
        out(rowBase + 3 * x + 1) = img.rgb(src + 1) // G
        out(rowBase + 3 * x + 2) = img.rgb(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse an uncompressed 24-bit BMP into top-down RGB. */
  def decode(bytes: Array[Byte]): PpmImage = {
    require(bytes.length >= FILE_HEADER + INFO_HEADER, "truncated BMP header")
    require(bytes(0) == 'B' && bytes(1) == 'M',
      s"not a BMP (magic ${bytes(0)} ${bytes(1)})")
    // Validate the u32 offset BEFORE narrowing: an offset > Int.MaxValue
    // would wrap negative on .toInt and slip past the truncated-raster
    // check below, failing later with an index error instead of a clean
    // parse error.
    val dataOffsetL = u32(bytes, 10)
    require(dataOffsetL >= (FILE_HEADER + INFO_HEADER).toLong &&
        dataOffsetL <= bytes.length.toLong,
      s"bad pixel-data offset $dataOffsetL (file ${bytes.length} bytes)")
    val dataOffset = dataOffsetL.toInt
    val infoSize = u32(bytes, 14).toInt
    require(infoSize >= INFO_HEADER, s"unsupported info header size $infoSize")
    val w = i32(bytes, 18)
    val hRaw = i32(bytes, 22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"bad dimensions ${w}x$hRaw")
    require(u16(bytes, 26) == 1, "planes must be 1")
    require(u16(bytes, 28) == 24, s"only 24-bit supported (${u16(bytes, 28)})")
    require(u32(bytes, 30) == 0L, "only BI_RGB (uncompressed) supported")
    val stride = rowStride(w)
    require(bytes.length - dataOffset >= stride * h,
      s"truncated raster: ${bytes.length - dataOffset} < ${stride * h}")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val rowBase = dataOffset + srcRow * stride
      var x = 0
      while (x < w) {
        val dst = 3 * (y * w + x)
        rgb(dst) = bytes(rowBase + 3 * x + 2)     // R
        rgb(dst + 1) = bytes(rowBase + 3 * x + 1) // G
        rgb(dst + 2) = bytes(rowBase + 3 * x)     // B
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, 255, rgb)
  }
}
