package graft.multimodal

/** A REAL image codec — binary PPM (P6), the dependency-free raster format
  * (netpbm): an actual wire format parsed from actual bytes — magic,
  * whitespace/comment-tolerant header, maxval, single-byte raster
  * separator, then `width*height*3` raw RGB bytes. The sibling
  * [[BmpCodec]] covers the binary-headed/bottom-up/BGR family; both feed
  * [[Multimodal.decodeImage]]'s magic-byte dispatch.
  *
  * The q178/q179 queries round-trip synthetic images through
  * [[encode]]→bytes→[[decode]] and aggregate REAL pixel statistics from the
  * decoded raster; the DuckDB oracle recomputes the expected statistics
  * from the generative formula alone, so any parser defect (header
  * tokenizing, comment skipping, raster offset, channel order) breaks the
  * hash match. [[resizeNearest]] is a real nearest-neighbour resample on
  * the decoded pixel grid — source index `floor(dst*src/dstDim)` per axis —
  * not the stub's byte subsampling.
  */
object PpmCodec {

  final case class PpmImage(width: Int, height: Int, maxVal: Int,
      rgb: Array[Byte]) {
    require(rgb.length == width * height * 3,
      s"raster ${rgb.length} != $width*$height*3")
  }

  /** Serialize as P6 with a comment line in the header — so [[decode]]'s
    * comment handling is exercised on every round trip, not just in specs. */
  def encode(img: PpmImage): Array[Byte] = {
    val header =
      s"P6\n# graft synthetic image\n${img.width} ${img.height}\n${img.maxVal}\n"
    val hb = header.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](hb.length + img.rgb.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(img.rgb, 0, out, hb.length, img.rgb.length)
    out
  }

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f'

  /** Parse a binary PPM. Accepts arbitrary whitespace and `#` comments
    * between header tokens (the netpbm grammar); requires exactly one
    * whitespace byte between maxval and the raster (also the grammar —
    * a raster may legally START with a byte that looks like whitespace). */
  def decode(bytes: Array[Byte]): PpmImage = {
    var pos = 0
    def peek: Int = bytes(pos) & 0xff
    def skipWsAndComments(): Unit = {
      var done = false
      while (!done && pos < bytes.length) {
        if (isWs(peek)) pos += 1
        else if (peek == '#') {
          while (pos < bytes.length && peek != '\n') pos += 1
        } else done = true
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !isWs(peek)) pos += 1
      new String(bytes, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM (magic '$magic')")
    val w = token().toInt
    val h = token().toInt
    val maxVal = token().toInt
    require(w > 0 && h > 0 && maxVal > 0 && maxVal < 65536,
      s"bad dimensions ${w}x$h maxval $maxVal")
    require(maxVal <= 255, "only 1-byte-per-channel rasters supported")
    require(pos < bytes.length && isWs(peek), "missing raster separator")
    pos += 1
    val n = w * h * 3
    require(bytes.length - pos >= n,
      s"truncated raster: ${bytes.length - pos} < $n")
    PpmImage(w, h, maxVal,
      java.util.Arrays.copyOfRange(bytes, pos, pos + n))
  }

  /** Nearest-neighbour resample on the PIXEL grid: destination (x,y) reads
    * source (x·srcW div dstW, y·srcH div dstH), all three channels. */
  def resizeNearest(img: PpmImage, dstW: Int, dstH: Int): PpmImage = {
    require(dstW > 0 && dstH > 0)
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = y * img.height / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * img.width / dstW
        val src = 3 * (sy * img.width + sx)
        val dst = 3 * (y * dstW + x)
        out(dst) = img.rgb(src)
        out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(dstW, dstH, img.maxVal, out)
  }
}
