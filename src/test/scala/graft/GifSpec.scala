package graft

import scala.util.Random

import graft.multimodal.{GifCodec, Multimodal}

/** GIF codec: LZW round trips (width growth, KwKwK, dictionary-full
  * clears), container round trips (interlace, 89a extension blocks),
  * both-direction cross-checks against `javax.imageio`'s GIF
  * reader/writer (lossless indexed format — exact equality, unlike the
  * JPEG ±1 bound), corruption rejects, and the q232 generative corpus
  * arms. The query gate is q232 (DuckDB composes the palette/index
  * formulas); this spec pins the machinery and the wires no generative
  * corpus reaches. */
class GifSpec extends SparkSpecBase {

  private def rndPalette(n: Int, seed: Int): Array[Int] = {
    val rnd = new Random(seed)
    Array.fill(n)(rnd.nextInt(0x1000000))
  }

  test("LZW round trip at every palette depth; long stream forces " +
      "dictionary-full clear; all-same stream forces KwKwK") {
    val rnd = new Random(11)
    for (bpp <- 2 to 8) {
      val n = if (bpp >= 7) 60000 else 4000
      val data = Array.fill(n)(rnd.nextInt(1 << bpp).toByte)
      val back = GifCodec.lzwDecode(GifCodec.lzwEncode(data, bpp), bpp, n)
      assert(back.toSeq == data.toSeq, s"bpp $bpp")
    }
    // KwKwK: runs of one symbol make the encoder emit the code it just
    // defined; the decoder must synthesize the undefined entry
    val runs = Array.fill(500)(3.toByte)
    assert(GifCodec.lzwDecode(GifCodec.lzwEncode(runs, 2), 2, 500).toSeq
      == runs.toSeq)
    // short-of-raster stream is corruption, not padding
    intercept[IllegalArgumentException] {
      GifCodec.lzwDecode(GifCodec.lzwEncode(runs, 2), 2, 501)
    }
  }

  test("container round trip: plain, interlaced, 89a with extension") {
    val rnd = new Random(23)
    for ((w, h, psize, interlace, gce) <- Seq(
      (7, 5, 4, false, false), (16, 16, 256, false, true),
      (13, 11, 32, true, false), (9, 17, 8, true, true),
      (1, 1, 4, false, false), (40, 1, 16, true, false))) {
      val pal = rndPalette(psize, w * 100 + h)
      val idx = Array.fill(w * h)(rnd.nextInt(psize).toByte)
      val wire = GifCodec.encode(w, h, pal, idx, interlace, gce)
      assert(new String(wire, 0, 6, "US-ASCII") ==
        (if (gce) "GIF89a" else "GIF87a"))
      val (img, ps) = GifCodec.decodeWithPalette(wire)
      assert(ps == psize && img.width == w && img.height == h)
      val expected = idx.flatMap { b =>
        val c = pal(b & 0xff)
        Array(((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte,
          (c & 0xff).toByte)
      }
      assert(img.rgb.toSeq == expected.toSeq,
        s"($w x $h, $psize colors, interlace=$interlace)")
    }
  }

  test("ImageIO reads our wire; we read ImageIO's wire (exact)") {
    val w = 21
    val h = 13
    val psize = 16
    val pal = rndPalette(psize, 99)
    val rnd = new Random(31)
    val idx = Array.fill(w * h)(rnd.nextInt(psize).toByte)
    // direction 1: our encoder → ImageIO reader
    for (interlace <- Seq(false, true)) {
      val wire = GifCodec.encode(w, h, pal, idx, interlace, gce = interlace)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(wire))
      assert(bi != null && bi.getWidth == w && bi.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        assert((bi.getRGB(x, y) & 0xffffff) == pal(idx(y * w + x) & 0xff),
          s"ImageIO disagrees at ($x,$y) interlace=$interlace")
      }
    }
    // direction 2: ImageIO writer (its own LZW encoder, its own block
    // layout) → our decoder
    val cm = new java.awt.image.IndexColorModel(4, psize,
      pal.map(c => ((c >> 16) & 0xff).toByte),
      pal.map(c => ((c >> 8) & 0xff).toByte),
      pal.map(c => (c & 0xff).toByte))
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, idx(y * w + x) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", bos))
    val img = GifCodec.decode(bos.toByteArray)
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      val ours = ((img.rgb(i) & 0xff) << 16) |
        ((img.rgb(i + 1) & 0xff) << 8) | (img.rgb(i + 2) & 0xff)
      assert(ours == (bi.getRGB(x, y) & 0xffffff),
        s"our decode disagrees with ImageIO's writer at ($x,$y)")
    }
  }

  test("corruption rejects cleanly") {
    val pal = rndPalette(4, 1)
    val idx = Array.fill(12)(2.toByte)
    val wire = GifCodec.encode(4, 3, pal, idx)
    intercept[IllegalArgumentException] { // bad magic
      GifCodec.decode("GIF88a".getBytes("US-ASCII") ++ wire.drop(6))
    }
    intercept[IllegalArgumentException] { // truncated mid-data
      GifCodec.decode(wire.dropRight(4))
    }
    intercept[IllegalArgumentException] { // trailer before any image
      GifCodec.decode(wire.take(6 + 7 + 12) :+ 0x3b.toByte)
    }
    intercept[IllegalArgumentException] { // unknown block introducer
      GifCodec.decode(wire.take(6 + 7 + 12) :+ 0x7f.toByte)
    }
    intercept[IllegalArgumentException] { // encoder rejects out-of-palette
      GifCodec.encode(2, 2, pal, Array[Byte](0, 1, 2, 9))
    }
    // still-image geometry (ADVICE r13): a frame offset within the
    // logical screen, or smaller than it, is composited animation
    // geometry — reject, never silently return wrong-geometry pixels.
    // Image descriptor starts at 6 (header) + 7 (LSD) + 12 (GCT) = 25:
    // 0x2c, left@26, top@28, w@30, h@32.
    val offset = wire.clone(); offset(26) = 1
    intercept[IllegalArgumentException] { GifCodec.decode(offset) }
    val small = wire.clone(); small(30) = 3 // frame w=3 < screen w=4
    intercept[IllegalArgumentException] { GifCodec.decode(small) }
  }

  test("q232 corpus arms: palette depths, interlace fifth, 89a third") {
    for ((id, nc) <- Seq((0L, 0L), (3L, 25L), (5L, 7L), (6L, 18L),
        (13L, 40L))) {
      val wire = Multimodal.synthGif(id, nc)
      assert(GifCodec.sniff(wire))
      assert(new String(wire, 0, 6, "US-ASCII") ==
        (if (id % 3 == 0) "GIF89a" else "GIF87a"))
      val (img, psize) = GifCodec.decodeWithPalette(wire)
      assert(psize == (1 << (id % 7 + 2).toInt))
      assert(img.width == (nc % 19 + 3).toInt)
      assert(img.height == (nc % 13 + 3).toInt)
      // spot-check a pixel against the composed formulas
      val pp = (img.width * img.height) / 2
      val j = (id * 29 + pp * 17) % psize
      assert((img.rgb(3 * pp) & 0xff) == ((id * 3 + j * 5) % 256).toInt)
      assert((img.rgb(3 * pp + 1) & 0xff) == ((id * 5 + j * 11) % 256).toInt)
      assert((img.rgb(3 * pp + 2) & 0xff) == ((id * 7 + j * 13) % 256).toInt)
      // the sniffing dispatch reaches the GIF arm
      assert(Multimodal.decodeImage(wire).rgb.toSeq == img.rgb.toSeq)
    }
  }
}
