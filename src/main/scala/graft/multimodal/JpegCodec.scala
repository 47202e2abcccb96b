package graft.multimodal

import PpmCodec.PpmImage

/** Baseline sequential JPEG (ITU-T T.81 / JFIF), dependency-free — the
  * dominant real-corpus image format, closing the last codec gap behind
  * [[Multimodal.decodeImage]]'s magic-byte dispatch (PPM/BMP/WAV/PNG
  * landed in earlier rounds; VERDICT r12 ranked JPEG the #1 missing
  * operator). The decode path is a REAL baseline decoder:
  *
  *  - marker walk (SOI/APPn/COM/DQT/DHT/SOF0/SOF1/DRI/SOS/EOI), fill
  *    bytes, unknown segments skipped by length;
  *  - DQT 8- and 16-bit precision tables, zigzag order;
  *  - DHT canonical Huffman construction (BITS/HUFFVAL — the same
  *    over-subscription check discipline as [[PngCodec]]'s inflate);
  *  - the entropy decoder: MSB-first bit reader with 0xFF00 byte
  *    unstuffing, RSTn restart handling (byte align, predictor reset),
  *    DC category/extend with per-component prediction, AC (run,size)
  *    symbols with ZRL and EOB;
  *  - dequantization, separable double-precision IDCT, level shift;
  *  - generic sampling factors (4:4:4, 4:2:0, 4:2:2 — any h,v ≤ 4 with
  *    replication upsampling), 1- or 3-component frames;
  *  - fixed-point integer YCbCr→RGB (the exact arithmetic the q228
  *    DuckDB twin replays: `(91881·(Cr−128) + 32768) >> 16` etc.).
  *
  * PROGRESSIVE (SOF2) decode landed in round 13 — the full T.81 G.2
  * scan family: every scan accumulates into per-component quantized
  * coefficient planes (reconstruction runs once at EOI), with
  * interleaved DC first/refinement scans, single-component AC spectral-
  * selection scans with EOBn run coding, and AC successive-approximation
  * REFINEMENT (correction bits on nonzero history, ±(1<<Al) insertions,
  * EOB-run blocks that still carry correction bits — the jdphuff-shaped
  * logic). ImageIO's default progressive scan script (which uses
  * successive approximation) is the spec's foreign-file oracle. The
  * remaining non-baseline frame types (lossless, arithmetic, DNL,
  * hierarchical) stay loud rejections.
  *
  * The encoder is corpus construction (the q218 device): it does no
  * forward DCT — the caller hands it QUANTIZED coefficient blocks, and
  * it performs real zigzag/run-length/category coding against custom
  * all-one-length canonical Huffman tables it declares in DHT. That is
  * what makes q228 hash-gateable for a LOSSY format: the corpus only
  * populates coefficients (0,0), (4,0), (0,4), (4,4), whose DCT basis
  * functions are exactly rational (cos((2x+1)·4π/16) = ±√2/2, so the
  * C(4)·cos product is ±1/2 and each term contributes ±F/8), and the
  * quant tables are all 8s — the decoded pixel is the exact integer
  * `128 + q00 + sx·q40 + sy·q04 + sx·sy·q44` (sign pattern
  * sx = +1 iff x mod 4 ∈ {0,3}) that the oracle regenerates
  * arithmetically, reachable on the Spark side only through the full
  * entropy decode → dequant → IDCT → upsample → color-convert chain.
  * MultimodalSpec additionally cross-checks the decoder against
  * `javax.imageio` (JDK) on ImageIO-encoded files — an independent
  * implementation as the spec oracle, tolerance-bounded because JPEG
  * permits per-decoder IDCT/upsampling variance.
  *
  * Reference behavior cited: the reference pipeline stores media refs
  * and never decodes (SURVEY §2 multimodal note); this codec family is
  * the declared beyond-reference training-data surface.
  */
object JpegCodec {

  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff

  /** Zigzag scan order: zigzag index → natural index (8·row + col). */
  private[graft] val ZIGZAG: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (d <- 0 until 15) {
      val rows =
        if (d % 2 == 1) math.max(0, d - 7) to math.min(7, d)
        else math.min(7, d) to math.max(0, d - 7) by -1
      for (r <- rows) { out(i) = 8 * r + (d - r); i += 1 }
    }
    out
  }

  // ------------------------------------------------------- entropy layer

  /** MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    * restart markers are consumed only via [[restart]] (a marker byte
    * surfacing mid-symbol is a corrupt stream). */
  private final class JBitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        require(pos < data.length, "JPEG entropy stream truncated")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length, "JPEG entropy stream truncated at FF")
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF data byte
          else throw new IllegalArgumentException(
            f"unexpected marker FF$m%02x inside entropy-coded data")
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      cnt = 0
      require(pos + 2 <= data.length, "truncated at restart marker")
      val m = ((data(pos) & 0xff) << 8) | (data(pos + 1) & 0xff)
      require(m == 0xffd0 + n,
        f"expected RST$n%d (FF${0xd0 + n}%02x), found $m%04x")
      pos += 2
    }
  }

  /** Canonical Huffman table from DHT's BITS (codes per length 1..16) and
    * HUFFVAL, decoded bit-by-bit — the [[PngCodec.Huffman]] construction
    * with JPEG's MSB-first codes. */
  private final class JHuffman(bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 16 && vals.length == bits.sum,
      "DHT counts disagree with value list")
    locally { // over-subscribed code sets are corrupt streams
      var left = 1
      for (l <- 0 until 16) {
        left = (left << 1) - bits(l)
        require(left >= 0, "invalid JPEG Huffman code set (over-subscribed)")
      }
    }
    def decode(br: JBitReader): Int = {
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= 16) {
        code |= br.bit()
        val cnt = bits(len - 1)
        if (code - first < cnt) return vals(index + (code - first))
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        len += 1
      }
      throw new IllegalArgumentException("invalid JPEG Huffman code")
    }
  }

  /** T.81 F.2.2.1 EXTEND: a `size`-bit magnitude to its signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  // ------------------------------------------------------------ the IDCT

  /** cosTab(x)(u) = C(u)·cos((2x+1)uπ/16) — the separable IDCT kernel.
    * Double precision: on the q228 corpus (coefficients only at the four
    * rational positions, all multiples of the quant step) the exact
    * result is an integer, the float error is ~1e-12, and round-half-up
    * can never cross a .5 boundary; on general streams JPEG itself only
    * requires IDCT accuracy bounds, which this exceeds. */
  private val cosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16) *
      (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  }

  /** Dequantized natural-order coefficients → 64 clamped samples. */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val g = new Array[Double](64) // pass 1: along u (columns) per coef row
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += cosTab(x)(u) * coef(8 * v + u); u += 1 }
        g(8 * v + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += cosTab(y)(vv) * g(8 * vv + x); vv += 1 }
        val px = math.floor(0.25 * s + 128.5).toInt // level shift, half-up
        out(8 * y + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  // ----------------------------------------------------------- decoding

  private def be16(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)

  private final case class Component(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a baseline OR progressive JPEG into top-down RGB
    * (grayscale expands g→(g,g,g)), plus the sum of the decoded
    * QUANTIZED DC values of component 0 accumulated across every block
    * of every Ah=0 DC scan — a structural pin that the entropy decoder
    * walked the whole MCU grid through the DC prediction chain (the
    * q228/q229 oracles recompute it from the generative block formula,
    * padding blocks included).
    *
    * Architecture: every scan decodes into per-component QUANTIZED
    * coefficient planes (the representation progressive scans refine
    * across multiple passes — T.81 G.2), and reconstruction (dequant,
    * IDCT, upsample, color) runs once at EOI. Baseline files are the
    * one-scan special case of the same machinery. */
  def decodeWithDcSum(bytes: Array[Byte]): (PpmImage, Long) = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (SOI missing)")
    var pos = 2
    val qt = new Array[Array[Int]](4) // zigzag order, as stored
    val dcTabs = new Array[JHuffman](4)
    val acTabs = new Array[JHuffman](4)
    var restartInterval = 0
    var w = -1
    var h = -1
    var comps: Array[Component] = null
    var progressive = false
    var coefs: Array[Array[Int]] = null // per comp: padded grid × 64, NATURAL
    var blocksW: Array[Int] = null      // padded (interleaved-grid) blocks/row
    var blocksH: Array[Int] = null
    var sawScan = false
    val dcSum = new Array[Long](1)
    var result: (PpmImage, Long) = null

    while (result == null) {
      require(pos + 2 <= bytes.length, "truncated JPEG (no EOI)")
      require((bytes(pos) & 0xff) == 0xff,
        f"expected a marker at $pos, found ${bytes(pos) & 0xff}%02x")
      pos += 1
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1 // fill
      require(pos < bytes.length, "truncated JPEG marker")
      val marker = bytes(pos) & 0xff
      pos += 1
      def segLen(): Int = {
        require(pos + 2 <= bytes.length, "truncated segment length")
        val len = be16(bytes, pos)
        require(len >= 2 && pos.toLong + len <= bytes.length,
          s"segment overruns file (len=$len at $pos)")
        len
      }
      marker match {
        case 0xdb => // DQT: one or more tables
          val end = pos + segLen()
          pos += 2
          while (pos < end) {
            val pq = (bytes(pos) & 0xff) >> 4
            val tq = bytes(pos) & 0x0f
            require(pq <= 1 && tq <= 3, "bad DQT precision/slot")
            pos += 1
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) {
              tab(k) =
                if (pq == 0) { val t = bytes(pos) & 0xff; pos += 1; t }
                else { val t = be16(bytes, pos); pos += 2; t }
              require(tab(k) > 0, "zero quantizer value")
              k += 1
            }
            qt(tq) = tab
          }
          require(pos == end, "DQT length disagrees with its tables")
        case 0xc4 => // DHT: one or more tables
          val end = pos + segLen()
          pos += 2
          while (pos < end) {
            val tc = (bytes(pos) & 0xff) >> 4
            val th = bytes(pos) & 0x0f
            require(tc <= 1 && th <= 3, "bad DHT class/slot")
            pos += 1
            val bits = Array.tabulate(16)(i => bytes(pos + i) & 0xff)
            pos += 16
            val n = bits.sum
            require(pos + n <= end, "DHT values overrun segment")
            val vals = Array.tabulate(n)(i => bytes(pos + i) & 0xff)
            pos += n
            val tab = new JHuffman(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
          }
          require(pos == end, "DHT length disagrees with its tables")
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential, SOF2 progressive
          require(comps == null, "multiple SOF segments")
          progressive = marker == 0xc2
          val len = segLen()
          require((bytes(pos + 2) & 0xff) == 8,
            s"only 8-bit sample precision supported")
          h = be16(bytes, pos + 3)
          w = be16(bytes, pos + 5)
          require(w > 0 && h > 0, s"bad frame dimensions ${w}x$h")
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3,
            s"only 1- or 3-component frames supported (got $nc)")
          require(len == 8 + 3 * nc, "SOF length disagrees with components")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val c = Component(bytes(o) & 0xff, (bytes(o + 1) & 0xff) >> 4,
              bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
            require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
              s"bad sampling factors ${c.h}x${c.v}")
            require(c.tq <= 3, "bad quant table selector")
            c
          }
          val hmax = comps.map(_.h).max
          val vmax = comps.map(_.v).max
          val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
          val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
          blocksW = comps.map(c => mcusX * c.h)
          blocksH = comps.map(c => mcusY * c.v)
          coefs = comps.indices.toArray.map(i =>
            new Array[Int](blocksW(i) * blocksH(i) * 64))
          pos += len
        case m if (m >= 0xc3 && m <= 0xc7) || (m >= 0xc9 && m <= 0xcb) ||
            (m >= 0xcd && m <= 0xcf) =>
          throw new IllegalArgumentException(
            f"non-baseline frame type FF$m%02x not supported " +
              "(sequential SOF0/SOF1 and progressive SOF2 are)")
        case 0xdd => // DRI
          require(segLen() == 4, "bad DRI length")
          restartInterval = be16(bytes, pos + 2)
          pos += 4
        case 0xda => // SOS — decode one scan into the coefficient planes
          require(comps != null, "SOS before SOF")
          val len = segLen()
          val ns = bytes(pos + 2) & 0xff
          require(ns >= 1 && ns <= comps.length, s"bad scan component count $ns")
          require(len == 6 + 2 * ns, "SOS length disagrees with components")
          val scanCis = new Array[Int](ns)
          val useDc = new Array[Int](ns)
          val useAc = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val id = bytes(pos + 3 + 2 * i) & 0xff
            val ci = comps.indexWhere(_.id == id)
            require(ci >= 0, s"scan references unknown component id $id")
            if (ns > 1) require(ci == i,
              "interleaved scan component order must match the frame")
            scanCis(i) = ci
            useDc(i) = (bytes(pos + 4 + 2 * i) & 0xff) >> 4
            useAc(i) = bytes(pos + 4 + 2 * i) & 0x0f
            i += 1
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xff
          val se = bytes(pos + 4 + 2 * ns) & 0xff
          val ah = (bytes(pos + 5 + 2 * ns) & 0xff) >> 4
          val al = bytes(pos + 5 + 2 * ns) & 0x0f
          if (!progressive)
            require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "sequential scan must cover the full band unshifted")
          else {
            require(se >= ss && se <= 63 && al <= 13 &&
              (ah == 0 || ah == al + 1),
              s"bad progressive scan parameters Ss=$ss Se=$se Ah=$ah Al=$al")
            require(ss == 0 || ns == 1,
              "progressive AC scans must be single-component")
            if (ss == 0) require(se == 0,
              "progressive DC scan must have Se=0")
          }
          pos += len
          pos = decodeScan(bytes, pos, w, h, comps, scanCis, useDc, useAc,
            ss, se, ah, al, restartInterval, dcTabs, acTabs,
            coefs, blocksW, blocksH, dcSum)
          sawScan = true
        case 0xd9 => // EOI: reconstruct
          require(sawScan, "EOI before any scan — no image data")
          result = (reconstruct(w, h, comps, qt, coefs, blocksW, blocksH),
            dcSum(0))
        case 0xd8 =>
          throw new IllegalArgumentException("unexpected SOI inside stream")
        case m if m >= 0xd0 && m <= 0xd7 =>
          throw new IllegalArgumentException("restart marker outside a scan")
        case 0x01 => () // TEM: standalone, no length
        case _ => pos += segLen() // APPn / COM / others: skip by length
      }
    }
    result
  }

  def decode(bytes: Array[Byte]): PpmImage = decodeWithDcSum(bytes)._1

  /** Decode ONE scan (sequential full-band, progressive DC first/refine,
    * progressive AC first/refine — T.81 F.2 and G.2) into the quantized
    * coefficient planes; returns the stream position after the scan's
    * entropy data. Interleaved scans walk the MCU grid; single-component
    * scans walk the component's OWN block grid (which excludes the MCU
    * padding blocks — those keep zero AC, exactly what an encoder never
    * sends). Restart markers byte-align, reset DC predictors AND the
    * EOB run. */
  private def decodeScan(bytes: Array[Byte], at: Int, w: Int, h: Int,
      comps: Array[Component], scanCis: Array[Int],
      useDc: Array[Int], useAc: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int,
      dcTabs: Array[JHuffman], acTabs: Array[JHuffman],
      coefs: Array[Array[Int]], blocksW: Array[Int], blocksH: Array[Int],
      dcSum: Array[Long]): Int = {
    val ns = scanCis.length
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    scanCis.indices.foreach { i =>
      val c = comps(scanCis(i))
      if (ss == 0) require(dcTabs(useDc(i)) != null,
        s"scan references missing DC table ${useDc(i)}")
      if (se >= 1) require(acTabs(useAc(i)) != null,
        s"scan references missing AC table ${useAc(i)}")
      require(c.tq <= 3)
    }
    val br = new JBitReader(bytes, at)
    val preds = new Array[Int](comps.length)
    val eobrun = new Array[Int](1)
    var rst = 0
    var unit = 0 // restart-interval unit counter (MCUs, or blocks if ns==1)

    def maybeRestart(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.restart(rst)
        rst = (rst + 1) % 8
        java.util.Arrays.fill(preds, 0)
        eobrun(0) = 0
      }

    // ---- per-block scan-type decoders over one NATURAL-order block ----

    def decodeDc(si: Int, ci: Int, block: Array[Int], off: Int): Unit =
      if (ah == 0) {
        val t = dcTabs(useDc(si)).decode(br)
        require(t <= 11, s"bad DC category $t")
        preds(ci) += extend(br.bits(t), t)
        block(off) = preds(ci) << al
        if (ci == 0) dcSum(0) += preds(ci)
      } else { // DC refinement: one correction bit per block
        if (br.bit() == 1) block(off) |= (1 << al)
      }

    def acFirst(si: Int, block: Array[Int], off: Int,
        allowEobrun: Boolean): Unit = {
      if (eobrun(0) == 0) {
        var k = math.max(ss, 1)
        var done = false
        while (!done && k <= se) {
          val rs = acTabs(useAc(si)).decode(br)
          val r = rs >> 4
          val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              if (!allowEobrun) require(r == 0,
                "EOBn run is a progressive symbol, invalid in a " +
                  "sequential scan")
              eobrun(0) = (1 << r) + (if (r > 0) br.bits(r) else 0)
              done = true
            }
          } else {
            k += r
            require(k <= se, "AC run overruns the band")
            require(s <= 10, s"bad AC size $s")
            block(off + ZIGZAG(k)) = extend(br.bits(s), s) << al
            k += 1
          }
        }
      }
      if (eobrun(0) > 0) eobrun(0) -= 1 // this block belongs to the run
    }

    /** AC successive-approximation refinement (T.81 G.2 / the jdphuff
      * shape): every NONZERO-history coefficient encountered consumes a
      * correction bit; zero-history positions count down the run before
      * a ±(1<<Al) insertion; an EOBn ends insertions but the REST of the
      * band still takes correction bits, as do whole blocks inside the
      * EOB run. */
    def acRefine(si: Int, block: Array[Int], off: Int): Unit = {
      val p1 = 1 << al
      val m1 = -1 << al
      def correct(z: Int): Unit =
        if (block(off + z) != 0) {
          val b = br.bit()
          if (b == 1 && (block(off + z) & p1) == 0)
            block(off + z) += (if (block(off + z) >= 0) p1 else m1)
        }
      var k = ss
      if (eobrun(0) == 0) {
        var done = false
        while (!done && k <= se) {
          val rs = acTabs(useAc(si)).decode(br)
          var r = rs >> 4
          val s = rs & 15
          var newVal = 0
          if (s == 0) {
            if (r < 15) {
              eobrun(0) = (1 << r) + (if (r > 0) br.bits(r) else 0)
              done = true
            }
            // r == 15: run of 16 zero-history positions, no insertion
          } else {
            require(s == 1, s"refinement magnitude must be 1, got $s")
            newVal = if (br.bit() == 1) p1 else m1
          }
          if (!done) {
            var placed = false
            while (!placed && k <= se) {
              val z = ZIGZAG(k)
              if (block(off + z) != 0) correct(z)
              else {
                if (r == 0) {
                  if (newVal != 0) block(off + z) = newVal
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            require(placed || newVal == 0,
              "refinement insertion overruns the band")
          }
        }
      }
      if (eobrun(0) > 0) {
        while (k <= se) { correct(ZIGZAG(k)); k += 1 }
        eobrun(0) -= 1
      }
    }

    def decodeBlock(si: Int, ci: Int, bx: Int, by: Int): Unit = {
      val block = coefs(ci)
      val off = (by * blocksW(ci) + bx) * 64
      if (ss == 0) decodeDc(si, ci, block, off)
      if (se >= 1) {
        if (ah == 0) acFirst(si, block, off, allowEobrun = ss >= 1)
        else acRefine(si, block, off)
      }
    }

    if (ns > 1) { // interleaved: walk the MCU grid
      val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          var si = 0
          while (si < ns) {
            val ci = scanCis(si)
            val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(si, ci, mx * c.h + bx, my * c.v + by)
                bx += 1
              }
              by += 1
            }
            si += 1
          }
          unit += 1
          mx += 1
        }
        my += 1
      }
    } else { // single component: its OWN block grid, one block per unit
      val ci = scanCis(0)
      val c = comps(ci)
      val compW = (w * c.h + hmax - 1) / hmax
      val compH = (h * c.v + vmax - 1) / vmax
      val nbx = (compW + 7) / 8
      val nby = (compH + 7) / 8
      var by = 0
      while (by < nby) {
        var bx = 0
        while (bx < nbx) {
          maybeRestart()
          decodeBlock(0, ci, bx, by)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
    br.pos
  }

  /** Dequantize + IDCT every block of every component plane, then crop,
    * replication-upsample, and color-convert — runs once at EOI. */
  private def reconstruct(w: Int, h: Int, comps: Array[Component],
      qt: Array[Array[Int]], coefs: Array[Array[Int]],
      blocksW: Array[Int], blocksH: Array[Int]): PpmImage = {
    val nc = comps.length
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val planeW = blocksW.map(_ * 8)
    val planes = new Array[Array[Int]](nc)
    val deq = new Array[Int](64)
    val samp = new Array[Int](64)
    var ci = 0
    while (ci < nc) {
      val c = comps(ci)
      require(qt(c.tq) != null,
        s"component ${c.id} references missing quant table ${c.tq}")
      // natural-order quantizer (DQT stores zigzag)
      val qn = new Array[Int](64)
      var k = 0
      while (k < 64) { qn(ZIGZAG(k)) = qt(c.tq)(k); k += 1 }
      val plane = new Array[Int](planeW(ci) * blocksH(ci) * 8)
      val block = coefs(ci)
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          val off = (by * blocksW(ci) + bx) * 64
          var i = 0
          while (i < 64) { deq(i) = block(off + i) * qn(i); i += 1 }
          idctBlock(deq, samp)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              plane((by * 8 + yy) * planeW(ci) + bx * 8 + xx) =
                samp(8 * yy + xx)
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      planes(ci) = plane
      ci += 1
    }
    val rgb = new Array[Byte](w * h * 3)
    def sampleOf(i: Int, x: Int, y: Int): Int = {
      val c = comps(i)
      planes(i)((y * c.v / vmax) * planeW(i) + (x * c.h / hmax))
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = 3 * (y * w + x)
        if (nc == 1) {
          val g = sampleOf(0, x, y)
          rgb(o) = g.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = g.toByte
        } else {
          val yv = sampleOf(0, x, y)
          val cb0 = sampleOf(1, x, y) - 128
          val cr0 = sampleOf(2, x, y) - 128
          // fixed-point JFIF conversion; >> 16 is floor division, the
          // exact arithmetic the q228/q229 oracles replay
          def clamp(v: Int): Byte =
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          rgb(o) = clamp(yv + ((91881 * cr0 + 32768) >> 16))
          rgb(o + 1) = clamp(yv + ((-22554 * cb0 - 46802 * cr0 + 32768) >> 16))
          rgb(o + 2) = clamp(yv + ((116130 * cb0 + 32768) >> 16))
        }
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, 255, rgb)
  }

  // ----------------------------------------------------------- encoding

  /** Custom DC table: the 12 categories as length-4 canonical codes
    * (12/16 Kraft slack, all-ones code unused — valid per T.81). */
  private val ENC_DC_BITS =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val ENC_DC_VALS = Array.tabulate(12)(identity)

  /** Custom AC table: EOB0..EOB14 (the progressive EOBn run family —
    * EOB0 doubles as the sequential EOB), ZRL, and every (run 0..15,
    * size 1..10) as length-8 canonical codes (176 ≤ 255, all-ones
    * unused). One-length tables keep the encoder trivial while the
    * DECODER still builds them through the general canonical
    * construction — and the spec's ImageIO files bring the standard
    * variable-length tables. */
  private val ENC_AC_BITS =
    Array(0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0)
  private val ENC_AC_VALS: Array[Int] =
    ((0 to 14).map(_ << 4) ++ Seq(0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray

  private def encCode(vals: Array[Int], sym: Int, len: Int): (Int, Int) = {
    val ix = vals.indexOf(sym)
    require(ix >= 0, f"symbol $sym%02x not in encoder table")
    (ix, len) // all-one-length canonical: code == position
  }

  /** MSB-first bit writer with 0xFF00 stuffing and 1-padded alignment. */
  private final class JBitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00)
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def align(): Unit = if (cnt > 0) put((1 << (8 - cnt)) - 1, 8 - cnt)
  }

  private def catOf(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a > 0) { s += 1; a >>= 1 }
    s
  }

  /** Encode one quantized block (natural order): DC diff + AC runs. */
  private def encodeBlock(bw: JBitWriter, q: Array[Int], pred: Int): Int = {
    val dc = q(0)
    val diff = dc - pred
    val s = catOf(diff)
    require(s <= 11, s"DC diff $diff out of range")
    val (c, l) = encCode(ENC_DC_VALS, s, 4)
    bw.put(c, l)
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = q(ZIGZAG(k))
      if (v == 0) run += 1
      else {
        while (run > 15) {
          val (zc, zl) = encCode(ENC_AC_VALS, 0xf0, 8)
          bw.put(zc, zl)
          run -= 16
        }
        val sz = catOf(v)
        require(sz <= 10, s"AC value $v out of range")
        val (ac, al) = encCode(ENC_AC_VALS, (run << 4) | sz, 8)
        bw.put(ac, al)
        bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = encCode(ENC_AC_VALS, 0x00, 8); bw.put(ec, el) }
    dc
  }

  /** Write a 3-component 4:2:0 baseline JFIF from QUANTIZED coefficient
    * blocks (natural order): `yQ(bx, by)` over the padded luma block
    * grid (2·mcusX × 2·mcusY), `cbQ/crQ(mx, my)` per MCU. `qLuma` /
    * `qChroma` are the 64-entry quant tables (natural order) declared
    * in DQT — the decoder dequantizes with them, so coefficient `q` at
    * natural position p decodes as `q·table(p)`. `restartInterval > 0`
    * emits DRI + real RSTn markers every that-many MCUs (predictor
    * resets on both sides). */
  def encodeBaseline420(w: Int, h: Int,
      yQ: (Int, Int) => Array[Int],
      cbQ: (Int, Int) => Array[Int],
      crQ: (Int, Int) => Array[Int],
      qLuma: Array[Int], qChroma: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, "bad dims")
    require(qLuma.length == 64 && qChroma.length == 64, "bad quant tables")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    def dqt(tq: Int, tab: Array[Int]): Unit = {
      marker(0xdb); u16(2 + 65); u8(tq)
      var k = 0
      while (k < 64) { u8(tab(ZIGZAG(k))); k += 1 } // stored zigzag
    }
    dqt(0, qLuma); dqt(1, qChroma)
    marker(0xc0); u16(8 + 9) // SOF0: 3 components
    u8(8); u16(h); u16(w); u8(3)
    u8(1); u8(0x22); u8(0) // Y: 2x2, table 0
    u8(2); u8(0x11); u8(1) // Cb: 1x1, table 1
    u8(3); u8(0x11); u8(1) // Cr
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((tc << 4) | th); bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, ENC_DC_BITS, ENC_DC_VALS); dht(1, 0, ENC_AC_BITS, ENC_AC_VALS)
    dht(0, 1, ENC_DC_BITS, ENC_DC_VALS); dht(1, 1, ENC_AC_BITS, ENC_AC_VALS)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(6 + 6) // SOS
    u8(3); u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(63); u8(0)
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    val bw = new JBitWriter(out)
    var predY = 0
    var predCb = 0
    var predCr = 0
    var mcu = 0
    var rst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.align()
        marker(0xd0 + rst)
        rst = (rst + 1) % 8
        predY = 0; predCb = 0; predCr = 0
      }
      for (dy <- 0 to 1; dx <- 0 to 1)
        predY = encodeBlock(bw, yQ(2 * mx + dx, 2 * my + dy), predY)
      predCb = encodeBlock(bw, cbQ(mx, my), predCb)
      predCr = encodeBlock(bw, crQ(mx, my), predCr)
      mcu += 1
    }
    bw.align()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** DC-only block encode (progressive DC scan): category + diff bits,
    * no AC symbols. Returns the new predictor. */
  private def encodeDcOnly(bw: JBitWriter, q: Array[Int], pred: Int): Int = {
    val dc = q(0)
    val diff = dc - pred
    val s = catOf(diff)
    require(s <= 11, s"DC diff $diff out of range")
    val (c, l) = encCode(ENC_DC_VALS, s, 4)
    bw.put(c, l)
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    dc
  }

  /** Write a PROGRESSIVE (SOF2, spectral selection, Al=0) 4:2:0 JFIF
    * from the same quantized coefficient inputs as
    * [[encodeBaseline420]]. Scan script: one interleaved DC scan over
    * the padded MCU grid (so the DC prediction chain — and q229's
    * `dc_sum_q` — covers every block, like baseline), then per-component
    * AC scans over each component's OWN block grid with the luma band
    * SPLIT (1..13 / 14..63 — the generative coefficients at zigzag 10,
    * 14, 39 straddle the split, so reconstruction genuinely needs both
    * scans) and full-band chroma scans whose all-zero bands exercise
    * the EOBn run coding hard (one run spanning every block). With
    * `restartInterval > 0` every scan carries real RSTn markers
    * (per-scan numbering, predictor AND EOB-run resets). Successive
    * approximation is not emitted (Al=0 everywhere — legal progressive);
    * the DECODER's refinement path is exercised by ImageIO's default
    * progressive scan script in the spec. */
  def encodeProgressive420(w: Int, h: Int,
      yQ: (Int, Int) => Array[Int],
      cbQ: (Int, Int) => Array[Int],
      crQ: (Int, Int) => Array[Int],
      qLuma: Array[Int], qChroma: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, "bad dims")
    require(qLuma.length == 64 && qChroma.length == 64, "bad quant tables")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    def dqt(tq: Int, tab: Array[Int]): Unit = {
      marker(0xdb); u16(2 + 65); u8(tq)
      var k = 0
      while (k < 64) { u8(tab(ZIGZAG(k))); k += 1 }
    }
    dqt(0, qLuma); dqt(1, qChroma)
    marker(0xc2); u16(8 + 9) // SOF2: progressive, 3 components
    u8(8); u16(h); u16(w); u8(3)
    u8(1); u8(0x22); u8(0)
    u8(2); u8(0x11); u8(1)
    u8(3); u8(0x11); u8(1)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((tc << 4) | th); bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, ENC_DC_BITS, ENC_DC_VALS); dht(1, 0, ENC_AC_BITS, ENC_AC_VALS)
    dht(0, 1, ENC_DC_BITS, ENC_DC_VALS); dht(1, 1, ENC_AC_BITS, ENC_AC_VALS)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16

    // ---- scan 1: interleaved DC, Ss=0 Se=0 Ah=0 Al=0 ----
    marker(0xda); u16(6 + 6)
    u8(3); u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(0); u8(0)
    locally {
      val bw = new JBitWriter(out)
      var predY = 0
      var predCb = 0
      var predCr = 0
      var mcu = 0
      var rst = 0
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.align()
          marker(0xd0 + rst)
          rst = (rst + 1) % 8
          predY = 0; predCb = 0; predCr = 0
        }
        for (dy <- 0 to 1; dx <- 0 to 1)
          predY = encodeDcOnly(bw, yQ(2 * mx + dx, 2 * my + dy), predY)
        predCb = encodeDcOnly(bw, cbQ(mx, my), predCb)
        predCr = encodeDcOnly(bw, crQ(mx, my), predCr)
        mcu += 1
      }
      bw.align()
    }

    // ---- AC scans: single-component, spectral bands, EOBn runs ----
    def acScan(compId: Int, tabSel: Int, nbx: Int, nby: Int,
        blockOf: (Int, Int) => Array[Int], ss: Int, se: Int): Unit = {
      marker(0xda); u16(6 + 2)
      u8(1); u8(compId); u8(tabSel)
      u8(ss); u8(se); u8(0) // Ah=0, Al=0: spectral selection only
      val bw = new JBitWriter(out)
      var eobrun = 0
      var rst = 0
      var unit = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var n = 0
        while ((2 << n) <= eobrun) n += 1 // n = floor(log2(eobrun))
        val (c, l) = encCode(ENC_AC_VALS, n << 4, 8)
        bw.put(c, l)
        if (n > 0) bw.put(eobrun - (1 << n), n)
        eobrun = 0
      }
      for (by <- 0 until nby; bx <- 0 until nbx) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          flushEob()
          bw.align()
          marker(0xd0 + rst)
          rst = (rst + 1) % 8
        }
        val q = blockOf(bx, by)
        if ((ss to se).forall(k => q(ZIGZAG(k)) == 0)) {
          eobrun += 1
          if (eobrun == 0x7fff) flushEob() // EOB14 ceiling
        } else {
          flushEob()
          var run = 0
          for (k <- ss to se) {
            val v = q(ZIGZAG(k))
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = encCode(ENC_AC_VALS, 0xf0, 8)
                bw.put(zc, zl)
                run -= 16
              }
              val sz = catOf(v)
              require(sz <= 10, s"AC value $v out of range")
              val (ac, al2) = encCode(ENC_AC_VALS, (run << 4) | sz, 8)
              bw.put(ac, al2)
              bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
              run = 0
            }
          }
          if (run > 0) eobrun = 1 // trailing zeros open an EOB run
        }
        unit += 1
      }
      flushEob()
      bw.align()
    }
    val lumaNbx = (w + 7) / 8
    val lumaNby = (h + 7) / 8
    val chromaNbx = ((w + 1) / 2 + 7) / 8
    val chromaNby = ((h + 1) / 2 + 7) / 8
    acScan(1, 0x00, lumaNbx, lumaNby, yQ, 1, 13)   // luma low band
    acScan(1, 0x00, lumaNbx, lumaNby, yQ, 14, 63)  // luma high band
    acScan(2, 0x01, chromaNbx, chromaNby, cbQ, 1, 63)
    acScan(3, 0x01, chromaNbx, chromaNby, crQ, 1, 63)
    marker(0xd9)
    out.toByteArray
  }
}
