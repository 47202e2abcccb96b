package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.TextFns

/** Multimodal-column surface (brief north star): image/audio/video payloads
  * as **opaque `binary` columns with typed metadata**, plus the two
  * processing paths a 100 TB media pipeline needs:
  *
  *  1. an expression path (codegen'd) for byte-level metadata/statistics —
  *     digests, sizes, byte probes — that never leaves Tungsten;
  *  2. a typed batch-decode path ([[decodeFeatures]]) — the Scala analog of
  *     PySpark's `mapInPandas` decode UDF: per-partition batched rows in,
  *     feature rows out, schema declared up front.
  *
  * Image decode is REAL for two dependency-free wire formats — PPM/P6
  * ([[PpmCodec]]: ASCII header, top-down RGB) and 24-bit BMP
  * ([[BmpCodec]]: little-endian binary headers, bottom-up BGR, padded
  * rows): q178/q179/q203 round-trip actual encoded bytes through actual
  * parsers and a real nearest-neighbour resample, oracle-verified
  * pixel-for-pixel; [[decodeImage]] sniffs the format by magic bytes and
  * q204 gates the mixed-format corpus through one format-independent
  * oracle. Codec-LIBRARY formats (JPEG/ffmpeg — not in this container)
  * would be one more codec object behind the same sniff dispatch.
  *
  * The media table derives from `documents` (payload = UTF-8 bytes of the
  * text, a pure function of driver testdata), so the DuckDB oracle can
  * verify the byte-level expression path exactly: for ASCII payloads,
  * byte k == ascii(char k).
  */
object Multimodal {

  final case class MediaRecord(
    media_id: Long, kind: String, payload: Array[Byte], width: Int, height: Int)

  final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** The media table: opaque payload + typed metadata (kind/width/height),
    * all derived deterministically from `documents`. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"))

  /** Byte k (1-based) of a binary column as a long, via the hex round-trip —
    * stays an expression (no UDF), works on any binary. An empty payload
    * yields 0 (matching the oracle's ascii('') convention), not NULL. */
  def byteAt(payload: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    coalesce(conv(hex(payload.substr(lit(k), lit(1))), 16, 10).cast("long"), lit(0L))

  /** Rolling checksum of the first `n` bytes: fold acc = (acc*31 + byte)
    * mod P over the hex representation, two hex chars per byte. Identical
    * integer sequence to the oracle's fold over ascii(char). Guarded for
    * the empty payload: `sequence(0, -1)` is a *descending* sequence in
    * Spark (not an empty array), which would feed the fold garbage — an
    * empty payload returns the seed, as the oracle's range(0,0) fold does. */
  def byteChecksum(payload: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    when(length(payload) === 0, lit(7L)).otherwise(
      aggregate(
        transform(sequence(lit(0), least(length(payload), lit(n)) - 1),
          i => conv(substring_expr(hex(payload), i * 2 + 1, 2), 16, 10).cast("long")),
        lit(7L),
        (acc, b) => (acc * 31L + b) % TextFns.P))

  private def substring_expr(c: org.apache.spark.sql.Column,
                             pos: org.apache.spark.sql.Column,
                             len: Int): org.apache.spark.sql.Column =
    c.substr(pos, lit(len))

  /** Expression-path feature query: per-media byte-level metadata. Map-only,
    * fully codegen'd — the shape of a metadata-extraction pass over 100 TB
    * of media files. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("media_id"), col("kind"), col("width"), col("height"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        byteAt(col("payload"), 1).as("first_byte"),
        byteChecksum(col("payload"), 32).as("checksum"))
      .orderBy("media_id")

  /** Generic image decode: sniff the wire format by magic bytes and
    * parse with the matching REAL codec — "P6" → [[PpmCodec]], "BM" →
    * [[BmpCodec]]. Both land in the shared top-down-RGB
    * [[PpmCodec.PpmImage]], so every downstream resize/feature/stat
    * operator is format-independent. A new format is one more codec
    * object and one more magic arm — the interface the retired
    * byte-statistics stub used to stand behind, now with two real
    * parsers behind it (q204 gates the sniffing path end-to-end). */
  def decodeImage(payload: Array[Byte]): PpmCodec.PpmImage = {
    require(payload.length >= 2, "payload too short to sniff")
    ((payload(0) & 0xff).toChar, (payload(1) & 0xff).toChar) match {
      case ('P', '6') => PpmCodec.decode(payload)
      case ('B', 'M') => BmpCodec.decode(payload)
      case ('\u0089', 'P') => PngCodec.decode(payload)
      case ('\u00ff', '\u00d8') => JpegCodec.decode(payload)
      case ('G', 'I') => GifCodec.decode(payload)
      case (a, b) =>
        throw new IllegalArgumentException(f"unknown image format ${a.toInt}%02x ${b.toInt}%02x")
    }
  }

  /** The real-wire image corpus: every document becomes an ENCODED image
    * file — doc_id mod 3 picks PPM, BMP, or PNG — of the q178 synthetic
    * raster. The payload is genuine wire bytes (headers, padding,
    * channel order, and for PNG real DEFLATE compression at a
    * doc-varying level, so stored/fixed/dynamic blocks all appear in the
    * corpus), so the typed decode path below exercises real parsing per
    * row, and the mixed formats force the sniffing dispatch on every
    * partition. */
  def imageDataset(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val img = synthImage(id, nc)
        val (kind, wire) = (id % 3) match {
          case 0 => ("ppm", PpmCodec.encode(img))
          case 1 => ("bmp", BmpCodec.encode(img))
          case _ => ("png", PngCodec.encode(img, level = (id % 10).toInt))
        }
        MediaRecord(id, kind, wire, img.width, img.height)
      })
  }

  /** Typed batch-decode path — the `mapInPandas` analog: iterate each
    * partition's rows (the batch), run the REAL decoder, emit typed
    * features (dims + per-channel means from the decoded raster).
    * Partitioning is preserved (narrow op, no shuffle); at scale this is
    * the one stage that wants GPU/codec-sized partitions, controlled by
    * `spark.sql.files.maxPartitionBytes` at the scan. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val img = decodeImage(m.payload)
      val s = statsOf(m.media_id, img)
      val n = (img.width * img.height).toDouble
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
        Array(img.width.toFloat, img.height.toFloat,
          (s.sum_r / n).toFloat, (s.sum_g / n).toFloat, (s.sum_b / n).toFloat))
    })
  }

  /** mediaTable as the typed Dataset the byte-level paths consume. */
  def mediaDataset(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
  }

  /** Resize pass: every image decoded (sniffed format), resampled on the
    * REAL pixel grid ([[PpmCodec.resizeNearest]]), and re-encoded in its
    * own format — map-only (narrow, no shuffle), the shape of a
    * thumbnail/normalization stage over 100 TB of images. */
  def resizeAll(media: Dataset[MediaRecord], dstW: Int, dstH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val rz = PpmCodec.resizeNearest(decodeImage(m.payload), dstW, dstH)
      val wire = (m.payload(0) & 0xff).toChar match {
        case 'B' => BmpCodec.encode(rz)
        case '\u0089' => PngCodec.encode(rz)
        case _ => PpmCodec.encode(rz)
      }
      MediaRecord(m.media_id, m.kind, wire, dstW, dstH)
    })
  }

  // ======== REAL image decode path (PPM/P6 — no codec library needed) ====

  /** Deterministic synthetic raster: dims from n_chars, channel byte p =
    * (doc_id·31 + p·7) mod 256 — pure integers, so the DuckDB oracle can
    * regenerate the EXPECTED pixels without parsing anything, while the
    * Spark side only reaches them through a real [[PpmCodec.encode]] →
    * bytes → [[PpmCodec.decode]] round trip. */
  def synthImage(docId: Long, nChars: Long): PpmCodec.PpmImage = {
    val w = (nChars % 16 + 1).toInt
    val h = (nChars % 12 + 1).toInt
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < rgb.length) {
      rgb(p) = ((docId * 31L + p.toLong * 7L) % 256L).toByte
      p += 1
    }
    PpmCodec.PpmImage(w, h, 255, rgb)
  }

  final case class ImageStats(media_id: Long, width: Long, height: Long,
    n_bytes: Long, sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)

  private def statsOf(id: Long, img: PpmCodec.PpmImage): ImageStats = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var acc = 7L
    var i = 0
    while (i < img.rgb.length) {
      val v = (img.rgb(i) & 0xff).toLong
      (i % 3: @annotation.switch) match {
        case 0 => sr += v
        case 1 => sg += v
        case 2 => sb += v
      }
      acc = (acc * 31L + v) % TextFns.P
      i += 1
    }
    ImageStats(id, img.width.toLong, img.height.toLong, img.rgb.length.toLong,
      sr, sg, sb, acc)
  }

  /** q178: REAL image decode — every document becomes a P6 PPM payload
    * (header + comment + raw raster), which is then parsed back by the
    * real [[PpmCodec.decode]] and aggregated into per-image channel sums
    * and a raster checksum. The oracle recomputes the stats from the
    * generative formula: a parser bug of any kind shifts bytes and breaks
    * the hash. Map-only (narrow), the decode stage shape of a 100 TB
    * image pipeline — per-partition batches, no shuffle until after
    * feature extraction. */
  def imageDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val wire = PpmCodec.encode(synthImage(id, nc)) // real bytes
        statsOf(id, PpmCodec.decode(wire))             // real parse
      }).toDF().orderBy("media_id")
  }

  /** q179 target dims — fixed thumbnail geometry. */
  val THUMB_W = 8
  val THUMB_H = 6

  /** q179: decode + REAL nearest-neighbour resize to [[THUMB_W]]×[[THUMB_H]]
    * on the decoded pixel grid, then the same channel-sum/checksum
    * statistics over the resampled raster. The oracle replays the exact
    * source-index arithmetic (x·srcW div dstW), so the resample kernel is
    * verified pixel-for-pixel, not just shape-checked. */
  def imageResizeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val img = PpmCodec.decode(PpmCodec.encode(synthImage(id, nc)))
        statsOf(id, PpmCodec.resizeNearest(img, THUMB_W, THUMB_H))
      }).toDF().orderBy("media_id")
  }

  /** q203's generative raster — same construction as [[synthImage]] with
    * different dims and byte formula, so the BMP gate's cells cannot
    * coincide with the PPM gate's. */
  def synthImageB(docId: Long, nChars: Long): PpmCodec.PpmImage = {
    val w = (nChars % 14 + 1).toInt
    val h = (nChars % 10 + 1).toInt
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < rgb.length) {
      rgb(p) = ((docId * 37L + p.toLong * 11L) % 256L).toByte
      p += 1
    }
    PpmCodec.PpmImage(w, h, 255, rgb)
  }

  final case class BmpStats(media_id: Long, width: Long, height: Long,
    n_wire_bytes: Long, first_px_byte: Long, sum_r: Long, sum_g: Long,
    sum_b: Long, checksum: Long)

  /** q203: REAL BMP decode — every document becomes an actual 24-bit BMP
    * file ([[BmpCodec.encode]] of the [[synthImageB]] raster), parsed
    * back by the real [[BmpCodec.decode]] and aggregated into channel
    * sums + raster checksum. Two cells pin the WIRE itself, so a
    * symmetric encode/decode bug cannot cancel: `n_wire_bytes` is the
    * encoded file length (54-byte headers + 4-byte-padded rows — the
    * padding arithmetic) and `first_px_byte` is the byte AT the pixel
    *-data offset, which for a bottom-up BGR file must equal the BLUE
    * channel of the BOTTOM-LEFT pixel — row order and channel order on
    * the wire, verified against the generative formula. Map-only
    * (narrow), the decode-stage shape of a 100 TB image pipeline. */
  def bmpDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val wire = BmpCodec.encode(synthImageB(id, nc)) // real bytes
        val s = statsOf(id, BmpCodec.decode(wire))      // real parse
        BmpStats(id, s.width, s.height, wire.length.toLong,
          (wire(54) & 0xff).toLong, s.sum_r, s.sum_g, s.sum_b, s.checksum)
      }).toDF().orderBy("media_id")
  }

  /** q218's generative raster — the q178/q203 device with its own
    * constants so a PNG-path bug cannot hide behind a green PPM/BMP
    * gate: dims n%13+1 × n%11+1, byte p = (doc_id·41 + p·13) mod 256. */
  def synthImageC(docId: Long, nChars: Long): PpmCodec.PpmImage = {
    val w = (nChars % 13 + 1).toInt
    val h = (nChars % 11 + 1).toInt
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < rgb.length) {
      rgb(p) = ((docId * 41L + p.toLong * 13L) % 256L).toByte
      p += 1
    }
    PpmCodec.PpmImage(w, h, 255, rgb)
  }

  final case class PngStats(media_id: Long, width: Long, height: Long,
    filter_sum: Long, sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)

  /** q218: REAL compressed-format decode — every document becomes an
    * actual PNG file ([[PngCodec.encode]] of the [[synthImageC]] raster:
    * zlib-wrapped DEFLATE at a doc-varying compression level, so level-0
    * stored blocks and Huffman-coded blocks both appear in every corpus;
    * multi-IDAT; row filters cycling y mod 5), parsed back by the
    * hand-rolled [[PngCodec.decode]] (chunk walk + CRC, zlib + Adler,
    * RFC 1951 inflate, all five unfilters) and aggregated into channel
    * sums + raster checksum. The oracle regenerates the expected pixels
    * ARITHMETICALLY — Spark can only reach them through the inflate — and
    * additionally pins `filter_sum`, the sum of the per-row filter-type
    * bytes recovered from the compressed scanlines (= Σ y mod 5), which
    * is a structural proof that every row was routed through the filter
    * dispatch rather than decoded by luck on filter-0 rows. Every
    * doc_id % 4 == 0 image is written as a PALETTE (type 3) PNG instead
    * of truecolor (synthImageC rasters have ≤ 143 distinct colors, so
    * they always palettize), putting the PLTE-lookup decode arm under
    * the SAME format-independent oracle — a wrong palette index or
    * triple order lands garbage in the checksums. Map-only (narrow),
    * the decode-stage shape of a 100 TB image pipeline. */
  def pngDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val img0 = synthImageC(id, nc)
        val wire = if (id % 4 == 0)
          PngCodec.encodeIndexed(img0, level = (id % 10).toInt)
        else PngCodec.encode(img0, level = (id % 10).toInt) // real bytes
        val (img, filters) = PngCodec.decodeWithFilters(wire) // real parse
        val s = statsOf(id, img)
        PngStats(id, s.width, s.height,
          filters.map(_.toLong).sum, s.sum_r, s.sum_g, s.sum_b, s.checksum)
      }).toDF().orderBy("media_id")
  }

  /** q228's generative corpus — the q218 device adapted to a LOSSY
    * format by constructing the QUANTIZED COEFFICIENTS instead of the
    * pixels: per luma block (bi = by·64 + bx over the PADDED 4:2:0
    * block grid) only the four exactly-rational DCT positions are
    * populated —
    *   q00 = (doc·17 + bi·5) mod 97 − 48   at (0,0)
    *   q40 = (doc·7  + bi·3) mod 17 − 8    at (4,0)   natural index 4
    *   q04 = (doc·11 + bi)   mod 15 − 7    at (0,4)   natural index 32
    *   q44 = (doc·5  + bi·9) mod 13 − 6    at (4,4)   natural index 36
    * — and chroma is DC-only per MCU (mi = my·64 + mx):
    *   cb  = (doc·13 + mi·7)  mod 81 − 40
    *   cr  = (doc·19 + mi·11) mod 81 − 40.
    * With all-8 quant tables each term contributes exactly F/8 = q, so
    * the decoded luma pixel is the INTEGER 128 + q00 + sx·q40 + sy·q04
    * + sx·sy·q44 (sx = +1 iff x mod 4 ∈ {0,3}) and chroma replicates
    * per MCU — fully replayable by the DuckDB twin, while Spark reaches
    * it only through the real Huffman entropy decode. Every doc with
    * doc_id mod 3 == 0 also gets a DRI of 2 MCUs, putting real RSTn
    * markers (byte alignment + predictor resets) in the graded path. */
  def synthJpeg(docId: Long, nChars: Long): Array[Byte] = {
    val w = (nChars % 23 + 4).toInt
    val h = (nChars % 19 + 4).toInt
    val q8 = Array.fill(64)(8)
    def luma(bx: Int, by: Int): Array[Int] = {
      val bi = by * 64L + bx
      val c = new Array[Int](64)
      c(0) = (((docId * 17 + bi * 5) % 97) - 48).toInt
      c(4) = (((docId * 7 + bi * 3) % 17) - 8).toInt
      c(32) = (((docId * 11 + bi) % 15) - 7).toInt
      c(36) = (((docId * 5 + bi * 9) % 13) - 6).toInt
      c
    }
    def cb(mx: Int, my: Int): Array[Int] = {
      val mi = my * 64L + mx
      val c = new Array[Int](64)
      c(0) = (((docId * 13 + mi * 7) % 81) - 40).toInt
      c
    }
    def cr(mx: Int, my: Int): Array[Int] = {
      val mi = my * 64L + mx
      val c = new Array[Int](64)
      c(0) = (((docId * 19 + mi * 11) % 81) - 40).toInt
      c
    }
    JpegCodec.encodeBaseline420(w, h, luma, cb, cr, q8, q8,
      restartInterval = if (docId % 3 == 0) 2 else 0)
  }

  final case class JpegStats(media_id: Long, width: Long, height: Long,
    dc_sum_q: Long, sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)

  /** q228: REAL baseline-JPEG decode — every document becomes an actual
    * JFIF file ([[synthJpeg]]: marker segments, custom DHT tables, real
    * entropy coding with byte stuffing, RSTn on a third of the corpus),
    * parsed back by the hand-rolled [[JpegCodec.decode]] (marker walk,
    * canonical Huffman build, entropy decode with DC prediction,
    * dequant, IDCT, 4:2:0 replication upsample, integer YCbCr→RGB) and
    * aggregated into channel sums + raster checksum. The oracle
    * regenerates the pixels arithmetically from the coefficient
    * formulas; `dc_sum_q` — the sum of decoded QUANTIZED DC values
    * across the padded luma block grid, accumulated inside the entropy
    * decoder — is a structural proof the DC prediction chain walked
    * every MCU (padding blocks included). Map-only (narrow), the
    * decode-stage shape of a 100 TB image pipeline. */
  def jpegDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val wire = synthJpeg(id, nc)                      // real bytes
        val (img, dcSum) = JpegCodec.decodeWithDcSum(wire) // real parse
        val s = statsOf(id, img)
        JpegStats(id, s.width, s.height, dcSum,
          s.sum_r, s.sum_g, s.sum_b, s.checksum)
      }).toDF().orderBy("media_id")
  }

  /** q229's generative corpus — the q228 coefficient-space device over
    * a PROGRESSIVE (SOF2) wire: its own constants (a parallel-gate bug
    * in either path cannot hide behind the other), dims n%21+4 × n%17+4,
    * luma q00/q40/q04/q44 = (doc·23+bi·7)%97−48, (doc·3+bi·5)%17−8,
    * (doc·29+bi·3)%15−7, (doc·31+bi)%13−6; chroma DC
    * (doc·37+mi·5)%81−40 / (doc·43+mi·3)%81−40. The wire is a real
    * multi-scan progressive file: interleaved DC scan, luma AC split
    * across TWO spectral bands (the nonzero zigzag positions 10/14/39
    * straddle the 13|14 split, so reconstruction needs both scans),
    * all-zero chroma AC bands that ride a single EOBn run each, and
    * RSTn restarts in every scan for a fifth of the corpus. Final
    * coefficients equal a baseline encode of the same blocks, so the
    * SAME exact-integer oracle applies — Spark just has to reach it
    * through the progressive scan machinery. */
  def synthJpegProgressive(docId: Long, nChars: Long): Array[Byte] = {
    val w = (nChars % 21 + 4).toInt
    val h = (nChars % 17 + 4).toInt
    val q8 = Array.fill(64)(8)
    def luma(bx: Int, by: Int): Array[Int] = {
      val bi = by * 64L + bx
      val c = new Array[Int](64)
      c(0) = (((docId * 23 + bi * 7) % 97) - 48).toInt
      c(4) = (((docId * 3 + bi * 5) % 17) - 8).toInt
      c(32) = (((docId * 29 + bi * 3) % 15) - 7).toInt
      c(36) = (((docId * 31 + bi) % 13) - 6).toInt
      c
    }
    def cb(mx: Int, my: Int): Array[Int] = {
      val mi = my * 64L + mx
      val c = new Array[Int](64)
      c(0) = (((docId * 37 + mi * 5) % 81) - 40).toInt
      c
    }
    def cr(mx: Int, my: Int): Array[Int] = {
      val mi = my * 64L + mx
      val c = new Array[Int](64)
      c(0) = (((docId * 43 + mi * 3) % 81) - 40).toInt
      c
    }
    JpegCodec.encodeProgressive420(w, h, luma, cb, cr, q8, q8,
      restartInterval = if (docId % 5 == 0) 3 else 0)
  }

  /** q229: PROGRESSIVE-JPEG decode oracle-gated — the q228 gate with the
    * wire swapped for a real SOF2 multi-scan file (spectral selection,
    * EOBn runs, per-scan restarts). The decoder must accumulate
    * coefficients across five scans before reconstruction; a lost AC
    * band, a broken EOB run, a DC scan that missed padding blocks, or
    * wrong per-scan restart numbering all flip hashed cells. Successive
    * approximation (which this corpus does not emit — Al=0 spectral
    * selection is legal progressive) is exercised by MultimodalSpec
    * against ImageIO's default scan script. */
  def jpegProgressiveStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val wire = synthJpegProgressive(id, nc)                // real bytes
        val (img, dcSum) = JpegCodec.decodeWithDcSum(wire)     // real parse
        val s = statsOf(id, img)
        JpegStats(id, s.width, s.height, dcSum,
          s.sum_r, s.sum_g, s.sum_b, s.checksum)
      }).toDF().orderBy("media_id")
  }

  /** q232's generative corpus: INDEXED-color images — palette entry j
    * and the index plane are both integer formulas (palette r/g/b =
    * (doc·3+j·5, doc·5+j·11, doc·7+j·13) mod 256; index of pixel p =
    * (doc·29 + p·17) mod 2^bpp with bpp = doc%7+2, so every palette
    * depth 4..256 colors occurs), a fifth of the corpus interlaced
    * (the 4-pass row order must be undone) and a third written as
    * GIF89a with an extension block (the sub-block walk must skip it).
    * The oracle composes the two formulas; Spark can only reach the
    * pixels through the real LZW decode. */
  def synthGif(docId: Long, nChars: Long): Array[Byte] = {
    val w = (nChars % 19 + 3).toInt
    val h = (nChars % 13 + 3).toInt
    val psize = 1 << (docId % 7 + 2).toInt
    val pal = Array.tabulate(psize) { j =>
      val r = ((docId * 3 + j * 5) % 256).toInt
      val g = ((docId * 5 + j * 11) % 256).toInt
      val b = ((docId * 7 + j * 13) % 256).toInt
      (r << 16) | (g << 8) | b
    }
    val idx = Array.tabulate(w * h)(pp =>
      ((docId * 29 + pp * 17) % psize).toByte)
    GifCodec.encode(w, h, pal, idx,
      interlace = docId % 5 == 0, gce = docId % 3 == 0)
  }

  final case class GifStats(media_id: Long, width: Long, height: Long,
    palette_size: Long, sum_r: Long, sum_g: Long, sum_b: Long,
    checksum: Long)

  /** q232: REAL GIF decode — every document becomes an actual GIF87a/89a
    * file ([[synthGif]]) parsed back by the hand-rolled
    * [[GifCodec.decode]] (container grammar, extension skip, LZW with
    * width growth and interlace) and aggregated into channel sums + the
    * raster checksum. `palette_size` comes from the parsed color table.
    * Map-only (narrow), like the rest of the decode family. */
  def gifDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val (img, psize) = GifCodec.decodeWithPalette(synthGif(id, nc))
        val s = statsOf(id, img)
        GifStats(id, s.width, s.height, psize.toLong,
          s.sum_r, s.sum_g, s.sum_b, s.checksum)
      }).toDF().orderBy("media_id")
  }

  final case class MixedStats(media_id: Long, fmt: String, width: Long,
    height: Long, n_bytes: Long, sum_r: Long, sum_g: Long, sum_b: Long,
    checksum: Long)

  /** q204: the generic decode path end-to-end — the mixed PPM/BMP wire
    * corpus ([[imageDataset]]) decoded via magic-byte sniffing
    * ([[decodeImage]]), resampled to [[THUMB_W]]×[[THUMB_H]] on the real
    * pixel grid, and aggregated with q179's statistics. The oracle is
    * format-INDEPENDENT (the generative raster + resize arithmetic), so
    * both parsers must recover the identical raster from their very
    * different wire layouts — a BGR swap, a row-order flip, a padding
    * slip, or a wrong sniff arm all land format-specific garbage in the
    * checksums. Two narrow map stages (encode corpus → decode+resize),
    * zero shuffles before the final sort. */
  def mixedDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageDataset(spark, dir)
      .mapPartitions(_.map { m =>
        val rz = PpmCodec.resizeNearest(decodeImage(m.payload), THUMB_W, THUMB_H)
        val s = statsOf(m.media_id, rz)
        MixedStats(m.media_id, m.kind, s.width, s.height, s.n_bytes,
          s.sum_r, s.sum_g, s.sum_b, s.checksum)
      }).toDF().orderBy("media_id")
  }

  // ======== REAL audio decode path (RIFF/WAVE PCM — no codec library) ====

  /** Deterministic synthetic signal: length and clock from the document
    * metadata, sample i = (doc_id·31 + i·17) mod 4096 − 2048 — pure
    * integers in [−2048, 2047], so the DuckDB oracle regenerates the
    * EXPECTED samples arithmetically while the Spark side only reaches
    * them through a real [[WavCodec.encode]] → bytes → [[WavCodec.decode]]
    * round trip (RIFF walk, chunk skip, pad byte, endianness). */
  def synthAudio(docId: Long, nChars: Long): WavCodec.WavAudio = {
    val n = (nChars % 96 + 16).toInt
    val sr = (8000 + (docId % 4) * 4000).toInt
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      s(i) = (((docId * 31L + i.toLong * 17L) % 4096L) - 2048L).toShort
      i += 1
    }
    WavCodec.WavAudio(sr, s)
  }

  final case class AudioStats(media_id: Long, sample_rate: Long,
    n_samples: Long, sum_abs: Long, peak: Long, zero_crossings: Long,
    energy: Long, checksum: Long)

  private def audioStatsOf(id: Long, a: WavCodec.WavAudio): AudioStats = {
    var (sumAbs, peak, zc, energy) = (0L, 0L, 0L, 0L)
    var acc = 7L
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i).toLong
      val abs = math.abs(s)
      sumAbs += abs
      if (abs > peak) peak = abs
      if (i > 0 && (a.samples(i - 1) < 0) != (s < 0)) zc += 1
      energy += s * s
      acc = (acc * 31L + (s & 0xffffL)) % TextFns.P
      i += 1
    }
    AudioStats(id, a.sampleRate.toLong, a.samples.length.toLong,
      sumAbs, peak, zc, energy, acc)
  }

  /** q183: REAL audio decode — every document becomes a RIFF/WAVE payload
    * (envelope + fmt + odd-padded unknown chunk + PCM data), parsed back
    * by the real [[WavCodec.decode]] and aggregated into waveform
    * statistics (sum |s|, peak, zero crossings, Σs², sample checksum).
    * Map-only (narrow) — the decode-stage shape of an audio pipeline at
    * 100 TB: per-partition batches, no shuffle until after feature
    * extraction. The oracle recomputes every statistic from the
    * generative formula, so the parser is what the hash gates. */
  def audioDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val wire = WavCodec.encode(synthAudio(id, nc)) // real bytes
        audioStatsOf(id, WavCodec.decode(wire))        // real parse
      }).toDF().orderBy("media_id")
  }

  /** q184 decimation factor — 4× drop-sample downsample. */
  val AUDIO_DEC = 4

  /** q184: decode + REAL drop-sample resample (keep every
    * [[AUDIO_DEC]]-th sample, divide the clock), then the same waveform
    * statistics over the decimated signal. The oracle replays the exact
    * keep-index arithmetic (j·DEC), pinning the resampler
    * sample-for-sample — the audio analog of q179's pixel-grid pin. */
  def audioResampleStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val a = WavCodec.decode(WavCodec.encode(synthAudio(id, nc)))
        audioStatsOf(id, WavCodec.decimate(a, AUDIO_DEC))
      }).toDF().orderBy("media_id")
  }

  /** q190 frame geometry: 16-sample non-overlapping analysis frames
    * (trailing partial frame dropped, like the video path). */
  val AUDIO_FRAME_N = 16

  /** q190: frame-level audio features — the STFT-shaped fan-out of every
    * audio pipeline (VAD, silence trimming, diarization all start here).
    * Each decoded waveform (REAL wire round trip, as q183) is sliced into
    * [[AUDIO_FRAME_N]]-sample frames; per frame: energy Σs², within-frame
    * zero crossings, and a low-energy flag `energy·n_frames < Σ energies`
    * (strictly below the file mean — an exact integer compare, no
    * division crosses the engine boundary). The whole file is one row, so
    * the flag is computed locally in the same map — the fan-out is still
    * narrow: zero shuffles in the entire plan. */
  def audioFrameStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.flatMap { case (id, nc) =>
        val a = WavCodec.decode(WavCodec.encode(synthAudio(id, nc)))
        val nf = a.samples.length / AUDIO_FRAME_N
        val feats = (0 until nf).map { j =>
          var (energy, zc) = (0L, 0L)
          var k = 0
          while (k < AUDIO_FRAME_N) {
            val s = a.samples(j * AUDIO_FRAME_N + k).toLong
            energy += s * s
            if (k > 0 &&
              (a.samples(j * AUDIO_FRAME_N + k - 1) < 0) != (s < 0)) zc += 1
            k += 1
          }
          (j.toLong, energy, zc)
        }
        val total = feats.map(_._2).sum
        feats.map { case (j, e, z) =>
          (id, j, e, z, e * nf < total)
        }
      }).toDF("media_id", "frame_no", "energy", "zero_crossings", "is_low")
      .orderBy("media_id", "frame_no")
  }

  // ======== Perceptual image hashing (dHash) over the REAL decode path ====

  /** dHash thumbnail geometry: 9×7 → 8 horizontal comparisons × 7 rows =
    * 56 bits, safely inside a signed long (no sign-bit ambiguity between
    * engines). */
  val DHASH_W = 9
  val DHASH_H = 7

  /** Integer luma (ITU-R 601 weights ×1000, floor division — no floats,
    * so the oracle replays it exactly) of pixel (x,y). */
  private def grayAt(img: PpmCodec.PpmImage, x: Int, y: Int): Int = {
    val p = 3 * (y * img.width + x)
    (299 * (img.rgb(p) & 0xff) + 587 * (img.rgb(p + 1) & 0xff) +
      114 * (img.rgb(p + 2) & 0xff)) / 1000
  }

  /** Difference hash: resize (the REAL nearest-neighbour kernel, shared
    * with q179) to [[DHASH_W]]×[[DHASH_H]], integer grayscale, bit
    * `y·8+x` = gray(x,y) > gray(x+1,y). The standard perceptual
    * fingerprint of image-dedup pipelines (LAION-style): content-derived,
    * robust to re-encoding and (approximately) to rescaling. */
  def dHash(img: PpmCodec.PpmImage): Long = {
    val t = PpmCodec.resizeNearest(img, DHASH_W, DHASH_H)
    var bits = 0L
    var y = 0
    while (y < DHASH_H) {
      var x = 0
      while (x < DHASH_W - 1) {
        if (grayAt(t, x, y) > grayAt(t, x + 1, y))
          bits |= 1L << (y * (DHASH_W - 1) + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Per-image dHash pairs (original + a half-scale rescale), computed
    * through the full real pipeline: encode → parse → resize → hash.
    * Map-only (narrow) — the fingerprint stage of an image-dedup pass. */
  private def dhashDataset(spark: SparkSession, dir: String)
      : Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val img = PpmCodec.decode(PpmCodec.encode(synthImage(id, nc)))
        val half = PpmCodec.resizeNearest(img,
          math.max(img.width / 2, 1), math.max(img.height / 2, 1))
        (id, dHash(img), dHash(half))
      })
  }

  /** q186: perceptual fingerprints + the cross-scale robustness read —
    * the hamming distance between each image's dHash and the dHash of its
    * half-scale rescale (what survives a thumbnail re-encode). The oracle
    * regenerates both hashes from the generative pixel formula (resize
    * index arithmetic composed twice for the half-scale leg), so the
    * whole decode→resize→gray→bit-pack kernel is pinned bit-for-bit. */
  def imageDHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dhashDataset(spark, dir)
      .map { case (id, a, b) =>
        (id, a, b, java.lang.Long.bitCount(a ^ b).toLong)
      }.toDF("media_id", "dhash", "dhash_half", "cross_scale_dist")
      .orderBy("media_id")
  }

  /** q187: perceptual dedup GROUPS — images sharing an exact dHash
    * collapse via a plain groupBy (one shuffle of 8-byte keys, map-side
    * combined; never a pair join), the 100 TB-safe first tier of image
    * dedup. Emits only non-singleton groups with their canonical
    * (min media_id) — the keep-list shape shared with q134/q163. */
  def imagePdupGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dhashDataset(spark, dir).toDF("media_id", "dhash", "dhash_half")
      .groupBy("dhash")
      .agg(count(lit(1)).as("n_images"),
        min(col("media_id")).as("canonical"))
      .filter(col("n_images") > 1)
      .select("dhash", "n_images", "canonical")
      .orderBy("dhash")
  }

  /** q188 banding geometry: 4 bands × 14 bits; buckets larger than
    * [[DHASH_BAND_CAP]] are dropped (the LSH df-cap discipline shared
    * with q19/q25 — a degenerate bucket, e.g. the all-zero hash of
    * sub-thumbnail images, would otherwise go quadratic); candidate
    * pairs are verified at hamming ≤ [[DHASH_T]]. */
  val DHASH_BANDS = 4
  val DHASH_BAND_BITS = 14
  val DHASH_BAND_CAP = 16
  val DHASH_T = 4

  /** q188: NEAR-dup image pairs under the banded hamming scheme — band
    * agreement proposes, exact hamming disposes. Pair work is bounded by
    * cap²·buckets, never n²; the verify is a codegen'd `bit_count(a^b)`
    * on two longs. The oracle replays banding, cap, and threshold from
    * the same generative hashes. */
  def imagePdupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialize the banded fingerprints ONCE: the encode→parse→resize
    // decode pass is the expensive stage, and the df gate + both join
    // sides fan out from it — without the checkpoint each branch re-runs
    // the decode over the full corpus (plan-audited: 7 corpus scans)
    val bands = dhashDataset(spark, dir)
      .flatMap { case (id, h, _) =>
        (0 until DHASH_BANDS).map { b =>
          (id, h, b, (h >>> (b * DHASH_BAND_BITS)) & ((1L << DHASH_BAND_BITS) - 1))
        }
      }.toDF("id", "dhash", "band", "bval").localCheckpoint()
    val ok = bands.groupBy("band", "bval").count()
      .filter(col("count").between(2, DHASH_BAND_CAP)).drop("count")
    val b2 = bands.join(ok, Seq("band", "bval"))
    val a = b2.select(col("band"), col("bval"),
      col("id").as("id_a"), col("dhash").as("ha"))
    val b = b2.select(col("band"), col("bval"),
      col("id").as("id_b"), col("dhash").as("hb"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
      .withColumn("dist",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("dist") <= DHASH_T)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
  }

  // ======== Audio perceptual fingerprint (Haitsma–Kalker-shaped) ========

  /** q194 fingerprint geometry: 56 energy-delta sign bits over
    * [[AUDIO_FRAME_N]]-sample frames (bit j = e_{j+1} > e_j — the
    * frame-energy analog of the Haitsma–Kalker sign-of-band-energy-delta
    * audio fingerprint), banded exactly like the image dHash
    * (4×14 bits, df cap, verify threshold). 56 bits keeps the sign bit
    * clear — the cross-engine bit-pack law of q186. */
  val AFP_BITS = 56
  val AFP_BANDS = 4
  val AFP_BAND_BITS = 14
  val AFP_BAND_CAP = 16
  val AFP_T = 2

  /** q194 corpus: longer waveforms than q183 (a 56-bit delta fingerprint
    * needs ≥ 57 frames). The quadratic term matters: a PURELY linear
    * generator makes every sample depend on (doc, i) only through one
    * phase c = 31·doc + 17·i, so frame energies become a smooth function
    * of c, delta-sign bits come in long runs, fingerprints collapse into
    * a handful of values, and the df cap (correctly!) drops the
    * degenerate buckets — 0 candidate pairs. i² decorrelates the wrap
    * points across docs. */
  def synthAudioLong(docId: Long, nChars: Long): WavCodec.WavAudio = {
    val n = (nChars % 256 + 928).toInt
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      val iq = (i.toLong * i.toLong) % 4096L
      s(i) = (((docId * 31L + i.toLong * 17L + iq * 13L) % 4096L) - 2048L)
        .toShort
      i += 1
    }
    WavCodec.WavAudio(16000, s)
  }

  /** 56-bit energy-delta fingerprint of a decoded waveform. */
  def audioFingerprint(a: WavCodec.WavAudio): Long = {
    val nf = a.samples.length / AUDIO_FRAME_N
    val e = new Array[Long](nf)
    var j = 0
    while (j < nf) {
      var (acc, k) = (0L, 0)
      while (k < AUDIO_FRAME_N) {
        val s = a.samples(j * AUDIO_FRAME_N + k).toLong
        acc += s * s
        k += 1
      }
      e(j) = acc
      j += 1
    }
    var bits = 0L
    var b = 0
    while (b < AFP_BITS) {
      if (e(b + 1) > e(b)) bits |= 1L << b
      b += 1
    }
    bits
  }

  /** Fingerprint corpus: every doc's waveform through the REAL wire
    * round trip, plus (a) an exact re-encode copy for doc_id %4==0 —
    * byte-identical PCM, so its fingerprint MUST collide (tier-1 exact
    * dup through the codec, not through arithmetic) — and (b) a
    * "retouched" copy for doc_id %3==0 with frame 1 amplified by +64:
    * only e_1 changes, so at most bits 0 and 1 flip — hamming ≤ 2,
    * confined to band 0, so band agreement always proposes the pair.
    * media_id = doc_id·4 + kind. Map-only (narrow). */
  private def afpDataset(spark: SparkSession, dir: String)
      : Dataset[(Long, Long)] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.flatMap { case (id, nc) =>
        val orig = WavCodec.decode(WavCodec.encode(synthAudioLong(id, nc)))
        val out = scala.collection.mutable.ArrayBuffer(
          (id * 4, audioFingerprint(orig)))
        if (id % 4 == 0)
          out += ((id * 4 + 1,
            audioFingerprint(WavCodec.decode(WavCodec.encode(orig)))))
        if (id % 3 == 0) {
          val r = orig.samples.clone()
          var k = AUDIO_FRAME_N
          while (k < 2 * AUDIO_FRAME_N) { r(k) = (r(k) + 64).toShort; k += 1 }
          out += ((id * 4 + 2, audioFingerprint(WavCodec.decode(
            WavCodec.encode(WavCodec.WavAudio(orig.sampleRate, r))))))
        }
        out
      })
  }

  /** q194: audio NEAR-dup pairs — the banded-hamming scheme of q188
    * applied to the audio fingerprint: band agreement proposes
    * (df-capped, so a degenerate bucket can't go quadratic), codegen'd
    * `bit_count(a^b)` ≤ [[AFP_T]] disposes. The oracle regenerates every
    * fingerprint arithmetically (including the retouched frame) while
    * Spark reaches them only through the real RIFF/WAVE round trip. */
  def audioPdupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one materialized decode pass feeds the gate and both join sides —
    // the WAV round trip must never re-run per branch (the q188 law)
    val bands = afpDataset(spark, dir)
      .flatMap { case (id, h) =>
        (0 until AFP_BANDS).map { b =>
          (id, h, b, (h >>> (b * AFP_BAND_BITS)) & ((1L << AFP_BAND_BITS) - 1))
        }
      }.toDF("id", "fp", "band", "bval").localCheckpoint()
    val ok = bands.groupBy("band", "bval").count()
      .filter(col("count").between(2, AFP_BAND_CAP)).drop("count")
    val b2 = bands.join(ok, Seq("band", "bval"))
    val a = b2.select(col("band"), col("bval"),
      col("id").as("id_a"), col("fp").as("ha"))
    val b = b2.select(col("band"), col("bval"),
      col("id").as("id_b"), col("fp").as("hb"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
      .withColumn("dist",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("dist") <= AFP_T)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
  }

  final case class MediaFrame(
    media_id: Long, frame_no: Long, frame: Array[Byte])

  /** Frame sampling: treat a video payload as consecutive `frameSize`-byte
    * frames and keep every `stride`-th one — one media row fans out to many
    * frame rows (`flatMap`, the row-expansion shape of video pipelines; at
    * scale the expansion factor is why frame extraction runs *before* any
    * shuffle, never after). Trailing partial frames are dropped, matching
    * fixed-size decoder contracts. */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int,
                   stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    require(frameSize >= 1 && stride >= 1)
    media.flatMap { m =>
      val nFrames = m.payload.length / frameSize
      (0 until nFrames by stride).map { f =>
        MediaFrame(m.media_id, f.toLong,
          java.util.Arrays.copyOfRange(m.payload, f * frameSize, (f + 1) * frameSize))
      }
    }
  }

  /** q185 frame geometry: 16-byte frames, every 2nd kept. */
  val FRAME_SIZE = 16
  val FRAME_STRIDE = 2

  /** q185: the frame-sampling fan-out, oracle-gated — the `video` rows of
    * the media table pass through [[sampleFrames]] and each kept frame is
    * reduced to its byte sum + rolling checksum. One media row expands to
    * `len/FRAME_SIZE/FRAME_STRIDE` frame rows BEFORE any shuffle (the
    * row-expansion law of video pipelines); the payloads are the
    * documents' ASCII bytes, so the oracle replays the frame slicing with
    * `substr`/`ascii` arithmetic — byte offsets, trailing-partial-frame
    * drop, and stride are all pinned. */
  def videoFrameStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = sampleFrames(
      mediaDataset(spark, dir).filter(col("kind") === "video"),
      FRAME_SIZE, FRAME_STRIDE)
    frames.map { fr =>
      var (sum, acc) = (0L, 7L)
      var i = 0
      while (i < fr.frame.length) {
        val b = (fr.frame(i) & 0xff).toLong
        sum += b
        acc = (acc * 31L + b) % TextFns.P
        i += 1
      }
      (fr.media_id, fr.frame_no, fr.frame.length.toLong, sum, acc)
    }.toDF("media_id", "frame_no", "n_bytes", "sum_bytes", "checksum")
      .orderBy("media_id", "frame_no")
  }

  // ======== Video perceptual near-dup (frame-fingerprint matching) ========

  /** q196 geometry: videos match when at least [[VID_T_PPM]] ppm of their
    * ALIGNED frame fingerprints agree; a (frame_no, checksum) posting
    * bucket proposes pairs only while it holds ≤ [[VID_CAP]] videos (the
    * same df-cap law as every banded channel — a ubiquitous frame, e.g. a
    * black/intro frame in deployment, must not go quadratic). */
  val VID_CAP = 8
  val VID_T_PPM = 800000L

  /** Per-variant frame fingerprints of the q196 corpus: every `video` row
    * of the media table (kind = video, payload = the doc's bytes) through
    * the [[FRAME_SIZE]]/[[FRAME_STRIDE]] sampling of q185, each kept frame
    * reduced to its rolling checksum — plus (a) an exact copy for
    * media_id %4==0 (all fingerprints equal) and (b) a "re-encoded" copy
    * for media_id %5==0 with ONE byte retouched (+1 at offset
    * 2·FRAME_SIZE, the first byte of kept frame 2), so exactly one kept
    * fingerprint can differ. vid = media_id·4 + variant. Map-only fan-out
    * — frames expand BEFORE any shuffle, the q185 law. */
  /** Kept-frame rolling checksums of one payload (the q185 kernel as a
    * module method — module calls inside closures serialize capture-free). */
  def frameChecksums(payload: Array[Byte], vid: Long)
      : Seq[(Long, Long, Long)] =
    (0 until payload.length / FRAME_SIZE by FRAME_STRIDE).map { f =>
      var acc = 7L
      var i = f * FRAME_SIZE
      while (i < (f + 1) * FRAME_SIZE) {
        acc = (acc * 31L + (payload(i) & 0xff)) % TextFns.P
        i += 1
      }
      (vid, f.toLong, acc)
    }

  private def vidFrames(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    mediaDataset(spark, dir).filter(col("kind") === "video")
      .as[MediaRecord]
      .mapPartitions(_.flatMap { m =>
        val base = frameChecksums(m.payload, m.media_id * 4)
        val cpy = if (m.media_id % 4 == 0)
          frameChecksums(m.payload, m.media_id * 4 + 1) else Nil
        val ret = if (m.media_id % 5 == 0) {
          val p = m.payload.clone()
          if (p.length > 2 * FRAME_SIZE)
            p(2 * FRAME_SIZE) = (p(2 * FRAME_SIZE) + 1).toByte
          frameChecksums(p, m.media_id * 4 + 2)
        } else Nil
        base ++ cpy ++ ret
      }).toDF("vid", "frame_no", "chk")
  }

  /** q196: video near-dup pairs by frame-fingerprint matching — the video
    * leg of the perceptual-dedup triangle (image q188, audio q194): an
    * inverted index on (frame_no, checksum) proposes candidate pairs
    * (df-capped buckets, never all-pairs), and candidates verify by the
    * aligned-frame agreement ratio `n_match·10⁶ div max(n_a, n_b)` in
    * exact integer ppm. The exact-copy plants must verify at 10⁶ ppm; the
    * one-byte retouch at (n−1)/n of its kept frames.
    *
    * Scale shape: frame fan-out is map-only; one (frame_no, chk) shuffle
    * builds the postings; the verify join touches only candidate pairs'
    * frame rows (∝ candidates × frames-per-video, bounded by the bucket
    * cap) — the corpus never self-joins. */
  def videoPdupPairs(spark: SparkSession, dir: String): DataFrame = {
    val fr = vidFrames(spark, dir).localCheckpoint() // postings + verify
    val nf = fr.groupBy("vid").agg(count(lit(1)).as("nf"))
    val ok = fr.groupBy("frame_no", "chk").count()
      .filter(col("count").between(2, VID_CAP)).drop("count")
    val b = fr.join(ok, Seq("frame_no", "chk"))
    val cand = b.select(col("frame_no"), col("chk"), col("vid").as("id_a"))
      .join(b.select(col("frame_no"), col("chk"), col("vid").as("id_b")),
        Seq("frame_no", "chk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val matches = cand
      .join(fr.select(col("vid").as("id_a"), col("frame_no"),
        col("chk").as("ca")), Seq("id_a"))
      .join(fr.select(col("vid").as("id_b"), col("frame_no"),
        col("chk").as("cb")), Seq("id_b", "frame_no"))
      .filter(col("ca") === col("cb"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_match"))
    matches
      .join(nf.select(col("vid").as("id_a"), col("nf").as("na")), Seq("id_a"))
      .join(nf.select(col("vid").as("id_b"), col("nf").as("nb")), Seq("id_b"))
      .withColumn("match_ppm",
        expr("n_match * 1000000L div greatest(na, nb)"))
      .filter(col("match_ppm") >= VID_T_PPM)
      .select(col("id_a"), col("id_b"), col("n_match"),
        greatest(col("na"), col("nb")).as("n_frames"), col("match_ppm"))
      .orderBy("id_a", "id_b")
  }

  // ------------------------------- WebDataset-style tar shards (r14)

  /** Docs per tar shard key — WebDataset sizes shards to hundreds of
    * MB; the demo keys on doc_id so the twin can restate membership. */
  val TAR_SHARD_MOD: Long = 64L

  /** The sample KEY of a document (WebDataset convention: the member
    * path minus its extension; members sharing it form one sample).
    * The doc%13==0 arm is deliberately longer than 100 bytes so the
    * ustar prefix/name SPLIT is on the wire — a reader that ignores
    * the prefix field truncates these keys and flips rows. */
  private[graft] def tarKey(docId: Long): String = {
    // Locale.ROOT: `f"%09d"` localizes digits under some default locales.
    val base = "sample" + String.format(java.util.Locale.ROOT, "%09d",
      java.lang.Long.valueOf(docId))
    if (docId % 13 == 0) ("x" * 90) + s"/${docId % 7}/$base"
    else s"train/${docId % 7}/$base"
  }

  private[graft] def tarToken(docId: Long, i: Int): String =
    s"s${(docId * 29 + i * 11) % 9973}"

  private[graft] def tarText(docId: Long, nChars: Long): String = {
    val nt = (nChars % 23 + 4).toInt
    (0 until nt).map(tarToken(docId, _)).mkString(" ")
  }

  /** One shard's tar bytes: a leading directory entry, then per doc
    * (ascending) `<key>.txt`, `<key>.cls`, and — for doc%3==0 —
    * `<key>.ppm` ([[synthImage]] through the real PPM encoder). Member
    * mtime = doc_id (octal field arithmetic on real values); the
    * `.cls` members carry the old-style NUL typeflag and every second
    * member space-terminated octals, so both wire dialects occur. */
  private[graft] def buildShardTar(docs: Array[(Long, Long)]): Array[Byte] = {
    import graft.sources.TarCodec
    val members = Vector.newBuilder[TarCodec.TarMember]
    members += TarCodec.TarMember("train/", 0L, Array.emptyByteArray,
      typeflag = '5'.toByte)
    docs.sortBy(_._1).foreach { case (id, nc) =>
      val key = tarKey(id)
      members += TarCodec.TarMember(s"$key.txt", id,
        tarText(id, nc).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      members += TarCodec.TarMember(s"$key.cls", id,
        (id % 10).toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
        typeflag = 0.toByte)
      if (id % 3 == 0)
        members += TarCodec.TarMember(s"$key.ppm", id,
          PpmCodec.encode(synthImage(id, nc)))
    }
    TarCodec.write(members.result())
  }

  /** q242: WebDataset-style tar shard ingest — the distribution format
    * of real multimodal training corpora. Documents are packed into
    * [[TAR_SHARD_MOD]] tar shards (REAL ustar bytes, prefix-split long
    * names, both octal terminators, both file typeflags, a directory
    * entry to skip), then each shard is parsed back by
    * [[graft.sources.TarCodec]] and its members grouped into samples
    * by key; `.txt` + `.cls` are required per sample, `.ppm` optional,
    * an unknown extension rejects loudly. Output: one row per sample
    * with the text stats, the class label, and the decoded image stats
    * (null for text-only samples).
    *
    * Scale shape: the shard FILE is the task unit (tar members are not
    * block-splittable) and the whole pipeline is map-side — build,
    * parse, group, and decode all happen inside one row's computation
    * (the q190 law: the file IS the row, so a sample's members never
    * fan out into a relational group-by). One groupByKey shuffles the
    * (doc_id, n_chars) projection to assemble shards — the demo's
    * generative stand-in for reading shard files off disk
    * ([[readTarShards]] is the real-file form).
    *
    * The twin regenerates keys, labels, text and pixel stats
    * arithmetically — Spark can only reach them through the full
    * write → parse → group → decode chain. */
  def tarShardSamples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val samples = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .groupByKey(_._1 % TAR_SHARD_MOD)
      .mapGroups { (_, it) => buildShardTar(it.toArray) }
      .flatMap(samplesFromTar _)
    sampleGate(samples)
  }

  /** Parse one shard's tar bytes and group its members into samples —
    * shared by q242 and the q248 reshard (the file IS the row: the
    * grouping happens inside one row's computation). */
  private[graft] def samplesFromTar(bytes: Array[Byte])
      : Iterator[(String, Long, Long, String,
          Option[Long], Option[Long], Option[Long])] = {
    val entries = graft.sources.TarCodec.parseEntries(bytes)
    entries.groupBy { e =>
      val dot = e.name.lastIndexOf('.')
      require(dot > 0, s"member ${e.name} has no extension")
      e.name.substring(0, dot)
    }.iterator.map { case (key, members) =>
      val byExt = members.map { e =>
        e.name.substring(e.name.lastIndexOf('.') + 1) -> e
      }.toMap
      require(byExt.size == members.size,
        s"sample $key has duplicate extensions")
      byExt.keySet.diff(Set("txt", "cls", "ppm")).foreach(x =>
        sys.error(s"sample $key has unknown member .$x"))
      val text = new String(byExt("txt").data,
        java.nio.charset.StandardCharsets.UTF_8)
      val cls = new String(byExt("cls").data,
        java.nio.charset.StandardCharsets.US_ASCII).toLong
      val img = byExt.get("ppm").map(e => PpmCodec.decode(e.data))
      val chk = img.map { im =>
        var acc = 7L
        var i = 0
        while (i < im.rgb.length) {
          acc = (acc * 31L + (im.rgb(i) & 0xff)) % TextFns.P
          i += 1
        }
        acc
      }
      (key, cls, text.split(" ").length.toLong, text,
        img.map(_.width.toLong), img.map(_.height.toLong), chk)
    }
  }

  /** The q242 gate projection over extracted samples. */
  private def sampleGate(samples: Dataset[(String, Long, Long, String,
      Option[Long], Option[Long], Option[Long])]): DataFrame =
    samples
      .toDF("key", "cls", "n_tokens", "text", "width", "height",
        "checksum")
      .withColumn("text_md5", md5(col("text"))).drop("text")
      .select("key", "cls", "n_tokens", "text_md5", "width", "height",
        "checksum")
      .orderBy("key")

  /** Shard count after the q248 reshard. */
  val TAR_RESHARD_MOD: Int = 16

  /** q248: tar shard RESHARD — the loader-parallelism operation real
    * training pipelines run on WebDataset corpora: existing shards are
    * parsed, members regrouped by sample key into
    * [[TAR_RESHARD_MOD]] new shards (key-hash assignment, members of a
    * sample kept adjacent, keys ascending within a shard), REPACKED
    * through the real ustar writer, and the final sample extraction
    * runs over the repacked wire. Gated by q242's ORACLE STRING (the
    * q41/q112 device): resharding must be invisible to the sample
    * set — a member lost in repack, a split sample, or a writer
    * defect (checksum, padding, prefix split) flips the shared hash.
    *
    * Scale shape: two shuffles total — the original shard assembly and
    * the member regroup (member-grain rows: name/mtime/payload). The
    * repack and the decode are map-side. */
  def tarReshard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.TarCodec
    val members = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .groupByKey(_._1 % TAR_SHARD_MOD)
      .mapGroups { (_, it) => buildShardTar(it.toArray) }
      .flatMap { bytes =>
        TarCodec.parseEntries(bytes).map(e => (e.name, e.mtime, e.data))
      }
    val resharded = members
      .groupByKey { case (name, _, _) =>
        val key = name.substring(0, name.lastIndexOf('.'))
        math.floorMod(key.hashCode, TAR_RESHARD_MOD)
      }
      .mapGroups { (_, it) =>
        val ms = it.toArray.sortBy(m => (m._1: String))
        TarCodec.write(ms.toIndexedSeq.map { case (name, mtime, data) =>
          TarCodec.TarMember(name, mtime, data)
        })
      }
    sampleGate(resharded.flatMap(samplesFromTar _))
  }

  /** User-facing shard reader over real `.tar` files: one row per
    * regular-file member (shard path, member name, size, mtime,
    * extension). Per-FILE parallelism, the WebDataset contract. */
  def readTarShards(spark: SparkSession, dirGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(dirGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        graft.sources.TarCodec.parseEntries(bytes).map { e =>
          val dot = e.name.lastIndexOf('.')
          (p, e.name, e.size, e.mtime,
            if (dot > 0) e.name.substring(dot + 1) else null)
        }
      }
      .toDF("path", "name", "size", "mtime", "ext")
  }
}
