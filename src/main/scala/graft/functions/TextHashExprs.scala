package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass implementations of the [[TextFns]] hash pipeline, called from
  * the codegen expressions below. Each method reproduces the exact op
  * sequence of its declarative (higher-order-function) twin — same
  * space-only `trim`, same `split` keep-empty semantics, same
  * code-point values as `ascii`, same `% P` fold order — so results are
  * bit-identical (TextHashSpec asserts it against the `*Fold` forms).
  *
  * Why this exists: Catalyst higher-order functions evaluate their lambda
  * interpreted, one boxed element at a time. The MinHash pipeline evaluates
  * ~(tokens × shingle-length) lambdas per document; at 32 local threads the
  * allocation rate turns into GC contention and the LSH queries *anti-scale*
  * (measured 2–6× slower at local[32] than local[8]). A tight primitive
  * loop hashes a document with zero per-element allocation.
  *
  * A Scala `object` with no companion class compiles to static forwarders,
  * so generated Java calls `graft.functions.TextHash.m(...)` directly. */
object TextHash {
  import TextFns.P

  private val WS = Pattern.compile("\\s+")

  /** `split(trim(text), "\\s+")` — Spark's space-only UTF8String.trim, then
    * regex split with limit -1 (leading/trailing empty tokens kept). */
  def tokenize(text: UTF8String): Array[String] =
    WS.split(text.trim.toString, -1)

  /** UAX #15 normalization via the JDK ([[UnicodeNormE]]): NFC, or
    * NFKC when `nfkc`. Already-normalized input (the common case on a
    * real corpus) is a quick-check pass inside Normalizer — no
    * allocation beyond the UTF8String round trip. */
  def unicodeNorm(s: UTF8String, nfkc: Boolean): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString,
      if (nfkc) java.text.Normalizer.Form.NFKC
      else java.text.Normalizer.Form.NFC))

  /** Fold acc = (acc*31 + codePoint) % P over the string, acc0 = 7 —
    * identical to aggregate(filter(split(s,""),...), 7, ...) with `ascii`
    * yielding the code point (empty-regex split keeps surrogate pairs). */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** polyHash of `concat_ws(" ", toks[from until until))` without building
    * the joined string: the separator contributes code point 32 between
    * consecutive tokens, matching the fold over the concatenated chars. */
  private def hashJoined(toks: Array[String], from: Int, until: Int): Long = {
    var acc = 7L
    var t = from
    while (t < until) {
      if (t > from) acc = (acc * 31L + 32L) % P
      val str = toks(t)
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        acc = (acc * 31L + cp) % P
        i += Character.charCount(cp)
      }
      t += 1
    }
    acc
  }

  /** Distinct word-k-gram shingle hashes, first-occurrence order (the
    * `array_distinct` contract, which is hash-based — the dedup here must
    * stay O(shingles) too, or a 100k-token document turns quadratic). ≥1
    * shingle even for short/empty docs.
    *
    * Dedup stays boxing-free in both regimes: a linear scan for typical
    * short documents (cache-friendly, no table at all) and a primitive
    * open-addressing long set for long ones. */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val w = tokenize(text)
    val nsh = math.max(w.length - (k - 1), 1)
    val out = new Array[Long](nsh)
    var n = 0
    var i = 0
    if (nsh <= 64) {
      while (i < nsh) {
        val h = hashJoined(w, i, math.min(i + k, w.length))
        var seen = false
        var j = 0
        while (j < n && !seen) { seen = out(j) == h; j += 1 }
        if (!seen) { out(n) = h; n += 1 }
        i += 1
      }
    } else {
      // hash values are in [0, P) so -1 is a safe empty sentinel
      var cap = 128
      while (cap < nsh * 2) cap <<= 1
      val table = new Array[Long](cap)
      java.util.Arrays.fill(table, -1L)
      val mask = cap - 1
      while (i < nsh) {
        val h = hashJoined(w, i, math.min(i + k, w.length))
        var idx = ((h * 0x9E3779B97F4A7C15L) >>> 40).toInt & mask
        while (table(idx) != -1L && table(idx) != h) idx = (idx + 1) & mask
        if (table(idx) == -1L) { table(idx) = h; out(n) = h; n += 1 }
        i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  /** Positioned word-k-gram window hashes — the NON-distinct twin of
    * [[shingleHashes]]: one hash per window in document order (the array
    * index IS the window position), which is what the repeated-span
    * accounting explodes with `posexplode`. Same tokenization, same
    * rolling hash, same ≥1-window trailing-truncation contract. */
  def spanHashes(text: UTF8String, k: Int): ArrayData = {
    val w = tokenize(text)
    val nsh = math.max(w.length - (k - 1), 1)
    val out = new Array[Long](nsh)
    var i = 0
    while (i < nsh) {
      out(i) = hashJoined(w, i, math.min(i + k, w.length))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** NH affine-permutation minima over the shingle-hash set — all NH in one
    * pass over the array. Null elements are skipped and an empty (or
    * all-null) input yields null minima — exactly `array_min` over the
    * transformed array, so the declarative twin can't diverge on the
    * SQL-exposed surface either. */
  def minhashSig(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Any](TextFns.NH)
    var i = 0
    while (i < TextFns.NH) {
      val a = TextFns.A(i)
      val b = TextFns.B(i)
      var mn = Long.MaxValue
      var found = false
      var j = 0
      while (j < n) {
        if (!hashes.isNullAt(j)) {
          val v = (a * hashes.getLong(j) + b) % P
          if (v < mn) mn = v
          found = true
        }
        j += 1
      }
      if (found) out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }

  private val MAX_BITS = 64
  private val AS = Array.tabulate(MAX_BITS)(TextFns.A)
  private val BS = Array.tabulate(MAX_BITS)(TextFns.B)

  /** Single-pass SimHash over whitespace tokens (with multiplicity): each
    * token's polyHash feeds `bits` independent affine rehashes; counter b
    * gets ±1 by the rehash parity; the sign vector is the fingerprint.
    * Same math as the explode → groupBy(48 conditional sums) formulation
    * (sum order is irrelevant for integer ±1 counters), but map-only: no
    * explode blow-up, no shuffle, no wide hash-aggregate. */
  def simHash(text: UTF8String, bits: Int): Long = {
    val toks = tokenize(text)
    val counts = new Array[Long](bits)
    var t = 0
    while (t < toks.length) {
      val str = toks(t)
      var h = 7L
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        h = (h * 31L + cp) % P
        i += Character.charCount(cp)
      }
      var b = 0
      while (b < bits) {
        counts(b) += (((AS(b) * h + BS(b)) % P) % 2L) * 2L - 1L
        b += 1
      }
      t += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Rolling character-k-gram hashes (code-point substrings, tail grams
    * truncate): gram i = polyHash(substr(text, i, k)), 1-based, ≥1 gram. */
  def charGramHashes(text: UTF8String, k: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val ngrams = math.max(n - (k - 1), 1)
    val out = new Array[Long](ngrams)
    var i = 0
    while (i < ngrams) {
      var acc = 7L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) { acc = (acc * 31L + cps(j)) % P; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints: distinct sliding-window minima (window `w`)
    * over the char-`k`-gram rolling hashes, first-occurrence order — the
    * single-pass twin of `array_distinct(transform(sequence(1, nw), i ->
    * array_min(slice(grams, i, w))))` (TextFns.winnowHashesFold). The
    * naive form allocates one w-slice per character of the document
    * (O(n·w) boxed work — measured 19s for the sf0.1 corpus); here the
    * minima come from an O(n) monotonic index deque and the distinct set
    * reuses [[shingleHashes]]'s two-regime boxing-free dedup. */
  def winnowHashes(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val ng = math.max(n - (k - 1), 1)
    val g = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      var acc = 7L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) { acc = (acc * 31L + cps(j)) % P; j += 1 }
      g(i) = acc
      i += 1
    }
    val nw = math.max(ng - (w - 1), 1)
    val mins = new Array[Long](nw)
    if (ng <= w) {
      var m = g(0)
      var t = 1
      while (t < ng) { if (g(t) < m) m = g(t); t += 1 }
      mins(0) = m
    } else {
      // indices with strictly increasing hash values; head = current min
      val dq = new Array[Int](ng)
      var head = 0
      var tail = 0
      var e = 0
      while (e < ng) {
        while (tail > head && g(dq(tail - 1)) >= g(e)) tail -= 1
        dq(tail) = e
        tail += 1
        if (e >= w - 1) {
          val start = e - (w - 1)
          while (dq(head) < start) head += 1
          mins(start) = g(dq(head))
        }
        e += 1
      }
    }
    // first-occurrence distinct (the array_distinct contract)
    val out = new Array[Long](nw)
    var m = 0
    i = 0
    if (nw <= 64) {
      while (i < nw) {
        val h = mins(i)
        var seen = false
        var j = 0
        while (j < m && !seen) { seen = out(j) == h; j += 1 }
        if (!seen) { out(m) = h; m += 1 }
        i += 1
      }
    } else {
      var cap = 128
      while (cap < nw * 2) cap <<= 1
      val table = new Array[Long](cap)
      java.util.Arrays.fill(table, -1L)
      val mask = cap - 1
      while (i < nw) {
        val h = mins(i)
        var idx = ((h * 0x9E3779B97F4A7C15L) >>> 40).toInt & mask
        while (table(idx) != -1L && table(idx) != h) idx = (idx + 1) & mask
        if (table(idx) == -1L) { table(idx) = h; out(m) = h; m += 1 }
        i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

/** Codegen unary expression whose generated code is one static call into
  * [[TextHash]] — keeps the whole hash pipeline inside whole-stage codegen
  * with no lambda dispatch (same pattern as [[DotProductF]]). */
abstract class TextHashExpr extends UnaryExpression {
  /** Java expression for the result given the evaluated child term. */
  protected def staticCall(childTerm: String): String
  protected def expectedInput: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, expectedInput,
        ignoreNullability = true)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${expectedInput.sql}, got ${child.dataType.sql}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
}

case class PolyHashE(child: Expression) extends TextHashExpr {
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  override def nullSafeEval(s: Any): Any =
    TextHash.polyHash(s.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.polyHash($c)"
  override protected def withNewChildInternal(c: Expression): PolyHashE =
    copy(child = c)
}

case class ShingleHashesE(child: Expression, k: Int) extends TextHashExpr {
  require(k >= 1, s"shingle_hashes k must be >= 1, got $k")
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(s: Any): Any =
    TextHash.shingleHashes(s.asInstanceOf[UTF8String], k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.shingleHashes($c, $k)"
  override protected def withNewChildInternal(c: Expression): ShingleHashesE =
    copy(child = c)
}

case class SpanHashesE(child: Expression, k: Int) extends TextHashExpr {
  require(k >= 1, s"span_hashes k must be >= 1, got $k")
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hashes"
  override def nullSafeEval(s: Any): Any =
    TextHash.spanHashes(s.asInstanceOf[UTF8String], k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.spanHashes($c, $k)"
  override protected def withNewChildInternal(c: Expression): SpanHashesE =
    copy(child = c)
}

case class MinHashSigE(child: Expression) extends TextHashExpr {
  override protected def expectedInput: DataType =
    ArrayType(LongType, containsNull = false)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(a: Any): Any =
    TextHash.minhashSig(a.asInstanceOf[ArrayData])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.minhashSig($c)"
  override protected def withNewChildInternal(c: Expression): MinHashSigE =
    copy(child = c)
}

case class CharGramHashesE(child: Expression, k: Int) extends TextHashExpr {
  require(k >= 1, s"char_gram_hashes k must be >= 1, got $k")
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"
  override def nullSafeEval(s: Any): Any =
    TextHash.charGramHashes(s.asInstanceOf[UTF8String], k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.charGramHashes($c, $k)"
  override protected def withNewChildInternal(c: Expression): CharGramHashesE =
    copy(child = c)
}

case class WinnowHashesE(child: Expression, k: Int, w: Int)
    extends TextHashExpr {
  require(k >= 1, s"winnow_hashes k must be >= 1, got $k")
  require(w >= 1, s"winnow_hashes w must be >= 1, got $w")
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"
  override def nullSafeEval(s: Any): Any =
    TextHash.winnowHashes(s.asInstanceOf[UTF8String], k, w)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.winnowHashes($c, $k, $w)"
  override protected def withNewChildInternal(c: Expression): WinnowHashesE =
    copy(child = c)
}

case class SimHashE(child: Expression, bits: Int) extends TextHashExpr {
  // the SQL registry exposes `bits` to users; the hash family and the long
  // fingerprint both cap at 64
  require(bits >= 1 && bits <= 64, s"sim_hash bits must be in [1, 64], got $bits")
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = LongType
  override def prettyName: String = "sim_hash"
  override def nullSafeEval(s: Any): Any =
    TextHash.simHash(s.asInstanceOf[UTF8String], bits)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.simHash($c, $bits)"
  override protected def withNewChildInternal(c: Expression): SimHashE =
    copy(child = c)
}

/** Unicode normalization (UAX #15) as a native codegen expression —
  * Spark ships no built-in for it, and a training-data pipeline needs
  * NFC before hashing/dedup (the same logical text arrives composed
  * from one crawl and decomposed from another — byte-level dedup
  * misses the pair entirely) and NFKC for compatibility folding
  * (ligatures, fullwidth forms, superscripts) ahead of tokenization.
  * `java.text.Normalizer` is the JDK's ICU-equivalent implementation;
  * q256's oracle cross-checks NFC against DuckDB's OWN independent
  * `nfc_normalize` (utf8proc), so the two implementations gate each
  * other. */
case class UnicodeNormE(child: Expression, nfkc: Boolean)
    extends TextHashExpr {
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (nfkc) "nfkc_normalize" else "nfc_normalize"
  override def nullSafeEval(s: Any): Any =
    TextHash.unicodeNorm(s.asInstanceOf[UTF8String], nfkc)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.unicodeNorm($c, $nfkc)"
  override protected def withNewChildInternal(c: Expression): UnicodeNormE =
    copy(child = c)
}

object TextHashExprs {
  def polyHash(c: Column): Column =
    SqlBridge.column(PolyHashE(SqlBridge.expression(c)))
  def shingleHashes(c: Column, k: Int): Column =
    SqlBridge.column(ShingleHashesE(SqlBridge.expression(c), k))
  def spanHashes(c: Column, k: Int): Column =
    SqlBridge.column(SpanHashesE(SqlBridge.expression(c), k))
  def minhashSig(c: Column): Column =
    SqlBridge.column(MinHashSigE(SqlBridge.expression(c)))
  def charGramHashes(c: Column, k: Int): Column =
    SqlBridge.column(CharGramHashesE(SqlBridge.expression(c), k))
  def winnowHashes(c: Column, k: Int, w: Int): Column =
    SqlBridge.column(WinnowHashesE(SqlBridge.expression(c), k, w))
  def simHash(c: Column, bits: Int): Column =
    SqlBridge.column(SimHashE(SqlBridge.expression(c), bits))
  def nfcNormalize(c: Column): Column =
    SqlBridge.column(UnicodeNormE(SqlBridge.expression(c), nfkc = false))
  def nfkcNormalize(c: Column): Column =
    SqlBridge.column(UnicodeNormE(SqlBridge.expression(c), nfkc = true))
}
