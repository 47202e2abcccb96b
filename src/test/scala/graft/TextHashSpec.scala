package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.TextFns

/** The codegen hash expressions ([[graft.functions.TextHashExprs]]) must be
  * bit-identical to their declarative higher-order-function twins — the
  * `*Fold` forms are the semantic spec the DuckDB oracle twins were written
  * against, so any divergence would silently break the correctness gate. */
class TextHashSpec extends SparkSpecBase {
  import spark.implicits._

  /** Edge corpus: empties, whitespace-only, leading/trailing separators
    * (split keeps empty tokens), tabs (space-only trim), short docs
    * (shingle truncation), code points beyond ASCII and beyond the BMP. */
  private lazy val edges = Seq(
    "", " ", "   ", "a", " a ", "a b", "a  b", "\ta\tb\t", "a\nb c",
    "one two three four five", "repeat repeat repeat repeat",
    "café naïve résumé",
    "emoji " + new String(Character.toChars(0x1F600)) + " tail",
    "x " + new String(Character.toChars(0x10348)) + " y",
    ("tok " * 40).trim,
    // > 64 distinct shingles: exercises the open-addressing dedup regime
    (1 to 300).map(i => s"w$i").mkString(" "),
    // long with planted repeats: dedup must still collapse them
    ((1 to 100).map(i => s"w$i") ++ (1 to 100).map(i => s"w$i")).mkString(" "))
    .toDF("text")

  private lazy val docs =
    Tables.documents(spark, sf).select(col("text"))

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.filter(col("fast").isNull || col("ref").isNull ||
      col("fast") =!= col("ref"))
    assert(bad.count() == 0, bad.take(3).mkString("; "))
  }

  test("polyHash codegen == declarative fold (docs + edge strings)") {
    for (src <- Seq(docs, edges))
      assertSame(src.select(
        TextFns.polyHash(col("text")).as("fast"),
        TextFns.polyHashFold(col("text")).as("ref")))
  }

  test("shingleHashes codegen == declarative (docs + edge strings)") {
    for (src <- Seq(docs, edges))
      assertSame(src.select(
        TextFns.shingleHashes(col("text")).as("fast"),
        TextFns.shingleHashesFold(col("text")).as("ref")))
  }

  test("spanHashes codegen == declarative (docs + edge strings)") {
    for (src <- Seq(docs, edges))
      assertSame(src.select(
        TextFns.spanHashes(col("text"), graft.engine.TextOps.SPAN_W).as("fast"),
        TextFns.spanHashesFold(col("text"), graft.engine.TextOps.SPAN_W).as("ref")))
  }

  test("minhashSig codegen == declarative (docs + edge strings)") {
    for (src <- Seq(docs, edges))
      assertSame(src.select(
        TextFns.minhashSig(TextFns.shingleHashes(col("text"))).as("fast"),
        TextFns.minhashSigFold(TextFns.shingleHashesFold(col("text"))).as("ref")))
  }

  test("charGramHashes codegen == declarative (docs + edge strings)") {
    for (src <- Seq(docs, edges))
      assertSame(src.select(
        TextFns.charGramHashes(col("text")).as("fast"),
        TextFns.charGramHashesFold(col("text")).as("ref")))
  }

  test("winnowHashes codegen == declarative (docs + edge strings)") {
    import graft.engine.Dedup.{WINNOW_K, WINNOW_W}
    for (src <- Seq(docs, edges))
      assertSame(src.select(
        TextFns.winnowHashes(col("text"), WINNOW_K, WINNOW_W).as("fast"),
        TextFns.winnowHashesFold(col("text"), WINNOW_K, WINNOW_W).as("ref")))
    // degenerate windows: w = 1 selects every distinct gram; w ≥ grams
    // collapses to the single global min
    for ((k, w) <- Seq((3, 1), (8, 10000), (1, 4)))
      assertSame(edges.select(
        TextFns.winnowHashes(col("text"), k, w).as("fast"),
        TextFns.winnowHashesFold(col("text"), k, w).as("ref")))
  }

  test("SQL registry functions resolve to the same expressions as the Column API") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("texthash_docs")
    val viaSql = spark.sql(
      "SELECT poly_hash(text) AS h, size(shingle_hashes(text, 3)) AS n, " +
        "sim_hash(text, 48) AS s FROM texthash_docs").collect()
    val viaApi = docs.select(
      TextFns.polyHash(col("text")).as("h"),
      size(TextFns.shingleHashes(col("text"))).as("n"),
      graft.functions.TextHashExprs.simHash(col("text"), 48).as("s")).collect()
    assert(viaSql.map(_.toSeq).toSet == viaApi.map(_.toSeq).toSet)
  }

  test("SQL-exposed parameters are validated") {
    graft.functions.GraftFunctions.register(spark)
    assertThrows[Exception](spark.sql("SELECT sim_hash('a', 65)").collect())
    assertThrows[Exception](spark.sql("SELECT shingle_hashes('a', 0)").collect())
    assertThrows[Exception](
      spark.sql("SELECT char_gram_hashes('a', -1)").collect())
  }

  test("hash expressions survive both codegen and interpreted eval paths") {
    // eval (nullSafeEval) is exercised via a plan Catalyst won't codegen:
    // a driver-side literal Column outside any query stage.
    val lit1 = spark.range(1).select(
      TextFns.polyHash(lit("a b c")).as("h"),
      size(TextFns.shingleHashes(lit("a b c d"))).as("n"))
    val r = lit1.collect().head
    assert(r.getLong(0) > 0 && r.getInt(1) >= 1)
  }

  test("unicode normalization: NFC composes, NFKC folds, idempotent, " +
      "null-safe, SQL registry == Column API") {
    import graft.functions.TextHashExprs
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq(
      ("e\u0301", "\u00e9", "\u00e9"), // combining acute composes
      ("A\u030a", "\u00c5", "\u00c5"), // combining ring composes
      ("\ufb01", "\ufb01", "fi"),       // ligature: NFC-invariant, NFKC folds
      ("\uff47", "\uff47", "g"),        // fullwidth form
      ("\u00b2", "\u00b2", "2"),        // superscript
      ("\u00e9", "\u00e9", "\u00e9"),  // already composed: idempotent
      ("plain", "plain", "plain"),
      ("", "", ""))
    val df = cases.toDF("raw", "nfc_want", "nfkc_want")
      .withColumn("nfc_got", expr("nfc_normalize(raw)"))
      .withColumn("nfkc_got", expr("nfkc_normalize(raw)"))
      .withColumn("nfc_api", TextHashExprs.nfcNormalize(col("raw")))
    val bad = df.filter(col("nfc_got") =!= col("nfc_want") ||
      col("nfkc_got") =!= col("nfkc_want") ||
      col("nfc_api") =!= col("nfc_got"))
    assert(bad.count() == 0, bad.take(3).mkString("; "))
    // null in → null out (NullIntolerant unary)
    val n = spark.sql(
      "SELECT nfc_normalize(CAST(NULL AS STRING)) AS x").collect().head
    assert(n.isNullAt(0))
    // NFC(NFC(s)) == NFC(s) over the real corpus (idempotence at scale)
    val docs2 = Tables.documents(spark, sf).select(col("text"))
      .withColumn("once", expr("nfc_normalize(text)"))
      .withColumn("twice", expr("nfc_normalize(nfc_normalize(text))"))
    assert(docs2.filter(col("once") =!= col("twice")).count() == 0)
  }
}
