package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Text-analysis operators over the `documents` table — language stats,
  * heuristic language ID, quality scoring, document fingerprinting
  * (LLM-pipeline surface; beyond-reference).
  *
  * All map-only projections + one narrow groupBy — nothing here shuffles
  * more than the (tiny) per-language aggregate, at any corpus size.
  */
object TextOps {
  import Tables._

  /** Per-language corpus statistics: doc/char/token counts and token-count
    * distribution. Token counting = whitespace tokenizer (TextFns.tokens);
    * averages derive from exact integer sums (one final division). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("lang"),
        length(col("text")).cast("long").as("len"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("len").as("total_chars"),
        sum("n_tokens").as("total_tokens"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"))
      .withColumn("avg_tokens", col("total_tokens").cast("double") / col("n_docs"))
      .orderBy("lang")

  /** Tiny English-stopword list for the language-ID heuristic. */
  val STOPWORDS: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val STOP_RATIO_EN = 0.05

  /** Per-document language-ID heuristic + quality scoring: stopword ratio,
    * average word length, and a CASE-bucketed quality class — the
    * length/punct/stopword-ratio family a training-data filter runs before
    * anything expensive. */
  def langQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => t.isin(STOPWORDS: _*))).cast("long").as("n_stop"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("n_letters"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .withColumn("avg_word_len",
        col("n_letters").cast("double") / col("n_tokens").cast("double"))
      .withColumn("predicted_lang",
        when(col("stop_ratio") >= STOP_RATIO_EN, "en").otherwise("unk"))
      .withColumn("quality_bucket",
        when(col("n_tokens") < 20, "short")
          .when(col("stop_ratio") > 0.15, "stopword_heavy")
          .otherwise("ok"))
      .orderBy("doc_id")
  }

  /** Token counting two ways (brief: "whitespace + a BPE-ish regex"): the
    * whitespace baseline vs a subword-ish regex (`\w+|[^\w\s]` — word runs
    * and lone punctuation, the pre-tokenization split BPE tokenizers apply).
    * Per-language totals + the regex/whitespace inflation ratio. */
  def regexTokens(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("ws"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("long").as("re"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("ws").as("ws_tokens"),
        sum("re").as("re_tokens"))
      .withColumn("ratio", col("re_tokens").cast("double") / col("ws_tokens").cast("double"))
      .orderBy("lang")

  /** Winnowing-style document fingerprint: min rolling hash over character
    * 8-grams + distinct-gram count. One map-only pass; the fingerprint is
    * the clustering key for containment-style dedup at scale. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), TextFns.charGramHashes(col("text")).as("g"))
      .select(col("doc_id"),
        array_min(col("g")).as("fp_min"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct_grams"))
      .orderBy("doc_id")
}
