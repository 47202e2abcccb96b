package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.Sources

/** Query-surface proofs of the non-parquet sources (S8, SURVEY.md §2.1).
  * Each is an oracle-checked query so the formats are covered by the
  * correctness gate, not just unit tests.
  */
object SourceOps {
  import Tables._

  /** CSV round-trip: write `documents` (free text: quoted fields) as
    * headered CSV, read it back with the explicit schema + quote/multiLine
    * options, aggregate per language. The oracle aggregates the parquet
    * original — any loss/corruption in the CSV path breaks the hash match. */
  /** Per-(format, input-dir) scratch path for the round-trip queries —
    * shared so a future change hits every format at once. The per-JVM
    * token keeps concurrent sessions (a Bench and a Verify on the same
    * machine) from racing on one path, and breaks `dir.hashCode`
    * collisions between different input dirs; within a JVM the path is
    * stable, so repeated runs overwrite rather than accumulate. */
  private val jvmToken: String =
    java.lang.Long.toHexString(ProcessHandle.current().pid())
  private def roundtripTmp(kind: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${kind}_roundtrip_${jvmToken}_" +
      java.lang.Integer.toHexString(dir.hashCode)

  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = roundtripTmp("csv", dir)
    Sources.writeCsv(documents(spark, dir), tmp)
    Sources.readCsv(spark, tmp, Schemas.documents)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum(length(col("text")).cast("long")).as("total_text_len"))
      .orderBy("lang")
  }

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** JSON column parsing: `events.props` is JSON text (ref
    * `services.availability JSON`, sql/table_creation:58 — the reference
    * stores but never parses it; we surface it via from_json). Map-only
    * parse + narrow grouped agg. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("total_k"))
      .withColumn("avg_k", col("total_k").cast("double") / col("n_events"))
      .orderBy("event_type")

  /** ORC round-trip: orders through the other columnar format and back,
    * aggregated per status. The oracle aggregates the parquet original, so
    * any type/precision loss in the ORC path breaks the hash match
    * (timestamps, doubles and strings all cross the boundary). */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = roundtripTmp("orc", dir)
    Sources.writeOrc(orders(spark, dir), tmp)
    Sources.readOrc(spark, tmp)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(Num.cents(col("o_totalprice"))).as("rev_cents"),
        min(col("o_orderdate").cast("date")).as("first_date"),
        max(col("o_orderdate").cast("date")).as("last_date"))
      .select(col("o_orderstatus"), col("n_orders"),
        Num.dollars(col("rev_cents")).as("revenue"),
        col("first_date"), col("last_date"))
      .orderBy("o_orderstatus")
  }

  /** XML round-trip (S8 family, Spark 4 native XML source): suppliers out
    * through row-per-element XML and back under an explicit schema, then
    * a per-nation aggregate the oracle computes from the parquet original
    * — name strings (attribute-escaping), integral keys and double
    * balances all cross the text boundary, so any escaping or numeric
    * formatting loss breaks the hash. */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = roundtripTmp("xml", dir)
    Sources.writeXml(supplier(spark, dir), tmp, rowTag = "supplier")
    Sources.readXml(spark, tmp, Schemas.supplier, rowTag = "supplier")
      .groupBy(col("s_nationkey").cast("long").as("nation_key"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(Num.cents(col("s_acctbal"))).as("bal_cents"),
        min(col("s_name")).as("first_name"),
        max(col("s_name")).as("last_name"))
      .select(col("nation_key"), col("n_suppliers"),
        Num.dollars(col("bal_cents")).as("total_balance"),
        col("first_name"), col("last_name"))
      .orderBy("nation_key")
  }

  /** MapType surface: the same props column parsed as a *dynamic* map
    * (schema-on-read when keys aren't known in advance — the other half of
    * the JSON story next to [[jsonProps]]'s fixed struct): `from_json` to
    * map<string,string>, then `map_keys`/`element_at`/`map_contains_key`.
    * Map-only parse + narrow grouped agg, like every scan-side operator. */
  def mapProps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)).as("m"))
      .select(col("event_type"),
        size(map_keys(col("m"))).cast("long").as("n_keys"),
        element_at(col("m"), "k").as("k"),
        map_contains_key(col("m"), "missing").as("has_missing"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("n_keys").as("total_keys"),
        sum("k").as("total_k"),
        sum(when(col("has_missing"), 1L).otherwise(0L)).as("n_has_missing"))
      .orderBy("event_type")

  /** Semi-structured VariantType surface — the third face of the JSON
    * story next to [[jsonProps]] (fixed struct) and [[mapProps]] (dynamic
    * map): `parse_json` produces a VARIANT — the open-content binary
    * encoding engines use when neither the schema nor the key set is
    * known — and `variant_get` does typed path extraction with shredding-
    * friendly access (at scale, variant columns store typed subcolumns a
    * path read can prune to, unlike string-JSON reparsing). */
  def variantProps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "long").as("k"),
        variant_get(col("v"), "$.missing", "long").as("miss"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("k").as("total_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        sum(when(col("miss").isNull, 1L).otherwise(0L)).as("n_without_missing"))
      .orderBy("event_type")

  /** Schema evolution across snapshots — the union a long-lived lake table
    * needs when columns are added/retired between writer versions: an old
    * snapshot (id + price) and a new one (id + status/priority) align by
    * *name* with `unionByName(allowMissingColumns = true)`; absent columns
    * null-fill. The aggregate then accounts for the nulls explicitly —
    * the migration-audit query run after every schema change.
    *
    * Scale shape: a by-name union is plan-level column alignment — zero
    * extra passes; the aggregate is a handful of groups. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val v1 = o.filter(year(col("o_orderdate")) <= 1994)
      .select(col("o_orderkey").as("order_id"),
        Num.cents(col("o_totalprice")).as("price_cents"))
    val v2 = o.filter(year(col("o_orderdate")) >= 1995)
      .select(col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy(coalesce(col("status"), lit("<legacy>")).as("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("price_cents").isNull, 1L).otherwise(0L))
          .as("n_missing_price"),
        (sum(coalesce(col("price_cents"), lit(0L))).cast("double") /
          lit(100.0)).as("revenue"),
        countDistinct(col("priority")).cast("long").as("n_priorities"))
      .orderBy("status")
  }

  /** Week days of the [[availabilityJson]] schedule documents. */
  val AVAIL_DAYS: Seq[String] =
    Seq("mon", "tue", "wed", "thu", "fri", "sat", "sun")

  /** The availability-SHAPED JSON parse (ref `services.availability JSON`,
    * sql/table_creation:58 — a day→"open-close" hour-range object, the
    * schedule encoding the reference stores but never parses). Suppliers
    * stand in for providers; each gets a deterministic schedule document
    * BUILT as real JSON (`to_json` over a null-filtered day map) and then
    * read back the way a consumer would: `from_json` → dynamic map →
    * range split → per-week open-hours arithmetic. The oracle computes the
    * same stats straight from the generative arithmetic, so a defect
    * anywhere in the JSON round trip (construction, escaping, parse, range
    * split) breaks the hash. Map-only + narrow agg, like every scan-side
    * parse. */
  def availabilityJson(spark: SparkSession, dir: String): DataFrame = {
    val pid = col("provider_id")
    val entries = AVAIL_DAYS.zipWithIndex.flatMap { case (day, d) =>
      val open = (pid * 7 + lit(d)) % 12 + 6
      val close = open + (pid + lit(d)) % 8 + 1
      Seq(lit(day), when((pid + lit(d)) % 3 =!= 0,
        concat(open.cast("string"), lit("-"), close.cast("string"))))
    }
    val docs = supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("provider_id"))
      .select(pid, to_json(map_filter(map(entries: _*),
        (_, v) => v.isNotNull)).as("availability"))
    // consumer side: schema-on-read parse of the JSON text
    val m = from_json(col("availability"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    docs
      .select(pid, m.as("sched"))
      .select(pid,
        size(map_keys(col("sched"))).cast("long").as("n_days_open"),
        aggregate(map_values(col("sched")), lit(0L),
          (acc, v) => acc + split(v, "-").getItem(1).cast("long") -
            split(v, "-").getItem(0).cast("long")).as("weekly_hours"),
        (map_contains_key(col("sched"), "sat") ||
          map_contains_key(col("sched"), "sun")).as("weekend_open"))
      .orderBy("provider_id")
  }

  import org.apache.spark.sql.Column

  /** URL canonicalization — the step-one identity function of web-crawl
    * curation (CCNet/C4/RefinedWeb dedupe BY canonical URL before any
    * content pass): lowercase scheme+host, strip the https default port,
    * drop the fragment, drop tracking params (`utm_*`, `ref`), sort the
    * surviving query params, strip trailing path slashes. Pure codegen'd
    * expressions (regexp/split/array_sort/filter) — no UDF, so the 100 TB
    * pass stays inside whole-stage codegen. */
  def urlCanonical(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val q = regexp_extract(noFrag, "\\?(.*)$", 1)
    val sch = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1))
    val host = when(sch === "https",
      regexp_replace(hostport, ":443$", "")).otherwise(hostport)
    val path = regexp_replace(
      regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$", 1),
      "/+$", "")
    val params = array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|ref)(=|$)")))
    val qn = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(sch, lit("://"), host, path, qn)
  }

  /** q189: canonical-URL dedup over a deterministically MESSY url corpus —
    * every document gets a raw URL with mixed-case scheme/host, an
    * explicit default port, tracking params in shuffled order, an
    * occasional fragment and trailing slash (each decided by doc_id
    * arithmetic, so the oracle rebuilds the identical raw strings);
    * [[urlCanonical]] collapses the mess and a groupBy counts docs and
    * distinct raw FORMS per canonical identity. Map-only until one
    * groupBy of short string keys — the shape of URL-level dedup at
    * crawl scale. */
  def urlCanonicalDedup(spark: SparkSession, dir: String): DataFrame = {
    val did = col("doc_id")
    val raw = concat(
      when(did % 2 === 0, "HTTPS://").otherwise("https://"),
      when(did % 3 === 0, upper(col("source"))).otherwise(col("source")),
      lit(".Example.COM"),
      when(did % 4 === 0, ":443").otherwise(""),
      lit("/docs/"), (did % 50).cast("string"),
      when(did % 5 === 0, "/").otherwise(""),
      when(did % 7 === 0, "")
        .when(did % 2 === 0,
          concat(lit("?utm_source=rss&ref="), (did % 3).cast("string"),
            lit("&b=2&a=1")))
        .otherwise("?a=1&b=2"),
      when(did % 6 === 0, concat(lit("#sec-"), did.cast("string")))
        .otherwise(""))
    documents(spark, dir)
      .select(did, col("source"), raw.as("raw_url"))
      .withColumn("url", urlCanonical(col("raw_url")))
      .groupBy("url")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_url")).cast("long").as("n_forms"),
        min(did).as("first_doc"))
      .orderBy("url")
  }

  /** q191 quality threshold: a domain is low-quality when its mean doc
    * length is strictly below this (compared as the exact integer
    * predicate `total_chars < n_docs * DOMAIN_MIN_AVG` — no division
    * crosses the engine boundary). */
  val DOMAIN_MIN_AVG = 298L

  /** q191: domain-level curation gate — step two of web-crawl curation
    * (after q189's URL identity): RefinedWeb/C4 drop whole REGISTRABLE
    * DOMAINS via a blocklist and domain-level quality stats before any
    * per-document pass, because domain grain is ~4 orders of magnitude
    * smaller than page grain. Every doc gets a deterministic multi-label
    * host (optional `www.`/`cdn.` subdomain noise, a site key, a
    * site-keyed TLD); the registrable domain is the last two host labels.
    * Shape at 100 TB: one map-side-combined groupBy of short domain keys
    * for the stats; the blocklist (domain grain, hash-derived here,
    * curated in deployment) broadcasts into a LEFT ANTI join on the doc
    * stream — the kept count comes from that anti-join path, so the plan
    * the docs actually flow through is the plan the oracle checks. */
  def domainGate(spark: SparkSession, dir: String): DataFrame = {
    val did = col("doc_id")
    val site = concat(col("source"), lit("-"), (did % 23).cast("string"))
    val tld = element_at(
      array(lit("com"), lit("net"), lit("org")),
      ((did % 23) % 3 + 1).cast("int"))
    val host = concat(
      when(did % 4 === 0, "www.").when(did % 4 === 1, "cdn.").otherwise(""),
      site, lit("."), tld)
    val docs = documents(spark, dir)
      .select(did.as("doc_id"), col("n_chars"), host.as("host"))
      .withColumn("domain",
        array_join(slice(split(col("host"), "\\."), -2, 2), "."))
    val stats = docs.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).cast("long").as("n_hosts"),
        sum("n_chars").as("total_chars"))
      .withColumn("blocked",
        graft.functions.TextFns.polyHash(col("domain")) % 7 === 0)
      .withColumn("low_quality",
        col("total_chars") < col("n_docs") * DOMAIN_MIN_AVG)
    val blocklist = stats.filter(col("blocked")).select(col("domain"))
    val kept = docs.join(broadcast(blocklist), Seq("domain"), "left_anti")
      .groupBy("domain").agg(count(lit(1)).as("kept_raw"))
    stats.join(kept, Seq("domain"), "left")
      .select(col("domain"), col("n_docs"), col("n_hosts"),
        col("total_chars"), col("blocked"), col("low_quality"),
        when(col("low_quality"), 0L)
          .otherwise(coalesce(col("kept_raw"), lit(0L))).as("kept_docs"))
      .orderBy("domain")
  }
}
