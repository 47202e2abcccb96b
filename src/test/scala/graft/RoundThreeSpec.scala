package graft

import org.apache.spark.sql.functions._

import graft.engine.{Kpis, Tables, TextOps}

/** Invariant checks for the round-3 operators (q56–q61) — properties the
  * DuckDB hash-compare can't express as neatly: set-algebra identities,
  * window-family internal consistency, packing/split conservation laws,
  * salted ≡ unsalted equality by construction.
  */
class RoundThreeSpec extends SparkSpecBase {

  private def opCount(rows: Array[org.apache.spark.sql.Row]): Map[String, Long] =
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap

  test("setOps matches set algebra computed independently on the driver") {
    val m = opCount(Kpis.setOps(spark, sf).collect())
    def keys(y: Int) = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === y)
    def keySet(y: Int): Set[Long] = keys(y).select("o_custkey").collect()
      .map(_.getAs[Number](0).longValue).toSet
    val (k95, k96) = (keySet(1995), keySet(1996))
    assert(m("except") == (k95 -- k96).size)
    assert(m("intersect") == (k95 & k96).size)
    assert(m("union") == (k95 ++ k96).size)
    assert(m("union_all") == keys(1995).count() + keys(1996).count())
    val custKeys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getAs[Number](0).longValue).toSet
    assert(m("semi_join") == custKeys.count(k95.contains))
    assert(m("anti_join") == custKeys.size - custKeys.count(k95.contains))
  }

  test("windowFamily: running total ends at the year total, deltas telescope") {
    val rows = Kpis.windowFamily(spark, sf)
      .orderBy("order_month").collect()
    val byYear = rows.groupBy(_.getAs[Long]("year"))
    byYear.foreach { case (_, months) =>
      val sorted = months.sortBy(_.getAs[java.sql.Date]("order_month").toString)
      // running_cents is a prefix sum: monotone, ending at the sum of the
      // per-month cents (recovered exactly from revenue = cents/100)
      val cents = sorted.map(r => Math.round(r.getAs[Double]("revenue") * 100))
      assert(sorted.last.getAs[Long]("running_cents") == cents.sum)
      assert(sorted.map(_.getAs[Long]("running_cents")).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      })
      // first/last are constant within the partition
      assert(sorted.map(_.getAs[Long]("year_first_cents")).distinct.length == 1)
      assert(sorted.map(_.getAs[Long]("year_last_cents")).distinct.length == 1)
      // percent_rank endpoints
      assert(sorted.map(_.getAs[Double]("pct_rank")).min == 0.0)
      // quartiles only take values 1..4
      assert(sorted.map(_.getAs[Long]("rev_quartile")).forall(q => q >= 1 && q <= 4))
    }
  }

  test("sequencePacking conserves docs and tokens, bins are contiguous") {
    val docs = Tables.documents(spark, sf)
    val packed = TextOps.sequencePacking(spark, sf).collect()
    assert(packed.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // per-lang bin ids are 0..max with no holes, and doc-id ranges don't
    // overlap between consecutive bins (contiguous fill order)
    packed.groupBy(_.getString(0)).foreach { case (_, bins) =>
      val ids = bins.map(_.getAs[Long]("bin_id")).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length.toLong).toSeq)
      val sorted = bins.sortBy(_.getAs[Long]("bin_id"))
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo.getAs[Long]("last_doc_id") < hi.getAs[Long]("first_doc_id"))
        case _ =>
      }
    }
  }

  test("percentileGate: deciles 1..10 per lang, kept ⇔ decile ≤ KEEP_DECILES") {
    val rows = TextOps.percentileGate(spark, sf).collect()
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(d >= 1 && d <= 10)
      assert(r.getAs[Boolean]("kept") == (d <= TextOps.KEEP_DECILES))
    }
    // every lang contributes 10 deciles when it has ≥ 10 docs
    val docsPerLang = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      if (docsPerLang(lang) >= 10) assert(rs.length == 10)
    }
  }

  test("stratifiedSplit partitions every doc exactly once, splits labelled") {
    val split = TextOps.stratifiedSplit(spark, sf).collect()
    val total = split.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
    assert(split.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    // train dominates in every lang that has all three splits
    split.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val m = rs.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
      if (m.size == 3) assert(m("train") > m("val") && m("train") > m("test"))
    }
  }

  test("statsMoments correlation is bounded and covariance sign-consistent") {
    val rows = Kpis.statsMoments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getAs[Double]("corr")
      assert(corr >= -1.0 && corr <= 1.0)
      // corr and covariance must carry the same sign (corr = covar/(sx*sy))
      assert(math.signum(corr) == math.signum(r.getAs[Double]("covar_pop_raw")))
    }
  }

  test("exactPercentiles are ordered and within the data range") {
    import org.apache.spark.sql.functions.{max => smax, min => smin}
    val stats = Kpis.exactPercentiles(spark, sf).collect()
    val range = Tables.lineitem(spark, sf)
      .agg(smin("l_quantity"), smax("l_quantity")).collect().head
    val (lo, hi) = (range.getAs[Number](0).doubleValue,
      range.getAs[Number](1).doubleValue)
    stats.foreach { r =>
      val med = r.getAs[Double]("median_qty")
      val p90 = r.getAs[Double]("p90_qty")
      assert(med <= p90, "median cannot exceed p90")
      assert(med >= lo && p90 <= hi)
    }
  }

  test("saltedRevenueByNation equals the unsalted aggregate") {
    import Tables._
    val unsalted = orders(spark, sf)
      .join(customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        graft.engine.Num.dollars(
          sum(graft.engine.Num.cents(col("o_totalprice")))).as("revenue"))
      .orderBy("n_name")
    val salted = Kpis.saltedRevenueByNation(spark, sf)
    assert(salted.collect().toSeq == unsalted.collect().toSeq)
  }
}
