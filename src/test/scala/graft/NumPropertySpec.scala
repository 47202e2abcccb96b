package graft

import org.apache.spark.sql.functions._

import graft.engine.{Kpis, Num, Tables}

/** Property-style tests (SURVEY.md §5.3) over seeded sample batches:
  * percentage bounds, money round-trips, top-k prefix containment.
  * (Pure-function scalacheck properties live in TextFnsProps.) */
class NumPropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("pctFilledByPriority stays in [0,100]") {
    val bad = Kpis.pctFilledByPriority(spark, sf)
      .filter(col("pct_filled") < 0 || col("pct_filled") > 100)
    assert(bad.count() == 0)
  }

  test("cents/dollars round-trips two-decimal money exactly") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(1000)((rnd.nextInt(200000000) - 100000000) / 100.0)
    val out = samples.toDF("x")
      .select(col("x"), Num.dollars(Num.cents(col("x"))).as("y"))
      .filter(col("x") =!= col("y"))
    assert(out.count() == 0)
  }

  test("round2 is within 0.005 of the input") {
    val rnd = new scala.util.Random(7)
    val samples = Seq.fill(1000)(rnd.nextDouble() * 2e4 - 1e4)
    val bad = samples.toDF("x")
      .select(col("x"), Num.round2(col("x")).as("y"))
      .filter(abs(col("x") - col("y")) > 0.005 + 1e-9)
    assert(bad.count() == 0)
  }

  test("top-k equals the k-prefix of the full ordering") {
    val top = Kpis.topSuppliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val full = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey").agg(count(lit(1)).as("n_items"))
      .orderBy(col("n_items").desc, col("s_suppkey").asc)
      .collect().take(5).map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq == full.toSeq)
  }

  test("centroid stride caps K at IVF_MAX_CELLS for any corpus size") {
    import graft.engine.Sim
    // below the cap boundary the stride is the fixed training stride
    // (tested SFs stay byte-identical); above it K is bounded and the
    // stride is minimal for that bound
    for (n <- Seq(1L, 100L, 500L, 2000L, Sim.IVF_STRIDE * Sim.IVF_MAX_CELLS,
        2001L, 20000L, 200000L, 2000000L, 987654321L)) {
      val stride = Sim.centroidStride(n)
      val k = (n + stride - 1) / stride // upper bound on selected ids
      assert(stride >= Sim.IVF_STRIDE)
      assert(k <= Sim.IVF_MAX_CELLS,
        s"n=$n stride=$stride k=$k exceeds the cell cap")
      if (n <= Sim.IVF_STRIDE * Sim.IVF_MAX_CELLS)
        assert(stride == Sim.IVF_STRIDE, s"cap must not engage at n=$n")
      else assert((n + stride - 1) / stride == Sim.IVF_MAX_CELLS ||
        stride == (n + Sim.IVF_MAX_CELLS - 1) / Sim.IVF_MAX_CELLS)
    }
  }
}
