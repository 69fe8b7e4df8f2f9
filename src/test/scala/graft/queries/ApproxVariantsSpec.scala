package graft.queries

import graft.SparkSpec
import graft.rules.Profiler
import graft.Tables

/** Pins each approximate 100 TB swap-in against its exact counterpart
  * on real sf0.01 data: the approx forms are the shapes a cluster would
  * run (bounded state, mergeable sketches), and these cases prove they
  * stay within tolerance of the oracle-checked exact forms. */
class ApproxVariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("profileApprox distinct counts stay within HLL tolerance of exact at sf0.01") {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = byCol(Profiler.profile(Tables.load(spark, dir, "orders"), cols))
    val approx = byCol(Profiler.profileApprox(Tables.load(spark, dir, "orders"), cols))
    assert(approx.keySet === exact.keySet)
    for (c <- cols) {
      val (en, enulls, end) = exact(c)
      val (an, anulls, and) = approx(c)
      // Row/null counts are not sketched — they must agree exactly.
      assert(an === en && anulls === enulls)
      // HLL++ default rsd is 5%; allow 3 sigma.
      assert(math.abs(and - end) <= math.max(3, 0.15 * end),
        s"$c: approx ndv $and vs exact $end")
    }
  }

  test("approx_percentile stays within rank tolerance of exact percentiles at sf0.01") {
    def byFlag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(Analytics.qPercentiles(spark, dir))
    val approx = byFlag(Analytics.qPercentilesApprox(spark, dir))
    assert(approx.keySet === exact.keySet)
    for ((flag, es) <- exact; (e, a) <- es.zip(approx(flag))) {
      // accuracy=10000 → rank error ≤ n/10000; on this price
      // distribution that is well inside 1% of the value.
      assert(math.abs(a - e) <= 0.01 * math.abs(e),
        s"$flag: approx $a vs exact $e")
    }
  }

  test("topValuesApprox recovers the exact top-3 at sf0.01 (counts exact)") {
    val cols = Seq("o_orderstatus", "o_orderpriority")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("column_name", "rnk").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    // Support 0.01 keeps every value with ≥1% frequency as a candidate;
    // both columns' full domains clear that bar, so the sketch+recount
    // must equal the exact unpivot+count top-3 row for row.
    val approx = rows(Profiler.topValuesApprox(
      Tables.load(spark, dir, "orders"), cols, 3, 0.01))
    val exact = rows(ProfileQueries.qcTopValues(spark, dir)
      .select("column_name", "col_value", "cnt", "rnk"))
    assert(approx === exact)
  }

  test("approx-edge quantile PSI stays close to the exact-edge form at sf0.01") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Portable.md5Bucket
    val orders = Tables.load(spark, dir, "orders")
    val side = md5Bucket("qpsi", col("o_orderkey"), 100) < 50
    def byBin(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_a"), r.getAs[Double]("psi"))).toMap
    val exact = byBin(Profiler.psiQuantileBySide(
      orders, side, "o_totalprice", "o_orderkey", 10))
    val approx = byBin(Profiler.psiQuantileBySideApprox(
      orders, side, "o_totalprice", 10))
    assert(exact.keySet === (1L to 10L).toSet)
    assert(approx.keySet === (1L to 10L).toSet)
    val refTotal = exact.values.map(_._1).sum.toDouble
    for ((bin, (na, _)) <- approx) {
      // Equal-mass contract: every approx bin holds ≈ 1/10 of the
      // reference (rank error of accuracy=10000 is far below 3%).
      assert(math.abs(na - refTotal / 10) <= 0.03 * refTotal,
        s"bin $bin holds $na of $refTotal")
    }
    // Same-distribution halves: both forms must report ≈ zero drift.
    assert(exact.values.map(_._2).map(math.abs).sum <= 0.02)
    assert(approx.values.map(_._2).map(math.abs).sum <= 0.02)
  }

  test("sketch-merge rolling WAU stays within HLL tolerance of exact at sf0.01") {
    def byDay(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = byDay(EventQueries.qeWauRolling(spark, dir))
    val approx = byDay(EventQueries.qeWauRollingSketch(spark, dir))
    assert(approx.keySet === exact.keySet)
    for ((day, e) <- exact) {
      val a = approx(day)
      // lgK=14 → rsd ≈ 0.8%; allow 3 sigma with a small-count floor.
      assert(math.abs(a - e) <= math.max(3, 0.03 * e),
        s"$day: sketch wau $a vs exact $e")
    }
  }

  test("approx_percentile substitution holds on the documented-swap-in shapes") {
    // Several SURVEY items name "replace `percentile` with
    // `approx_percentile`" as their 100 TB swap-in without shipping a
    // separate callable (qe_skew_report, qe_step_latency,
    // qe_trend_robust, qe_time_to_nth, RuleSuggest's p1/p99 fences).
    // The price-distribution case above pins the substitution on a
    // smooth distribution; these two pin it on the shapes those sites
    // actually aggregate — a heavy-tailed per-key count frame and a
    // long-tailed inter-event gap frame.
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, dir, "events")
    // qe_skew_report's frame: per-user event counts (heavy-tailed).
    val counts = events.groupBy("user_id").agg(count(lit(1)).as("c"))
    val Seq(e50, e99, a50, a99) = counts
      .agg(expr("percentile(c, array(0.5D, 0.99D))").as("e"),
        expr("approx_percentile(c, array(0.5D, 0.99D), 10000)").as("a"))
      .select(element_at(col("e"), 1), element_at(col("e"), 2),
        element_at(col("a"), 1).cast("double"),
        element_at(col("a"), 2).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double])
    // approx_percentile returns an OBSERVED value (no interpolation);
    // on an integer count frame the exact interpolated percentile sits
    // between adjacent observed counts, so agreement within one count
    // step (plus rank tolerance) is the contract.
    assert(math.abs(a50 - e50) <= 1.0 + 0.01 * e50, s"p50 $a50 vs $e50")
    assert(math.abs(a99 - e99) <= 1.0 + 0.02 * e99, s"p99 $a99 vs $e99")
    // qe_step_latency's frame: per-user consecutive-event gaps in
    // seconds (long-tailed, span ~6 orders of magnitude).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = events
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .where(col("next_ts").isNotNull)
      .select(((unix_micros(col("next_ts")) - unix_micros(col("ts")))
        .cast("double") / lit(1000000.0)).as("gap_s"))
    val Seq(g50, g90, h50, h90) = gaps
      .agg(expr("percentile(gap_s, array(0.5D, 0.9D))").as("e"),
        expr("approx_percentile(gap_s, array(0.5D, 0.9D), 10000)").as("a"))
      .select(element_at(col("e"), 1), element_at(col("e"), 2),
        element_at(col("a"), 1), element_at(col("a"), 2))
      .head().toSeq.map(_.asInstanceOf[Double])
    // Long-tail guard: 2% relative at both probed ranks.
    assert(math.abs(h50 - g50) <= 0.02 * g50, s"gap p50 $h50 vs $g50")
    assert(math.abs(h90 - g90) <= 0.02 * g90, s"gap p90 $h90 vs $g90")
  }

  test("approx uniqueness audit stays within HLL tolerance of exact at sf0.01") {
    def byEntity(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("entity") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"))).toMap
    val exact = byEntity(ProfileQueries.qcUnique(spark, dir))
    val approx = byEntity(ProfileQueries.qcUniqueApprox(spark, dir))
    assert(approx.keySet === exact.keySet)
    for ((e, (en, ek)) <- exact) {
      val (an, ak) = approx(e)
      // Row counts are not sketched — exact agreement required.
      assert(an === en, s"$e rows")
      // rsd 2%, allow 3 sigma.
      assert(math.abs(ak - ek) <= math.max(3, 0.06 * ek),
        s"$e: approx keys $ak vs exact $ek")
    }
  }
}
