package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.rules.Profiler

/** Driver-contract queries for the profiling / distribution-monitoring
  * family ([[graft.rules.Profiler]]) — column profiles, z-score outlier
  * detection, and PSI drift between dataset halves.
  */
object ProfileQueries {

  private val profiledCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Column profile of `orders`: rows / nulls / exact distincts per
    * column in one scan (unpivot + two-level aggregation — measured 2×
    * the multi-distinct Expand form at sf0.1). */
  def qcProfile(spark: SparkSession, dir: String): DataFrame =
    Profiler.profileUnpivot(Tables.load(spark, dir, "orders"), profiledCols)
      .orderBy("column_name")

  val qcProfileSql: String = profiledCols.sorted.map { c =>
    s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
       |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |  COUNT(DISTINCT $c) AS n_distinct
       |FROM orders""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** Orders whose total deviates ≥ 1.6σ from their priority class's
    * mean — moment-based outlier detection, broadcast-join shaped. */
  def qcAnomaly(spark: SparkSession, dir: String): DataFrame =
    Profiler.zOutliers(Tables.load(spark, dir, "orders"),
      "o_totalprice", Seq("o_orderpriority"), 1.6)
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "z_score")
      .orderBy("o_orderkey")

  // Identical arithmetic to Profiler.zOutliers: decimal-exact moments,
  // Σ(cents²) through scale-0 decimal (single decimal→double rounding),
  // the same double op order, comparison on the ROUNDED z.
  val qcAnomalySql: String =
    """WITH m AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(c * c AS DECIMAL(38,0))) AS DOUBLE) AS q2
      |  FROM (SELECT o_orderpriority, o_totalprice,
      |          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |        FROM orders)
      |  GROUP BY o_orderpriority
      |)
      |SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
      |  round((o.o_totalprice - m.s / m.n)
      |    / sqrt(m.q2 / 1.0e4 / m.n - (m.s / m.n) * (m.s / m.n)), 6) AS z_score
      |FROM orders o JOIN m ON o.o_orderpriority = m.o_orderpriority
      |WHERE abs(round((o.o_totalprice - m.s / m.n)
      |    / sqrt(m.q2 / 1.0e4 / m.n - (m.s / m.n) * (m.s / m.n)), 6)) >= 1.6
      |ORDER BY o_orderkey""".stripMargin

  /** PSI drift between the two md5-split halves of `orders` over
    * 50k-wide totalprice bins — the self-consistency fixture (same
    * distribution ⇒ PSI ≈ 0; the VALUES are what the oracle checks). */
  def qcDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Bucket
    val bucket = md5Bucket("drift", col("o_orderkey"), 100)
    // Single-pass variant: one conditional-sum scan tags both halves —
    // the two-DataFrame drift would scan orders twice.
    Profiler.driftBySide(Tables.load(spark, dir, "orders"), bucket < 50,
      "o_totalprice", 50000.0)
      .orderBy("bin")
  }

  val qcDriftSql: String =
    """WITH tagged AS (
      |  SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
      |    ('0x' || substr(md5('drift:' || o_orderkey), 1, 8))::BIGINT % 100 < 50 AS in_a
      |  FROM orders
      |), ca AS (
      |  SELECT bin, COUNT(*) AS n_a,
      |    COUNT(*) / SUM(COUNT(*)) OVER () AS p
      |  FROM tagged WHERE in_a GROUP BY bin
      |), cb AS (
      |  SELECT bin, COUNT(*) AS n_b,
      |    COUNT(*) / SUM(COUNT(*)) OVER () AS q
      |  FROM tagged WHERE NOT in_a GROUP BY bin
      |)
      |SELECT ca.bin AS bin, ca.n_a, cb.n_b,
      |  round(ca.p, 6) AS share_a, round(cb.q, 6) AS share_b,
      |  round((ca.p - cb.q) * ln(ca.p / cb.q), 6) AS psi
      |FROM ca JOIN cb ON ca.bin = cb.bin
      |ORDER BY ca.bin""".stripMargin

  /** §2.13p — quantile-bin (equal-mass) PSI drift over the md5-split
    * halves of `orders`: edges = the reference half's deciles, Laplace-
    * smoothed shares so one-sided bins report a finite term instead of
    * being dropped — [[qcDrift]]'s fixed-width complement for skewed /
    * unknown-range columns ([[Profiler.psiQuantileBySide]]; the no-sort
    * approx_percentile edge variant is the 100 TB swap-in, pinned in
    * ApproxVariantsSpec). */
  def qcPsiQuantile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Bucket
    val bucket = md5Bucket("qpsi", col("o_orderkey"), 100)
    Profiler.psiQuantileBySide(Tables.load(spark, dir, "orders"),
      bucket < 50, "o_totalprice", "o_orderkey", 10)
      .orderBy("bin")
  }

  val qcPsiQuantileSql: String =
    """WITH tagged AS (
      |  SELECT o_orderkey AS k, o_totalprice AS v,
      |    ('0x' || substr(md5('qpsi:' || o_orderkey), 1, 8))::BIGINT % 100 < 50
      |      AS in_a
      |  FROM orders
      |), tiles AS (
      |  SELECT v, NTILE(10) OVER (ORDER BY v, k) AS t FROM tagged WHERE in_a
      |), es AS (
      |  SELECT list(e ORDER BY e) AS es FROM (
      |    SELECT MAX(v) AS e FROM tiles WHERE t < 10 GROUP BY t)
      |), binned AS (
      |  SELECT in_a, CAST(1 + len(list_filter(es, e -> v > e)) AS BIGINT) AS bin
      |  FROM tagged CROSS JOIN es
      |), agg AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM binned GROUP BY bin
      |)
      |SELECT bin, n_a, n_b,
      |  round((n_a + 0.5) / (SUM(n_a) OVER () + 5.0), 6) AS share_a,
      |  round((n_b + 0.5) / (SUM(n_b) OVER () + 5.0), 6) AS share_b,
      |  round(((n_a + 0.5) / (SUM(n_a) OVER () + 5.0)
      |      - (n_b + 0.5) / (SUM(n_b) OVER () + 5.0))
      |    * ln(((n_a + 0.5) / (SUM(n_a) OVER () + 5.0))
      |      / ((n_b + 0.5) / (SUM(n_b) OVER () + 5.0))), 6) AS psi
      |FROM agg
      |ORDER BY bin""".stripMargin

  /** §2.13q — winsorization impact report per order priority: what a
    * p1/p99 cap would do to o_totalprice BEFORE a pipeline applies it —
    * rows clipped on each side, mean before/after, and the mass moved —
    * the standard sanity read before outlier capping silently reshapes
    * a feature. Two passes over the grouped frame: exact interpolated
    * p1/p99 per group (one percentile aggregation), broadcast back,
    * then one conditional-sum pass; per-value DECIMAL casts before both
    * sums make the raw and clipped means accumulation-order-exact, so
    * no engine-ordered float sum appears. */
  def qcWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val fences = orders.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.01D, 0.99D))").as("__f"))
      .select(col("o_orderpriority"),
        element_at(col("__f"), 1).as("__lo"),
        element_at(col("__f"), 2).as("__hi"))
    def dsum(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    orders.join(broadcast(fences), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice") < col("__lo"), 1L).otherwise(0L))
          .as("n_clipped_low"),
        sum(when(col("o_totalprice") > col("__hi"), 1L).otherwise(0L))
          .as("n_clipped_high"),
        round(min(col("__lo")), 6).as("p01"),
        round(min(col("__hi")), 6).as("p99"),
        round(dsum(col("o_totalprice")) / count(lit(1)), 6).as("mean_raw"),
        round(dsum(greatest(least(col("o_totalprice"), col("__hi")), col("__lo")))
          / count(lit(1)), 6).as("mean_winsorized"))
      .orderBy("o_orderpriority")
  }

  val qcWinsorizeSql: String =
    """WITH f AS (
      |  SELECT o_orderpriority,
      |    quantile_cont(o_totalprice, 0.01) AS lo,
      |    quantile_cont(o_totalprice, 0.99) AS hi
      |  FROM orders GROUP BY o_orderpriority
      |)
      |SELECT o.o_orderpriority, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN o.o_totalprice < f.lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_low,
      |  CAST(SUM(CASE WHEN o.o_totalprice > f.hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_high,
      |  round(MIN(f.lo), 6) AS p01,
      |  round(MIN(f.hi), 6) AS p99,
      |  round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,12))) AS DOUBLE)
      |    / COUNT(*), 6) AS mean_raw,
      |  round(CAST(SUM(CAST(greatest(least(o.o_totalprice, f.hi), f.lo)
      |      AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS mean_winsorized
      |FROM orders o JOIN f ON o.o_orderpriority = f.o_orderpriority
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  /** §2.13i — binned Kolmogorov–Smirnov drift between the two md5-split
    * halves of `orders` over 20k-wide totalprice bins
    * ([[Profiler.ksDriftBySide]]); the cumulative complement of
    * [[qcDrift]]'s PSI, with no one-sided-bin blind spot. */
  def qcKsDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Bucket
    val bucket = md5Bucket("ks", col("o_orderkey"), 100)
    Profiler.ksDriftBySide(Tables.load(spark, dir, "orders"), bucket < 50,
      "o_totalprice", 20000.0)
      .orderBy("bin")
  }

  val qcKsDriftSql: String =
    """WITH tagged AS (
      |  SELECT CAST(FLOOR(o_totalprice / 20000.0) AS BIGINT) AS bin,
      |    ('0x' || substr(md5('ks:' || o_orderkey), 1, 8))::BIGINT % 100 < 50 AS in_a
      |  FROM orders
      |), c AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM tagged GROUP BY bin
      |), k AS (
      |  SELECT bin, n_a, n_b,
      |    CAST(SUM(n_a) OVER (ORDER BY bin) AS DOUBLE)
      |      / CAST(SUM(n_a) OVER () AS DOUBLE) AS ca,
      |    CAST(SUM(n_b) OVER (ORDER BY bin) AS DOUBLE)
      |      / CAST(SUM(n_b) OVER () AS DOUBLE) AS cb
      |  FROM c
      |)
      |SELECT bin, n_a, n_b, round(ca, 6) AS cdf_a, round(cb, 6) AS cdf_b,
      |  round(abs(ca - cb), 6) AS ks_dist
      |FROM k ORDER BY bin""".stripMargin

  private val topValueCols = Seq("o_orderstatus", "o_orderpriority")

  /** §2.13f — per-column heavy hitters: the top-3 most frequent values
    * of each profiled column, exact. ONE scan: values unpivot at the
    * scan into (column, value) pairs, the count aggregation gets
    * map-side combine on a domain bounded by the columns' cardinality,
    * and the rank window runs over that tiny counted frame — never the
    * data. The 100 TB swap-in for unbounded-cardinality columns is a
    * count-min/approx top-k sketch; for the bounded QC columns this
    * exact form is already one cheap pass. */
  def qcTopValues(spark: SparkSession, dir: String): DataFrame = {
    val stackExpr = topValueCols
      .map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("column_name")
      .orderBy(col("cnt").desc, col("col_value"))
    Tables.load(spark, dir, "orders")
      .select(expr(s"stack(${topValueCols.size}, $stackExpr) AS (column_name, col_value)"))
      .groupBy("column_name", "col_value")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= 3)
      .orderBy("column_name", "rnk")
  }

  val qcTopValuesSql: String = {
    val unioned = topValueCols
      .map(c => s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS col_value FROM orders")
      .mkString("\nUNION ALL\n")
    s"""WITH uv AS (
       |$unioned
       |), counts AS (
       |  SELECT column_name, col_value, COUNT(*) AS cnt
       |  FROM uv GROUP BY 1, 2
       |)
       |SELECT column_name, col_value, cnt, rnk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY column_name
       |    ORDER BY cnt DESC, col_value) AS BIGINT) AS rnk
       |  FROM counts) t
       |WHERE rnk <= 3
       |ORDER BY column_name, rnk""".stripMargin
  }

  /** §2.13g — key-sequence gap detection (sequential-integrity QC):
    * missing ranges in the distinct l_orderkey sequence. A global
    * LEAD window would funnel every key through ONE task; instead keys
    * bucket by `key div 4096`, in-bucket gaps come from a lead window
    * partitioned by bucket (parallel across buckets), and cross-bucket
    * gaps from a lead over the tiny per-bucket (min, max) frame. The
    * two gap sets are disjoint by construction (a gap either has both
    * endpoints' neighbors in one bucket or spans a boundary), and
    * their union is exactly the global-lead answer — which is what the
    * oracle computes. */
  def qcGaps(spark: SparkSession, dir: String): DataFrame =
    Profiler.sequenceGaps(Tables.load(spark, dir, "lineitem"), "l_orderkey")
      .orderBy("gap_start")

  val qcGapsSql: String =
    """WITH keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
      |g AS (SELECT k, LEAD(k) OVER (ORDER BY k) AS nxt FROM keys)
      |SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
      |  nxt - k - 1 AS n_missing
      |FROM g WHERE nxt > k + 1
      |ORDER BY gap_start""".stripMargin

  /** §2.13h — freshness / volume-completeness QC by month: row counts,
    * null rate of the money column, and a low-volume flag for months
    * under half the average monthly count. One fact-table aggregation;
    * the global average is a window over the tiny per-month frame (≈12
    * rows per year at ANY data scale), never a second scan. */
  def qcFreshness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("n_null_price"))
      .withColumn("null_rate", round(col("n_null_price") / col("n_orders"), 6))
      .withColumn("low_volume",
        col("n_orders") < lit(0.5) * avg(col("n_orders")).over(all))
      .orderBy("month")
  }

  val qcFreshnessSql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', o_orderdate) AS month,
      |    COUNT(*) AS n_orders,
      |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_price
      |  FROM orders GROUP BY 1)
      |SELECT month, n_orders, n_null_price,
      |  ROUND(n_null_price / n_orders, 6) AS null_rate,
      |  (n_orders < 0.5 * AVG(n_orders) OVER ()) AS low_volume
      |FROM m ORDER BY month""".stripMargin

  /** §2.13j — chi-square categorical drift between the two md5-split
    * halves of `events` over event_type: the two-sample homogeneity
    * test that complements PSI (13e, share-based) and KS (13i,
    * cumulative-numeric) for CATEGORICAL columns. ONE conditional-sum
    * scan builds the contingency table; expected counts and per-cell
    * chi² terms come from windows over the tiny category frame
    * (|categories| rows at any scale). All float arithmetic runs over
    * exact integer counts in a fixed expression order, so the oracle
    * agrees bit-for-bit before the final round. */
  def qcChi2Drift(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Bucket
    import org.apache.spark.sql.expressions.Window
    val inA = md5Bucket("chi2", col("event_id"), 100) < 50
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val eA = (col("n_a") + col("n_b")).cast("double") * col("tot_a") /
      (col("tot_a") + col("tot_b"))
    val eB = (col("n_a") + col("n_b")).cast("double") * col("tot_b") /
      (col("tot_a") + col("tot_b"))
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(sum(when(inA, 1L).otherwise(0L)).as("n_a"),
        sum(when(inA, 0L).otherwise(1L)).as("n_b"))
      .withColumn("tot_a", sum(col("n_a")).over(all))
      .withColumn("tot_b", sum(col("n_b")).over(all))
      .withColumn("e_a", eA)
      .withColumn("e_b", eB)
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("e_a"), 6).as("exp_a"), round(col("e_b"), 6).as("exp_b"),
        round((col("n_a") - col("e_a")) * (col("n_a") - col("e_a")) / col("e_a") +
          (col("n_b") - col("e_b")) * (col("n_b") - col("e_b")) / col("e_b"), 6)
          .as("chi2_term"))
      .orderBy("event_type")
  }

  val qcChi2DriftSql: String =
    """WITH t AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN ('0x' || substr(md5('chi2:' || event_id), 1, 8))::BIGINT % 100 < 50
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN ('0x' || substr(md5('chi2:' || event_id), 1, 8))::BIGINT % 100 < 50
      |      THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM events GROUP BY event_type
      |), w AS (
      |  SELECT *, CAST(SUM(n_a) OVER () AS BIGINT) AS tot_a,
      |    CAST(SUM(n_b) OVER () AS BIGINT) AS tot_b FROM t
      |), e AS (
      |  SELECT *,
      |    CAST(n_a + n_b AS DOUBLE) * tot_a / (tot_a + tot_b) AS e_a,
      |    CAST(n_a + n_b AS DOUBLE) * tot_b / (tot_a + tot_b) AS e_b
      |  FROM w
      |)
      |SELECT event_type, n_a, n_b,
      |  round(e_a, 6) AS exp_a, round(e_b, 6) AS exp_b,
      |  round((n_a - e_a) * (n_a - e_a) / e_a
      |      + (n_b - e_b) * (n_b - e_b) / e_b, 6) AS chi2_term
      |FROM e ORDER BY event_type""".stripMargin

  /** §2.13k — Tukey-fence (IQR) outlier detection on event values per
    * event type: the distribution-free robust complement of 13d's
    * moment-based z-score (a handful of extreme rows cannot drag the
    * fences the way they drag a mean/stddev). TWO passes by nature of
    * the statistic — an exact interpolated p25/p75 aggregation (tiny
    * output frame, broadcast back) and one counting pass over the fact
    * — with no third pass because both fences come from ONE percentile
    * aggregation (unlike MAD's median-of-deviations chain).
    * Fences are compared ROUNDED (qc_anomaly discipline) so the
    * boundary decision is taken on the same 6-dp value in both
    * engines. 100 TB swap-in: approx_percentile for the fence pass. */
  def qcIqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val fences = events.groupBy(col("event_type").as("f_type"))
      .agg(expr("percentile(value, array(0.25D, 0.75D))").as("__p"))
      .select(col("f_type"),
        round(element_at(col("__p"), 1), 6).as("p25"),
        round(element_at(col("__p"), 2), 6).as("p75"),
        round(element_at(col("__p"), 1) -
          lit(1.5) * (element_at(col("__p"), 2) - element_at(col("__p"), 1)), 6)
          .as("lo_fence"),
        round(element_at(col("__p"), 2) +
          lit(1.5) * (element_at(col("__p"), 2) - element_at(col("__p"), 1)), 6)
          .as("hi_fence"))
    events.join(broadcast(fences), col("event_type") === col("f_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        first(col("p25")).as("p25"), first(col("p75")).as("p75"),
        first(col("lo_fence")).as("lo_fence"),
        first(col("hi_fence")).as("hi_fence"),
        sum(when(col("value") < col("lo_fence") ||
          col("value") > col("hi_fence"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  val qcIqrOutliersSql: String =
    """WITH f AS (
      |  SELECT event_type AS f_type,
      |    round(quantile_cont(value, 0.25), 6) AS p25,
      |    round(quantile_cont(value, 0.75), 6) AS p75,
      |    round(quantile_cont(value, 0.25)
      |      - 1.5 * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)), 6) AS lo_fence,
      |    round(quantile_cont(value, 0.75)
      |      + 1.5 * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)), 6) AS hi_fence
      |  FROM events GROUP BY event_type
      |)
      |SELECT e.event_type, COUNT(*) AS n,
      |  MIN(f.p25) AS p25, MIN(f.p75) AS p75,
      |  MIN(f.lo_fence) AS lo_fence, MIN(f.hi_fence) AS hi_fence,
      |  CAST(SUM(CASE WHEN e.value < f.lo_fence OR e.value > f.hi_fence
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN f ON e.event_type = f.f_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  /** §2.13l — Benford first-digit conformance of order totals: the
    * leading significant digit's observed share vs Benford's
    * log10(1+1/d) expectation — the classic fabricated-numbers /
    * corrupted-feed tripwire for financial-style columns. The digit is
    * extracted from the decimal's STRING form (first char — totals are
    * ≥ 1), never via float log10, whose placement at powers of ten is
    * ulp-fragile; the expected shares are Scala-computed constants
    * inlined into BOTH engines' queries, so parity is arithmetic-free.
    * One aggregation pass; the share window runs over the ≤ 9-row digit
    * frame. */
  def qcBenford(spark: SparkSession, dir: String): DataFrame = {
    val expected = (1 to 9).map(d =>
      d -> BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val expectedCol = (e: Column) => expected.foldLeft(lit(0.0)) {
      case (acc, (d, p)) => when(e === d, lit(p)).otherwise(acc)
    }
    val all = Window.partitionBy()
    // decimal(18,4) first: double→decimal cast parity is the proven
    // pattern (EventQueries.valueSum), and decimal→string always prints
    // plain digits — double→string flips to scientific notation at
    // engine-specific magnitudes.
    Tables.load(spark, dir, "orders")
      .where(col("o_totalprice") >= 1)
      .groupBy(substring(col("o_totalprice").cast("decimal(18,4)")
        .cast("string"), 1, 1).cast("bigint").as("digit"))
      .agg(count(lit(1)).as("n"))
      .select(col("digit"), col("n"),
        round(col("n") / sum(col("n")).over(all), 6).as("share"),
        expectedCol(col("digit")).as("expected"))
      .withColumn("deviation", round(col("share") - col("expected"), 6))
      .orderBy("digit")
  }

  val qcBenfordSql: String = {
    val expected = (1 to 9).map(d =>
      s"WHEN $d THEN ${BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble}")
      .mkString(" ")
    s"""WITH c AS (
      |  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR), 1, 1) AS BIGINT)
      |    AS digit, COUNT(*) AS n
      |  FROM orders WHERE o_totalprice >= 1
      |  GROUP BY 1
      |),
      |s AS (
      |  SELECT digit, n, round(n / SUM(n) OVER (), 6) AS share,
      |    CASE digit $expected ELSE 0.0 END AS expected
      |  FROM c
      |)
      |SELECT digit, n, share, expected,
      |  round(share - expected, 6) AS deviation
      |FROM s ORDER BY digit""".stripMargin
  }

  /** §2.13m — Pearson correlation between value columns per group
    * (quantity vs extended price by return flag), decimal-exact: all
    * five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    * DECIMAL sums — order-independent, so one shuffle-stage aggregation
    * is deterministic — and the correlation assembles in doubles over
    * the tiny per-group frame with an op order the oracle mirrors
    * exactly. The built-in `corr` (float accumulation over rows) is the
    * single-engine shortcut; this form is the cross-engine-stable one. */
  def qcCorr(spark: SparkSession, dir: String): DataFrame = {
    def dsum(c: Column) = sum(c.cast("decimal(38,8)")).cast("double")
    val x = col("l_quantity").cast("decimal(18,4)")
    val y = col("l_extendedprice").cast("decimal(18,4)")
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast("double").as("__n"),
        dsum(x).as("__sx"), dsum(y).as("__sy"),
        dsum(x * y).as("__sxy"), dsum(x * x).as("__sxx"),
        dsum(y * y).as("__syy"))
      .select(col("l_returnflag"), col("__n").cast("bigint").as("n"),
        round((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
            (col("__n") * col("__syy") - col("__sy") * col("__sy"))), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val qcCorrSql: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS syy
      |  FROM (SELECT l_returnflag,
      |          CAST(l_quantity AS DECIMAL(19,4)) AS x,
      |          CAST(l_extendedprice AS DECIMAL(19,4)) AS y
      |        FROM lineitem)
      |  GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  round((n * sxy - sx * sy) /
      |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
      |    AS corr_qty_price
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** §2.13n — key-uniqueness audit across entities: for each declared
    * (table, key) pair, one row of row count, distinct-key count,
    * duplicated-key count, surplus-row count, and worst multiplicity.
    * The classic pre-join data-quality gate (a dup-keyed dimension
    * silently fans out every downstream join). Each entity is one
    * map-side-combinable groupBy on its key followed by a single-row
    * global fold — one shuffle per entity, no collect; the per-entity
    * rows union into the tiny report frame. o_custkey is deliberately
    * a NON-unique key so the dup columns carry real signal. */
  def qcUnique(spark: SparkSession, dir: String): DataFrame = {
    def audit(table: String, keyCols: Seq[String]): DataFrame =
      Tables.load(spark, dir, table)
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c")).as("__rows"), count(lit(1)).as("__keys"),
          sum(when(col("__c") > 1, 1L).otherwise(0L)).as("__dupkeys"),
          sum(when(col("__c") > 1, col("__c") - 1L).otherwise(0L)).as("__duprows"),
          max(col("__c")).as("__maxdup"))
        .select(lit(s"$table.${keyCols.mkString("+")}").as("entity"),
          col("__rows").cast("bigint").as("n_rows"),
          col("__keys").cast("bigint").as("n_keys"),
          col("__dupkeys").cast("bigint").as("n_dup_keys"),
          col("__duprows").cast("bigint").as("n_dup_rows"),
          col("__maxdup").cast("bigint").as("max_dup"))
    audit("orders", Seq("o_orderkey"))
      .unionByName(audit("orders", Seq("o_custkey")))
      .unionByName(audit("lineitem", Seq("l_orderkey", "l_linenumber")))
      .unionByName(audit("events", Seq("event_id")))
      .unionByName(audit("documents", Seq("doc_id")))
      .orderBy("entity")
  }

  val qcUniqueSql: String = {
    def auditSql(table: String, keys: Seq[String]): String = {
      val entity = s"$table.${keys.mkString("+")}"
      s"""SELECT '$entity' AS entity,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  COUNT(*) AS n_keys,
         |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
         |  CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS n_dup_rows,
         |  CAST(MAX(c) AS BIGINT) AS max_dup
         |FROM (SELECT COUNT(*) AS c FROM $table
         |      GROUP BY ${keys.mkString(", ")})""".stripMargin
    }
    Seq(
      auditSql("orders", Seq("o_orderkey")),
      auditSql("orders", Seq("o_custkey")),
      auditSql("lineitem", Seq("l_orderkey", "l_linenumber")),
      auditSql("events", Seq("event_id")),
      auditSql("documents", Seq("doc_id")))
      .mkString("", "\nUNION ALL\n", "\nORDER BY entity")
  }

  /** [[qcUnique]]'s 100 TB swap-in, shipped callable: HLL
    * approx_count_distinct replaces the per-key groupBy, collapsing
    * the audit to ONE sketch pass per entity — no shuffle wider than
    * the mergeable sketch, for the monitoring cadence where a ±2%
    * distinct estimate answers "did the key break" without paying for
    * exactness. Output keeps the shared columns (entity, n_rows,
    * n_keys, n_dup_rows — estimated) but NOT the per-key multiplicity
    * columns (n_dup_keys, max_dup), which have no sketch analogue —
    * a consumer of those needs the exact audit. ApproxVariantsSpec
    * pins this to the exact audit at sf0.01 tolerance. */
  def qcUniqueApprox(spark: SparkSession, dir: String,
      rsd: Double = 0.02): DataFrame = {
    def audit(table: String, keyCols: Seq[String]): DataFrame =
      Tables.load(spark, dir, table)
        .agg(count(lit(1)).as("__rows"),
          approx_count_distinct(struct(keyCols.map(col): _*), rsd)
            .as("__keys"))
        .select(lit(s"$table.${keyCols.mkString("+")}").as("entity"),
          col("__rows").cast("bigint").as("n_rows"),
          col("__keys").cast("bigint").as("n_keys"),
          greatest(col("__rows") - col("__keys"), lit(0L))
            .cast("bigint").as("n_dup_rows"))
    audit("orders", Seq("o_orderkey"))
      .unionByName(audit("orders", Seq("o_custkey")))
      .unionByName(audit("lineitem", Seq("l_orderkey", "l_linenumber")))
      .unionByName(audit("events", Seq("event_id")))
      .unionByName(audit("documents", Seq("doc_id")))
      .orderBy("entity")
  }

  /** §2.13o — MAD (median absolute deviation) robust outlier summary
    * per event type: median, MAD, and the count beyond the standard
    * 3·1.4826·MAD fence. The robust sibling of 13d's z-score (mean/σ
    * are dragged by the very outliers they hunt; the median pair is
    * not) — the right default for heavy-tailed value columns. Three
    * passes by construction (median → MAD → fence count), each a
    * combinable aggregation with the tiny per-type medians broadcast
    * back; the approx-percentile swap-in collapses it to two sketch
    * passes at 100 TB. Fence arithmetic is written in the same literal
    * order in both engines so the boundary double is bit-identical. */
  def qcMad(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val med = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5D)").as("__med"))
    val mad = events.join(broadcast(med), Seq("event_type"))
      .groupBy("event_type")
      .agg(expr("percentile(abs(value - __med), 0.5D)").as("__mad"))
    events.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        first(col("__med")).as("__m"),
        first(col("__mad")).as("__d"),
        sum(when(abs(col("value") - col("__med")) >
            lit(3.0) * lit(1.4826) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("n"),
        round(col("__m"), 6).as("median_value"),
        round(col("__d"), 6).as("mad"),
        col("n_outliers").cast("bigint").as("n_outliers"))
      .orderBy("event_type")
  }

  val qcMadSql: String =
    """WITH m AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type
      |), s AS (
      |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      |  FROM events e JOIN m ON e.event_type = m.event_type
      |  GROUP BY e.event_type
      |)
      |SELECT e.event_type, COUNT(*) AS n,
      |  round(m.med, 6) AS median_value,
      |  round(s.mad, 6) AS mad,
      |  CAST(SUM(CASE WHEN abs(e.value - m.med) > 3.0 * 1.4826 * s.mad
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e
      |JOIN m ON e.event_type = m.event_type
      |JOIN s ON e.event_type = s.event_type
      |GROUP BY e.event_type, m.med, s.mad
      |ORDER BY e.event_type""".stripMargin

  /** §2.13p — categorical distribution-shape profile: Shannon entropy
    * (bits), Gini impurity, distinct-value count, and mode share per
    * profiled column — the "is this column degenerate / skewed /
    * healthy" read that counts alone don't give (a 2-value column at
    * 50/50 and at 99/1 have the same ndv). ONE scan: columns unpivot
    * at the scan, value counts aggregate with map-side combine on the
    * bounded categorical domain, and the per-column reduction runs
    * over that tiny counted frame. The float −p·log₂p and p² terms are
    * DECIMAL-cast before summation (qe_heavytail pattern), so
    * accumulation order cannot move the 6-dp result. */
  def qcEntropyCols(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderstatus", "o_orderpriority")
    val stackExpr = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    def dsum(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    val p = col("cnt").cast("double") / col("total").cast("double")
    val byCol = Window.partitionBy("column_name")
    Tables.load(spark, dir, "orders")
      .select(expr(s"stack(${cols.size}, $stackExpr) AS (column_name, col_value)"))
      .groupBy("column_name", "col_value")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(byCol))
      .groupBy("column_name")
      .agg(count(lit(1)).as("n_values"),
        round(dsum(-p * log(2.0, p)), 6).as("entropy_bits"),
        round(lit(1.0) - dsum(p * p), 6).as("gini"),
        round(max(col("cnt")).cast("double") /
          max(col("total")).cast("double"), 6).as("mode_share"))
      .orderBy("column_name")
  }

  val qcEntropyColsSql: String = {
    val cols = Seq("o_orderstatus", "o_orderpriority")
    val unioned = cols
      .map(c => s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS col_value FROM orders")
      .mkString("\nUNION ALL\n")
    s"""WITH uv AS (
       |$unioned
       |), counts AS (
       |  SELECT column_name, col_value, COUNT(*) AS cnt,
       |    SUM(COUNT(*)) OVER (PARTITION BY column_name) AS total
       |  FROM uv GROUP BY 1, 2
       |)
       |SELECT column_name, COUNT(*) AS n_values,
       |  round(CAST(SUM(CAST(
       |    -(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
       |      * log2(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
       |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS entropy_bits,
       |  round(1.0 - CAST(SUM(CAST(
       |    (CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
       |      * (CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
       |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS gini,
       |  round(CAST(MAX(cnt) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 6)
       |    AS mode_share
       |FROM counts
       |GROUP BY column_name
       |ORDER BY column_name""".stripMargin
  }

  /** §2.13s — Cramér's V association between two categorical columns
    * (o_orderstatus × o_orderpriority): the effect-size companion to
    * 13j's chi² — chi² grows with N, so a monitoring cadence needs the
    * N-normalized V ∈ [0,1] to say whether an association is WEAK or
    * STRONG, not merely significant. ONE aggregation pass builds the
    * contingency cells (a |statuses|×|priorities| frame at any data
    * scale); row/column marginals come from windows over that tiny
    * frame; the final reduction emits chi², dof, and V in a single row.
    * All float terms derive from exact integer counts in a fixed
    * expression order mirrored by the oracle; the per-cell chi² terms
    * are DECIMAL-cast before the final sum so accumulation order
    * cannot flap the hash. */
  def qcCramersV(spark: SparkSession, dir: String): DataFrame = {
    val rowW = Window.partitionBy("o_orderstatus")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val colW = Window.partitionBy("o_orderpriority")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val allW = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val e = col("row_tot").cast("double") * col("col_tot") / col("tot")
    val cells = Tables.load(spark, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_tot", sum(col("n")).over(rowW))
      .withColumn("col_tot", sum(col("n")).over(colW))
      .withColumn("tot", sum(col("n")).over(allW))
      .withColumn("term",
        (col("n") - e) * (col("n") - e) / e)
    cells.agg(
        sum(col("n")).cast("bigint").as("n_rows"),
        count_distinct(col("o_orderstatus")).as("__r"),
        count_distinct(col("o_orderpriority")).as("__c"),
        sum(col("term").cast("decimal(38,12)")).cast("double").as("__chi2"))
      .select(col("n_rows"),
        round(col("__chi2"), 6).as("chi2"),
        ((col("__r") - 1) * (col("__c") - 1)).cast("bigint").as("dof"),
        round(sqrt(col("__chi2") /
          (col("n_rows").cast("double") *
            least(col("__r") - 1, col("__c") - 1))), 6).as("cramers_v"))
  }

  val qcCramersVSql: String =
    """WITH cells AS (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2
      |), m AS (
      |  SELECT *,
      |    SUM(n) OVER (PARTITION BY o_orderstatus) AS row_tot,
      |    SUM(n) OVER (PARTITION BY o_orderpriority) AS col_tot,
      |    SUM(n) OVER () AS tot
      |  FROM cells
      |), t AS (
      |  SELECT *,
      |    (n - CAST(row_tot AS DOUBLE) * col_tot / tot)
      |      * (n - CAST(row_tot AS DOUBLE) * col_tot / tot)
      |      / (CAST(row_tot AS DOUBLE) * col_tot / tot) AS term
      |  FROM m
      |), agg AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
      |    COUNT(DISTINCT o_orderstatus) AS r,
      |    COUNT(DISTINCT o_orderpriority) AS c,
      |    CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE) AS chi2
      |  FROM t
      |)
      |SELECT n_rows, round(chi2, 6) AS chi2,
      |  CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
      |  round(sqrt(chi2 / (CAST(n_rows AS DOUBLE) *
      |    least(r - 1, c - 1))), 6) AS cramers_v
      |FROM agg""".stripMargin

  /** §2.13t — functional-dependency audit: does column A determine
    * column B? The schema-inference / normalization primitive a
    * profiler owes its users: each candidate FD costs ONE shuffle on
    * the determinant (distinct-count of images per determinant value,
    * map-side partial), and the violation census reads off the grouped
    * frame — no pair joins, no quadratic anything, at any scale.
    * `n_violating` = determinant values mapping to >1 image;
    * `max_images` = the worst fan-out (1 everywhere ⟺ the FD holds). */
  def qcFd(spark: SparkSession, dir: String): DataFrame = {
    def fd(table: String, det: String, img: String): DataFrame =
      Tables.load(spark, dir, table)
        .groupBy(col(det).as("__a"))
        .agg(count_distinct(col(img)).as("__imgs"))
        .agg(count(lit(1)).as("n_determinants"),
          sum(when(col("__imgs") > 1, 1L).otherwise(0L)).cast("bigint")
            .as("n_violating"),
          max(col("__imgs")).cast("bigint").as("max_images"))
        .select(lit(s"$table.$det->$img").as("fd"),
          col("n_determinants"), col("n_violating"), col("max_images"),
          (col("n_violating") === 0).as("holds"))
    Seq(
      fd("orders", "o_orderkey", "o_orderstatus"),
      fd("orders", "o_custkey", "o_orderpriority"),
      fd("lineitem", "l_orderkey", "l_linestatus"),
      fd("lineitem", "l_partkey", "l_suppkey"),
      fd("customer", "c_nationkey", "c_mktsegment"))
      .reduce(_ unionByName _)
      .orderBy("fd")
  }

  val qcFdSql: String = {
    def piece(table: String, det: String, img: String) =
      s"""SELECT '$table.$det->$img' AS fd,
         |  COUNT(*) AS n_determinants,
         |  CAST(SUM(CASE WHEN imgs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating,
         |  CAST(MAX(imgs) AS BIGINT) AS max_images,
         |  (SUM(CASE WHEN imgs > 1 THEN 1 ELSE 0 END) = 0) AS holds
         |FROM (
         |  SELECT $det, COUNT(DISTINCT $img) AS imgs
         |  FROM $table GROUP BY $det
         |) t""".stripMargin
    Seq(piece("orders", "o_orderkey", "o_orderstatus"),
      piece("orders", "o_custkey", "o_orderpriority"),
      piece("lineitem", "l_orderkey", "l_linestatus"),
      piece("lineitem", "l_partkey", "l_suppkey"),
      piece("customer", "c_nationkey", "c_mktsegment"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  /** §2.13u — candidate-key discovery: which single columns uniquely
    * identify a row? Per table ONE aggregation computes row count plus
    * an exact distinct count per column (Spark expands the grouping
    * sets — still one scan, partial aggregation throughout; swap in
    * approx_count_distinct for a first pass at extreme widths), then
    * the per-column rows unpivot from the 1-row frame. The profiling
    * complement of [[qcFd]]: a key is the degenerate FD that
    * determines EVERY column. */
  def qcKeys(spark: SparkSession, dir: String): DataFrame = {
    def keys(table: String, cols: Seq[String]): DataFrame = {
      val agg = Tables.load(spark, dir, table)
        .agg(count(lit(1)).as("__n"),
          cols.map(c => count_distinct(col(c)).as(s"__d_$c")): _*)
      val stacked = explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(s"__d_$c").as("n_distinct"))): _*))
      agg.select(col("__n"), stacked.as("kv"))
        .select(lit(table).as("table_name"), col("kv.column_name"),
          col("__n").as("n_rows"), col("kv.n_distinct"),
          (col("kv.n_distinct") === col("__n")).as("is_key"))
    }
    Seq(
      keys("orders", Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")),
      keys("customer", Seq("c_custkey", "c_name", "c_nationkey",
        "c_acctbal", "c_mktsegment")))
      .reduce(_ unionByName _)
      .orderBy("table_name", "column_name")
  }

  val qcKeysSql: String = {
    def piece(table: String, c: String) =
      s"""SELECT '$table' AS table_name, '$c' AS column_name,
         |  (SELECT COUNT(*) FROM $table) AS n_rows,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  (COUNT(DISTINCT $c) = (SELECT COUNT(*) FROM $table)) AS is_key
         |FROM $table""".stripMargin
    (Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority").map(piece("orders", _)) ++
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment").map(piece("customer", _)))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")
  }

  /** §2.13v — mutual information between two categorical columns, in
    * bits: the information-theoretic companion to 13s's Cramér's V
    * (V measures association strength; MI measures how many bits one
    * column reveals about the other — the feature-redundancy /
    * leakage-screening read). One aggregation pass builds the
    * contingency cells; marginals and the total are windows over that
    * bounded |r|×|c| frame. The cross-cell sum of per-cell double
    * terms would be accumulation-order-dependent as a SUM, so the
    * cells collapse to ONE sorted array and reduce by an explicit
    * left fold — deterministic on both engines (DuckDB's list_reduce
    * is the same left fold; IEEE 0+x = x makes the seeds agree). */
  def qcMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def mi(table: String, df: DataFrame, ca: Column, caName: String,
        cb: Column, cbName: String): DataFrame = {
      val cells = df.select(ca.cast("string").as("__a"),
          cb.cast("string").as("__b"))
        .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
      val full = Window.partitionBy()
      val term = (col("__c").cast("double") / col("__n").cast("double")) *
        log2((col("__c").cast("double") * col("__n").cast("double"))
          / (col("__ra").cast("double") * col("__rb").cast("double")))
      cells
        .withColumn("__ra", sum("__c").over(Window.partitionBy("__a")))
        .withColumn("__rb", sum("__c").over(Window.partitionBy("__b")))
        .withColumn("__n", sum("__c").over(full))
        .select(struct(col("__a"), col("__b"), term.as("t")).as("__cell"),
          col("__n"))
        .groupBy()
        .agg(max(col("__n")).cast("bigint").as("n_rows"),
          count(lit(1)).cast("bigint").as("n_cells"),
          aggregate(array_sort(collect_list(col("__cell"))), lit(0.0),
            (acc, x) => acc + x.getField("t")).as("__mi"))
        .select(lit(s"$table.$caName|$cbName").as("relation"),
          col("n_rows"), col("n_cells"),
          round(col("__mi"), 6).as("mi_bits"))
    }
    val orders = Tables.load(spark, dir, "orders")
    val events = Tables.load(spark, dir, "events")
    val customer = Tables.load(spark, dir, "customer")
    Seq(
      mi("orders", orders, col("o_orderstatus"), "o_orderstatus",
        col("o_orderpriority"), "o_orderpriority"),
      mi("events", events, col("event_type"), "event_type",
        dayofweek(col("ts")), "dow"),
      mi("customer", customer, col("c_mktsegment"), "c_mktsegment",
        col("c_nationkey"), "c_nationkey"))
      .reduce(_ unionByName _)
      .orderBy("relation")
  }

  val qcMutualInfoSql: String = {
    def piece(table: String, caExpr: String, caName: String,
        cbExpr: String, cbName: String) =
      s"""SELECT '$table.$caName|$cbName' AS relation,
         |  CAST(MAX(n) AS BIGINT) AS n_rows, COUNT(*) AS n_cells,
         |  round(list_reduce(
         |    list((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
         |      * log2((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
         |          / (CAST(ra AS DOUBLE) * CAST(rb AS DOUBLE)))
         |      ORDER BY a, b),
         |    (x, y) -> x + y), 6) AS mi_bits
         |FROM (
         |  SELECT a, b, c,
         |    SUM(c) OVER (PARTITION BY a) AS ra,
         |    SUM(c) OVER (PARTITION BY b) AS rb,
         |    SUM(c) OVER () AS n
         |  FROM (
         |    SELECT CAST($caExpr AS VARCHAR) AS a,
         |      CAST($cbExpr AS VARCHAR) AS b, COUNT(*) AS c
         |    FROM $table GROUP BY 1, 2
         |  ) cells
         |) t""".stripMargin
    Seq(
      piece("orders", "o_orderstatus", "o_orderstatus",
        "o_orderpriority", "o_orderpriority"),
      piece("events", "event_type", "event_type",
        "dayofweek(ts) + 1", "dow"),
      piece("customer", "c_mktsegment", "c_mktsegment",
        "c_nationkey", "c_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  /** §2.13w — KMV distinct-count sketch audit per source
    * ([[graft.operators.KmvSketch]]): the k smallest md5 token hashes
    * give estimate (k−1)·2³²/h₍ₖ₎ of the source's distinct-token count,
    * reported against the exact count. The sketch is the bounded-state
    * COUNT(DISTINCT) swap-in that, unlike HLL, is deterministic and
    * engine-portable — this oracle replays the ENTIRE sketch pipeline
    * (hashing, k-min selection, estimator arithmetic) value-exactly in
    * SQL, which no HLL register layout allows. Raw (source, token_hash)
    * rows feed the aggregator directly: duplicates are absorbed by the
    * distinct insert, partials combine map-side, and only ≤ k-entry
    * states cross the shuffle — no exploded-postings distinct first.
    * The exact count runs alongside for the report; production at
    * unbounded cardinality drops it and keeps the sketch. */
  def qcKmv(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.{md5Hash32, tokens}
    import graft.operators.KmvSketch
    val k = 64
    Tables.load(spark, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("__tok"))
      .groupBy("source")
      .agg(
        countDistinct(col("__tok")).as("n_distinct_exact"),
        KmvSketch.kmins(k)(md5Hash32(col("__tok"))).as("__kmins"))
      .select(col("source"), col("n_distinct_exact"),
        size(col("__kmins")).as("n_sketch"),
        element_at(col("__kmins"), -1).as("kth_hash"),
        when(size(col("__kmins")) < k, size(col("__kmins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            element_at(col("__kmins"), -1).cast("double"))
          .as("kmv_estimate"))
      .orderBy("source")
  }

  val qcKmvSql: String =
    """WITH toks AS (
      |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), hashed AS (
      |  SELECT DISTINCT source,
      |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
      |  FROM toks
      |), ranked AS (
      |  SELECT source, h,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
      |  FROM hashed
      |), km AS (
      |  SELECT source, CAST(COUNT(*) AS INT) AS n_sketch, MAX(h) AS kth_hash
      |  FROM ranked WHERE rn <= 64 GROUP BY source
      |), ex AS (
      |  SELECT source, COUNT(DISTINCT tok) AS n_distinct_exact
      |  FROM toks GROUP BY source
      |)
      |SELECT km.source, ex.n_distinct_exact, km.n_sketch, km.kth_hash,
      |  CASE WHEN km.n_sketch < 64 THEN CAST(km.n_sketch AS DOUBLE)
      |       ELSE 63.0 * 4294967296.0 / CAST(km.kth_hash AS DOUBLE)
      |  END AS kmv_estimate
      |FROM km JOIN ex ON km.source = ex.source
      |ORDER BY km.source""".stripMargin

  /** §2.13x — Mahalanobis multivariate outlier census per group: rows
    * whose (quantity, price) pair is improbable under the group's 2-D
    * covariance — the correlated-columns complement of the univariate
    * z-score screen (13d), which cannot flag a row that is normal in
    * each margin but abnormal jointly. Closed-form 2×2 inverse, so no
    * linear algebra library: d² = (dx²·vyy − 2·dx·dy·vxy + dy²·vxx)/det.
    * Moments come from ONE decimal-exact aggregation (the qc_corr
    * discipline); the tiny per-group moment frame broadcasts back onto
    * the fact scan for the census pass — two scans, one shuffle each,
    * no window. Threshold 9.21034 = χ²(2 df) at 99%. Every double op
    * is staged identically in both engines, so the census booleans and
    * rounded extremes hash-match. */
  def qcMahalanobis(spark: SparkSession, dir: String): DataFrame = {
    def dsum(c: Column) = sum(c.cast("decimal(38,8)")).cast("double")
    val x = col("l_quantity").cast("decimal(18,4)")
    val y = col("l_extendedprice").cast("decimal(18,4)")
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("double").as("__x"),
        col("l_extendedprice").cast("double").as("__y"))
    val m = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast("double").as("__n"),
        dsum(x).as("__sx"), dsum(y).as("__sy"),
        dsum(x * y).as("__sxy"), dsum(x * x).as("__sxx"),
        dsum(y * y).as("__syy"))
      .select(col("l_returnflag"), col("__n"),
        (col("__sx") / col("__n")).as("__mux"),
        (col("__sy") / col("__n")).as("__muy"),
        col("__sxx"), col("__sxy"), col("__syy"))
      .select(col("l_returnflag"), col("__n"), col("__mux"), col("__muy"),
        (col("__sxx") / col("__n") - col("__mux") * col("__mux")).as("__vxx"),
        (col("__sxy") / col("__n") - col("__mux") * col("__muy")).as("__vxy"),
        (col("__syy") / col("__n") - col("__muy") * col("__muy")).as("__vyy"))
      .withColumn("__det",
        col("__vxx") * col("__vyy") - col("__vxy") * col("__vxy"))
    li.join(broadcast(m), "l_returnflag")
      .withColumn("__dx", col("__x") - col("__mux"))
      .withColumn("__dy", col("__y") - col("__muy"))
      .withColumn("__d2",
        (col("__dx") * col("__dx") * col("__vyy") -
          lit(2.0) * col("__dx") * col("__dy") * col("__vxy") +
          col("__dy") * col("__dy") * col("__vxx")) / col("__det"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__d2") > 9.21034, 1L).otherwise(0L)).as("n_outliers"),
        round(max(col("__d2")), 6).as("max_d2"))
      .withColumn("outlier_rate",
        round(col("n_outliers").cast("double") / col("n_rows").cast("double"), 6))
      .select("l_returnflag", "n_rows", "n_outliers", "outlier_rate", "max_d2")
      .orderBy("l_returnflag")
  }

  val qcMahalanobisSql: String =
    """WITH f AS (
      |  SELECT l_returnflag,
      |    CAST(l_quantity AS DOUBLE) AS x,
      |    CAST(l_extendedprice AS DOUBLE) AS y,
      |    CAST(l_quantity AS DECIMAL(19,4)) AS xd,
      |    CAST(l_extendedprice AS DECIMAL(19,4)) AS yd
      |  FROM lineitem
      |), s AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(xd AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(yd AS DECIMAL(38,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(xd * yd AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(xd * xd AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(yd * yd AS DECIMAL(38,8))) AS DOUBLE) AS syy
      |  FROM f GROUP BY l_returnflag
      |), mu AS (
      |  SELECT l_returnflag, n, sx / n AS mux, sy / n AS muy,
      |    sxx, sxy, syy
      |  FROM s
      |), v AS (
      |  SELECT l_returnflag, n, mux, muy,
      |    sxx / n - mux * mux AS vxx,
      |    sxy / n - mux * muy AS vxy,
      |    syy / n - muy * muy AS vyy
      |  FROM mu
      |), d AS (
      |  SELECT l_returnflag, n, mux, muy, vxx, vxy, vyy,
      |    vxx * vyy - vxy * vxy AS det
      |  FROM v
      |), r AS (
      |  SELECT f.l_returnflag,
      |    ((f.x - d.mux) * (f.x - d.mux) * d.vyy
      |      - 2.0 * (f.x - d.mux) * (f.y - d.muy) * d.vxy
      |      + (f.y - d.muy) * (f.y - d.muy) * d.vxx) / d.det AS d2
      |  FROM f JOIN d ON f.l_returnflag = d.l_returnflag
      |)
      |SELECT l_returnflag,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN d2 > 9.21034 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  round(CAST(SUM(CASE WHEN d2 > 9.21034 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate,
      |  round(MAX(d2), 6) AS max_d2
      |FROM r GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** §2.13y — drift TIMELINE: monthly PSI of the order-value
    * distribution against the EARLIEST month as baseline — 13e answers
    * "did it drift between two cohorts"; this answers "when, and how
    * fast": a gradual ramp reads completely differently from one
    * broken month. Same fixed-width bins and common-bin inner-join
    * discipline as [qc_drift] (one-sided bins drop); the per-month PSI
    * sum folds over the bin-sorted term list, never a float row-SUM.
    * One (month, bin) count collapse, baseline shares broadcast back,
    * output ≤ months rows. */
  def qcDriftTimeline(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val counts = Tables.load(spark, dir, "orders")
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        floor(col("o_totalprice") / lit(50000.0)).cast("bigint").as("bin"))
      .groupBy("month", "bin").agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy("month")))
      .withColumn("p", col("n").cast("double") / col("tot").cast("double"))
      .withColumn("m0", min(col("month")).over(all))
    val base = counts.where(col("month") === col("m0"))
      .select(col("bin"), col("p").as("p0"))
    counts
      .join(broadcast(base), "bin")
      .withColumn("term",
        (col("p") - col("p0")) * log(col("p") / col("p0")))
      .groupBy("month")
      .agg(first(col("tot")).as("n_orders"),
        count(lit(1)).as("n_common_bins"),
        sort_array(collect_list(struct(col("bin"), col("term")))).as("__t"))
      .select(col("month"), col("n_orders"), col("n_common_bins"),
        round(aggregate(col("__t"), lit(0.0),
          (a, x) => a + x.getField("term")), 6).as("psi"))
      .orderBy("month")
  }

  val qcDriftTimelineSql: String =
    """WITH counts AS (
      |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE)
      |      AS month,
      |    CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1, 2
      |), shares AS (
      |  SELECT month, bin, n,
      |    CAST(SUM(n) OVER (PARTITION BY month) AS BIGINT) AS tot,
      |    CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY month) AS DOUBLE)
      |      AS p,
      |    MIN(month) OVER () AS m0
      |  FROM counts
      |), base AS (
      |  SELECT bin, p AS p0 FROM shares WHERE month = m0
      |), terms AS (
      |  SELECT s.month, s.tot, s.bin,
      |    (s.p - b.p0) * ln(s.p / b.p0) AS term
      |  FROM shares s JOIN base b ON s.bin = b.bin
      |)
      |SELECT month, MIN(tot) AS n_orders,
      |  CAST(COUNT(*) AS BIGINT) AS n_common_bins,
      |  round(list_reduce(list_prepend(0.0, list(term ORDER BY bin)),
      |    (a, b) -> a + b), 6) AS psi
      |FROM terms GROUP BY month
      |ORDER BY month""".stripMargin

  /** Declared (table, column, regex) format contracts for [[qcFormat]] —
    * anchored patterns only: `rlike`/`regexp_matches` are both
    * contains-semantics, anchors make them full-match in any dialect. */
  private val formatContracts: Seq[(String, String, String)] = Seq(
    ("customer", "c_name", "^Customer#[0-9]{9}$"),
    ("customer", "c_mktsegment", "^[A-Z]+$"),
    ("orders", "o_orderpriority", "^[1-5]-[A-Z]+$"))

  /** §2.13z — format-conformance profile: per declared (table, column,
    * anchored-regex) contract, row count, matching count, match rate,
    * and the minimum violating value as the triage example — the
    * free-text cousin of the schema gate (13b2 checks TYPES; this
    * checks the string SHAPE feeds silently break: id formats, enum
    * spellings, priority codes). One combinable aggregation per
    * contract column, a few-row report; deterministic example via MIN,
    * no sampling. */
  def qcFormat(spark: SparkSession, dir: String): DataFrame =
    formatContracts.map { case (table, column, pattern) =>
      Tables.load(spark, dir, table).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(column).rlike(pattern), 1L).otherwise(0L))
          .as("n_matching"),
        min(when(!col(column).rlike(pattern), col(column)))
          .as("example_violation"))
        .select(lit(table).as("table_name"), lit(column).as("column_name"),
          lit(pattern).as("pattern"), col("n_rows"), col("n_matching"),
          round(col("n_matching").cast("double") / col("n_rows").cast("double"), 6)
            .as("match_rate"),
          col("example_violation"))
    }.reduce(_ unionByName _).orderBy("table_name", "column_name")

  val qcFormatSql: String = formatContracts.map { case (table, column, pattern) =>
    s"""SELECT '$table' AS table_name, '$column' AS column_name,
       |  '$pattern' AS pattern,
       |  COUNT(*) AS n_rows,
       |  CAST(SUM(CASE WHEN regexp_matches($column, '$pattern')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matching,
       |  round(CAST(SUM(CASE WHEN regexp_matches($column, '$pattern')
       |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS match_rate,
       |  MIN(CASE WHEN NOT regexp_matches($column, '$pattern')
       |    THEN $column END) AS example_violation
       |FROM $table""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")

  /** §2.13aa — k-anonymity audit over quasi-identifiers: group the
    * table by the attacker-linkable column combination (here customer's
    * nation × market segment) and report the equivalence-class-size
    * histogram plus which classes violate k ≥ 5 — the standard
    * re-identification risk read before a dataset leaves the trust
    * boundary (a class of size 1 is a fingerprint; the table's
    * k-anonymity level is the smallest class). Two grouped passes,
    * first on the quasi-id (the only data-scale shuffle), then on the
    * ≤ |classes| size frame. */
  def qcKanonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val classes = Tables.load(spark, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("class_size"))
    classes.groupBy("class_size")
      .agg(count(lit(1)).as("n_classes"))
      .select(col("class_size"), col("n_classes"),
        (col("n_classes") * col("class_size")).as("n_rows"),
        (col("class_size") < k).as("violates_k5"))
      .orderBy("class_size")
  }

  val qcKanonymitySql: String =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
      |  FROM customer GROUP BY 1, 2
      |)
      |SELECT class_size, COUNT(*) AS n_classes,
      |  CAST(COUNT(*) * class_size AS BIGINT) AS n_rows,
      |  (class_size < 5) AS violates_k5
      |FROM classes
      |GROUP BY class_size
      |ORDER BY class_size""".stripMargin

  /** §2.13ab — differentially-private count release (Laplace
    * mechanism, ε = 0.5, sensitivity 1): per-segment customer counts
    * plus Laplace(1/ε) noise drawn by inverse-CDF from an md5-seeded
    * uniform. The SEEDED draw is the testing artifact that makes the
    * mechanism oracle-verifiable bit-for-bit across engines — a
    * production release swaps the seed for real randomness and drops
    * the true_count column; what this query pins is everything
    * deterministic around the draw (the inverse CDF, the scale, the
    * rounding, the per-group independence). Shape: one grouped count,
    * noise is a per-row projection. */
  def qcDpRelease(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Hash32
    val eps = 0.5
    val scale = 1.0 / eps
    val u = ((md5Hash32(concat_ws(":", lit("dp"), col("c_mktsegment")))
      % 1000000).cast("double") + 0.5) / 1000000.0
    val p = u - lit(0.5)
    val noise = -lit(scale) * signum(p) * log(lit(1.0) - lit(2.0) * abs(p))
    Tables.load(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("true_count"))
      .select(col("c_mktsegment"), col("true_count"),
        round(col("true_count") + noise, 6).as("noisy_count"),
        round(noise, 6).as("noise"))
      .orderBy("c_mktsegment")
  }

  val qcDpReleaseSql: String = {
    val u = "((('0x' || substr(md5('dp:' || c_mktsegment), 1, 8))::BIGINT % 1000000 + 0.5) / 1000000.0)"
    val p = s"($u - 0.5)"
    val noise = s"(-2.0 * sign($p) * ln(1.0 - 2.0 * abs($p)))"
    s"""SELECT c_mktsegment, COUNT(*) AS true_count,
       |  round(COUNT(*) + $noise, 6) AS noisy_count,
       |  round($noise, 6) AS noise
       |FROM customer
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin
  }

  /** §2.13ac — Wasserstein-1 (earth mover's) drift between the md5-split
    * halves of `orders.o_totalprice` on fixed-width bins: per bin the
    * two counts, both CDFs, the |ΔCDF|·width transport term, and the
    * summed W1 distance — the drift metric with DISTANCE semantics
    * (dollars of probability mass moved) that PSI/KS/χ² lack: PSI
    * explodes on empty bins and KS sees only the worst bin, while W1
    * degrades smoothly and weighs HOW FAR mass moved. One conditional-
    * sum scan tags both halves (no second pass), the dense bin axis is
    * generated from a 1-row min/max aggregate (gap bins between
    * occupied ones still carry transport cost — skipping them would
    * under-count), and the cumulative window runs over the ≤
    * range/width collapsed frame, never the raw table. CDFs divide
    * exact long cumsums; the W1 total sums DECIMAL(18,9)-quantized
    * terms so it is order-independent (the qt_js_sources discipline). */
  def qcWasserstein(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Bucket
    val width = 50000.0
    val tagged = Tables.load(spark, dir, "orders").select(
      floor(col("o_totalprice") / width).cast("bigint").as("bin"),
      (md5Bucket("w1", col("o_orderkey"), 100) < 50).as("__a"))
    val counts = tagged.groupBy("bin").agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    val dense = counts.agg(min("bin").as("__lo"), max("bin").as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("bin"))
    val filled = dense.join(counts, Seq("bin"), "left_outer")
      .select(col("bin"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cdfA = sum("n_a").over(cum).cast("double") /
      sum("n_a").over(all).cast("double")
    val cdfB = sum("n_b").over(cum).cast("double") /
      sum("n_b").over(all).cast("double")
    val term = round(abs(cdfA - cdfB) * width, 9).cast("decimal(18,9)")
    filled
      .select(col("bin"), col("n_a"), col("n_b"),
        round(cdfA, 6).as("cdf_a"), round(cdfB, 6).as("cdf_b"),
        round(term.cast("double"), 6).as("w1_term"),
        round(sum(term).over(all).cast("double"), 6).as("w1_total"))
      .orderBy("bin")
  }

  val qcWassersteinSql: String =
    """WITH tagged AS (
      |  SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
      |    ('0x' || substr(md5('w1:' || o_orderkey), 1, 8))::BIGINT % 100 < 50
      |      AS in_a
      |  FROM orders
      |), counts AS (
      |  SELECT bin, SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS n_a,
      |    SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS n_b
      |  FROM tagged GROUP BY bin
      |), dense AS (
      |  SELECT unnest(range((SELECT MIN(bin) FROM counts),
      |    (SELECT MAX(bin) FROM counts) + 1)) AS bin
      |), filled AS (
      |  SELECT d.bin, COALESCE(c.n_a, 0) AS n_a, COALESCE(c.n_b, 0) AS n_b
      |  FROM dense d LEFT JOIN counts c USING (bin)
      |), cum AS (
      |  SELECT bin, n_a, n_b,
      |    CAST(SUM(n_a) OVER (ORDER BY bin) AS DOUBLE)
      |      / CAST(SUM(n_a) OVER () AS DOUBLE) AS ca,
      |    CAST(SUM(n_b) OVER (ORDER BY bin) AS DOUBLE)
      |      / CAST(SUM(n_b) OVER () AS DOUBLE) AS cb
      |  FROM filled
      |), terms AS (
      |  SELECT bin, n_a, n_b, ca, cb,
      |    CAST(round(abs(ca - cb) * 50000.0, 9) AS DECIMAL(18,9)) AS t
      |  FROM cum
      |)
      |SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  round(ca, 6) AS cdf_a, round(cb, 6) AS cdf_b,
      |  round(CAST(t AS DOUBLE), 6) AS w1_term,
      |  round(CAST(SUM(t) OVER () AS DOUBLE), 6) AS w1_total
      |FROM terms ORDER BY bin""".stripMargin

  /** §2.13ad — Wald SPRT (sequential probability-ratio test) gate over
    * the monthly return-flag defect rate: H0 p=0.30 vs H1 p=0.40,
    * α=β=0.05. Per month the trial/defect counts, the month's
    * log-likelihood-ratio increment k·ln(p1/p0)+(n−k)·ln(q1/q0), the
    * cumulative LLR walk, the boundary decision (≥ ln 19 → accept_h1,
    * ≤ −ln 19 → accept_h0, else continue) and the replicated stopping
    * month — the sequential alternative to fixed-horizon χ²/EWMA
    * monitoring: it bounds BOTH error rates while stopping as early
    * as the evidence allows (the reason ramp gates use SPRT, not
    * p-values). The fact table collapses to one bounded
    * calendar-month frame in a single conditional-sum pass; the walk
    * windows run over that frame only. The ln constants are embedded
    * double literals (no engine ln), and the cumulative sum is
    * DECIMAL(38,12)-quantized — the decision column compares exact
    * decimals against an exact literal, so no last-ulp flip. */
  def qcSprt(spark: SparkSession, dir: String): DataFrame = {
    val lnRatio1 = 0.287682072451781       // ln(0.4/0.3)
    val lnRatio0 = -0.15415067982725822    // ln(0.6/0.7)
    val lnBound = 2.9444389791664403       // ln((1-β)/α) = ln 19
    val monthly = Tables.load(spark, dir, "lineitem")
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"))
    val llr = round(col("n_returned").cast("double") * lnRatio1 +
      (col("n_items") - col("n_returned")).cast("double") * lnRatio0, 12)
      .cast("decimal(38,12)")
    val walk = Window.orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = sum(llr).over(walk)
    val decision = when(cum >= lit(lnBound).cast("decimal(38,12)"),
        "accept_h1")
      .when(cum <= lit(-lnBound).cast("decimal(38,12)"), "accept_h0")
      .otherwise("continue")
    monthly
      .select(col("month"), col("n_items"), col("n_returned"),
        round(llr.cast("double"), 6).as("llr_month"),
        round(cum.cast("double"), 6).as("cum_llr"),
        decision.as("decision"),
        min(when(decision =!= "continue", col("month"))).over(all)
          .as("first_decision_month"))
      .orderBy("month")
  }

  val qcSprtSql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', l_shipdate) AS month,
      |    COUNT(*) AS n_items,
      |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS n_returned
      |  FROM lineitem GROUP BY 1
      |), s AS (
      |  SELECT month, n_items, n_returned,
      |    CAST(round(CAST(n_returned AS DOUBLE) * 0.287682072451781
      |      + CAST(n_items - n_returned AS DOUBLE)
      |        * -0.15415067982725822, 12) AS DECIMAL(38,12)) AS llr
      |  FROM m
      |), w AS (
      |  SELECT month, n_items, n_returned, llr,
      |    SUM(llr) OVER (ORDER BY month) AS cum
      |  FROM s
      |), d AS (
      |  SELECT month, n_items, n_returned, llr, cum,
      |    CASE
      |      WHEN cum >= CAST(2.9444389791664403 AS DECIMAL(38,12))
      |        THEN 'accept_h1'
      |      WHEN cum <= CAST(-2.9444389791664403 AS DECIMAL(38,12))
      |        THEN 'accept_h0'
      |      ELSE 'continue' END AS decision
      |  FROM w
      |)
      |SELECT month, CAST(n_items AS BIGINT) AS n_items,
      |  CAST(n_returned AS BIGINT) AS n_returned,
      |  round(CAST(llr AS DOUBLE), 6) AS llr_month,
      |  round(CAST(cum AS DOUBLE), 6) AS cum_llr,
      |  decision,
      |  MIN(CASE WHEN decision <> 'continue' THEN month END) OVER ()
      |    AS first_decision_month
      |FROM d
      |ORDER BY month""".stripMargin

  /** §2.13ae — whole-table drift SWEEP: PSI between the md5-split
    * halves for EVERY monitored numeric column of lineitem in ONE
    * scan — stack() unpivots the four columns into (column, value)
    * rows so a single groupBy covers all of them (one shuffle total,
    * vs four separate drift runs re-scanning the fact table; at
    * 100 TB that factor is the whole job). Per column: populated-
    * both-sides bin count and the summed PSI with the standard
    * severity read (<0.1 stable / <0.25 moderate / else major).
    * Same share + drop-one-sided-bins semantics as the single-column
    * qc_drift gate; per-bin terms are DECIMAL(38,12)-quantized so
    * the total is order-independent. */
  def qcDriftSweep(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Hash32
    val cols = Seq("l_quantity" -> 5.0, "l_extendedprice" -> 10000.0,
      "l_discount" -> 0.02, "l_tax" -> 0.02)
    val stackExpr = "stack(4, " + cols.map { case (c, _) =>
      s"'$c', $c" }.mkString(", ") + ") AS (colname, v)"
    val width = cols.tail.foldLeft(
      when(col("colname") === cols.head._1, lit(cols.head._2))) {
      case (acc, (c, w)) => acc.when(col("colname") === c, lit(w))
    }.otherwise(lit(1.0))
    val sideA = md5Hash32(concat_ws(":", lit("dsweep"),
      concat_ws(":", col("l_orderkey"), col("l_linenumber")))) % 100 < 50
    val byCol = Window.partitionBy("colname")
    // loadCompute + hash-before-stack (r14): the profile measured this
    // query as ONE serial 2.1 s task — the single-row-group scan capped
    // parallelism while the stack ran the md5 side-assignment 4× per
    // line item (once per stacked row). The rebalance spreads the scan;
    // computing __a before the stack hashes each row once (same value
    // on every stacked copy — the hash input is the row key, not v).
    val binned = Tables.loadCompute(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), sideA.as("__a"))
      .select(col("__a"), expr(stackExpr))
      .groupBy(col("colname"), floor(col("v") / width).cast("long").as("bin"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
      .withColumn("__p", col("n_a") / sum("n_a").over(byCol))
      .withColumn("__q", col("n_b") / sum("n_b").over(byCol))
      .where(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("__t", round((col("__p") - col("__q")) *
        log(col("__p") / col("__q")), 12).cast("decimal(38,12)"))
    binned.groupBy("colname")
      .agg(count(lit(1)).as("n_bins"),
        sum("__t").as("__psi"))
      .select(col("colname"), col("n_bins"),
        round(col("__psi").cast("double"), 6).as("psi_total"),
        when(col("__psi").cast("double") < 0.1, "stable")
          .when(col("__psi").cast("double") < 0.25, "moderate")
          .otherwise("major").as("severity"))
      .orderBy("colname")
  }

  val qcDriftSweepSql: String =
    """WITH s AS (
      |  SELECT l_orderkey, l_linenumber, colname, v,
      |    ('0x' || substr(md5('dsweep:' || l_orderkey || ':' ||
      |      l_linenumber), 1, 8))::BIGINT % 100 < 50 AS in_a
      |  FROM (
      |    SELECT l_orderkey, l_linenumber, 'l_quantity' AS colname,
      |      l_quantity AS v FROM lineitem
      |    UNION ALL
      |    SELECT l_orderkey, l_linenumber, 'l_extendedprice',
      |      l_extendedprice FROM lineitem
      |    UNION ALL
      |    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |    FROM lineitem
      |    UNION ALL
      |    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
      |  )
      |), binned AS (
      |  SELECT colname,
      |    CAST(FLOOR(v / (CASE colname WHEN 'l_quantity' THEN 5.0e0
      |      WHEN 'l_extendedprice' THEN 10000.0e0
      |      WHEN 'l_discount' THEN 0.02e0
      |      WHEN 'l_tax' THEN 0.02e0 ELSE 1.0e0 END)) AS BIGINT) AS bin,
      |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS n_a,
      |    SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS n_b
      |  FROM s GROUP BY 1, 2
      |), shares AS (
      |  SELECT colname, bin, n_a, n_b,
      |    n_a / SUM(n_a) OVER (PARTITION BY colname) AS p,
      |    n_b / SUM(n_b) OVER (PARTITION BY colname) AS q
      |  FROM binned
      |), terms AS (
      |  SELECT colname,
      |    CAST(round((p - q) * ln(p / q), 12) AS DECIMAL(38,12)) AS t
      |  FROM shares WHERE n_a > 0 AND n_b > 0
      |)
      |SELECT colname, COUNT(*) AS n_bins,
      |  round(CAST(SUM(t) AS DOUBLE), 6) AS psi_total,
      |  CASE WHEN CAST(SUM(t) AS DOUBLE) < 0.1e0 THEN 'stable'
      |       WHEN CAST(SUM(t) AS DOUBLE) < 0.25e0 THEN 'moderate'
      |       ELSE 'major' END AS severity
      |FROM terms GROUP BY colname
      |ORDER BY colname""".stripMargin

  /** §2.13af — Jarque–Bera normality audit: per numeric column, sample
    * skewness, kurtosis, and the JB statistic n/6·(S² + (K−3)²/4)
    * against the χ²₂ 5% critical value — the "is a Gaussian model even
    * admissible" gate read before any z-score/σ-based rule (13d's
    * outliers or 13q's clips silently assume it). One pass computes all
    * twelve raw power sums Σkᵖ (p ≤ 4) as DECIMAL(38,0) over
    * INTEGERIZED values (quantity is integral; discount/tax ×100 via a
    * DECIMAL(9,2) cast — exact, and standardized moments are invariant
    * under the linear rescale), so the sums are bit-exact in any
    * engine and overflow-proof at any row count; the single 1-row
    * frame stacks to 3 rows and the double-precision moment identities
    * are written with the SAME operation order in both engines. The
    * 100 TB shape: one combinable aggregate over the scan, nothing
    * else. */
  def qcJarqueBera(spark: SparkSession, dir: String): DataFrame = {
    def dsum(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    val li = Tables.load(spark, dir, "lineitem").select(
      col("l_quantity").cast("long").as("kq"),
      (col("l_discount").cast("decimal(9,2)") * 100).cast("long").as("kd"),
      (col("l_tax").cast("decimal(9,2)") * 100).cast("long").as("kt"))
    def pows(k: Column, p: String) = Seq(
      dsum(k).as(s"${p}1"), dsum(k * k).as(s"${p}2"),
      dsum(k * k * k).as(s"${p}3"), dsum(k * k * k * k).as(s"${p}4"))
    val sums = pows(col("kq"), "q") ++ pows(col("kd"), "d") ++
      pows(col("kt"), "t")
    val a = li.agg(count(lit(1)).cast("double").as("n"), sums: _*)
    val stacked = a.select(col("n"), expr(
      """stack(3,
        |  'l_quantity',      q1, q2, q3, q4,
        |  'l_discount_x100', d1, d2, d3, d4,
        |  'l_tax_x100',      t1, t2, t3, t4)
        |AS (column_name, s1, s2, s3, s4)""".stripMargin))
    val mu = col("s1") / col("n")
    val withM = stacked.withColumn("mu", mu)
      .withColumn("m2", col("s2") / col("n") - col("mu") * col("mu"))
      .withColumn("m3", col("s3") / col("n")
        - lit(3.0) * col("mu") * col("s2") / col("n")
        + lit(2.0) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4", col("s4") / col("n")
        - lit(4.0) * col("mu") * col("s3") / col("n")
        + lit(6.0) * col("mu") * col("mu") * col("s2") / col("n")
        - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
      .withColumn("skew", col("m3") / (col("m2") * sqrt(col("m2"))))
      .withColumn("kurt", col("m4") / (col("m2") * col("m2")))
      .withColumn("jb", col("n") / lit(6.0) * (col("skew") * col("skew")
        + (col("kurt") - lit(3.0)) * (col("kurt") - lit(3.0)) / lit(4.0)))
    withM.select(col("column_name"), col("n").cast("long").as("n"),
      round(col("skew"), 6).as("skewness"),
      round(col("kurt"), 6).as("kurtosis"),
      round(col("jb"), 6).as("jb_stat"),
      when(round(col("jb"), 6) < 5.991464547107979, 1).otherwise(0)
        .as("normal_5pct"))
      .orderBy("column_name")
  }

  val qcJarqueBeraSql: String =
    """WITH k AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS kq,
      |    CAST(CAST(l_discount AS DECIMAL(9,2)) * 100 AS BIGINT) AS kd,
      |    CAST(CAST(l_tax AS DECIMAL(9,2)) * 100 AS BIGINT) AS kt
      |  FROM lineitem
      |), a AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(kq AS DECIMAL(38,0))) AS DOUBLE) AS q1,
      |    CAST(SUM(CAST(kq*kq AS DECIMAL(38,0))) AS DOUBLE) AS q2,
      |    CAST(SUM(CAST(kq*kq*kq AS DECIMAL(38,0))) AS DOUBLE) AS q3,
      |    CAST(SUM(CAST(kq*kq*kq*kq AS DECIMAL(38,0))) AS DOUBLE) AS q4,
      |    CAST(SUM(CAST(kd AS DECIMAL(38,0))) AS DOUBLE) AS d1,
      |    CAST(SUM(CAST(kd*kd AS DECIMAL(38,0))) AS DOUBLE) AS d2,
      |    CAST(SUM(CAST(kd*kd*kd AS DECIMAL(38,0))) AS DOUBLE) AS d3,
      |    CAST(SUM(CAST(kd*kd*kd*kd AS DECIMAL(38,0))) AS DOUBLE) AS d4,
      |    CAST(SUM(CAST(kt AS DECIMAL(38,0))) AS DOUBLE) AS t1,
      |    CAST(SUM(CAST(kt*kt AS DECIMAL(38,0))) AS DOUBLE) AS t2,
      |    CAST(SUM(CAST(kt*kt*kt AS DECIMAL(38,0))) AS DOUBLE) AS t3,
      |    CAST(SUM(CAST(kt*kt*kt*kt AS DECIMAL(38,0))) AS DOUBLE) AS t4
      |  FROM k
      |), s AS (
      |  SELECT 'l_quantity' AS column_name, n, q1 AS s1, q2 AS s2,
      |    q3 AS s3, q4 AS s4 FROM a
      |  UNION ALL
      |  SELECT 'l_discount_x100', n, d1, d2, d3, d4 FROM a
      |  UNION ALL
      |  SELECT 'l_tax_x100', n, t1, t2, t3, t4 FROM a
      |), m AS (
      |  SELECT column_name, n, s1 / n AS mu, s2, s3, s4 FROM s
      |), c AS (
      |  SELECT column_name, n, mu,
      |    s2 / n - mu * mu AS m2,
      |    s3 / n - 3.0 * mu * s2 / n + 2.0 * mu * mu * mu AS m3,
      |    s4 / n - 4.0 * mu * s3 / n + 6.0 * mu * mu * s2 / n
      |      - 3.0 * mu * mu * mu * mu AS m4
      |  FROM m
      |), f AS (
      |  SELECT column_name, n,
      |    m3 / (m2 * sqrt(m2)) AS skew,
      |    m4 / (m2 * m2) AS kurt
      |  FROM c
      |), j AS (
      |  SELECT column_name, n, skew, kurt,
      |    n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jb
      |  FROM f
      |)
      |SELECT column_name, CAST(n AS BIGINT) AS n,
      |  round(skew, 6) AS skewness,
      |  round(kurt, 6) AS kurtosis,
      |  round(jb, 6) AS jb_stat,
      |  CASE WHEN round(jb, 6) < 5.991464547107979 THEN 1 ELSE 0 END
      |    AS normal_5pct
      |FROM j
      |ORDER BY column_name""".stripMargin

  /** §2.13ag — KMV sketch SET ALGEBRA: audience union / intersection /
    * Jaccard estimates between every event-type pair from the same
    * 64-min-hash sketches 13w builds — the mergeable-sketch answer to
    * "how many users do A and B share" when the per-pair exact
    * distinct join (computed here as the audit) stops fitting. The
    * estimator is the standard KMV combination: L = the k smallest of
    * the UNION of both sketches (a valid KMV sketch of A∪B by the
    * k-mins closure property), ρ = |L ∩ A ∩ B| / |L| estimates
    * Jaccard, intersection ≈ ρ · union-estimate. Every step is exact
    * integer array arithmetic on identical md5 hashes, so both
    * engines derive bit-identical estimates; only 5 sketches ever
    * cross — the pair stage is constant-size however many users
    * exist. */
  def qcKmvSetops(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Hash32
    import graft.operators.KmvSketch
    val k = 64
    val ev = Tables.load(spark, dir, "events")
    val sk = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"),
        KmvSketch.kmins(k)(md5Hash32(col("user_id").cast("string")))
          .as("__km"))
    val ut = ev.select("event_type", "user_id").distinct()
    val inter = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val pairs = sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.n_exact").as("__na"), col("b.n_exact").as("__nb"),
        col("a.__km").as("__ka"), col("b.__km").as("__kb"))
      .withColumn("__l",
        slice(array_sort(array_union(col("__ka"), col("__kb"))), 1, k))
      .withColumn("__nl", size(col("__l")))
      .withColumn("__m", size(array_intersect(col("__l"),
        array_intersect(col("__ka"), col("__kb")))))
      // All three estimates derive from the RAW (unrounded) terms —
      // rounding a product of already-rounded values can land on an
      // exact half boundary where the engines' round modes split (the
      // qs_mmr lesson); raw integer-derived doubles are bit-identical
      // across engines, so each final round sees the same value.
      .withColumn("__u",
        when(col("__nl") < k, col("__nl").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            element_at(col("__l"), -1).cast("double")))
      .withColumn("union_est", round(col("__u"), 6))
      .withColumn("jaccard_est", round(
        col("__m").cast("double") / col("__nl").cast("double"), 6))
      .withColumn("inter_est", round(
        col("__m").cast("double") / col("__nl").cast("double") * col("__u"), 6))
    pairs.join(inter, Seq("type_a", "type_b"), "left_outer")
      .select(col("type_a"), col("type_b"),
        (col("__na") + col("__nb") - coalesce(col("exact_inter"), lit(0L)))
          .as("exact_union"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        col("union_est"), col("inter_est"), col("jaccard_est"))
      .orderBy("type_a", "type_b")
  }

  val qcKmvSetopsSql: String =
    """WITH hashed AS (
      |  SELECT DISTINCT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      |  FROM events
      |), ranked AS (
      |  SELECT event_type, h,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM hashed
      |), sk AS (
      |  SELECT event_type, list_sort(list(h ORDER BY h)) AS km
      |  FROM ranked WHERE rn <= 64 GROUP BY event_type
      |), ex AS (
      |  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      |  FROM events GROUP BY event_type
      |), ut AS (
      |  SELECT DISTINCT event_type, user_id FROM events
      |), inter AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    COUNT(*) AS exact_inter
      |  FROM ut a JOIN ut b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    ea.n_exact AS na, eb.n_exact AS nb,
      |    a.km AS ka, b.km AS kb,
      |    list_sort(list_distinct(list_concat(a.km, b.km)))[1:64] AS l
      |  FROM sk a JOIN sk b ON a.event_type < b.event_type
      |  JOIN ex ea ON ea.event_type = a.event_type
      |  JOIN ex eb ON eb.event_type = b.event_type
      |), est AS (
      |  SELECT type_a, type_b, na, nb, len(l) AS nl,
      |    CAST(len(list_intersect(l, list_intersect(ka, kb)))
      |      AS BIGINT) AS m,
      |    CASE WHEN len(l) < 64 THEN CAST(len(l) AS DOUBLE)
      |      ELSE 63.0 * 4294967296.0 / CAST(l[-1] AS DOUBLE) END AS u
      |  FROM pairs
      |)
      |SELECT e.type_a, e.type_b,
      |  CAST(e.na + e.nb - COALESCE(i.exact_inter, 0) AS BIGINT)
      |    AS exact_union,
      |  CAST(COALESCE(i.exact_inter, 0) AS BIGINT) AS exact_inter,
      |  round(e.u, 6) AS union_est,
      |  round(CAST(e.m AS DOUBLE) / CAST(e.nl AS DOUBLE) * e.u, 6)
      |    AS inter_est,
      |  round(CAST(e.m AS DOUBLE) / CAST(e.nl AS DOUBLE), 6) AS jaccard_est
      |FROM est e LEFT JOIN inter i
      |  ON e.type_a = i.type_a AND e.type_b = i.type_b
      |ORDER BY e.type_a, e.type_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc_kmv_setops" -> (qcKmvSetops _),
    "qc_jarque_bera" -> (qcJarqueBera _),
    "qc_sprt" -> (qcSprt _),
    "qc_drift_sweep" -> (qcDriftSweep _),
    "qc_wasserstein" -> (qcWasserstein _),
    "qc_kanonymity" -> (qcKanonymity _),
    "qc_dp_release" -> (qcDpRelease _),
    "qc_kmv" -> (qcKmv _),
    "qc_format" -> (qcFormat _),
    "qc_drift_timeline" -> (qcDriftTimeline _),
    "qc_mahalanobis" -> (qcMahalanobis _),
    "qc_mutual_info" -> (qcMutualInfo _),
    "qc_fd" -> (qcFd _),
    "qc_keys" -> (qcKeys _),
    "qc_cramers_v" -> (qcCramersV _),
    "qc_entropy_cols" -> (qcEntropyCols _),
    "qc_mad" -> (qcMad _),
    "qc_unique" -> (qcUnique _),
    "qc_benford" -> (qcBenford _),
    "qc_corr" -> (qcCorr _),
    "qc_chi2_drift" -> (qcChi2Drift _),
    "qc_iqr_outliers" -> (qcIqrOutliers _),
    "qc_freshness" -> (qcFreshness _),
    "qc_profile" -> (qcProfile _),
    "qc_anomaly" -> (qcAnomaly _),
    "qc_drift" -> (qcDrift _),
    "qc_psi_quantile" -> (qcPsiQuantile _),
    "qc_winsorize" -> (qcWinsorize _),
    "qc_ks_drift" -> (qcKsDrift _),
    "qc_topvalues" -> (qcTopValues _),
    "qc_gaps" -> (qcGaps _))

  val oracles: Map[String, String] = Map(
    "qc_kmv_setops" -> qcKmvSetopsSql,
    "qc_jarque_bera" -> qcJarqueBeraSql,
    "qc_sprt" -> qcSprtSql,
    "qc_drift_sweep" -> qcDriftSweepSql,
    "qc_wasserstein" -> qcWassersteinSql,
    "qc_kanonymity" -> qcKanonymitySql,
    "qc_dp_release" -> qcDpReleaseSql,
    "qc_kmv" -> qcKmvSql,
    "qc_format" -> qcFormatSql,
    "qc_drift_timeline" -> qcDriftTimelineSql,
    "qc_mahalanobis" -> qcMahalanobisSql,
    "qc_mutual_info" -> qcMutualInfoSql,
    "qc_fd" -> qcFdSql,
    "qc_keys" -> qcKeysSql,
    "qc_cramers_v" -> qcCramersVSql,
    "qc_entropy_cols" -> qcEntropyColsSql,
    "qc_mad" -> qcMadSql,
    "qc_unique" -> qcUniqueSql,
    "qc_benford" -> qcBenfordSql,
    "qc_corr" -> qcCorrSql,
    "qc_chi2_drift" -> qcChi2DriftSql,
    "qc_psi_quantile" -> qcPsiQuantileSql,
    "qc_winsorize" -> qcWinsorizeSql,
    "qc_iqr_outliers" -> qcIqrOutliersSql,
    "qc_freshness" -> qcFreshnessSql,
    "qc_profile" -> qcProfileSql,
    "qc_anomaly" -> qcAnomalySql,
    "qc_drift" -> qcDriftSql,
    "qc_ks_drift" -> qcKsDriftSql,
    "qc_topvalues" -> qcTopValuesSql,
    "qc_gaps" -> qcGapsSql)
}
