package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core analytics queries proving the engine's query surface
  * (aggregation, multi-way joins, windows, semi/anti joins, rollup).
  *
  * Oracle-parity rules (SURVEY.md §5): money sums go through
  * decimal(18,4) so they are order-independent and bit-identical to
  * DuckDB after a final cast to double; counts stay bigint; every query
  * ends in a deterministic ORDER BY with explicit null placement.
  *
  * Scale notes: dimension joins (region/nation/customer/supplier) are
  * broadcast; fact-fact joins shuffle on the join key and rely on AQE for
  * skew. Filters are plain Column predicates so they push into the scan.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Order-independent money sum: exact decimal accumulate, then downcast
    * to scale 4 (exact — inputs have ≤2 true decimals) BEFORE the double
    * cast. The downcast keeps the unscaled value < 2^53 so the
    * decimal→double conversion is a single correctly-rounded division in
    * both Spark and DuckDB; casting a high-scale decimal directly to
    * double double-rounds in DuckDB (int128→double, then ÷10^scale). */
  private def moneySum(c: Column): Column =
    sum(dec(c)).cast("decimal(38,4)").cast("double")

  /** Same for sums of decimal products (≤4 true decimals). */
  private def productSum(c: Column): Column =
    sum(c).cast("decimal(38,4)").cast("double")

  /** TPC-H Q1-style pricing summary (ref capability: View over fact table). */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        productSum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join + agg + top-k. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val lineitem = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
    // customer is a dim at any SF → broadcast; orders⋈lineitem shuffles on orderkey.
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(productSum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT l_orderkey,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style snowflake join: local supplier volume per nation. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(customer),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(productSum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Window functions: top-3 customers by balance per nation. */
  def qTopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.load(spark, dir, "customer")
      .withColumn("rank_in_nation", row_number().over(w))
      .filter(col("rank_in_nation") <= 3)
      .select("c_nationkey", "c_custkey", "c_name", "c_acctbal", "rank_in_nation")
      .orderBy("c_nationkey", "rank_in_nation")
  }

  val qTopCustomersSql: String =
    """SELECT c_nationkey, c_custkey, c_name, c_acctbal, rank_in_nation
      |FROM (
      |  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rank_in_nation
      |  FROM customer
      |) t
      |WHERE rank_in_nation <= 3
      |ORDER BY c_nationkey, rank_in_nation""".stripMargin

  /** Anti join: orders with no lineitem rows. */
  def qOrdersNoLineitem(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val qOrdersNoLineitemSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Rollup over returnflag/linestatus: multi-level aggregation. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Cumulative window: running order-total per customer over time.
    * Decimal running sum keeps the prefix sums order-independent
    * (frame order is deterministic, accumulation exact). */
  def qRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .where(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w)
          .cast("decimal(38,4)").cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val qRunningTotalSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,4)) AS DOUBLE) AS running_total
      |FROM orders
      |WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** Cube over returnflag/linestatus: all 4 grouping sets in one pass. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Pivot: order counts by priority × status. The status domain is
    * declared explicitly — an undeclared pivot needs a distinct-values
    * job before planning, and nondeterministic column order besides. */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P")) // empty cells: null under pivot, 0 under CASE-sum
      .orderBy("o_orderpriority")

  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Exact interpolated percentiles per group (p50/p90/p99 of extended
    * price by return flag). `percentile` aggregates a per-group value
    * map — order-independent accumulation, deterministic interpolation —
    * in one shuffle; rounding to 6 absorbs cross-engine interpolation-
    * arithmetic ulps. The 100 TB path swaps in approx_percentile
    * (t-digest-style sketch, mergeable, no per-group value map) when the
    * group cardinality × value cardinality stops fitting an aggregation
    * buffer; the exact form IS the oracle-checkable contract. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("__p"))
      .select(col("l_returnflag"),
        round(element_at(col("__p"), 1), 6).as("p50"),
        round(element_at(col("__p"), 2), 6).as("p90"),
        round(element_at(col("__p"), 3), 6).as("p99"))
      .orderBy("l_returnflag")

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** [[qPercentiles]]' 100 TB swap-in, shipped callable: approx_percentile
    * (GK sketch — bounded per-group state, mergeable across partitions,
    * no per-group value map). `accuracy` bounds rank error to
    * n/accuracy; at the 10000 default a within-group rank error of
    * ≤ 0.01% of rows. Same output schema as the exact form, so a
    * pipeline swaps one call — ApproxVariantsSpec pins it to the exact
    * form's values at sf0.01 tolerance. */
  def qPercentilesApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr(s"approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), $accuracy)")
        .as("__p"))
      .select(col("l_returnflag"),
        round(element_at(col("__p"), 1), 6).as("p50"),
        round(element_at(col("__p"), 2), 6).as("p90"),
        round(element_at(col("__p"), 3), 6).as("p99"))
      .orderBy("l_returnflag")

  /** TPC-H Q17-style small-quantity revenue: lineitems of one brand's
    * parts ordering under 20% of their part's average quantity — the
    * scalar-aggregate (correlated subquery) pattern, expressed as ONE
    * pass: the per-part average is a window over the l_partkey
    * partition (sum+count share the single shuffle), where the
    * textbook aggregate-then-rejoin shape scans lineitem twice. The
    * brand filter broadcasts the small part dim ahead of the shuffle.
    * Averages are decimal-exact sums divided once in doubles —
    * identical op order to the oracle, so the 20% threshold comparison
    * agrees bit-for-bit. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .where(col("p_brand") === "Brand#13").select("p_partkey")
    val byPart = Window.partitionBy("l_partkey")
    val avgQ = (sum(dec(col("l_quantity"))).over(byPart)
      .cast("decimal(38,4)").cast("double") /
      count(lit(1)).over(byPart))
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .withColumn("__avg", avgQ)
      .where(col("l_quantity") < lit(0.2) * col("__avg"))
      .agg(count(lit(1)).as("n_items"),
        (moneySum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  val q17SmallQuantitySql: String =
    """WITH li AS (
      |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice,
      |    CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4)))
      |           OVER (PARTITION BY l.l_partkey) AS DECIMAL(38,4)) AS DOUBLE)
      |      / COUNT(*) OVER (PARTITION BY l.l_partkey) AS avg_q
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_brand = 'Brand#13'
      |)
      |SELECT COUNT(*) AS n_items,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)
      |    / 7.0 AS avg_yearly
      |FROM li
      |WHERE l_quantity < 0.2 * avg_q""".stripMargin

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed k non-urgent orders, INCLUDING k = 0. The
    * left-join-then-count textbook form shuffles every order row onto
    * its customer; here orders pre-aggregate to (custkey, count) first —
    * map-side combine collapses the fact table before the join, and the
    * join input is one row per ordering customer, not one per order.
    * Zero-order customers survive via the left join's null → 0. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("__n"))
    Tables.load(spark, dir, "customer")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("__n"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustDistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q4-style late-shipment priority check: orders in a window
    * with ≥1 lineitem shipping >90 days after the order date — the
    * correlated-EXISTS-with-inequality pattern. A LEFT SEMI join keeps
    * each order once no matter how many lineitems qualify; the
    * inequality rides the join condition, so no post-join dedup. The
    * orderdate window filter pushes into the orders scan BEFORE the
    * shuffle. */
  def q4LateShipped(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val lineitem = Tables.load(spark, dir, "lineitem")
    orders.join(lineitem,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4LateShippedSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q14-style promo revenue share: % of one month's discounted
    * revenue from PROMO-type parts — conditional aggregation over a
    * broadcast dim join, both sums sharing one pass. The part join is
    * broadcast (dim table); the month filter pushes into the lineitem
    * scan. Ratio arithmetic: decimal-exact numerator and denominator,
    * ONE double division at the end (same op order as the oracle). */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part").select("p_partkey", "p_type")
    val disc = dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))
    Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(18,4)")))
            .cast("decimal(38,4)").cast("double") /
          sum(disc).cast("decimal(38,4)").cast("double"))
          .as("promo_revenue_pct"))
  }

  val q14PromoRevenueSql: String =
    """SELECT 100.0 *
      |  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE) /
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)
      |  AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  /** TPC-H Q18-style large-volume orders: orders whose total quantity
    * exceeds 300, with their customer — the IN-subquery-with-HAVING
    * pattern. One aggregation over lineitem produces BOTH the filter
    * and the output quantity (the textbook form aggregates twice); the
    * surviving orders are few, so the customer/orders attachments are
    * joins against a tiny filtered set. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(moneySum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > 300.0)
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    bigOrders
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18LargeOrdersSql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM (
      |  SELECT l_orderkey,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |) big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE total_qty > 300.0
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q22-style idle high-balance customers: customers whose
    * balance beats the positive-balance average but placed no URGENT
    * order — scalar subquery + anti join. The 1-row average broadcasts
    * as a cross join (never a driver collect); the anti join's right
    * side pre-filters to urgent orders only, shrinking the build side
    * before the shuffle. Average = decimal-exact sum ÷ count in ONE
    * double division, matching the oracle bit-for-bit so the threshold
    * comparison agrees on every row. */
  def q22IdleRich(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val avgBal = customer.where(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast("decimal(38,4)").cast("double") /
        count(lit(1))).as("__avg"))
    val urgent = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    customer
      .crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("__avg"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  val q22IdleRichSql: String =
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** §2.19n — deterministic per-group mode: most frequent l_quantity
    * per return flag, ties broken toward the smaller value (the
    * built-in `mode` leaves tie order engine-defined, which would make
    * cross-engine hashes flap — so the mode is composed as count +
    * rank with an explicit tie key). Two aggregations that share the
    * same first shuffle; the ranking window runs per group over the
    * ≤ |distinct values| frame. */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("__c").desc, col("l_quantity").asc)
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("__c"))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col("l_returnflag"),
        // DOUBLE, not DECIMAL: l_quantity is an exact integral-valued
        // quantity (≤ 50), bit-exact in double on both engines — and the
        // r7 hasher flapped on DECIMAL(12,2) cell FORMATTING ("18.00" vs
        // "18.0") while the values were byte-identical. Rendering-
        // unambiguous type sidesteps the formatter, not the math.
        col("l_quantity").cast("double").as("mode_quantity"),
        col("__c").cast("bigint").as("n_occurrences"))
      .orderBy("l_returnflag")
  }

  val qModeSql: String =
    """SELECT l_returnflag,
      |  CAST(l_quantity AS DOUBLE) AS mode_quantity,
      |  CAST(c AS BIGINT) AS n_occurrences
      |FROM (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS c,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY COUNT(*) DESC, l_quantity ASC) AS r
      |  FROM lineitem GROUP BY l_returnflag, l_quantity
      |) t WHERE r = 1
      |ORDER BY l_returnflag""".stripMargin

  /** §2.19o — explicit GROUPING SETS (the general form rollup/cube
    * specialize): the four chosen sets in ONE pass with grouping()
    * flags disambiguating "value is NULL" from "column not grouped".
    * Spark expands the sets before the single aggregation shuffle —
    * same plan shape as cube, only the chosen sets are produced. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("__gs_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS sum_total
        |FROM __gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
      |    AS DOUBLE) AS sum_total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |  (o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority,
      |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** §2.19p — correlated LATERAL join (top-2 orders per customer by
    * value): the SQL-standard top-N-per-group form that does NOT need
    * a window function — Catalyst decorrelates the LIMIT subquery into
    * a per-key ranked join, so the surface works for plan authors who
    * write LATERAL (the engine's SQL entry point must accept it, not
    * just the DataFrame API's windows). Bounded to a 19-customer panel
    * so the oracle result stays small. */
  def qLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("__lat_customer")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("__lat_orders")
    spark.sql(
      """SELECT c.c_custkey, l.o_orderkey,
        |  CAST(l.o_totalprice AS DOUBLE) AS o_totalprice
        |FROM (SELECT c_custkey FROM __lat_customer WHERE c_custkey < 20) c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM __lat_orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }

  val qLateralSql: String =
    """SELECT c.c_custkey, l.o_orderkey,
      |  CAST(l.o_totalprice AS DOUBLE) AS o_totalprice
      |FROM (SELECT c_custkey FROM customer WHERE c_custkey < 20) c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  /** §2.19q — market-basket association rules over order baskets at
    * brand granularity: for every brand pair co-purchased in ≥5
    * orders, joint support, both directional confidences and lift —
    * the classic affinity report (which brands sell together beyond
    * chance). Brand granularity is the scale decision: the pair
    * explosion is per-basket C(k,2) with k ≤ |brands| (25), so work
    * is LINEAR in orders at any corpus size, never |parts|² (pair
    * mining at raw part granularity degenerates to support-1 noise
    * AND an unbounded pair space). One shuffle collapses lineitem to
    * per-order brand sets; the ordered pairs expand IN-ROW from each
    * sorted set (map-side, bounded by C(25,2) per order — no basket
    * self-join), and the same collapsed frame feeds the per-brand
    * marginals and the 1-row basket total (broadcast scalar,
    * PlanAudit-documented). Lift/support divide exact longs; ordering
    * is fully deterministic (lift desc, then brand pair). */
  def qBasketLift(spark: SparkSession, dir: String): DataFrame = {
    // One shuffle builds the per-order brand SET (collect_set dedups —
    // no separate distinct pass); ordered pairs then expand IN-ROW
    // from the sorted array (C(k,2), k ≤ |brands| = 25) instead of the
    // okey self-join a naive pair count shuffles the basket frame
    // through twice. Marginals and the basket total are cheap rollups
    // of the same collapsed frame (subtree reuse shares its exchange).
    val baskets = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey"))
      .join(Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("okey")
      .agg(sort_array(collect_set(col("p_brand"))).as("__bs"))
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(__bs, (x, i) -> " +
          "transform(slice(__bs, i + 2, size(__bs)), " +
          "y -> named_struct('brand_a', x, 'brand_b', y))))")).as("__p"))
      .select(col("__p.brand_a").as("brand_a"),
        col("__p.brand_b").as("brand_b"))
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= 5)
    val marg = baskets.select(explode(col("__bs")).as("brand"))
      .groupBy("brand").agg(count(lit(1)).as("n_m"))
    val tot = baskets.agg(count(lit(1)).as("__n"))
    pairs
      .join(marg.select(col("brand").as("brand_a"), col("n_m").as("n_a")),
        Seq("brand_a"))
      .join(marg.select(col("brand").as("brand_b"), col("n_m").as("n_b")),
        Seq("brand_b"))
      .crossJoin(broadcast(tot))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("__n"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_a_to_b"),
        round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_b_to_a"),
        round(col("n_ab").cast("double") * col("__n") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
      .orderBy(desc("lift"), col("brand_a"), col("brand_b"))
      .limit(20)
  }

  val qBasketLiftSql: String =
    """WITH ob AS (
      |  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |), pairs AS (
      |  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_ab
      |  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 5
      |), marg AS (
      |  SELECT brand, COUNT(*) AS n_m FROM ob GROUP BY brand
      |), tot AS (SELECT COUNT(DISTINCT okey) AS n FROM ob)
      |SELECT p.brand_a, p.brand_b, p.n_ab, ma.n_m AS n_a, mb.n_m AS n_b,
      |  round(CAST(p.n_ab AS DOUBLE) / t.n, 6) AS support,
      |  round(CAST(p.n_ab AS DOUBLE) / ma.n_m, 6) AS conf_a_to_b,
      |  round(CAST(p.n_ab AS DOUBLE) / mb.n_m, 6) AS conf_b_to_a,
      |  round(CAST(p.n_ab AS DOUBLE) * t.n
      |    / (CAST(ma.n_m AS DOUBLE) * mb.n_m), 6) AS lift
      |FROM pairs p
      |JOIN marg ma ON ma.brand = p.brand_a
      |JOIN marg mb ON mb.brand = p.brand_b
      |CROSS JOIN tot t
      |ORDER BY lift DESC, p.brand_a, p.brand_b
      |LIMIT 20""".stripMargin

  /** §2.19r — skyline (Pareto-frontier) operator: per market segment,
    * the customers not dominated on (total spend, order count) — the
    * multi-criteria "best tradeoffs" query (no scalarization weights
    * needed) classic OLAP engines ship as SKYLINE OF. 2-D skylines
    * need NO pair join: sort each segment by spend desc and keep rows
    * whose order count strictly exceeds the running max of all
    * higher-spend rows — one window over the per-customer aggregate,
    * O(n log n), scale-safe (the naive dominance self-join is O(n²)).
    * The sort is (spend DESC, count DESC, custkey): the count in the
    * secondary key makes equal-spend groups scan best-first, so a row
    * dominated by an equal-spend higher-count peer is correctly
    * dropped; an exactly-equal (spend, count) pair keeps only the
    * lower custkey (documented tie rule; SkylineSpec pins the whole
    * contract against a brute-force dominance scan). Spend aggregates
    * as DECIMAL(18,4) so the sort key is exact, not a float-sum race. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("__spend"),
        count(lit(1)).as("n_orders"))
    val joined = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(spend, col("c_custkey") === col("o_custkey"))
    graft.operators.Skyline
      .skyline2D(joined, "c_mktsegment", "c_custkey", "__spend", "n_orders")
      .select(col("c_mktsegment"), col("c_custkey"),
        col("__spend").cast("double").as("total_spend"), col("n_orders"))
      .orderBy(col("c_mktsegment"), desc("total_spend"), col("c_custkey"))
  }

  val qSkylineSql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sp,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY o_custkey
      |), j AS (
      |  SELECT c.c_mktsegment, c.c_custkey, s.sp, s.n_orders,
      |    MAX(s.n_orders) OVER (
      |      PARTITION BY c.c_mktsegment
      |      ORDER BY s.sp DESC, s.n_orders DESC, c.c_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
      |)
      |SELECT c_mktsegment, c_custkey, CAST(sp AS DOUBLE) AS total_spend,
      |  n_orders
      |FROM j
      |WHERE pm IS NULL OR n_orders > pm
      |ORDER BY c_mktsegment, total_spend DESC, c_custkey""".stripMargin

  /** §2.19s — Laspeyres / Paasche / Fisher price indices per ship
    * month (base = first month, matched-part basket): the standard
    * bilateral index-number suite over (part, month) unit values.
    * Unit price is SUM(extendedprice)/SUM(quantity) per part-month —
    * both sums exact decimals whose doubles are exact, so the IEEE
    * quotient is engine-identical. Each index term (base-or-current
    * quantity × price) quantizes to DECIMAL(18,6) before summing —
    * order-independent, and the per-month sum's unscaled value stays
    * < 2^53 so the final decimal→double cast is one correctly-rounded
    * division in both engines (the moneySum rule, scale 6 because
    * scale-9 unscaled sums would overflow 2^53 here). Scale shape:
    * one (month, part) aggregate off the scan, the base month is a
    * 1-row broadcast scalar, the basket match is a part-keyed join of
    * the slim (month, part, qty, price) frame against the base slice
    * — never a month×month cross product; months collapse in one
    * final aggregate. Fisher = √(L·P) on the unrounded ratios. */
  def qPriceIndex(spark: SparkSession, dir: String): DataFrame = {
    // loadCompute + Materialize (r14): the stage profile caught this
    // query scanning lineitem TWICE, serially (1.1 s + 1.4 s single-
    // task stages behind the single-row-group file) — once for the
    // base-month scalar's pm, once for the join's pm. The rebalance
    // parallelizes the decimal aggregation; the materialization makes
    // the (month, part) rollup compute ONCE and serve the base slice,
    // the 1-row base-month scalar and the basket join from blocks.
    val pm = graft.operators.Materialize.once(
      Tables.loadCompute(spark, dir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("__ep"),
        sum(dec(col("l_quantity"))).as("__q"))
      .select(col("month"), col("l_partkey"),
        col("__q").cast("double").as("qty"),
        (col("__ep").cast("double") / col("__q").cast("double"))
          .as("price")))
    val baseMonth = pm.agg(min("month").as("__base"))
    val base = pm.join(broadcast(baseMonth), col("month") === col("__base"))
      .select(col("l_partkey"), col("qty").as("__q0"),
        col("price").as("__p0"))
    def term(x: Column): Column = round(x, 6).cast("decimal(18,6)")
    val lNum = col("__ln").cast("double") / col("__ld").cast("double")
    val pNum = col("__pn").cast("double") / col("__pd").cast("double")
    pm.join(base, "l_partkey")
      .groupBy("month")
      .agg(count(lit(1)).as("n_parts"),
        sum(term(col("__q0") * col("price"))).as("__ln"),
        sum(term(col("__q0") * col("__p0"))).as("__ld"),
        sum(term(col("qty") * col("price"))).as("__pn"),
        sum(term(col("qty") * col("__p0"))).as("__pd"))
      .select(col("month"), col("n_parts"),
        round(lNum, 6).as("laspeyres"),
        round(pNum, 6).as("paasche"),
        round(sqrt(lNum * pNum), 6).as("fisher"))
      .orderBy("month")
  }

  val qPriceIndexSql: String =
    """WITH pm AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS month, l_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |      / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |      AS price
      |  FROM lineitem GROUP BY 1, 2
      |), base AS (
      |  SELECT l_partkey, qty AS q0, price AS p0 FROM pm
      |  WHERE month = (SELECT MIN(month) FROM pm)
      |), terms AS (
      |  SELECT m.month,
      |    CAST(round(b.q0 * m.price, 6) AS DECIMAL(18,6)) AS ln_t,
      |    CAST(round(b.q0 * b.p0, 6) AS DECIMAL(18,6)) AS ld_t,
      |    CAST(round(m.qty * m.price, 6) AS DECIMAL(18,6)) AS pn_t,
      |    CAST(round(m.qty * b.p0, 6) AS DECIMAL(18,6)) AS pd_t
      |  FROM pm m JOIN base b ON m.l_partkey = b.l_partkey
      |), agg AS (
      |  SELECT month, COUNT(*) AS n_parts,
      |    CAST(SUM(ln_t) AS DOUBLE) / CAST(SUM(ld_t) AS DOUBLE) AS l,
      |    CAST(SUM(pn_t) AS DOUBLE) / CAST(SUM(pd_t) AS DOUBLE) AS p
      |  FROM terms GROUP BY month
      |)
      |SELECT month, n_parts, round(l, 6) AS laspeyres,
      |  round(p, 6) AS paasche, round(sqrt(l * p), 6) AS fisher
      |FROM agg ORDER BY month""".stripMargin

  /** §2.19t — empirical-Bayes rate shrinkage (moment-matched
    * Beta-Binomial): per-supplier return rates stabilized toward the
    * cross-supplier prior — the standard fix for small-denominator
    * rate leaderboards, where a 3-of-7 segment outranks a 300-of-900
    * one on raw rate alone. Prior (α, β) is method-of-moments from
    * the per-supplier rate distribution: c = m(1−m)/v − 1 (floored at
    * 1 when variance is zero/degenerate), α = mc, β = (1−m)c; each
    * posterior mean is (x + α)/(n + c). Exactness discipline: per-key
    * rates are frozen at round-9 DECIMAL(18,9), and the moment sums
    * Σp, Σp² run as exact decimal sums (p² at DECIMAL(38,18)) so the
    * prior cannot move with shuffle order; final rates round once to
    * 6 before the doc-ordered ranks. Scale shape: one key-keyed
    * aggregate over the fact table, a 1-row broadcast prior
    * (scalar-subquery pattern); the supplier dimension GROWS with the
    * data (TPC-H: 10k × SF), so no global window ever touches the
    * collapsed frame — the top 15 by shrunk rate come from
    * TakeOrderedAndProject (per-partition 15-row heaps + driver
    * merge), and both ranks are predecessor COUNTS against the
    * broadcast 15-row panel: rank_shrunk within the panel itself,
    * rank_raw as one combinable aggregate over the per-supplier frame
    * (each row compares against 15 broadcast anchors — map-side, no
    * shuffle beyond the 15-group count). The strict (rate, supplier)
    * total order makes predecessor-count + 1 identical to
    * row_number(). */
  def qEbShrinkage(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_suppkey").as("supplier"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
      .withColumn("p",
        round(col("x").cast("double") / col("n").cast("double"), 9)
          .cast("decimal(18,9)"))
    val prior = broadcast(per
      .agg(count(lit(1)).cast("double").as("__k"),
        sum("p").cast("double").as("__sp"),
        sum((col("p") * col("p")).cast("decimal(38,18)"))
          .cast("double").as("__sp2"))
      .select(
        (col("__sp") / col("__k")).as("__m"),
        ((col("__sp2") - col("__sp") * col("__sp") / col("__k")) /
          (col("__k") - lit(1.0))).as("__v"))
      .select(col("__m"),
        when(col("__v") > 0 &&
            col("__m") * (lit(1.0) - col("__m")) / col("__v") - 1.0 > 0,
          col("__m") * (lit(1.0) - col("__m")) / col("__v") - 1.0)
          .otherwise(lit(1.0)).as("__c")))
    // Materialized once (bounded by the supplier dimension): consumed
    // by the top-k select AND the global-rank count, so lineitem is
    // scanned exactly once.
    val scored = graft.operators.Materialize.once(per.crossJoin(prior)
      .select(col("supplier"), col("n"), col("x"),
        round(col("p").cast("double"), 6).as("raw_rate"),
        round((col("x").cast("double") + col("__m") * col("__c")) /
          (col("n").cast("double") + col("__c")), 6).as("shrunk_rate"),
        round(col("__m") * col("__c"), 6).as("alpha"),
        round((lit(1.0) - col("__m")) * col("__c"), 6).as("beta")))
    val top = scored
      .orderBy(col("shrunk_rate").desc, col("supplier")).limit(15)
    val tgt = broadcast(top.select(col("supplier").as("__s0"),
      col("raw_rate").as("__rr0"), col("shrunk_rate").as("__sr0")))
    // Predecessor counts: r strictly before anchor under the total
    // order (rate desc, supplier asc) — row_number() == count + 1.
    val shrunkCnt = top
      .select(col("supplier").as("__rs"), col("shrunk_rate").as("__rv"))
      .join(tgt, col("__rv") > col("__sr0") ||
        (col("__rv") === col("__sr0") && col("__rs") < col("__s0")))
      .groupBy("__s0").agg(count(lit(1)).as("__cs"))
    val rawCnt = scored
      .select(col("supplier").as("__rs"), col("raw_rate").as("__rv"))
      .join(tgt, col("__rv") > col("__rr0") ||
        (col("__rv") === col("__rr0") && col("__rs") < col("__s0")))
      .groupBy("__s0").agg(count(lit(1)).as("__cr"))
    top
      .join(shrunkCnt, col("supplier") === shrunkCnt("__s0"), "left")
      .drop("__s0")
      .join(rawCnt, col("supplier") === rawCnt("__s0"), "left")
      .drop("__s0")
      .select((coalesce(col("__cs"), lit(0L)) + 1L).cast("int")
          .as("rank_shrunk"),
        col("supplier"), col("n"), col("x"), col("raw_rate"),
        col("shrunk_rate"),
        (coalesce(col("__cr"), lit(0L)) + 1L).cast("int").as("rank_raw"),
        col("alpha"), col("beta"))
      .orderBy("rank_shrunk")
  }

  val qEbShrinkageSql: String =
    """WITH per AS (
      |  SELECT l_suppkey AS supplier, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM lineitem GROUP BY 1
      |), rates AS (
      |  SELECT *, CAST(round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 9)
      |    AS DECIMAL(18,9)) AS p
      |  FROM per
      |), mom AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS k,
      |    CAST(SUM(p) AS DOUBLE) AS sp,
      |    CAST(SUM(CAST(p * p AS DECIMAL(38,18))) AS DOUBLE) AS sp2
      |  FROM rates
      |), prior AS (
      |  SELECT sp / k AS m,
      |    CASE WHEN (sp2 - sp * sp / k) / (k - 1.0) > 0
      |        AND (sp / k) * (1.0 - sp / k)
      |            / ((sp2 - sp * sp / k) / (k - 1.0)) - 1.0 > 0
      |      THEN (sp / k) * (1.0 - sp / k)
      |           / ((sp2 - sp * sp / k) / (k - 1.0)) - 1.0
      |      ELSE 1.0 END AS c
      |  FROM mom
      |), scored AS (
      |  SELECT r.supplier, r.n, r.x,
      |    round(CAST(r.p AS DOUBLE), 6) AS raw_rate,
      |    round((CAST(r.x AS DOUBLE) + pr.m * pr.c)
      |      / (CAST(r.n AS DOUBLE) + pr.c), 6) AS shrunk_rate,
      |    round(pr.m * pr.c, 6) AS alpha,
      |    round((1.0 - pr.m) * pr.c, 6) AS beta
      |  FROM rates r CROSS JOIN prior pr
      |), ranked AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (ORDER BY raw_rate DESC, supplier)
      |      AS rank_raw,
      |    ROW_NUMBER() OVER (ORDER BY shrunk_rate DESC, supplier)
      |      AS rank_shrunk
      |  FROM scored
      |)
      |SELECT rank_shrunk, supplier, n, x, raw_rate, shrunk_rate,
      |  rank_raw, alpha, beta
      |FROM ranked WHERE rank_shrunk <= 15 ORDER BY rank_shrunk""".stripMargin

  /** §2.19u — Theil-T inequality index with exact within/between-group
    * decomposition over positive customer balances by nation:
    * T = (1/N)Σ(xᵢ/μ)ln(xᵢ/μ), and the additive split
    * T = Σ_g (S_g/S)·T_g + Σ_g (S_g/S)·ln(μ_g/μ) — the property Gini
    * famously lacks, and the reason Theil is the decomposition tool
    * for "how much inequality lives INSIDE nations vs BETWEEN them".
    * Exactness discipline: balances become exact DECIMAL(38,0) cents;
    * group and global means are single double divisions of exact
    * sums; every per-row ln term and per-group contribution passes
    * through DECIMAL(38,18) before summation (accumulation-order-
    * exact, the pageRank discipline), each output rounds once at 6.
    * Scale: one key-keyed aggregate (group stats), a ≤|nations|-row
    * broadcast join back, a ONE-ROW totals broadcast; the final fold
    * runs over the collapsed group frame. */
  def qTheil(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .where(col("c_acctbal") > 0)
      .select(col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,4)") * 10000)
          .cast("decimal(38,0)").as("x"))
    val g = cust.groupBy("c_nationkey")
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sxg"))
    val tot = broadcast(g.agg(sum(col("ng")).as("n"),
      sum(col("sxg")).as("sx"), count(lit(1)).as("n_groups")))
    val rows = cust.join(broadcast(g), "c_nationkey").crossJoin(tot)
      .withColumn("mu", col("sx").cast("double") / col("n"))
      .withColumn("mug", col("sxg").cast("double") / col("ng"))
      .withColumn("t_tot",
        ((col("x").cast("double") / col("mu")) *
          log(col("x").cast("double") / col("mu"))).cast("decimal(38,18)"))
      .withColumn("t_in",
        ((col("x").cast("double") / col("mug")) *
          log(col("x").cast("double") / col("mug"))).cast("decimal(38,18)"))
    val pg = rows.groupBy("c_nationkey")
      .agg(first(col("ng")).as("ng"), first(col("sxg")).as("sxg"),
        sum(col("t_tot")).as("stot"), sum(col("t_in")).as("s_in"))
      .crossJoin(tot)
      .select(col("stot"),
        ((col("sxg").cast("double") / col("sx").cast("double")) *
          (col("s_in").cast("double") / col("ng")))
          .cast("decimal(38,18)").as("w_g"),
        ((col("sxg").cast("double") / col("sx").cast("double")) *
          log((col("sxg").cast("double") / col("ng")) /
            (col("sx").cast("double") / col("n"))))
          .cast("decimal(38,18)").as("b_g"))
    pg.crossJoin(tot)
      .groupBy("n", "n_groups")
      .agg(sum(col("stot")).as("__st"), sum(col("w_g")).as("__w"),
        sum(col("b_g")).as("__b"))
      .select(col("n").as("n_customers"), col("n_groups"),
        round(col("__st").cast("double") / col("n"), 6).as("theil_total"),
        round(col("__w").cast("double"), 6).as("theil_within"),
        round(col("__b").cast("double"), 6).as("theil_between"))
  }

  val qTheilSql: String =
    """WITH cust AS (
      |  SELECT c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS DECIMAL(38,0))
      |      AS x
      |  FROM customer WHERE c_acctbal > 0
      |), g AS (
      |  SELECT c_nationkey, COUNT(*) AS ng,
      |    CAST(SUM(x) AS DECIMAL(38,0)) AS sxg
      |  FROM cust GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(ng) AS BIGINT) AS n,
      |    CAST(SUM(sxg) AS DECIMAL(38,0)) AS sx,
      |    COUNT(*) AS n_groups
      |  FROM g
      |), terms AS (
      |  SELECT c.c_nationkey,
      |    CAST((CAST(c.x AS DOUBLE) / (CAST(t.sx AS DOUBLE) / t.n))
      |      * ln(CAST(c.x AS DOUBLE) / (CAST(t.sx AS DOUBLE) / t.n))
      |      AS DECIMAL(38,18)) AS t_tot,
      |    CAST((CAST(c.x AS DOUBLE) / (CAST(g.sxg AS DOUBLE) / g.ng))
      |      * ln(CAST(c.x AS DOUBLE) / (CAST(g.sxg AS DOUBLE) / g.ng))
      |      AS DECIMAL(38,18)) AS t_in
      |  FROM cust c JOIN g ON c.c_nationkey = g.c_nationkey, tot t
      |), pg AS (
      |  SELECT t.c_nationkey, g.ng, g.sxg,
      |    CAST(SUM(t.t_tot) AS DECIMAL(38,18)) AS stot,
      |    CAST(SUM(t.t_in) AS DECIMAL(38,18)) AS s_in
      |  FROM terms t JOIN g ON t.c_nationkey = g.c_nationkey
      |  GROUP BY 1, g.ng, g.sxg
      |), contrib AS (
      |  SELECT stot,
      |    CAST((CAST(sxg AS DOUBLE) / CAST(tt.sx AS DOUBLE))
      |      * (CAST(s_in AS DOUBLE) / ng) AS DECIMAL(38,18)) AS w_g,
      |    CAST((CAST(sxg AS DOUBLE) / CAST(tt.sx AS DOUBLE))
      |      * ln((CAST(sxg AS DOUBLE) / ng)
      |        / (CAST(tt.sx AS DOUBLE) / tt.n)) AS DECIMAL(38,18)) AS b_g
      |  FROM pg, tot tt
      |)
      |SELECT tt.n AS n_customers, tt.n_groups,
      |  round(CAST(SUM(stot) AS DOUBLE) / tt.n, 6) AS theil_total,
      |  round(CAST(SUM(w_g) AS DOUBLE), 6) AS theil_within,
      |  round(CAST(SUM(b_g) AS DOUBLE), 6) AS theil_between
      |FROM contrib, tot tt
      |GROUP BY tt.n, tt.n_groups""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_theil" -> (qTheil _),
    "q_eb_shrinkage" -> (qEbShrinkage _),
    "q_price_index" -> (qPriceIndex _),
    "q_skyline" -> (qSkyline _),
    "q_basket_lift" -> (qBasketLift _),
    "q_lateral" -> (qLateral _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_mode" -> (qMode _),
    "q13_custdist" -> (q13CustDist _),
    "q4_late_shipped" -> (q4LateShipped _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q22_idle_rich" -> (q22IdleRich _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q_percentiles" -> (qPercentiles _),
    "q_cube" -> (qCube _),
    "q_pivot" -> (qPivot _),
    "q_running_total" -> (qRunningTotal _),
    "q1_pricing" -> (q1Pricing _),
    "q3_shipping" -> (q3Shipping _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q_top_customers" -> (qTopCustomers _),
    "q_orders_no_lineitem" -> (qOrdersNoLineitem _),
    "q_rollup" -> (qRollup _))

  val oracles: Map[String, String] = Map(
    "q_theil" -> qTheilSql,
    "q_eb_shrinkage" -> qEbShrinkageSql,
    "q_price_index" -> qPriceIndexSql,
    "q_skyline" -> qSkylineSql,
    "q_basket_lift" -> qBasketLiftSql,
    "q_lateral" -> qLateralSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_mode" -> qModeSql,
    "q13_custdist" -> q13CustDistSql,
    "q4_late_shipped" -> q4LateShippedSql,
    "q14_promo_revenue" -> q14PromoRevenueSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "q22_idle_rich" -> q22IdleRichSql,
    "q17_small_quantity" -> q17SmallQuantitySql,
    "q_percentiles" -> qPercentilesSql,
    "q_cube" -> qCubeSql,
    "q_pivot" -> qPivotSql,
    "q_running_total" -> qRunningTotalSql,
    "q1_pricing" -> q1PricingSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_local_supplier" -> q5LocalSupplierSql,
    "q_top_customers" -> qTopCustomersSql,
    "q_orders_no_lineitem" -> qOrdersNoLineitemSql,
    "q_rollup" -> qRollupSql)
}
