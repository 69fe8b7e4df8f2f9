package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.diff._
import graft.views.ViewCreator

/** Driver-contract queries for the diff and view operators —
  * SURVEY.md §2 items 6-9. The diff compares each order's stored total
  * against the total recomputed from its lineitems — a realistic
  * reconciliation QC.
  */
object DiffViewQueries {

  /** Recomputed order totals from lineitem. All arithmetic happens in
    * decimal (raw columns have ≤2 true decimal digits, so the casts are
    * exact) — casting a *computed* double to decimal is forbidden because
    * Spark (shortest-repr HALF_UP) and DuckDB (true binary value) round
    * differently at the cast scale. */
  private def computedTotals(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(6,4)") - col("l_discount").cast("decimal(6,4)")) *
        (lit(1).cast("decimal(6,4)") + col("l_tax").cast("decimal(6,4)")))
        .cast("decimal(38,6)").cast("double").as("computed_total"))

  private def diffConfig(filterEqual: Boolean) = DiffConfig(
    left = DiffSide(Seq("o_orderkey"), Seq("o_totalprice")),
    right = DiffSide(Seq("l_orderkey"), Seq("computed_total")),
    leftName = "ord", rightName = "li",
    numericThreshold = 1.0,
    filterEqualRows = filterEqual,
    // §2.8's qc_diff_validate exercises key validation on its own;
    // running the diff on pre-validated keys avoids recomputing the
    // lineitem aggregation a second time just to count its keys.
    validateKeys = false)

  private def runDiff(spark: SparkSession, dir: String, filterEqual: Boolean): DataFrame =
    DatasetDiff.diff(Tables.load(spark, dir, "orders"),
      computedTotals(spark, dir), diffConfig(filterEqual))
      .orderBy(coalesce(col("ord_o_orderkey"), col("li_l_orderkey")))

  /** §2.6 — keyed outer-join diff with numeric threshold. */
  def qcDiff(spark: SparkSession, dir: String): DataFrame =
    runDiff(spark, dir, filterEqual = false)

  /** §2.7 — same diff with equal rows filtered out. */
  def qcDiffFiltered(spark: SparkSession, dir: String): DataFrame =
    runDiff(spark, dir, filterEqual = true)

  private def diffOracle(filterEqual: Boolean): String = {
    val base =
      """WITH li AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS computed_total
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT o.o_orderkey AS ord_o_orderkey, li.l_orderkey AS li_l_orderkey,
        |  o.o_totalprice AS ord_o_totalprice, li.computed_total AS li_computed_total,
        |  CASE WHEN o.o_totalprice IS NOT NULL AND li.computed_total IS NOT NULL
        |       THEN (CASE WHEN abs(o.o_totalprice - li.computed_total) >= 1.0
        |                  THEN o.o_totalprice - li.computed_total ELSE 0.0 END)
        |       ELSE NULL END AS ord_o_totalprice__minus__li_computed_total,
        |  CASE WHEN o.o_totalprice IS NULL AND li.computed_total IS NULL THEN 'both null'
        |       WHEN o.o_totalprice IS NULL THEN 'only first null'
        |       WHEN li.computed_total IS NULL THEN 'only second null'
        |       WHEN abs(o.o_totalprice - li.computed_total) <= 1.0 THEN 'equal'
        |       ELSE 'both not null, same type, not equal' END AS ord_o_totalprice__equals__li_computed_total
        |FROM orders o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey""".stripMargin
    val filter =
      """
        |WHERE NOT (o.o_totalprice IS NOT DISTINCT FROM li.computed_total)
        |   OR (o.o_totalprice IS NOT NULL AND li.computed_total IS NOT NULL
        |       AND abs(o.o_totalprice - li.computed_total) >= 1.0)""".stripMargin
    base + (if (filterEqual) filter else "") +
      "\nORDER BY coalesce(o.o_orderkey, li.l_orderkey)"
  }

  /** §2.8 — single-pass key validation stats for both diff sides. */
  def qcDiffValidate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats =
      DatasetDiff.validationStats(Tables.load(spark, dir, "orders"), Seq("o_orderkey"), "orders") ++
        DatasetDiff.validationStats(Tables.load(spark, dir, "customer"), Seq("c_custkey"), "customer")
    stats.toDF("side", "n_rows", "n_distinct_keys", "n_null_keys").orderBy("side")
  }

  val qcDiffValidateSql: String =
    """SELECT 'orders' AS side, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT o_orderkey) AS n_distinct_keys,
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys
      |FROM orders
      |UNION ALL
      |SELECT 'customer' AS side, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT c_custkey) AS n_distinct_keys,
      |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys
      |FROM customer
      |ORDER BY side""".stripMargin

  val viewQuery: String =
    """SELECT n_name, COUNT(*) AS n_customers,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_balance
      |FROM cust JOIN nat ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** §2.9 — view command: SQL over aliased registered inputs. */
  def qcView(spark: SparkSession, dir: String): DataFrame =
    ViewCreator.createView(spark,
      Seq("cust" -> Tables.load(spark, dir, "customer"),
        "nat" -> Tables.load(spark, dir, "nation")),
      viewQuery)

  val qcViewSql: String = viewQuery
    .replace("FROM cust JOIN nat", "FROM customer JOIN nation")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc_diff" -> (qcDiff _),
    "qc_diff_filtered" -> (qcDiffFiltered _),
    "qc_diff_validate" -> (qcDiffValidate _),
    "qc_view" -> (qcView _))

  val oracles: Map[String, String] = Map(
    "qc_diff" -> diffOracle(filterEqual = false),
    "qc_diff_filtered" -> diffOracle(filterEqual = true),
    "qc_diff_validate" -> qcDiffValidateSql,
    "qc_view" -> qcViewSql)
}
