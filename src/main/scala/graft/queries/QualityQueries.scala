package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.rules._

/** Driver-contract queries exercising the rules (assertion) engine —
  * SURVEY.md §2 items 1-5. Each query has a DuckDB oracle built from the
  * same predicate text, so the semantics (not-TRUE ⇒ invalid, concat_ws
  * reason joining, single-pass report) are verified value-for-value.
  */
object QualityQueries {

  /** The standard lineitem quality rules used by the qc_assert_* queries. */
  val lineitemRules: Seq[Rule] = Seq(
    Rule("l_quantity > 0 AND l_quantity <= 45", "quantity in (0,45]", 0.01),
    Rule("l_discount BETWEEN 0 AND 0.08", "discount within [0,0.08]", 0.10),
    Rule("l_extendedprice > 1000", "extended price above 1000", 0.02))

  private val ruleSqlPieces: Seq[(String, String)] = lineitemRules.map(r => (r.query, r.description))

  /** §2.1 — invalid rows + reason column over lineitem. */
  def qcAssertInvalid(spark: SparkSession, dir: String): DataFrame = {
    RuleRunner.invalidRows(Tables.load(spark, dir, "lineitem"), lineitemRules)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_extendedprice", RuleRunner.ReasonCol)
      .orderBy("l_orderkey", "l_linenumber")
  }

  val qcAssertInvalidSql: String = {
    val reasons = ruleSqlPieces
      .map { case (q, d) => s"CASE WHEN ($q) THEN NULL ELSE '$d' END" }
      .mkString(", ")
    s"""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice,
       |  concat_ws(' &&& ', $reasons) AS __REASON_INVALID__
       |FROM lineitem
       |WHERE concat_ws(' &&& ', $reasons) <> ''
       |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** §2.2 — per-rule report (numInvalid/fractionInvalid/failed), one pass. */
  def qcAssertReport(spark: SparkSession, dir: String): DataFrame =
    RuleRunner.reportDF(spark, Tables.load(spark, dir, "lineitem"), lineitemRules)

  val qcAssertReportSql: String = {
    val pieces = lineitemRules.zipWithIndex.map { case (r, i) =>
      s"""SELECT ${i + 1} AS rule_id, '${r.description}' AS description,
         |  CAST(${r.threshold} AS DOUBLE) AS threshold,
         |  COUNT(*) AS total_rows,
         |  CAST(SUM(CASE WHEN (${r.query}) THEN 0 ELSE 1 END) AS BIGINT) AS num_invalid,
         |  CAST(SUM(CASE WHEN (${r.query}) THEN 0 ELSE 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fraction_invalid,
         |  (CAST(SUM(CASE WHEN (${r.query}) THEN 0 ELSE 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) > ${r.threshold} AS failed
         |FROM lineitem""".stripMargin
    }
    pieces.mkString("", "\nUNION ALL\n", "\nORDER BY rule_id")
  }

  /** §2.3 — user-defined feature columns flow into rule + output. */
  def qcAssertFeatures(spark: SparkSession, dir: String): DataFrame = {
    val rules = Seq(Rule(
      query = "disc_price <= 90000",
      description = "discounted price within bound",
      threshold = 0.05,
      features = Map("disc_price" ->
        "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE)")))
    RuleRunner.invalidRows(Tables.load(spark, dir, "lineitem"), rules)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
        "disc_price", RuleRunner.ReasonCol)
      .orderBy("l_orderkey", "l_linenumber")
  }

  val qcAssertFeaturesSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS disc_price,
      |  'discounted price within bound' AS __REASON_INVALID__
      |FROM lineitem
      |WHERE NOT (CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) <= 90000)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** §2.4 — summary aggregates over a rule's invalid rows. */
  def qcAssertSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rule = Rule(
      query = "o_totalprice <= 400000",
      description = "order total within bound",
      threshold = 0.25,
      summary = Map(
        "n_invalid" -> "COUNT(*)",
        "sum_excess" -> "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)) - 400000) AS DOUBLE)",
        "max_total" -> "MAX(o_totalprice)"))
    val rep = RuleRunner.reports(Tables.load(spark, dir, "orders"), Seq(rule)).head
    Seq((rep.description, rep.numInvalid,
      rep.summaryStats("n_invalid").asInstanceOf[Long],
      rep.summaryStats("sum_excess").asInstanceOf[Double],
      rep.summaryStats("max_total").asInstanceOf[Double]))
      .toDF("description", "num_invalid", "n_invalid", "sum_excess", "max_total")
  }

  val qcAssertSummarySql: String =
    """SELECT 'order total within bound' AS description,
      |  COUNT(*) AS num_invalid,
      |  COUNT(*) AS n_invalid,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)) - 400000) AS DOUBLE) AS sum_excess,
      |  MAX(o_totalprice) AS max_total
      |FROM orders
      |WHERE NOT (o_totalprice <= 400000)""".stripMargin

  /** §2.5 — distributed context windows around invalid rows: for every
    * customer having an out-of-bound order, all of that customer's orders
    * ranked by date. */
  def qcAssertWindow(spark: SparkSession, dir: String): DataFrame = {
    val rule = Rule("o_totalprice <= 490000", "order total within bound", 0.0)
    val params = SampleWindowParams(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
    RuleRunner.sampleWindows(Tables.load(spark, dir, "orders"), rule, params)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "window_rank")
      .orderBy("o_custkey", "window_rank")
  }

  val qcAssertWindowSql: String =
    """SELECT o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o.o_custkey ORDER BY o.o_orderdate, o.o_orderkey) AS window_rank
      |FROM orders o
      |WHERE o.o_custkey IN (SELECT o_custkey FROM orders WHERE NOT (o_totalprice <= 490000))
      |ORDER BY o_custkey, window_rank""".stripMargin

  /** §2.5b — cross-table referential integrity: orphan counts for three
    * foreign-key relations in one unioned report. */
  def qcRefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.load(spark, dir, n)
    RuleRunner.referentialStats(t("orders"), t("customer"),
      "o_custkey", "c_custkey", "orders->customer")
      .unionAll(RuleRunner.referentialStats(t("lineitem"), t("orders"),
        "l_orderkey", "o_orderkey", "lineitem->orders"))
      .unionAll(RuleRunner.referentialStats(t("events"), t("customer"),
        "user_id", "c_custkey", "events->customer"))
      .orderBy("relation")
  }

  val qcRefIntegritySql: String = {
    def piece(child: String, ck: String, parent: String, pk: String, name: String) =
      s"""SELECT '$name' AS relation, COUNT(*) AS n_child,
         |  CAST(SUM(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
         |  ON c.$ck = p.$pk""".stripMargin
    Seq(piece("orders", "o_custkey", "customer", "c_custkey", "orders->customer"),
      piece("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders"),
      piece("events", "user_id", "customer", "c_custkey", "events->customer"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  /** §2.5c — orphan-key triage examples: for each FK relation, up to 5
    * concrete orphaned key values chosen by seeded-md5 order (the same
    * deterministic-election rule as qp_sample) — the row a 13-orphan
    * alert needs next to it ("WHICH keys broke?"). Distinct child keys
    * anti-join the parent (one shuffle each); the rank window runs
    * over the ORPHAN set only, which is an error set — orders of
    * magnitude below the fact table whenever the pipeline is healthy
    * enough to be worth triaging.
    *
    * Scope note: this triages NON-NULL orphan keys. [[qcRefIntegrity]]
    * counts every child row that fails to join — including NULL-keyed
    * rows — so its n_orphans can exceed the relations represented
    * here; a NULL FK is a nullability defect (one rule predicate),
    * not a key anyone can go look up. */
  def qcOrphans(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def t(n: String) = Tables.load(spark, dir, n)
    def examples(child: DataFrame, parent: DataFrame, ck: String,
        pk: String, name: String): DataFrame = {
      val w = Window.orderBy(
        md5(concat_ws(":", lit("orphan"), col("__k"))), col("__k"))
      child.select(col(ck).as("__k")).where(col("__k").isNotNull).distinct()
        .join(parent.select(col(pk).as("__k")).distinct(),
          Seq("__k"), "left_anti")
        .withColumn("orphan_rank", row_number().over(w).cast("bigint"))
        .where(col("orphan_rank") <= 5)
        .select(lit(name).as("relation"), col("orphan_rank"),
          col("__k").cast("bigint").as("orphan_key"))
    }
    examples(t("orders"), t("customer"), "o_custkey", "c_custkey",
      "orders->customer")
      .unionByName(examples(t("lineitem"), t("orders"), "l_orderkey",
        "o_orderkey", "lineitem->orders"))
      .unionByName(examples(t("events"), t("customer"), "user_id",
        "c_custkey", "events->customer"))
      .orderBy("relation", "orphan_rank")
  }

  val qcOrphansSql: String = {
    def piece(child: String, ck: String, parent: String, pk: String,
        name: String) =
      s"""SELECT '$name' AS relation, orphan_rank, orphan_key FROM (
         |  SELECT CAST(ROW_NUMBER() OVER (
         |      ORDER BY md5('orphan:' || k), k) AS BIGINT) AS orphan_rank,
         |    CAST(k AS BIGINT) AS orphan_key
         |  FROM (
         |    SELECT DISTINCT $ck AS k FROM $child
         |    WHERE $ck IS NOT NULL
         |      AND $ck NOT IN (SELECT $pk FROM $parent WHERE $pk IS NOT NULL)
         |  )
         |) WHERE orphan_rank <= 5""".stripMargin
    Seq(piece("orders", "o_custkey", "customer", "c_custkey",
        "orders->customer"),
      piece("lineitem", "l_orderkey", "orders", "o_orderkey",
        "lineitem->orders"),
      piece("events", "user_id", "customer", "c_custkey",
        "events->customer"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation, orphan_rank")
  }

  /** §2.5d — order-independent table fingerprints: the cross-
    * environment reconciliation primitive ("is the replicated table
    * byte-equal to the source?") that compares 100 TB tables by
    * exchanging ONE row each, no data movement. Every row renders to a
    * canonical string (integers verbatim; doubles via DECIMAL(18,4) so
    * binary-equal values can never format apart; timestamps pinned to
    * 6-digit micros), hashes through portable md5, and the 32-bit row
    * hashes SUM — a commutative fold, so partition order, file order,
    * and shuffle order cannot move the checksum, and the aggregation is
    * map-side-partial all the way down. DECIMAL(38,0) accumulator:
    * 2³² × row-count overflows int64 at ~4×10⁹ rows. The oracle
    * recomputes the identical fingerprint in DuckDB — the whole point
    * is that ANY engine can hold its end of the comparison. */
  def qcChecksum(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.md5Hash32
    def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    def dec(c: Column): Column = c.cast("decimal(18,4)").cast("string")
    def fp(name: String, canon: DataFrame => Column): DataFrame = {
      val df = Tables.load(spark, dir, name)
      df.select(md5Hash32(canon(df)).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("h").cast("decimal(38,0)")).as("checksum"))
        .select(lit(name).as("table_name"), col("n_rows"),
          // Emit the fingerprint as its exact base-10 string: the value
          // is an integer, the text render is canonical in every engine,
          // so the comparison can never hinge on how a consumer
          // canonicalizes DECIMAL(38,0).
          col("checksum").cast("string").as("checksum"))
    }
    val tables: Seq[(String, DataFrame => Column)] = Seq(
      "region" -> (df => concat_ws("|", col("r_regionkey"), col("r_name"))),
      "nation" -> (df => concat_ws("|", col("n_nationkey"), col("n_name"),
        col("n_regionkey"))),
      "supplier" -> (df => concat_ws("|", col("s_suppkey"), col("s_name"),
        col("s_nationkey"), dec(col("s_acctbal")))),
      "customer" -> (df => concat_ws("|", col("c_custkey"), col("c_name"),
        col("c_nationkey"), dec(col("c_acctbal")), col("c_mktsegment"))),
      "orders" -> (df => concat_ws("|", col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), dec(col("o_totalprice")),
        fmtTs(col("o_orderdate")), col("o_orderpriority"))))
    tables.map { case (n, c) => fp(n, c) }
      .reduce(_ unionByName _)
      .orderBy("table_name")
  }

  val qcChecksumSql: String = {
    def piece(name: String, canon: String) =
      s"""SELECT '$name' AS table_name, COUNT(*) AS n_rows,
         |  CAST(CAST(SUM(('0x' || substr(md5($canon), 1, 8))::BIGINT)
         |    AS DECIMAL(38,0)) AS VARCHAR) AS checksum
         |FROM $name""".stripMargin
    def dec(c: String) = s"CAST(CAST($c AS DECIMAL(18,4)) AS VARCHAR)"
    Seq(
      piece("region", "concat_ws('|', r_regionkey, r_name)"),
      piece("nation", "concat_ws('|', n_nationkey, n_name, n_regionkey)"),
      piece("supplier", s"concat_ws('|', s_suppkey, s_name, s_nationkey, ${dec("s_acctbal")})"),
      piece("customer", s"concat_ws('|', c_custkey, c_name, c_nationkey, ${dec("c_acctbal")}, c_mktsegment)"),
      piece("orders", s"concat_ws('|', o_orderkey, o_custkey, o_orderstatus, ${dec("o_totalprice")}, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f'), o_orderpriority)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** §2.5f — composite data-quality scorecard: the one-row executive
    * rollup a table's owner actually gets paged on, composed from the
    * dimensions the individual operators measure — primary-key
    * duplication, referential orphans, null incidence on critical
    * columns, domain validity — folded into a weighted 0-100 score.
    * Every rate is exact and integer-derived; the score is one double
    * expression over them, so the whole card is engine-reproducible.
    * Shape: one aggregation over orders (all four counts in a single
    * pass — COUNT(DISTINCT) included, its documented skew swap-in
    * being §37b's salted form) plus one broadcast anti-join count
    * against the customer dimension. */
  def qcScorecard(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val custKeys = Tables.load(spark, dir, "customer").select("c_custkey")
    val orphans = orders.join(broadcast(custKeys),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    orders.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        sum(when(col("o_custkey").isNull || col("o_totalprice").isNull ||
          col("o_orderdate").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("n_invalid"))
      .join(broadcast(orphans))
      .select(lit("orders").as("table_name"), col("n_rows"),
        round((col("n_rows") - col("n_keys")).cast("double") / col("n_rows"), 6)
          .as("pk_dup_rate"),
        round(col("n_orphans").cast("double") / col("n_rows"), 6)
          .as("orphan_rate"),
        round(col("n_null").cast("double") / col("n_rows"), 6).as("null_rate"),
        round(col("n_invalid").cast("double") / col("n_rows"), 6)
          .as("invalid_rate"),
        round(lit(100.0) * (lit(1.0) -
          (lit(0.4) * ((col("n_rows") - col("n_keys")).cast("double") / col("n_rows")) +
            lit(0.3) * (col("n_orphans").cast("double") / col("n_rows")) +
            lit(0.2) * (col("n_null").cast("double") / col("n_rows")) +
            lit(0.1) * (col("n_invalid").cast("double") / col("n_rows")))), 6)
          .as("dq_score"))
  }

  val qcScorecardSql: String =
    """WITH base AS (
      |  SELECT COUNT(*) AS n_rows,
      |    COUNT(DISTINCT o_orderkey) AS n_keys,
      |    SUM(CASE WHEN o_custkey IS NULL OR o_totalprice IS NULL
      |      OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS n_null,
      |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS n_invalid
      |  FROM orders
      |), orph AS (
      |  -- LEFT JOIN + IS NULL, not NOT IN: mirrors the Spark side's
      |  -- left_anti exactly — a NULL o_custkey counts as an orphan,
      |  -- and a NULL c_custkey cannot zero the whole count the way
      |  -- NOT IN's three-valued logic would.
      |  SELECT COUNT(*) AS n_orphans
      |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |    ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NULL
      |)
      |SELECT 'orders' AS table_name, n_rows,
      |  round(CAST(n_rows - n_keys AS DOUBLE) / n_rows, 6) AS pk_dup_rate,
      |  round(CAST(n_orphans AS DOUBLE) / n_rows, 6) AS orphan_rate,
      |  round(CAST(n_null AS DOUBLE) / n_rows, 6) AS null_rate,
      |  round(CAST(n_invalid AS DOUBLE) / n_rows, 6) AS invalid_rate,
      |  round(100.0 * (1.0 -
      |    (0.4 * (CAST(n_rows - n_keys AS DOUBLE) / n_rows) +
      |     0.3 * (CAST(n_orphans AS DOUBLE) / n_rows) +
      |     0.2 * (CAST(n_null AS DOUBLE) / n_rows) +
      |     0.1 * (CAST(n_invalid AS DOUBLE) / n_rows))), 6) AS dq_score
      |FROM base, orph""".stripMargin

  /** §2.5e — driver-hash canaries. One single-row query per output type
    * whose Spark and DuckDB results are trivially identical by
    * construction. Purpose: when a CORRECTNESS row goes hash-red with
    * value-identical results (r7 q_mode, r8 qc_checksum), the canaries
    * split the blame instantly — a red canary means the comparison
    * harness canonicalizes that TYPE differently between engines; all
    * canaries green means the engine result itself drifted. Each query
    * still reads a real table so the load path is exercised. */
  private def canaryBase(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "region").agg(count(lit(1)).cast("long").as("n_rows"))

  def qcCanaryDecimal(spark: SparkSession, dir: String): DataFrame =
    canaryBase(spark, dir).select(col("n_rows"),
      lit("322677750168629").cast("decimal(38,0)").as("v_dec38"),
      lit("1234.5678").cast("decimal(18,4)").as("v_dec18_4"))
  val qcCanaryDecimalSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(322677750168629 AS DECIMAL(38,0)) AS v_dec38,
      |  CAST(1234.5678 AS DECIMAL(18,4)) AS v_dec18_4
      |FROM region""".stripMargin

  /** The green TWIN of [[qcCanaryDecimal]]: the SAME decimal values
    * string-rendered in both engines. Decimal→string prints identical
    * plain digits everywhere, so this row hash-matches while
    * qc_canary_decimal stays red — together they prove the red is the
    * driver comparator's DECIMAL canonicalization, not a value drift
    * (value-identical + red raw + green rendered = harness defect). */
  def qcCanaryDecimalStr(spark: SparkSession, dir: String): DataFrame =
    canaryBase(spark, dir).select(col("n_rows"),
      lit("322677750168629").cast("decimal(38,0)").cast("string")
        .as("v_dec38_str"),
      lit("1234.5678").cast("decimal(18,4)").cast("string")
        .as("v_dec18_4_str"))
  val qcCanaryDecimalStrSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(CAST(322677750168629 AS DECIMAL(38,0)) AS VARCHAR)
      |    AS v_dec38_str,
      |  CAST(CAST(1234.5678 AS DECIMAL(18,4)) AS VARCHAR)
      |    AS v_dec18_4_str
      |FROM region""".stripMargin

  def qcCanaryTimestamp(spark: SparkSession, dir: String): DataFrame =
    canaryBase(spark, dir).select(col("n_rows"),
      to_timestamp(lit("2024-03-01 12:34:56.789123")).as("v_ts"),
      to_date(lit("2024-03-01")).as("v_date"))
  val qcCanaryTimestampSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  TIMESTAMP '2024-03-01 12:34:56.789123' AS v_ts,
      |  DATE '2024-03-01' AS v_date
      |FROM region""".stripMargin

  def qcCanaryDouble(spark: SparkSession, dir: String): DataFrame =
    canaryBase(spark, dir).select(col("n_rows"),
      (lit(0.1) + lit(0.2)).as("v_sum"),    // IEEE 0.30000000000000004
      (lit(1.0) / lit(3.0)).as("v_third"),
      lit(1.5e-45).as("v_tiny"))
  val qcCanaryDoubleSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS v_sum,
      |  CAST(1.0 AS DOUBLE) / CAST(3.0 AS DOUBLE) AS v_third,
      |  CAST(1.5e-45 AS DOUBLE) AS v_tiny
      |FROM region""".stripMargin

  def qcCanaryArray(spark: SparkSession, dir: String): DataFrame =
    canaryBase(spark, dir).select(col("n_rows"),
      array(lit(1), lit(2), lit(3)).as("v_arr_int"),
      array(lit("a"), lit("b")).as("v_arr_str"))
  val qcCanaryArraySql: String =
    """SELECT COUNT(*) AS n_rows,
      |  [1, 2, 3] AS v_arr_int,
      |  ['a', 'b'] AS v_arr_str
      |FROM region""".stripMargin

  /** §2.13b8 (query face) — rule suggestion facts over orders: per
    * audited column, the learned kind (numeric p1/p99 range widened 5%,
    * low-cardinality enum set, not-null), the band, the enum-set size,
    * and the threshold the suggested rule would carry (observed
    * out-of-band rate + ε) — [[graft.rules.RuleSuggest]]'s structured
    * output, oracle-checked so the learned facts themselves are
    * engine-exact (the rendered Rules are spec-checked for
    * self-consistency in RuleSuggestSpec). */
  def qcSuggest(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val cols = Seq("o_totalprice", "o_orderstatus", "o_orderpriority",
      "o_orderdate")
    val rows = RuleSuggest.suggest(orders, cols).map { s =>
      (s.column, s.kind,
        s.lo.map(v => BigDecimal(v).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble),
        s.hi.map(v => BigDecimal(v).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble),
        s.values.length.toLong,
        // Suggestion.threshold IS the raw observed rate (rules() adds
        // its epsilon only when rendering runnable Rules).
        BigDecimal(s.threshold).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    rows.toDF("column_name", "kind", "lo", "hi", "n_values", "out_rate")
      .orderBy("column_name")
  }

  val qcSuggestSql: String =
    """WITH p AS (
      |  SELECT quantile_cont(o_totalprice, 0.01) AS p1,
      |         quantile_cont(o_totalprice, 0.99) AS p99,
      |         CAST(count(*) AS DOUBLE) AS total
      |  FROM orders
      |), band AS (
      |  SELECT p1, p99, total,
      |    greatest(p99 - p1, greatest(abs(p1), 1.0) * 1e-9) AS span
      |  FROM p
      |), r AS (
      |  SELECT 'o_totalprice' AS column_name, 'range' AS kind,
      |    round(p1 - 0.05 * span, 6) AS lo,
      |    round(p99 + 0.05 * span, 6) AS hi,
      |    CAST(0 AS BIGINT) AS n_values,
      |    round((SELECT count(*) FROM orders, band
      |           WHERE o_totalprice < p1 - 0.05 * span
      |              OR o_totalprice > p99 + 0.05 * span) / total, 6)
      |      AS out_rate
      |  FROM band
      |)
      |SELECT * FROM r
      |UNION ALL
      |SELECT 'o_orderstatus', 'enum', NULL, NULL,
      |  (SELECT count(DISTINCT o_orderstatus) FROM orders), 0.0
      |UNION ALL
      |SELECT 'o_orderpriority', 'enum', NULL, NULL,
      |  (SELECT count(DISTINCT o_orderpriority) FROM orders), 0.0
      |UNION ALL
      |SELECT 'o_orderdate', 'not_null', NULL, NULL, 0, 0.0
      |ORDER BY column_name""".stripMargin

  /** §2.5g — referential CARDINALITY audit: per FK relation, the
    * fan-out profile (parents, children, childless parents, max and
    * mean fan-out) — the structural complement of [[qcRefIntegrity]]
    * (which checks orphans, i.e. children without parents; this
    * checks parents' child distributions — a max fan-out that jumps
    * 100× is the skewed-key early warning §37's salted join exists
    * for, and childless-parent drift flags upstream loss). Each
    * relation is one child-side key aggregate left-joined to the
    * parent key set — collapsed frames, one shuffle per relation,
    * exact integer stats; the four ≤1-row results union driver-free. */
  def qcFanout(spark: SparkSession, dir: String): DataFrame = {
    def rel(label: String, parents: DataFrame, pk: String,
        children: DataFrame, fk: String): DataFrame = {
      val cnt = children.groupBy(col(fk).as("__k"))
        .agg(count(lit(1)).as("__c"))
      parents.select(col(pk).as("__p"))
        .join(cnt, col("__p") === col("__k"), "left_outer")
        .select(coalesce(col("__c"), lit(0L)).as("__c"))
        .agg(count(lit(1)).as("n_parents"),
          sum(col("__c")).as("n_children"),
          sum(when(col("__c") === 0L, 1L).otherwise(0L))
            .as("childless_parents"),
          max(col("__c")).as("max_fanout"))
        .select(lit(label).as("relation"), col("n_parents"),
          col("n_children"), col("childless_parents"), col("max_fanout"),
          round(col("n_children").cast("double") /
            col("n_parents").cast("double"), 6).as("avg_fanout"))
    }
    val li = Tables.load(spark, dir, "lineitem")
    rel("customer->orders", Tables.load(spark, dir, "customer"),
      "c_custkey", Tables.load(spark, dir, "orders"), "o_custkey")
      .unionByName(rel("orders->lineitem",
        Tables.load(spark, dir, "orders"), "o_orderkey", li, "l_orderkey"))
      .unionByName(rel("part->lineitem",
        Tables.load(spark, dir, "part"), "p_partkey", li, "l_partkey"))
      .unionByName(rel("supplier->lineitem",
        Tables.load(spark, dir, "supplier"), "s_suppkey", li, "l_suppkey"))
      .orderBy("relation")
  }

  val qcFanoutSql: String = {
    def rel(label: String, ptab: String, pk: String, ctab: String,
        fk: String) =
      s"""SELECT '$label' AS relation,
         |  COUNT(*) AS n_parents,
         |  CAST(SUM(c) AS BIGINT) AS n_children,
         |  CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS childless_parents,
         |  CAST(MAX(c) AS BIGINT) AS max_fanout,
         |  round(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS avg_fanout
         |FROM (
         |  SELECT COALESCE(cnt.c, 0) AS c
         |  FROM $ptab p LEFT JOIN (
         |    SELECT $fk AS k, COUNT(*) AS c FROM $ctab GROUP BY 1
         |  ) cnt ON p.$pk = cnt.k
         |)""".stripMargin
    s"""${rel("customer->orders", "customer", "c_custkey",
        "orders", "o_custkey")}
       |UNION ALL
       |${rel("orders->lineitem", "orders", "o_orderkey",
        "lineitem", "l_orderkey")}
       |UNION ALL
       |${rel("part->lineitem", "part", "p_partkey",
        "lineitem", "l_partkey")}
       |UNION ALL
       |${rel("supplier->lineitem", "supplier", "s_suppkey",
        "lineitem", "l_suppkey")}
       |ORDER BY relation""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc_fanout" -> (qcFanout _),
    "qc_suggest" -> (qcSuggest _),
    "qc_canary_decimal" -> (qcCanaryDecimal _),
    "qc_canary_decimal_str" -> (qcCanaryDecimalStr _),
    "qc_scorecard" -> (qcScorecard _),
    "qc_canary_timestamp" -> (qcCanaryTimestamp _),
    "qc_canary_double" -> (qcCanaryDouble _),
    "qc_canary_array" -> (qcCanaryArray _),
    "qc_checksum" -> (qcChecksum _),
    "qc_orphans" -> (qcOrphans _),
    "qc_ref_integrity" -> (qcRefIntegrity _),
    "qc_assert_invalid" -> (qcAssertInvalid _),
    "qc_assert_report" -> (qcAssertReport _),
    "qc_assert_features" -> (qcAssertFeatures _),
    "qc_assert_summary" -> (qcAssertSummary _),
    "qc_assert_window" -> (qcAssertWindow _))

  val oracles: Map[String, String] = Map(
    "qc_fanout" -> qcFanoutSql,
    "qc_suggest" -> qcSuggestSql,
    "qc_canary_decimal" -> qcCanaryDecimalSql,
    "qc_canary_decimal_str" -> qcCanaryDecimalStrSql,
    "qc_scorecard" -> qcScorecardSql,
    "qc_canary_timestamp" -> qcCanaryTimestampSql,
    "qc_canary_double" -> qcCanaryDoubleSql,
    "qc_canary_array" -> qcCanaryArraySql,
    "qc_checksum" -> qcChecksumSql,
    "qc_orphans" -> qcOrphansSql,
    "qc_ref_integrity" -> qcRefIntegritySql,
    "qc_assert_invalid" -> qcAssertInvalidSql,
    "qc_assert_report" -> qcAssertReportSql,
    "qc_assert_features" -> qcAssertFeaturesSql,
    "qc_assert_summary" -> qcAssertSummarySql,
    "qc_assert_window" -> qcAssertWindowSql)
}
