package graft.queries

import graft.engine._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Driver-contract queries for the plan engine and non-parquet sources —
  * SURVEY.md §2 items 10-11.
  */
object EngineQueries {

  /** §2.10 — a two-command plan (view → assertion) with `${dir}` variable
    * substitution; the plan's final output (invalid rows of the assertion
    * over the view) is the query result. */
  def qcPlan(spark: SparkSession, dir: String): DataFrame = {
    val planJson =
      """{
        |  "commands": [
        |    {
        |      "command": "view",
        |      "inputs": [
        |        {"ref": "${dir}/customer.parquet", "onDisk": true},
        |        {"ref": "${dir}/nation.parquet", "onDisk": true}
        |      ],
        |      "params": {
        |        "tableAliases": ["c", "n"],
        |        "query": "SELECT c_custkey, c_name, c_acctbal, n_name FROM c JOIN n ON c_nationkey = n_nationkey"
        |      },
        |      "outputKey": "custView",
        |      "cache": true
        |    },
        |    {
        |      "command": "assertion",
        |      "input": {"ref": "custView", "onDisk": false},
        |      "params": {
        |        "assertions": [
        |          {"query": "c_acctbal >= 0", "description": "non-negative balance", "threshold": 0.05}
        |        ]
        |      },
        |      "outputKey": "negBal"
        |    }
        |  ]
        |}""".stripMargin
    val plan = PlanParser.parse(planJson, variables = Map("dir" -> dir))
    val result = new PlanRunner(spark).run(plan)
    result.outputs("negBal")
      .select("c_custkey", "c_name", "c_acctbal", "n_name", "__REASON_INVALID__")
      .orderBy("c_custkey")
  }

  val qcPlanSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  'non-negative balance' AS __REASON_INVALID__
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT (c_acctbal >= 0)
      |ORDER BY c_custkey""".stripMargin

  /** §2.11 — delimited-text source: round-trip the region table through a
    * pipe-delimited file and read it back with header + schema inference,
    * as the reference's delimited input path does. */
  def qcSourceCsv(spark: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_csv_roundtrip/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    Tables.loadRegion(spark, dir)
      .write.mode("overwrite").option("header", "true").option("delimiter", "|")
      .csv(tmp)
    new PlanRunner(spark)
      .resolve(InputRef(tmp, onDisk = true, format = Some("csv"), delimiter = Some("|")))
      .orderBy("r_regionkey")
  }

  private object Tables {
    def loadRegion(spark: SparkSession, dir: String): DataFrame =
      graft.Tables.load(spark, dir, "region").select(
        col("r_regionkey").cast("int"), col("r_name"))
  }

  val qcSourceCsvSql: String =
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"

  /** §2.11 (text path) — raw-text corpus source: round-trip the
    * documents' text through line-oriented text files (the native
    * schemaless LLM-corpus drop format) and read it back through the
    * engine's `text` reader — one document per line in `value`. The
    * oracle reads the same content from the parquet table, proving the
    * text path loses nothing. */
  def qcSourceText(spark: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_text_roundtrip/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.Tables.load(spark, dir, "documents")
      .select(col("text"))
      .write.mode("overwrite").text(tmp)
    new PlanRunner(spark)
      .resolve(InputRef(tmp, onDisk = true, format = Some("text")))
      .orderBy("value")
  }

  val qcSourceTextSql: String =
    "SELECT text AS value FROM documents ORDER BY value"

  /** §2.13b2 — schema-contract gate through the plan engine: the `schema`
    * command checks declared (name, type, nullable) columns against the
    * orders table BEFORE row-level rules would run. The contract here
    * deliberately drifts (o_custkey declared int vs actual bigint;
    * o_comment declared but absent) so every report status appears. The
    * check is pure driver-side metadata — zero jobs at any scale — and
    * the report is fully determined by the table's schema, so the oracle
    * pins the expected rows as literals (also a regression tripwire if
    * the driver regenerates the parquet with different physical types;
    * o_orderdate asserting `timestamp` pins the NTZ normalization in
    * Tables.load). */
  def qcSchema(spark: SparkSession, dir: String): DataFrame = {
    val planJson =
      """{
        |  "commands": [
        |    {"command": "schema",
        |     "input": {"ref": "orders", "onDisk": false},
        |     "params": {"columns": [
        |        {"name": "o_orderkey", "type": "bigint"},
        |        {"name": "o_custkey", "type": "int"},
        |        {"name": "o_orderstatus", "type": "string"},
        |        {"name": "o_totalprice", "type": "double"},
        |        {"name": "o_orderdate", "type": "timestamp"},
        |        {"name": "o_comment", "type": "string"}]},
        |     "outputKey": "schema_report"}
        |  ]
        |}""".stripMargin
    val plan = PlanParser.parse(planJson)
    new PlanRunner(spark)
      .register("orders", graft.Tables.load(spark, dir, "orders"))
      .run(plan)
      .outputs("schema_report")
      .orderBy("column_name")
  }

  val qcSchemaSql: String =
    """SELECT * FROM (VALUES
      |  ('o_comment', 'string', CAST(NULL AS VARCHAR), 'missing'),
      |  ('o_custkey', 'int', 'bigint', 'type_mismatch'),
      |  ('o_orderdate', 'timestamp', 'timestamp', 'ok'),
      |  ('o_orderkey', 'bigint', 'bigint', 'ok'),
      |  ('o_orderpriority', CAST(NULL AS VARCHAR), 'string', 'unexpected'),
      |  ('o_orderstatus', 'string', 'string', 'ok'),
      |  ('o_totalprice', 'double', 'double', 'ok')
      |) AS t(column_name, expected_type, actual_type, status)
      |ORDER BY column_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc_plan" -> (qcPlan _),
    "qc_source_csv" -> (qcSourceCsv _),
    "qc_schema" -> (qcSchema _),
    "qc_source_text" -> (qcSourceText _))

  val oracles: Map[String, String] = Map(
    "qc_plan" -> qcPlanSql,
    "qc_source_csv" -> qcSourceCsvSql,
    "qc_schema" -> qcSchemaSql,
    "qc_source_text" -> qcSourceTextSql)
}
