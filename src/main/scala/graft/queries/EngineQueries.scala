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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc_plan" -> (qcPlan _),
    "qc_source_csv" -> (qcSourceCsv _))

  val oracles: Map[String, String] = Map(
    "qc_plan" -> qcPlanSql,
    "qc_source_csv" -> qcSourceCsvSql)
}
