package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ AnalyticsTpch.queries ++ QualityQueries.queries ++
      DiffViewQueries.queries ++
      EngineQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries ++
      ProfileQueries.queries ++ OperatorQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The driver tolerates omissions (rows-only
    * check), but graft's policy is an oracle for EVERY query —
    * ContractSpec enforces totality; loosen it deliberately if an
    * operator is genuinely not SQL-expressible. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ AnalyticsTpch.oracles ++ QualityQueries.oracles ++
      DiffViewQueries.oracles ++
      EngineQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles ++
      MultimodalQueries.oracles ++ PipelineQueries.oracles ++
      ProfileQueries.oracles ++ OperatorQueries.oracles
}
