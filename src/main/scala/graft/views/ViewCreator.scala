package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's view command: register inputs under aliases, run a SQL
  * statement over them (reference: tnview/TnViewCreator.scala:20-26).
  * The query stays fully declarative — Catalyst optimizes across the view
  * boundary (filter pushdown into the underlying scans, join reorder).
  */
object ViewCreator {
  def createView(spark: SparkSession, inputs: Seq[(String, DataFrame)], query: String): DataFrame = {
    inputs.foreach { case (alias, df) => df.createOrReplaceTempView(alias) }
    spark.sql(query)
  }
}
