package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.{SparkSpec, Tables}

class LayoutSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed join plans with no shuffle exchange") {
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    Layout.writeBucketed(orders, "b_orders", "/tmp/graft_bucket/orders",
      "o_orderkey", 4)
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "/tmp/graft_bucket/lineitem", "o_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.readTable(spark, "b_orders")
        .join(Layout.readTable(spark, "b_lineitem"), "o_orderkey")
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan
      assert(collectWithSubqueries(plan) {
        case e: ShuffleExchangeExec => e
      }.isEmpty, "bucketed join must not shuffle either side")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition filters prune partitioned reads at planning time") {
    Layout.writePartitioned(
      Tables.load(spark, dir, "documents"), "/tmp/graft_part/documents", "source")
    val read = spark.read.parquet("/tmp/graft_part/documents")
      .where(col("source") === "src1")
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("src1"))
    assert(read.count() > 0)
    assert(read.select("source").distinct().collect().map(_.getString(0)).toSeq
      == Seq("src1"))
  }
}
