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

  test("overwritePartitions replaces only the partitions being written") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_part_dyn"
    Seq((1L, "d1", "a"), (2L, "d1", "b"), (3L, "d2", "c"))
      .toDF("id", "day", "v")
      .write.mode("overwrite").partitionBy("day").parquet(path)
    // rerun of day d2 with corrected data: d1 must survive untouched
    Layout.overwritePartitions(
      Seq((9L, "d2", "fixed")).toDF("id", "day", "v"), path, "day")
    val back = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("day"))).toSet
    assert(back == Set((1L, "d1"), (2L, "d1"), (9L, "d2")))
    // the session setting is restored, not leaked
    assert(spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode").forall(_ != "dynamic"))
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
