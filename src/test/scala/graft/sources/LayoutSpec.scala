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

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_part_dpp/fact"
    // Fact partitioned by a surrogate key; the filter arrives only
    // through the DIM side, so planning-time pruning can't fire — DPP
    // must inject the dim's build-side values as a runtime partition
    // filter on the fact scan (the join shape every star schema runs
    // at 100 TB: partition-on-date fact × filtered date dim).
    spark.range(10000)
      .select(col("id"), (col("id") % 10).cast("int").as("pk"))
      .write.mode("overwrite").partitionBy("pk").parquet(path)
    // The dim must be a file-backed relation: the PartitionPruning rule
    // skips in-memory LocalRelations (no scan to reuse / no benefit
    // estimate), which matches production — dims live in storage.
    val dimPath = "/tmp/graft_part_dpp/dim"
    Seq.tabulate(10)(i => (i, s"name_$i")).toDF("pk", "name")
      .write.mode("overwrite").parquet(dimPath)
    val joined = spark.read.parquet(path)
      .join(spark.read.parquet(dimPath).where(col("name") === "name_3"), "pk")
    assert(joined.count() == 1000)
    val scan = joined.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("fact")).getOrElse("")
    assert(scan.contains("dynamicpruning"),
      s"fact scan must carry a runtime dynamicpruning filter:\n$scan")
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
