package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TopK, TopKPerKeyExec}

import graft.SparkSpec

/** [[org.apache.spark.sql.graft.TopK.perKey]] — the custom logical
  * node / planner strategy / two-stage physical operator. Pins:
  * value-equivalence against the `row_number` window plan on
  * multi-partition data, the partial→exchange→final plan shape, the
  * map-side pruning bound, null-key grouping, and k ≥ group size.
  */
class TopKPerKeySpec extends SparkSpec {

  private def sample = {
    val s = spark
    import s.implicits._
    // 10 keys × 200 rows across 8 partitions; val has ties (mod 17)
    // so the unique id tie-break is load-bearing.
    spark.range(2000).repartition(8)
      .select((col("id") % 10).as("key"), (col("id") % 17).as("v"), col("id"))
  }

  test("matches the row_number window plan exactly (total order)") {
    val df = sample
    val got = TopK.perKey(df, Seq("key"), Seq(col("v").desc, col("id").asc), 3)
      .select("key", "v", "id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).select("key", "v", "id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.size == 30)
  }

  // The executed plan sits under an AdaptiveSparkPlan wrapper; descend.
  private def unwrapAqe(p: org.apache.spark.sql.execution.SparkPlan) =
    p.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(p)

  test("plans as partial -> exchange -> final") {
    val df = TopK.perKey(sample, Seq("key"), Seq(col("v").asc, col("id").asc), 2)
    val plan = unwrapAqe(df.queryExecution.executedPlan)
    val execs = plan.collect { case e: TopKPerKeyExec => e }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected one partial and one final TopKPerKeyExec:\n$plan")
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(exchanges.nonEmpty, s"expected a hash exchange between stages:\n$plan")
  }

  test("map-side pruning bounds the exchange to partitions * keys * k rows") {
    val df = sample // 2000 rows, 8 partitions, 10 keys
    val pruned = TopK.perKey(df, Seq("key"), Seq(col("v").asc, col("id").asc), 2)
    // The partial stage emits <= 8 * 10 * 2 = 160 rows (the map-side
    // pruning contract); execute just the partial subtree and count.
    // (Extracted before any action: post-execution AQE folds the
    // subtree into a materialized shuffle query stage.)
    val partial = unwrapAqe(pruned.queryExecution.executedPlan).collect {
      case e: TopKPerKeyExec if e.partial => e }.head
    assert(partial.execute().count() <= 160)
    assert(pruned.count() == 20) // 10 keys * k=2 survive the final stage
  }

  test("k >= group size keeps every row; null keys group together") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1L), 5L, 1L), (Some(1L), 6L, 2L),
      (None, 7L, 3L), (None, 8L, 4L), (None, 9L, 5L))
      .toDF("key", "v", "id")
    val all = TopK.perKey(df, Seq("key"), Seq(col("v").asc, col("id").asc), 10)
    assert(all.count() == 5)
    val top1 = TopK.perKey(df, Seq("key"), Seq(col("v").asc, col("id").asc), 1)
      .select("id").collect().map(_.getLong(0)).toSet
    // null group's smallest v is id=3; key=1 group's is id=1.
    assert(top1 == Set(1L, 3L))
  }

  test("partial-stage key cap: saturated keys pass through, result exact") {
    val df = sample
    spark.conf.set("spark.graft.topk.maxTrackedKeys", "2")
    try {
      // With only 2 of 10 keys tracked per partial task, 8 keys' rows
      // flow to the exchange unpruned — the final stage must still
      // produce exactly the window plan's survivors.
      val got = TopK.perKey(df, Seq("key"),
          Seq(col("v").desc, col("id").asc), 3)
        .select("key", "v", "id").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3).select("key", "v", "id").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    } finally spark.conf.unset("spark.graft.topk.maxTrackedKeys")
  }

  test("rejects non-positive k and unknown key columns") {
    intercept[IllegalArgumentException] {
      TopK.perKey(sample, Seq("key"), Seq(col("v").asc), 0)
    }
    intercept[IllegalArgumentException] {
      TopK.perKey(sample, Seq("nope"), Seq(col("v").asc), 1)
    }
  }
}
