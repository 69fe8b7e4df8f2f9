package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All queries receive a scale-factor directory and read parquet from it.
  * At cluster scale the same API points at object-store paths; the parquet
  * source gives Catalyst filter pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      if (name == "events") loadEvents(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    // The driver test files are SINGLE-row-group parquet, which caps
    // scan parallelism at one task no matter how maxPartitionBytes is
    // set — so every compute-heavy first stage (md5 signatures,
    // shingling, JSON parsing, decimal partial aggregation) would run
    // serially on one core and its wall time would swing with whatever
    // that one thread contends with (measured ±5s on the dedup family).
    // A production corpus arrives in many files/row groups and gets this
    // parallelism from the scan for free; the rebalance (a shuffle of
    // kilobytes here) restores the plan shape the operators are designed
    // for. The fact tables keep scan-level pushdown: Catalyst pushes
    // deterministic filters below Repartition.
    val target = spark.sparkContext.defaultParallelism
    if (name == "region" || name == "nation") df else df.repartition(target)
  }

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright. Read nanos as long (legacy conf) and truncate to
    * microsecond timestamps — the generator never emits sub-microsecond
    * components, so this matches DuckDB's own ns→us coercion exactly.
    *
    * The conf DELIBERATELY stays set for the session: Spark re-reads it
    * when the scan executes, so restoring it immediately would break the
    * query; it only changes behaviour for other TIMESTAMP(NANOS) reads,
    * which would otherwise fail outright.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions._
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Register every table as a temp view so SQL can reference it by name. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
