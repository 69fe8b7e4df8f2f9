package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaterializeSpec extends SparkSpec {

  test("once() checkpoints lazily; audit knob preserves full lineage") {
    val s = spark
    import s.implicits._
    val base = (1L to 100L).toDF("id").groupBy(col("id") % 10)
      .agg(count(lit(1)).as("c"))
    // Default: the returned frame is checkpoint-backed (plan truncates
    // to an RDD scan) and values are unchanged.
    val m = Materialize.once(base)
    assert(m.queryExecution.analyzed.toString.contains("LogicalRDD")
      || m.queryExecution.analyzed.toString.contains("ExistingRDD"))
    assert(m.collect().map(_.getLong(1)).sum == 100L)
    // Audit mode: no checkpoint — the aggregation stays visible in the
    // plan (this is what lets PlanAudit flag anything upstream).
    spark.conf.set("spark.graft.materialize", "false")
    try {
      val open = Materialize.once(base)
      assert(open.queryExecution.analyzed.toString.contains("Aggregate"))
      assert(open.collect().map(_.getLong(1)).sum == 100L)
    } finally spark.conf.unset("spark.graft.materialize")
  }

  test("onceSer() stores serialized, honors the audit knob, keeps values") {
    val s = spark
    import s.implicits._
    val base = (1L to 100L).toDF("id").groupBy(col("id") % 10)
      .agg(count(lit(1)).as("c"))
    val m = Materialize.onceSer(base)
    assert(m.queryExecution.analyzed.toString.contains("LogicalRDD")
      || m.queryExecution.analyzed.toString.contains("ExistingRDD"))
    assert(m.collect().map(_.getLong(1)).sum == 100L)
    // Serialized storage level — the measured fix for wide frames where
    // deserialized block storage cost 4x the compute it saved. The
    // checkpoint-marked RDD sits in the lineage of the plan's RDD scan;
    // walk dependencies to find it.
    def levels(r: org.apache.spark.rdd.RDD[_]): Seq[String] =
      r.getStorageLevel.description +:
        r.dependencies.flatMap(d => levels(d.rdd))
    assert(levels(m.queryExecution.toRdd)
      .contains(org.apache.spark.storage.StorageLevel
        .MEMORY_AND_DISK_SER.description))
    spark.conf.set("spark.graft.materialize", "false")
    try {
      val open = Materialize.onceSer(base)
      assert(open.queryExecution.analyzed.toString.contains("Aggregate"))
      assert(open.collect().map(_.getLong(1)).sum == 100L)
    } finally spark.conf.unset("spark.graft.materialize")
  }

  test("spark.graft.checkpointDir switches to a reliable checkpoint") {
    val s = spark
    import s.implicits._
    val base = (1L to 100L).toDF("id").groupBy(col("id") % 10)
      .agg(count(lit(1)).as("c"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val m = Materialize.once(base)
      // Same lazy contract: no checkpoint files exist until a job runs.
      def ckptFiles(): Long = {
        val d = java.nio.file.Paths.get(dir)
        if (!java.nio.file.Files.exists(d)) 0L
        else java.nio.file.Files.walk(d)
          .filter(java.nio.file.Files.isRegularFile(_)).count()
      }
      assert(ckptFiles() == 0L, "checkpoint must stay lazy")
      assert(m.collect().map(_.getLong(1)).sum == 100L)
      // The reliable path wrote recoverable files (what survives an
      // executor loss, unlike localCheckpoint's executor-local blocks).
      assert(ckptFiles() > 0L, "reliable checkpoint wrote no files")
      // A second consumer reads the checkpoint, values unchanged.
      assert(m.agg(sum("c")).head.getLong(0) == 100L)
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }
}
