package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[EventStreams.mergeSink]] — the foreachBatch exactly-once CDC
  * upsert: bootstrap, upsert, tombstone, and the idempotent-replay
  * property the exactly-once claim rests on.
  */
class MergeSinkSpec extends SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  case class Cdc(id: Long, ver: Long, part: String, payload: String,
    deleted: Boolean)

  private def table(path: String): Set[(Long, Long, String, String)] = {
    val s = spark
    import s.implicits._
    spark.read.parquet(path)
      .select(col("id"), col("ver"), col("payload"), col("part"))
      .as[(Long, Long, String, String)].collect().toSet
  }

  test("bootstrap takes over a pre-created EMPTY target directory") {
    val s = spark
    import s.implicits._
    // The path exists but holds no readable parquet (pre-created dir,
    // or a first write that died after mkdir): the sink must take the
    // bootstrap branch, not fail schema inference forever.
    val dir = Files.createTempDirectory("graft_merge_sink_empty").toFile
    val target = dir.getAbsolutePath
    val stream = MemoryStream[Cdc]
    val query = EventStreams.mergeSink(stream.toDF(), target,
      keys = Seq("id"), orderCol = "ver", partCol = "part",
      deleteCol = Some("deleted")).start()
    try {
      stream.addData(Cdc(1, 1, "p1", "x", deleted = false))
      query.processAllAvailable()
      assert(table(target) == Set((1L, 1L, "x", "p1")))
    } finally query.stop()
  }

  test("bootstrap, upsert, tombstone, and replayed-batch idempotence") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_merge_sink").toFile
    dir.delete() // sink must bootstrap a missing path
    val target = dir.getAbsolutePath

    val stream = MemoryStream[Cdc]
    val query = EventStreams.mergeSink(stream.toDF(), target,
      keys = Seq("id"), orderCol = "ver", partCol = "part",
      deleteCol = Some("deleted")).start()
    try {
      // Batch 1: three inserts across two partitions, plus an in-batch
      // older version of id=2 that must lose the election.
      stream.addData(
        Cdc(1, 10, "p1", "a0", deleted = false),
        Cdc(2, 10, "p1", "b0", deleted = false),
        Cdc(2, 9, "p1", "b-stale", deleted = false),
        Cdc(3, 10, "p2", "c0", deleted = false))
      query.processAllAvailable()
      assert(table(target) == Set(
        (1L, 10L, "a0", "p1"), (2L, 10L, "b0", "p1"), (3L, 10L, "c0", "p2")))

      // Batch 2: newer version of id=2, tombstone for id=3, insert id=4.
      val batch2 = Seq(
        Cdc(2, 11, "p1", "b1", deleted = false),
        Cdc(3, 11, "p2", "", deleted = true),
        Cdc(4, 11, "p2", "d0", deleted = false))
      stream.addData(batch2: _*)
      query.processAllAvailable()
      val afterBatch2 = table(target)
      assert(afterBatch2 == Set(
        (1L, 10L, "a0", "p1"), (2L, 11L, "b1", "p1"), (4L, 11L, "d0", "p2")))

      // Replay batch 2 verbatim — the at-least-once redelivery case.
      // Latest-wins with batch-over-stored tie-break re-elects the
      // identical rows: the table must not change.
      stream.addData(batch2: _*)
      query.processAllAvailable()
      assert(table(target) == afterBatch2)

      // A STALE redelivery (older ver than stored) must also be a
      // no-op — the stored newer row wins the election.
      stream.addData(Cdc(2, 10, "p1", "b0", deleted = false))
      query.processAllAvailable()
      assert(table(target) == afterBatch2)
    } finally query.stop()
  }
}
