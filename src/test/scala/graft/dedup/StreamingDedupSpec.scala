package graft.dedup

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming exact dedup: content-hash dropDuplicates with a watermark
  * bounds the dedup state to the watermark horizon — the streaming
  * counterpart of Dedup.exactGroups for ingest pipelines.
  */
class StreamingDedupSpec extends SparkSpec {

  test("dropDuplicates on content hash emits first-seen docs only") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val stream = MemoryStream[Doc]
    val deduped = stream.toDF()
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("content_hash")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Doc(1L, t(0), "alpha"), Doc(2L, t(1), "beta"))
      q.processAllAvailable()
      stream.addData(Doc(3L, t(2), "alpha"), Doc(4L, t(3), "gamma")) // 3 is a dup
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state to the horizon") {
    // The state-TTL variant: duplicates are only suppressed within the
    // watermark window, and old keys are EVICTED — the form that runs
    // forever on an unbounded feed, where plain dropDuplicates grows
    // state monotonically. A doc re-ingested long after the horizon is
    // intentionally re-emitted (state for its hash is gone).
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val stream = MemoryStream[Doc]
    val deduped = stream.toDF()
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark(Seq("content_hash"))
    val q = deduped.writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    try {
      stream.addData(Doc(1L, t(0), "alpha"), Doc(2L, t(1), "alpha"))
      q.processAllAvailable()
      // advance watermark far past t(1)+10s, evicting alpha's state
      stream.addData(Doc(3L, t(100), "beta"))
      q.processAllAvailable()
      // same content, re-ingested after eviction → re-emitted
      stream.addData(Doc(4L, t(101), "alpha"))
      q.processAllAvailable()
      val ids = spark.table("dedup_ttl_out").collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(ids == Seq(1L, 3L, 4L))
    } finally q.stop()
  }

  test("streaming band probe flags exactly the batch incremental near-dups") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different sentence about spark execution engines"),
      (3L, "rows columns partitions shuffles and the joy of aggregation")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      Doc(10L, t(0), "the quick brown fox jumps over the lazy dog again and again"),
      Doc(11L, t(1), "nothing like anything in the corpus whatsoever truly novel"),
      Doc(12L, t(2), "rows columns partitions shuffles and the joy of aggregation"))

    val index = Dedup.bandIndex(corpus, "text", "doc_id", 16, 8)
    // Batch truth via the SAME index + the batch probe path.
    val expected = Dedup.bandedRows(incoming.toDF(), "text", "doc_id", 16, 8)
      .join(index, Seq("band_idx", "band_val"))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val stream = MemoryStream[Doc]
    val flagged = Dedup.streamingNearDupCollisions(
      stream.toDF(), index, "text", "doc_id", 16, 8)
    val q = flagged.writeStream.format("memory").queryName("band_probe")
      .outputMode("append").start()
    try {
      stream.addData(incoming: _*)
      q.processAllAvailable()
      val got = spark.table("band_probe").collect()
        .groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length.toLong).toMap
      assert(got == expected)
      assert(got.keySet == Set(10L, 12L)) // 11 is genuinely novel
    } finally q.stop()
  }
}
