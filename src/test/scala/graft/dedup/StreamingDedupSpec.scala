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
}
