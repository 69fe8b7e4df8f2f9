package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.rules.Fingerprint

/** Streaming-batch parity for the running fingerprint: after every
  * micro-batch the streaming checksum equals the batch
  * [[Fingerprint.of]] over the rows ingested so far. */
class StreamingFingerprintSpec extends SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("running fingerprint equals the batch fingerprint after every batch") {
    val s = spark
    import s.implicits._
    val batch1 = (1L to 50L).map(i => (i, s"doc_$i"))
    val batch2 = (51L to 80L).map(i => (i, s"doc_$i"))
    val stream = MemoryStream[(Long, String)]
    val out = EventStreams.runningFingerprint(
      stream.toDF().toDF("id", "name"), Seq("id", "name"))
    val query = out.writeStream.format("memory").queryName("fp_run")
      .outputMode("complete").start()
    try {
      def current(): (Long, String) = {
        val r = spark.table("fp_run").collect().head
        (r.getAs[Long]("n_rows"), r.getAs[String]("checksum"))
      }
      def expected(rows: Seq[(Long, String)]): (Long, String) = {
        val r = Fingerprint.of(rows.toDF("id", "name"), Seq("id", "name"))
          .collect().head
        (r.getAs[Long]("n_rows"), r.getAs[String]("checksum"))
      }
      stream.addData(batch1: _*)
      query.processAllAvailable()
      assert(current() === expected(batch1))
      stream.addData(batch2: _*)
      query.processAllAvailable()
      assert(current() === expected(batch1 ++ batch2))
    } finally query.stop()
  }
}
