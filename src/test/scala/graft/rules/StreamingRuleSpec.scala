package graft.rules

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Reading(id: Long, sensor: String, value: Double)

/** Data-quality rules over a stream: rules are stateless Column
  * predicates, so RuleRunner.invalidRows applies to a streaming
  * DataFrame unchanged — quality filtering runs inline in the stream
  * with no extra operator (SURVEY.md §3, declarative-rules decision).
  */
class StreamingRuleSpec extends SparkSpec {

  test("invalidRows streams: bad rows flow to the sink with reasons") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rules = Seq(
      Rule("value >= 0", "non-negative", 0.0),
      Rule("sensor != 'broken'", "healthy sensor", 0.0))
    val stream = MemoryStream[Reading]
    val q = RuleRunner.invalidRows(stream.toDF(), rules)
      .writeStream.format("memory").queryName("bad_readings")
      .outputMode("append").start()
    try {
      stream.addData(
        Reading(1L, "a", 1.0), Reading(2L, "a", -5.0),
        Reading(3L, "broken", -1.0))
      q.processAllAvailable()
      val out = spark.table("bad_readings").orderBy("id").collect()
      assert(out.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L))
      assert(out(0).getAs[String](RuleRunner.ReasonCol) == "non-negative")
      assert(out(1).getAs[String](RuleRunner.ReasonCol) ==
        s"non-negative${RuleRunner.ReasonJoiner}healthy sensor")
    } finally q.stop()
  }

  test("ruleReportSink writes one quality report per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rules = Seq(Rule("value >= 0", "non-negative", 0.0))
    val dest = java.nio.file.Files.createTempDirectory("graft_stream_qc").toString
    val stream = MemoryStream[Reading]
    val q = graft.streaming.EventStreams.ruleReportSink(
      stream.toDF(), rules, new graft.engine.FsReportWriter(spark, dest))
      .start()
    try {
      stream.addData(Reading(1L, "a", 1.0), Reading(2L, "a", -5.0))
      q.processAllAvailable()
      stream.addData(Reading(3L, "a", -1.0))
      q.processAllAvailable()
      val reports = new java.io.File(dest).listFiles().map(_.getName)
        .filter(_.endsWith(".json")).sorted // skip Hadoop .crc shadows
      assert(reports.length >= 2) // one per non-empty micro-batch
      val first = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dest, reports.head)), "UTF-8")
      assert(first.contains("non-negative"))
      assert(first.contains("\"numInvalid\" : 1"))
      assert(first.contains("sampleInvalidData"))
    } finally q.stop()
  }
}
