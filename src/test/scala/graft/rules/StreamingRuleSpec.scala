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

  test("driftReportSink scores each micro-batch's PSI against the static baseline") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Baseline: uniform over bins 0 and 1 (values 5 and 15, width 10).
    val baseline = Seq(
      Reading(1L, "a", 5.0), Reading(2L, "a", 15.0),
      Reading(3L, "a", 5.0), Reading(4L, "a", 15.0)).toDF()
    val reports = scala.collection.mutable.Map.empty[Long, Map[Long, Double]]
    val stream = MemoryStream[Reading]
    val q = graft.streaming.EventStreams.driftReportSink(
      stream.toDF(), baseline, "value", 10.0,
      (id, drift) => reports.synchronized {
        reports(id) = drift.collect()
          .map(r => r.getAs[Long]("bin") -> r.getAs[Double]("psi")).toMap
      }).start()
    try {
      // Batch 0 matches the baseline 50/50 split exactly: PSI = 0.
      stream.addData(Reading(10L, "a", 6.0), Reading(11L, "a", 14.0))
      q.processAllAvailable()
      // Batch 1 is skewed 3:1 toward bin 0: PSI > 0 in both bins.
      stream.addData(
        Reading(12L, "a", 1.0), Reading(13L, "a", 2.0),
        Reading(14L, "a", 3.0), Reading(15L, "a", 19.0))
      q.processAllAvailable()
      val r = reports.synchronized(reports.toMap)
      assert(r(0L) === Map(0L -> 0.0, 1L -> 0.0))
      assert(r(1L).keySet === Set(0L, 1L))
      assert(r(1L).values.forall(_ > 0.0), s"expected drift, got ${r(1L)}")
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
