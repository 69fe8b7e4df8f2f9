package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Batch-parity proofs for the streaming joins (SURVEY.md §2 item 34):
  * stream-static dimension enrichment and the watermarked stream-stream
  * interval join, both fed the sf0.001 events through MemoryStreams and
  * compared row-for-row against the equivalent batch join.
  */
class StreamJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def loadEvents: Seq[Ev] = {
    val s = spark
    import s.implicits._
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Ev].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
  }

  private def sentinel(maxTs: Long, id: Long): Ev =
    Ev(id, new Timestamp(maxTs + 365L * 86400 * 1000), -1L, "__sentinel__", 0.0)

  test("stream-static enrich matches the batch broadcast join") {
    val s = spark
    import s.implicits._
    val events = loadEvents
    val dim = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))

    val stream = MemoryStream[Ev]
    val query = EventStreams.enrich(stream.toDF(), dim,
      "user_id", "c_custkey", Seq("c_name", "c_nationkey"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      stream.addData(events)
      query.processAllAvailable()
      val got = spark.table("enrich_out")
        .where(col("event_type") =!= "__sentinel__")
        .select("event_id", "c_name", "c_nationkey")
        .collect().map(_.toSeq).toSet
      val want = Tables.load(spark, dir, "events")
        .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
        .select("event_id", "c_name", "c_nationkey")
        .collect().map(_.toSeq).toSet
      assert(got == want)
      assert(want.nonEmpty)
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch theta join") {
    val s = spark
    import s.implicits._
    val events = loadEvents
    val maxTs = events.map(_.ts.getTime).max

    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventStreams.intervalJoin(
      purchases.toDF().where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
          col("user_id").as("p_user")),
      clicks.toDF().where(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
          col("user_id").as("c_user")),
      "p_user", "c_user", "p_ts", "c_ts", "1 HOUR")
    val query = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      purchases.addData(events)
      clicks.addData(events)
      query.processAllAvailable()
      // Two sentinel rounds push the watermark past every buffered row.
      // The sentinels must carry event types that PASS the pre-join
      // filters — a filtered-out row never reaches the EventTimeWatermark
      // operator and advances nothing. Their user_id -1 rows join only
      // each other; excluded from the comparison below by id < 0.
      for (i <- 1 to 2) {
        purchases.addData(sentinel(maxTs, -i).copy(event_type = "purchase"))
        clicks.addData(sentinel(maxTs, -i).copy(event_type = "click"))
        query.processAllAvailable()
      }
      val got = spark.table("ssj_out").select("p_id", "c_id")
        .where(col("p_id") >= 0 && col("c_id") >= 0)
        .collect().map(_.toSeq).toSet
      val ev = Tables.load(spark, dir, "events")
      val want = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
          col("user_id").as("p_user"))
        .join(ev.where(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
            col("user_id").as("c_user")),
          expr("p_user = c_user AND c_ts >= p_ts " +
            "AND c_ts <= p_ts + INTERVAL 1 HOUR"))
        .select("p_id", "c_id")
        .collect().map(_.toSeq).toSet
      assert(got == want)
      assert(want.nonEmpty)
    } finally query.stop()
  }
}
