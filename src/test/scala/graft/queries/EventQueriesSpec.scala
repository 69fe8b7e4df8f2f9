package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge-semantics checks for the batch event operators (the DuckDB
  * oracle proves parity on real data; this pins the gap boundary). */
class EventQueriesSpec extends SparkSpec {

  test("sessionization: exactly-30-minute gap continues the session") {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      (1L, t0, 7L, "view", 0.0, ""),
      (2L, plus(30), 7L, "view", 0.0, ""),   // gap == 30min → same session
      (3L, plus(61), 7L, "view", 0.0, ""))   // gap == 31min → new session
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet("/tmp/graft_events_edge")
    // qeSessions reads from a directory; route through a temp dir table.
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val lagTs = lag(col("ts"), 1).over(byUser)
    val newSession = when(lagTs.isNull ||
      unix_micros(col("ts")) - unix_micros(lagTs) > 1800000000L, 1).otherwise(0)
    val out = events
      .withColumn("session_id", sum(newSession).over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id").count().collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("count")).sorted.toSeq == Seq(1L, 2L))
  }

  test("gap sessionizer agrees with Spark's native session_window") {
    // Same 30-minute gap, real data: the window-function composition and
    // the built-in session_window operator must produce identical
    // (user, start, end, n) session sets. (session_window can't number
    // sessions cumulatively, which is why the composition exists.)
    val sessions = EventQueries.qeSessions(spark, "/root/testdata/sf0.001")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    val native = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"),
        max("ts").as("session_end"))
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    assert(sessions == native)
    assert(sessions.nonEmpty)
  }

  test("Kaplan-Meier curve matches a driver-side product-limit replay") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    // Per user: hours from first event to first purchase, 48 h horizon.
    val perUser = byUser.values.map { evs =>
      val f = evs.map(_.getAs[Long]("us")).min
      val p = evs.filter(_.getAs[String]("event_type") == "purchase")
        .map(_.getAs[Long]("us"))
      val t = if (p.isEmpty) None else Some((p.min - f) / 3600000000L)
      t match {
        case Some(h) if h < 48 => (h, true)
        case _                 => (48L, false)
      }
    }.toSeq
    val lifetable = perUser.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, g) => (t, g.size.toLong, g.count(_._2).toLong)
    }
    var atRisk = perUser.size.toLong
    var surv = 1.0
    val expected = lifetable.map { case (t, n, deaths) =>
      surv *= (atRisk - deaths).toDouble / atRisk
      val row = (t, atRisk, deaths, n - deaths, surv)
      atRisk -= n
      row
    }
    val got = EventQueries.qeSurvival(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4) == ((e._1, e._2, e._3, e._4)), s"$g vs $e")
      assert(math.abs(g._5 - e._5) < 1e-6, s"survival $g vs $e")
    }
    // The curve is a survival function: monotone non-increasing from < 1.
    assert(got.head._5 <= 1.0)
    got.sliding(2).foreach { case Array(a, b) => assert(b._5 <= a._5 + 1e-12) }
  }

  test("streaming session numbering continues across event-time timeouts") {
    import graft.streaming.EventStreams
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.SessionEvent]
    val q = EventStreams.sessionize(stream.toDS(), watermarkDelay = "1 minute")
      .toDF()
      .writeStream.format("memory").queryName("resume_sess")
      .outputMode("append").start()
    try {
      // Trigger 1: one event for user 7.
      stream.addData(Seq(EventStreams.SessionEvent(1L, t0, 7L)))
      q.processAllAvailable()
      // Advance the watermark far enough to time out user 7's session
      // (session end + 30min gap + 1min delay), via another user.
      stream.addData(Seq(EventStreams.SessionEvent(8L, plus(200), 99L)))
      q.processAllAvailable()
      stream.addData(Seq(EventStreams.SessionEvent(9L, plus(201), 99L)))
      q.processAllAvailable()
      // User 7 returns AFTER the timeout: must get session_id 2, not 1.
      stream.addData(Seq(EventStreams.SessionEvent(2L, plus(300), 7L)))
      q.processAllAvailable()
      stream.addData(Seq(EventStreams.SessionEvent(10L, plus(600), 99L)))
      q.processAllAvailable()
      stream.addData(Seq(EventStreams.SessionEvent(11L, plus(601), 99L)))
      q.processAllAvailable()
      val user7 = spark.table("resume_sess")
        .where(col("user_id") === 7L).orderBy("session_id").collect()
      assert(user7.map(_.getAs[Long]("session_id")).toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming sessionizer agrees on the exact-gap boundary") {
    import graft.streaming.EventStreams
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.SessionEvent]
    val q = EventStreams.sessionize(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("edge_sess")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        EventStreams.SessionEvent(1L, t0, 7L),
        EventStreams.SessionEvent(2L, plus(30), 7L),
        EventStreams.SessionEvent(3L, plus(61), 7L)))
      q.processAllAvailable()
      stream.addData(Seq(EventStreams.SessionEvent(9L, plus(600000), 99L)))
      q.processAllAvailable()
      stream.addData(Seq(EventStreams.SessionEvent(10L, plus(600001), 99L)))
      q.processAllAvailable()
      val out = spark.table("edge_sess").where(col("user_id") === 7L).collect()
      assert(out.length == 2)
      assert(out.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("chunk-and-stitch sessionization is bit-identical to the windowed form") {
    // The hot-key-safe variant must reproduce qeSessions EXACTLY —
    // same session ids, counts and bounds — on real data (the DuckDB
    // oracle re-proves it at sf0.01) and on a fixture built to cross
    // chunk boundaries every way that matters: a session spanning the
    // day boundary within the gap (must stitch), a >gap pause exactly
    // at the boundary (must NOT stitch), multi-day continuous activity
    // (stitch chain across 3+ chunks), and an empty day between events
    // (stitch must compare true timestamps, not chunk adjacency).
    val dir = "/root/testdata/sf0.001"
    val a = EventQueries.qeSessions(spark, dir).collect().map(_.toSeq).toSeq
    val b = EventQueries.qeSessionsStitched(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a === b)

    val s = spark
    import s.implicits._
    val base = Timestamp.valueOf("2024-03-01 23:45:00") // 15 min to midnight
    def at(min: Long) = new Timestamp(base.getTime + min * 60000L)
    val fixture = Seq(
      // user 1: session crosses midnight inside the gap → one session
      (1L, at(0), 1L), (2L, at(20), 1L),
      // then a 31-min pause right after the boundary → new session
      (3L, at(51), 1L),
      // user 2: continuous activity every 20 min for ~3 days → ONE
      // session whose stitch chain crosses many chunk boundaries
      // (72h * 3/h = 216 events)
      // user 3: events two days apart (empty chunk between) → two sessions
      (500L, at(0), 3L), (501L, at(2 * 1440L), 3L)
    ) ++ (0 until 216).map(i => (100L + i, at(i * 20L), 2L))
    val df = fixture.toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(0.0)).withColumn("props", lit(""))
    val tmp = java.nio.file.Files
      .createTempDirectory("stitch_fixture").toString
    df.repartition(4).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fa = EventQueries.qeSessions(spark, tmp).collect().map(_.toSeq).toSeq
    val fb = EventQueries.qeSessionsStitched(spark, tmp)
      .collect().map(_.toSeq).toSeq
    assert(fa === fb)
    // and the shapes the fixture promises actually occurred
    val u1 = fa.filter(_.head == 1L)
    assert(u1.length == 2 && u1.head(2) == 2L) // midnight-crossing pair stitched
    assert(fa.count(_.head == 2L) == 1)        // 3-day chain = one session
    assert(fa.count(_.head == 3L) == 2)        // empty chunk ≠ adjacency
  }
}
