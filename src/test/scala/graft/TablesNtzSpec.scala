package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.queries.EventQueries

/** Regression guard for the round-7 testdata incident: the driver
  * regenerated events.parquet with TIMESTAMP(MICROS, isAdjustedToUTC=false),
  * which Spark reads as TIMESTAMP_NTZ, and every direct
  * `unix_micros(col("ts"))` consumer crashed with DATATYPE_MISMATCH
  * (11 operators + 6 tests red). [[Tables.loadEvents]] must normalize
  * every physical flavor the driver has shipped — long nanos,
  * NTZ micros, adjusted micros — to session-TZ TIMESTAMP so no
  * downstream operator ever sees the raw physical type.
  *
  * The fixture here is written with Spark's own timestamp_ntz type,
  * which produces exactly the isAdjustedToUTC=false parquet annotation
  * the r7 regeneration shipped (asserted on read-back).
  */
class TablesNtzSpec extends SparkSpec {

  private val dir = "/tmp/graft_ntz_fixture"

  private def writeNtzEvents(): Unit = {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-03-01 00:00:00")
    def plus(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    Seq(
      (1L, t0, 7L, "view", 1.0, """{"k":"a"}"""),
      (2L, plus(10), 7L, "click", 2.0, """{"k":"b"}"""),
      (3L, plus(90), 7L, "view", 3.0, """{"k":"c"}"""),
      (4L, plus(5), 8L, "view", 4.0, """{"k":"d"}"""),
      (5L, plus(50), 8L, "purchase", 5.0, """{"k":"e"}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // The raw file must genuinely read back as NTZ, or this spec guards
    // nothing (a future Spark default could silently adjust the write).
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
  }

  test("Tables.load normalizes NTZ events.ts to TIMESTAMP, values intact") {
    writeNtzEvents()
    val events = Tables.load(spark, dir, "events")
    assert(events.schema("ts").dataType == TimestampType)
    // Session TZ is UTC (SparkSpec pins it): the cast is a pure type
    // relabel, wall-clock values byte-identical to what was written.
    val firstTs = events.orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .as[String](org.apache.spark.sql.Encoders.STRING).head()
    assert(firstTs == "2024-03-01 00:00:00")
  }

  test("every crashed-in-r7 timestamp family runs on an NTZ fixture") {
    writeNtzEvents()
    // One representative per failure mode: direct unix_micros in a
    // window (sessions), unix_micros in an agg (interarrival), the
    // session-composition path (session_stats), and native
    // session_window (streaming-parity shape).
    assert(EventQueries.qeSessions(spark, dir).count() > 0)
    assert(EventQueries.qeInterarrival(spark, dir).count() > 0)
    assert(EventQueries.qeSessionStats(spark, dir).count() > 0)
    assert(EventQueries.qeSessionWindow(spark, dir).count() > 0)
    assert(EventQueries.qeWindows(spark, dir).count() > 0)
  }
}
