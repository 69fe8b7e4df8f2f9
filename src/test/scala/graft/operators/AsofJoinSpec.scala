package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join takes the latest right row at or before left time") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any price → null
      (2L, 10L, ts("2024-01-03 00:00:00")), // exactly at p2 → inclusive
      (3L, 10L, ts("2024-01-04 12:00:00")), // after p2 → p2
      (4L, 99L, ts("2024-01-05 00:00:00"))) // key with no right rows
      .toDF("event_id", "uid", "etime")
    val prices = Seq(
      (10L, ts("2024-01-02 00:00:00"), 100.0),
      (10L, ts("2024-01-03 00:00:00"), 200.0))
      .toDF("pid", "ptime", "price")

    val out = AsofJoin.asofJoin(events, prices,
      "uid", "pid", "etime", "ptime", Seq("price"))
      .orderBy("event_id").collect()
    val got = out.map(r =>
      (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Double]("price")).map(_.doubleValue())))
    assert(got.toSeq == Seq(
      1L -> None, 2L -> Some(200.0), 3L -> Some(200.0), 4L -> None))
    // Left schema passes through untouched.
    assert(out(0).schema.fieldNames.toSeq == Seq("event_id", "uid", "etime", "price"))
  }
}
