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

  private val events = Seq(
    (1L, 10L, "2024-01-01 00:00:00"), // before any price
    (2L, 10L, "2024-01-03 00:00:00"), // exactly at p2
    (3L, 10L, "2024-01-04 12:00:00"), // between p2 and p3, closer to p3
    (4L, 10L, "2024-01-09 00:00:00")) // after all prices
  private val prices = Seq(
    (10L, "2024-01-02 00:00:00", 100.0),
    (10L, "2024-01-03 00:00:00", 200.0),
    (10L, "2024-01-05 00:00:00", 300.0))

  private def run(direction: String, tolUs: Option[Long] = None) = {
    val s = spark
    import s.implicits._
    AsofJoin.asofJoin(
      events.map { case (e, u, t) => (e, u, ts(t)) }.toDF("event_id", "uid", "etime"),
      prices.map { case (p, t, v) => (p, ts(t), v) }.toDF("pid", "ptime", "price"),
      "uid", "pid", "etime", "ptime", Seq("price"), direction, tolUs)
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Double]("price")).map(_.doubleValue())))
      .toSeq
  }

  test("forward direction takes the earliest right row at or after left time") {
    assert(run("forward") == Seq(
      1L -> Some(100.0), // next price ahead
      2L -> Some(200.0), // inclusive at equal time
      3L -> Some(300.0),
      4L -> None)) // nothing ahead
  }

  test("nearest direction picks the closer side, ties to backward") {
    assert(run("nearest") == Seq(
      1L -> Some(100.0), // only forward exists
      2L -> Some(200.0), // exact
      3L -> Some(300.0), // 12h ahead vs 36h behind
      4L -> Some(300.0))) // only backward exists
  }

  test("tolerance nulls matches farther than the bound") {
    val dayUs = 86400000000L
    assert(run("backward", Some(dayUs)) == Seq(
      1L -> None,
      2L -> Some(200.0),
      3L -> None, // backward match is 1.5 days away
      4L -> None)) // 4 days away
    assert(run("nearest", Some(dayUs)) == Seq(
      1L -> Some(100.0),
      2L -> Some(200.0),
      3L -> Some(300.0), // 12h ahead is within tolerance
      4L -> None))
  }
}
