package graft.operators

import java.sql.{Date, Timestamp}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  test("binned range join matches hand-checked boundaries") {
    val s = spark
    import s.implicits._
    val intervals = Seq((100L, 1L, d("2024-01-10")))
      .toDF("order_id", "key", "start")
    val points = Seq(
      (1L, ts("2024-01-09 23:59:59"), "before"),
      (1L, ts("2024-01-10 00:00:00"), "start-inclusive"),
      (1L, ts("2024-01-16 23:59:59"), "last-covered-second"),
      (1L, ts("2024-01-17 00:00:00"), "end-exclusive"),
      (2L, ts("2024-01-12 00:00:00"), "wrong-key"))
      .toDF("key", "pts", "tag")

    val got = RangeJoin.pointsInInterval(points, intervals,
      "key", "key", "pts", "start", 7)
      .select("tag").as[String].collect().sorted
    assert(got.toSeq == Seq("last-covered-second", "start-inclusive"))
  }

  test("binned join is row-identical to the naive theta join on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val base = d("2024-01-01").toLocalDate
    val intervals = (1 to 60).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, Date.valueOf(base.plusDays(rnd.nextInt(30))))
    }.toDF("order_id", "key", "start")
    val points = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        new Timestamp(Date.valueOf(base.plusDays(rnd.nextInt(40))).getTime +
          rnd.nextInt(86400) * 1000L))
    }.toDF("point_id", "key", "pts")

    val binned = RangeJoin.pointsInInterval(
      points.toDF("point_id", "pkey", "pts"), intervals,
      "pkey", "key", "pts", "start", 7)
      .select("order_id", "point_id")
    val naive = intervals.join(points,
      intervals("key") === points("key") &&
        points("pts") >= intervals("start").cast("timestamp") &&
        points("pts") < date_add(intervals("start"), 7).cast("timestamp"))
      .select("order_id", "point_id")
    assert(binned.count() > 0) // the cross-check must actually exercise matches
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }
}
