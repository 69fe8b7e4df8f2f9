package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins qe_ewma_chart (§2.33bi): stable volume stays in control, an
  * injected level shift signals, and the fold matches a sequential
  * reference exactly. */
class EwmaChartSpec extends SparkSpec {
  import spark.implicits._

  private def write(counts: Seq[Int]): String = {
    val day0 = java.time.LocalDate.of(2024, 4, 1)
    val rows = for {
      (n, t) <- counts.zipWithIndex
      i <- 0 until n
    } yield (Timestamp.valueOf(day0.plusDays(t).atTime(i % 24, 0)),
      i.toLong, "click", 1.0, (t * 1000 + i).toLong)
    val dir = java.nio.file.Files.createTempDirectory("ewma").toString
    rows.toDF("ts", "user_id", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ref(ys: Seq[Double]): (Double, Long, Long) = {
    val n = ys.size
    val mu = ys.sum / n
    val sigma = math.sqrt(
      (n * ys.map(y => y * y).sum - ys.sum * ys.sum) / (n.toDouble * (n - 1)))
    var e = mu; var viol = 0L; var first = 0L; var t = 0L
    ys.foreach { y =>
      t += 1
      e = 0.2 * y + 0.8 * e
      if (math.abs(e - mu) > sigma) {
        viol += 1
        if (first == 0) first = t
      }
    }
    (e, viol, first)
  }

  test("a mid-series level shift signals; the fold matches the reference") {
    // 20 days at ~30/day (alternating 29/31), then 10 days at 60/day:
    // the EWMA must cross the +sigma limit during the shifted block.
    val counts = (0 until 20).map(t => if (t % 2 == 0) 29 else 31) ++
      Seq.fill(10)(60)
    val r = EventQueries.qeEwmaChart(spark, write(counts)).collect().head
    val (e, viol, first) = ref(counts.map(_.toDouble))
    assert(r.getAs[Long]("n_signals") == viol && viol > 0)
    assert(r.getAs[Long]("first_signal_day") == first && first > 20)
    assert(r.getAs[Double]("ewma_final") ==
      BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("stable volume never signals") {
    val counts = (0 until 30).map(t => if (t % 2 == 0) 40 else 42)
    val r = EventQueries.qeEwmaChart(spark, write(counts)).collect().head
    assert(r.getAs[Long]("n_signals") == 0L)
    assert(r.getAs[Long]("first_signal_day") == 0L)
  }
}
