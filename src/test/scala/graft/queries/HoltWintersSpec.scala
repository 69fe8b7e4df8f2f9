package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins qe_holt_winters (§2.33bh): exact-zero error on a purely
  * weekly-periodic series (the case trend-only Holt cannot fit) and
  * bit-parity of the distributed fold against a sequential reference
  * on an arbitrary series. */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private def write(counts: Seq[Int]): String = {
    val day0 = java.time.LocalDate.of(2024, 2, 5) // a Monday
    val rows = for {
      (n, t) <- counts.zipWithIndex
      i <- 0 until n
    } yield (Timestamp.valueOf(day0.plusDays(t).atTime(i % 24, 0)),
      (i % 7).toLong, "click", 1.0, (t * 1000 + i).toLong)
    val dir = java.nio.file.Files.createTempDirectory("hw").toString
    rows.toDF("ts", "user_id", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Sequential reference of the engine's recurrence. */
  private def ref(ys: Seq[Double]): (Double, Double, Seq[Double]) = {
    var l = ys.take(7).sum / 7.0
    var b = (ys.slice(7, 14).sum / 7.0 - ys.take(7).sum / 7.0) / 7.0
    val s = ys.take(7).map(_ - l).toArray
    var t = 7
    ys.drop(7).foreach { y =>
      t += 1
      val idx = (t - 1) % 7
      val l2 = 0.5 * (y - s(idx)) + 0.5 * (l + b)
      val b2 = 0.3 * (l2 - l) + 0.7 * b
      s(idx) = 0.3 * (y - l2) + 0.7 * s(idx)
      l = l2; b = b2
    }
    (l, b, s.toSeq)
  }

  test("a purely weekly-periodic series backtests with MAE exactly 0") {
    // 28 days of a fixed weekly shape: 21 train days (3 whole weeks),
    // 7 holdout. Seasonal init absorbs the shape; level/trend stay put.
    val pattern = Seq(20, 35, 30, 25, 40, 55, 15)
    val counts = Seq.fill(4)(pattern).flatten
    val r = EventQueries.qeHoltWinters(spark, write(counts)).collect().head
    assert(r.getAs[Long]("n_train") == 21L)
    assert(r.getAs[Double]("mae") == 0.0)
    assert(r.getAs[Double]("wape") == 0.0)
    assert(r.getAs[Double]("b_final") == 0.0)
  }

  test("the distributed fold matches the sequential reference bit-for-bit") {
    // An arbitrary non-periodic series (trend + varying residuals).
    val counts = (0 until 30).map(t => 10 + t + (t * t % 13))
    val r = EventQueries.qeHoltWinters(spark, write(counts)).collect().head
    val (l, b, _) = ref(counts.take(23).map(_.toDouble))
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("l_final") == r6(l))
    assert(r.getAs[Double]("b_final") == r6(b))
  }
}
