package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins qe_holt (§2.33bd) against a reference Scala implementation of
  * the Holt recurrence on synthetic events — the distributed fold must
  * reproduce the sequential math bit-for-bit (same init, same order,
  * same fp ops). */
class HoltSpec extends SparkSpec {
  import spark.implicits._

  /** Reference sequential Holt: init (y1, 0), fold y2..yn. The 0.5 /
    * 0.3 / 0.7 literals mirror the engine exactly — (1 − 0.3) ≠ 0.7 in
    * IEEE doubles, so deriving them would break bit-parity. */
  private def holtRef(ys: Seq[Double]): (Double, Double) =
    ys.tail.foldLeft((ys.head, 0.0)) { case ((l, b), y) =>
      val l2 = 0.5 * y + 0.5 * (l + b)
      (l2, 0.3 * (l2 - l) + 0.7 * b)
    }

  test("distributed Holt fold matches the sequential reference exactly") {
    // 30 days; type "a" grows linearly (2t+3 events on day t), type "b"
    // is constant 5. Last 7 days are holdout; 23 train days each.
    val day0 = java.time.LocalDate.of(2024, 1, 1)
    val rows = for {
      t <- 0 until 30
      typ <- Seq("a", "b")
      n = if (typ == "a") 2 * t + 3 else 5
      i <- 0 until n
    } yield (Timestamp.valueOf(day0.plusDays(t).atTime(i % 24, 0)),
      typ, (t * 1000 + i).toLong)
    val dir = java.nio.file.Files.createTempDirectory("holt").toString
    rows.toDF("ts", "event_type", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = EventQueries.qeHolt(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.keySet == Set("a", "b"))

    def expect(counts: Seq[Int]): (Double, Double, Double) = {
      val (l, b) = holtRef(counts.take(23).map(_.toDouble))
      val errs = (1 to 7).map { h =>
        BigDecimal(math.abs(counts(22 + h) - (l + h * b)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      val mae = (errs.sum / 7).toDouble
      val wape = (errs.sum.toDouble / counts.drop(23).sum)
      (l, b, mae)
    }

    val aCounts = (0 until 30).map(t => 2 * t + 3)
    val (la, ba, maeA) = expect(aCounts)
    val ra = out("a")
    assert(ra.getAs[Long]("n_train") == 23L)
    assert(ra.getAs[Long]("n_scored") == 7L)
    assert(ra.getAs[Double]("l_final") ==
      BigDecimal(la).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(ra.getAs[Double]("b_final") ==
      BigDecimal(ba).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(ra.getAs[Double]("mae") - maeA) < 1e-6)

    // Constant series: Holt converges to level 5, trend 0, zero error.
    val rb = out("b")
    assert(rb.getAs[Double]("l_final") == 5.0)
    assert(rb.getAs[Double]("b_final") == 0.0)
    assert(rb.getAs[Double]("mae") == 0.0)
    assert(rb.getAs[Double]("wape") == 0.0)
  }
}
