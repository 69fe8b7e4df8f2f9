package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins qe_mwu (§2.33bt) against a sequential reference Mann-Whitney
  * implementation. The synthetic values cover cents 0..1023 exactly, so
  * the query's 1024-bin grid is the IDENTITY mapping and the binned
  * statistic must equal the exact midrank U on the raw values. */
class MwuSpec extends SparkSpec {
  import spark.implicits._

  /** Exact midrank Mann-Whitney over two cent-valued samples:
    * (U_a, AUC_a, z with tie-corrected variance). */
  private def mwuRef(a: Seq[Long], b: Seq[Long]): (Double, Double, Double) = {
    val grouped = (a.map((_, true)) ++ b.map((_, false)))
      .groupBy(_._1).toSeq.sortBy(_._1)
    var uA = 0.0
    var cumB = 0.0
    var t3 = 0.0
    grouped.foreach { case (_, grp) =>
      val na = grp.count(_._2)
      val nb = grp.size - na
      uA += na * (cumB + nb / 2.0)
      cumB += nb
      val t = grp.size.toDouble
      t3 += t * t * t - t
    }
    val nA = a.size.toDouble
    val nB = b.size.toDouble
    val n = nA + nB
    val v = nA * nB / 12.0 * ((n + 1.0) - t3 / (n * (n - 1.0)))
    val z = (uA - nA * nB / 2.0) / math.sqrt(v)
    (uA, uA / (nA * nB), z)
  }

  test("binned U equals exact midrank U when the bin grid is identity") {
    // Weekday (Mon 2024-01-08) vs weekend (Sat 2024-01-06) samples.
    // Cents 0 and 1023 are both present, so cmin=0, cmax=1023 and
    // bin = cents — the grid is injective and binned == exact.
    val wd = (0 until 60).map(i => (i.toLong * 7) % 1024) :+ 0L
    val we = (0 until 40).map(i => (i.toLong * 13 + 37) % 1024) :+ 1023L
    val rows =
      wd.zipWithIndex.map { case (c, i) =>
        (Timestamp.valueOf("2024-01-08 12:00:00"), "t", c / 100.0,
          i.toLong)
      } ++
        we.zipWithIndex.map { case (c, i) =>
          (Timestamp.valueOf("2024-01-06 12:00:00"), "t", c / 100.0,
            1000L + i)
        }
    val dir = java.nio.file.Files.createTempDirectory("mwu").toString
    rows.toDF("ts", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val row = EventQueries.qeMwu(spark, dir).collect().head
    val (uA, auc, z) = mwuRef(wd, we)
    assert(row.getAs[Long]("n_a") === wd.size)
    assert(row.getAs[Long]("n_b") === we.size)
    assert(math.abs(row.getAs[Double]("u_weekday") - uA) < 1e-6)
    assert(math.abs(row.getAs[Double]("auc_weekday") - auc) < 1e-6)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-6)
  }

  test("shifted distribution yields AUC > 0.5 and positive z") {
    // Weekday values strictly above weekend values: AUC must be 1.
    val rows =
      (0 until 30).map(i => (Timestamp.valueOf("2024-01-08 09:00:00"),
        "t", 9.0 + i / 100.0, i.toLong)) ++
        (0 until 30).map(i => (Timestamp.valueOf("2024-01-07 09:00:00"),
          "t", 1.0 + i / 100.0, 500L + i))
    val dir = java.nio.file.Files.createTempDirectory("mwu2").toString
    rows.toDF("ts", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = EventQueries.qeMwu(spark, dir).collect().head
    assert(row.getAs[Double]("auc_weekday") === 1.0)
    assert(row.getAs[Double]("z") > 6.0)
  }
}
