package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins q_price_index (§2.19s) on a hand-computed two-month,
  * two-part fixture plus the structural invariants. */
class PriceIndexSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed Laspeyres/Paasche/Fisher on a 2x2 fixture") {
    // 1992-01 (base): part 1 price 10 qty 2, part 2 price 20 qty 1.
    // 1992-02:        part 1 price 20 qty 3, part 2 price 10 qty 2.
    // L = (2*20 + 1*10)/(2*10 + 1*20) = 50/40 = 1.25
    // P = (3*20 + 2*10)/(3*10 + 2*20) = 80/70
    // F = sqrt(L*P) = sqrt(10/7)
    val rows = Seq(
      (Timestamp.valueOf("1992-01-15 00:00:00"), 1L, 20.0, 2.0),
      (Timestamp.valueOf("1992-01-20 00:00:00"), 2L, 20.0, 1.0),
      (Timestamp.valueOf("1992-02-10 00:00:00"), 1L, 60.0, 3.0),
      (Timestamp.valueOf("1992-02-11 00:00:00"), 2L, 20.0, 2.0))
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    rows.toDF("l_shipdate", "l_partkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val out = Analytics.qPriceIndex(spark, dir).collect()
      .map(r => r.getAs[String]("month") -> r).toMap
    assert(out.keySet === Set("1992-01", "1992-02"))
    val base = out("1992-01")
    assert(base.getAs[Long]("n_parts") === 2L)
    assert(base.getAs[Double]("laspeyres") === 1.0)
    assert(base.getAs[Double]("paasche") === 1.0)
    assert(base.getAs[Double]("fisher") === 1.0)
    val m2 = out("1992-02")
    assert(m2.getAs[Double]("laspeyres") === 1.25)
    assert(math.abs(m2.getAs[Double]("paasche") - 80.0 / 70.0) < 1e-6)
    assert(math.abs(m2.getAs[Double]("fisher") - math.sqrt(10.0 / 7.0))
      < 1e-6)
  }

  test("structural invariants on real data") {
    val rows = Analytics.qPriceIndex(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // Base month indexes at exactly 1; Fisher lies between L and P.
    val base = rows.head
    assert(base.getAs[Double]("laspeyres") === 1.0)
    assert(base.getAs[Double]("fisher") === 1.0)
    rows.foreach { r =>
      val l = r.getAs[Double]("laspeyres")
      val p = r.getAs[Double]("paasche")
      val f = r.getAs[Double]("fisher")
      assert(f >= math.min(l, p) - 1e-6 && f <= math.max(l, p) + 1e-6,
        s"fisher outside [L,P] at ${r.getAs[String]("month")}")
      assert(r.getAs[Long]("n_parts") > 0)
    }
  }
}
