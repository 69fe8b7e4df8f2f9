package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins qe_hurst (§2.33bs) against a sequential reference R/S
  * implementation over a deterministic 128-hour synthetic series. */
class HurstSpec extends SparkSpec {
  import spark.implicits._

  /** Per-block R/S ratios for block size n over the hourly counts
    * (full blocks only; zero-variance blocks dropped) — mirrors the
    * query's exact-integer derivation. */
  private def rsRef(counts: Seq[Long], n: Int): Seq[Double] =
    counts.grouped(n).filter(_.size == n).flatMap { blk =>
      val s1 = blk.sum.toDouble
      val s2 = blk.map(c => c * c).sum.toDouble
      val mu = s1 / n
      var ck = 0.0
      var zmin = Double.MaxValue
      var zmax = Double.MinValue
      blk.zipWithIndex.foreach { case (v, i) =>
        ck += v
        val z = ck - (i + 1) * mu
        if (z < zmin) zmin = z
        if (z > zmax) zmax = z
      }
      val varp = s2 / n - mu * mu
      if (varp > 0) Some((zmax - zmin) / math.sqrt(varp)) else None
    }.toSeq

  private def meanRs(rs: Seq[Double]): Double =
    (rs.map(r => BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .sum / rs.size).toDouble

  test("distributed R/S matches the sequential reference") {
    // 128 hours from 2024-01-01T00; hour t has (t*37 % 11) + 1 events.
    val counts = (0 until 128).map(t => ((t * 37) % 11 + 1).toLong)
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    val rows = for {
      (n, t) <- counts.zipWithIndex
      i <- 0L until n
    } yield (Timestamp.valueOf(base.plusHours(t).plusMinutes(i % 60)),
      (t * 100 + i).toLong)
    val dir = java.nio.file.Files.createTempDirectory("hurst").toString
    rows.toDF("ts", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = EventQueries.qeHurst(spark, dir).collect()
      .map(r => r.getAs[Int]("block_size") -> r).toMap
    assert(out.keySet === Set(16, 32, 64))

    val ms = Map(16 -> meanRs(rsRef(counts, 16)),
      32 -> meanRs(rsRef(counts, 32)), 64 -> meanRs(rsRef(counts, 64)))
    out.foreach { case (bs, row) =>
      assert(row.getAs[Long]("n_blocks") === 128L / bs)
      assert(math.abs(row.getAs[Double]("mean_rs") - ms(bs)) < 1e-6,
        s"mean_rs at n=$bs")
    }
    val hurst = (math.log(ms(64)) - math.log(ms(16))) / (2 * math.log(2.0))
    assert(math.abs(out(16).getAs[Double]("hurst") - hurst) < 1e-6)
    // A bounded periodic series is strongly mean-reverting: H well
    // below the 0.5 random-walk line.
    assert(out(16).getAs[Double]("hurst") < 0.5)
  }
}
