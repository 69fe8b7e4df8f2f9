package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins qe_cuped (§2.33bf): a perfect covariate removes composition
  * noise EXACTLY (θ = 1, ρ² = 1, adjusted diff 0), and with a real
  * injected effect the adjusted estimate is at least as close to the
  * truth as the raw one. */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  /** 60 users × 20 days, one event/user/day; pre value = (u % 5),
    * post value = (u % 5) + inject·1_{armA}. Midpoint cut = day 9. */
  private def build(inject: Double): String = {
    def armA(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"exp1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0
    }
    val day0 = java.time.LocalDate.of(2024, 5, 1)
    val rows = for {
      u <- 0L until 60L
      t <- 0 until 20
    } yield {
      val base = (u % 5).toDouble
      val v = if (t > 9 && armA(u)) base + inject else base
      (Timestamp.valueOf(day0.plusDays(t).atTime(12, 0)),
        u, "click", v, u * 100 + t)
    }
    val dir = java.nio.file.Files.createTempDirectory("cuped").toString
    rows.toDF("ts", "user_id", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("a perfect covariate gives theta = 1, rho2 = 1, adjusted diff exactly 0") {
    // No injection: each user's post spend equals their pre spend, so
    // pre-period spend is a PERFECT covariate and any raw arm
    // difference is pure composition noise CUPED must cancel.
    val r = EventQueries.qeCuped(spark, build(0.0)).collect().head
    assert(r.getAs[Double]("theta") == 1.0)
    assert(r.getAs[Double]("rho2") == 1.0)
    assert(r.getAs[Double]("diff_cuped") == 0.0)
  }

  test("with an injected effect the adjusted estimate is no farther from truth") {
    // +1/event on the 10 post days for arm A ⇒ true effect = 10.
    val r = EventQueries.qeCuped(spark, build(1.0)).collect().head
    // The injection itself adds arm-dependent variance the covariate
    // can't explain, so rho2 dips below the no-effect case's 1.0.
    assert(r.getAs[Double]("rho2") > 0.8)
    val rawErr = math.abs(r.getAs[Double]("diff_raw") - 10.0)
    val cupedErr = math.abs(r.getAs[Double]("diff_cuped") - 10.0)
    assert(cupedErr <= rawErr + 1e-9)
    assert(math.abs(r.getAs[Double]("z_cuped")) > 1.96)
  }
}
