package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins qe_mde (§2.33bg) against a reference computation on synthetic
  * events with a known arm assignment. */
class MdeSpec extends SparkSpec {
  import spark.implicits._

  private def armA(id: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"exp1:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0
  }

  test("MDE matches the 2.8-sigma reference and shrinks with more users") {
    val day0 = java.time.LocalDate.of(2024, 7, 1)
    def build(nUsers: Long): String = {
      // One event per user; value = user % 7 (known variance).
      val rows = (0L until nUsers).map { u =>
        (Timestamp.valueOf(day0.atTime(8, 0)), u, "click",
          (u % 7).toDouble, u)
      }
      val dir = java.nio.file.Files.createTempDirectory("mde").toString
      rows.toDF("ts", "user_id", "event_type", "value", "event_id")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def ref(nUsers: Long): Double = {
      val (a, b) = (0L until nUsers).map(u => ((u % 7) * 10000.0, armA(u)))
        .partition(_._2)
      def moments(xs: Seq[Double]) = {
        val n = xs.size.toDouble
        val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
        ((s2 - s1 * s1 / n) / (n - 1), n)
      }
      val (va, na) = moments(a.map(_._1)); val (vb, nb) = moments(b.map(_._1))
      val mde = 2.8 * math.sqrt(va / na + vb / nb) / 10000.0
      BigDecimal(mde).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val small = EventQueries.qeMde(spark, build(50)).collect().head
    assert(math.abs(small.getAs[Double]("mde_abs") - ref(50)) < 2e-6)
    val large = EventQueries.qeMde(spark, build(500)).collect().head
    assert(math.abs(large.getAs[Double]("mde_abs") - ref(500)) < 2e-6)
    // Power planning's whole point: 10x users ⇒ roughly √10 smaller MDE.
    assert(large.getAs[Double]("mde_abs") < small.getAs[Double]("mde_abs") / 2)
  }
}
