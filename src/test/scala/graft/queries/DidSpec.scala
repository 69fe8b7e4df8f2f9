package graft.queries

import java.sql.Timestamp
import graft.SparkSpec

/** Pins qe_did (§2.33be): exact null calibration (same users in both
  * periods ⇒ composition cancels ⇒ effect is EXACTLY zero) and exact
  * recovery of an injected treatment effect. */
class DidSpec extends SparkSpec {
  import spark.implicits._

  /** Mirror of Portable.md5Bucket("did", id, 2) == 1. */
  private def treated(id: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"did:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % 2 == 1
  }

  /** 40 users × 20 days, one event/user/day, value = (user % 2) plus an
    * optional +1.0 per treated-user post-period event. Midpoint cut =
    * day 9, so post = days 10..19 (10 days each period). */
  private def build(inject: Boolean): String = {
    val day0 = java.time.LocalDate.of(2024, 3, 1)
    val rows = for {
      u <- 0L until 40L
      t <- 0 until 20
    } yield {
      val base = (u % 2).toDouble
      val v = if (inject && treated(u) && t > 9) base + 1.0 else base
      (Timestamp.valueOf(day0.plusDays(t).atTime(12, 0)),
        u, "click", v, (u * 100 + t))
    }
    val dir = java.nio.file.Files.createTempDirectory("did").toString
    rows.toDF("ts", "user_id", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("no intervention measures an effect of exactly zero") {
    val r = EventQueries.qeDid(spark, build(inject = false)).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("did_effect") == 0.0)
    assert(!r.head.getAs[Boolean]("significant"))
  }

  test("an injected +1/event post-period treatment effect is recovered exactly") {
    val r = EventQueries.qeDid(spark, build(inject = true)).collect().head
    // +1.0 on each of the 10 post days ⇒ per-user-period sum +10.
    assert(r.getAs[Double]("did_effect") == 10.0)
    assert(r.getAs[Boolean]("significant"))
    // Control means are untouched by the injection.
    assert(r.getAs[Double]("mean_ctrl_pre") == r.getAs[Double]("mean_ctrl_post"))
  }
}
