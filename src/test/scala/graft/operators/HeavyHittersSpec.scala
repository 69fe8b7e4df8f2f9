package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** [[HeavyHitters]] — the Misra–Gries guarantees, exercised through the
  * DataFrame UDAF across many partitions so map-side partials really
  * merge. */
class HeavyHittersSpec extends SparkSpec {

  private def sketch(values: Seq[String], capacity: Int,
      parts: Int): Map[String, Long] = {
    val s = spark
    import s.implicits._
    values.toDF("v").repartition(parts)
      .agg(HeavyHitters.topValues(capacity)(col("v")).as("tv"))
      .select(explode(col("tv")).as("s"))
      .select(col("s._1"), col("s._2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("capacity >= cardinality gives exact counts under any partitioning") {
    val rnd = new Random(11)
    val values = Seq.fill(500)(s"v${rnd.nextInt(12)}")
    val exact = values.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    assert(sketch(values, 16, 1) == exact)
    assert(sketch(values, 16, 13) == exact)
  }

  test("sketch aggregates on a stream across batches, matching batch output") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = stream.toDF().toDF("v")
      .agg(HeavyHitters.topValues(16)(col("v")).as("tv"))
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    try {
      val b1 = Seq.fill(40)("x") ++ Seq.fill(10)("y")
      val b2 = Seq.fill(25)("y") ++ Seq.fill(5)("z")
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val got = spark.table("hh_out")
        .select(explode(col("tv")).as("s")).select(col("s._1"), col("s._2"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // Exact regime (capacity > cardinality): streaming merge across
      // batches must equal the plain batch counts.
      assert(got == Map("x" -> 40L, "y" -> 35L, "z" -> 5L))
    } finally q.stop()
  }

  test("estimates stay within [true - n/(m+1), true]; big hitters survive") {
    val rnd = new Random(23)
    // Zipf-ish: one dominant value, a midweight, a long tail.
    val values = Seq.fill(300)("big") ++ Seq.fill(80)("mid") ++
      Seq.fill(620)(s"t${rnd.nextInt(200)}")
    val exact = values.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val m = 8
    val bound = values.size.toDouble / (m + 1)
    for (parts <- Seq(1, 7)) {
      val est = sketch(values, m, parts)
      assert(est.size <= m)
      est.foreach { case (v, c) =>
        val t = exact(v)
        assert(c <= t, s"$v overestimated: $c > $t")
        assert(c >= t - bound, s"$v underestimated beyond bound: $c < $t - $bound")
      }
      // No false negatives above the MG threshold.
      exact.filter(_._2 > bound).keys.foreach { v =>
        assert(est.contains(v), s"heavy value $v missing (parts=$parts)")
      }
    }
  }
}
