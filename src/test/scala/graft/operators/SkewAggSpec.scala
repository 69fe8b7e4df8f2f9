package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salted holistic aggregation must be EXACTLY the unsalted answer —
  * salting changes the shuffle shape, never the result. */
class SkewAggSpec extends SparkSpec {

  test("salted distinct count equals exact count_distinct on random skewed data") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // skewed: group 0 holds ~80% of rows with a wide value range
    val rows = Seq.fill(5000) {
      val g = if (rnd.nextInt(10) < 8) 0 else 1 + rnd.nextInt(4)
      (g.toLong, rnd.nextInt(if (g == 0) 900 else 30).toLong)
    }
    val df = rows.toDF("g", "v")
    val exact = df.groupBy("g").agg(count_distinct(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (salts <- Seq(1, 7, 32)) {
      val salted = SkewAgg.countDistinctSalted(df, Seq("g"), "v", salts)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_distinct")).toMap
      assert(salted == exact, s"salts=$salts")
    }
  }

  test("salted distinct count handles nulls like count_distinct (ignored)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some(1L)), (1L, None), (1L, Some(2L)), (1L, None))
      .toDF("g", "v")
    val out = SkewAgg.countDistinctSalted(df, Seq("g"), "v", 4).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_distinct") == 2L)
  }

  test("max value count matches a driver-side recount") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"))
    val out = SkewAgg.maxValueCountSalted(rows.toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("max_value_count")).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }
}
