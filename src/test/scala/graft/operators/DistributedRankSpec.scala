package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

import scala.util.Random

class DistributedRankSpec extends SparkSpec {

  test("withRowNumber equals row_number() over the same total order") {
    val s = spark
    import s.implicits._
    val rnd = new Random(42)
    // Heavy ties + negatives + a huge outlier: the bucket image must
    // stay monotone and the tie column must resolve identical values.
    val rows = (1 to 5000).map { i =>
      (i.toLong, rnd.nextInt(50).toLong - 25L)
    } :+ (5001L, 1000000L)
    val df = rows.toDF("id", "v").repartition(13)
    val expected = df.withColumn("r",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val got = DistributedRank
      .withRowNumber(df, col("v"), col("id"), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got == expected)
    // Descending via a negated sort column.
    val expDesc = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").desc, col("id"))))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val gotDesc = DistributedRank
      .withRowNumber(df, -col("v"), col("id"), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(gotDesc == expDesc)
  }

  test("withRowNumber: degenerate single-value frame still ranks by tie") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i, 7L)).toDF("id", "v")
    val got = DistributedRank.withRowNumber(df, col("v"), col("id"), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got == (1L to 100L).map(i => i -> i).toMap)
  }

  test("withRowNumber: NULL and NaN sort values match the window form") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // Mix NULLs, NaNs, infinities and finite values: every row must
    // survive (no silent drop at the carry join) and rank exactly as
    // row_number() over (sort asc, tie asc) — NULLS FIRST, NaN LAST.
    val rows: Seq[(Long, Option[Double])] = (1 to 2000).map { i =>
      val v: Option[Double] = i % 97 match {
        case 0 => None
        case 1 => Some(Double.NaN)
        case 2 => Some(Double.PositiveInfinity)
        case 3 => Some(Double.NegativeInfinity)
        case _ => Some(rnd.nextInt(40).toDouble - 20.0)
      }
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v").repartition(11)
    val expected = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").asc, col("id").asc)))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val got = DistributedRank.withRowNumber(df, col("v"), col("id"), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got.size == rows.size, "rows were dropped by the rank")
    assert(got == expected)
  }

  test("withRowNumber: all-NULL sort frame ranks purely by tie") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).map(i => (i, None: Option[Double])).toDF("id", "v")
    val got = DistributedRank.withRowNumber(df, col("v"), col("id"), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got == (1L to 50L).map(i => i -> i).toMap)
  }

  test("ntileFromRank matches Spark's ntile for ragged populations") {
    val s = spark
    import s.implicits._
    for (n <- Seq(7, 10, 23, 100, 101)) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % n).toLong))
        .toDF("id", "v")
      val expected = df.withColumn("t",
          ntile(10).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t").as[(Long, Int)].collect().toMap
        .map { case (k, v) => k -> v.toLong }
      val got = DistributedRank
        .withRowNumber(df.crossJoin(broadcast(
          df.agg(count(lit(1)).as("n")))), col("v"), col("id"), "r")
        .withColumn("t",
          DistributedRank.ntileFromRank(col("r"), col("n"), 10))
        .select("id", "t").as[(Long, Long)].collect().toMap
      assert(got == expected, s"n=$n")
    }
  }
}
