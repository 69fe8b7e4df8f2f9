package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{IntersectionSize, RewriteIntersectionSize}

class RewriteIntersectionSizeSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteIntersectionSize
    try body
    finally spark.experimental.extraOptimizations = before
  }

  private def hasNative(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case IntersectionSize(_, _) => true
      case _ => false
    })

  // Real parquet scan — literals constant-fold before user rules run.
  private lazy val fixture: String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("isz_fixture").toString
    Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "x")),      // dup on left counts once
      (Seq.empty[String], Seq("a")),
      (Seq("x", "y"), Seq.empty[String]),
      (Seq("q"), Seq("q", "q"))                  // dup on right
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("isz_fixture")
    "isz_fixture"
  }

  test("size(array_intersect) rewrites to intersection_size, same values") {
    val q = s"SELECT size(array_intersect(a, b)) AS n FROM $fixture"
    val plain = spark.sql(q).collect().map(_.getInt(0)).toSeq.sorted
    withRule {
      val df = spark.sql(q)
      assert(hasNative(df), df.queryExecution.optimizedPlan.toString)
      assert(df.collect().map(_.getInt(0)).toSeq.sorted == plain)
    }
    assert(plain.sorted == Seq(0, 0, 1, 1, 2))
  }

  test("expression equals the builtin on random arrays, interpreted and codegen") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(5)
    val rows = Seq.fill(300)((
      Seq.fill(rng.nextInt(12))(s"t${rng.nextInt(10)}"),
      Seq.fill(rng.nextInt(12))(s"t${rng.nextInt(10)}")))
    val df = rows.toDF("a", "b")
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
      .withColumn("native", IntersectionSize.ofColumns(col("a"), col("b")))
    assert(df.where(col("builtin") =!= col("native")).isEmpty)
  }

  test("verification path of the prefix join survives the rewrite unchanged") {
    withRule {
      val s = spark
      import s.implicits._
      val df = Seq(
        1L -> "a b c d", 2L -> "a b c e", 3L -> "x y z w"
      ).toDF("doc_id", "text")
      val got = graft.dedup.Dedup.prefixJaccardJoin(df, "text", "doc_id", 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == Set((1L, 2L, 3)))
    }
  }
}
