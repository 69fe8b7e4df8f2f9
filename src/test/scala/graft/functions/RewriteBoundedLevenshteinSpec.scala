package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.graft.RewriteBoundedLevenshtein

class RewriteBoundedLevenshteinSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteBoundedLevenshtein
    try body
    finally spark.experimental.extraOptimizations = before
  }

  private def hasThresholded(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case Levenshtein(_, _, Some(_)) => true
      case _ => false
    })

  // A real file scan: a literal VALUES relation constant-folds into a
  // LocalRelation before user-provided rules run, which would make the
  // plan assertions vacuous (production inputs are scans, not literals).
  private lazy val fixture: String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lev_fixture").toString
    Seq(Option("kitten") -> "sitting", Option("abc") -> "abc",
      Option("abc") -> "xyz", Option("a") -> "abcdefghij",
      (None: Option[String]) -> "abc")
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("lev_fixture")
    "lev_fixture"
  }

  test("levenshtein(a,b) <= k rewrites to the banded form, same rows") {
    val q = s"SELECT a, b FROM $fixture WHERE levenshtein(a, b) <= 3"
    val plain = spark.sql(q).collect().map(_.toSeq).toSet
    withRule {
      val df = spark.sql(q)
      assert(hasThresholded(df), df.queryExecution.optimizedPlan.toString)
      assert(df.collect().map(_.toSeq).toSet == plain)
    }
  }

  test("strict < and flipped comparisons rewrite with the shifted bound") {
    for (pred <- Seq("levenshtein(a, b) < 4", "4 > levenshtein(a, b)",
        "3 >= levenshtein(a, b)")) {
      val q = s"SELECT a, b FROM $fixture WHERE $pred"
      val plain = spark.sql(q).collect().map(_.toSeq).toSet
      withRule {
        val df = spark.sql(q)
        assert(hasThresholded(df), s"$pred not rewritten")
        assert(df.collect().map(_.toSeq).toSet == plain, pred)
      }
    }
  }

  test("non-positive bounds and non-predicate uses are left alone") {
    withRule {
      // SELECT-list distance (no comparison) must stay unbounded.
      val proj = spark.sql(s"SELECT levenshtein(a, b) AS d FROM $fixture")
      assert(!hasThresholded(proj))
      // A bound of 0 stays as-is (rewrite requires k >= 1).
      val zero = spark.sql(
        s"SELECT a FROM $fixture WHERE levenshtein(a, b) <= 0")
      assert(!hasThresholded(zero))
      assert(zero.collect().map(_.getString(0)).toSeq == Seq("abc"))
    }
  }
}
