package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.graft.{DotProduct, RewriteDotProduct}

class RewriteDotProductSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteDotProduct
    try body
    finally spark.experimental.extraOptimizations = before
  }

  private val hofSql =
    """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,
      |                 (acc, v) -> acc + v) AS d
      |FROM (SELECT array(1.0D, 2.0D, 3.0D) AS a,
      |             array(4.0D, 5.0D, 6.0D) AS b)""".stripMargin

  test("HOF dot-product composition rewrites to the native expression") {
    withRule {
      val df = spark.sql(hofSql)
      val rewritten = df.queryExecution.optimizedPlan
        .expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
      assert(rewritten, df.queryExecution.optimizedPlan.toString)
      assert(df.collect()(0).getDouble(0) == 32.0)
    }
  }

  test("rewrite preserves values, including null poisoning on mismatch") {
    val plain = spark.sql(hofSql).collect()(0).getDouble(0)
    val mismatch =
      """SELECT aggregate(zip_with(array(1.0D), array(1.0D, 2.0D),
        |  (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) AS d""".stripMargin
    val plainNull = spark.sql(mismatch).collect()(0).isNullAt(0)
    withRule {
      assert(spark.sql(hofSql).collect()(0).getDouble(0) == plain)
      assert(spark.sql(mismatch).collect()(0).isNullAt(0) == plainNull)
    }
  }

  test("non-dot-product folds are left alone") {
    withRule {
      // Sum of element SUMS, not products — must stay a HOF aggregate.
      val df = spark.sql(
        """SELECT aggregate(zip_with(array(1.0D), array(2.0D),
          |  (x, y) -> x + y), 0.0D, (acc, v) -> acc + v) AS d""".stripMargin)
      val rewritten = df.queryExecution.optimizedPlan
        .expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
      assert(!rewritten)
      assert(df.collect()(0).getDouble(0) == 3.0)
    }
  }
}
