package graft

import org.apache.spark.sql.graft.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {
  test("dot_product is callable from SQL after registration") {
    GraftFunctions.install(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0)
    assert(r.getAs[Double]("d") == 32.0)
    // Null array → null result (BinaryExpression null semantics).
    val n = spark.sql(
      "SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect()(0)
    assert(n.isNullAt(0))
  }
}
