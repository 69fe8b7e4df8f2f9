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

  test("minhash_signature is callable from SQL after registration") {
    GraftFunctions.install(spark)
    val r = spark.sql(
      "SELECT minhash_signature(array('a', 'b'), 8) AS sig").collect()(0)
    val sig = r.getSeq[Long](0)
    assert(sig.length == 8)
    // First slot = unsigned 32-bit value of md5('0:a') or md5('0:b'),
    // whichever is smaller — recompute via the portable SQL formula.
    val want = spark.sql(
      """SELECT least(CAST(conv(substring(md5('0:a'), 1, 8), 16, 10) AS BIGINT),
        |             CAST(conv(substring(md5('0:b'), 1, 8), 16, 10) AS BIGINT)) AS v"""
        .stripMargin).collect()(0).getLong(0)
    assert(sig.head == want)
  }

  test("word_shingles is callable from SQL after registration") {
    GraftFunctions.install(spark)
    // Unhashed: raw distinct 2-gram strings.
    val raw = spark.sql(
      "SELECT word_shingles(array('a', 'b', 'c'), 2, false) AS sh")
      .collect()(0).getSeq[String](0)
    assert(raw == Seq("a b", "b c"))
    // Default third argument hashes each shingle with md5.
    val hashed = spark.sql(
      "SELECT word_shingles(array('a', 'b', 'c'), 2) AS sh")
      .collect()(0).getSeq[String](0)
    val want = spark.sql("SELECT array(md5('a b'), md5('b c')) AS w")
      .collect()(0).getSeq[String](0)
    assert(hashed == want)
  }
}
