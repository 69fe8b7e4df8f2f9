package graft.queries

import graft.SparkSpec

/** Pins qt_js_sources (§2.28p): the JSD identity (0 for identical
  * distributions) and the ln 2 maximum (disjoint vocabularies). */
class JsSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("jsd").toString
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextQueries.qtJsSources(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Double]("jsd")).toMap
  }

  test("identical distributions diverge 0; disjoint vocabularies hit ln 2") {
    val jsd = run(Seq(
      (0L, "same1", "x x y"), (1L, "same2", "x x y"),
      (2L, "other", "z w z w")))
    assert(jsd(("same1", "same2")) == 0.0)
    // Disjoint vocab: every term is p·ln2, masses sum to 1 per side.
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(jsd(("other", "same1")) - ln2) < 2e-6)
    // All 3 unordered pairs reported exactly once.
    assert(jsd.size == 3)
  }
}
