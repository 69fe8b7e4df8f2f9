package graft.queries

import graft.SparkSpec

/** Pins qt_burstiness (§2.28o) semantics on hand-computable corpora. */
class BurstinessSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[String, org.apache.spark.sql.Row] = {
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    docs.toDF("doc_id", "text").withColumn("source",
        org.apache.spark.sql.functions.lit("s"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextQueries.qtBurstiness(spark, dir).collect()
      .map(r => r.getAs[String]("token") -> r).toMap
  }

  test("uniform term has zero dispersion; concentrated term is bursty") {
    // "e" once in every doc (perfectly regular, D = 0, burstiness 1);
    // "c" four times in one doc of four (clumped: D = 4, burstiness 4).
    val out = run(Seq(
      (0L, "e c c c c"), (1L, "e x"), (2L, "e y"), (3L, "e z")))
    val e = out("e")
    assert(e.getAs[Long]("cf") == 4L && e.getAs[Long]("df") == 4L)
    assert(e.getAs[Double]("burstiness") == 1.0)
    assert(e.getAs[Double]("dispersion") == 0.0)
    val c = out("c")
    assert(c.getAs[Long]("cf") == 4L && c.getAs[Long]("df") == 1L)
    assert(c.getAs[Double]("burstiness") == 4.0)
    // var = (n·Σx² − cf²)/(n(n−1)) = (4·16 − 16)/12 = 4; mean = 1; D = 4.
    assert(c.getAs[Double]("dispersion") == 4.0)
  }

  test("single-document corpus reports NULL dispersion (n − 1 = 0)") {
    val out = run(Seq((0L, "a a b")))
    assert(out("a").isNullAt(out("a").fieldIndex("dispersion")))
  }
}
