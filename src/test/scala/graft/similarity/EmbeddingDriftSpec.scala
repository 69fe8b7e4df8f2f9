package graft.similarity

import graft.SparkSpec
import graft.queries.SimilarityQueries

/** Pins qs_embedding_drift (§2.27n) on crafted unit vectors — the halves
  * are vec_id parity, so even/odd id construction controls each half's
  * centroid exactly. */
class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical halves drift 0 / cos 1; orthogonal halves shift sqrt(2) / cos 0") {
    val e1 = Seq(1.0f, 0f, 0f, 0f)
    val e2 = Seq(0f, 1.0f, 0f, 0f)
    // label 0: every vector is e1 in both halves → zero drift, cos 1.
    val l0 = (0L until 40L).map(i => (i, e1, 0))
    // label 1: even ids (half 0) on e1, odd ids (half 1) on e2 →
    // centroids orthogonal, displacement √2.
    val l1 = (0L until 10L).map(k => (100 + 2 * k, e1, 1)) ++
      (0L until 10L).map(k => (101 + 2 * k, e2, 1))
    val dir = java.nio.file.Files.createTempDirectory("edrift").toString
    (l0 ++ l1).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.qsEmbeddingDrift(spark, dir).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(out(0).getAs[Double]("shift_l2") == 0.0)
    assert(out(0).getAs[Double]("centroid_cos") == 1.0)
    assert(math.abs(out(1).getAs[Double]("shift_l2") - math.sqrt(2.0)) < 1e-5)
    assert(out(1).getAs[Double]("centroid_cos") == 0.0)
    assert(out(1).getAs[Long]("n_a") == 10L && out(1).getAs[Long]("n_b") == 10L)
  }
}
