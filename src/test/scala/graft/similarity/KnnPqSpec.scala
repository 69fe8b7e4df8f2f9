package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Pins the IVF-PQ building blocks on real sf0.01 embeddings: codes
  * stay in range (the compressed representation is m small ints), the
  * whole pipeline is deterministic (re-encoding yields identical
  * codes), and ADC retrieval recalls most of the exact top-k — the
  * quality/compression trade PQ exists to make (64 dims × 4 B → 8
  * codes here). */
class KnnPqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  // 16 subspaces × 4 dims, 64 codewords each: 16 × 6-bit codes ≈ 12 B
  // per vector vs 256 B raw (and the measured recall floor below —
  // coarser 8×16 codes halve recall on these embeddings).
  private val M = 16
  private val Ksub = 64

  test("PQ codes are m ints within [0, ksub); encoding is deterministic") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cb = Knn.trainPqCodebooks(emb, "embedding", "vec_id", M, Ksub)
    assert(cb.size === M && cb.forall(_.size === Ksub) &&
      cb.forall(_.forall(_.size === 64 / M)))
    val codes = emb.select(col("vec_id"),
      Knn.pqEncode(col("embedding").cast("array<double>"), cb).as("codes"))
    val stats = codes.select(
      min(array_min(col("codes"))), max(array_max(col("codes"))),
      min(size(col("codes"))), max(size(col("codes"))), count(lit(1))).head()
    assert(stats.getInt(0) >= 0 && stats.getInt(1) < Ksub)
    assert(stats.getInt(2) === M && stats.getInt(3) === M)
    val again = emb.select(col("vec_id"),
      Knn.pqEncode(col("embedding").cast("array<double>"), cb).as("codes"))
    assert(codes.exceptAll(again).isEmpty && again.exceptAll(codes).isEmpty)
  }

  test("ADC top-k over unit vectors recalls most of the exact top-k") {
    // Cosine retrieval over PQ requires unit vectors: on the L2-
    // normalized sphere, ‖a−b‖² = 2 − 2·cos(a,b), so the ADC order IS
    // the cosine order up to quantization error. (Unnormalized, ADC
    // ranks by raw L2, a different metric — recall would be capped by
    // the metric mismatch, not by PQ quality.)
    val raw = Tables.load(spark, dir, "embeddings")
    val v = col("embedding").cast("array<double>")
    val n = sqrt(aggregate(zip_with(v, v, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x))
    val emb = raw.select(col("vec_id"), transform(v, x => x / n).as("embedding"))
    val queries = emb.where(col("vec_id") < 10)
    val cb = Knn.trainPqCodebooks(emb, "embedding", "vec_id", M, Ksub)
    def ids(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    // Exact ranking is by cosine; PQ ADC approximates L2. On these
    // embeddings the two orders agree enough for a recall floor —
    // retrieve 3k by ADC and check containment of the exact top-k.
    val exact = ids(Knn.bruteForce(emb, queries, "embedding", "vec_id", 5))
    val pq = ids(Knn.pqTopK(emb, queries, "embedding", "vec_id", 15, cb))
    val recall = exact.map { case (q, e) =>
      (e intersect pq.getOrElse(q, Set.empty)).size.toDouble / e.size
    }.sum / exact.size
    assert(recall >= 0.6, s"PQ recall@5-in-15 was $recall")

    // Composed IVF-PQ: probing half the coarse buckets costs some
    // recall vs pure PQ but must stay well above chance, and at full
    // probe the IVF layer must be a no-op (identical to pure PQ).
    val ivfpqFull = ids(Knn.ivfPqTopK(emb, queries, "embedding", "vec_id",
      15, numCentroids = 4, nprobe = 4, cb))
    assert(ivfpqFull === pq, "full probe must equal pure PQ")
    val ivfpqHalf = ids(Knn.ivfPqTopK(emb, queries, "embedding", "vec_id",
      15, numCentroids = 4, nprobe = 2, cb))
    val halfRecall = exact.map { case (q, e) =>
      (e intersect ivfpqHalf.getOrElse(q, Set.empty)).size.toDouble / e.size
    }.sum / exact.size
    assert(halfRecall >= 0.4, s"IVF-PQ half-probe recall was $halfRecall")
  }
}
