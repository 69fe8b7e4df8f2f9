package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable._
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Similarity search over an embedding column — SURVEY.md §2 items 26-27.
  *
  * Two paths:
  *  - [[bruteForce]]: exact top-k for a (small, broadcast) query set —
  *    the baseline. Cost is |Q|×N dot products, fully parallel, no
  *    shuffle besides the final per-query top-k.
  *  - [[lshTopK]]: random-hyperplane LSH. Every vector gets a bucket id
  *    from the sign pattern of `numPlanes` hyperplane projections; top-k
  *    runs within buckets only. At 100 TB this turns the O(N²) pair
  *    space into per-bucket joins that shuffle on the bucket id. The
  *    hyperplanes are md5-derived (deterministic, reproducible anywhere).
  */
object Knn {

  /** Deterministic pseudo-random hyperplanes: component (p, j) is
    * `(md5_32("p_j") % 2001 - 1000) / 1000.0` — reproducible in any
    * engine with md5 (same formula as the DuckDB oracle). */
  def planes(numPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dims).map { j =>
        md.reset()
        val hex = md.digest(s"${p}_$j".getBytes(StandardCharsets.UTF_8))
          .take(4).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex, 16)
        (h % 2001 - 1000) / 1000.0
      }
    }
  }

  /** Bucket id column: bit p set when dot(vec, plane_p) >= 0. */
  def bucketId(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      when(dot(vec, typedLit(w)) >= 0.0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** Exact cosine top-k of `queries` against `corpus` (both having
    * `idCol` + `vecCol`). Returns (q_id, neighbor_id, cosine, rank). */
  def bruteForce(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    // Norms are computed ONCE per row here, not per pair in the |Q|×N
    // join below — same doubles (sqrt of the same fold), |Q|+N fewer
    // dot products by a factor of the opposite side's cardinality.
    val q = queries.select(col(idCol).as("q_id"), asDoubles(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", sqrt(dot(col("q_vec"), col("q_vec"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDoubles(col(vecCol)).as("c_vec"))
      .withColumn("c_norm", sqrt(dot(col("c_vec"), col("c_vec"))))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6)
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Approximate top-k: rank within LSH buckets only.
    * Returns (q_id, neighbor_id, bucket, cosine, rank). */
  def lshTopK(corpus: DataFrame, vecCol: String, idCol: String,
      numPlanes: Int, dims: Int, k: Int): DataFrame = {
    val ps = planes(numPlanes, dims)
    val withBucket = corpus.select(col(idCol).as("__id"),
      asDoubles(col(vecCol)).as("__v"))
      .withColumn("bucket", bucketId(col("__v"), ps))
      .withColumn("__norm", sqrt(dot(col("__v"), col("__v")))) // once per row
    val a = withBucket.select(col("__id").as("q_id"), col("__v").as("q_vec"),
      col("bucket"), col("__norm").as("q_norm"))
    val b = withBucket.select(col("__id").as("neighbor_id"), col("__v").as("c_vec"),
      col("bucket"), col("__norm").as("c_norm"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    a.join(b, Seq("bucket")).where(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"), col("bucket"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6)
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
