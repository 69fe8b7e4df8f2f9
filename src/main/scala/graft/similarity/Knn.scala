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

  /** Deterministic IVF coarse quantizer, trained on a bounded sample —
    * the production IVF recipe: ONE distributed pass takes a
    * deterministic pseudo-random sample (top-`maxSample` by md5 of id —
    * a TakeOrdered job, no full sort, no RNG), then farthest-point
    * seeding and Lloyd's iterations run driver-side on the sample.
    * At 100 TB the index build therefore costs one scan; the trained
    * centroids broadcast as literals into the assignment projection.
    */
  def trainCentroids(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 5, maxSample: Int = 10000): Seq[Seq[Double]] = {
    val sample = corpus
      .select(col(idCol).as("__id"), asDoubles(col(vecCol)).as("__v"))
      .orderBy(md5Hash32(concat_ws(":", lit("ivf"), col("__id"))), col("__id"))
      .limit(maxSample)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.length >= k, s"need at least $k vectors, got ${sample.length}")

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    // Farthest-point seeding: spreads seeds across the data's modes
    // (a fixed-prefix init can collapse into one cluster).
    val cents = scala.collection.mutable.ArrayBuffer(sample(0))
    while (cents.length < k) {
      cents += sample.maxBy(v => cents.map(c => d2(v, c)).min)
    }
    // Lloyd's iterations over the sample.
    for (_ <- 1 to iters) {
      val assign = sample.map(v => cents.indices.minBy(i => d2(v, cents(i))))
      for (b <- cents.indices) {
        val members = sample.indices.filter(assign(_) == b)
        if (members.nonEmpty) {
          val mean = new Array[Double](cents(b).length)
          members.foreach { m =>
            var i = 0
            while (i < mean.length) { mean(i) += sample(m)(i); i += 1 }
          }
          cents(b) = mean.map(_ / members.length)
        }
      }
    }
    cents.map(_.toSeq).toSeq
  }

  /** 0-based argmin over squared L2 distance to each centroid. Since
    * ||v−c||² = v·v − 2v·c + c·c and v·v is constant per row, the argmin
    * ranks by c·c − 2v·c only. */
  def nearestCentroid(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val dists = cents.map { c =>
      val c2 = c.map(x => x * x).sum
      lit(c2) - lit(2.0) * dot(vec, typedLit(c))
    }
    val arr = array(dists: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** The `nprobe` nearest centroid ids, by the same ranking. Struct sort
    * (distance, index) keeps ties deterministic. */
  def probeCentroids(vec: Column, cents: Seq[Seq[Double]], nprobe: Int): Column = {
    val dists = cents.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dot(vec, typedLit(c))).as("d"),
        lit(i).as("i"))
    }
    slice(array_sort(array(dists: _*)), 1, nprobe).getField("i")
  }

  /** IVF approximate top-k: corpus vectors live in their nearest-centroid
    * bucket; each query searches only its `nprobe` closest buckets. The
    * scale path for ANN at 100 TB — the join shuffles on bucket id and
    * touches nprobe/k of the corpus per query.
    * Returns (q_id, neighbor_id, cosine, rank). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, numCentroids: Int, nprobe: Int,
      iters: Int = 5): DataFrame = {
    val cents = trainCentroids(corpus, vecCol, idCol, numCentroids, iters)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDoubles(col(vecCol)).as("c_vec"))
      .withColumn("bucket", nearestCentroid(col("c_vec"), cents))
      .withColumn("c_norm", sqrt(dot(col("c_vec"), col("c_vec"))))
    val q = queries.select(col(idCol).as("q_id"), asDoubles(col(vecCol)).as("q_vec"))
      .withColumn("bucket", explode(probeCentroids(col("q_vec"), cents, nprobe)))
      .withColumn("q_norm", sqrt(dot(col("q_vec"), col("q_vec"))))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket")).where(col("q_id") =!= col("neighbor_id"))
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
