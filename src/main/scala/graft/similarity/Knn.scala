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

  /** Deterministic IVF coarse quantizer: Lloyd's k-means with the k
    * lowest-id vectors as initial centroids and a FIXED iteration count —
    * no RNG, so the index is reproducible run to run. Each iteration is
    * one assignment pass (argmin over centroid literals, codegen dot
    * products) plus one tiny (k × dims)-row aggregation; only centroids
    * ever reach the driver.
    */
  def trainCentroids(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 5): Seq[Seq[Double]] = {
    val vecs = corpus.select(col(idCol).as("__id"), asDoubles(col(vecCol)).as("__v"))
    var cents = farthestPointInit(vecs, k)
    for (_ <- 1 to iters) {
      val assigned = vecs.withColumn("__b", nearestCentroid(col("__v"), cents))
      val stats = assigned
        .select(col("__b"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("__b", "__pos")
        .agg(sum("__x").as("__sum"), count(lit(1)).as("__n"))
        .collect()
      val byBucket = stats.groupBy(_.getAs[Int]("__b"))
      cents = cents.zipWithIndex.map { case (old, b) =>
        byBucket.get(b) match {
          case Some(rows) =>
            rows.sortBy(_.getAs[Int]("__pos"))
              .map(r => r.getAs[Double]("__sum") / r.getAs[Long]("__n")).toSeq
          case None => old // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** Deterministic k-means++-style seeding without RNG: start from the
    * minimum-id vector, then repeatedly take the vector farthest from the
    * chosen set (ties broken by id). Min-id-prefix seeding collapses when
    * the first k ids share a cluster; farthest-point traversal spreads
    * seeds across the data's actual modes. One small top-1 job per seed. */
  private def farthestPointInit(vecs: DataFrame, k: Int): Seq[Seq[Double]] = {
    var cents = Seq(vecs.orderBy("__id").limit(1)
      .collect()(0).getSeq[Double](1).toSeq)
    while (cents.length < k) {
      val dmin = array_min(array(cents.map { c =>
        val c2 = c.map(x => x * x).sum
        dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), typedLit(c)) + lit(c2)
      }: _*))
      val next = vecs.orderBy(dmin.desc, col("__id").asc).limit(1)
        .collect()(0).getSeq[Double](1).toSeq
      cents = cents :+ next
    }
    cents
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
