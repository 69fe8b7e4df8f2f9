package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.Knn

/** Driver-contract queries for similarity search — SURVEY.md §2 items
  * 26-27. The DuckDB oracles recompute the same md5-derived hyperplanes
  * and the same left-fold dot products, so even the approximate (LSH)
  * path is value-exact across engines.
  */
object SimilarityQueries {

  private val Dims = 64
  private val NumPlanes = 4

  /** Shared oracle fragment: left-fold dot of two FLOAT[] columns. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${Dims + 1}),
       | i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""
      .stripMargin.replace("\n", "")

  private def cosineSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  /** §2.26 — exact brute-force cosine top-5 for query vectors vec_id<10. */
  def qsKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    Knn.bruteForce(emb, emb.where(col("vec_id") < 10), "embedding", "vec_id", 5)
      .orderBy("q_id", "rank")
  }

  val qsKnnBruteSql: String =
    s"""SELECT q_id, neighbor_id, cosine, rank FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |    ${cosineSql("q.embedding", "c.embedding")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosineSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 10
       |) t
       |WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** §2.26b — filtered (hybrid) ANN: exact top-5 restricted to corpus
    * vectors with label < 3. The metadata predicate composes with the
    * scan — Catalyst pushes it into the parquet read, so the search
    * touches only the filtered partition of the corpus. */
  def qsKnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    Knn.bruteForce(emb.where(col("label") < 3),
      emb.where(col("vec_id") < 10), "embedding", "vec_id", 5)
      .orderBy("q_id", "rank")
  }

  val qsKnnFilteredSql: String =
    s"""SELECT q_id, neighbor_id, cosine, rank FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |    ${cosineSql("q.embedding", "c.embedding")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosineSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 10 AND c.label < 3
       |) t
       |WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** Oracle fragment: the md5-derived hyperplane component w(p, i) for
    * 1-based dim index i (formula mirrors [[Knn.planes]]). */
  private def wSql(p: Int): String =
    s"((('0x' || substr(md5('${p}_' || (i - 1)), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)"

  private def planeDotSql(vec: String, p: Int): String =
    s"""list_reduce(list_transform(range(1, ${Dims + 1}),
       | i -> CAST($vec[i] AS DOUBLE) * ${wSql(p)}), (x, y) -> x + y)"""
      .stripMargin.replace("\n", "")

  private def bucketSql(vec: String): String =
    (0 until NumPlanes).map { p =>
      s"(CASE WHEN ${planeDotSql(vec, p)} >= 0.0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** §2.27 — LSH random-hyperplane bucketed approximate top-3. */
  def qsKnnLsh(spark: SparkSession, dir: String): DataFrame =
    Knn.lshTopK(Tables.load(spark, dir, "embeddings"),
      "embedding", "vec_id", NumPlanes, Dims, 3)
      .orderBy("q_id", "rank")

  val qsKnnLshSql: String =
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
       |  FROM embeddings
       |)
       |SELECT q_id, neighbor_id, bucket, cosine, rank FROM (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, a.bucket,
       |    ${cosineSql("a.embedding", "b.embedding")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${cosineSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin

  /** §2.27b — IVF bucketed ANN (deterministic k-means quantizer, nprobe
    * probing). The index build is iterative (not SQL-expressible), but
    * with nprobe = numCentroids every query probes every bucket, so the
    * result is provably the exact top-k — the brute-force SQL is then a
    * value-exact oracle for the whole IVF pipeline (sampled training,
    * bucket assignment, probe ranking, bucketed join). The pruned-nprobe
    * recall contract is pinned by KnnSpec on crafted data. */
  def qsKnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    Knn.ivfTopK(emb, emb.where(col("vec_id") < 10), "embedding", "vec_id",
      k = 5, numCentroids = 8, nprobe = 8)
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qs_knn_brute" -> (qsKnnBrute _),
    "qs_knn_filtered" -> (qsKnnFiltered _),
    "qs_knn_lsh" -> (qsKnnLsh _),
    "qs_knn_ivf" -> (qsKnnIvf _))

  val oracles: Map[String, String] = Map(
    "qs_knn_brute" -> qsKnnBruteSql,
    "qs_knn_filtered" -> qsKnnFilteredSql,
    "qs_knn_lsh" -> qsKnnLshSql,
    // Full-probe IVF == exact top-k, so it shares the brute-force oracle.
    "qs_knn_ivf" -> qsKnnBruteSql)
}
