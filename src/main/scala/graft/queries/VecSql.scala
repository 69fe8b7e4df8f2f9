package graft.queries

/** DuckDB oracle fragments for the vector / hyperplane-LSH arithmetic —
  * the SQL mirrors of [[graft.functions.Portable.dot]],
  * [[graft.similarity.Knn.planes]] and [[graft.similarity.Knn.bucketId]].
  * ONE copy, parameterized on dims/planes: these fragments are
  * engine-parity-critical (left-fold order, md5 plane derivation,
  * round-6 cosine), and both the similarity and the dedup-graph oracle
  * families must agree with the identical Scala code they mirror — a
  * formula fix applied to one duplicated copy but not the other would
  * make the two families silently disagree. */
private[queries] object VecSql {

  /** Left-fold dot of two FLOAT[] columns over `dims` dimensions. */
  def dotSql(a: String, b: String, dims: Int): String =
    s"""list_reduce(list_transform(range(1, ${dims + 1}),
       | i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""
      .stripMargin.replace("\n", "")

  /** Cosine rounded to 6 dp (norms from the same left-fold). */
  def cosineSql(a: String, b: String, dims: Int): String =
    s"round(${dotSql(a, b, dims)} / (sqrt(${dotSql(a, a, dims)}) * sqrt(${dotSql(b, b, dims)})), 6)"

  /** md5-derived hyperplane component w(p, i) for 1-based dim index i
    * (mirrors Knn.planes' `(md5_32("p_j") % 2001 - 1000) / 1000`). */
  def wSql(p: Int): String =
    s"((('0x' || substr(md5('${p}_' || (i - 1)), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)"

  /** Projection of `vec` onto GLOBAL plane index p. */
  def planeDotSql(vec: String, p: Int, dims: Int): String =
    s"""list_reduce(list_transform(range(1, ${dims + 1}),
       | i -> CAST($vec[i] AS DOUBLE) * ${wSql(p)}), (x, y) -> x + y)"""
      .stripMargin.replace("\n", "")

  /** Bucket id over `numPlanes` planes starting at global plane index
    * `offset` — bit p (LOCAL index) set when the projection onto global
    * plane (offset + p) is ≥ 0, exactly like `Knn.bucketId` applied to
    * `Knn.planes(total).slice(offset, offset + numPlanes)`. */
  def bucketSql(vec: String, numPlanes: Int, dims: Int, offset: Int = 0): String =
    (0 until numPlanes).map { p =>
      s"(CASE WHEN ${planeDotSql(vec, offset + p, dims)} >= 0.0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** The LSH-bucketed cosine-threshold edge CTE over `embeddings`
    * (mirrors [[graft.dedup.Dedup.lshCosinePairs]]): emits
    * `$cteName($aAlias, $bAlias)` with a < b. One builder so every
    * consumer oracle (triangles/clustering vs k-core/PageRank) replays
    * the IDENTICAL edge set by construction. */
  def lshEdgeCte(cteName: String, aAlias: String, bAlias: String,
      numPlanes: Int, dims: Int, minCosine: Double): String =
    s"""WITH bktd AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${bucketSql("embedding", numPlanes, dims)} AS bucket
       |  FROM embeddings
       |), $cteName AS MATERIALIZED (
       |  SELECT a.vec_id AS $aAlias, b.vec_id AS $bAlias
       |  FROM bktd a JOIN bktd b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.embedding", "b.embedding", dims)} >= $minCosine
       |)""".stripMargin
}
