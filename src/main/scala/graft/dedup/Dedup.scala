package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable._

/** Deduplication operators for large text/embedding corpora —
  * SURVEY.md §2 items 20-25.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup = hash-groupBy: one shuffle on a 128-bit content hash,
  *    perfectly distributed by construction;
  *  - MinHash-LSH = signature projection (narrow) → explode to (band,
  *    bucket) pairs → shuffle on band value → per-bucket self-join.
  *    Candidate generation is O(collisions), never the O(n²) cross join;
  *  - SimHash = explode distinct tokens (shuffle on doc id) → 32
  *    conditional sums in ONE aggregation;
  *  - n-gram Jaccard and embedding near-dup take an explicit blocking
  *    column — the contract is "pairs within a block", keeping the join
  *    co-partitioned and linear in block sizes.
  */
object Dedup {

  /** Exact duplicate groups by content hash; the canonical row is the
    * minimum id (deterministic election). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** MinHash signature columns sig_0..sig_{numPerms-1}. */
  def withMinhashSignature(df: DataFrame, textCol: String, numPerms: Int): DataFrame = {
    val toks = array_distinct(tokens(col(textCol)))
    df.select(col("*") +:
      (0 until numPerms).map(k => minhash(toks, k).as(s"sig_$k")): _*)
  }

  /** LSH band values: md5 over each group of `bandSize` signature
    * columns. numPerms = bandSize × numBands. */
  def bandColumns(numPerms: Int, bandSize: Int): Seq[Column] =
    (0 until numPerms / bandSize).map { b =>
      md5(concat_ws("_",
        (0 until bandSize).map(j => col(s"sig_${b * bandSize + j}")): _*))
        .as(s"band_$b")
    }

  /** Near-duplicate candidate pairs: documents sharing ≥1 LSH band.
    * Returns (id_a, id_b, n_shared_bands), id_a < id_b. */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      numPerms: Int, bandSize: Int): DataFrame = {
    val numBands = numPerms / bandSize
    val sigs = withMinhashSignature(df, textCol, numPerms)
      .select(col(idCol) +: bandColumns(numPerms, bandSize): _*)
    val banded = sigs.select(col(idCol).as("__id"), posexplode(
      array((0 until numBands).map(b => col(s"band_$b")): _*))
      .as(Seq("band_idx", "band_val")))
    val a = banded.select(col("__id").as("id_a"), col("band_idx"), col("band_val"))
    val b = banded.select(col("__id").as("id_b"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 32-bit SimHash over distinct tokens: bit b is set when more token
    * hashes have bit b set than clear. One explode + one aggregation. */
  def simhash32(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df
      .select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .select(col(idCol), md5Hash32(col("tok")).as("h"))
    val bitSums = (0 until 32).map { bit =>
      sum(when(col("h").bitwiseAND(lit(1L << bit)) =!= 0L, 1).otherwise(-1))
        .as(s"bit_$bit")
    }
    hashed.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 32).map(bit =>
          when(col(s"bit_$bit") > 0, lit(1L << bit)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Jaccard similarity over word n-gram shingles for every pair of rows
    * sharing `blockCol`. Returns (id_a, id_b, jaccard). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, blockCol: String): DataFrame = {
    val withShingles = df.select(col(blockCol).as("__block"), col(idCol).as("__id"),
      shingles(tokens(col(textCol)), n).as("__sh"))
    val a = withShingles.toDF("__block", "id_a", "sh_a")
    val b = withShingles.toDF("__block", "id_b", "sh_b")
    a.join(b, Seq("__block")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
  }

  /** Cosine similarity for every pair of rows sharing `blockCol`
    * (embedding near-dup). Returns (id_a, id_b, cosine). */
  def embeddingPairs(df: DataFrame, vecCol: String, idCol: String,
      blockCol: String): DataFrame = {
    val prepared = df.select(col(blockCol).as("__block"), col(idCol).as("__id"),
      asDoubles(col(vecCol)).as("__v"))
    val a = prepared.toDF("__block", "id_a", "v_a")
    val b = prepared.toDF("__block", "id_b", "v_b")
    a.join(b, Seq("__block")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cosine"))
  }
}
