package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** SURVEY.md §2 item 35 — binary media columns + partition-aware
  * feature extraction, verified against a DuckDB oracle that recomputes
  * the stub decoder's arithmetic over the same bytes (documents are
  * ASCII, so code points == bytes).
  */
object MultimodalQueries {

  def qmBinaryFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.asMedia(Tables.load(spark, dir, "documents")))
      .toDF().orderBy("doc_id")

  val qmBinaryFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id, 'blob/' || source AS media_type,
      |    CAST(length(text) AS BIGINT) AS n_bytes,
      |    CAST(list_sum(list_transform(string_split(text, ''),
      |      c -> unicode(c))) AS BIGINT) AS byte_sum,
      |    md5(text) AS content_md5
      |  FROM documents
      |)
      |SELECT doc_id, media_type, n_bytes, byte_sum,
      |  1 + byte_sum % 64 AS width,
      |  1 + n_bytes % 48 AS height,
      |  least(1 + byte_sum % 64, 32) AS resized_w,
      |  least(1 + n_bytes % 48, 32) AS resized_h,
      |  1 + byte_sum % 7 AS n_frames,
      |  content_md5
      |FROM b
      |ORDER BY doc_id""".stripMargin

  /** §2 item 35 (frame sampling) — one-to-many stub decode: each doc
    * expands to 1 + byte_sum%7 frames with per-frame hashes. */
  def qmFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.asMedia(Tables.load(spark, dir, "documents")))
      .toDF().orderBy("doc_id", "frame_idx")

  val qmFramesSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(string_split(text, ''),
      |      c -> unicode(c))) AS BIGINT) AS byte_sum
      |  FROM documents
      |)
      |SELECT doc_id, f.range AS frame_idx,
      |  md5(doc_id || ':' || f.range) AS frame_hash
      |FROM b CROSS JOIN range(0, 7) f
      |WHERE f.range < 1 + byte_sum % 7
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** §2 item 35 (fixed-window segmentation) — every doc expands to its
    * ⌈len/256⌉ fixed-size chunks, last one ragged (the audio/waveform
    * batch shape). */
  def qmChunks(spark: SparkSession, dir: String): DataFrame =
    Multimodal.fixedChunks(Tables.load(spark, dir, "documents"),
      "text", "doc_id", 256)
      .orderBy("doc_id", "chunk_idx")

  // LATERAL unnest: the chunk range derives from each row's own length,
  // so no fixed cap can silently diverge from the Spark side on long
  // documents.
  val qmChunksSql: String =
    """SELECT doc_id, t.chunk_idx,
      |  length(substr(text, CAST(t.chunk_idx * 256 + 1 AS INT), 256)) AS chunk_len,
      |  md5(substr(text, CAST(t.chunk_idx * 256 + 1 AS INT), 256)) AS chunk_md5
      |FROM documents, LATERAL (
      |  SELECT unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS chunk_idx
      |) t
      |ORDER BY doc_id, chunk_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm_binary_features" -> (qmBinaryFeatures _),
    "qm_frames" -> (qmFrames _),
    "qm_chunks" -> (qmChunks _))

  val oracles: Map[String, String] = Map(
    "qm_binary_features" -> qmBinaryFeaturesSql,
    "qm_frames" -> qmFramesSql,
    "qm_chunks" -> qmChunksSql)
}
