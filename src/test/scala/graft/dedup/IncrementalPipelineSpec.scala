package graft.dedup

import graft.SparkSpec
import graft.operators.Merge
import org.apache.spark.sql.functions._

/** End-to-end incremental ingest composition: a new batch probes the
  * corpus's LSH band index ([[Dedup.incrementalNearDups]]), near-dups
  * drop, and the surviving docs upsert into the partitioned canonical
  * store ([[Merge.upsertPartitioned]]) — the continuous-ingest dedup
  * loop assembled from the operators it's built for, with only the
  * batch's partitions rewritten. */
class IncrementalPipelineSpec extends SparkSpec {

  test("batch probes the index, dups drop, survivors upsert in place") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files.createTempDirectory("canon_store").toString

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web", 10L),
      (2L, "pack my box with five dozen liquor jugs", "web", 11L),
      (3L, "how vexingly quick daft zebras jump today", "books", 12L))
      .toDF("doc_id", "text", "source", "ver")
    corpus.write.mode("overwrite").partitionBy("source").parquet(store)

    val batch = Seq(
      // Near-dup of doc 1 (identical token stream → every band collides).
      (4L, "the quick brown fox jumps over the lazy dog", "web", 20L),
      // Genuinely new content.
      (5L, "sphinx of black quartz judge my vow tonight", "web", 21L),
      // Update of an existing key: newer ver must replace doc 2's row.
      (2L, "pack my box with five dozen liquor jugs now", "web", 22L))
      .toDF("doc_id", "text", "source", "ver")

    val flagged = Dedup.incrementalNearDups(
      corpus, batch.where(col("doc_id") > 3), "text", "doc_id", 16, 4)
    assert(flagged.collect().map(_.getLong(0)).toSeq == Seq(4L))

    val survivors = batch.join(flagged.select("doc_id"), Seq("doc_id"),
      "left_anti")
    Merge.upsertPartitioned(spark, store, survivors,
      keys = Seq("doc_id"), orderCol = "ver", partCol = "source")

    val out = spark.read.parquet(store)
      .select("doc_id", "ver").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 and 3 untouched, 2 updated to ver 22, 5 inserted, 4 never lands.
    assert(out == Map(1L -> 10L, 2L -> 22L, 3L -> 12L, 5L -> 21L))
  }
}
