package graft

import org.apache.spark.sql.functions._

/** The one-time compaction path in [[Tables.load]]: a gated table
  * backed by a big single-row-group file is re-laid to scratch ONCE
  * (restoring scan parallelism for every later read) and the cached
  * copy is keyed by a file fingerprint, so a rewritten source is never
  * served stale. */
class TablesRelayoutSpec extends SparkSpec {

  private val dir = "/tmp/graft_relayout_fixture"

  /** One snappy-resistant single file comfortably past the 8 MB
    * relayout threshold (md5 hex ~halves under compression, so ~48 MB
    * raw text → well past it). */
  private def writeBigDocuments(rows: Int, salt: String): Unit = {
    val s = spark
    import s.implicits._
    (1 to rows).toDF("doc_id")
      .withColumn("text", concat_ws("", (0 until 12).map(i =>
        md5(concat(lit(salt), col("doc_id"), lit(i)))): _*))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("big single-file gated table is re-laid once, cached, and " +
      "refreshed when the source changes") {
    val rows = 120000
    writeBigDocuments(rows, "a")
    // One file, one row group (default row-group size is 128 MB): the
    // shape whose planning SPLITS look parallel but whose scan is
    // serial — exactly what the footer-based gate must catch.
    assert(spark.read.parquet(s"$dir/documents.parquet")
      .inputFiles.length == 1)

    val target = spark.sparkContext.defaultParallelism
    val loaded = Tables.load(spark, dir, "documents")
    assert(loaded.rdd.getNumPartitions >= target / 2,
      "relayout must restore scan parallelism")
    assert(loaded.count() == rows)
    val relaidFiles = loaded.inputFiles.toSet
    assert(relaidFiles.nonEmpty &&
      relaidFiles.forall(_.contains("graft_relayout")),
      s"expected scratch-relaid files, got $relaidFiles")

    // Second load serves the SAME materialization — no second write.
    assert(Tables.load(spark, dir, "documents").inputFiles.toSet
      == relaidFiles)

    // Rewriting the source changes the fingerprint: the stale copy must
    // not be served (the r7 lesson — tests and drivers DO rewrite
    // fixture paths in place).
    writeBigDocuments(rows / 2, "b")
    val reloaded = Tables.load(spark, dir, "documents")
    assert(reloaded.count() == rows / 2)
    assert(reloaded.inputFiles.toSet != relaidFiles)
  }
}
