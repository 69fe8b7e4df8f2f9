package graft.multimodal

import org.apache.spark.sql.types._
import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("media records carry opaque binary content + typed metadata") {
    val media = Multimodal.asMedia(Tables.load(spark, dir, "documents"))
    val schema = media.schema
    assert(schema("content").dataType == BinaryType)
    assert(schema("n_bytes").dataType == LongType)
    val r = media.head()
    assert(r.content.length.toLong == r.n_bytes)
    assert(new String(r.content, "UTF-8").nonEmpty)
  }

  test("fixed chunking covers every char once, last chunk ragged") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a" * 10), (2L, "b" * 4), (3L, "c" * 8), (4L, ""))
      .toDF("doc_id", "text")
    val out = Multimodal.fixedChunks(docs, "text", "doc_id", 4)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_len")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 4), (1L, 1L, 4), (1L, 2L, 2), // 10 = 4+4+2 (ragged tail)
      (2L, 0L, 4),                           // exact multiple: one chunk
      (3L, 0L, 4), (3L, 1L, 4)))             // doc 4 (empty): NO chunks
  }

  test("feature extraction is partition-local and deterministic") {
    val media = Multimodal.asMedia(Tables.load(spark, dir, "documents"))
    val feats = Multimodal.extractFeatures(media.repartition(7))
    // Repartitioning upstream must not change any feature value.
    val again = Multimodal.extractFeatures(media.repartition(3))
    assert(feats.collect().sortBy(_.doc_id).toSeq ==
      again.collect().sortBy(_.doc_id).toSeq)
    val f = feats.filter(_.doc_id == 0L).head()
    assert(f.width >= 1 && f.width <= 64)
    assert(f.resized_w <= 32 && f.resized_h <= 32)
    assert(f.content_md5.length == 32)
  }

  test("binaryFile source ingests raw files into the media pipeline") {
    val base = java.nio.file.Paths.get("/tmp/graft_binfiles")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    java.nio.file.Files.createDirectories(base)
    val payloads = Map("one.img" -> Array[Byte](1, 2, 3, 4),
      "two.wav" -> Array[Byte](9, 8, 7, 6, 5))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(base.resolve(name), bytes)
    }
    val media = Multimodal.fromBinaryFiles(spark, s"$base/*")
    val rows = media.collect().sortBy(_.n_bytes)
    assert(rows.length == 2)
    assert(rows.map(_.media_type).toSet == Set("file/img", "file/wav"))
    assert(rows.head.content.toSeq == payloads("one.img").toSeq)
    assert(rows.head.n_bytes == 4 && rows(1).n_bytes == 5)
    // The ingested records flow straight into feature extraction.
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 2)
    assert(feats.forall(_.content_md5.length == 32))
  }
}
