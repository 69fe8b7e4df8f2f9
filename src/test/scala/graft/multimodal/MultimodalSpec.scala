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

  test("dhash64: identical bytes hash identically, local edits flip few bits") {
    val s = spark
    import s.implicits._
    val base = ("x" * 300 + "y" * 300 + "z" * 300).getBytes("UTF-8")
    val edited = base.clone(); edited(450) = 'q'.toByte // one mid-signal byte
    val media = Seq(
      Multimodal.MediaRecord(1L, "blob/a", base, base.length.toLong),
      Multimodal.MediaRecord(2L, "blob/a", base.clone(), base.length.toLong),
      Multimodal.MediaRecord(3L, "blob/a", edited, edited.length.toLong)
    ).toDS()
    val h = Multimodal.dhash64(media).collect().sortBy(_.doc_id)
    def ham(a: Multimodal.MediaDhash, b: Multimodal.MediaDhash): Int =
      java.lang.Long.bitCount(a.dhash_lo ^ b.dhash_lo) +
        java.lang.Long.bitCount(a.dhash_hi ^ b.dhash_hi)
    assert(ham(h(0), h(1)) == 0)          // exact dup
    assert(ham(h(0), h(2)) <= 4)          // one byte -> few gradient bits
    // Halves are unsigned 32-bit values.
    assert(h.forall(x => x.dhash_lo >= 0 && x.dhash_lo < (1L << 32)))
    assert(h.forall(x => x.dhash_hi >= 0 && x.dhash_hi < (1L << 32)))
    // Partitioning does not change the hash.
    val again = Multimodal.dhash64(media.repartition(3)).collect().sortBy(_.doc_id)
    assert(again.toSeq == h.toSeq)
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

  test("decoder seam: a custom MediaDecoder drops in at the call site") {
    // A "codec" that reports fixed geometry and a constant signal —
    // swapping it in is one object, zero edits to Multimodal.
    object FixedDecoder extends MediaDecoder {
      def geometry(content: Array[Byte], nBytes: Long) = (640L, 480L, 2L)
      def dhashSignal(content: Array[Byte], n: Int): Array[Long] =
        Array.fill(n)(7L)
      def frameBytes(docId: Long, idx: Long, content: Array[Byte]) =
        Array[Byte](idx.toByte)
    }
    val media = Multimodal.asMedia(Tables.load(spark, dir, "documents"))
    val feats = Multimodal.extractFeatures(media, FixedDecoder).head()
    assert(feats.width == 640L && feats.height == 480L
      && feats.n_frames == 2L && feats.resized_w == 32L)
    // Flat signal → no gradient bit ever set.
    val h = Multimodal.dhash64(media, FixedDecoder).head()
    assert(h.dhash_lo == 0L && h.dhash_hi == 0L)
    // Every asset yields exactly the decoder's frame count, and frame
    // hashes come from the decoder's frame bytes (same for all docs).
    val frames = Multimodal.sampleFrames(media, FixedDecoder).toDF()
    val perDoc = frames.groupBy("doc_id").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(perDoc == Seq(2L))
    assert(frames.select("frame_hash").distinct().count() == 2)
    // The default path is unchanged: stub geometry still rules.
    val stub = Multimodal.extractFeatures(media).head()
    assert(stub.width == 1L + stub.byte_sum % 64)
  }

  test("banded phash candidates: pigeonhole recall + subset of all-pairs") {
    import graft.queries.MultimodalQueries
    val all = MultimodalQueries.qmPhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val banded = MultimodalQueries.bandedCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val allSet = all.map(t => (t._1, t._2)).toSet
    // Precision: every banded candidate is a true hamming<=16 pair from
    // the same media-type block — banding only PRUNES, never invents.
    assert(banded.forall(t => t._3 <= 16 && allSet((t._1, t._2))))
    // Pigeonhole recall: <=3 differing bits cannot touch all four
    // 16-bit bands, so every hamming<=3 pair MUST be recalled.
    val close = all.filter(_._3 <= 3).map(t => (t._1, t._2)).toSet
    val bandedSet = banded.map(t => (t._1, t._2)).toSet
    assert(close.subsetOf(bandedSet))
    // Cluster build consumes the banded edges: every cluster with >1
    // member must be connected by banded candidates only.
    val clusters = MultimodalQueries.qmPhashClusters(spark, dir).collect()
    val multi = clusters.filter(_.getLong(1) > 1L)
    val touched = bandedSet.flatMap(t => Seq(t._1, t._2))
    assert(multi.forall(r => touched(r.getLong(0))))
  }
}
