package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — SURVEY.md §2 item 35.
  *
  * Media assets are opaque `binary` columns + a typed metadata struct —
  * the layout a 100 TB training-data lake uses (content inline for small
  * assets; the same schema carries object-store pointers for large ones).
  * Decode / feature-extract / resize / frame-sample run per PARTITION:
  * the expensive decoder state is initialised once per partition, rows
  * stream through it, and Spark distributes partitions across executors.
  * No driver involvement, no shuffle — scale is linear in input splits.
  *
  * Decoding is factored behind the [[MediaDecoder]] trait (default:
  * the clearly-marked deterministic [[StubDecoder]] — this container
  * ships no image/audio codecs). Everything AROUND the decoder — the
  * binary schema, the typed Dataset boundary, per-partition init, the
  * feature schema — is the real production shape; swapping in e.g. a
  * JNI JPEG decoder is one new class passed at the call site, and
  * changes no plan topology.
  */
object Multimodal {

  /** One media asset: opaque content + typed metadata. */
  case class MediaRecord(doc_id: Long, media_type: String,
    content: Array[Byte], n_bytes: Long)

  /** Extracted features (stub geometry + exact content stats). */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
    byte_sum: Long, width: Long, height: Long, resized_w: Long,
    resized_h: Long, n_frames: Long, content_md5: String)

  /** Wrap the documents table as binary media records (UTF-8 bytes as
    * the opaque payload; `source` becomes the media type tag). */
  def asMedia(documents: DataFrame): Dataset[MediaRecord] = {
    import documents.sparkSession.implicits._
    documents.select(
      col("doc_id"),
      concat(lit("blob/"), col("source")).as("media_type"),
      col("text").cast("binary").as("content"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Ingest real files as media records via Spark's `binaryFile` source
    * — the production entry point for raw image/audio/video assets on
    * disk or object store (each file one row: path, length, content;
    * pushdown prunes by path/length, and `pathGlobFilter`-style options
    * apply upstream of the scan). Ids are deterministic 64-bit path
    * hashes (xxhash64 — a 32-bit id would birthday-collide within
    * ~80k files and silently merge distinct assets downstream); the
    * media type tag is the file extension. */
  def fromBinaryFiles(spark: org.apache.spark.sql.SparkSession,
      pathGlob: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        xxhash64(col("path")).as("doc_id"),
        // lower(): extensions are case-insensitive on most filesystems,
        // and 'a.JPG' vs 'a.jpg' must not split per-type aggregations.
        concat(lit("file/"),
          lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)))
          .as("media_type"),
        col("content"),
        col("length").cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** One sampled frame of a media asset (stub decode). */
  case class MediaFrame(doc_id: Long, frame_idx: Long, frame_hash: String)

  /** One-to-many frame sampling: each record expands to its stub frame
    * count (video decode shape — flatMap inside mapPartitions, decoder
    * initialised once per partition, output cardinality data-dependent).
    */
  def sampleFrames(media: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val nFrames = decoder.geometry(r.content, r.n_bytes)._3
        (0L until nFrames).map { f =>
          md5.reset()
          val hex = md5.digest(decoder.frameBytes(r.doc_id, f, r.content))
            .map("%02x".format(_)).mkString
          MediaFrame(r.doc_id, f, hex)
        }
      }
    }
  }

  /** Fixed-window segmentation — the audio/waveform batch shape: every
    * asset expands to ⌈len/window⌉ fixed-size chunks (last one ragged),
    * each independently hashable/embeddable downstream. Pure Column
    * expressions (generate + substring), so the expansion stays inside
    * codegen and needs no shuffle; cardinality is data-dependent exactly
    * like frame sampling. */
  def fixedChunks(documents: DataFrame, textCol: String, idCol: String,
      chunkChars: Int): DataFrame = {
    require(chunkChars > 0, s"chunkChars must be positive, got $chunkChars")
    val nChunks = ceil(length(col(textCol)) / lit(chunkChars.toDouble)).cast("long")
    // Empty text ⇒ nChunks = 0 ⇒ NO rows: sequence(0, -1) is a
    // DESCENDING [0, -1] in Spark, so the guard is load-bearing
    // (explode of the null branch emits nothing).
    val indices = when(nChunks > lit(0L), sequence(lit(0L), nChunks - 1))
    val chunk = col(textCol).substr(
      (col("chunk_idx") * chunkChars + 1).cast("int"), lit(chunkChars))
    documents
      .select(col(idCol), col(textCol), explode(indices).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        length(chunk).as("chunk_len"), md5(chunk).as("chunk_md5"))
  }

  /** Per-partition decode + feature extraction. */
  def extractFeatures(media: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition init: a real pipeline opens its native decoder
      // context here, once, not per row.
      val md5 = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        // byte_sum and content_md5 are exact CONTENT stats (decoder-
        // independent); geometry comes from the decode seam.
        var byteSum = 0L
        var i = 0
        while (i < r.content.length) { byteSum += r.content(i) & 0xff; i += 1 }
        val (width, height, nFrames) =
          decoder.geometry(r.content, r.n_bytes, byteSum)
        md5.reset()
        val hex = md5.digest(r.content).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes, byteSum,
          width, height, math.min(width, 32L), math.min(height, 32L),
          nFrames, hex)
      }
    }
  }

  /** 64-bit perceptual difference hash, split into two unsigned 32-bit
    * halves (sign-safe in any engine's BIGINT). */
  case class MediaDhash(doc_id: Long, media_type: String,
    dhash_lo: Long, dhash_hi: Long)

  /** Perceptual difference hash (dHash) of each asset: the content
    * resamples to 65 equal byte segments, and bit b is set when
    * segment b+1's sum exceeds segment b's — the gradient-over-
    * downsampled-signal construction real image dHash uses on a 9×8
    * brightness grid, applied here to the stub decoder's 1-D byte
    * signal (a codec swap changes only the sampling grid, not the
    * plan). Similar assets differ in few gradient bits, so near-dup
    * candidates are LOW-HAMMING pairs — the media-side counterpart of
    * SimHash for text. Per-partition streaming map; O(bytes) per row,
    * 16 bytes of hash out. */
  def dhash64(media: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaDhash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val sums = decoder.dhashSignal(r.content, 65)
        var lo = 0L
        var hi = 0L
        var b = 0
        while (b < 64) {
          if (sums(b + 1) > sums(b)) {
            if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
          }
          b += 1
        }
        MediaDhash(r.doc_id, r.media_type, lo, hi)
      }
    }
  }
}
