package graft.multimodal

/** The decode seam of the multimodal pipeline — SURVEY.md §2 item 35.
  *
  * Every operator in [[Multimodal]] consumes media content ONLY through
  * this interface, so dropping a real codec in (JNI JPEG/ffmpeg/libvips
  * behind a jar) means ADDING ONE CLASS and passing it at the call
  * site — no edits to Multimodal.scala, no plan change. Implementations
  * must be Serializable (they ride into task closures) and cheap to
  * reference per row; open expensive native contexts lazily per
  * PARTITION inside the implementation (e.g. a `@transient lazy val`
  * decoder handle), which is exactly where Multimodal's mapPartitions
  * boundaries run them.
  *
  * The default [[StubDecoder]] is the container's documented stand-in
  * (no codec jars ship in this sandbox): deterministic pseudo-geometry
  * and a 1-D byte signal. The oracles recompute its arithmetic, so the
  * stub is verifiable end-to-end; a real decoder changes the VALUES,
  * never the schema or the plan shape.
  */
trait MediaDecoder extends Serializable {

  /** Decoded geometry of one asset: (width, height, nFrames). */
  def geometry(content: Array[Byte], nBytes: Long): (Long, Long, Long)

  /** Geometry when the caller already holds the exact content byte
    * sum (extractFeatures computes it as a content stat anyway);
    * decoders whose pseudo-geometry derives from the byte signal (the
    * stub) reuse it instead of re-walking the bytes — a real codec
    * ignores the hint and decodes. */
  def geometry(content: Array[Byte], nBytes: Long, contentByteSum: Long)
      : (Long, Long, Long) = geometry(content, nBytes)

  /** The asset's perceptual signal resampled to `nSegments` sums —
    * what dHash's gradient bits compare. A real image decoder returns
    * brightness sums over a downsampled grid walked row-major; the
    * 1-D segmentation here is the same construction on the raw byte
    * signal. */
  def dhashSignal(content: Array[Byte], nSegments: Int): Array[Long]

  /** The bytes that identify frame `idx` of the asset (a real video
    * decoder returns the frame's pixel buffer; the stub a
    * deterministic token). Hashed by the frame-sampling operator. */
  def frameBytes(docId: Long, idx: Long, content: Array[Byte]): Array[Byte]
}

/** Deterministic stub (documented codec stand-in): geometry from byte
  * arithmetic, the dHash signal from equal byte segments, frame
  * identity from a `docId:idx` token. */
object StubDecoder extends MediaDecoder {

  private def byteSum(content: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < content.length) { s += content(i) & 0xff; i += 1 }
    s
  }

  override def geometry(content: Array[Byte], nBytes: Long)
      : (Long, Long, Long) =
    geometry(content, nBytes, byteSum(content))

  override def geometry(content: Array[Byte], nBytes: Long,
      contentByteSum: Long): (Long, Long, Long) =
    (1L + contentByteSum % 64, 1L + nBytes % 48, 1L + contentByteSum % 7)

  override def dhashSignal(content: Array[Byte], nSegments: Int)
      : Array[Long] = {
    val len = content.length.toLong
    val sums = new Array[Long](nSegments)
    var j = 0
    while (j < nSegments) {
      var i = j * len / nSegments
      val end = (j + 1) * len / nSegments
      var s = 0L
      while (i < end) { s += content(i.toInt) & 0xff; i += 1 }
      sums(j) = s
      j += 1
    }
    sums
  }

  override def frameBytes(docId: Long, idx: Long, content: Array[Byte])
      : Array[Byte] = s"$docId:$idx".getBytes("UTF-8")
}
