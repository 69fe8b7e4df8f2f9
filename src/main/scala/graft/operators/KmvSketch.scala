package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed mergeable
  * `Aggregator` (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07):
  * keep the k smallest DISTINCT 32-bit hashes seen; if the k-th
  * smallest normalized hash is U, the stream held ≈ (k−1)/U distinct
  * values. The bounded-state alternative to exact COUNT(DISTINCT)
  * with two properties HLL (approx_count_distinct) lacks:
  *
  *  - **determinism**: built on the portable md5 hash
  *    ([[graft.functions.Portable.md5Hash32]]), the sketch and its
  *    estimate are bit-identical in any engine — the DuckDB oracle
  *    replays the whole pipeline value-exactly (qc_kmv), which no
  *    HLL register layout allows;
  *  - **set algebra**: k-min sets union by merge-and-truncate (this
  *    aggregator's `merge`), so per-partition / per-day partials
  *    combine associatively like any algebraic aggregate — and
  *    intersection sizes estimate from merged sketches
  *    (|A∩B| ≈ Jaccard-over-merged-kmins · |A∪B|) without re-reading
  *    either input.
  *
  * State is a sorted ascending list of ≤ k distinct hashes — O(k)
  * per partial buffer regardless of input size; duplicates are
  * absorbed by the distinct insert, so the input needs NO pre-distinct
  * (no exploded-postings shuffle: partials combine map-side and only
  * ≤ k-entry states cross the wire). Exactness guarantee: while fewer
  * than k distinct hashes exist the sketch holds ALL of them and
  * [[KmvSketch.estimate]] returns the exact count.
  */
class KmvSketch(k: Int)
    extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k > 1, "k must exceed 1 (the estimator divides by the k-th min)")

  override def zero: List[Long] = Nil

  /** Insert h keeping the state sorted, distinct, and ≤ k entries. */
  override def reduce(b: List[Long], h: Long): List[Long] =
    if (b.lengthCompare(k) >= 0 && h >= b.last) b
    else {
      val (lo, hi) = b.span(_ < h)
      if (hi.headOption.contains(h)) b
      else (lo ::: h :: hi).take(k)
    }

  override def merge(a: List[Long], b: List[Long]): List[Long] = {
    // Merge two sorted distinct lists, truncate to k — the k-min set
    // of a union is the k-min of the merged k-min sets.
    val out = List.newBuilder[Long]
    var (x, y) = (a, b)
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      val takeX = y.isEmpty || (x.nonEmpty && x.head <= y.head)
      val h = if (takeX) x.head else y.head
      if (takeX) x = x.tail
      if (!takeX || (y.nonEmpty && y.head == h)) y = y.dropWhile(_ == h)
      out += h
      n += 1
    }
    out.result()
  }

  override def finish(b: List[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KmvSketch {

  /** Untyped-DataFrame entry: `df.groupBy(...).agg(kmins(64)(hashCol))`
    * where `hashCol` is a portable 32-bit hash (md5Hash32). Result is
    * the sorted ascending k-min hash array. */
  def kmins(k: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvSketch(k), Encoders.scalaLong)

  /** Unbiased KMV estimator: exact size while the sketch is partial
    * (< k entries — every distinct hash is present), else
    * (k−1)·2³²/h₍ₖ₎ for 32-bit hashes normalized over [0, 2³²). */
  def estimate(kmins: Seq[Long], k: Int): Double =
    if (kmins.size < k) kmins.size.toDouble
    else (k - 1).toDouble * 4294967296.0 / kmins.last.toDouble
}
