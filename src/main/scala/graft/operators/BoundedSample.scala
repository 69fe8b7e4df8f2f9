package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic per-group sample as a typed `Aggregator`: keeps the
  * `k` ids with the smallest md5("seed:id") — the SAME selection rule
  * as [[Sampling.stratifiedTopK]]'s window form (proven equal in
  * BoundedSampleSpec), but with O(k) MERGEABLE state per group instead
  * of ranking every row of the stratum:
  *
  *  - the window form shuffles every row to its stratum and sorts —
  *    right when the sample is consumed next to other windowed stats;
  *  - this form combines partial top-k buffers map-side like any
  *    algebraic aggregate, so a billion-row stratum moves only
  *    ≤ k·partitions buffer entries — the per-group "show me 10
  *    example rows" at 100 TB, where collect_list would OOM and a
  *    window sort pays a full shuffle.
  *
  * The hash makes it order-independent (any partitioning, any merge
  * tree → same sample), unlike true reservoir sampling whose result
  * depends on encounter order.
  */
class BoundedSample(k: Int, seed: String)
    extends Aggregator[Long, List[(String, Long)], Seq[Long]] {
  require(k > 0, "k must be positive")

  private def hash(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$id".getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  override def zero: List[(String, Long)] = Nil

  override def reduce(b: List[(String, Long)], id: Long): List[(String, Long)] =
    ((hash(id), id) :: b).sorted.take(k)

  override def merge(a: List[(String, Long)],
      b: List[(String, Long)]): List[(String, Long)] =
    (a ++ b).sorted.take(k)

  override def finish(b: List[(String, Long)]): Seq[Long] =
    b.sorted.map(_._2)

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder()
}

object BoundedSample {
  /** Typed-column form for the `Dataset` API ONLY — the input encoder
    * binds to `Dataset[Long]` values, so use it after `groupByKey`:
    * `ds.groupByKey(_.key).mapValues(_.id).agg(sampleIds(k))`.
    * For untyped `DataFrame.groupBy(...).agg(...)` use [[sampleIdsUdf]]
    * (a registered UDAF over an id column) — the typed column would
    * fail to bind against Row-encoded input at runtime. */
  def sampleIds(k: Int, seed: String = "sample")
      : org.apache.spark.sql.TypedColumn[Long, Seq[Long]] =
    new BoundedSample(k, seed).toColumn

  /** UDAF form for untyped DataFrames:
    * `df.groupBy("source").agg(sampleIdsUdf(5)(col("doc_id")))`. */
  def sampleIdsUdf(k: Int, seed: String = "sample")
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedSample(k, seed),
      Encoders.scalaLong)
}
