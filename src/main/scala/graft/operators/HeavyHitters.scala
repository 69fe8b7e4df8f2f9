package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed mergeable `Aggregator`:
  * the bounded-memory swap-in for exact value counting when the column's
  * cardinality is unbounded (URLs, user ids, raw tokens at 100 TB —
  * where groupBy-count's shuffle keys explode and exact top-k needs a
  * full pass it can't afford).
  *
  * State is ≤ `capacity` (value → counter) entries, O(capacity) per
  * partial buffer regardless of input size. Combining is the
  * summed-merge + (capacity+1)-th-largest decrement of Agarwal et al.
  * ("Mergeable Summaries"), which preserves the MG error bound across
  * any merge tree, so map-side combine works exactly like an algebraic
  * aggregate. Guarantees (pinned in HeavyHittersSpec):
  *  - estimate(v) ∈ [true(v) − n/(capacity+1), true(v)] for every v;
  *  - every value with true frequency > n/(capacity+1) SURVIVES in the
  *    sketch (no false negatives above the threshold);
  *  - with capacity ≥ distinct-count the sketch IS the exact counts
  *    (decrements never trigger) — the property the oracle-checked
  *    qe_topk_sketch query exploits.
  *
  * Output: (value, count) pairs sorted by estimated count descending,
  * value ascending — deterministic regardless of merge order.
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    b.get(v) match {
      case Some(c) => b.updated(v, c + 1)
      case None if b.size < capacity => b.updated(v, 1L)
      case None =>
        // Full and v absent: decrement all, drop zeros (v is absorbed).
        b.iterator.collect { case (k, c) if c > 1 => (k, c - 1) }.toMap
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // Subtract the (capacity+1)-th largest counter from every entry;
      // ≤ capacity entries stay positive, and the subtraction is
      // exactly `cut` stacked MG decrements, so the error bound holds.
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(capacity)
      summed.iterator.collect {
        case (k, c) if c > cut => (k, c - cut)
      }.toMap
    }
  }

  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (v, c) => (-c, v) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder()
}

object HeavyHitters {
  /** UDAF form for untyped DataFrames:
    * `df.groupBy(...).agg(topValues(16)(col("event_type")))` — the
    * result is an array of (value, estimated count) structs sorted by
    * count desc. */
  def topValues(capacity: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HeavyHitters(capacity),
      Encoders.STRING)
}
