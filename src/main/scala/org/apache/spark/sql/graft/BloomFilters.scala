package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-level access to Spark's internal Bloom-filter expressions —
  * the same `BloomFilterAggregate` / `BloomFilterMightContain` pair the
  * optimizer injects for runtime join filters, exposed here for
  * explicit use (approximate blocklist joins). Lives under
  * `org.apache.spark.sql` because the expressions and the
  * Column↔Expression bridge are `private[sql]`.
  */
object BloomFilters {

  /** Aggregate a column's values into a serialized Bloom filter
    * (binary). Values are hashed with XxHash64, matching
    * [[mightContain]]. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(new XxHash64(Seq(ExpressionUtils.expression(c))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** True when `c` is possibly in the Bloom filter `bloom` (bytes from
    * [[bloomAgg]]); false means definitely absent. */
  def mightContain(bloom: Column, c: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(ExpressionUtils.expression(bloom),
        new XxHash64(Seq(ExpressionUtils.expression(c)))))
}
