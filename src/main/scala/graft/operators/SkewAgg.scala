package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for HOLISTIC aggregates over skewed
  * groups. Algebraic aggregates (sum/count/min/max) already combine
  * map-side, so group skew costs them little — but a holistic
  * aggregate like COUNT(DISTINCT v) must gather a hot group's entire
  * distinct-value set into one task, and at 100 TB the one group that
  * holds half the corpus OOMs that task.
  *
  * The fix is value-hash salting: pre-group by (keys, hash(v) mod S).
  * Every occurrence of the same value lands in the SAME salt bucket,
  * so per-bucket distinct sets are disjoint and their counts ADD —
  * the merged count is exact, never approximate. Per-task state drops
  * from |distinct(group)| to ~|distinct(group)|/S, and the hot group's
  * work spreads over S tasks. (Contrast [[SkewJoin]], which salts JOIN
  * keys; and approx_count_distinct, which trades exactness for a
  * sketch — this keeps exactness and bounds memory.)
  */
object SkewAgg {

  /** Exact per-group distinct count of `valueCol`, skew-spread over
    * `salts` buckets. Output: keys + `n_distinct`. */
  def countDistinctSalted(df: DataFrame, keys: Seq[String],
      valueCol: String, salts: Int = 32): DataFrame = {
    require(salts > 0, "salts must be positive")
    val keyCols: Seq[Column] = keys.map(col)
    df.select(keyCols :+ col(valueCol): _*)
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count_distinct(col(valueCol)).as("__d"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__d")).cast("bigint").as("n_distinct"))
  }

  /** Exact per-group collect-free heavy value count: rows of the
    * single most frequent value per group without collecting the
    * group's value list — (keys, value) counts then a max fold. The
    * holistic "mode weight" with algebraic shuffles only. Output:
    * keys + `max_value_count`. */
  def maxValueCountSalted(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.select(keyCols :+ col(valueCol): _*)
      .groupBy(keyCols :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keyCols: _*)
      .agg(max(col("__c")).cast("bigint").as("max_value_count"))
  }
}
