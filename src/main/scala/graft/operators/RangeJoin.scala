package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-key + time-range join: match each point row (key, timestamp) to
  * every interval row (key, startDate, startDate + lengthDays) covering
  * its timestamp — "events within N days of the order", the standard
  * attribution/feature-window join.
  *
  * A naive formulation is an equi-join on the key with a range
  * predicate, which concentrates all of a key's points and intervals in
  * one task and degenerates to a per-key cross product (hot keys at
  * 100 TB: one straggler holds the whole join). Instead the interval
  * side replicates into its covered DAY BINS (a bounded lengthDays-way
  * fan-out, known at plan time) and the join becomes a plain equi-join
  * on (key, day) — co-partitioned by the shuffle, skew-splittable by
  * AQE, with the exact range predicate applied as a cheap residual
  * filter. Bin fan-out is the classic interval-bucketing trade: shuffle
  * volume grows by lengthDays, per-task work drops from O(points ×
  * intervals) per key to O(collisions) per (key, day).
  */
object RangeJoin {

  private val BinCol = "__graft_range_day"

  /** Inner-join `points` to `intervals` where
    * `points.pointKey == intervals.intervalKey` and `pointTs` falls in
    * `[intervalStart, intervalStart + lengthDays)` (date-boundary
    * inclusive start, exclusive end). Output columns: all interval
    * columns followed by all point columns — rename shared names on one
    * side first if downstream code selects them unqualified.
    */
  def pointsInInterval(points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      pointTs: String, intervalStart: String,
      lengthDays: Int): DataFrame = {
    require(lengthDays > 0, s"lengthDays must be positive, got $lengthDays")
    // withColumn would silently OVERWRITE a caller column of the
    // internal bin name and leak the synthetic day into the output.
    // Case-insensitive: withColumn replaces case-insensitively under the
    // default spark.sql.caseSensitive=false.
    require(!points.columns.exists(_.equalsIgnoreCase(BinCol)) &&
      !intervals.columns.exists(_.equalsIgnoreCase(BinCol)),
      s"input frames must not contain the reserved column $BinCol")
    // Explicit side aliases: both frames may derive from the SAME source
    // (self-attribution joins), where unqualified refs are ambiguous.
    val binned = intervals.withColumn(BinCol,
      explode(transform(sequence(lit(0), lit(lengthDays - 1)),
        d => date_add(col(intervalStart), d))))
      .alias("__ivl")
    val pts = points.withColumn(BinCol, to_date(col(pointTs))).alias("__pt")
    binned.join(pts,
      col(s"__ivl.$BinCol") === col(s"__pt.$BinCol") &&
        col(s"__ivl.$intervalKey") === col(s"__pt.$pointKey") &&
        col(s"__pt.$pointTs") >= col(s"__ivl.$intervalStart").cast("timestamp") &&
        col(s"__pt.$pointTs") <
          date_add(col(s"__ivl.$intervalStart"), lengthDays).cast("timestamp"))
      .select(intervals.columns.map(c => col(s"__ivl.$c")) ++
        points.columns.map(c => col(s"__pt.$c")): _*)
  }
}
