package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) via the sorted-staircase window — the
  * multi-criteria "best tradeoffs" operator (SKYLINE OF in classic OLAP
  * engines), maximizing both criteria.
  *
  * A 2-D skyline needs no O(n²) dominance self-join: sort each group by
  * (x DESC, y DESC, key) and keep rows whose y strictly exceeds the
  * running max of all preceding rows. The y in the secondary sort key
  * makes equal-x groups scan best-first, so a row dominated by an
  * equal-x higher-y peer is correctly dropped; an exactly-equal (x, y)
  * pair keeps only the lowest key (the documented tie rule — a skyline
  * wants one representative per coincident point, and the key makes the
  * choice deterministic). Equivalence with the brute-force dominance
  * scan (including the tie rule) is pinned by SkylineSpec.
  *
  * Scale: one hash shuffle on the group key + one in-partition sort —
  * the same cost as any windowed aggregate; no join, no pair grid. Use
  * exact sort keys (integers/DECIMAL, not float sums) so the staircase
  * order is deterministic.
  */
object Skyline {

  /** Rows of `df` on the per-`group` Pareto frontier, maximizing both
    * `x` and `y`; `key` breaks exact (x, y) ties (lowest kept). */
  def skyline2D(df: DataFrame, group: String, key: String,
      x: String, y: String): DataFrame = {
    val stair = Window.partitionBy(group)
      .orderBy(col(x).desc, col(y).desc, col(key))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__sky_pm", max(col(y)).over(stair))
      .where(col("__sky_pm").isNull || col(y) > col("__sky_pm"))
      .drop("__sky_pm")
  }
}
