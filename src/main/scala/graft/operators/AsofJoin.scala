package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks up the value columns
  * of the LATEST right row with the same key and `rightTime <=
  * leftTime` — the standard enrichment of an event stream with the most
  * recent dimension state (prices, account status, model version).
  *
  * Spark has no native as-of join; rather than a custom physical
  * operator, this composes one from primitives that scale:
  * union-by-name the two sides with a side tag, then one window pass
  * per key ordered by (time, tag) taking the last non-null right value
  * — a SINGLE shuffle on the key, no range-join explosion, no
  * broadcast requirement on either side. Right rows sort before left
  * rows at equal timestamps, so the match is inclusive (`<=`).
  *
  * Right rows must be unique per (key, time) — pre-aggregate otherwise
  * (ties would be nondeterministic in any engine).
  */
object AsofJoin {

  /** @param rightValues right columns to carry onto left rows (null when
    *                    no right row precedes the left row's time) */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    // All right values travel as ONE struct: last(ignoreNulls) must pick
    // the latest right ROW atomically. Filling columns independently
    // would backfill a null field of the matched row from an older row —
    // emitting a combination that never existed.
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
      struct(rightValues.map(col): _*).as("__rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(left.columns.map(col) ++
        rightValues.map(c => col("__rv").getField(c).as(c)): _*)
  }
}
