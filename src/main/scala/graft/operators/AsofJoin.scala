package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** As-of (point-in-time) join: each left row picks up the value columns
  * of the closest right row with the same key — `backward` (latest
  * right at or before left time, the default and the standard
  * enrichment of an event stream with the most recent dimension state),
  * `forward` (earliest right at or after), or `nearest` (closer of the
  * two, ties to backward), optionally bounded by a tolerance — the
  * full pandas `merge_asof` direction surface.
  *
  * Spark has no native as-of join; rather than a custom physical
  * operator, this composes one from primitives that scale:
  * union-by-name the two sides with a side tag, then one window pass
  * per key ordered by (time, tag) taking the last non-null right value
  * — a SINGLE shuffle on the key, no range-join explosion, no
  * broadcast requirement on either side. Right rows sort before left
  * rows at equal timestamps, so matches are inclusive on both
  * directions. `nearest` runs a second window over the SAME key
  * partitioning (one extra sort, zero extra shuffles — AQE reuses the
  * exchange).
  *
  * Right rows must be unique per (key, time) — pre-aggregate otherwise
  * (ties would be nondeterministic in any engine).
  */
object AsofJoin {

  /** @param rightValues right columns to carry onto left rows (null when
    *                    no right row matches the direction/tolerance)
    * @param direction   "backward" (default), "forward", or "nearest"
    * @param toleranceUs max |right − left| time distance in
    *                    microseconds; matches farther away become null.
    *                    Requires timestamp time columns (as does
    *                    "nearest", which must measure distance). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[String],
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown direction '$direction'")
    val needsDt = direction == "nearest" || toleranceUs.nonEmpty
    if (needsDt) {
      require(left.schema(leftTime).dataType == TimestampType &&
        right.schema(rightTime).dataType == TimestampType,
        "nearest/tolerance need timestamp time columns")
    }
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    // All right values travel as ONE struct (with the right time, for
    // distance checks): last(ignoreNulls) must pick the latest right
    // ROW atomically. Filling columns independently would backfill a
    // null field of the matched row from an older row — emitting a
    // combination that never existed.
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
      struct((rightTime +: rightValues).distinct.map(col): _*).as("__rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Backward scan: right rows at equal time sort first → inclusive <=.
    val wb = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward scan: descending time, right first at equal time → >=.
    val wf = Window.partitionBy("__k")
      .orderBy(col("__t").desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dtOf(rv: Column): Column =
      abs(unix_micros(rv.getField(rightTime)) - unix_micros(col("__t")))
    def withinTol(rv: Column): Column = toleranceUs match {
      case Some(tol) => when(rv.isNotNull && dtOf(rv) <= tol, rv)
      case None => rv
    }
    val matched = direction match {
      case "backward" =>
        unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(wb))
      case "forward" =>
        unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(wf))
      case "nearest" =>
        val both = unioned
          .withColumn("__rvb", last(col("__rv"), ignoreNulls = true).over(wb))
          .withColumn("__rvf", last(col("__rv"), ignoreNulls = true).over(wf))
        both.withColumn("__rv",
          when(col("__rvb").isNull, col("__rvf"))
            .when(col("__rvf").isNull, col("__rvb"))
            // Tie goes backward (<=, matching the inclusive default).
            .when(dtOf(col("__rvb")) <= dtOf(col("__rvf")), col("__rvb"))
            .otherwise(col("__rvf")))
          .drop("__rvb", "__rvf")
    }
    matched
      .withColumn("__rv", withinTol(col("__rv")))
      .where(col("__tag") === 1)
      .select(left.columns.map(col) ++
        rightValues.map(c => col("__rv").getField(c).as(c)): _*)
  }
}
