package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** QC bootstrap: derive a candidate assertion plan FROM the data — the
  * cold-start answer to "we have a 10,000-column lake and no rules yet".
  * One profiling pass per table computes, per column, the facts a human
  * rule author would look at (observed null rate, exact p1/p99 bounds,
  * distinct cardinality), and [[rules]] turns them into [[Rule]]s:
  *
  *  - numeric columns → a widened [p1, p99] range rule (the widening
  *    margin keeps ordinary tail growth from paging; the rule's
  *    threshold gets the observed out-of-range rate, so the suggested
  *    plan is self-consistent — it PASSES on the data it was learned
  *    from, by construction, and fires only when the distribution
  *    moves);
  *  - low-cardinality string columns → an IN-set membership rule over
  *    the observed values (the classic enum-drift alarm);
  *  - never-null columns → an IS NOT NULL rule (threshold 0).
  *
  * Suggestions are a REVIEW artifact, not policy: emit them, read them,
  * check them in. Scale: a handful of combinable aggregates per audited
  * column (a bounded, human-curated list — this is a bootstrap tool,
  * not a per-query operator); numerics use exact percentile (swap in
  * approx_percentile at 100 TB — same contract, documented tolerance);
  * enum sets are capped at maxEnum + 1 collected values, so the driver
  * never holds an unbounded set. */
object RuleSuggest {

  /** Per-column suggestion facts, the structured form behind [[rules]]. */
  case class Suggestion(
      column: String,
      kind: String, // "range" | "enum" | "not_null"
      lo: Option[Double],
      hi: Option[Double],
      values: Seq[String],
      nullFrac: Double,
      threshold: Double)

  /** Learn suggestions from `df`. `margin` widens the numeric band
    * fractionally on each side; `maxEnum` caps enum-set cardinality. */
  def suggest(df: DataFrame, columns: Seq[String], margin: Double = 0.05,
      maxEnum: Int = 20): Seq[Suggestion] = {
    val total = df.count()
    if (total == 0) return Seq.empty
    val byName = df.schema.fields.map(f => f.name -> f).toMap
    columns.flatMap { c =>
      val f = byName.getOrElse(c,
        throw new IllegalArgumentException(s"no such column: $c"))
      val nNull = df.where(col(c).isNull).count()
      val nullFrac = nNull.toDouble / total
      f.dataType match {
        case _: NumericType =>
          val r = df.where(col(c).isNotNull)
            .agg(expr(s"percentile($c, 0.01)").as("p1"),
              expr(s"percentile($c, 0.99)").as("p99")).head()
          if (r.isNullAt(0)) None // all-NULL column: nothing to learn
          else {
            val (p1, p99) = (r.getDouble(0), r.getDouble(1))
            val span = math.max(p99 - p1, math.max(math.abs(p1), 1.0) * 1e-9)
            val (lo, hi) = (p1 - margin * span, p99 + margin * span)
            val outRate = df.where(col(c).isNotNull &&
              (col(c) < lo || col(c) > hi)).count().toDouble / total
            Some(Suggestion(c, "range", Some(lo), Some(hi), Nil, nullFrac,
              outRate))
          }
        case _: StringType =>
          val nd = df.select(c).na.drop().distinct()
          val vals = nd.limit(maxEnum + 1).collect().map(_.getString(0))
          if (vals.nonEmpty && vals.length <= maxEnum)
            Some(Suggestion(c, "enum", None, None, vals.sorted.toSeq,
              nullFrac, 0.0))
          else if (vals.nonEmpty && nullFrac == 0.0)
            Some(Suggestion(c, "not_null", None, None, Nil, 0.0, 0.0))
          else None // all-NULL, or high-cardinality with nulls
        case _ =>
          if (nullFrac == 0.0)
            Some(Suggestion(c, "not_null", None, None, Nil, 0.0, 0.0))
          else None
      }
    }
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Render suggestions as runnable [[Rule]]s (self-consistent on the
    * learning data: thresholds carry the observed violation rates). */
  def rules(suggestions: Seq[Suggestion]): Seq[Rule] = suggestions.map {
    case Suggestion(c, "range", Some(lo), Some(hi), _, nullFrac, thr) =>
      Rule(
        query = s"$c IS NULL OR ($c >= $lo AND $c <= $hi)",
        description = s"suggested range for $c (widened p1..p99)",
        // The observed out-of-band rate plus an epsilon: self-consistent
        // on the learning data, fires on any further tail growth.
        threshold = thr + 1e-9)
    case Suggestion(c, "enum", _, _, values, _, _) =>
      Rule(
        query = s"$c IS NULL OR $c IN (${values.map(sqlStr).mkString(", ")})",
        description = s"suggested enum membership for $c",
        threshold = 1e-9)
    case Suggestion(c, "not_null", _, _, _, _, _) =>
      Rule(
        query = s"$c IS NOT NULL",
        description = s"suggested non-null for $c",
        threshold = 1e-9)
    case s => throw new IllegalStateException(s"unrenderable: $s")
  }
}
