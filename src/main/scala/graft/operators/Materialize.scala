package graft.operators

import org.apache.spark.sql.DataFrame

/** Distributed one-shot materialization for frames with MULTIPLE
  * consumers: without it, each consumer re-evaluates the whole
  * upstream plan (a per-key rollup, a dedup manifest, a rank stage) —
  * the silent N× re-computation class that turned qe_rfm's 0.26 s
  * into 13 s before round 10 caught it. `localCheckpoint(eager =
  * false)`: blocks persist on executors when the first consuming job
  * computes them (no job at plan-construction time), later consumers
  * read blocks, and lineage truncates so stacked stages keep
  * constant-size plans.
  *
  * The `spark.graft.materialize=false` escape hatch (set ONLY by
  * PlanAudit) skips the checkpoint so the full upstream lineage stays
  * visible to plan inspection — the checkpoint otherwise collapses
  * the visible plan to a LogicalRDD scan. Never unset it for real
  * execution.
  */
object Materialize {
  def once(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .get("spark.graft.materialize", "true").toBoolean)
      df.localCheckpoint(eager = false)
    else df
}
