package graft.engine

import graft.SparkSpec

/** Runs the bundled `examples/corpus_qc_plan.json` end-to-end: the
  * TopNotch-parity plan engine driving LLM-corpus QC — content/lang/
  * length assertions over documents, a per-source dup-rate gate over an
  * aggregated view, and a metadata-reconciliation diff — all from the
  * shipped JSON, proving the example stays runnable as the engine
  * evolves. */
class CorpusPlanSpec extends SparkSpec {

  test("the bundled corpus QC plan runs green on the test corpus") {
    val plan = PlanParser.parseFile("examples/corpus_qc_plan.json",
      variables = Map("sfdir" -> "/root/testdata/sf0.001"))
    val result = new PlanRunner(spark).run(plan, reportKey = "corpus_qc")
    // Every rule within threshold on this corpus: exit 0.
    assert(result.exitCode == 0, result.reports.toString)
    // The dup-rate gate ran over the aggregated view (one row/source).
    assert(result.outputs("source_dup_rates").count() == 20)
    // n_chars always equals length(text) here, so the filtered diff
    // keeps nothing.
    assert(result.outputs("metadata_reconciliation").isEmpty)
    // The row-level assertion output frame exists for sampling.
    assert(result.outputs.contains("corpus_quality"))
    // The schema gate passed (all contract columns ok).
    assert(result.outputs("schema_report").where("status <> 'ok'").isEmpty)
    // Profile covers the three declared columns.
    assert(result.outputs("corpus_profile").count() == 3)
    // Dedup kept at most one row per distinct text, never more than input.
    val docs = result.outputs("docs").count()
    val deduped = result.outputs("deduped_corpus").count()
    assert(deduped <= docs && deduped > 0)
  }
}
