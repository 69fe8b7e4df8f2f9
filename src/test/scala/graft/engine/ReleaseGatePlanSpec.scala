package graft.engine

import graft.SparkSpec

/** Runs the bundled `examples/release_gate_plan.json` end-to-end: the
  * release-sign-off workflow — PSI drift gate between two batches, the
  * order-independent corpus fingerprint, and a deterministic
  * per-source review sample — all from the shipped JSON. */
class ReleaseGatePlanSpec extends SparkSpec {

  test("the bundled release-gate plan runs green on the test corpus") {
    val plan = PlanParser.parseFile("examples/release_gate_plan.json",
      variables = Map("sfdir" -> "/root/testdata/sf0.001"))
    val result = new PlanRunner(spark).run(plan, reportKey = "release_gate")
    // Two batches from the same generator: the drift gate passes.
    assert(result.exitCode == 0, result.reports.toString)
    val byKey = result.reports.toMap
    val drift = byKey("length_drift").head
    assert(!drift.failed)
    assert(drift.summaryStats("psi_total").asInstanceOf[Double] < 0.25)
    // The fingerprint is a nonzero base-10 integer string.
    val checksum = byKey("corpus_fingerprint").head
      .summaryStats("checksum").asInstanceOf[String]
    assert(checksum.matches("[0-9]+") && checksum != "0")
    // k = 2 per source stratum, 20 sources in the corpus.
    assert(result.outputs("review_sample").count() == 40)
    // The per-bin drift frame is available downstream.
    assert(result.outputs("length_drift").columns.contains("psi"))
  }
}
