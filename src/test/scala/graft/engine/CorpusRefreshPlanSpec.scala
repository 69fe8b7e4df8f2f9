package graft.engine

import graft.SparkSpec

/** Runs the bundled `examples/corpus_refresh_plan.json` end-to-end: the
  * incremental corpus-update workflow — incoming batch vs existing
  * corpus PSI drift gate, dedup of the union with a never-invents /
  * drop-budget assertion pair, per-source largest-doc review panel on
  * the custom top-k operator, and the refreshed corpus fingerprint —
  * all from the shipped JSON. */
class CorpusRefreshPlanSpec extends SparkSpec {

  test("the bundled corpus refresh plan runs green on the test corpus") {
    val plan = PlanParser.parseFile("examples/corpus_refresh_plan.json",
      variables = Map("sfdir" -> "/root/testdata/sf0.001"))
    val result = new PlanRunner(spark).run(plan, reportKey = "corpus_refresh")
    assert(result.exitCode == 0, result.reports.toString)
    val before = result.outputs("combined").count()
    val after = result.outputs("refreshed_corpus").count()
    assert(after > 0 && after <= before)
    // The refresh-stats view agrees with the frames it summarizes.
    val stats = result.outputs("refresh_stats").collect()(0)
    assert(stats.getLong(0) == before && stats.getLong(1) == after)
    // Review panel: at most 3 docs per source, from the incoming batch.
    val review = result.outputs("review_largest")
    assert(review.groupBy("source").count()
      .where("count > 3").isEmpty)
    assert(review.where("doc_id % 3 <> 0").isEmpty)
    // Fingerprint report exists with a checksum value.
    assert(result.outputs("refreshed_fingerprint").count() == 1)
  }
}
