package graft.rules

import graft.SparkSpec

class RuleRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, 10.0, "a"),
    (2, -5.0, "b"),
    (3, 0.0, null.asInstanceOf[String]),
    (4, 100.0, "a")).toDF("id", "bal", "tag")

  private val rules = Seq(
    Rule("bal > 0", "balance positive", 0.1),
    Rule("tag IS NOT NULL", "tag present", 0.5))

  test("invalidRows flags rows failing any rule with joined reasons") {
    val out = RuleRunner.invalidRows(df, rules)
      .select("id", RuleRunner.ReasonCol).as[(Int, String)].collect().toMap
    assert(out === Map(
      2 -> "balance positive",
      3 -> "balance positive &&& tag present"))
  }

  test("null predicate result counts as invalid (consistently)") {
    val d = Seq((1, Some(5.0)), (2, None)).toDF("id", "v")
    val r = Seq(Rule("v > 0", "v positive", 0.0))
    assert(RuleRunner.invalidRows(d, r).select("id").as[Int].collect().toSeq === Seq(2))
    assert(RuleRunner.reports(d, r).head.numInvalid === 1)
  }

  test("reports computes all rules in one pass with thresholds") {
    val reps = RuleRunner.reports(df, rules)
    assert(reps.map(_.numInvalid) === Seq(2, 1))
    assert(reps.map(_.totalRows) === Seq(4, 4))
    assert(reps(0).fractionInvalid === 0.5)
    assert(reps(0).failed) // 0.5 > 0.1
    assert(!reps(1).failed) // 0.25 <= 0.5
  }

  test("features are available to rule queries and outputs") {
    val r = Seq(Rule("doubled < 100", "doubled small", 0.0,
      features = Map("doubled" -> "bal * 2")))
    val out = RuleRunner.invalidRows(df, r)
    assert(out.select("id").as[Int].collect().toSeq === Seq(4))
    assert(out.columns.contains("doubled"))
  }

  test("summary stats computed over invalid rows only") {
    val r = Rule("bal >= 0", "non-negative", 0.0,
      summary = Map("min_bal" -> "MIN(bal)", "n" -> "COUNT(*)"))
    val rep = RuleRunner.reports(df, Seq(r)).head
    assert(rep.summaryStats("min_bal") === -5.0)
    assert(rep.summaryStats("n") === 1L)
  }

  test("samples project to rule-referenced columns plus features") {
    val r = Rule("bal > 0 AND tag IS NOT NULL", "bal and tag ok", 0.0,
      features = Map("doubled" -> "bal * 2"))
    assert(RuleRunner.referencedColumns(r) === Seq("bal", "tag"))
    // Struct/qualified references surface their root name too.
    assert(RuleRunner.referencedColumns(Rule("meta.bal > 0", "d", 0.0))
      .contains("meta"))
    val sample = RuleRunner.samples(df, r)
    assert(sample.columns.toSet === Set("bal", "tag", "doubled")) // no id
    assert(sample.count() === 2) // rows 2 (bal<0) and 3 (null tag)
  }

  test("reports collect bounded samples when asked") {
    val reps = RuleRunner.reports(df, rules, collectSamples = true)
    assert(reps(0).sampleInvalid.map(_("bal")).toSet === Set("-5.0", "0.0"))
    assert(reps(1).sampleInvalid === Seq(Map("tag" -> "null")))
    // ...and stay empty (no extra jobs) by default.
    assert(RuleRunner.reports(df, rules).forall(_.sampleInvalid.isEmpty))
  }

  test("sampleWindows returns full ordered partitions containing invalid rows") {
    val d = Seq(
      ("c1", 1, 10.0), ("c1", 2, 999.0), ("c1", 3, 20.0),
      ("c2", 4, 5.0)).toDF("cust", "ord", "amt")
    val rule = Rule("amt < 500", "amount sane", 0.0)
    val out = RuleRunner.sampleWindows(d, rule,
      SampleWindowParams(Seq("cust"), Seq("ord")))
      .select("cust", "ord", "window_rank")
      .as[(String, Int, Int)].collect().sorted
    // only c1 has an invalid row; its whole window is returned, ordered
    assert(out.toSeq === Seq(("c1", 1, 1), ("c1", 2, 2), ("c1", 3, 3)))
  }
}
