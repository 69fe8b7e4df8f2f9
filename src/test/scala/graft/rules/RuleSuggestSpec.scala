package graft.rules

import graft.SparkSpec

/** Pins [[RuleSuggest]] (§2.13b8): learned rules are self-consistent on
  * the learning data and fire on drifted data. */
class RuleSuggestSpec extends SparkSpec {
  import spark.implicits._

  private val base = {
    val rows = (1L to 200L).map { i =>
      (i, (i % 50).toDouble + 10.0, if (i % 3 == 0) "A" else "B",
        java.sql.Timestamp.valueOf(s"2024-01-0${i % 9 + 1} 00:00:00"))
    }
    rows.toDF("id", "amount", "status", "ts")
  }
  private val cols = Seq("id", "amount", "status", "ts")

  test("suggested rules pass on the data they were learned from") {
    val rules = RuleSuggest.rules(RuleSuggest.suggest(base, cols))
    assert(rules.nonEmpty)
    val reports = RuleRunner.reports(base, rules)
    assert(reports.forall(!_.failed), reports.mkString("\n"))
    // Kinds learned as designed: numeric ranges, enum, not-null ts.
    val kinds = RuleSuggest.suggest(base, cols).map(s => s.column -> s.kind).toMap
    assert(kinds("amount") == "range" && kinds("id") == "range")
    assert(kinds("status") == "enum")
    assert(kinds("ts") == "not_null")
  }

  test("drifted data fails the suggested rules") {
    val rules = RuleSuggest.rules(RuleSuggest.suggest(base, cols))
    // Range drift: amounts far beyond the learned band.
    val shifted = base.withColumn("amount",
      org.apache.spark.sql.functions.col("amount") * 100)
    val r1 = RuleRunner.reports(shifted, rules)
    assert(r1.exists(r => r.failed && r.query.contains("amount")))
    // Enum drift: a category never seen in training.
    val newCat = base.withColumn("status",
      org.apache.spark.sql.functions.lit("ZZZ"))
    val r2 = RuleRunner.reports(newCat, rules)
    assert(r2.exists(r => r.failed && r.query.contains("status")))
  }

  test("high-cardinality strings degrade to not-null, never a huge IN set") {
    val wide = (1L to 100L).map(i => (i, s"val_$i")).toDF("id", "s")
    val s = RuleSuggest.suggest(wide, Seq("s"))
    assert(s.head.kind == "not_null")
    // Empty input suggests nothing rather than degenerate bands.
    assert(RuleSuggest.suggest(base.limit(0), cols).isEmpty)
  }
}
