package graft.syntax

import graft.SparkSpec
import graft.rules.Rule

class SyntaxSpec extends SparkSpec {
  test("fluent ops delegate to the underlying operators") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 5.0), (2L, "a", -1.0)).toDF("id", "text", "v")
    val rules = Seq(Rule("v >= 0", "non-negative", 0.0))

    val reports = df.checkRules(rules)
    assert(reports.head.numInvalid == 1 && reports.head.failed)

    val bad = df.invalidRows(rules).collect()
    assert(bad.length == 1 && bad(0).getAs[Long]("id") == 2L)

    assert(df.dedupExact("text", "id").collect()
      .head.getAs[Long]("canonical_id") == 1L)

    assert(df.nearDupCandidates("text", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }
}
