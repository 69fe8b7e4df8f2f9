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

  test("dedupNear keeps only canonical rows of near-dup clusters") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e", "s1"), (2L, "a b c d e", "s1"), // dup cluster → keep 1
      (3L, "q r s t u", "s1"))                          // singleton → kept
      .toDF("id", "text", "source")
    val out = docs.dedupNear("text", "id", "source", n = 3, minJaccard = 0.8)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(out == Seq(1L, 3L))
  }
}
