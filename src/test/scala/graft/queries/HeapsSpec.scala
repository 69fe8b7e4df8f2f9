package graft.queries

import graft.SparkSpec

/** Pins [[TextQueries.heapsFit]] — Heaps-law growth fit (§2.28n). */
class HeapsSpec extends SparkSpec {
  import spark.implicits._

  test("an all-novel corpus fits beta = 1, K = 1, r2 = 1 exactly") {
    // Every token globally unique → every 3-gram new → V(n) = n.
    val docs = (0L until 64L)
      .map(i => (i, (1 to 8).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextQueries.heapsFit(docs, "doc_id", "text", 32).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("beta_hat") == 1.0)
    assert(r.head.getAs[Double]("k_hat") == 1.0)
    assert(r.head.getAs[Double]("r2") == 1.0)
    assert(r.head.getAs[Long]("total_grams") == 64L * 6)
    assert(r.head.getAs[Long]("total_vocab") == 64L * 6)
  }

  test("a mixed corpus fits 0 < beta < 1 with sane totals") {
    // Half the tokens shared across docs, half unique → sublinear growth.
    val docs = (0L until 64L)
      .map(i => (i, s"a b c d u${i}_1 u${i}_2 a b c d u${i}_3 u${i}_4"))
      .toDF("doc_id", "text")
    val r = TextQueries.heapsFit(docs, "doc_id", "text", 32).collect().head
    val beta = r.getAs[Double]("beta_hat")
    assert(beta > 0.0 && beta < 1.0)
    assert(r.getAs[Long]("total_vocab") <= r.getAs[Long]("total_grams"))
    assert(r.getAs[Long]("n_points") == 32L)
  }

  test("a saturated corpus (identical docs) fits beta = 0 with NULL r2") {
    // Vocab complete after the first checkpoint: y is constant, so the
    // slope is 0 and r2's variance denominator is exactly 0 → NULL
    // (ANSI /0 rule), never an error.
    val docs = (0L until 64L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val r = TextQueries.heapsFit(docs, "doc_id", "text", 32).collect().head
    assert(r.getAs[Double]("beta_hat") == 0.0)
    assert(r.isNullAt(r.fieldIndex("r2")))
    assert(r.getAs[Long]("total_vocab") == 3L)
  }

  test("documents under 3 tokens contribute nothing; empty input → no fit") {
    val docs = Seq((0L, "one two"), (1L, "solo")).toDF("doc_id", "text")
    assert(TextQueries.heapsFit(docs, "doc_id", "text", 32).count() == 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextQueries.heapsFit(empty, "doc_id", "text", 32).count() == 0)
  }
}
