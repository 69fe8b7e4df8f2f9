package graft.dedup

import graft.SparkSpec

/** Pins [[Dedup.substringRuns]] — exact maximal shared-substring
  * recovery via gaps-and-islands over the positional-n-gram diagonal. */
class SubstringRunsSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, prefix: String = "w"): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a shared 13-token span is recovered with exact positions") {
    // doc 2 embeds doc 1's first 13 tokens starting at its position 2.
    val shared = words(13)
    val df = Seq(
      (1L, shared + " " + words(5, "x")),
      (2L, "z1 " + shared + " " + words(4, "y"))
    ).toDF("doc_id", "text")
    val runs = Dedup.substringRuns(df, "text", "doc_id", 13, 100).collect()
    assert(runs.length == 1)
    val r = runs.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Int]("start_a") == 1 && r.getAs[Int]("start_b") == 2)
    assert(r.getAs[Long]("span_tokens") == 13L)
  }

  test("a longer overlap collapses to ONE maximal span, span = run + 12") {
    val shared = words(20)
    val df = Seq(
      (1L, shared + " " + words(3, "x")),
      (2L, shared + " " + words(3, "y"))
    ).toDF("doc_id", "text")
    val runs = Dedup.substringRuns(df, "text", "doc_id", 13, 100).collect()
    // 20-token overlap = 8 consecutive 13-grams = one island of span 20.
    assert(runs.length == 1)
    assert(runs.head.getAs[Long]("span_tokens") == 20L)
  }

  test("two disjoint shared spans report as separate islands") {
    val s1 = words(13, "a")
    val s2 = words(13, "b")
    val df = Seq(
      (1L, s1 + " " + words(2, "p") + " " + s2),
      (2L, s2 + " " + words(4, "q") + " " + s1)
    ).toDF("doc_id", "text")
    val runs = Dedup.substringRuns(df, "text", "doc_id", 13, 100)
      .orderBy("start_a").collect()
    assert(runs.length == 2)
    assert(runs.map(_.getAs[Long]("span_tokens")).toSeq == Seq(13L, 13L))
    // s1 starts at 1 in doc1 and 18 in doc2; s2 at 16 in doc1, 1 in doc2.
    assert(runs(0).getAs[Int]("start_a") == 1 && runs(0).getAs[Int]("start_b") == 18)
    assert(runs(1).getAs[Int]("start_a") == 16 && runs(1).getAs[Int]("start_b") == 1)
  }

  test("maxDf gate drops grams above the document-frequency cap") {
    val shared = words(13)
    val docs = (1L to 3L).map(id => (id, shared + s" only$id"))
    val df = docs.toDF("doc_id", "text")
    // df = 3 for the shared grams: cap 2 drops everything...
    assert(Dedup.substringRuns(df, "text", "doc_id", 13, 2).count() == 0)
    // ...cap 3 keeps all three pairs.
    assert(Dedup.substringRuns(df, "text", "doc_id", 13, 3)
      .select("doc_a", "doc_b").distinct().count() == 3)
  }

  test("documents shorter than n tokens generate nothing") {
    val df = Seq((1L, words(12)), (2L, words(12))).toDF("doc_id", "text")
    assert(Dedup.substringRuns(df, "text", "doc_id", 13, 100).count() == 0)
  }
}
