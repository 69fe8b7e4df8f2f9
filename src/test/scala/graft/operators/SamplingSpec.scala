package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    // Skewed strata: "big" has 200 rows, "small" has 3.
    ((1 to 200).map(i => (i.toLong, "big")) ++
      (201 to 203).map(i => (i.toLong, "small"))).toDF("id", "src")
  }

  test("keeps at most k rows per stratum with dense 1..k ranks") {
    val out = Sampling.stratifiedTopK(docs, Seq("src"), "id", k = 5)
      .select("src", "sample_rank").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq).toMap
    assert(out("big") == (1 to 5))
    assert(out("small") == (1 to 3)) // stratum smaller than k keeps all
  }

  test("salted two-phase plan elects exactly the single-window rows") {
    val plain = Sampling.stratifiedTopK(docs, Seq("src"), "id", k = 7)
      .select("src", "id", "sample_rank").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    val salted = Sampling.stratifiedTopK(docs, Seq("src"), "id", k = 7, salts = 4)
      .select("src", "id", "sample_rank").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(salted == plain)
  }

  test("selection is deterministic and seed-sensitive") {
    def ids(seed: String) =
      Sampling.stratifiedTopK(docs, Seq("src"), "id", k = 5, seed = seed)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids("sample") == ids("sample"))
    assert(ids("sample") != ids("other-seed")) // 5-of-200: collision ≈ 0
  }
}
