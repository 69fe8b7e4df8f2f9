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

  test("weightedKeep honours boundary weights and roughly hits the ratio") {
    import org.apache.spark.sql.functions._
    val all = Sampling.weightedKeep(docs, "id", lit(1.0)).count()
    val none = Sampling.weightedKeep(docs, "id", lit(0.0)).count()
    assert(all == 203 && none == 0)
    val half = Sampling.weightedKeep(docs, "id", lit(0.5)).count()
    assert(half > 60 && half < 140) // md5 buckets: ~101 ± binomial noise
    // Deterministic: the same call elects the same rows.
    val a = Sampling.weightedKeep(docs, "id", lit(0.5))
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedKeep(docs, "id", lit(0.5))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("packShards buckets docs by start offset (whole docs; soft capacity)") {
    val s = spark
    import s.implicits._
    // Ten docs of 300 tokens: capacity 1000 → shards of 4,3,3 docs
    // (exclusive prefixes 0,300,600,900 | 1200,1500,1800 | 2100,…).
    // Shard 0 holds 1200 tokens: a doc STARTING inside the shard stays
    // whole in it, so totals may overflow by up to one document.
    val df = (1 to 10).map(i => (i.toLong, "s", 300L)).toDF("id", "src", "n")
    val out = Sampling.packShards(df, Seq("src"), "id", "n", 1000L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.map(_._2).toSeq == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 2L))
  }

  test("shuffleShards is a reproducible permutation with dense per-shard ranks") {
    val out = Sampling.shuffleShards(docs, "id", shards = 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == docs.collect().map(_.getLong(0)).toSet)
    assert(out.length == out.map(_._1).distinct.length) // each row exactly once
    out.groupBy(_._2).foreach { case (_, rows) =>       // pos dense 1..n
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val again = Sampling.shuffleShards(docs, "id", shards = 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq == out.sorted.toSeq) // deterministic
    // A different seed produces a different order (203 rows: the chance
    // two md5 orders agree is ~1/203!).
    val other = Sampling.shuffleShards(docs, "id", shards = 4, seed = "other")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(other.sorted.toSeq != out.sorted.toSeq)
  }
}
