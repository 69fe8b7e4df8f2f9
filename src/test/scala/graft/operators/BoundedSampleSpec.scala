package graft.operators

import graft.SparkSpec
import graft.Tables

/** The typed-Aggregator sample must select EXACTLY the ids the
  * window-based stratifiedTopK selects — same md5 rule, different
  * (bounded, mergeable) execution. */
class BoundedSampleSpec extends SparkSpec {

  test("aggregator sample equals window-based stratified top-k per source") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val expected = Sampling
      .stratifiedTopK(docs, Seq("source"), "doc_id", k = 5, seed = "sample")
      .select("source", "doc_id").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = docs.select($"source", $"doc_id")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(BoundedSample.sampleIds(5, "sample").name("ids"))
      .collect()
      .map { case (src, ids) => src -> ids.toSet }.toMap
    assert(got == expected)
    assert(got.values.forall(_.size <= 5))
    // the untyped UDAF form selects the same ids from a plain DataFrame
    val viaUdf = docs.groupBy("source")
      .agg(BoundedSample.sampleIdsUdf(5, "sample")(docs("doc_id")).as("ids"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(viaUdf == expected)
  }

  test("merge order cannot change the sample (hash-determinism)") {
    val agg = new BoundedSample(3, "s")
    val items = (1L to 20L).toList
    val onePass = items.foldLeft(agg.zero)(agg.reduce)
    // split into odd chunks, reduce separately, merge in reverse order
    val chunks = items.grouped(7).toList
    val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      .reverse.foldLeft(agg.zero)(agg.merge)
    assert(agg.finish(onePass) == agg.finish(merged))
  }
}
