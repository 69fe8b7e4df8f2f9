package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empty-input behavior of the core operator families: a production QC
  * run over a table that happens to be empty (new partition, filtered
  * source) must report zeros, not throw. */
class EmptyInputSpec extends SparkSpec {

  private def emptyDocs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  }

  test("rule reports on an empty table are all-zero, none failed") {
    import graft.rules.{Rule, RuleRunner}
    val df = emptyDocs.withColumnRenamed("text", "v")
    val reps = RuleRunner.reports(df,
      Seq(Rule("doc_id > 0", "positive id", 0.1)))
    assert(reps.head.totalRows === 0)
    assert(reps.head.numInvalid === 0)
    assert(reps.head.fractionInvalid === 0.0)
    assert(!reps.head.failed)
  }

  test("profile variants emit one zero row per column on an empty table") {
    import graft.rules.Profiler
    val expected = Seq(
      Seq("doc_id", 0L, 0L, 0L), Seq("text", 0L, 0L, 0L))
    for (p <- Seq(
        Profiler.profile(emptyDocs, Seq("doc_id", "text")),
        Profiler.profileUnpivot(emptyDocs, Seq("doc_id", "text")))) {
      assert(p.orderBy("column_name").collect().map(_.toSeq).toSeq == expected)
    }
  }

  test("dedup operators yield empty results on an empty corpus") {
    import graft.dedup.Dedup
    assert(Dedup.exactGroups(emptyDocs, "text", "doc_id").count() === 0)
    assert(Dedup.minhashCandidatePairs(emptyDocs, "text", "doc_id", 16, 8)
      .count() === 0)
    assert(Dedup.simhash32(emptyDocs, "text", "doc_id").count() === 0)
    assert(Dedup.lshLabelPairReport(emptyDocs, "text", "doc_id", "source",
      16, 8).count() === 0)
    assert(Dedup.connectedComponents(
      emptyDocs.select("doc_id"), emptyDocs.select("doc_id", "source")
        .toDF("id_a", "id_b")).count() === 0)
  }

  test("round-9 operators survive empty inputs") {
    val s = spark
    import s.implicits._
    import graft.dedup.Dedup
    // LSH edge generator: empty corpus → empty edge set, no throw.
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.lshCosinePairs(emptyVecs, "embedding", "vec_id",
      numPlanes = 6, dims = 4, minCosine = 0.2).count() === 0)
    // Graph ops on an empty edge frame.
    val noEdges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.trianglesPerVertex(noEdges).count() === 0)
    assert(Dedup.kCore(noEdges, k = 2).count() === 0)
    assert(Dedup.pageRank(noEdges).count() === 0)
    assert(Dedup.clusteringCoefficient(noEdges).count() === 0)
    // AMS sketch of an empty stream is the all-zero cell array, and its
    // inner product with anything estimates 0.
    val zeroSketch = Seq.empty[Long].toDF("k")
      .agg(graft.operators.AmsSketch.sketch(3, 8)(col("k")).as("s"))
      .as[Seq[Long]].head()
    assert(zeroSketch === Seq.fill(24)(0L))
    assert(graft.operators.AmsSketch.innerProduct(
      zeroSketch, zeroSketch, 3, 8) === 0L)
  }

  test("diff of two empty frames validates and emits nothing") {
    import graft.diff._
    val cfg = DiffConfig(
      left = DiffSide(Seq("doc_id"), Seq("text")),
      right = DiffSide(Seq("doc_id"), Seq("text")),
      leftName = "a", rightName = "b")
    assert(DatasetDiff.diff(emptyDocs, emptyDocs, cfg).count() === 0)
  }

  test("distributed rank of an empty frame emits nothing") {
    import graft.operators.DistributedRank
    val ranked = DistributedRank.withRowNumber(
      emptyDocs.select(col("doc_id")), col("doc_id"), col("doc_id"), "r")
    assert(ranked.count() === 0)
    assert(ranked.columns.toSeq == Seq("doc_id", "r"))
  }
}
