package graft.queries

import graft.SparkSpec

/** Pins qd_manifest (§2.25s): actions on a hand-built fixture and the
  * transitive-canonical invariant (no canonical ever points at a
  * dropped document). */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  test("exact-dropped docs resolve through their canonical's component") {
    // id 10: near-dup of id 11 ("a b c d f" vs "a b c d e": 3-shingle
    //   jaccard 2/4 = 0.5) — id 11 drops near, canonical 10.
    // id 12: exact copy of id 11 — drops exact, and must resolve
    //   TRANSITIVELY to 10 (11 is itself dropped).
    // id 13: unrelated — keep.
    val rows = Seq(
      (10L, "a b c d f", "s1"),
      (11L, "a b c d e", "s1"),
      (12L, "a b c d e", "s1"),
      (13L, "p q r s t", "s1"))
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = DedupQueries.qdManifest(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("action"), r.getAs[Long]("canonical_id"))).toMap
    assert(out(10L) === ("keep", 10L))
    assert(out(11L) === ("drop_near", 10L))
    assert(out(12L) === ("drop_exact", 10L))
    assert(out(13L) === ("keep", 13L))
  }

  test("no canonical points at a dropped document (real data)") {
    val rows = DedupQueries.qdManifest(spark, "/root/testdata/sf0.001")
      .collect()
    val action = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("action")).toMap
    rows.foreach { r =>
      val canon = r.getAs[Long]("canonical_id")
      assert(action(canon) === "keep",
        s"doc ${r.getAs[Long]("doc_id")} points at non-kept canonical " +
          s"$canon (${action(canon)})")
    }
    assert(rows.count(_.getAs[String]("action") == "keep") > 0)
  }
}
