package graft.dedup

import graft.SparkSpec

/** Pins [[Dedup.autoPlanes]] — the corpus-sized LSH blocking knob the
  * ×160 scale ladder demanded (a pinned plane count goes quadratic in
  * same-bucket pair work once n ≫ 2^planes; measured 25× wall from
  * re-sizing at 320 k vectors). The pinned values below are
  * load-bearing twice over: the driver-SF row (500 and 2000 → 4) is
  * what makes ONE baked oracle plane count (qd_lsh_auto /
  * qd_kcore_auto's AutoOraclePlanes = 4) valid at every SF the
  * correctness gate runs, and the ladder row (320 k → 12) is the
  * measured optimum the formula must keep reproducing.
  */
class AutoPlanesSpec extends SparkSpec {

  test("formula: ceil(log2(n/128)) clamped to [4, 24]") {
    // Driver-gate corpora: both land on the min clamp — the single
    // oracle bake for qd_lsh_auto/qd_kcore_auto depends on this.
    assert(Dedup.autoPlanes(500) === 4)
    assert(Dedup.autoPlanes(2000) === 4)
    // Ladder rungs: sf1/sf4/sf16 embeddings (×10/×40/×160 of 2000).
    assert(Dedup.autoPlanes(20000) === 8)
    assert(Dedup.autoPlanes(80000) === 10)
    assert(Dedup.autoPlanes(320000) === 12) // the measured 25× point
    // Billion-row territory and the max clamp.
    assert(Dedup.autoPlanes(1000000000L) === 23)
    assert(Dedup.autoPlanes(Long.MaxValue / 2) === 24)
    // Degenerate corpora never go below the floor (16 buckets).
    assert(Dedup.autoPlanes(0) === 4)
    assert(Dedup.autoPlanes(1) === 4)
  }

  test("exact power-of-two boundaries round up, not down") {
    // n/target exactly 2^k must give k (ceil of an integer log), and
    // one row more must tip to k+1 — an off-by-one here doubles or
    // halves every bucket at scale.
    assert(Dedup.autoPlanes(128L << 10) === 10)
    assert(Dedup.autoPlanes((128L << 10) + 1) === 11)
  }

  test("auto overload == explicit overload at the auto-chosen planes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dims = 8
    // range starts at 1: id=0 would make every sin(id·k) component 0 —
    // a zero-norm vector the cosine (correctly) refuses to divide by.
    val df = spark.range(1, 301).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        i => sin(col("id") * (i + 1)).cast("float")).as("embedding"))
      .localCheckpoint()
    val auto = Dedup.lshCosinePairs(df, "embedding", "vec_id", dims, 0.2)
    val explicit = Dedup.lshCosinePairs(df, "embedding", "vec_id",
      Dedup.autoPlanes(300), dims, 0.2)
    assert(auto.collect().toSet === explicit.collect().toSet)
    assert(auto.count() > 0) // non-vacuous: some edges exist
  }

  test("oracle drift guard: loud at driver scale, silent at ladder scale") {
    // The _auto queries bake AutoOraclePlanes=4 into their DuckDB
    // oracles, valid while every driver-SF embeddings count stays in
    // the 4-plane regime (≤ 2048 rows). A generator drift past the
    // boundary must fail NAMING the fix — but only inside the
    // driver-scale domain: a ladder corpus (20 k+) legitimately picks
    // more planes and no oracle is replayed there (the first cut of
    // this guard asserted unconditionally and errored every _auto
    // rung above sf0.1 — caught by the r13 ladder refresh).
    import org.apache.spark.sql.functions._
    def embDir(n: Long): String = {
      val d = java.nio.file.Files.createTempDirectory(s"driftguard$n")
      spark.range(1, n + 1).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => sin(col("id") * (i + 1)).cast("float")).as("embedding"),
        lit(0L).as("label"))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d.toString
    }
    // 2100 rows: past the 2049 flip, inside the driver domain → loud.
    val e = intercept[IllegalArgumentException] {
      graft.queries.DedupQueries.qdLshAuto(spark, embDir(2100))
    }
    assert(e.getMessage.contains("AutoOraclePlanes"))
    // 5000 rows: ladder territory → the auto count is the contract.
    val edges = graft.queries.DedupQueries.qdLshAuto(spark, embDir(5000))
    assert(edges.count() > 0)
  }
}
