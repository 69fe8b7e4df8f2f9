package graft.dedup

import graft.SparkSpec
import graft.queries.DedupQueries

/** The tf-idf rerank's pair scorer picks its join strategy from the
  * MEASURED candidate-doc vector size: broadcast when the frame fits
  * `spark.graft.tfidf.maxBroadcastBytes`, sort-merge shuffle above it
  * (the pre-r11 path, kept as the too-big-to-broadcast fallback). The
  * two paths must be output-identical — this pins it, plus the conf
  * validation. */
class TfidfPairsJoinPathSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val key = "spark.graft.tfidf.maxBroadcastBytes"

  private def rows() =
    DedupQueries.qdTfidfPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("broadcast and shuffle scoring paths produce identical pairs") {
    val broadcastPath =
      try { spark.conf.set(key, (1L << 30).toString); rows() }
      finally spark.conf.unset(key)
    // 0 disables broadcasting outright -> the sort-merge fallback.
    val shufflePath =
      try { spark.conf.set(key, "0"); rows() }
      finally spark.conf.unset(key)
    assert(broadcastPath.nonEmpty)
    assert(broadcastPath === shufflePath)
  }

  test("both probes share ONE broadcast relation (ReusedExchange)") {
    // The vector frame is hinted un-aliased so the two attach joins'
    // broadcast-exchange subplans are identical — per-side aliases
    // between exchange and join would give each probe its own resident
    // relation, doubling the footprint that set the measured executor
    // OOM floor (MemGate).
    // Inspect the PRE-SORT scored frame: the r14 pre-sort checkpoint
    // truncates the sorted query's executed plan at a LogicalRDD scan,
    // and disabling spark.graft.materialize for visibility would also
    // disable the size probe and silently flip the run to the shuffle
    // fallback (the very bug this suite caught once). The unsorted
    // frame keeps the probe + gate live AND shows the attach joins.
    try {
      spark.conf.set(key, (1L << 30).toString)
      val (cand, vec) = DedupQueries.tfidfCandVec(spark, dir)
      val df = DedupQueries.scoreTfidfPairsUnsorted(spark, cand, vec)
      graft.Force.rows(df) // AQE: reuse is only visible in the final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "probe-admitted vector frame was not broadcast")
      assert(plan.contains("ReusedExchange"),
        "second vector probe rebuilt its own broadcast relation")
    } finally spark.conf.unset(key)
  }

  test("a non-numeric threshold fails loudly with the key in the message") {
    try {
      spark.conf.set(key, "lots")
      val e = intercept[IllegalArgumentException] {
        DedupQueries.qdTfidfPairs(spark, dir)
      }
      assert(e.getMessage.contains(key) && e.getMessage.contains("lots"))
    } finally spark.conf.unset(key)
  }

  test("a non-positive SHJ build gate fails loudly, never Int.MaxValue partitions") {
    // 0 is the '0 = disable' idiom on the sibling maxBroadcastBytes
    // gates, but HERE it would make ceil(b / 0.0).toInt = Int.MaxValue
    // and issue repartition(2147483647); and unlike SNM there is no
    // safe third strategy (sort-merge is the measured-fatal spill).
    // It must fail with the knob's name instead.
    val gateKey = "spark.graft.tfidf.shjMaxBuildBytes"
    try {
      spark.conf.set(key, "0") // broadcast off -> the gated SHJ path
      spark.conf.set(gateKey, "0")
      val e = intercept[IllegalArgumentException] {
        DedupQueries.qdTfidfPairs(spark, dir)
      }
      assert(e.getMessage.contains(gateKey))
    } finally { spark.conf.unset(key); spark.conf.unset(gateKey) }
  }

  test("an oversized per-partition build widens the join, still SHJ") {
    // Sort-merge is measured-fatal here (the fat pairs×vectors
    // intermediate crossing a sort was the 300+ GB spill), so the
    // guard against SHJ's can't-spill build side is WIDTH: when the
    // vector frame per shuffle partition outgrows the gate, the
    // attach is repartitioned on doc_id to restore the bound and the
    // probe sides co-partition to it. Gate of 256 B on the sf0.001
    // frame forces the path at test scale.
    val gateKey = "spark.graft.tfidf.shjMaxBuildBytes"
    val defaultRows = rows()
    // Pre-sort frame for the same reason as the reuse test: the size
    // probe must stay live (it feeds the widening arithmetic), and the
    // executed plan must show the attach joins past the checkpoint.
    val (wideRows, plan) =
      try {
        spark.conf.set(key, "0") // broadcast off -> shuffle fallback
        spark.conf.set(gateKey, "256")
        val (cand, vec) = DedupQueries.tfidfCandVec(spark, dir)
        val df = DedupQueries.scoreTfidfPairsUnsorted(spark, cand, vec)
        val r = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq.sorted
        (r, df.queryExecution.executedPlan.toString)
      } finally { spark.conf.unset(key); spark.conf.unset(gateKey) }
    assert(plan.contains("ShuffledHashJoin"),
      "widened path must stay shuffle-hash, never sort-merge")
    assert(!plan.contains("SortMergeJoin"))
    // The explicit repartition overrides the session's 4 shuffle
    // partitions: the attach exchange must carry a WIDER explicit
    // partition count (frameBytes/256 ≫ 4 at any real corpus). Assert
    // on the attach exchange itself, not a bare plan substring — the
    // loader's rebalance can inject its own REPARTITION_BY_NUM.
    assert(plan.contains("REPARTITION_BY_NUM"),
      "attach frame was not explicitly repartitioned")
    assert(wideRows === defaultRows.sorted)
  }
}
