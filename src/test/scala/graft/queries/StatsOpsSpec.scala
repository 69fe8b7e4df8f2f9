package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge-semantics pins for the statistical / evaluation operators
  * (diversity entropy, TWA, heavy-tail fit, session stats, uniqueness
  * audit, readability, ANN recall, threshold sweep). The DuckDB oracle
  * proves cross-engine parity on real data; these pin the math on
  * crafted fixtures where the expected value is known in closed form. */
class StatsOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("diversity: single-type user scores 0, uniform two-type scores 1 bit") {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val dir = "/tmp/graft_stats_diversity"
    Seq(
      (1L, t0, 1L, "view", 0.0, ""),
      (2L, plus(1), 1L, "view", 0.0, ""),
      (3L, plus(2), 2L, "view", 0.0, ""),
      (4L, plus(3), 2L, "purchase", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.qeDiversity(spark, dir).collect()
    val byUser = rows.map(r => r.getAs[Long]("user_id") ->
      r.getAs[Double]("type_entropy")).toMap
    assert(byUser(1L) == 0.0)     // one type → no uncertainty
    assert(byUser(2L) == 1.0)     // 50/50 over two types → exactly 1 bit
  }

  test("TWA: value holding 3x longer dominates the average 3:1") {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val dir = "/tmp/graft_stats_twa"
    // value 10 holds 30 min, value 2 holds 10 min, final event unweighted.
    Seq(
      (1L, t0, 1L, "m", 10.0, ""),
      (2L, plus(30), 1L, "m", 2.0, ""),
      (3L, plus(40), 1L, "m", 99.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventQueries.qeTwa(spark, dir).collect().head
    assert(r.getAs[Long]("n_segments") == 2)
    // (10*30 + 2*10) / 40 = 8.0 — the arithmetic mean (37.0) would be
    // wildly off; the last value contributes no segment.
    assert(r.getAs[Double]("twa_value") == 8.0)
  }

  test("heavy-tail: counts proportional to 1/rank fit slope -1") {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dir = "/tmp/graft_stats_tail"
    // user u gets 60/u events, u = 1..5 → count = 60/rank exactly.
    val rows = for {
      u <- 1 to 5
      i <- 1 to 60 / u
    } yield (u * 1000L + i, new Timestamp(t0 + (u * 1000 + i) * 1000L),
      u.toLong, "view", 0.0, "")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventQueries.qeHeavytail(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == 5)
    assert(math.abs(r.getAs[Double]("tail_slope") - (-1.0)) < 0.01)
  }

  test("session stats agree with the session frame they summarize") {
    val sessions = EventQueries.qeSessions(spark, sf)
    val stats = EventQueries.qeSessionStats(spark, sf).collect().head
    assert(stats.getAs[Long]("n_sessions") == sessions.count())
    val expectedAvg = {
      val agg = sessions.agg(sum("n_events"), count(lit(1))).collect().head
      math.rint(agg.getLong(0).toDouble / agg.getLong(1) * 1e6) / 1e6
    }
    assert(stats.getAs[Double]("avg_events") == expectedAvg)
    assert(stats.getAs[Double]("p90_events") >= stats.getAs[Double]("p50_events"))
  }

  test("uniqueness audit: surplus rows = rows - keys on every entity") {
    val rows = ProfileQueries.qcUnique(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"))
      assert(r.getAs[Long]("n_dup_rows") == n - k, r.getAs[String]("entity"))
      assert(r.getAs[Long]("max_dup") >= 1)
    }
    // primary keys really are unique; the fan-out key really fans out
    val byEntity = rows.map(r => r.getAs[String]("entity") -> r).toMap
    assert(byEntity("orders.o_orderkey").getAs[Long]("n_dup_keys") == 0)
    assert(byEntity("orders.o_custkey").getAs[Long]("n_dup_keys") > 0)
  }

  test("readability: flesch assembles from the two reported ratios") {
    val rows = TextQueries.qtReadability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { r =>
      val wps = r.getAs[Double]("words_per_sentence")
      val vpw = r.getAs[Double]("vowel_groups_per_word")
      val flesch = r.getAs[Double]("flesch")
      // reported ratios are rounded to 6dp, flesch to 4dp: reassembling
      // from the rounded ratios must land within the rounding slack
      assert(math.abs(flesch - (206.835 - 1.015 * wps - 84.6 * vpw)) < 1e-3)
      assert(r.getAs[Long]("n_sentences") >= 1)
    }
  }

  test("ANN recall: bounded by 1, and exact-on-panel when buckets align") {
    val rows = SimilarityQueries.qsRecall(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0 && hit <= 3)
      assert(r.getAs[Double]("recall_at_3") ==
        math.rint(hit / 3.0 * 1e6) / 1e6)
    }
  }

  test("mode: tie between two equally frequent values picks the smaller") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_mode"
    // flag A: 7.0 ×2 vs 3.0 ×2 (tie → 3.0); flag B: clear winner 5.0
    Seq(("A", 7.0), ("A", 7.0), ("A", 3.0), ("A", 3.0), ("A", 9.0),
      ("B", 5.0), ("B", 5.0), ("B", 1.0))
      .toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Analytics.qMode(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        r.getAs[Double]("mode_quantity")).toMap
    assert(rows("A") == 3.0)
    assert(rows("B") == 5.0)
  }

  test("lifecycle: first day is new, short gap retained, long gap resurrected") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_lifecycle"
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    Seq(
      (1L, ts(1), 1L, "view", 0.0, ""),
      (2L, ts(3), 1L, "view", 0.0, ""),   // gap 2 → retained
      (3L, ts(20), 1L, "view", 0.0, ""))  // gap 17 → resurrected
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val byDay = EventQueries.qeLifecycle(spark, dir).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"))).toMap
    assert(byDay("2024-01-01") == ((1L, 0L, 0L)))
    assert(byDay("2024-01-03") == ((0L, 1L, 0L)))
    assert(byDay("2024-01-20") == ((0L, 0L, 1L)))
  }

  test("token budget: shares sum to 1 and cumulative coverage reaches 1") {
    val rows = PipelineQueries.qpTokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    // biggest-first ordering makes cumulative_share monotone, ending at 1
    val cums = rows.map(_.getAs[Double]("cumulative_share"))
    assert(cums.sliding(2).forall { case Array(a, b) => b >= a })
    assert(math.abs(cums.last - 1.0) < 1e-6)
  }

  test("rolling 7d: window spans exactly the trailing week, gaps excluded") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_rolling"
    def ts(day: Int, i: Int) = Timestamp.valueOf(f"2024-01-$day%02d 0$i:00:00")
    // user 1: 2 events day1, 3 events day2, 5 events day10
    val rows = Seq.tabulate(2)(i => (10L + i, ts(1, i), 1L)) ++
      Seq.tabulate(3)(i => (20L + i, ts(2, i), 1L)) ++
      Seq.tabulate(5)(i => (30L + i, ts(10, i), 1L))
    rows.map { case (id, t, u) => (id, t, u, "view", 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.qeRolling(spark, dir).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("n_day"), r.getAs[Long]("n_7d"))).toMap
    assert(out("2024-01-01") == ((2L, 2L)))
    assert(out("2024-01-02") == ((3L, 5L)))   // day1 still inside the week
    assert(out("2024-01-10") == ((5L, 5L)))   // days 1-2 aged out
  }

  test("grouping sets: per-set subtotals re-sum to the grand total") {
    val rows = Analytics.qGroupingSets(spark, sf).collect()
    val grand = rows.filter(r =>
      r.getAs[Long]("g_status") == 1 && r.getAs[Long]("g_priority") == 1)
    assert(grand.length == 1)
    val total = grand.head.getAs[Long]("n_orders")
    // each grouping set partitions the data, so each re-sums to the total
    for ((gs, gp) <- Seq((0L, 0L), (0L, 1L), (1L, 0L))) {
      val part = rows.filter(r => r.getAs[Long]("g_status") == gs &&
        r.getAs[Long]("g_priority") == gp)
      assert(part.map(_.getAs[Long]("n_orders")).sum == total, s"set ($gs,$gp)")
    }
  }

  test("novelty: disjoint sources are fully novel, a clone has zero novelty") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_novelty"
    Seq(
      (1L, "alpha beta gamma delta", "en", "srcA", 22L),
      (2L, "epsilon zeta eta theta", "en", "srcB", 22L),
      (3L, "alpha beta gamma delta", "en", "srcC", 22L)) // clone of doc 1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.qtNovelty(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[Double]("novelty_ratio")).toMap
    assert(out("srcB") == 1.0)   // nothing shared
    assert(out("srcA") == 0.0)   // everything also in srcC
    assert(out("srcC") == 0.0)
  }

  test("co-occurrence: always-together types lift 1, diluted pairs below 1") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_cooc"
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Int, m: Int) = new Timestamp(t0.getTime + (h * 60L + m) * 3600000L)
    // 4 users = 4 sessions (far apart): {A,B}, {A,B}, {A}, {B}
    val rows = Seq(
      (1L, ts(0, 0), 1L, "A"), (2L, ts(0, 0), 1L, "B"),
      (3L, ts(1, 0), 2L, "A"), (4L, ts(1, 0), 2L, "B"),
      (5L, ts(2, 0), 3L, "A"),
      (6L, ts(3, 0), 4L, "B"))
    rows.map { case (id, t, u, ty) => (id, t, u, ty, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.qeCooccurrence(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[String]("type_a"), r.getAs[String]("type_b")) == (("A", "B")))
    assert(r.getAs[Long]("n_both") == 2)
    // lift = n_both * n_sessions / (nA * nB) = 2*4/(3*3)
    assert(r.getAs[Double]("lift") == math.rint(8.0 / 9.0 * 1e6) / 1e6)
  }

  test("event stat operators survive an empty partition without throwing") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_empty"
    Seq.empty[(Long, Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // per-user/per-day frames: zero rows
    assert(EventQueries.qeDiversity(spark, dir).count() == 0)
    assert(EventQueries.qeTwa(spark, dir).count() == 0)
    assert(EventQueries.qeLifecycle(spark, dir).count() == 0)
    assert(EventQueries.qeRolling(spark, dir).count() == 0)
    assert(EventQueries.qeCooccurrence(spark, dir).count() == 0)
    // global folds: one row of zero counts, no throw
    val tail = EventQueries.qeHeavytail(spark, dir).collect()
    assert(tail.length == 1 && tail.head.getAs[Long]("n_users") == 0)
    val sess = EventQueries.qeSessionStats(spark, dir).collect()
    assert(sess.length == 1 && sess.head.getAs[Long]("n_sessions") == 0)
  }

  test("MAD: a single spike is the outlier, the tight cluster is not") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_mad"
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    // 9 values near 10, one at 1000 → median 10, MAD small, 1 outlier
    val vals = Seq(9.0, 9.5, 10.0, 10.0, 10.0, 10.5, 10.5, 11.0, 9.0, 1000.0)
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new Timestamp(t0.getTime + i * 1000L), 1L, "m", v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ProfileQueries.qcMad(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 10)
    assert(r.getAs[Double]("median_value") == 10.0)
    assert(r.getAs[Long]("n_outliers") == 1)
  }

  test("dataset card: ratios reassemble from the corpus they describe") {
    val card = PipelineQueries.qpDatasetCard(spark, sf).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(card.keySet.size == 7)
    assert(card("n_docs") > 0)
    assert(card("avg_doc_tokens") ==
      math.rint(card("n_tokens_total") / card("n_docs") * 1e6) / 1e6)
    assert(card("top_source_share") >= 1.0 / card("n_sources"))
    assert(card("exact_dup_ratio") >= 0.0 && card("exact_dup_ratio") < 1.0)
  }

  test("conversion: only purchases within the hour count, delay is exact") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_conv"
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    Seq(
      (1L, t0, 1L, "view", 0.0, ""),
      (2L, plus(30), 1L, "purchase", 0.0, ""),   // converts, 30 min
      (3L, plus(100), 2L, "view", 0.0, ""),
      (4L, plus(170), 2L, "purchase", 0.0, ""),  // 70 min → too late
      (5L, plus(200), 3L, "view", 0.0, ""))      // never buys
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventQueries.qeConversion(spark, dir).collect().head
    assert(r.getAs[Long]("n_views") == 3)
    assert(r.getAs[Long]("n_converted") == 1)
    assert(r.getAs[Double]("avg_delay_s") == 1800.0)
  }

  test("langid eval: per-true-language shares sum to 1") {
    val rows = TextQueries.qtLangidEval(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val sum = rs.map(_.getAs[Double]("share_of_true")).sum
      assert(math.abs(sum - 1.0) < 1e-4, lang)
    }
  }

  test("LTV deciles: populations balance and bucket edges are ordered") {
    val rows = EventQueries.qeLtvDeciles(spark, sf)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    val pops = rows.map(_.getAs[Long]("n_users"))
    assert(pops.max - pops.min <= 1)   // ntile splits evenly ±1
    // deciles descend: every bucket's max ≤ previous bucket's min
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(lo.getAs[Double]("max_spend") <= hi.getAs[Double]("min_spend"))
    }
  }

  test("orphan examples: planted orphans surface, capped at 5, really absent") {
    // The shipped scale factors have ZERO orphans (healthy fixtures), so
    // this test must plant its own or every assertion is vacuous.
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_orphans"
    // customers 1..3; orders reference 7 missing custkeys (exercises the
    // ≤5 cut) and all order keys exist for lineitem (that relation clean)
    Seq(1L, 2L, 3L).map(k => (k, s"c$k"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    (Seq((10L, 1L)) ++ (11L to 17L).map(o => (o, 100L + o)))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L)).toDF("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, t0, 1L, "view", 0.0, ""), (2L, t0, 999L, "view", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val byRel = QualityQueries.qcOrphans(spark, dir).collect()
      .groupBy(_.getAs[String]("relation"))
    // 7 planted orphan custkeys → capped at exactly 5 examples
    assert(byRel("orders->customer").length == 5)
    assert(byRel("events->customer").map(_.getAs[Long]("orphan_key"))
      .toSeq == Seq(999L))
    assert(!byRel.contains("lineitem->orders")) // clean relation: no rows
    // every surfaced key really is absent from the parent
    byRel("orders->customer").foreach { r =>
      assert(r.getAs[Long]("orphan_key") > 100L)
    }
  }

  test("keep-latest: ties on ts resolve to the larger event_id") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_latest"
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, t0, 1L, "a", 0.0, ""), (2L, t0, 1L, "b", 0.0, ""),
      (3L, new Timestamp(t0.getTime - 1000), 1L, "c", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventQueries.qeLatest(spark, dir).collect().head
    assert(r.getAs[Long]("last_event_id") == 2L)
    assert(r.getAs[String]("last_type") == "b")
  }

  test("A/B split is deterministic and near-balanced on real users") {
    val rows = EventQueries.qeAbBalance(spark, sf).collect()
    assert(rows.map(_.getAs[String]("variant")).sorted.toSeq == Seq("A", "B"))
    val pops = rows.map(_.getAs[Long]("n_users"))
    assert(pops.sum > 0)
    // seeded-hash split of n users: both arms populated, no 90/10 skew
    assert(pops.min.toDouble / pops.sum > 0.3)
    // rerun must produce the identical assignment (no RNG anywhere)
    val again = EventQueries.qeAbBalance(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(again == rows.map(_.toSeq).toSet)
  }

  test("dedup savings: dup tokens attribute to the copy's source, not the canonical's") {
    // The shipped fixtures have zero exact duplicates, so the election
    // and attribution logic must be exercised on planted dups.
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_stats_savings"
    Seq(
      (1L, "alpha beta gamma", "en", "srcA", 16L),    // canonical (min id)
      (2L, "unique text here", "en", "srcA", 16L),
      (3L, "alpha beta gamma", "en", "srcB", 16L),    // copy in srcB
      (4L, "alpha beta gamma", "en", "srcB", 16L))    // second copy in srcB
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.qpDedupSavings(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_dup_docs"), r.getAs[Long]("tokens_dup"))).toMap
    assert(out("srcA") == ((0L, 0L)))   // holds the canonical: saves nothing
    assert(out("srcB") == ((2L, 6L)))   // both copies + their 3+3 tokens
  }

  test("threshold sweep: kept-pair counts decrease monotonically") {
    val rows = DedupQueries.qdThresholdSweep(spark, sf)
      .orderBy("threshold").collect()
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_est") >= hi.getAs[Long]("n_est"))
      assert(lo.getAs[Long]("n_true") >= hi.getAs[Long]("n_true"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_both") <=
        math.min(r.getAs[Long]("n_est"), r.getAs[Long]("n_true")))
    }
  }
}
