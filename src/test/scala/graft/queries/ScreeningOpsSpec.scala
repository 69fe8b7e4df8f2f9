package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fixture-level invariants for the screening/scheduling operators
  * (qe_changepoint, qe_bots, qm_shared_chunks, qm_modality_mix,
  * qp_curriculum). The DuckDB oracle proves value parity on the real
  * tables; these pin the DETECTION semantics on crafted inputs where
  * the right answer is known by construction. */
class ScreeningOpsSpec extends SparkSpec {

  private def writeEvents(dir: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def ts(day: Int, sec: Int): Timestamp =
    java.sql.Timestamp.from(
      Timestamp.valueOf(f"2024-02-${day + 1}%02d 00:00:00")
        .toInstant.plusSeconds(sec.toLong))

  test("qe_changepoint flags the regime boundary of a synthetic level shift") {
    // 5 days at 4 events/day, then 5 days at 40/day: CUSUM magnitude
    // peaks on the last low-regime day.
    val dir = "/tmp/graft_cusum_fixture"
    var id = 0L
    val rows = (0 until 10).flatMap { day =>
      val n = if (day < 5) 4 else 40
      (0 until n).map { i => id += 1; (id, ts(day, i * 60), 1L, "view", 0.0, "") }
    }
    writeEvents(dir, rows)
    val out = EventQueries.qeChangepoint(spark, dir).collect()
    assert(out.length == 10)
    val flagged = out.filter(_.getAs[Boolean]("is_changepoint"))
      .map(_.getAs[java.sql.Date]("day").toString)
    assert(flagged.toSeq == Seq("2024-02-05"), s"flagged=$flagged")
    // CUSUM over the whole frame always sums to zero (last row).
    val last = out.maxBy(_.getAs[java.sql.Date]("day").toString)
    assert(math.abs(last.getAs[Double]("cusum")) < 1e-6)
  }

  test("qe_bots separates a metronomic user from a bursty one") {
    val dir = "/tmp/graft_bots_fixture"
    var id = 0L
    // User 1: 25 events exactly 60s apart (cv = 0 → bot).
    val metronome = (0 until 25).map { i =>
      id += 1; (id, ts(0, i * 60), 1L, "view", 0.0, "")
    }
    // User 2: 25 events with alternating 10s / 590s gaps (cv ≈ 0.97).
    var t = 0
    val bursty = (0 until 25).map { i =>
      t += (if (i % 2 == 0) 10 else 590)
      id += 1; (id, ts(0, t), 2L, "view", 0.0, "")
    }
    // User 3: only 5 events — below the 20-gap support floor, excluded.
    val sparse = (0 until 5).map { i =>
      id += 1; (id, ts(0, i * 60), 3L, "view", 0.0, "")
    }
    writeEvents(dir, metronome ++ bursty ++ sparse)
    val out = EventQueries.qeBots(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Boolean]("is_bot"), r.getAs[Double]("cv_gap"))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 && out(1L)._2 == 0.0)
    assert(!out(2L)._1 && out(2L)._2 > 0.9)
  }

  test("qm_shared_chunks finds an identical 256-char chunk planted in two docs") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_chunks_fixture"
    val shared = "s" * 256
    val docs = Seq(
      (1L, shared + ("a" * 256), "en", "srcA", 512L),
      (2L, shared + ("b" * 256), "en", "srcB", 512L),
      (3L, "c" * 256, "en", "srcA", 256L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = MultimodalQueries.qmSharedChunks(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_docs") == 2L)
    assert(out.head.getAs[Long]("first_doc") == 1L)
  }

  test("qm_modality_mix byte shares partition the corpus") {
    val out = MultimodalQueries.qmModalityMix(spark, "/root/testdata/sf0.001")
      .collect()
    val shareSum = out.map(_.getAs[Double]("byte_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares sum to $shareSum")
    val bytes = out.map(_.getAs[Long]("total_bytes"))
    assert(bytes.forall(_ > 0))
  }

  test("qp_curriculum emits each doc once with dense per-shard ranks") {
    val out = PipelineQueries.qpCurriculum(spark, "/root/testdata/sf0.001")
      .collect()
    val n = out.length
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == n)
    assert(out.forall(r => (1 to 4).contains(r.getAs[Int]("bucket"))))
    // Ranks are dense 1..k within every (bucket, shard) stream.
    out.groupBy(r => (r.getAs[Int]("bucket"), r.getAs[Long]("shard")))
      .foreach { case (_, rows) =>
        val ranks = rows.map(_.getAs[Long]("rank_in_shard")).sorted.toSeq
        assert(ranks == (1L to rows.length).toSeq)
      }
    // Quartile buckets are balanced within rounding on distinct scores.
    val sizes = out.groupBy(_.getAs[Int]("bucket")).view.mapValues(_.length)
    assert(sizes.values.forall(c => c >= n / 8 && c <= n / 2),
      s"bucket sizes $sizes")
  }
}
