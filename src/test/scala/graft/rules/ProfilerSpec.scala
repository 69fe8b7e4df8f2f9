package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {

  private lazy val people = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(20.0)),
      (3L, None, Some(20.0)),
      (4L, Some("a"), None),
      (5L, Some("c"), Some(30.0))
    ).toDF("id", "tag", "score")
  }

  test("profile counts rows, nulls and exact distincts per column") {
    val rows = Profiler.profile(people, Seq("id", "tag", "score"))
      .orderBy("column_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("id", 5L, 0L, 5L),
      ("score", 5L, 1L, 3L),
      ("tag", 5L, 1L, 3L)))
  }

  test("profileUnpivot equals the expand-based exact profile") {
    val a = Profiler.profile(people, Seq("id", "tag", "score"))
      .orderBy("column_name").collect().map(_.toSeq).toSeq
    val b = Profiler.profileUnpivot(people, Seq("id", "tag", "score"))
      .orderBy("column_name").collect().map(_.toSeq).toSeq
    assert(b == a)
  }

  test("profileApprox matches exact counts on small-cardinality data") {
    // HLL++ is exact at tiny cardinalities, so the whole row must agree.
    val exact = Profiler.profile(people, Seq("id", "tag"))
      .orderBy("column_name").collect().map(_.toSeq).toSeq
    val approx = Profiler.profileApprox(people, Seq("id", "tag"))
      .orderBy("column_name").collect().map(_.toSeq).toSeq
    assert(approx == exact)
  }

  test("zOutliers flags exactly the values far from their group mean") {
    val s = spark
    import s.implicits._
    // Group g: nine 100s and one 1000 — the 1000 is the lone outlier
    // (z ≈ 3), and the 100s sit at z ≈ −0.33.
    val df = ((1 to 9).map(i => (i.toLong, "g", 100.0)) :+ (10L, "g", 1000.0))
      .toDF("id", "grp", "v")
    val out = Profiler.zOutliers(df, "v", Seq("grp"), 2.0)
      .select("id", "z_score").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L))
    assert(math.abs(out.head.getDouble(1) - 3.0) < 1e-6)
  }

  test("drift is zero between identical distributions and positive under shift") {
    val s = spark
    import s.implicits._
    val a = (1 to 100).map(i => (i % 10) * 10.0).toDF("v")
    val same = Profiler.drift(a, a, "v", 10.0).collect()
    assert(same.length == 10)
    assert(same.forall(r => r.getDouble(5) == 0.0))

    // b shifts mass toward high bins; PSI total must be positive and
    // one-sided bins (present in only a or only b) must be dropped.
    val b = (1 to 100).map(i => ((i % 5) + 5) * 10.0).toDF("v")
    val shifted = Profiler.drift(a, b, "v", 10.0).collect()
    assert(shifted.map(_.getLong(0)).toSet == (5 to 9).map(_.toLong).toSet)
    assert(shifted.map(_.getDouble(5)).sum > 0.1)
  }

  test("ksDriftBySide: hand-computed CDFs, one-sided bins kept, max = KS") {
    val s = spark
    import s.implicits._
    // Side A (even id): values 0,0,10,20 → bins 0,0,1,2
    // Side B (odd id):  values 0,10,10,30 → bins 0,1,1,3
    val df = Seq((0L, 0.0), (2L, 0.0), (4L, 10.0), (6L, 20.0),
      (1L, 0.0), (3L, 10.0), (5L, 10.0), (7L, 30.0)).toDF("id", "v")
    val out = Profiler.ksDriftBySide(df, col("id") % 2 === 0, "v", 10.0)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 0.5, 0.25, 0.25),
      (1L, 1L, 2L, 0.75, 0.75, 0.0),
      (2L, 1L, 0L, 1.0, 0.75, 0.25), // bin empty on B still reported
      (3L, 0L, 1L, 1.0, 1.0, 0.0)))
    assert(out.map(_._6).max == 0.25) // the KS statistic
  }

  test("ksDriftBySide is zero everywhere for identical halves") {
    val s = spark
    import s.implicits._
    // Duplicate every value onto both sides → CDFs coincide per bin.
    val df = (1 to 100).flatMap(i => Seq((0L, i * 1.0), (1L, i * 1.0)))
      .toDF("side", "v")
    val out = Profiler.ksDriftBySide(df, col("side") === 0, "v", 25.0)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(5) == 0.0))
  }
}
