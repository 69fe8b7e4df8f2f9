package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PrefixJoinSpec extends SparkSpec {

  /** Brute-force reference: all-pairs exact Jaccard over distinct
    * whitespace tokens. */
  private def brute(df: DataFrame, tau: Double): Set[(Long, Long, Int)] = {
    val toks = df.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    (for {
      a <- toks.keys; b <- toks.keys if a < b
      inter = (toks(a) & toks(b)).size
      jac = inter.toDouble / (toks(a).size + toks(b).size - inter)
      if jac >= tau
    } yield (a, b, inter)).toSet
  }

  private def run(df: DataFrame, tau: Double): Set[(Long, Long, Int)] =
    Dedup.prefixJaccardJoin(df, "text", "doc_id", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("finds exactly the brute-force pairs on crafted docs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat", // 8/10 = 0.8
      3L -> "quick brown fox jumps",                       // subset of 1
      4L -> "completely different words here entirely",
      5L -> "the quick brown fox jumps over the lazy dog"  // exact dup of 1
    ).toDF("doc_id", "text")
    assert(run(df, 0.6) == brute(df, 0.6))
    // 8 distinct tokens per doc ("the" repeats); docs 1,2 share 7.
    assert(run(df, 0.6).contains((1L, 5L, 8)))  // exact dup survives
    assert(run(df, 0.6).contains((1L, 2L, 7)))  // 7/9 = 0.78 >= 0.6
    assert(!run(df, 0.9).contains((1L, 2L, 7))) // 0.78 < 0.9
  }

  test("boundary: a pair at exactly tau is kept") {
    val s = spark
    import s.implicits._
    // |A|=|B|=4, inter=3 -> jaccard = 3/5 = 0.6 exactly.
    val df = Seq(
      1L -> "a b c d",
      2L -> "a b c e"
    ).toDF("doc_id", "text")
    assert(run(df, 0.6) == Set((1L, 2L, 3)))
  }

  test("matches brute force on deterministic pseudo-random corpora") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"w$i")
    val docs = (1L to 60L).map { id =>
      val base = rng.shuffle(vocab).take(5 + rng.nextInt(10))
      id -> base.mkString(" ")
    }
    // Plant near-dups: copy some docs with one token changed.
    val planted = docs.take(10).map { case (id, t) =>
      (id + 1000L) -> (t.split(" ").dropRight(1) :+ "w99").mkString(" ")
    }
    val df = (docs ++ planted).toDF("doc_id", "text")
    for (tau <- Seq(0.5, 0.7, 0.9))
      assert(run(df, tau) == brute(df, tau), s"tau=$tau")
  }

  test("shingle mode (n=3) matches brute force over 3-gram sets") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val vocab = (0 until 20).map(i => s"w$i")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(6 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val planted = docs.take(8).map { case (id, t) =>
      (id + 1000L) -> (t + " extra") } // high shingle overlap
    val df = (docs ++ planted).toDF("doc_id", "text")
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val expected = {
      val m = df.collect().map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
      (for {
        a <- m.keys; b <- m.keys
        if a < b && m(a).nonEmpty && m(b).nonEmpty
        inter = (m(a) & m(b)).size
        if inter.toDouble / (m(a).size + m(b).size - inter) >= 0.6
      } yield (a, b, inter)).toSet
    }
    val got = Dedup.prefixJaccardJoin(df, "text", "doc_id", 0.6, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(expected.nonEmpty) // the planted near-dups must be found
  }

  test("positional filter keeps exact-tau boundary pairs of unequal sizes") {
    val s = spark
    import s.implicits._
    // |A|=9, |B|=6, inter=6 (B ⊂ A): J = 6/9 = 2/3; required overlap at
    // tau=2/3 is (2/3)/(5/3)*15 = 6 — the filter's >= comparison sits
    // exactly on the boundary, where a non-conservative epsilon or a
    // wrong rank base (prefix rank instead of full-list rank) would
    // drop the pair.
    val df = Seq(
      1L -> "a b c d e f g h i",
      2L -> "a b c d e f"
    ).toDF("doc_id", "text")
    val got = run(df, 2.0 / 3.0)
    assert(got == brute(df, 2.0 / 3.0) && got.contains((1L, 2L, 6)))
  }

  test("positional filter prunes candidate rows before the pair distinct") {
    val s = spark
    import s.implicits._
    // Docs share one mid-rarity token but nothing else: every collision
    // row fails 1 + min(sz−rn) >= tau/(1+tau)·(szA+szB), so ZERO pairs
    // reach verification — without the positional filter each such pair
    // costs a distinct-exchange row plus two verify-join probes.
    val df = Seq.tabulate(30)(i =>
      (i.toLong, (s"shared u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g")))
      .toDF("doc_id", "text")
    assert(run(df, 0.6) == brute(df, 0.6))
    assert(brute(df, 0.6).isEmpty)
  }

  test("prefix index is smaller than the full posting index") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(40)(i =>
      (i.toLong, (0 to 10).map(j => s"t${(i + j) % 25}").distinct.mkString(" ")))
      .toDF("doc_id", "text")
    val fullPostings = df
      .select(explode(array_distinct(split(col("text"), " "))))
      .count()
    // tau=0.8 keeps ceil(0.2*|d|)+1 tokens per doc — far below |d|.
    val run08 = run(df, 0.8) // force evaluation; correctness via brute
    assert(run08 == brute(df, 0.8))
    val prefixLen = df.select(
      sum(size(array_distinct(split(col("text"), " "))) -
        ceil(size(array_distinct(split(col("text"), " "))) * 0.8) + 1))
      .first().getLong(0)
    assert(prefixLen < fullPostings / 2)
  }
}
