package graft.dedup

import graft.SparkSpec

/** [[Dedup.adamicAdar]] — hand-computed scores on pinned graphs. */
class AdamicAdarSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], cap: Int = 64, topN: Int = 50)
      : Seq[(Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    Dedup.adamicAdar(edges.toDF("id_a", "id_b"), cap, topN)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
  }

  test("path 1-2-3: one candidate (1,3) scored 1/ln(deg 2)") {
    val got = run(Seq((1L, 2L), (2L, 3L)))
    assert(got.size == 1)
    val (a, b, common, score) = got.head
    assert((a, b, common) == (1L, 3L, 1L))
    assert(math.abs(score - 1.0 / math.log(2.0)) < 1e-6)
  }

  test("square 1-2-3-4: both diagonals share TWO degree-2 centers") {
    // Edges 1-2, 2-3, 3-4, 4-1. Non-adjacent pairs (1,3) and (2,4)
    // each have two common neighbors of degree 2.
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    val expected = 2.0 / math.log(2.0)
    assert(got.size == 2)
    assert(got.map(g => (g._1, g._2, g._3)).toSet ==
      Set((1L, 3L, 2L), (2L, 4L, 2L)))
    got.foreach(g => assert(math.abs(g._4 - expected) < 1e-6))
  }

  test("existing edges are excluded; triangle yields no candidates") {
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
  }

  test("hub centers above the degree cap contribute no wedges") {
    // Star: center 10 joined to 1..5 (degree 5). With cap 4 the hub is
    // excluded and no leaf pair is produced; with cap 64 all C(5,2)
    // leaf pairs appear, each scored 1/ln(5).
    val star = (1L to 5L).map(l => (10L, l))
    assert(run(star, cap = 4).isEmpty)
    val full = run(star, cap = 64)
    assert(full.size == 10)
    full.foreach(g => assert(math.abs(g._4 - 1.0 / math.log(5.0)) < 1e-6))
  }

  test("reversed/duplicate edges canonicalize; topN cut is honored") {
    val got = run(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L)), topN = 1)
    assert(got.size == 1)
    assert((got.head._1, got.head._2) == (1L, 3L))
  }
}
