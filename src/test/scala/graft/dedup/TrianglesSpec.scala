package graft.dedup

import graft.SparkSpec
import scala.util.Random

/** [[Dedup.trianglesPerVertex]] — randomized equivalence to a driver
  * brute-force count, plus pinned shapes. */
class TrianglesSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Dedup.trianglesPerVertex(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    val verts = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    for {
      Seq(a, b, c) <- verts.combinations(3)
      if e((a, b)) && e((b, c)) && e((a, c))
      v <- Seq(a, b, c)
    } counts(v) = counts.getOrElse(v, 0L) + 1
    counts.toMap
  }

  test("K4 gives every vertex 3 triangles; a path gives none") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(run(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == Map.empty)
  }

  test("duplicate and reversed edges do not inflate counts") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 1L), (3L, 2L), (1L, 2L))
    assert(run(tri) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clustering coefficient: 1.0 on a clique, 0.0 on a star hub") {
    val s = spark
    import s.implicits._
    // K3 {1,2,3} plus a star center 4 joined to 1 and to leaves 5, 6.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 1L), (4L, 5L), (4L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusteringCoefficient(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(2L) == ((2L, 1L, 1.0)))   // in the triangle only
    assert(out(3L) == ((2L, 1L, 1.0)))
    assert(out(4L) == ((3L, 0L, 0.0)))   // star hub, no closed wedge
    assert(out(1L) == ((3L, 1L, 0.333333))) // 1 triangle of 3 possible
    // Degree-1 leaves are excluded (undefined denominator).
    assert(!out.contains(5L) && !out.contains(6L))
  }

  test("kCore peels to the brute-force fixpoint on randomized graphs") {
    val s = spark
    import s.implicits._
    def bruteCore(k: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      var e = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.toSet
      var changed = true
      while (changed) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (v, g) => v -> g.size }
        val drop = deg.collect { case (v, d) if d < k => v }.toSet
        changed = drop.nonEmpty
        e = e.filter(p => !drop(p._1) && !drop(p._2))
      }
      e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    }
    val rnd = new Random(43)
    // A long tail path forces several peeling rounds; random edges give
    // a nontrivial surviving core.
    val n = 20
    val edges = Seq.fill(2 * n)((1L + rnd.nextInt(n), 1L + rnd.nextInt(n))) ++
      (20L until 28L).map(i => (i, i + 1))
    for (k <- Seq(2, 3)) {
      val got = Dedup.kCore(edges.toDF("id_a", "id_b"), k).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteCore(k, edges), s"k=$k")
    }
  }

  test("pageRank: uniform on regular graphs, mass-conserving, hub-heavy") {
    val s = spark
    import s.implicits._
    def run(edges: Seq[(Long, Long)]): Map[Long, Double] =
      Dedup.pageRank(edges.toDF("id_a", "id_b"), iterations = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 6-cycle: uniform is the exact fixed point, so PR = 1/6 everywhere.
    val cycle = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1))
    val cr = run(cycle)
    assert(cr.size == 6)
    cr.values.foreach(v => assert(math.abs(v - 1.0 / 6) < 1e-9))
    // Star: the hub outranks every leaf; total mass stays 1 (undirected
    // graph has no dangling vertices).
    val star = (2L to 6L).map(i => (1L, i))
    val sr = run(star)
    assert(sr(1L) > sr(2L) * 2)
    assert((2L to 6L).map(sr).distinct.size == 1)
    assert(math.abs(sr.values.sum - 1.0) < 1e-6)
    // Random graph: matches a driver-side double-precision power
    // iteration to well under the DECIMAL quantization noise floor.
    val rnd = new Random(47)
    val n = 15
    val edges = Seq.fill(2 * n)((1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.distinct
    val adj = (und ++ und.map(p => (p._2, p._1))).groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2) }
    val nd = adj.size.toDouble
    var pr = adj.keys.map(_ -> 1.0 / nd).toMap
    for (_ <- 1 to 10) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((v, ns) <- adj; u <- ns)
        contrib(u) += pr(v) / ns.size
      pr = adj.keys.map(v => v -> (0.15 / nd + 0.85 * contrib(v))).toMap
    }
    val got = run(edges)
    assert(got.keySet == pr.keySet)
    got.foreach { case (v, p) => assert(math.abs(p - pr(v)) < 1e-8, s"v=$v") }
  }

  test("randomized graphs match the brute-force triangle count") {
    val rnd = new Random(31)
    for (trial <- 0 until 2) {
      val n = 14 + trial * 6
      val edges = Seq.fill(3 * n)(
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
      assert(run(edges) == brute(edges), s"trial $trial")
    }
  }
}
