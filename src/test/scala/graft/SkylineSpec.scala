package graft

import scala.util.Random

import graft.operators.Skyline

/** Pins [[Skyline.skyline2D]] to the brute-force dominance definition,
  * including the exact-tie rule, on random integer point sets dense
  * enough to force x-ties, y-ties and full (x, y) coincidences. */
class SkylineSpec extends SparkSpec {

  test("skyline2D equals brute-force dominance with the lowest-key tie rule") {
    val rnd = new Random(7)
    val s = spark
    import s.implicits._
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(60)
      // Tiny value ranges on purpose: collisions in x, in y, and in
      // both at once must all occur for the tie rule to be exercised.
      val pts = (0 until n).map(k =>
        (k.toLong, s"g${rnd.nextInt(2)}", rnd.nextInt(6).toLong,
          rnd.nextInt(6).toLong))
      val df = pts.toDF("key", "grp", "x", "y")

      val expected = pts.filter { case (k, g, x, y) =>
        !pts.exists { case (k2, g2, x2, y2) =>
          g2 == g && (
            // pure Pareto dominance (>= both, > at least one)
            (x2 >= x && y2 >= y && (x2 > x || y2 > y)) ||
            // coincident point: lowest key is the one representative
            (x2 == x && y2 == y && k2 < k))
        }
      }.toSet

      val got = Skyline.skyline2D(df, "grp", "key", "x", "y")
        .collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[String]("grp"),
          r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet
      assert(got == expected, s"trial=$trial n=$n")
    }
  }
}
