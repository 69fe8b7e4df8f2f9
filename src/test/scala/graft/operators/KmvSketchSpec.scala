package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {

  private val k = 32

  private def sketchOf(hashes: Seq[Long], partitions: Int): Seq[Long] = {
    val s = spark
    import s.implicits._
    hashes.toDF("h").repartition(partitions)
      .agg(KmvSketch.kmins(k)(col("h")).as("km"))
      .first().getSeq[Long](0)
  }

  test("below k distinct values the sketch is exact") {
    val vals = Seq(5L, 3L, 9L, 1L, 7L)
    val km = sketchOf(vals, 3)
    assert(km == vals.sorted)
    assert(KmvSketch.estimate(km, k) == vals.size.toDouble)
  }

  test("duplicates are absorbed — repeated stream equals distinct stream") {
    val vals = (1L to 100L).flatMap(v => Seq.fill(5)(v))
    assert(sketchOf(vals, 7) == sketchOf((1L to 100L), 2))
    assert(sketchOf(vals, 7) == (1L to k.toLong))
  }

  test("result is independent of partitioning (merge associativity)") {
    val rng = new scala.util.Random(11)
    val vals = Seq.fill(5000)(rng.nextLong() & 0xffffffffL)
    val one = sketchOf(vals, 1)
    assert(sketchOf(vals, 13) == one)
    assert(sketchOf(vals, 32) == one)
    assert(one.length == k && one == one.sorted && one.distinct == one)
  }

  test("estimator lands near the true distinct count") {
    // 20k distinct values hashed portably; KMV std error ~ 1/sqrt(k-2).
    val s = spark
    import s.implicits._
    val n = 20000
    val km = (1 to n).map(i => s"value_$i").toDF("v")
      .agg(KmvSketch.kmins(64)(graft.functions.Portable.md5Hash32(col("v"))).as("km"))
      .first().getSeq[Long](0)
    val est = KmvSketch.estimate(km, 64)
    assert(math.abs(est - n) / n < 0.5, s"estimate $est vs true $n")
  }

  test("merged sketches estimate the union") {
    val a = (1L to 3000L)
    val b = (2000L to 5000L) // union = 5000 distinct
    val skA = sketchOf(a, 4)
    val skB = sketchOf(b, 4)
    val merged = new KmvSketch(k).merge(skA.toList, skB.toList)
    assert(merged == sketchOf(a ++ b, 8).toList)
  }
}
