package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val d = 5
  private val w = 64

  /** Deterministic skewed multiset of keys: key k appears (k % 7) + 1
    * times, keys 0..199. */
  private def keys: Seq[Long] =
    (0L until 200L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k))

  test("aggregator cells equal the grouped-sum query form") {
    val df = keys.toDF("k")
    val agg = df.agg(AmsSketch.sketch(d, w)(col("k")).as("s"))
      .as[Seq[Long]].head()
    // Reference cells via the Column forms (grouped md5-bucket sign
    // sums), which mirror the qo_join_cardinality_sketch oracle SQL
    // exactly — the aggregator must land on identical cells.
    val ref = (0 until d).foldLeft(new Array[Long](d * w)) { (acc, r) =>
      df.select(AmsSketch.bucketCol(r, col("k"), w).as("j"),
          AmsSketch.signCol(r, col("k")).as("s"))
        .groupBy("j").agg(sum("s").as("c"))
        .collect()
        .foreach(row => acc(r * w + row.getLong(0).toInt) = row.getLong(1))
      acc
    }
    assert(agg === ref.toSeq)
  }

  test("sketches of disjoint halves merge by cell addition to the full sketch") {
    val (h1, h2) = keys.splitAt(keys.length / 2)
    def sk(ks: Seq[Long]): Seq[Long] =
      ks.toDF("k").agg(AmsSketch.sketch(d, w)(col("k")).as("s"))
        .as[Seq[Long]].head()
    val merged = sk(h1).zip(sk(h2)).map { case (a, b) => a + b }
    assert(merged === sk(keys))
  }

  test("inner-product estimate tracks the exact join size") {
    val a = keys
    val b = (0L until 200L).flatMap(k => Seq.fill(((k + 3) % 5).toInt + 1)(k))
    def sk(ks: Seq[Long]): Seq[Long] =
      ks.toDF("k").agg(AmsSketch.sketch(d, w)(col("k")).as("s"))
        .as[Seq[Long]].head()
    val est = AmsSketch.innerProduct(sk(a), sk(b), d, w)
    val exact = {
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    }
    val rel = math.abs(est - exact).toDouble / exact
    assert(rel < 0.35, s"AMS estimate $est vs exact $exact (rel $rel)")
    // Self-join size (F2) estimate from one sketch vs exact.
    val f2est = AmsSketch.innerProduct(sk(a), sk(a), d, w)
    val f2 = a.groupBy(identity).values.map(v => v.size.toLong * v.size).sum
    assert(math.abs(f2est - f2).toDouble / f2 < 0.35,
      s"F2 estimate $f2est vs exact $f2")
  }
}
