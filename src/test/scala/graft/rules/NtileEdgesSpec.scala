package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Profiler.exactNtileEdges]] replaces a global single-task
  * `ntile(n) OVER (ORDER BY v)` window with a distributed two-level
  * rank select. This spec pins BIT-IDENTICAL edges between the two
  * forms across the shapes that break naive quantile code: duplicates,
  * constant columns, N < nBins, N barely ≥ nBins, skewed ranges, and
  * negative values. The oracle contract (DuckDB NTILE) rides on this
  * equivalence.
  */
class NtileEdgesSpec extends SparkSpec {

  /** The literal window form the distributed one must reproduce. */
  private def ntileEdges(vals: DataFrame, nBins: Int): Seq[Double] =
    vals.withColumn("__t", ntile(nBins).over(Window.orderBy("__v")))
      .where(col("__t") < nBins)
      .groupBy("__t").agg(max(col("__v")).as("__e"))
      .agg(sort_array(collect_list(col("__e"))).as("__es"))
      .collect()(0).getSeq[Double](0)

  private def distEdges(vals: DataFrame, nBins: Int): Seq[Double] =
    Profiler.exactNtileEdges(vals, nBins)
      .collect()(0).getSeq[Double](0)

  private def check(values: Seq[Double], nBins: Int, clue: String): Unit = {
    val s = spark
    import s.implicits._
    val df = values.toDF("__v")
    assert(distEdges(df, nBins) == ntileEdges(df, nBins), clue)
  }

  test("uniform distinct values, several bin counts") {
    val vs = (1 to 100).map(_.toDouble)
    for (n <- Seq(2, 3, 7, 10, 33)) check(vs, n, s"uniform nBins=$n")
  }

  test("heavy duplication: three distinct values across 1000 rows") {
    val vs = Seq.fill(600)(1.0) ++ Seq.fill(300)(2.0) ++ Seq.fill(100)(3.0)
    for (n <- Seq(2, 4, 10)) check(vs, n, s"dups nBins=$n")
  }

  test("constant column: every edge equals the single value") {
    check(Seq.fill(50)(42.0), 10, "constant")
  }

  test("N < nBins: one edge per row, ntile's degenerate tiling") {
    check(Seq(5.0, 1.0, 3.0), 10, "N=3 nBins=10")
    check(Seq(2.0), 10, "N=1 nBins=10")
  }

  test("N == nBins and N == nBins+1 boundary") {
    check((1 to 10).map(_.toDouble), 10, "N==nBins")
    check((1 to 11).map(_.toDouble), 10, "N==nBins+1")
  }

  test("range skew: nearly all mass in one coarse bucket") {
    // 999 values in [0,1), one at 1e9 — equal-width coarse buckets put
    // the low mass in bucket 1; the fine pass must still rank inside it.
    val vs = (0 until 999).map(_ / 1000.0) :+ 1e9
    for (n <- Seq(4, 10)) check(vs, n, s"skew nBins=$n")
  }

  test("negative and mixed-sign values") {
    val vs = (-50 to 49).map(_ * 1.5)
    check(vs, 10, "mixed sign")
  }

  test("randomized parity, seeded") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val size = 1 + rnd.nextInt(500)
      val dups = 1 + rnd.nextInt(5)
      val vs = Seq.fill(size)(math.floor(rnd.nextDouble() * size / dups))
      val n = 2 + rnd.nextInt(12)
      check(vs, n, s"trial=$trial size=$size nBins=$n")
    }
  }

  test("empty reference side yields an empty edge array") {
    val s = spark
    import s.implicits._
    val df = Seq.empty[Double].toDF("__v")
    assert(distEdges(df, 10).isEmpty)
  }
}
