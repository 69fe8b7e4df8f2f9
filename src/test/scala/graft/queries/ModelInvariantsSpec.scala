package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Analytic invariants of the round-9 model operators, checked on the
  * sf0.001 tables — properties the DuckDB oracle cannot express (it
  * replays the same arithmetic; these pin the MATH).
  */
class ModelInvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Kneser-Ney: discounted mass + backoff mass sums to 1 per context") {
    // P_KN(·|w1) is a probability distribution: Σ_observed (c−D)/c(w1)
    // + λ(w1)·Σ_all P_cont = 1 exactly, because Σ P_cont = 1 by
    // construction. Rebuild the model frames the query builds and
    // check the identity per context word.
    val s = spark
    import s.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
    val bg = docs.select(explode(org.apache.spark.sql.graft.WordShingles
        .positional(split(col("text"), " "), 2, hashed = false)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cbg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
    val perContext = bg.groupBy("w1")
      .agg(sum(col("cbg")).as("cw1"), count(lit(1)).as("n1p"))
      .select(col("w1"),
        ((col("cw1") - lit(0.75) * col("n1p")) / col("cw1") +
          lit(0.75) * col("n1p") / col("cw1")).as("total"))
    val off = perContext.where(abs(col("total") - 1.0) > 1e-12).count()
    assert(off == 0, s"$off contexts where KN mass != 1")
  }

  test("EB shrinkage: posterior mean lies between raw rate and prior mean") {
    // (x + m·c)/(n + c) is a convex combination of x/n and m, so every
    // shrunk rate must fall inside [min(raw, m), max(raw, m)] up to
    // the 6dp rounding both columns carry.
    val rows = Analytics.qEbShrinkage(spark, dir)
      .select("raw_rate", "shrunk_rate", "alpha", "beta").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getDouble(0); val shrunk = r.getDouble(1)
      val alpha = r.getDouble(2); val beta = r.getDouble(3)
      val m = alpha / (alpha + beta)
      val lo = math.min(raw, m) - 1e-6
      val hi = math.max(raw, m) + 1e-6
      assert(shrunk >= lo && shrunk <= hi,
        s"shrunk $shrunk outside [$lo, $hi] (raw $raw, prior $m)")
    }
  }

  test("CMS: estimates never undercount and stay within the e/w bound") {
    val rows = EventQueries.qeCms(spark, dir)
      .select("n_exact", "n_est", "within_bound").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0), "CMS underestimated a count")
      assert(r.getBoolean(2), "CMS overestimate exceeded the e/w bound")
    }
  }

  test("NB classifier: scores every test-split doc exactly once, finite margins") {
    val out = TextQueries.qtNbQuality(spark, dir).collect()
    val expected = graft.Tables.load(spark, dir, "documents")
      .where(graft.functions.Portable
        .md5Bucket("split", col("doc_id"), 100) >= 90)
      .count()
    assert(out.length.toLong == expected)
    out.foreach { r =>
      val margin = r.getDouble(3)
      assert(!margin.isNaN && !margin.isInfinite)
      val pred = r.getString(2)
      assert(pred == "hi" || pred == "lo")
      assert(r.getBoolean(4) == (pred == r.getString(1)))
    }
  }

  test("partition advisor: row counts exact, width estimate matches schema") {
    val out = qoRows()
    val lineitem = out("lineitem")
    val n = graft.Tables.load(spark, dir, "lineitem").count()
    assert(lineitem.getAs[Long]("n_rows") == n)
    // lineitem: 9 fixed-width cols (68 bytes) + 2 strings of length 1
    // (+4 overhead each) in this dataset => exactly 78 bytes/row when
    // every flag is a single char.
    val flagsAreChar1 = graft.Tables.load(spark, dir, "lineitem")
      .where(length(col("l_returnflag")) =!= 1 ||
        length(col("l_linestatus")) =!= 1).count() == 0
    if (flagsAreChar1) {
      assert(lineitem.getAs[Long]("est_bytes") == n * 78)
    }
    assert(out("region").getAs[Boolean]("broadcastable"))
  }

  private def qoRows(): Map[String, org.apache.spark.sql.Row] =
    OperatorQueries.qoPartitionAdvisor(spark, dir)
      .collect().map(r => r.getAs[String]("table_name") -> r).toMap
}
