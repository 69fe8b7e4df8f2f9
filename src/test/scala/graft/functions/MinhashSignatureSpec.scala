package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MinhashSignature

/** The native one-pass expression must be VALUE-IDENTICAL to the
  * portable HOF composition it replaced (which is also what every
  * DuckDB minhash oracle recomputes). */
class MinhashSignatureSpec extends SparkSpec {

  private val NumPerms = 16

  // A doGenCode bug would otherwise silently fall back to interpreted
  // eval and these specs would still pass — fail hard instead.
  private def withNoCodegenFallback[T](body: => T): T = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("native signature equals the portable HOF composition")(withNoCodegenFallback {
    val rnd = new Random(5)
    val s = spark
    import s.implicits._
    val docs = (Seq("", "one", "a b", "dup dup dup") ++
      Seq.fill(40)(Seq.fill(1 + rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")

    val toks = array_distinct(split(col("text"), " "))
    val native = df.select(col("doc_id"),
      MinhashSignature.ofColumn(toks, NumPerms).as("sig"))

    // The original composition, verbatim.
    val groups = NumPerms / 4
    val withHexes = df.withColumn("__tok_md5",
      transform(toks, t =>
        array((0 until groups).map(g => md5(concat_ws(":", lit(g), t))): _*)))
    val sigCols = (0 until NumPerms).map { k =>
      val (g, sl) = (k / 4, k % 4)
      array_min(transform(col("__tok_md5"), h =>
        conv(substring(element_at(h, g + 1), 1 + 8 * sl, 8), 16, 10).cast("long")))
    }
    val hof = withHexes.select(col("doc_id"), array(sigCols: _*).as("sig"))

    val n = native.orderBy("doc_id").collect().map(r => r.getSeq[Long](1))
    val h = hof.orderBy("doc_id").collect().map(r => r.getSeq[Long](1))
    assert(n.length == h.length)
    n.zip(h).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"doc $i: text='${docs(i)._2}'")
    }
  })

  test("empty token array yields a null signature (as array_min does)") {
    val s = spark
    import s.implicits._
    // split("", " ") gives [""], so force a truly empty array.
    val df = Seq(1L).toDF("id")
      .select(MinhashSignature.ofColumn(
        array().cast("array<string>"), NumPerms).as("sig"))
    assert(df.collect()(0).isNullAt(0))
  }
}
