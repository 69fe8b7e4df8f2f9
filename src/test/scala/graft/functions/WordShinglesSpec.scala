package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WordShingles

/** The native one-pass shingler must be VALUE-IDENTICAL (content AND
  * order) to the portable HOF composition it replaced, which is what
  * every n-gram oracle recomputes. */
class WordShinglesSpec extends SparkSpec {

  private def hofShingles(toks: org.apache.spark.sql.Column, n: Int,
      hashed: Boolean) = {
    val piece = (i: org.apache.spark.sql.Column) =>
      concat_ws(" ", slice(toks, i, lit(n)))
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => if (hashed) md5(piece(i)) else piece(i))))
      .otherwise(array().cast("array<string>"))
  }

  // A doGenCode bug would otherwise silently fall back to interpreted
  // eval and this spec would still pass — fail hard instead.
  private def withNoCodegenFallback[T](body: => T): T = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("native shingles equal the portable composition, both variants")(withNoCodegenFallback {
    val rnd = new Random(3)
    val s = spark
    import s.implicits._
    val docs = (Seq("", "one", "a b", "a b c", "x x x x",
      "repeat repeat repeat repeat repeat") ++
      Seq.fill(40)(Seq.fill(rnd.nextInt(15))(
        rnd.alphanumeric.take(1 + rnd.nextInt(5)).mkString).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    for (n <- Seq(1, 3, 5); hashed <- Seq(true, false)) {
      val toks = split(col("text"), " ")
      val got = df.select(col("doc_id"),
        WordShingles.ofColumn(toks, n, hashed).as("sh"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1))
      val want = df.select(col("doc_id"),
        hofShingles(toks, n, hashed).as("sh"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1))
      got.zip(want).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"n=$n hashed=$hashed doc $i '${docs(i)._2}'")
      }
    }
  })

  test("positional shingles equal the non-distinct composition")(withNoCodegenFallback {
    val rnd = new Random(7)
    val s = spark
    import s.implicits._
    val docs = (Seq("", "one", "a b c", "x x x x x x",
      "repeat repeat repeat repeat repeat repeat repeat") ++
      // Tight alphabet so duplicate shingles actually occur.
      Seq.fill(40)(Seq.fill(rnd.nextInt(20))(
        "abc".charAt(rnd.nextInt(3)).toString).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    for (n <- Seq(2, 5); hashed <- Seq(true, false)) {
      val toks = split(col("text"), " ")
      val piece = (i: org.apache.spark.sql.Column) =>
        concat_ws(" ", slice(toks, i, lit(n)))
      val portable = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => if (hashed) md5(piece(i)) else piece(i)))
        .otherwise(array().cast("array<string>"))
      val got = df.select(col("doc_id"),
        WordShingles.positional(toks, n, hashed).as("sh"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1))
      val want = df.select(col("doc_id"), portable.as("sh"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1))
      got.zip(want).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"n=$n hashed=$hashed doc $i '${docs(i)._2}'")
      }
    }
  })
}
