package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Portable._

class PortableSpec extends SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column): T = {
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")
  }

  test("md5Hash32 matches the public md5 of the input") {
    // md5("abc") = 900150983cd24fb0..., first 8 hex = 0x90015098.
    assert(one[Long](md5Hash32(lit("abc"))) == 0x90015098L)
  }

  test("dot is an exact left-to-right fold with HOF-identical null semantics") {
    val a = typedLit(Seq(1.0, 2.0, 3.0))
    val b = typedLit(Seq(4.0, 5.0, 6.0))
    assert(one[Double](dot(a, b)) == 32.0)
    // Codegen expression must agree with the interpreted HOF chain.
    val hof = aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
    assert(one[Double](dot(a, b)) == one[Double](hof))
    // Mismatched lengths: zip_with pads with null, poisoning the fold —
    // both the HOF chain and DotProduct yield NULL.
    val short = typedLit(Seq(10.0))
    val hofShort = aggregate(zip_with(a, short, _ * _), lit(0.0), _ + _)
    val row = spark.range(1)
      .select(dot(a, short).as("d"), hofShort.as("h")).collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("shingles: distinct n-grams; empty below n tokens") {
    val toks = split(lit("a b a b c"), " ")
    val sh = one[collection.Seq[String]](shingles(toks, 2))
    assert(sh.length == 3) // "a b" (dup dropped), "b a", "b c"
    assert(one[collection.Seq[String]](shingles(split(lit("a"), " "), 2)).isEmpty)
  }

  test("countIn counts only vocabulary tokens") {
    val toks = split(lit("the cat the dog"), " ")
    assert(one[Int](countIn(toks, Seq("the", "dog"))) == 3)
  }
}
