package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomAntiJoinSpec extends SparkSpec {

  test("no false negatives; survivors subset of the exact anti-join") {
    val s = spark
    import s.implicits._
    val corpus = (1L to 2000L).map(i => (i, s"doc_$i")).toDF("id", "content")
    val blocked = (1L to 2000L by 7).map(i => s"doc_$i").toDF("bad")

    val got = BloomAntiJoin.antiJoin(corpus, blocked, "content", "bad",
      expectedItems = 1000L, numBits = 1L << 20)
    val exact = corpus.join(blocked, corpus("content") === blocked("bad"),
      "left_anti")

    // A blocked key can never survive...
    assert(got.join(blocked, got("content") === blocked("bad")).count() == 0)
    // ...and the only extra drops are Bloom false positives.
    assert(got.exceptAll(exact).isEmpty)
    val exactCount = exact.count()
    val gotCount = got.count()
    assert(gotCount <= exactCount)
    // With 2^20 bits for 286 items the fp rate is ~0 — expect near-exact.
    assert(gotCount >= (exactCount * 0.99).toLong)
  }

  test("NULL keys follow anti-join semantics: they always survive") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "doc_1"), (2L, null.asInstanceOf[String]),
      (3L, "doc_3")).toDF("id", "content")
    val blocked = Seq("doc_1", null.asInstanceOf[String]).toDF("bad")
    val got = BloomAntiJoin.antiJoin(corpus, blocked, "content", "bad")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L)) // null row survives, doc_1 dropped
  }

  test("empty blocklist blocks nothing") {
    val s = spark
    import s.implicits._
    val corpus = (1L to 10L).map(i => (i, s"doc_$i")).toDF("id", "content")
    val none = Seq.empty[String].toDF("bad")
    assert(BloomAntiJoin.antiJoin(corpus, none, "content", "bad").count() == 10)
  }

  test("exactAntiJoin equals the plain left-anti join, including NULLs") {
    val s = spark
    import s.implicits._
    val corpus = ((1L to 500L).map(i => (i, s"doc_${i % 97}")) :+
      (501L, null.asInstanceOf[String])).toDF("id", "content")
    val blocked = (0 until 30).map(i => s"doc_$i").toDF("bad")
    // Tiny filter (64 bits for 30 items) to force real false positives:
    // the suspects path must scrub every one of them.
    val got = BloomAntiJoin.exactAntiJoin(corpus, blocked, "content", "bad",
      expectedItems = 30, numBits = 64)
      .select("id").as[Long].collect().sorted.toSeq
    val want = corpus.join(blocked, col("content") === col("bad"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.contains(501L)) // NULL key survives
    assert(got.size < 501)     // something was actually blocked
  }
}
