package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  test("salted join returns exactly the plain join result") {
    val s = spark
    import s.implicits._
    // One hot key (k=1 dominates) plus normal keys.
    val big = ((1 to 500).map(i => (1L, s"row$i")) ++
      Seq((2L, "a"), (3L, "b"))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "two"), (4L, "unmatched"))
      .toDF("k", "label")

    val plain = big.join(small, "k").collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(big, small, "k", 8).collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
    assert(salted.length == 501)
  }
}
