package graft.dedup

import graft.SparkSpec

class SortedNeighborSpec extends SparkSpec {

  private def shingles3(t: String): Set[String] =
    t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet

  test("adjacent-in-sort near-dups are found, far-in-sort ones are the documented miss") {
    val s = spark
    import s.implicits._
    val df = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota", // same prefix block
      3L -> "zzz completely unrelated text here now",
      // Same content as 1 but key diverges in char 1 -> different block:
      4L -> "XXalpha beta gamma delta epsilon zeta eta theta"
    ).toDF("doc_id", "text")
    val got = Dedup.sortedNeighborPairs(df, "text", "doc_id",
      blockLen = 6, windowSize = 3, n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // 4 is in another block: the SNM blind spot
  }

  test("window bound holds: pairs beyond rank distance w are not candidates") {
    val s = spark
    import s.implicits._
    // All share the 6-char prefix block "shared"; within the block the
    // sort order follows the varying letter, so rank order == id order.
    val texts = ('a' to 'f').map(c => s"shared $c tail words one two three four five")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.sortedNeighborPairs(df, "text", "doc_id",
      blockLen = 6, windowSize = 2, n = 3, minJaccard = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    assert(got.forall { case (a, b) => b - a <= 2 }) // rank order == id order here
    assert(!got.contains((0L, 5L)))
  }

  test("verification matches exact shingle Jaccard on candidate pairs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      1L -> "one two three four five six seven",
      2L -> "one two three four five six eight"
    ).toDF("doc_id", "text")
    val row = Dedup.sortedNeighborPairs(df, "text", "doc_id",
      blockLen = 4, windowSize = 5, n = 3, minJaccard = 0.1)
      .collect().head
    val (sa, sb) = (shingles3("one two three four five six seven"),
      shingles3("one two three four five six eight"))
    val inter = (sa & sb).size
    assert(row.getInt(2) == inter)
    assert(row.getDouble(3) == inter.toDouble / (sa.size + sb.size - inter))
  }
}
