package graft.dedup

import graft.SparkSpec
import graft.functions.Portable.{md5Hash32, tokens}
import org.apache.spark.sql.functions._

/** The property that justifies content-defined chunking over fixed
  * windows (SURVEY §2 item 24h): an insertion near the front of a
  * document shifts every fixed window after it, but CDC re-synchronizes
  * at the next content boundary — all chunks after that boundary are
  * byte-identical to the original document's, so a chunk store still
  * dedups the unchanged tail. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  /** The same chunking expression qd_cdc_chunks uses. */
  private def chunksOf(textCol: String) = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val bpos = filter(sequence(lit(1), n),
      i => md5Hash32(element_at(toks, i)) % 8 === 0)
    val edges = array_distinct(concat(array(lit(0)), bpos, array(n)))
    transform(sequence(lit(1), size(edges) - 1),
      j => array_join(
        slice(toks, element_at(edges, j) + 1,
          element_at(edges, j + 1) - element_at(edges, j)), " "))
  }

  private def chunk(text: String): Seq[String] =
    Seq(text).toDF("text").select(chunksOf("text").as("c"))
      .as[Seq[String]].head()

  test("chunks partition the token stream exactly") {
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val cs = chunk(text)
    assert(cs.mkString(" ") === text)
    assert(cs.forall(_.nonEmpty))
  }

  test("an insertion re-synchronizes at the next content boundary") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val edited = "INSERTED " + base
    val (a, b) = (chunk(base), chunk(edited))
    // The tail chunks re-align: every original chunk except possibly the
    // first reappears verbatim in the edited chunking.
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.size - 1,
      s"CDC must re-sync after one boundary; shared=${shared.size} of ${a.size}")
    // The fixed-window counterexample: 8-token windows of the edited
    // text share NO window with the original (everything shifted by 1).
    def windows(t: String) = t.split(" ").grouped(8).map(_.mkString(" ")).toSet
    assert(windows(base).intersect(windows(edited)).isEmpty)
  }

  test("boundary decisions are content-local (same token set, same cuts)") {
    // Two documents sharing a suffix chunk the suffix identically even
    // with different prefixes — the storage-dedup guarantee.
    val tail = (1 to 40).map(i => s"t$i").mkString(" ")
    val d1 = "alpha beta " + tail
    val d2 = "gamma delta epsilon zeta " + tail
    val shared = chunk(d1).toSet.intersect(chunk(d2).toSet)
    assert(shared.nonEmpty, "shared suffix must produce shared chunks")
  }
}
