package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[Profiler.sequenceGaps]]'s bucketed decomposition to the
  * naive global-LEAD answer: in-bucket gaps ∪ cross-bucket gaps must be
  * exactly the gaps of the fused sequence, for key sets that exercise
  * bucket boundaries, fully empty buckets, and duplicates. */
class SequenceGapsSpec extends SparkSpec {

  private def naive(keys: Seq[Long]): Seq[(Long, Long, Long)] = {
    val sorted = keys.distinct.sorted
    sorted.zip(sorted.drop(1)).collect {
      case (a, b) if b > a + 1 => (a + 1, b - 1, b - a - 1)
    }
  }

  private def run(keys: Seq[Long], bucketSize: Long): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Profiler.sequenceGaps(keys.toDF("k"), "k", bucketSize)
      .orderBy("gap_start")
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("bucketed gaps == global-lead gaps on randomized key sets") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      // Sparse draws from a range many buckets wide (bucketSize 8), so
      // trials hit empty buckets, boundary-adjacent keys, and multi-
      // bucket gaps; duplicates are injected to test the distinct.
      val n = 5 + rnd.nextInt(60)
      val keys = Seq.fill(n)(rnd.nextInt(200).toLong)
      assert(run(keys ++ keys.take(3), 8) === naive(keys), s"trial $trial: $keys")
    }
  }

  test("dense sequence has no gaps; boundary gap is found") {
    assert(run(0L to 40L, 8).isEmpty)
    // 7 and 9 flank bucket boundary 8 (bucketSize 8): the gap {8} is
    // cross-bucket only.
    assert(run(Seq(7L, 9L), 8) === Seq((8L, 8L, 1L)))
    // A gap spanning two entirely empty buckets (keys in buckets 0, 3).
    assert(run(Seq(5L, 30L), 8) === Seq((6L, 29L, 24L)))
  }

  test("degenerate inputs: empty and single-key frames") {
    import spark.implicits._
    assert(Profiler.sequenceGaps(Seq.empty[Long].toDF("k"), "k", 8).count() === 0)
    assert(run(Seq(17L), 8).isEmpty)
  }
}
