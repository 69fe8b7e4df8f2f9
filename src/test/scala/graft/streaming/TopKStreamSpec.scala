package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStreams.RankEvent

/** [[EventStreams.runningTopK]] — streaming/batch parity: after every
  * trigger, the latest emission per key equals the batch
  * [[org.apache.spark.sql.graft.TopK]] operator over all events so far
  * (same value-desc, id-asc election), including displacement of an
  * earlier leader by a later trigger and tie-breaks across triggers.
  */
class TopKStreamSpec extends SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("latest emission per key equals batch TopK over the union of triggers") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[RankEvent]
    val query = EventStreams.runningTopK(stream.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    try {
      val batch1 = Seq(RankEvent("a", 10.0, 1), RankEvent("a", 30.0, 2),
        RankEvent("a", 20.0, 3), RankEvent("b", 5.0, 4))
      stream.addData(batch1: _*)
      query.processAllAvailable()
      val afterOne = spark.table("topk_out").count()
      // Trigger 1 leaderboard: a -> (30,id2),(20,id3); b -> (5,id4).
      assert(afterOne == 3)

      // Trigger 2: displaces a's #2, ties b's leader (id-asc wins),
      // and introduces a new key.
      val batch2 = Seq(RankEvent("a", 25.0, 5), RankEvent("b", 5.0, 0),
        RankEvent("c", 1.0, 6))
      stream.addData(batch2: _*)
      query.processAllAvailable()
      val all = spark.table("topk_out").collect()
      val latest = all.drop(afterOne.toInt)
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet

      // Batch reference over the union of both triggers.
      val union = (batch1 ++ batch2).toDF("key", "value", "id")
      val want = org.apache.spark.sql.graft.TopK
        .perKey(union, Seq("key"), Seq(col("value").desc, col("id").asc), 2)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("key")
            .orderBy(col("value").desc, col("id").asc)))
        .select("key", "rank", "id", "value").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(latest == want)
      // Displacement + tie-break specifics.
      assert(latest.contains(("a", 2, 5L, 25.0))) // 25 displaced 20
      assert(latest.contains(("b", 1, 0L, 5.0)))  // tie at 5.0: id 0 wins
    } finally query.stop()
  }
}
