package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Malformed-ingest routing: clean rows parse to the schema, broken
  * rows land raw in the quarantine frame, and nothing is silently
  * nulled or dropped. */
class CsvQuarantineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("clean and broken rows split without loss") {
    val dir = Files.createDirectories(
      Paths.get("/tmp/graft_csv_quarantine")).toString
    val f = s"$dir/input.csv"
    Files.writeString(Paths.get(f),
      """id,name,score
        |1,alpha,1.5
        |2,beta,not_a_number
        |3,gamma,0.25
        |4,delta,2.0,EXTRA_FIELD_MAKES_THIS_MALFORMED_TOO
        |""".stripMargin)
    val result = CsvQuarantine.read(spark, f, schema)
    val (clean, bad) = (result.clean, result.quarantined)
    val cleanRows = clean.collect()
    assert(cleanRows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // parsed values survive intact on the clean side
    assert(cleanRows.find(_.getLong(0) == 3L).get.getDouble(2) == 0.25)
    // quarantine carries the raw text, so triage sees the original line
    val rawLines = bad.collect().map(_.getString(0)).toSet
    assert(rawLines.exists(_.contains("not_a_number")))
    assert(rawLines.exists(_.contains("EXTRA_FIELD")))
    assert(rawLines.size == 2)
    // together: no row lost
    assert(clean.count() + bad.count() == 4)
    result.release() // drop the shared parse cache
  }

  test("streaming ingest routes micro-batches through the same split") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createDirectories(
      Paths.get("/tmp/graft_csv_quarantine_stream/in")).toString
    Files.writeString(Paths.get(s"$dir/part1.csv"),
      """id,name,score
        |1,alpha,1.5
        |2,beta,broken_score
        |""".stripMargin)
    Files.writeString(Paths.get(s"$dir/part2.csv"),
      """id,name,score
        |3,gamma,0.25
        |""".stripMargin)
    val cleanIds = scala.collection.mutable.Set.empty[Long]
    val badLines = scala.collection.mutable.Set.empty[String]
    val q = CsvQuarantine.readStream(spark, dir, schema)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (clean, bad) = CsvQuarantine.split(batch.cache(), schema)
        cleanIds.synchronized {
          cleanIds ++= clean.collect().map(_.getLong(0))
          badLines ++= bad.collect().map(_.getString(0))
        }
        batch.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        "/tmp/graft_csv_quarantine_stream/ckpt_" + System.nanoTime())
      .start()
    q.awaitTermination(60000)
    assert(cleanIds == Set(1L, 3L))
    assert(badLines.size == 1 && badLines.head.contains("broken_score"))
  }

  test("JSON-lines quarantine routes broken objects like the CSV reader") {
    val dir = Files.createDirectories(
      Paths.get("/tmp/graft_json_quarantine")).toString
    val f = s"$dir/input.jsonl"
    Files.writeString(Paths.get(f),
      """{"id": 1, "name": "alpha", "score": 1.5}
        |{"id": 2, "name": "beta", "score": TRUNCATED
        |{"id": 3, "name": "gamma", "score": 0.25}
        |not json at all
        |""".stripMargin)
    val result = JsonQuarantine.read(spark, f, schema)
    assert(result.clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val raw = result.quarantined.collect().map(_.getString(0)).toSet
    assert(raw.exists(_.contains("TRUNCATED")))
    assert(raw.exists(_.contains("not json at all")))
    assert(result.clean.count() + result.quarantined.count() == 4)
    result.release()
  }

  test("rejects a schema that collides with the corrupt column") {
    val bad = schema.add(CsvQuarantine.CorruptCol, StringType)
    intercept[IllegalArgumentException] {
      CsvQuarantine.read(spark, "/tmp/never_read.csv", bad)
    }
  }
}
