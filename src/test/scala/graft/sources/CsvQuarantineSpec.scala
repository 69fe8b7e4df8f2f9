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
    val (clean, bad) = CsvQuarantine.read(spark, f, schema)
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
  }

  test("rejects a schema that collides with the corrupt column") {
    val bad = schema.add(CsvQuarantine.CorruptCol, StringType)
    intercept[IllegalArgumentException] {
      CsvQuarantine.read(spark, "/tmp/never_read.csv", bad)
    }
  }
}
