package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, IsNotNull, LessThan}

import graft.SparkSpec

/** [[SynthDataSource]] — the DSv2 surface: partition elision from
  * pushed id-range filters, post-scan residual filters, column pruning
  * down to the generator, and cross-engine determinism of the cells.
  */
class SynthDataSourceSpec extends SparkSpec {

  private def read(rows: Long, parts: Int) =
    spark.read.format("graft.sources.SynthDataSource")
      .option("rows", rows).option("partitions", parts).load()

  test("generates exactly `rows` rows across `partitions` splits") {
    assert(read(1000, 7).count() == 1000)
    assert(read(0, 4).count() == 0)
  }

  test("options are case-insensitive; non-numeric values fail loudly") {
    val mixed = spark.read.format("graft.sources.SynthDataSource")
      .option("Rows", 123).option("PARTITIONS", 3).load()
    assert(mixed.count() == 123)
    assert(mixed.rdd.getNumPartitions == 3)
    val bad = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.SynthDataSource")
        .option("rows", "lots").load().count()
    }
    assert(bad.getMessage.contains("rows") && bad.getMessage.contains("lots"))
  }

  test("id-range pushdown elides whole input partitions") {
    val b = new SynthScanBuilder(100000, 16)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("id", 50000L), LessThan("id", 56250L),
      IsNotNull("id")))
    // The range filters are absorbed; IsNotNull comes back post-scan.
    assert(residual.toSeq == Seq(IsNotNull("id")))
    assert(b.pushedFilters().length == 2)
    // 100000/16 = 6250-row chunks; [50000, 56250) is exactly one chunk.
    assert(b.build().asInstanceOf[SynthScan].planInputPartitions().length == 1)
    // And the full surface still agrees with the unpushed answer.
    val full = read(100000, 16)
    val got = full.where(col("id") >= 50000 && col("id") < 56250).count()
    assert(got == 6250)
  }

  test("column pruning reaches the scan (unselected columns never generated)") {
    val df = read(100, 4).select("event_type")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("event_type"))
    assert(df.distinct().count() <= 5)
  }

  test("cells are the portable md5 derivation (cross-engine determinism)") {
    val s = spark
    import s.implicits._
    val row = read(10, 2).where(col("id") === 3L).collect()(0)
    // Recompute via the SQL-side house formula the DuckDB oracle uses.
    val Seq(u, t, v) = spark.sql(
      """SELECT CAST(conv(substring(md5('u:3'), 1, 8), 16, 10) AS BIGINT) % 1000,
        |       CAST(conv(substring(md5('t:3'), 1, 8), 16, 10) AS BIGINT) % 5,
        |       CAST(conv(substring(md5('v:3'), 1, 8), 16, 10) AS BIGINT) % 10000"""
        .stripMargin).collect()(0).toSeq.map(_.asInstanceOf[Long]).toList
    assert(row.getAs[Long]("user_id") == u)
    assert(row.getAs[String]("event_type") ==
      SynthDataSource.EventTypes(t.toInt))
    assert(row.getAs[Double]("value") == v.toDouble / 100.0)
    assert(row.getAs[java.sql.Timestamp]("ts").toInstant.toEpochMilli ==
      SynthDataSource.BaseMicros / 1000 + 3000)
  }
}
