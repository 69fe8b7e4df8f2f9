package graft.sources

import graft.SparkSpec
import graft.rules.{ColumnContract, SchemaContract}
import org.apache.spark.sql.functions.col

/** Parquet schema evolution (SURVEY.md §2 item 11 family): a 100 TB
  * table accretes files written under successive schema versions, and
  * the read path must (a) reconcile them without rewriting history —
  * Spark's `mergeSchema` union — and (b) surface the drift to the
  * contract gate instead of silently absorbing it. Pins the exact
  * semantics the engine relies on: added columns null-backfill old
  * files, the merged schema is the field union, and SchemaContract
  * labels the evolution (`unexpected` new column against the v1
  * contract; `missing` against a v2 contract over v1-only data).
  */
class SchemaEvolutionSpec extends SparkSpec {

  private val base = "/tmp/graft_schema_evolution"

  private def writeGenerations(): Unit = {
    val s = spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$base/gen=1")
    Seq((3L, "c", 0.5), (4L, "d", 1.5)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$base/gen=2")
  }

  test("mergeSchema unions generations and null-backfills the added column") {
    writeGenerations()
    val df = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/gen=1", s"$base/gen=2")
    assert(df.schema.fieldNames.toSet === Set("id", "name", "score"))
    val rows = df.orderBy("id")
      .collect().map(r => (r.getLong(0), r.isNullAt(df.schema.fieldIndex("score"))))
    assert(rows.toSeq === Seq((1L, true), (2L, true), (3L, false), (4L, false)),
      "v1 rows must read with score = null, v2 rows with real values")
  }

  test("contract gate names the drift in both directions") {
    writeGenerations()
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/gen=1", s"$base/gen=2")
    val v1Contract = Seq(
      ColumnContract("id", "bigint"), ColumnContract("name", "string"))
    val v1Report = SchemaContract.report(spark, merged, v1Contract)
      .where(col("status") =!= "ok")
      .collect().map(r => (r.getString(0), r.getString(3))).toSet
    assert(v1Report === Set(("score", "unexpected")),
      "merged read against the v1 contract must flag ONLY the new column")
    assert(SchemaContract.passed(merged, v1Contract, allowExtra = true))
    assert(!SchemaContract.passed(merged, v1Contract, allowExtra = false))

    val v2Contract = v1Contract :+ ColumnContract("score", "double")
    val oldOnly = spark.read.parquet(s"$base/gen=1")
    val v2Report = SchemaContract.report(spark, oldOnly, v2Contract)
      .where(col("status") =!= "ok")
      .collect().map(r => (r.getString(0), r.getString(3))).toSet
    assert(v2Report === Set(("score", "missing")),
      "v1-only data against the v2 contract must flag the column as missing")
  }
}
