package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SchemaContractSpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 1.5)).toDF("id", "name", "score")
  }

  private val matching = Seq(
    ColumnContract("id", "bigint"),
    ColumnContract("name", "string"),
    ColumnContract("score", "double"))

  test("a conforming schema reports all-ok and passes") {
    val rep = SchemaContract.report(spark, df, matching)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(rep == Map("id" -> "ok", "name" -> "ok", "score" -> "ok"))
    assert(SchemaContract.passed(df, matching))
  }

  test("type drift, missing, and unexpected columns are each flagged") {
    val contract = Seq(
      ColumnContract("id", "int"),        // actual bigint -> type_mismatch
      ColumnContract("missing_col", "string"), // absent -> missing
      ColumnContract("name", "string"))   // ok; score becomes unexpected
    val rep = SchemaContract.report(spark, df, contract)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(rep("id") == "type_mismatch")
    assert(rep("missing_col") == "missing")
    assert(rep("name") == "ok")
    assert(rep("score") == "unexpected")
    assert(!SchemaContract.passed(df, contract))
  }

  test("type names compare case-insensitively, parameterized types exactly") {
    val d = df.select(col("score").cast("decimal(12,2)").as("score"))
    assert(SchemaContract.passed(d, Seq(ColumnContract("score", "DECIMAL(12,2)"))))
    assert(!SchemaContract.passed(d, Seq(ColumnContract("score", "decimal(10,2)"))))
  }

  test("nullability is one-directional") {
    // toDF primitives: id is non-nullable, name nullable.
    val d = df
    assert(SchemaContract.passed(d,
      Seq(ColumnContract("id", "bigint", nullable = false))))
    assert(!SchemaContract.passed(d,
      Seq(ColumnContract("name", "string", nullable = false))))
    assert(SchemaContract.passed(d,
      Seq(ColumnContract("name", "string", nullable = true))))
  }

  test("allowExtra=false turns undeclared columns into failures") {
    val contract = Seq(ColumnContract("id", "bigint"))
    assert(SchemaContract.passed(df, contract, allowExtra = true))
    assert(!SchemaContract.passed(df, contract, allowExtra = false))
  }

  test("the report runs zero Spark jobs") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    SchemaContract.passed(df, matching)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(before == after)
  }
}
