package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** Malformed-row quarantine for delimited ingest — the pattern a 100 TB
  * feed needs instead of the two default failure modes: FAILFAST (one
  * broken row kills a 6-hour job) or silent PERMISSIVE (broken rows
  * become nulls indistinguishable from real nulls and poison downstream
  * aggregates).
  *
  * PERMISSIVE parsing keeps the raw text of every row that failed the
  * schema in `columnNameOfCorruptRecord`; the split routes clean rows
  * onward and quarantines raw broken lines for operator triage. Both
  * frames come from ONE scan (the split is two filters over the same
  * parsed projection, no extra pass), and parsing stays distributed —
  * the quarantine is a DataFrame, not a driver-side collect.
  *
  * Reference behavior anchor: the reference engine reads delimited
  * input with a fixed schema and fails closed (TnFileReader); this is
  * the Spark-idiomatic fail-open-with-audit equivalent.
  */
object CsvQuarantine {

  val CorruptCol = "__corrupt_record"

  /** (clean rows in `schema`, quarantined raw lines).
    *
    * The corrupt-record column must be materialized before it can be
    * filtered on (Spark refuses a query that selects ONLY the internal
    * corrupt column from a lazy parse — SPARK-21610), so the parsed
    * frame is cached: one parse serves both splits.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = true)
      : (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not already contain $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    val parsed = spark.read.format("csv")
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .load(path)
      .cache()
    val clean = parsed.where(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantined = parsed.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantined)
  }
}
