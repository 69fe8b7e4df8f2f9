package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** [[CsvQuarantine]]'s JSON-lines sibling: PERMISSIVE parse against a
  * fixed schema, clean records onward, raw unparseable lines to the
  * audit frame — same split, same single scan. JSON feeds break
  * differently than CSV (truncated objects, wrong nesting, bare
  * garbage between records), but the routing contract is identical,
  * so the two readers share [[CsvQuarantine.split]]. */
object JsonQuarantine {

  /** (clean rows in `schema`, quarantined raw lines). */
  def read(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val parsed = spark.read.format("json")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CsvQuarantine.CorruptCol)
      .schema(withCorrupt(schema))
      .load(path)
    CsvQuarantine.split(parsed.cache(), schema)
  }

  /** Streaming variant; route micro-batches with [[CsvQuarantine.split]]
    * under foreachBatch, exactly as the CSV stream. */
  def readStream(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.readStream.format("json")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CsvQuarantine.CorruptCol)
      .schema(withCorrupt(schema))
      .load(path)

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CsvQuarantine.CorruptCol),
      s"schema may not already contain ${CsvQuarantine.CorruptCol}")
    schema.add(CsvQuarantine.CorruptCol,
      org.apache.spark.sql.types.StringType, nullable = true)
  }
}
