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

  /** Clean rows + quarantined raw lines; `release()` when consumed. */
  def read(spark: SparkSession, path: String, schema: StructType)
      : CsvQuarantine.QuarantineResult = {
    val parsed = spark.read.format("json")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CsvQuarantine.CorruptCol)
      .schema(CsvQuarantine.withCorrupt(schema))
      .load(path)
      .cache()
    val (clean, bad) = CsvQuarantine.split(parsed, schema)
    CsvQuarantine.QuarantineResult(clean, bad, parsed)
  }

  /** Streaming variant; route micro-batches with [[CsvQuarantine.split]]
    * under foreachBatch, exactly as the CSV stream. */
  def readStream(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.readStream.format("json")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CsvQuarantine.CorruptCol)
      .schema(CsvQuarantine.withCorrupt(schema))
      .load(path)
}
