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

  /** The routed pair plus the cache handle: the parsed frame is cached
    * so ONE parse serves both splits, and the cache must be released
    * once both sides are written — without the handle, repeated read()
    * calls in a long-lived session would pin every parsed input in
    * storage until eviction thrash. */
  final case class QuarantineResult(clean: DataFrame, quarantined: DataFrame,
      private val parsed: DataFrame) {
    /** Drop the shared parse cache (call after consuming both frames). */
    def release(): Unit = { parsed.unpersist(); () }
  }

  /** Clean rows in `schema` + quarantined raw lines from one batch
    * parse; `release()` the result when both are consumed. */
  def read(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = true): QuarantineResult = {
    val parsed = spark.read.format("csv")
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema))
      .load(path)
      .cache()
    val (clean, bad) = split(parsed, schema)
    QuarantineResult(clean, bad, parsed)
  }

  /** Streaming variant for continuous ingest: the same PERMISSIVE parse
    * over a file-source stream. Route each micro-batch with [[split]]
    * inside `foreachBatch` — clean rows to the pipeline sink,
    * quarantined raw lines to the audit sink; exactly the batch
    * semantics, one micro-batch at a time:
    * {{{
    * CsvQuarantine.readStream(spark, dir, schema).writeStream
    *   .foreachBatch { (batch, _) =>
    *     val cached = batch.cache()
    *     val (clean, bad) = CsvQuarantine.split(cached, schema)
    *     clean.write.mode("append").parquet(cleanDir)
    *     bad.write.mode("append").parquet(auditDir)
    *     cached.unpersist()   // micro-batch cache must not outlive it
    *   }.trigger(Trigger.AvailableNow()).start()
    * }}}
    */
  def readStream(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = true): DataFrame =
    spark.readStream.format("csv")
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema))
      .load(path)

  /** One parsed-with-corrupt-column frame → (clean, quarantined raw
    * lines). The caller caches `parsed` first: one parse serves both
    * splits, and Spark refuses filtering ONLY the lazy internal
    * corrupt column (SPARK-21610) on an uncached parse. */
  def split(parsed: DataFrame, schema: StructType)
      : (DataFrame, DataFrame) = {
    val clean = parsed.where(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantined = parsed.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantined)
  }

  /** Shared by the CSV and JSON readers — the corrupt-column contract
    * lives in one place. */
  private[sources] def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not already contain $CorruptCol")
    schema.add(CorruptCol, StringType, nullable = true)
  }
}
