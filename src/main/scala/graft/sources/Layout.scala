package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout helpers for the two big shuffle-elimination levers at
  * 100 TB:
  *
  *  - **Bucketing**: tables joined repeatedly on the same key are
  *    written pre-hashed into the same number of buckets; a join of two
  *    co-bucketed tables needs NO exchange on either side (proven in
  *    LayoutSpec by asserting the plan is exchange-free). The nightly
  *    QC run that diffs today's snapshot against yesterday's pays zero
  *    shuffle.
  *  - **Hive-style partitioning**: low-cardinality filter columns
  *    (date, source, language) become directory partitions; filters on
  *    them prune whole directories at planning time (PartitionFilters
  *    in the scan node) instead of reading and discarding rows.
  */
object Layout {

  /** Write `df` as a bucketed external table registered as `table`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Write `df` partitioned by directory on `cols`. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Idempotent backfill write: replace ONLY the partitions present in
    * `df`, leaving the rest of the dataset untouched — the rerun-safe
    * daily-job primitive at scale (static overwrite would wipe the
    * whole table; append would duplicate the rerun day). The dynamic
    * mode rides as a WRITER-scoped option (it takes precedence over
    * the session conf), so concurrent writers on the same session are
    * never affected. */
  def overwritePartitions(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*).parquet(path)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
