package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton-curve) clustering value over `cols`: each column
    * is equal-depth bucketed to `bits` bits via approximate quantile
    * boundaries (equal-depth, not equal-width, so skewed columns still
    * spread across buckets), then the bucket indices' bits are
    * interleaved. Rows close in z-value are close in EVERY dimension,
    * so sorting files by z-value gives each file a small min/max box
    * in all `cols` at once — parquet/file-level stats then prune scans
    * filtered on ANY of the dimensions, where a linear sort only ever
    * prunes its leading column (the multi-dimensional complement of
    * [[writeBucketed]]'s single-key story). Quantile boundaries are a
    * bounded driver-side list (≤ 2^bits − 1 doubles per column —
    * deliberately small; this is layout metadata, not data motion). */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    require(cols.nonEmpty && bits * cols.size <= 62,
      s"zValue: ${cols.size} cols × $bits bits must fit a long")
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val asD = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val bucketCols = cols.map { c =>
      val bounds = asD.stat.approxQuantile(c, probs, 0.001).distinct.sorted
      // bucket = #boundaries strictly below the value (0..nBuckets-1);
      // a small when-fold beats an aggregate() HOF here because the
      // boundary list is a compile-time literal the codegen unrolls.
      bounds.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(col(c).cast("double") > lit(b), 1L).otherwise(0L)
      }
    }
    (0 until bits).flatMap { i =>
      bucketCols.zipWithIndex.map { case (bc, j) =>
        shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), i * cols.size + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` clustered on the z-order curve over `cols`: range-
    * partition by z-value into `numFiles` files, sort within each, so
    * every file's per-column min/max stats describe a tight box and
    * selective filters on any clustered column skip most files. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 8, numFiles: Int = 16): Unit =
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
