package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Proves the z-order layout's multi-dimensional file-skipping claim
  * with file-level min/max stats measured from the written data: a
  * slice predicate on the SECOND clustered dimension overlaps only a
  * fraction of z-ordered files, while a linear sort on the first
  * dimension leaves every file spanning the full second-dimension
  * range (no skipping possible). */
class ZOrderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("zValue interleaves into the expected range and preserves rows") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"))
    val z = ev.select(Layout.zValue(ev, Seq("user_id", "t_us"), 4).as("z"))
    val row = z.agg(min("z"), max("z"), count(lit(1))).head()
    assert(row.getLong(0) >= 0L)
    assert(row.getLong(1) < (1L << 8), "2 cols × 4 bits must fit 8 bits")
    assert(row.getLong(2) === ev.count())
  }

  test("z-ordered files prune a second-dimension slice; linear sort cannot") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
    val zPath = "/tmp/graft_zorder/z"
    val linPath = "/tmp/graft_zorder/lin"
    Layout.writeZOrdered(ev, zPath, Seq("user_id", "t_us"),
      bits = 4, numFiles = 16)
    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode(SaveMode.Overwrite).parquet(linPath)

    val Seq(tmin, tmax) = ev.agg(min("t_us"), max("t_us")).head()
      .toSeq.map(_.asInstanceOf[Long])
    val lo = tmin + (tmax - tmin) / 2
    val hi = lo + (tmax - tmin) / 8

    // File-level min/max boxes, exactly what a stats-based planner reads.
    def filesOverlapping(path: String): (Long, Long) = {
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("t_us").as("mn"), max("t_us").as("mx"))
      (boxes.where(col("mx") >= lo && col("mn") <= hi).count(), boxes.count())
    }
    val (zHit, zTotal) = filesOverlapping(zPath)
    val (linHit, linTotal) = filesOverlapping(linPath)
    // Range partitioning by a low-cardinality key can leave some of the
    // 16 target partitions empty — require enough files for the
    // comparison to mean something, not an exact count.
    assert(zTotal >= 8 && linTotal >= 8, s"files: z=$zTotal lin=$linTotal")
    // Linear sort on user_id: every file spans the whole time range.
    assert(linHit === linTotal, s"linear layout should not skip: $linHit")
    // Z-order: each file's time box is ~1/4 of the range; a 1/8 slice
    // must leave at least half the files skippable.
    assert(zHit * 2 <= zTotal, s"z-order hit $zHit of $zTotal files")
    // Same rows either way.
    assert(spark.read.parquet(zPath).count() === ev.count())
  }
}
