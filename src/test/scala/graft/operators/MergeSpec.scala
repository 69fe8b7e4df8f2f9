package graft.operators

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergeSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  test("upsert rewrites only touched partitions; updates, inserts, tombstones apply") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_merge/t1"
    Seq(
      (1L, "d1", "a-v1", 10L),
      (2L, "d1", "b-v1", 10L),
      (3L, "d2", "c-v1", 10L),
      (4L, "d2", "d-v1", 10L),
      (5L, "d3", "e-v1", 10L))
      .toDF("id", "day", "v", "ver")
      .write.mode("overwrite").partitionBy("day").parquet(path)
    val d1Before = parquetFiles(s"$path/day=d1")
      .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    assert(d1Before.nonEmpty)

    // Batch touches only d2: update id=3, insert id=6, delete id=4.
    val updates = Seq(
      (3L, "d2", "c-v2", 20L, false),
      (6L, "d2", "f-v1", 20L, false),
      (4L, "d2", "-", 20L, true))
      .toDF("id", "day", "v", "ver", "is_deleted")
    Merge.upsertPartitioned(spark, path, updates,
      keys = Seq("id"), orderCol = "ver", partCol = "day",
      deleteCol = Some("is_deleted"))

    val after = spark.read.parquet(path)
      .select("id", "day", "v").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(after === Seq(
      (1L, "d1", "a-v1"), (2L, "d1", "b-v1"),
      (3L, "d2", "c-v2"), (5L, "d3", "e-v1"), (6L, "d2", "f-v1")))

    // Untouched partition d1: same files, same mtimes (never rewritten).
    val d1After = parquetFiles(s"$path/day=d1")
      .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    assert(d1After === d1Before, "d1 files must be untouched")
  }

  test("stored row survives an older update; batch wins an exact version tie") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_merge/t2"
    Seq((1L, "d1", "new", 30L), (2L, "d1", "x", 30L))
      .toDF("id", "day", "v", "ver")
      .write.mode("overwrite").partitionBy("day").parquet(path)
    val updates = Seq(
      (1L, "d1", "stale", 10L, false), // older version: must lose
      (2L, "d1", "tied", 30L, false)) // same version: batch supersedes
      .toDF("id", "day", "v", "ver", "is_deleted")
    Merge.upsertPartitioned(spark, path, updates,
      keys = Seq("id"), orderCol = "ver", partCol = "day",
      deleteCol = Some("is_deleted"))
    val after = spark.read.parquet(path)
      .select("id", "v").as[(Long, String)].collect().sorted.toSeq
    assert(after === Seq((1L, "new"), (2L, "tied")))
  }
}
