package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkSpec, Tables}
import graft.queries.EventQueries

/** Restart-from-checkpoint correctness: a streaming query stopped and
  * restarted against the SAME checkpoint must carry its state across
  * the restart and emit every result exactly once — the recovery
  * contract a production stream leans on after any driver restart or
  * executor loss (ClusterSmoke demonstrates batch-side recovery; this
  * pins the streaming side, which recovers from the checkpoint's
  * offset log + state store rather than from RDD lineage).
  *
  * The contract is pinned as a MATRIX over state-store providers —
  * {HDFS-backed, RocksDB, RocksDB + changelog checkpointing} — because
  * the recovery path is provider-specific code (HDFS restores from
  * full delta/snapshot files; RocksDB reloads SSTs; changelog mode
  * replays a per-batch changelog over the last snapshot, the exact
  * mechanism the measured 100 TB/day recipe depends on: StreamLadder
  * recorded commit_ms 13018→6495 flipping it on, so the shipped
  * recommendation is RocksDB+changelog and its restart semantics must
  * be pinned, not assumed).
  *
  * Method: the sf0.001 events table is split time-ordered into four
  * single-file drops. Run 1 (`Trigger.AvailableNow`) drains the first
  * two files and stops — windows still open at that point live ONLY in
  * the checkpointed state store. The remaining files plus a
  * watermark-flushing sentinel then land, and run 2 restarts from the
  * same checkpoint. The union of the two runs' append-mode outputs
  * must equal the batch windowed aggregation over the whole table,
  * as a MULTISET: a lost state store under-counts the boundary
  * windows, a replayed batch duplicates rows — either breaks it.
  */
class CheckpointResumeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Provider matrix: tag → session confs set for the whole test
    * (BOTH runs — a checkpoint's state format is provider-specific,
    * so restart must use the provider that wrote it). */
  private val providers: Seq[(String, Map[String, String])] = Seq(
    "hdfs" -> Map(ProviderKey -> Hdfs),
    "rocksdb" -> Map(ProviderKey -> RocksDb),
    "rocksdb_changelog" -> Map(ProviderKey -> RocksDb,
      ChangelogKey -> "true"))

  private def withConfs[A](confs: Map[String, String])(body: => A): A = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Write `df` as ONE parquet file named `name` inside `target`
    * (FileStreamSource discovers bare files; a write directory's
    * part-file is moved out and renamed). */
  private def dropFile(df: org.apache.spark.sql.DataFrame,
      target: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("resume_drop").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, target.resolve(name))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  private def windowedResume(): Unit = {
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .localCheckpoint()
    val n = ev.count()
    val rowsWithIdx = ev.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("ts", "event_id")))
    val srcDir = Files.createTempDirectory("resume_src")
    val ckpt = Files.createTempDirectory("resume_ckpt").toString
    val quarter = (n / 4).toInt
    def slice(lo: Long, hi: Long) = rowsWithIdx
      .where(col("__rn") > lo && col("__rn") <= hi).drop("__rn")

    // Phase 1: the first half, two file drops.
    dropFile(slice(0, quarter), srcDir, "q0.parquet")
    dropFile(slice(quarter, 2L * quarter), srcDir, "q1.parquet")

    val schema = ev.schema
    // Parquet FILE sink, not memory: the memory sink refuses checkpoint
    // recovery outright ("This query does not support recovering from
    // checkpoint location"), and the file sink is the production shape
    // anyway — its own file log is what makes the output exactly-once
    // across the restart.
    val outDir = Files.createTempDirectory("resume_out").toString
    def runDrain(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$srcDir/*.parquet")
      val q = EventStreams.windowedAgg(src)
        .writeStream.format("parquet")
        .option("path", outDir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.stop()
    }
    def sinkRows(): Seq[Seq[Any]] =
      spark.read.parquet(outDir).collect().map(_.toSeq).toSeq

    try {
      runDrain()
      val out1 = sinkRows()

      // Phase 2: the rest of the feed + a far-future sentinel that
      // pushes the watermark past every real window, then RESTART from
      // the same checkpoint.
      dropFile(slice(2L * quarter, 3L * quarter), srcDir, "q2.parquet")
      dropFile(slice(3L * quarter, n), srcDir, "q3.parquet")
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      val s = spark
      import s.implicits._
      dropFile(
        Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 365L * 86400 * 1000),
          -1L, "__sentinel__", 0.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value"),
        srcDir, "q4.parquet")
      runDrain()

      // Run 1 must have closed SOME windows (the test is vacuous
      // otherwise) but not all (state must actually cross the restart).
      val want = EventQueries.qeWindows(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(out1.nonEmpty, "run 1 closed no windows")
      assert(out1.size < want.size, "run 1 closed everything; nothing crossed")

      val got = sinkRows()
        .filter(r => r(1) != "__sentinel__")
      // Multiset equality: duplicates from a replayed batch or losses
      // from a dropped state store both fail here.
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
        want.groupBy(identity).view.mapValues(_.size).toMap)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(srcDir.toFile)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    }
  }

  for ((tag, confs) <- providers)
    test(s"windowed agg restarted from checkpoint is exactly-once [$tag]") {
      withConfs(confs)(windowedResume())
    }

  private def sessionResume(): Unit = {
    // Same harness, CUSTOM state: flatMapGroupsWithState holds one open
    // session per user plus that user's session COUNTER. Both must
    // cross the restart — a lost store doesn't just drop boundary
    // sessions, it restarts every user's numbering at 1, so the
    // session_id column disagrees with the batch replay even for
    // sessions closed entirely inside run 2.
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .localCheckpoint()
    val n = ev.count()
    val rowsWithIdx = ev.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("ts", "event_id")))
    val srcDir = Files.createTempDirectory("resume_sess_src")
    val ckpt = Files.createTempDirectory("resume_sess_ckpt").toString
    val outDir = Files.createTempDirectory("resume_sess_out").toString
    val half = (n / 2).toInt
    def slice(lo: Long, hi: Long) = rowsWithIdx
      .where(col("__rn") > lo && col("__rn") <= hi).drop("__rn")

    dropFile(slice(0, half / 2), srcDir, "q0.parquet")
    dropFile(slice(half / 2, half), srcDir, "q1.parquet")

    val schema = ev.schema
    def runDrain(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$srcDir/*.parquet")
      val q = EventStreams.sessionize(EventStreams.toSessionEvents(src))
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.stop()
    }
    def sinkRows(): Seq[Seq[Any]] =
      spark.read.parquet(outDir).collect().map(_.toSeq).toSeq

    try {
      runDrain()
      val out1 = sinkRows()

      dropFile(slice(half, n), srcDir, "q2.parquet")
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      val s = spark
      import s.implicits._
      dropFile(
        Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 365L * 86400 * 1000),
          -1L, "__sentinel__", 0.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value"),
        srcDir, "q3.parquet")
      runDrain()

      val want = EventQueries.qeSessions(spark, dir)
        .select("user_id", "session_id", "n_events",
          "session_start", "session_end")
        .collect().map(_.toSeq).toSeq
      assert(out1.nonEmpty, "run 1 closed no sessions")
      assert(out1.size < want.size, "run 1 closed everything; nothing crossed")
      val got = sinkRows().filter(r => r.head != -1L)
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
        want.groupBy(identity).view.mapValues(_.size).toMap)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(srcDir.toFile)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    }
  }

  // Custom fMGWS state crosses the restart on the default provider and
  // on the production recipe (RocksDB + changelog): the state row here
  // is an Encoder-serialized case class, exercising the provider's
  // byte-level restore path rather than the windowed agg's UnsafeRow.
  for ((tag, confs) <- providers if tag != "rocksdb")
    test(s"fMGWS sessionizer restarted from checkpoint is exactly-once [$tag]") {
      withConfs(confs)(sessionResume())
    }
}
