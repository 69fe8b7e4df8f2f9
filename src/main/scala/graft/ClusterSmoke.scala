package graft

import org.apache.spark.sql.SparkSession

/** Real-executor smoke: everything else in this repo measures under
  * local[32] — one JVM, no serialization boundary, no executor loss.
  * This main runs the heavy ladder operators on `local-cluster[2,8,4096]`
  * (Spark's pseudo-cluster: real Worker-launched executor JVMs, real
  * RPC/serialization between driver and executors, real block
  * replication domains), then DEMONSTRATES the Materialize reliability
  * contract by killing an executor process mid-session:
  *
  *  - `localCheckpoint` path (the single-box default): blocks are
  *    executor-local and non-replicated, lineage is truncated — after
  *    the loss, re-reading the materialized frame must FAIL. Expected,
  *    documented, recorded.
  *  - `spark.graft.checkpointDir` path: reliable `checkpoint` files
  *    survive any executor loss — the same re-read must RECOVER with
  *    identical rows.
  *
  * This converts Materialize's reliability knob (Materialize.scala)
  * from written claim to shown behavior. The executor kill is an
  * OS-level `destroyForcibly` of a CoarseGrainedExecutorBackend
  * process — an honest crash, not a cooperative decommission.
  *
  * Run: `sbt "runMain graft.ClusterSmoke sf1=target/scaledata/sf1"`.
  * Env: SPARK_GRAFT_MASTER (default local-cluster[2,8,4096]),
  * SPARK_GRAFT_CLUSTER_QUERIES (comma list), SPARK_GRAFT_CLUSTER_OUT
  * (default CLUSTER_RAW.jsonl). Output: one JSON line per query
  * (`{"mode":…,"query":…,"sec":…,"rows":…}`) and per recovery leg
  * (`{"mode":…,"recovery":…,"outcome":…}`).
  */
object ClusterSmoke {

  /** The heavy ladder set, minus nothing: real-executor execution is
    * the point, not fresh timings — wall clocks here include executor
    * launch and cross-process shuffle and are NOT comparable to the
    * local[32] ladder. */
  val DefaultQueries: Seq[String] = Seq(
    "qd_tfidf_pairs", "qd_manifest", "qd_pagerank", "qd_prefix_join",
    "qd_minhash_pairs", "qd_kcore", "qd_kcore_auto", "qd_simhash_pairs",
    "qd_sorted_neighbors", "qe_bootstrap", "qc_profile", "qe_sessions")

  private def executorPids(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.allProcesses().iterator().asScala
      .filter(p => p.info().commandLine().map[Boolean](
        _.contains("CoarseGrainedExecutorBackend")).orElse(false))
      .map(_.pid()).toSeq.sorted
  }

  private def liveExecutors(spark: SparkSession): Int =
    // memoryStatus lists the driver's BlockManager too; executors only.
    spark.sparkContext.getExecutorMemoryStatus.size - 1

  /** Kill one executor JVM and wait until the scheduler sees the loss
    * (or a replacement arrives — either way the KILLED executor's
    * blocks are gone, which is what the demonstration needs). */
  private def killOneExecutor(spark: SparkSession): Long = {
    val before = executorPids()
    require(before.nonEmpty, "no executor processes found to kill")
    val victim = before.head
    ProcessHandle.of(victim).ifPresent(p => p.destroyForcibly())
    val deadline = System.nanoTime() + 60e9.toLong
    while (executorPids().contains(victim) && System.nanoTime() < deadline)
      Thread.sleep(200)
    // Give the driver a moment to register the RPC disconnect before
    // the next job schedules onto a dead block manager.
    Thread.sleep(3000)
    victim
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ClusterSmoke <label>=<dir>")
    val Array(label, dir) = args(0).split("=", 2)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER",
      "local-cluster[2,8,4096]")
    val names = sys.env.get("SPARK_GRAFT_CLUSTER_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultQueries)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_OUT",
      "CLUSTER_RAW.jsonl")
    val classesDir =
      new java.io.File("target/scala-2.13/classes").getAbsolutePath

    // Surface the executor heap from the local-cluster spec as
    // spark.executor.memory: the MemGate broadcast defaults read it —
    // without this the driver-side gate would size broadcasts against
    // the DRIVER's heap while 4–10 g executors hold the relations.
    val executorMemMb = "local-cluster\\[\\d+,\\d+,(\\d+)\\]".r
      .findFirstMatchIn(master).map(_.group(1))

    val builder0 = SparkSession.builder()
      .master(master)
      // Worker-launched executor JVMs know Spark's jars but not this
      // repo's classes; without this every deserialized closure dies
      // with ClassNotFoundException.
      .config("spark.executor.extraClassPath", classesDir)
    // Generic conf passthrough for experiments (e.g. forcing a gate):
    // SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2".
    val builder1 = executorMemMb
      .fold(builder0)(mb => builder0.config("spark.executor.memory", s"${mb}m"))
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(";").filter(_.nonEmpty))
      .getOrElse(Array.empty[String])
      .foldLeft(builder1) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k, v)
      }
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The recovery demo needs failures to surface, not retry away:
      // with lineage truncated there is nothing a retry can recompute,
      // but Spark would still burn 4 task attempts × stage retries
      // before admitting it. For spill-stress runs where an executor
      // MAY legitimately die and be replaced, raise it to the
      // production default (SPARK_GRAFT_TASK_MAX_FAILURES=4).
      .config("spark.task.maxFailures",
        sys.env.getOrElse("SPARK_GRAFT_TASK_MAX_FAILURES", "2"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = new java.io.PrintWriter(new java.io.FileWriter(outPath, true))
    def emit(line: String): Unit = { println(line); out.println(line); out.flush() }

    try {
      // Wait for both executors before measuring anything.
      val deadline = System.nanoTime() + 120e9.toLong
      while (liveExecutors(spark) < 2 && System.nanoTime() < deadline)
        Thread.sleep(500)
      emit(s"""{"mode":"$master","executors":${liveExecutors(spark)},"executor_pids":${executorPids().size}}""")

      // ---- Part 1: heavy operators under real executor JVMs ----
      for (name <- names) {
        SparkEntry.queries.get(name) match {
          case None => emit(s"""{"mode":"$master","query":"$name","error":"unknown query"}""")
          case Some(fn) =>
            val t0 = System.nanoTime()
            try {
              val rows = Force.rows(fn(spark, dir))
              val sec = (System.nanoTime() - t0) / 1e9
              emit(s"""{"mode":"$master","sf":"$label","query":"$name","sec":${JsonFmt.ms(sec)},"rows":$rows}""")
            } catch { case e: Throwable =>
              emit(s"""{"mode":"$master","sf":"$label","query":"$name","error":"${JsonFmt.err(e)}"}""")
            }
        }
      }

      // ---- Part 2: executor-loss recovery demonstration ----
      import org.apache.spark.sql.functions._
      def buildFrame() = Tables.load(spark, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))

      // Leg A: localCheckpoint (the default). Blocks are executor-local
      // and non-replicated; losing one executor after materialization
      // must make the re-read fail (lineage truncated, no recompute).
      {
        val mat = graft.operators.Materialize.once(buildFrame())
        val rows1 = Force.rows(mat)
        val victim = killOneExecutor(spark)
        val outcome =
          try {
            val rows2 = Force.rows(mat)
            // All blocks happened to land on the survivor — the demo is
            // inconclusive, record it as such rather than as recovery.
            s""""outcome":"survived_unexpectedly","rows":$rows2"""
          } catch { case e: Throwable =>
            s""""outcome":"failed_as_expected","error":"${JsonFmt.err(e)}""""
          }
        emit(s"""{"mode":"$master","recovery":"localCheckpoint","rows_before":$rows1,"killed_pid":$victim,$outcome}""")
      }

      // Wait for the standalone master to relaunch the executor so leg
      // B starts from two executors again.
      val d2 = System.nanoTime() + 120e9.toLong
      while (liveExecutors(spark) < 2 && System.nanoTime() < d2)
        Thread.sleep(500)

      // Leg B: reliable checkpoint via spark.graft.checkpointDir. The
      // checkpoint files live on the shared filesystem; the same
      // re-read after the same kill must recover with identical rows.
      {
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_cluster_ckpt").toString
        spark.conf.set("spark.graft.checkpointDir", ckpt)
        val mat = graft.operators.Materialize.once(buildFrame())
        val rows1 = Force.rows(mat)
        val victim = killOneExecutor(spark)
        val outcome =
          try {
            val rows2 = Force.rows(mat)
            if (rows2 == rows1) s""""outcome":"recovered","rows":$rows2"""
            else s""""outcome":"row_mismatch","rows_before":$rows1,"rows_after":$rows2"""
          } catch { case e: Throwable =>
            s""""outcome":"failed","error":"${JsonFmt.err(e)}""""
          }
        emit(s"""{"mode":"$master","recovery":"reliableCheckpoint","rows_before":$rows1,"killed_pid":$victim,$outcome}""")
        spark.conf.unset("spark.graft.checkpointDir")
      }
    } finally out.close()
    spark.stop()
  }
}
