package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage breakdown of one or more contract queries (not part of
  * the driver contract) — the measurement tool behind the r14
  * optimization round: for each named query, runs it once cold and
  * once profiled, and prints every stage of the profiled run with its
  * wall time, summed task time, shuffle read/write bytes and record
  * counts, grouped by job. This is the "which exchange is the money
  * going to" view the Spark UI would give if it were enabled.
  *
  * Run: `sbt "runMain graft.StageProfile <query> [query...]"`,
  * SPARK_GRAFT_SF_DIR selects the data (default sf0.1).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
        require(kv.contains("="), s"bad SPARK_GRAFT_EXTRA_CONF entry: $kv")
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()

    case class StageRow(jobId: Int, stageId: Int, name: String,
      wallMs: Long, taskMs: Long, gcMs: Long, shufReadMB: Double,
      shufWriteMB: Double, inputMB: Double, recIn: Long, recOut: Long,
      tasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    val jobOfStage = scala.collection.mutable.Map.empty[Int, Int]
    val jobDesc = scala.collection.mutable.Map.empty[Int, String]
    @volatile var capturing = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        if (capturing) {
          js.stageIds.foreach(sid => jobOfStage(sid) = js.jobId)
          jobDesc(js.jobId) = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (capturing) {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages += StageRow(
            jobOfStage.getOrElse(si.stageId, -1), si.stageId,
            si.name.linesIterator.next(),
            (for (a <- si.completionTime; b <- si.submissionTime) yield a - b)
              .getOrElse(-1L),
            m.executorRunTime,
            m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6,
            // Input records: file-scan rows OR shuffle-read rows,
            // whichever path feeds this stage (both zero only when the
            // stage sources a cached/checkpointed RDD). Output records:
            // sink rows or shuffle-write rows. Kept separate — the old
            // single max() column conflated them.
            m.inputMetrics.recordsRead max
              m.shuffleReadMetrics.recordsRead,
            m.outputMetrics.recordsWritten max
              m.shuffleWriteMetrics.recordsWritten,
            si.numTasks)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // Cold run: codegen + JIT, unprofiled.
      val t0 = System.nanoTime()
      Force.rows(fn(spark, dir))
      val cold = (System.nanoTime() - t0) / 1e9
      // Profiled steady-state run.
      stages.clear(); jobOfStage.clear(); jobDesc.clear()
      capturing = true
      val t1 = System.nanoTime()
      val rows = Force.rows(fn(spark, dir))
      val warm = (System.nanoTime() - t1) / 1e9
      // Listener bus is async; give it a beat to drain.
      Thread.sleep(500)
      capturing = false
      println(f"%n==== $name: cold=$cold%.2fs warm=$warm%.2fs rows=$rows ====")
      val byJob = stages.toSeq.groupBy(_.jobId).toSeq.sortBy(_._1)
      for ((jid, ss) <- byJob) {
        val desc = jobDesc.getOrElse(jid, "")
        println(f"-- job $jid%3d  wall=${ss.map(_.wallMs).sum}%6d ms  " +
          f"task=${ss.map(_.taskMs).sum}%7d ms  $desc")
        for (s <- ss.sortBy(-_.taskMs)) {
          println(f"   stage ${s.stageId}%4d task=${s.taskMs}%7d ms " +
            f"gc=${s.gcMs}%6d ms " +
            f"wall=${s.wallMs}%6d ms sr=${s.shufReadMB}%8.1fMB " +
            f"sw=${s.shufWriteMB}%8.1fMB in=${s.inputMB}%7.1fMB " +
            f"rIn=${s.recIn}%9d rOut=${s.recOut}%9d t=${s.tasks}%3d  " +
            s.name.take(90))
        }
      }
    }
    spark.stop()
  }
}
