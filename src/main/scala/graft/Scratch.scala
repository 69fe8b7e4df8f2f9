package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/perf inspection main (not part of the driver contract):
  * `sbt "runMain graft.Scratch <queryName>"` prints the formatted
  * physical plan and three timed runs (run 1 ≈ cold codegen, runs 2-3 ≈
  * steady state) at SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_REBALANCE")
      .foreach(m => spark.conf.set("spark.graft.rebalance", m))
    sys.env.get("SPARK_GRAFT_AQE_COALESCE").foreach { v =>
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", v)
    }
    // Generic conf passthrough (ClusterSmoke's pattern):
    // SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" — e.g. forcing a broadcast
    // gate while bisecting a join-path decision.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    for (name <- names) {
      // In-session conf toggle ("conf:key=value" / "unset:key" tokens):
      // lets an A/B of two plan shapes run INTERLEAVED in one JVM — the
      // host's ambient bursts swing same-code timings up to ~1.7×
      // across sessions, so cross-session comparisons are unusable.
      if (name.startsWith("conf:")) {
        val kv = name.stripPrefix("conf:")
        if (!kv.contains("=")) {
          println(s"[scratch] bad conf token '$name' (want conf:key=value) — skipped")
        } else {
          val Array(k, v) = kv.split("=", 2)
          spark.conf.set(k, v); println(s"[scratch] set $k=$v")
        }
      } else if (name.startsWith("unset:")) {
        spark.conf.unset(name.stripPrefix("unset:"))
        println(s"[scratch] unset ${name.stripPrefix("unset:")}")
      } else {
      if (explain) SparkEntry.queries(name)(spark, dir).explain("formatted")
      // Post-execution plan: AQE finalizes reuse/broadcast decisions at
      // runtime, so ReusedExchange/ReusedSubquery only show here.
      if (sys.env.get("SPARK_GRAFT_EXPLAIN_EXECUTED").contains("1")) {
        val df = SparkEntry.queries(name)(spark, dir)
        // collect(), not count(): count() wraps a NEW QueryExecution,
        // leaving df's own adaptive plan unexecuted (isFinalPlan=false).
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      }
      // Construct INSIDE the timed region (as Bench does): iterative
      // operators (connectedComponents) run their jobs at construction.
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = Force.rows(SparkEntry.queries(name)(spark, dir))
        println(s"[scratch] $name run $i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      }
      }
    }
    spark.stop()
  }
}
