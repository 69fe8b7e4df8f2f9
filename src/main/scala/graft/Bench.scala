package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (scheduler, codegen compiler, parquet footer
    // reader) so the first timed query measures the query, not JVM init.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Sorted for run-to-run comparability (Map order is hash-arbitrary).
    // Each query runs twice and reports the faster time: the box shares
    // a host and single runs swing ±5s on whichever query collides with
    // ambient load (measured: the spike moves between runs while
    // steady-state stays put). Min-of-2 measures the query, not the
    // neighbor's noise.
    val iterations = 2
    val failed = Seq.newBuilder[String]
    // Optional name filter (comma-separated, exact names): isolate one
    // query's steady-state time from whole-suite JVM effects (codegen
    // cache pressure, GC inheritance) when bisecting a bench outlier.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    def timedRun(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Boolean, Double) = {
      val t0 = System.nanoTime()
      val ok =
        try { Force.rows(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          false
        }
      (ok, (System.nanoTime() - t0) / 1e9)
    }
    val results0 = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val base = (1 to iterations).map(_ => timedRun(name, fn))
      // Min-of-2 misses when ambient load (shared host) collides with
      // BOTH runs — measured: an 11s bench outlier on a query whose
      // steady state is 2s. Strongly disagreeing runs mean at least one
      // was noise, so buy one more sample; agreeing runs stop at 2.
      val ts = base.map(_._2)
      val times =
        if (base.forall(_._1) && ts.max > 1.5 * ts.min)
          base :+ timedRun(name, fn)
        else base
      // Min over SUCCESSFUL runs only — a fast failure must not stand in
      // for the query's time. `failed` lists only queries where EVERY
      // iteration failed; a transient single-iteration flake reports its
      // successful time and stays off the list.
      val good = times.collect { case (true, t) => t }
      if (good.isEmpty) failed += name
      // Failed queries report None → JSON null: every numeric `queries`
      // entry denotes a SUCCESSFUL run, and `failed` is the single
      // source of truth. (A time-to-crash value summed into the total
      // would read as an ultra-fast pass to a round-over-round diff.)
      name -> (if (good.nonEmpty) Some(good.min) else None)
    }
    // Regression self-verification (full runs only): r10's snapshot
    // recorded four >1.5× "regressions" that a same-code quiet-host run
    // disproved — ambient load, not code. Before writing the snapshot,
    // any query >1.5× over its committed BENCH_QUERIES.json record gets
    // two more runs at the END of the suite (steady JVM); the min of
    // all observations stands, and only a query that STILL exceeds
    // 1.5× lands in `verified_regressions` — the snapshot's signal
    // that a slowdown survived re-measurement and deserves code review.
    val prior: Map[String, Double] =
      try {
        val p = java.nio.file.Paths.get("BENCH_QUERIES.json")
        if (!java.nio.file.Files.exists(p)) Map.empty
        else {
          val root = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(java.nio.file.Files.readString(p))
          val q = root.get("queries")
          // Only a record measured under the SAME forcing is a valid
          // baseline: count()-forced times are up to ~8x faster than
          // full-plan times on queries whose work count() eliminated,
          // so comparing across the transition floods the recheck loop
          // (forward) or masks real regressions (backward).
          val fullForced = root.get("force") != null &&
            root.get("force").asText() == "full"
          if (q == null || !fullForced) Map.empty
          else {
            val b = Map.newBuilder[String, Double]
            q.fields().forEachRemaining { e =>
              if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
            }
            b.result()
          }
        }
      } catch { case e: Exception =>
        System.err.println(s"[bench] prior record unreadable: $e")
        Map.empty
      }
    val verifiedRegressions = Seq.newBuilder[String]
    var rechecked = 0
    // Ratio AND absolute floor: at the ~0.3 s per-query fixed-cost
    // floor a +0.15 s ambient swing is 1.5× "regression" — measured:
    // a busier-host full run flagged two untouched sub-second queries
    // and nothing else. A slowdown must clear half a second to mean
    // anything on this suite.
    def regressed(t: Double, p: Double): Boolean =
      t > 1.5 * p && t - p > 0.5
    val results = results0.map {
      case (name, Some(t)) if prior.get(name).exists(regressed(t, _)) =>
        rechecked += 1
        val extra = (1 to 2)
          .map(_ => timedRun(name, selected(name)))
          .collect { case (true, tt) => tt }
        val best = (extra :+ t).min
        if (regressed(best, prior(name))) verifiedRegressions += name
        name -> Some(best)
      case other => other
    }
    // The harness that captures this output keeps only the LAST 2000
    // chars of stdout — measured, not assumed: every committed
    // BENCH_rNN.json has `"tail"` of exactly 2000 chars, and in round 6
    // (the one round that printed the full map) the tail BEGINS
    // mid-queries-map (`":0.149,"q_rollup":0.284,...`) and `parsed` is
    // {} — the full line overran the window and the round recorded no
    // bench at all. ~230 queries × ~22 bytes ≈ 5 KB can never fit, so
    // "put the full map in the snapshot" is not satisfiable from this
    // side of the pipe. What we do instead: the FULL per-query map goes
    // to BENCH_QUERIES.json (committed every round → round-over-round
    // diffable via git) plus an append-only BENCH_HISTORY.jsonl, and
    // the stdout line carries as many slowest-first entries as fit a
    // conservative line budget under the 2000-char window.
    def ms(v: Double): String = JsonFmt.ms(v)
    def qjson(rs: Seq[(String, Option[Double])]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v.map(ms).getOrElse("null") }
        .mkString("{", ",", "}")
    val failedJson = failed.result().distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val vrJson = verifiedRegressions.result().distinct
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    // A filtered run is a diagnostic, never the round's record: keep it
    // away from the committed snapshot + history files.
    val benchFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "/tmp/BENCH_FILTERED.json" else "BENCH_QUERIES.json")
    val fullLine =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":${qjson(results)},"failed":$failedJson,"verified_regressions":$vrJson,"rechecked":$rechecked,"iterations":$iterations,"force":"full","sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(benchFile), fullLine + "\n")
    catch { case e: Exception => System.err.println(s"[bench] could not write $benchFile: $e") }
    // BENCH_QUERIES.json is overwritten every round; the history file
    // accumulates one timestamped line per run so per-round full maps
    // stay diffable after the snapshot artifact truncates to 40 entries.
    if (only.isEmpty) {
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        s"""{"at":"${java.time.Instant.now()}",""" + fullLine.drop(1) + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case e: Exception => System.err.println(s"[bench] history: $e") }
    }
    // Fill the stdout line with slowest-first entries up to a fixed
    // budget: the envelope (metric/failed/counts/pointer) costs ~250
    // chars, the capture window is 2000, and a safety margin absorbs
    // any stray log line the session emits after us — so budget the
    // queries map at 1500 chars (~70-90 entries vs the old fixed 40).
    val bySlowest = results.collect { case (k, Some(v)) => (k, v) }.sortBy(-_._2)
    // The failed list rides the same line; charge its actual length
    // against the budget so a mass-failure round (the one whose failed
    // list matters most) cannot push the line past the capture window.
    val budget = math.max(200, 1500 - failedJson.length - vrJson.length)
    var used = 0
    val kept = bySlowest.takeWhile { case (k, v) =>
      used += k.length + ms(v).length + 4 // "k":v,
      used <= budget
    }.sortBy(_._1).map { case (k, v) => (k, Option(v)) }
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":${qjson(kept)},"failed":$failedJson,"verified_regressions":$vrJson,"rechecked":$rechecked,"iterations":$iterations,"force":"full","n_queries":${results.size},"n_failed":${failed.result().distinct.size},"n_in_line":${kept.size},"all_queries_in":"$benchFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
