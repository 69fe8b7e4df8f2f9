package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Fixed CPU-bound calibration probe: 64 M xxhash64 over 32
    * partitions — pure codegen'd compute, zero I/O, zero engine code,
    * so its cost is constant across graft changes and moves ONLY with
    * ambient host load (the thing that polluted six same-code r12
    * passes across a 220–288 s spread). Median-of-3 smooths scheduler
    * jitter. */
  private def calibrate(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{sum, xxhash64, col, lit, pmod}
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      // pmod bounds the addends so the 64M-row sum can't overflow a
      // long under ANSI mode; the hash still dominates the cost.
      spark.range(0L, 64L * 1000 * 1000, 1L, 32)
        .select(sum(pmod(xxhash64(col("id")), lit(1000000L)))).head()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(1)
  }

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
    // Regression-gate self-test knob: "name:millis" injects a sleep
    // into that query's timed path, proving a REAL slowdown still
    // fires through the calibration/min-merge machinery (the r13
    // protocol's required negative control). Never set by the driver.
    val injectSleep: Map[String, Long] =
      sys.env.get("SPARK_GRAFT_BENCH_INJECT_SLEEP").map { s =>
        s.split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
          val Array(n, ms) = kv.split(":")
          n -> ms.toLong
        }.toMap
      }.getOrElse(Map.empty)
    def timedRun(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Boolean, Double) = {
      val t0 = System.nanoTime()
      val ok =
        try {
          injectSleep.get(name).foreach(Thread.sleep)
          Force.rows(fn(spark, sfDir)); true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          false
        }
      (ok, (System.nanoTime() - t0) / 1e9)
    }
    val calibStart = calibrate(spark)
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
    // Regression self-verification (full runs only), r13 protocol: the
    // committed records are BEST-of-clean-passes (min-merged below, so
    // a noisy run can never inflate them — six same-code r12 passes
    // spanned 220.3–288.3 s and the noisiest one overwrote the file),
    // and every flag is AMBIENT-NORMALIZED first: observed times are
    // deflated by the calibration probe's load factor (probe cost now /
    // committed quiet-host reference, clamped ≥1 so a quiet host never
    // AMPLIFIES a flag) before comparing against the record. A query
    // still >1.5× past its record after normalization gets two more
    // runs at the END of the suite (steady JVM, fresh load reading);
    // only one that STILL exceeds the gate lands in
    // `verified_regressions` — a slowdown that survived re-measurement
    // under a measured-quiet interpretation and deserves code review.
    case class Prior(queries: Map[String, Double], calibRef: Option[Double])
    val prior: Prior =
      try {
        val p = java.nio.file.Paths.get("BENCH_QUERIES.json")
        if (!java.nio.file.Files.exists(p)) Prior(Map.empty, None)
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
          // Records are per-(SF, force): a sf0.01 diagnostic run must
          // neither read nor write the committed sf0.1 records.
          val sameSf = root.get("sf") != null &&
            root.get("sf").asText() == sfDir
          if (q == null || !fullForced || !sameSf) Prior(Map.empty, None)
          else {
            val b = Map.newBuilder[String, Double]
            q.fields().forEachRemaining { e =>
              if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
            }
            val cr = Option(root.get("calib_ref")).filter(_.isNumber)
              .map(_.asDouble())
            Prior(b.result(), cr)
          }
        }
      } catch { case e: Exception =>
        System.err.println(s"[bench] prior record unreadable: $e")
        Prior(Map.empty, None)
      }
    // Explicit record rebase for ACCEPTED cost changes (a query whose
    // plan legitimately gained work would otherwise flag forever
    // against its pre-change record): comma-separated names, or "all".
    // The rebased record takes THIS run's time; history keeps the old.
    val rebase: Set[String] =
      sys.env.get("SPARK_GRAFT_BENCH_REBASE")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)
    def rebased(name: String): Boolean =
      rebase.contains("all") || rebase.contains(name)
    val calibRef = prior.calibRef match {
      case Some(r) => math.min(r, calibStart) // quietest host ever seen
      case None => calibStart
    }
    // Clamped [1, 2]: ≥1 so a quiet host never AMPLIFIES a flag, ≤2 so
    // an unluckily-fast reference reading can never deflate away a
    // real 2× regression (a >2×-loaded host produces unusable numbers
    // regardless — rerun, don't normalize harder).
    def load(calibNow: Double): Double =
      math.min(2.0, math.max(1.0, calibNow / calibRef))
    val loadStart = load(calibStart)
    val verifiedRegressions = Seq.newBuilder[String]
    var rechecked = 0
    // Ratio AND absolute floor: at the ~0.3 s per-query fixed-cost
    // floor a +0.15 s ambient swing is 1.5× "regression" — measured:
    // a busier-host full run flagged two untouched sub-second queries
    // and nothing else. A slowdown must clear half a second to mean
    // anything on this suite.
    def regressedAdj(adj: Double, p: Double): Boolean =
      adj > 1.5 * p && adj - p > 0.5
    val suspects = results0.collect {
      case (name, Some(t)) if !rebased(name) &&
        prior.queries.get(name).exists(regressedAdj(t / loadStart, _)) => name
    }.toSet
    // Re-read ambient load ONCE at recheck time (it moved mid-suite in
    // every noisy r12 pass): each measurement is normalized by the
    // load reading CONTEMPORANEOUS with it — the suite-start reading
    // for the original time, the recheck-time reading for the extra
    // runs — and the flag stands only if the best ADJUSTED time still
    // clears the gate.
    val calibEnd = if (suspects.nonEmpty) calibrate(spark) else calibStart
    val loadEnd = load(calibEnd)
    val results = results0.map {
      case (name, Some(t)) if suspects(name) =>
        rechecked += 1
        val extra = (1 to 2)
          .map(_ => timedRun(name, selected(name)))
          .collect { case (true, tt) => tt }
        val bestAdj = (extra.map(_ / loadEnd) :+ t / loadStart).min
        if (regressedAdj(bestAdj, prior.queries(name)))
          verifiedRegressions += name
        name -> Some((extra :+ t).min)
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
    // Committed RECORDS are the min-merge of this run with the prior
    // file (same SF + forcing): best-of-clean-passes by construction —
    // the only way a record moves UP is an explicit rebase. This run's
    // observed times still go verbatim to BENCH_HISTORY.jsonl, so the
    // raw measurement is never lost, only kept out of the gate floor.
    val records = results.map {
      case (name, Some(t)) =>
        val rec = prior.queries.get(name) match {
          case Some(p) if !rebased(name) => math.min(p, t)
          case _ => t
        }
        name -> Some(rec)
      case (name, None) =>
        // A failed query keeps its prior record (the failure is
        // visible in `failed`; losing the record would reset the
        // gate floor for the next round).
        name -> prior.queries.get(name)
    }
    // A filtered run is a diagnostic, never the round's record: keep it
    // away from the committed snapshot + history files.
    val benchFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "/tmp/BENCH_FILTERED.json" else "BENCH_QUERIES.json")
    val calibJson =
      s""""calibration":{"sec":${ms(calibStart)},"end_sec":${ms(calibEnd)},"load":${ms(loadStart)}},"calib_ref":${ms(calibRef)}"""
    def line(qs: Seq[(String, Option[Double])], extraTail: String): String =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":${qjson(qs)},"failed":$failedJson,"verified_regressions":$vrJson,"rechecked":$rechecked,"iterations":$iterations,"force":"full",$calibJson,"records":"min-merge"$extraTail,"sf":"$sfDir"}"""
    // The committed file carries the min-merged RECORDS (the gate
    // floor); the history line carries this run's OBSERVED times.
    val recordLine = line(records, "")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(benchFile), recordLine + "\n")
    catch { case e: Exception => System.err.println(s"[bench] could not write $benchFile: $e") }
    // BENCH_QUERIES.json is min-merged every round; the history file
    // accumulates one timestamped OBSERVED line per run so per-round
    // raw measurements stay diffable after min-merge smooths the
    // committed floor.
    if (only.isEmpty) {
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        s"""{"at":"${java.time.Instant.now()}","observed":true,""" +
          line(results, "").drop(1) + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case e: Exception => System.err.println(s"[bench] history: $e") }
    }
    // Fill the stdout line with slowest-first entries up to a fixed
    // budget: the envelope (metric/failed/counts/calibration/pointer)
    // costs ~350 chars, the capture window is 2000, and a safety
    // margin absorbs any stray log line the session emits after us —
    // so budget the queries map at 1400 chars (~65-85 entries).
    val bySlowest = results.collect { case (k, Some(v)) => (k, v) }.sortBy(-_._2)
    // The failed list rides the same line; charge its actual length
    // against the budget so a mass-failure round (the one whose failed
    // list matters most) cannot push the line past the capture window.
    val budget = math.max(200, 1400 - failedJson.length - vrJson.length)
    var used = 0
    val kept = bySlowest.takeWhile { case (k, v) =>
      used += k.length + ms(v).length + 4 // "k":v,
      used <= budget
    }.sortBy(_._1).map { case (k, v) => (k, Option(v)) }
    println(line(kept,
      s""","n_queries":${results.size},"n_failed":${failed.result().distinct.size},"n_in_line":${kept.size},"all_queries_in":"$benchFile""""))
    spark.stop()
  }
}
