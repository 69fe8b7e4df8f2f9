package graft.engine

import graft.diff.DatasetDiff
import graft.rules.{RuleReport, RuleRunner}
import graft.views.ViewCreator
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.input_file_name
import scala.collection.mutable

/** Result of running a plan: failed-assertion count (the reference exits
  * 3 when > 0 — reference: tnengine/TnEngine.scala:47-50), all rule
  * reports by command, and the key→DataFrame lookup for downstream use. */
case class PlanResult(
    numFailedAssertions: Int,
    reports: Seq[(String, Seq[RuleReport])],
    outputs: Map[String, DataFrame]) {
  def exitCode: Int = if (numFailedAssertions > 0) 3 else 0
}

/** Executes a [[Plan]] sequentially, threading command outputs through a
  * key→DataFrame lookup table (reference: tnengine/TnEngine.scala:199-279).
  *
  * Spark-first notes:
  *  - outputs stay lazy logical plans unless `cache` is set — a view
  *    feeding one assertion costs nothing extra, Catalyst fuses the
  *    pipeline into one job;
  *  - `outputPath` persists parquet; `tableName` registers a temp view
  *    (the reference mounts an external Hive table; a library should not
  *    mutate the metastore);
  *  - nested plans share the same lookup table, as in the reference.
  */
class PlanRunner(spark: SparkSession, reportWriter: Option[ReportWriter] = None) {
  private val lookup = mutable.LinkedHashMap.empty[String, DataFrame]

  /** Preload a DataFrame under a key (useful for library callers). */
  def register(key: String, df: DataFrame): PlanRunner = {
    lookup.put(key, df); this
  }

  def resolve(input: InputRef): DataFrame =
    if (!input.onDisk)
      // Catalog-mode input (reference: tnengine/TnEngine.scala:38
      // enableHiveSupport): a non-disk ref not produced by an earlier
      // command resolves through the session catalog — temp views,
      // spark_catalog / warehouse-backed tables, and (when the session
      // was built with enableHiveSupport) Hive-metastore tables, all via
      // the same spark.table() path. Plan keys win on collision so a
      // command output can shadow a catalog name deliberately.
      lookup.getOrElse(input.ref, {
        // tableExists throws ParseException for refs that are not valid
        // SQL identifiers (e.g. a typo'd output key with a space) —
        // treat unparseable as not-a-table so the plan author gets the
        // descriptive missing-input error, not an identifier-parser
        // one. Anything ELSE (e.g. metastore connectivity failure)
        // propagates: reporting it as "input not found" would mask the
        // real error.
        val inCatalog =
          try spark.catalog.tableExists(input.ref)
          catch {
            case _: org.apache.spark.sql.catalyst.parser.ParseException =>
              false
          }
        if (inCatalog) spark.table(input.ref)
        else throw new IllegalArgumentException(
          s"Input ${input.ref} not in lookup table or session catalog.")
      })
    else input.format.orElse {
      input.delimiter.map(_ => "csv").orElse {
        val ext = input.ref.reverse.takeWhile(_ != '.').reverse.toLowerCase
        Some(ext).filter(Set("csv", "tsv", "json", "orc", "txt", "xml"))
      }
    } match {
      case Some("csv") | Some("tsv") =>
        spark.read.format("csv")
          .option("header", "true")
          .option("inferSchema", "true")
          .option("delimiter", input.delimiter.map(_.take(1)).getOrElse(","))
          .load(input.ref)
      case Some("json") => spark.read.json(input.ref)
      case Some("orc") => spark.read.orc(input.ref)
      // XML records (Spark 4 ships the former spark-xml as a built-in
      // source): one row per `rowTag` element, schema inferred.
      case Some("xml") =>
        spark.read.option("rowTag", input.rowTag.getOrElse("ROW"))
          .xml(input.ref)
      // Raw text corpus: one document per line in a `value` column —
      // the native LLM-pipeline ingestion path for crawl/text drops
      // that carry no schema at all.
      case Some("text") | Some("txt") => spark.read.text(input.ref)
      // Whole-file text: one document per FILE (value + the path via
      // input_file_name()) — for corpora where documents span lines.
      case Some("wholetext") =>
        spark.read.option("wholetext", "true").text(input.ref)
          .withColumn("path", input_file_name())
      case _ => spark.read.parquet(input.ref)
    }

  def run(plan: Plan, reportKey: String = "plan"): PlanResult = {
    val reports = mutable.Buffer.empty[(String, Seq[RuleReport])]
    val failed = runCommands(plan.commands, reports)
    val writer = reportWriter.orElse(
      plan.reportDest.map(d => new FsReportWriter(spark, d)))
    writer.foreach(_.write(reportKey, reports.toSeq))
    PlanResult(failed, reports.toSeq, lookup.toMap)
  }

  private def runCommands(cmds: Seq[Command],
      reports: mutable.Buffer[(String, Seq[RuleReport])]): Int =
    cmds.map {
      case c: AssertionCommand =>
        val input = resolve(c.input)
        // The engine's report path collects per-rule samples (bounded,
        // projected to rule-referenced columns) like the reference's
        // assertion reports do.
        val ruleReports = RuleRunner.reports(input, c.rules, collectSamples = true)
        reports.append(c.outputKey -> ruleReports)
        store(RuleRunner.invalidRows(input, c.rules), c)
        ruleReports.count(_.failed)
      case c: DiffCommand =>
        store(DatasetDiff.diff(resolve(c.input1), resolve(c.input2), c.diffConfig), c)
        0
      case c: ViewCommand =>
        require(c.inputs.length == c.tableAliases.length,
          "tableAliases must match inputs, by position")
        store(ViewCreator.createView(spark,
          c.tableAliases.zip(c.inputs.map(resolve)), c.query), c)
        0
      case c: SchemaCommand =>
        val input = resolve(c.input)
        store(graft.rules.SchemaContract.report(spark, input, c.contract), c)
        if (graft.rules.SchemaContract.passed(input, c.contract, c.allowExtra)) 0
        else 1
      case c: ProfileCommand =>
        val input = resolve(c.input)
        store(
          if (c.approx) graft.rules.Profiler.profileApprox(input, c.columns)
          else graft.rules.Profiler.profile(input, c.columns), c)
        0
      case c: DedupCommand =>
        val input = resolve(c.input)
        store(
          if (c.keepDuplicatesReport)
            graft.dedup.Dedup.exactGroups(input, c.textCol, c.idCol)
          else graft.dedup.Dedup.canonicalRows(input, c.textCol, c.idCol), c)
        0
      case c: SampleCommand =>
        store(graft.operators.Sampling.stratifiedTopK(
          resolve(c.input), c.stratumCols, c.idCol, c.k, c.seed), c)
        0
      case c: TopNCommand =>
        val ord = if (c.descending)
          org.apache.spark.sql.functions.col(c.orderCol).desc
        else org.apache.spark.sql.functions.col(c.orderCol).asc
        store(org.apache.spark.sql.graft.TopK.perKey(resolve(c.input),
          c.keyCols,
          Seq(ord, org.apache.spark.sql.functions.col(c.tiebreakCol).asc),
          c.k), c)
        0
      case c: ChecksumCommand =>
        val fp = graft.rules.Fingerprint.of(resolve(c.input), c.columns)
        store(fp, c)
        val row = fp.head()
        val checksum = row.getAs[String]("checksum")
        val failed = c.expected.exists(_ != checksum)
        reports.append(c.outputKey -> Seq(RuleReport(
          query = s"checksum(${c.columns.mkString(", ")})" +
            c.expected.map(e => s" == $e").getOrElse(""),
          description = "order-independent table fingerprint" +
            (if (c.expected.isDefined) " gate" else ""),
          threshold = 0.0,
          totalRows = row.getAs[Long]("n_rows"),
          numInvalid = if (failed) 1 else 0,
          fractionInvalid = if (failed) 1.0 else 0.0,
          failed = failed,
          summaryStats = Map("checksum" -> checksum))))
        if (failed) 1 else 0
      case c: DriftCommand =>
        // driftOuter, not drift: the gate must see bins present on only
        // one side (epsilon-smoothed large finite terms) — an inner
        // join would score a COMPLETE distribution shift as zero.
        val bins = graft.rules.Profiler.driftOuter(
          resolve(c.baseline), resolve(c.input), c.valueCol, c.binWidth)
        store(bins, c)
        // Total PSI is one scalar over the bounded per-bin frame (the
        // store() above keeps the lazy plan; cache: true avoids the
        // second bin pass when the output is also consumed downstream).
        val agg = bins.agg(
          org.apache.spark.sql.functions.sum("psi"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1))).head()
        val total = if (agg.isNullAt(0)) 0.0 else agg.getDouble(0)
        val failed = c.maxPsi.exists(total > _)
        reports.append(c.outputKey -> Seq(RuleReport(
          query = s"psi(${c.valueCol}, binWidth=${c.binWidth})" +
            c.maxPsi.map(m => s" <= $m").getOrElse(""),
          description = s"PSI drift gate on ${c.valueCol} vs baseline",
          // -1 = ungated (informational): a finite sentinel, because
          // Infinity would serialize as a STRING in the JSON report and
          // break numeric consumers.
          threshold = c.maxPsi.getOrElse(-1.0),
          totalRows = agg.getLong(1),
          numInvalid = if (failed) 1 else 0,
          fractionInvalid = if (failed) 1.0 else 0.0,
          failed = failed,
          summaryStats = Map("psi_total" -> total))))
        if (failed) 1 else 0
      case c: SprtCommand =>
        val walk = graft.rules.Sprt.walk(resolve(c.input), c.timeCol,
          org.apache.spark.sql.functions.expr(c.defectExpr),
          c.granularity, c.p0, c.p1, c.alpha)
        store(walk, c)
        // The gate reads only the STOPPING decision (1-row aggregate
        // over the bounded per-period walk frame).
        val decision = graft.rules.Sprt.stoppingDecision(walk)
        val failed = decision == "accept_h1"
        reports.append(c.outputKey -> Seq(RuleReport(
          query = s"sprt(${c.defectExpr}; p0=${c.p0}, p1=${c.p1}, " +
            s"alpha=${c.alpha}, per ${c.granularity})",
          description = "sequential probability-ratio defect-rate gate",
          threshold = c.p1,
          totalRows = 1,
          numInvalid = if (failed) 1 else 0,
          fractionInvalid = if (failed) 1.0 else 0.0,
          failed = failed,
          summaryStats = Map("decision" -> decision))))
        if (failed) 1 else 0
      case c: PlanCommand =>
        runCommands(c.plan.commands, reports)
    }.sum

  private def store(df: DataFrame, cmd: Command): Unit = {
    val out = if (cmd.cache) df.cache() else df
    lookup.put(cmd.outputKey, out)
    cmd.outputPath.foreach { p =>
      out.write.mode(SaveMode.Overwrite).parquet(p)
    }
    cmd.tableName.foreach(out.createOrReplaceTempView)
  }
}
