package graft.engine

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class PlanRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("plan: view feeds assertion; failed count and reports flow through") {
    Seq((1, 10.0), (2, -3.0), (3, 5.0)).toDF("id", "bal")
      .createOrReplaceTempView("unused") // ensure temp-view isolation
    val runner = new PlanRunner(spark)
      .register("src", Seq((1, 10.0), (2, -3.0), (3, 5.0)).toDF("id", "bal"))
    val plan = PlanParser.parse(
      """{
        |  "commands": [
        |    {"command": "view",
        |     "inputs": [{"ref": "src", "onDisk": false}],
        |     "params": {"tableAliases": ["t"],
        |                "query": "SELECT id, bal * 2 AS bal2 FROM t"},
        |     "outputKey": "doubled"},
        |    {"command": "assertion",
        |     "input": {"ref": "doubled", "onDisk": false},
        |     "params": {"assertions": [
        |        {"query": "bal2 > 0", "description": "positive", "threshold": 0.1}]},
        |     "outputKey": "bad"}
        |  ]
        |}""".stripMargin)
    val res = runner.run(plan)
    assert(res.numFailedAssertions === 1) // 1/3 invalid > 0.1
    assert(res.exitCode === 3)
    assert(res.outputs("bad").select("id").as[Int].collect().toSeq === Seq(2))
    assert(res.reports.head._2.head.numInvalid === 1)
  }

  test("schema command gates the plan: conforming passes, drift fails") {
    val src = Seq((1L, "a")).toDF("id", "name")
    def plan(idType: String) = PlanParser.parse(
      s"""{
         |  "commands": [
         |    {"command": "schema",
         |     "input": {"ref": "src", "onDisk": false},
         |     "params": {"columns": [
         |        {"name": "id", "type": "$idType"},
         |        {"name": "name", "type": "string"}]},
         |     "outputKey": "schema_report"}
         |  ]
         |}""".stripMargin)
    val ok = new PlanRunner(spark).register("src", src).run(plan("bigint"))
    assert(ok.numFailedAssertions === 0)
    assert(ok.exitCode === 0)
    val drifted = new PlanRunner(spark).register("src", src).run(plan("int"))
    assert(drifted.numFailedAssertions === 1)
    assert(drifted.exitCode === 3)
    assert(drifted.outputs("schema_report")
      .where("status = 'type_mismatch'").count() === 1)
  }

  test("dedup command keeps one canonical row per content, report mode counts") {
    val src = Seq((3L, "same text"), (1L, "same text"), (2L, "other text"))
      .toDF("doc_id", "text")
    def plan(report: Boolean) = PlanParser.parse(
      s"""{
         |  "commands": [
         |    {"command": "dedup",
         |     "input": {"ref": "src", "onDisk": false},
         |     "params": {"textCol": "text", "idCol": "doc_id",
         |                "keepDuplicatesReport": $report},
         |     "outputKey": "out"}
         |  ]
         |}""".stripMargin)
    val deduped = new PlanRunner(spark).register("src", src).run(plan(false))
    assert(deduped.exitCode === 0)
    assert(deduped.outputs("out").columns.toSeq == Seq("doc_id", "text"))
    assert(deduped.outputs("out").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L)) // min-id canonical per content
    val report = new PlanRunner(spark).register("src", src).run(plan(true))
    assert(report.outputs("out")
      .where("n_docs = 2 AND canonical_id = 1").count() === 1)
  }

  test("topn command keeps k rows per key via the custom operator") {
    val src = Seq((1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0),
      (4L, "b", 5.0), (5L, "b", 50.0))
      .toDF("id", "seg", "score")
    val plan = PlanParser.parse(
      """{
        |  "commands": [
        |    {"command": "topn",
        |     "input": {"ref": "src", "onDisk": false},
        |     "params": {"keyCols": ["seg"], "orderCol": "score",
        |                "tiebreakCol": "id", "k": 2},
        |     "outputKey": "out"}
        |  ]
        |}""".stripMargin)
    val res = new PlanRunner(spark).register("src", src).run(plan)
    assert(res.exitCode === 0)
    assert(res.outputs("out").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(2L, 3L, 4L, 5L)) // top-2 by score desc per segment
    // Ascending variant flips the election.
    val asc = PlanParser.parse(
      """{
        |  "commands": [
        |    {"command": "topn",
        |     "input": {"ref": "src", "onDisk": false},
        |     "params": {"keyCols": ["seg"], "orderCol": "score",
        |                "tiebreakCol": "id", "k": 1,
        |                "descending": false},
        |     "outputKey": "out"}
        |  ]
        |}""".stripMargin)
    assert(new PlanRunner(spark).register("src", src).run(asc)
      .outputs("out").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 4L))
  }

  test("profile command reports per-column rows/nulls/distincts") {
    val src = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "a"))
      .toDF("id", "name")
    val plan = PlanParser.parse(
      """{
        |  "commands": [
        |    {"command": "profile",
        |     "input": {"ref": "src", "onDisk": false},
        |     "params": {"columns": ["id", "name"]},
        |     "outputKey": "prof"}
        |  ]
        |}""".stripMargin)
    val res = new PlanRunner(spark).register("src", src).run(plan)
    assert(res.exitCode === 0)
    val rows = res.outputs("prof").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows("id") == ((3L, 0L, 3L)))
    assert(rows("name") == ((3L, 1L, 1L)))
  }

  test("nested plans share the lookup table") {
    val runner = new PlanRunner(spark)
      .register("src", Seq((1, 2)).toDF("a", "b"))
    val plan = PlanParser.parse(
      """{
        |  "commands": [
        |    {"command": "plan", "params": {"commands": [
        |       {"command": "view", "inputs": [{"ref": "src", "onDisk": false}],
        |        "params": {"tableAliases": ["s"], "query": "SELECT a + b AS c FROM s"},
        |        "outputKey": "inner"}]}},
        |    {"command": "view", "inputs": [{"ref": "inner", "onDisk": false}],
        |     "params": {"tableAliases": ["i"], "query": "SELECT c * 10 AS d FROM i"},
        |     "outputKey": "outer"}
        |  ]
        |}""".stripMargin)
    val res = runner.run(plan)
    assert(res.outputs("outer").select("d").as[Int].collect().toSeq === Seq(30))
  }

  test("diff command wires through config including thresholds") {
    val runner = new PlanRunner(spark)
      .register("a", Seq((1, 10.0), (2, 20.0)).toDF("id", "v"))
      .register("b", Seq((1, 10.4), (2, 28.0)).toDF("id", "v"))
    val plan = PlanParser.parse(
      """{
        |  "commands": [
        |    {"command": "diff",
        |     "input1": {"ref": "a", "onDisk": false}, "input1Name": "cur",
        |     "input2": {"ref": "b", "onDisk": false}, "input2Name": "old",
        |     "threshold": 0.5,
        |     "params": {
        |       "input1Columns": {"joinColumns": ["id"], "diffColumns": ["v"]},
        |       "input2Columns": {"joinColumns": ["id"], "diffColumns": ["v"]}},
        |     "outputKey": "d"}
        |  ]
        |}""".stripMargin)
    val out = runner.run(plan).outputs("d")
    val st = out.select("cur_id", "cur_v__equals__old_v")
      .as[(Int, String)].collect().toMap
    assert(st(1) === graft.diff.DatasetDiff.Equal)
    assert(st(2) === graft.diff.DatasetDiff.NotEqual)
  }

  test("report writer receives per-group reports; FsReportWriter writes JSON") {
    val tmp = Files.createTempDirectory("graft_report").toString
    val runner = new PlanRunner(spark)
      .register("src", Seq((1, -1.0)).toDF("id", "bal"))
    val plan = PlanParser.parse(
      s"""{
         |  "io": {"writer": "file", "dest": "$tmp"},
         |  "commands": [
         |    {"command": "assertion", "input": {"ref": "src", "onDisk": false},
         |     "params": {"assertions": [
         |        {"query": "bal > 0", "description": "pos", "threshold": 0.0}]},
         |     "outputKey": "k"}
         |  ]
         |}""".stripMargin)
    runner.run(plan, reportKey = "myreport")
    val written = new String(
      Files.readAllBytes(Paths.get(tmp, "myreport.json")), "UTF-8")
    assert(written.contains("\"outputKey\" : \"k\""))
    assert(written.contains("\"numInvalid\" : 1"))
    assert(written.contains("\"failed\" : true"))
  }

  test("TransportReportWriter ships the rendered JSON through the caller's transport") {
    val posted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val runner = new PlanRunner(spark,
      reportWriter = Some(new TransportReportWriter((k, body) => posted += k -> body)))
      .register("src", Seq((1, -1.0), (2, 3.0)).toDF("id", "bal"))
    val plan = PlanParser.parse(
      """{
        |  "commands": [
        |    {"command": "assertion", "input": {"ref": "src", "onDisk": false},
        |     "params": {"assertions": [
        |        {"query": "bal > 0", "description": "pos", "threshold": 0.6}]},
        |     "outputKey": "k"}
        |  ]
        |}""".stripMargin)
    runner.run(plan, reportKey = "restlike")
    assert(posted.map(_._1) === Seq("restlike"))
    val body = posted.head._2
    // The transport receives the SAME canonical document FsReportWriter
    // persists — a REST/HBase/bus sink sees no writer-specific dialect.
    assert(body.contains("\"outputKey\" : \"k\""))
    assert(body.contains("\"numInvalid\" : 1"))
    assert(body.contains("\"failed\" : false"))
  }

  test("variable substitution and unknown command errors") {
    val plan = PlanParser.parse(
      """{"commands":[{"command":"view","inputs":[{"ref":"${key}","onDisk":false}],
        |"params":{"tableAliases":["t"],"query":"SELECT * FROM t"},"outputKey":"o"}]}"""
        .stripMargin,
      variables = Map("key" -> "resolved"))
    assert(plan.commands.head.asInstanceOf[ViewCommand].inputs.head.ref === "resolved")
    intercept[IllegalArgumentException] {
      PlanParser.parse("""{"commands":[{"command":"bogus"}]}""")
    }
  }

  test("parseFile falls back to the classpath, as the reference's file reader does") {
    // plans/classpath_plan.json exists only in src/test/resources (a
    // stand-in for a plan template shipped inside an application jar).
    val plan = PlanParser.parseFile("plans/classpath_plan.json",
      variables = Map("table" -> "resolved_input"))
    val view = plan.commands.head.asInstanceOf[ViewCommand]
    assert(view.inputs.head.ref === "resolved_input")
    assert(view.query === "SELECT COUNT(*) AS n FROM t")
    intercept[java.nio.file.NoSuchFileException] {
      PlanParser.parseFile("plans/definitely_missing.json")
    }
  }

  test("classpath plan resolves externalParamsFile beside the plan resource") {
    // plans/classpath_ext_plan.json references classpath_params.json —
    // both live under plans/ on the classpath (a jar-shipped pair). The
    // relative ref must resolve against the plan RESOURCE's directory,
    // never against $CWD/plans/ on the filesystem.
    val plan = PlanParser.parseFile("plans/classpath_ext_plan.json",
      variables = Map("table" -> "t_in"))
    val view = plan.commands.head.asInstanceOf[ViewCommand]
    assert(view.query === "SELECT 42 AS answer FROM t")
    assert(view.inputs.head.ref === "t_in")
  }

  test("parser covers sample windows, per-column thresholds, external params") {
    // sampleWindowParams + diff thresholds parse into the typed configs.
    val plan = PlanParser.parse(
      """{"commands":[
        |  {"command":"assertion","input":{"ref":"t","onDisk":false},
        |   "outputKey":"a","params":{"assertions":[
        |     {"query":"x > 0","description":"pos","threshold":0.1,
        |      "sampleWindowParams":{
        |        "idsForWindowPartitioning":["k"],
        |        "orderEachWindowBy":["ts","id"]}}]}},
        |  {"command":"diff","input1":{"ref":"t","onDisk":false},"input1Name":"a",
        |   "input2":{"ref":"u","onDisk":false},"input2Name":"b",
        |   "outputKey":"d",
        |   "params":{
        |     "input1Columns":{"joinColumns":["id"],"diffColumns":["v","w"]},
        |     "input2Columns":{"joinColumns":["id"],"diffColumns":["v","w"]},
        |     "thresholds":[0.5, 2.0]}}
        |]}""".stripMargin)
    val rule = plan.commands.head.asInstanceOf[AssertionCommand].rules.head
    assert(rule.sampleWindow.get.partitionBy === Seq("k"))
    assert(rule.sampleWindow.get.orderBy === Seq("ts", "id"))
    val diff = plan.commands(1).asInstanceOf[DiffCommand]
    assert(diff.perColumnThresholds === Some(Seq(0.5, 2.0)))
  }

  test("externalParamsFile resolves relative to the plan file") {
    val dir = Files.createTempDirectory("graft_plan")
    Files.write(dir.resolve("params.json"),
      """{"tableAliases":["t"],"query":"SELECT 1 AS one"}""".getBytes("UTF-8"))
    Files.write(dir.resolve("plan.json"),
      """{"commands":[{"command":"view","inputs":[{"ref":"x","onDisk":false}],
        |"outputKey":"o","externalParamsFile":"params.json"}]}"""
        .stripMargin.getBytes("UTF-8"))
    val plan = PlanParser.parseFile(dir.resolve("plan.json").toString)
    assert(plan.commands.head.asInstanceOf[ViewCommand].query === "SELECT 1 AS one")
    // Missing plan-relative params must FAIL (never fall back to CWD).
    Files.write(dir.resolve("plan2.json"),
      """{"commands":[{"command":"view","inputs":[{"ref":"x","onDisk":false}],
        |"outputKey":"o","externalParamsFile":"nope.json"}]}"""
        .stripMargin.getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] {
      PlanParser.parseFile(dir.resolve("plan2.json").toString)
    }
    assert(err.getMessage.contains("nope.json"))
  }

  test("catalog-mode input: plan reads a warehouse-backed spark_catalog table") {
    // Reference parity: TnEngine.scala:38 builds its session with
    // enableHiveSupport() so plan inputs can name metastore tables.
    // graft's resolve() goes through spark.table() for any non-disk ref
    // absent from the plan lookup — the one code path that serves temp
    // views, spark_catalog warehouse tables, and (on a Hive-enabled
    // session) metastore tables alike. This exercises the
    // warehouse-backed branch with a managed parquet table; swapping the
    // session builder to enableHiveSupport() changes nothing in graft.
    spark.sql("DROP TABLE IF EXISTS graft_cat_src")
    spark.sql(
      "CREATE TABLE graft_cat_src USING parquet AS " +
        "SELECT * FROM VALUES (1, 5.0), (2, -1.0), (3, 2.0) AS t(id, bal)")
    try {
      assert(spark.catalog.tableExists("graft_cat_src"))
      val plan = PlanParser.parse(
        """{
          |  "commands": [
          |    {"command": "assertion",
          |     "input": {"ref": "graft_cat_src", "onDisk": false},
          |     "params": {"assertions": [
          |        {"query": "bal > 0", "description": "positive", "threshold": 0.5}]},
          |     "outputKey": "bad"}
          |  ]
          |}""".stripMargin)
      val res = new PlanRunner(spark).run(plan)
      assert(res.numFailedAssertions === 0) // 1/3 invalid, under 0.5
      assert(res.outputs("bad").select("id").as[Int].collect().toSeq === Seq(2))
      // A ref that is neither a plan key nor a catalog table still fails
      // loudly, naming both places it looked.
      val err = intercept[IllegalArgumentException] {
        new PlanRunner(spark).resolve(InputRef("graft_no_such", onDisk = false,
          format = None, delimiter = None))
      }
      assert(err.getMessage.contains("catalog"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_src")
  }

  test("sample command: deterministic k-per-stratum election in a plan") {
    val s = spark
    import s.implicits._
    val src = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "parity")
    val plan = PlanParser.parse(
      """{
        |  "commands": [
        |    {"command": "sample",
        |     "input": {"ref": "src", "onDisk": false},
        |     "params": {"stratumCols": ["parity"], "idCol": "id", "k": 3},
        |     "outputKey": "sampled"}
        |  ]
        |}""".stripMargin)
    val res = new PlanRunner(spark).register("src", src).run(plan)
    val out = res.outputs("sampled").collect()
    assert(out.length === 6) // 3 per stratum
    assert(out.map(_.getAs[Int]("sample_rank")).count(_ == 1) === 2)
    // Determinism: a second run elects the identical rows.
    val again = new PlanRunner(spark).register("src", src).run(plan)
      .outputs("sampled").collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(again === out.map(_.getAs[Long]("id")).sorted.toSeq)
    // Parse-time validation: k must be positive.
    val err = intercept[IllegalArgumentException] {
      PlanParser.parse(
        """{"commands": [{"command": "sample",
          |  "input": {"ref": "src", "onDisk": false},
          |  "params": {"stratumCols": ["parity"], "idCol": "id", "k": 0},
          |  "outputKey": "x"}]}""".stripMargin)
    }
    assert(err.getMessage.contains("positive"))
  }

  test("sprt command gates the plan on the walk's stopping decision") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    // 12 months, 100 trials each, steady 35% defect rate.
    val rows = for {
      m <- 1 to 12; i <- 1 to 100
    } yield (Timestamp.valueOf(f"2024-$m%02d-15 00:00:00"),
      if (i <= 35) "bad" else "good")
    val src = rows.toDF("ts", "status")
    def plan(p0: Double, p1: Double) = PlanParser.parse(
      s"""{
         |  "commands": [
         |    {"command": "sprt",
         |     "input": {"ref": "src", "onDisk": false},
         |     "params": {"timeCol": "ts", "defectExpr": "status = 'bad'",
         |                "p0": $p0, "p1": $p1},
         |     "outputKey": "sprt_walk"}
         |  ]
         |}""".stripMargin)
    // Rate 0.35 sits above H1 when testing 0.2 vs 0.3: the walk drifts
    // up, stops at accept_h1, and the plan fails with exit 3.
    val hot = new PlanRunner(spark).register("src", src).run(plan(0.2, 0.3))
    assert(hot.exitCode === 3)
    assert(hot.reports.head._2.head.summaryStats("decision") === "accept_h1")
    assert(hot.outputs("sprt_walk").collect().length === 12)
    // The same data tested against 0.4 vs 0.5 is BELOW H0: accept_h0,
    // informational, exit 0.
    val cold = new PlanRunner(spark).register("src", src).run(plan(0.4, 0.5))
    assert(cold.exitCode === 0)
    assert(cold.reports.head._2.head.summaryStats("decision") === "accept_h0")
    // A single ambiguous month decides nothing: continue, exit 0.
    val tiny = new PlanRunner(spark).register("src",
      rows.take(100).toDF("ts", "status")).run(plan(0.3, 0.4))
    assert(tiny.exitCode === 0)
    assert(tiny.reports.head._2.head.summaryStats("decision") === "continue")
  }

  test("drift command gates the plan on total PSI vs a baseline") {
    val s = spark
    import s.implicits._
    // Baseline uniform over bins 0..3; current shifted hard into bin 3.
    val base = (1 to 40).map(i => (i % 4).toDouble).toDF("v")
    val curr = ((1 to 10).map(i => (i % 4).toDouble) ++
      Seq.fill(30)(3.0)).toDF("v")
    def plan(maxPsi: String) = PlanParser.parse(
      s"""{
         |  "commands": [
         |    {"command": "drift",
         |     "input": {"ref": "curr", "onDisk": false},
         |     "baseline": {"ref": "base", "onDisk": false},
         |     "params": {"valueCol": "v", "binWidth": 1.0$maxPsi},
         |     "outputKey": "psi_bins"}
         |  ]
         |}""".stripMargin)
    // Ungated: informational, exit 0, per-bin frame stored, report row
    // carries the PSI total.
    val res = new PlanRunner(spark).register("base", base)
      .register("curr", curr).run(plan(""))
    assert(res.exitCode === 0)
    assert(res.outputs("psi_bins").collect().length === 4)
    val total = res.reports.head._2.head
      .summaryStats("psi_total").asInstanceOf[Double]
    assert(total > 0.5) // hard shift: a large PSI
    // Gated at 0.25 (the standard "significant shift" line): fails the
    // plan with exit 3; a loose gate above the measured total passes.
    val gated = new PlanRunner(spark).register("base", base)
      .register("curr", curr).run(plan(""", "maxPsi": 0.25"""))
    assert(gated.exitCode === 3)
    assert(gated.reports.head._2.head.failed)
    val loose = new PlanRunner(spark).register("base", base)
      .register("curr", curr).run(plan(s""", "maxPsi": ${total + 1}"""))
    assert(loose.exitCode === 0)
    // Identical sides drift nothing: PSI exactly 0, never failed.
    val same = new PlanRunner(spark).register("base", base)
      .register("curr", base).run(plan(""", "maxPsi": 0.0001"""))
    assert(same.exitCode === 0)
    assert(same.reports.head._2.head
      .summaryStats("psi_total").asInstanceOf[Double] === 0.0)
    // DISJOINT supports — the worst possible shift — must fail the
    // gate, not read as zero (full-outer epsilon-smoothed terms).
    val far = (1 to 40).map(i => 100.0 + (i % 4)).toDF("v")
    val disjoint = new PlanRunner(spark).register("base", base)
      .register("curr", far).run(plan(""", "maxPsi": 0.25"""))
    assert(disjoint.exitCode === 3)
    assert(disjoint.reports.head._2.head
      .summaryStats("psi_total").asInstanceOf[Double] > 10.0)
  }

  test("checksum command fingerprints order-independently and gates on expected") {
    val s = spark
    import s.implicits._
    val src = (1L to 100L).map(i => (i, s"name_$i")).toDF("id", "name")
    def plan(expected: String) = PlanParser.parse(
      s"""{
         |  "commands": [
         |    {"command": "checksum",
         |     "input": {"ref": "src", "onDisk": false},
         |     "params": {"columns": ["id", "name"]$expected},
         |     "outputKey": "fp"}
         |  ]
         |}""".stripMargin)
    val res = new PlanRunner(spark).register("src", src).run(plan(""))
    assert(res.exitCode === 0)
    val checksum = res.reports.head._2.head
      .summaryStats("checksum").asInstanceOf[String]
    assert(res.outputs("fp").collect().head.getAs[Long]("n_rows") === 100L)
    // Row order must not matter: a shuffled copy fingerprints identically.
    val shuffled = src.orderBy(org.apache.spark.sql.functions.rand(7))
      .repartition(5)
    val again = new PlanRunner(spark).register("src", shuffled).run(plan(""))
      .reports.head._2.head.summaryStats("checksum").asInstanceOf[String]
    assert(again === checksum)
    // Gate: matching expected passes, a tampered row fails with exit 3.
    assert(new PlanRunner(spark).register("src", src)
      .run(plan(s""", "expected": "$checksum"""")).exitCode === 0)
    val tampered = src.withColumn("name",
      org.apache.spark.sql.functions.when($"id" === 42L, "oops")
        .otherwise($"name"))
    val gate = new PlanRunner(spark).register("src", tampered)
      .run(plan(s""", "expected": "$checksum""""))
    assert(gate.exitCode === 3)
    assert(gate.reports.head._2.head.failed)
    // Empty frame renders the identity fingerprint, not null.
    val empty = new PlanRunner(spark)
      .register("src", src.where($"id" < 0L)).run(plan(""))
    assert(empty.reports.head._2.head
      .summaryStats("checksum").asInstanceOf[String] === "0")
  }
}
