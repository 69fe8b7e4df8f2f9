package graft.engine

import graft.{RunPlan, SparkSpec}
import java.nio.file.Files

/** Whole-plan pre-validation (reference: tnengine/TnEngine.scala:113-143,
  * `haltIfPotentialErrors` collects a TnErrorCmd per bad command) and the
  * pluggable document loader (reference: tnengine/TnReader.scala:44-73,
  * `TnRESTReader` serves plan JSON from a config server). */
class PlanValidationSpec extends SparkSpec {

  private val twoBadPlan =
    """{
      |  "commands": [
      |    {"command": "bogus_one"},
      |    {"command": "view",
      |     "inputs": [{"ref": "src", "onDisk": false}],
      |     "params": {"tableAliases": ["t"], "query": "SELECT 1 AS x FROM t"},
      |     "outputKey": "ok"},
      |    {"command": "bogus_two"}
      |  ]
      |}""".stripMargin

  test("validate reports ALL bad commands at once, with their paths") {
    val Left(errors) = PlanParser.validate(twoBadPlan): @unchecked
    assert(errors.map(_.path) === Seq("commands[0]", "commands[2]"))
    assert(errors.head.message.contains("bogus_one"))
    assert(errors(1).message.contains("bogus_two"))
  }

  test("validate recurses into nested plans with nested paths") {
    val nested =
      """{
        |  "commands": [
        |    {"command": "plan", "params": {"commands": [
        |      {"command": "broken"},
        |      {"command": "also_broken"}
        |    ]}}
        |  ]
        |}""".stripMargin
    val Left(errors) = PlanParser.validate(nested): @unchecked
    assert(errors.map(_.path) ===
      Seq("commands[0].commands[0]", "commands[0].commands[1]"))
  }

  test("validate returns Right for a well-formed plan") {
    val good =
      """{"commands":[{"command":"view","inputs":[{"ref":"s","onDisk":false}],
        |"params":{"tableAliases":["t"],"query":"SELECT 1"},"outputKey":"o"}]}"""
        .stripMargin
    assert(PlanParser.validate(good).map(_.commands.length) === Right(1))
  }

  test("unreadable or malformed documents are a single root-path error") {
    assert(PlanParser.validateFile("plans/definitely_missing.json").isLeft)
    val Left(errs) = PlanParser.validate("{not json"): @unchecked
    assert(errs.length === 1 && errs.head.path === "")
  }

  test("RunPlan surfaces all validation errors and exits 2, running nothing") {
    val p = Files.createTempFile("graft_badplan", ".json")
    Files.write(p, twoBadPlan.getBytes("UTF-8"))
    val code = RunPlan.run(spark,
      RunPlan.Config(p.toString, Map.empty, "k", None))
    assert(code === 2)
  }

  test("parseFetched loads the plan, nested params, and externalParamsFile through the loader") {
    // A stub config server: every document — the root plan, the
    // command's externalParamsFile — must be fetched by path, with
    // relative refs resolved against the PLAN's prefix, never the
    // filesystem.
    val served = Map(
      "configs/root.json" ->
        """{"commands": [
          |  {"command": "view",
          |   "inputs": [{"ref": "${table}", "onDisk": false}],
          |   "externalParamsFile": "view_params.json",
          |   "outputKey": "out"}
          |]}""".stripMargin,
      "configs/view_params.json" ->
        """{"tableAliases": ["t"], "query": "SELECT 7 AS seven FROM t"}""")
    var fetched = List.empty[String]
    val loader = (path: String) => {
      fetched ::= path
      served.getOrElse(path, throw new NoSuchElementException(path))
    }
    val plan = PlanParser.parseFetched("configs/root.json", loader,
      variables = Map("table" -> "resolved"))
    val view = plan.commands.head.asInstanceOf[ViewCommand]
    assert(view.inputs.head.ref === "resolved")
    assert(view.query === "SELECT 7 AS seven FROM t")
    assert(fetched.reverse ===
      List("configs/root.json", "configs/view_params.json"))
  }

  test("validateFetched propagates loader failures as plan errors") {
    val failing = (_: String) => throw new RuntimeException("server down")
    val Left(errs) =
      PlanParser.validateFetched("x.json", failing): @unchecked
    assert(errs.head.message.contains("server down"))
  }
}
