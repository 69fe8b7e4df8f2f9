package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process.{Process, ProcessLogger}

/** TopNotch plan-format compatibility, frozen as a standing test: the
  * reference's shipped example (reference example/plan.json +
  * assertions.json + parquet input, byte-identical copies under
  * src/test/resources/topnotch_example — `diff -r` clean against the
  * reference at copy time) runs through the REAL `graft.RunPlan` main
  * in its own JVM, exactly as spark-submit would invoke it, and must
  * produce the TopNotch-correct outcome:
  *
  *   - "Ints must be greater than 1": fractionInvalid 0.25 > 0.01 →
  *     failed (reference tnassertion semantics: rule SQL is true for
  *     VALID rows, fraction compared to threshold);
  *   - "Booleans must be true": fractionInvalid 0.5 > 0.1 → failed;
  *   - process exit code 3 (reference tnengine/TnEngine.scala:47-50:
  *     any failed assertion → exit 3);
  *   - `outputPath` parquet written, input parquet untouched.
  *
  * The verbatim plan exercises `externalParamsFile` (plan-relative
  * resolution), a CWD-relative `onDisk` input ref, and `outputPath` —
  * the file-layout conventions a migrating TopNotch user's plans
  * depend on. A subprocess (not an in-JVM call) because the plan's
  * relative refs resolve against the working directory, which the
  * reference's CLI contract fixes at launch time.
  */
class TopNotchPlanCompatSpec extends AnyFunSuite {

  private val fixture = Paths.get("src/test/resources/topnotch_example")

  private def copyTree(from: Path, to: Path): Unit = {
    Files.walk(from).forEach { p =>
      val dst = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(dst)
      else Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("reference-verbatim example plan: exit 3, fractionInvalid 0.25/0.5") {
    assume(Files.exists(fixture), "fixture resources present")
    val work = Files.createTempDirectory("graft_tn_compat")
    val example = work.resolve("example")
    Files.createDirectories(example)
    // Verbatim layout: plan + params + input all under CWD/example,
    // exactly how the reference repo ships them.
    copyTree(fixture, example)
    val reports = Files.createDirectories(work.resolve("reports"))

    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq("java") ++ opens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false", "-Dspark.master=local[4]",
      "-Dspark.sql.shuffle.partitions=4",
      "-cp", System.getProperty("java.class.path"),
      "graft.RunPlan", "example/plan.json",
      "--report-key", "tn_example", "--report-dest", reports.toString)
    val log = new StringBuilder
    val exit = Process(cmd, work.toFile)
      .run(ProcessLogger(l => log.append(l).append('\n'))).exitValue()
    assert(exit === 3, s"expected exit 3, got $exit\n${log.takeRight(2000)}")

    val report = new String(
      Files.readAllBytes(reports.resolve("tn_example.json")), "UTF-8")
    assert(report.contains("Ints must be greater than 1"))
    assert(report.contains("Booleans must be true"))
    assert(report.contains("0.25"), s"fractionInvalid 0.25 missing: $report")
    assert(report.contains("0.5"), s"fractionInvalid 0.5 missing: $report")
    assert("\"failed\"\\s*:\\s*true".r.findAllIn(report).size === 2,
      s"both rules must report failed=true: $report")

    // outputPath honored; input untouched (same file set as the fixture).
    assert(Files.exists(example.resolve("exampleAssertionOutput.parquet")))
    val inputFiles = Files.list(
      example.resolve("exampleAssertionInput.parquet")).count()
    val fixtureFiles = Files.list(
      fixture.resolve("exampleAssertionInput.parquet")).count()
    assert(inputFiles === fixtureFiles)
  }
}
