package graft.sources

import graft.SparkSpec
import graft.engine.{InputRef, PlanRunner}
import org.apache.spark.sql.DataFrame

/** Round-trips every non-parquet source format the engine's InputRef
  * accepts (SURVEY.md §2 item 11): write a frame out, resolve it back
  * through the PlanRunner's reader, and require value identity.
  * (The delimited/CSV path is driver-checked by qc_source_csv.)
  */
class FormatsSpec extends SparkSpec {

  private def sample: DataFrame = {
    val s = spark
    import s.implicits._
    Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
  }

  private def roundTrip(format: String): Unit = {
    val path = s"/tmp/graft_fmt_roundtrip/$format"
    val runner = new PlanRunner(spark)
    val df = sample
    format match {
      case "json" => df.write.mode("overwrite").json(path)
      case "orc" => df.write.mode("overwrite").orc(path)
      case "parquet" => df.write.mode("overwrite").parquet(path)
    }
    val back = runner.resolve(InputRef(path, onDisk = true, format = Some(format)))
    assert(back.select("id", "name", "score").orderBy("id")
      .collect().map(_.toSeq).toSeq ===
      df.orderBy("id").collect().map(_.toSeq).toSeq, s"format $format")
  }

  test("json round-trips through the engine reader")(roundTrip("json"))
  test("orc round-trips through the engine reader")(roundTrip("orc"))
  test("parquet round-trips through the engine reader")(roundTrip("parquet"))

  test("xml round-trips through the engine reader (built-in Spark 4 source)") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_fmt_roundtrip/xml"
    sample.write.mode("overwrite")
      .option("rowTag", "rec").option("rootTag", "recs")
      .xml(path)
    // Explicit format + custom rowTag.
    val back = new PlanRunner(spark).resolve(
      InputRef(path, onDisk = true, format = Some("xml"), rowTag = Some("rec")))
    assert(back.select("id", "name", "score").orderBy("id")
      .collect().map(_.toSeq).toSeq ===
      sample.orderBy("id").collect().map(_.toSeq).toSeq)
    // Extension sniffing: a .xml path with no explicit format routes to
    // the XML reader (default ROW tag).
    val path2 = "/tmp/graft_fmt_roundtrip/sniff.xml"
    sample.write.mode("overwrite").option("rowTag", "ROW").xml(path2)
    val sniffed = new PlanRunner(spark).resolve(InputRef(path2, onDisk = true))
    assert(sniffed.count() === 3)
  }

  test("raw text reads one document per line into `value`") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_fmt_roundtrip/lines"
    val docs = Seq("first document", "second document", "third one")
    docs.toDF("value").coalesce(1).write.mode("overwrite").text(path)
    val back = new PlanRunner(spark)
      .resolve(InputRef(path, onDisk = true, format = Some("text")))
    assert(back.columns.toSeq == Seq("value"))
    assert(back.as[String].collect().sorted.toSeq == docs.sorted)
  }

  test("wholetext reads one document per FILE with its path") {
    val base = java.nio.file.Paths.get("/tmp/graft_fmt_roundtrip/whole")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.writeString(base.resolve("a.txt"), "line one\nline two")
    java.nio.file.Files.writeString(base.resolve("b.txt"), "solo")
    val back = new PlanRunner(spark)
      .resolve(InputRef(s"$base/*.txt", onDisk = true, format = Some("wholetext")))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1)
    assert(rows.length == 2)
    assert(rows.head._1 == "line one\nline two" && rows.head._2.endsWith("a.txt"))
    assert(rows(1)._1 == "solo" && rows(1)._2.endsWith("b.txt"))
  }

  test("format inferred from the path extension") {
    val path = "/tmp/graft_fmt_roundtrip/ext.json"
    sample.write.mode("overwrite").json(path)
    val back = new PlanRunner(spark).resolve(InputRef(path, onDisk = true))
    assert(back.count() === 3)
  }
}
