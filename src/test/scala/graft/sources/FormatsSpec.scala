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

  test("format inferred from the path extension") {
    val path = "/tmp/graft_fmt_roundtrip/ext.json"
    sample.write.mode("overwrite").json(path)
    val back = new PlanRunner(spark).resolve(InputRef(path, onDisk = true))
    assert(back.count() === 3)
  }
}
