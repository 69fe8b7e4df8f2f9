package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, JaroWinkler}

import graft.SparkSpec

/** [[org.apache.spark.sql.graft.JaroWinkler]] — classic literature
  * vectors, edge conventions (empty / matchless / transposed-only), the
  * 0.7 boost gate, and codegen-vs-interpreted agreement.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("literature vectors") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
    assert(math.abs(jw("ABAB", "BABA") - 0.8333333333333334) < 1e-15)
  }

  test("edge conventions match the cross-engine oracle (DuckDB)") {
    assert(jw("", "") == 0.0)       // both-empty is 0, not 1
    assert(jw("", "ABC") == 0.0)
    assert(jw("ABC", "ABC") == 1.0)
    assert(jw("A", "B") == 0.0)
    assert(jw("AB", "BA") == 0.0)   // window 0: adjacent swap of 2 = matchless
  }

  test("prefix boost applies only above jaro 0.7") {
    // Shared 2-char prefix but jaro <= 0.7: no boost.
    assert(math.abs(jw("AB", "AXXXXX") - 0.5555555555555555) < 1e-15)
    // DIXON/DICKSONX: jaro 0.7666.. > 0.7, prefix 2 -> boosted.
    assert(jw("DIXON", "DICKSONX") > 0.8)
  }

  test("SQL registration and codegen path agree with the kernel") {
    GraftFunctions.install(spark)
    val s = spark
    import s.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("", ""), ("forest green", "forset gren")).toDF("a", "b")
    // DataFrame route exercises WholeStageCodegen (defineCodeGen).
    val got = pairs.select(JaroWinkler.ofColumns(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    val want = pairs.collect().map(r => jw(r.getString(0), r.getString(1))).toSeq
    assert(got == want)
    // SQL route after registry install.
    val viaSql = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS s")
      .collect()(0).getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-15)
    // Null propagation.
    assert(spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x') AS s")
      .collect()(0).isNullAt(0))
  }
}
