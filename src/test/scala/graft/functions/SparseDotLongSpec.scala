package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, SparseDotLong}

import graft.SparkSpec

/** [[org.apache.spark.sql.graft.SparseDotLong]] — merge-walk agreement
  * with a brute-force reference on random sorted sparse vectors, edge
  * shapes (empty / disjoint / subset overlap), null propagation, and
  * the SQL-registered codegen path.
  */
class SparseDotLongSpec extends SparkSpec {

  private def ref(a: Seq[(String, Long)], b: Seq[(String, Long)]): Long = {
    val m = b.toMap
    a.map { case (k, v) => v * m.getOrElse(k, 0L) }.sum
  }

  test("agrees with a brute-force map join on random sorted vectors") {
    val rnd = new Random(11)
    val s = spark
    import s.implicits._
    val cases = Seq.fill(200) {
      def vec() = rnd.shuffle((0 until 30).toList)
        .take(1 + rnd.nextInt(12))
        .map(i => (f"k$i%02d", 1L + rnd.nextInt(1000000)))
        .sortBy(_._1)
      (vec(), vec())
    }
    val df = cases.toDF("a", "b").select(
      col("a").getField("_1").as("ak"), col("a").getField("_2").as("av"),
      col("b").getField("_1").as("bk"), col("b").getField("_2").as("bv"))
    val got = df.select(SparseDotLong.ofColumns(
      col("ak"), col("av"), col("bk"), col("bv")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (a, b) => ref(a, b) }
    assert(got == want)
  }

  test("edges: empty, disjoint, identical, and null inputs") {
    GraftFunctions.install(spark)
    def q(sql: String): org.apache.spark.sql.Row = spark.sql(sql).collect()(0)
    assert(q("""SELECT sparse_dot_long(array('a','b'), array(2L,3L),
      array('a','b'), array(5L,7L)) AS d""").getLong(0) == 31L)
    assert(q("""SELECT sparse_dot_long(array('a'), array(2L),
      array('b'), array(5L)) AS d""").getLong(0) == 0L)
    assert(q("""SELECT sparse_dot_long(CAST(array() AS ARRAY<STRING>),
      CAST(array() AS ARRAY<BIGINT>), array('a'), array(1L)) AS d""")
      .getLong(0) == 0L)
    assert(q("""SELECT sparse_dot_long(CAST(NULL AS ARRAY<STRING>),
      array(1L), array('a'), array(1L)) AS d""").isNullAt(0))
  }
}
