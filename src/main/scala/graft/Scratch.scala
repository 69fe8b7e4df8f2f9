package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/perf inspection main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("qs_knn_brute")
    if (name == "components_debug") {
      import graft.dedup.Dedup
      import graft.functions.Portable._
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, dir, "documents")
      var t0 = System.nanoTime()
      val t = col("__toks")
      val shExpr = when(size(t) >= 3,
        array_distinct(transform(sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", slice(t, i, lit(3))))))
        .otherwise(array().cast("array<string>"))
      val posting = docs
        .select(col("source").as("__block"), col("doc_id").as("__id"),
          tokens(col("text")).as("__toks"))
        .select(col("__block"), col("__id"), shExpr.as("__sh"))
        .select(col("__block"), col("__id"), size(col("__sh")).as("__n"),
          explode_outer(col("__sh")).as("__shingle")).where(col("__shingle").isNotNull)
      println(s"posting rows=${posting.count()} in ${(System.nanoTime()-t0)/1e9}s")
      posting.explain("formatted")
      val edges = Dedup.jaccardNeighbors(docs, "text", "doc_id", 3, "source", 0.5)
        .select("id_a", "id_b")
      println(s"edges count=${edges.count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val comp = Dedup.connectedComponents(docs.select("doc_id"), edges)
      println(s"components built in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      println(s"components count=${comp.count()} in ${(System.nanoTime()-t0)/1e9}s")
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"run $i: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    spark.stop()
  }
}
