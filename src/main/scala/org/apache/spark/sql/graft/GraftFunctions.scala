package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration glue for graft's native Catalyst expressions (lives in
  * an `org.apache.spark.sql` subpackage because `sessionState` and the
  * registry APIs are `private[sql]`).
  */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(exprs.head, exprs(1))
      }),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "jaro_winkler takes exactly 2 arguments")
        JaroWinkler(exprs.head, exprs(1))
      }),
    (new FunctionIdentifier("sparse_dot_long"),
      new ExpressionInfo(classOf[SparseDotLong].getName, "sparse_dot_long"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4,
          "sparse_dot_long takes (aKeys, aVals, bKeys, bVals)")
        SparseDotLong(exprs.head, exprs(1), exprs(2), exprs(3))
      }),
    (new FunctionIdentifier("intersection_size"),
      new ExpressionInfo(classOf[IntersectionSize].getName, "intersection_size"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "intersection_size takes exactly 2 arguments")
        IntersectionSize(exprs.head, exprs(1))
      }),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "minhash_signature takes (tokens array, numPerms literal)")
        val numPerms = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"numPerms must be an integer literal, got $other")
        }
        MinhashSignature(exprs.head, numPerms)
      }),
    (new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          "word_shingles takes (tokens array, n literal[, hashed literal])")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"n must be an integer literal, got $other")
        }
        val hashed = exprs.lift(2).forall {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"hashed must be a boolean literal, got $other")
        }
        WordShingles(exprs.head, n, hashed)
      }))

  /** Register into an existing session (tests, notebooks). Cluster jobs
    * should prefer `spark.sql.extensions=graft.GraftExtensions`, which
    * wires the same list at session build time. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
