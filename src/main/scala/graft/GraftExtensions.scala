package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** Session-extension entry point: registers graft's native SQL
  * functions and optimizer rules at session build time.
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // then: SELECT dot_product(a.embedding, b.embedding) FROM ...
  * // and aggregate(zip_with(...)) dot products rewrite to the native
  * // codegen loop automatically.
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(extensions.injectFunction)
    extensions.injectOptimizerRule(_ => org.apache.spark.sql.graft.RewriteDotProduct)
    extensions.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.RewriteBoundedLevenshtein)
    extensions.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.RewriteIntersectionSize)
    // Whole-operator extension: logical TopKPerKeyPlan plans as
    // partial -> exchange -> final with map-side per-key pruning.
    extensions.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKStrategy)
  }
}
