package graft

import org.apache.spark.sql.DataFrame
import graft.diff.{DatasetDiff, DiffConfig}
import graft.dedup.Dedup
import graft.rules.{Rule, RuleReport, RuleRunner}

/** Fluent syntax for the core operators:
  *
  * {{{
  * import graft.syntax._
  * val bad      = orders.invalidRows(rules)
  * val reports  = orders.checkRules(rules)
  * val delta    = orders.diffAgainst(recomputed, cfg)
  * val uniques  = docs.dedupExact("text", "doc_id")
  * }}}
  */
package object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** One-pass evaluation of every rule (counts, fractions, failures). */
    def checkRules(rules: Seq[Rule]): Seq[RuleReport] =
      RuleRunner.reports(df, rules)

    /** Rows invalid under ≥1 rule, with the `__REASON_INVALID__` column. */
    def invalidRows(rules: Seq[Rule]): DataFrame =
      RuleRunner.invalidRows(df, rules)

    /** Keyed outer-join diff against another dataset. */
    def diffAgainst(other: DataFrame, cfg: DiffConfig): DataFrame =
      DatasetDiff.diff(df, other, cfg)

    /** Exact-duplicate groups by content hash (min-id canonical). */
    def dedupExact(textCol: String, idCol: String): DataFrame =
      Dedup.exactGroups(df, textCol, idCol)

    /** MinHash-LSH near-duplicate candidate pairs. */
    def nearDupCandidates(textCol: String, idCol: String,
        numPerms: Int = 16, bandSize: Int = 8,
        maxBucketSize: Option[Int] = None): DataFrame =
      Dedup.minhashCandidatePairs(df, textCol, idCol, numPerms, bandSize,
        maxBucketSize)

    /** Near-dup dedup: keep each duplicate cluster's canonical row,
      * with clusters from thresholded n-gram Jaccard edges. */
    def dedupNear(textCol: String, idCol: String, blockCol: String,
        n: Int = 3, minJaccard: Double = 0.8): DataFrame =
      Dedup.canonicalize(df, idCol,
        Dedup.jaccardNeighbors(df, textCol, idCol, n, blockCol, minJaccard)
          .select("id_a", "id_b"))

    /** Point-in-time enrichment with the latest right row per key. */
    def asofJoin(right: DataFrame, leftKey: String, rightKey: String,
        leftTime: String, rightTime: String,
        rightValues: Seq[String]): DataFrame =
      graft.operators.AsofJoin.asofJoin(df, right, leftKey, rightKey,
        leftTime, rightTime, rightValues)
  }
}
