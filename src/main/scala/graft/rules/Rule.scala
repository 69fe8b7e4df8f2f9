package graft.rules

/** Parameters for attaching ordered context windows to invalid rows.
  * Mirrors the reference's sample-window concept
  * (reference: tnassertion/TnAssertionCmd.scala:76-83).
  *
  * @param partitionBy columns whose values identify related rows; every row
  *                    sharing the invalid row's values is in its window
  * @param orderBy     columns ordering rows inside each window
  */
case class SampleWindowParams(partitionBy: Seq[String], orderBy: Seq[String])

/** A data-quality rule: a SQL predicate that is TRUE for valid rows.
  * (reference: tnassertion/TnAssertionCmd.scala:39-56)
  *
  * @param query       SQL boolean expression; rows where it is not TRUE
  *                    (false or NULL) are invalid. NOTE: the reference counts
  *                    NULL-predicate rows as valid in its report but invalid
  *                    in its output DF (TnAssertionRunner.scala:55 vs :137);
  *                    graft resolves the inconsistency as "not TRUE ⇒
  *                    invalid" everywhere.
  * @param description human-readable description; used as the reason string
  * @param threshold   the rule fails when fractionInvalid > threshold
  * @param features    user-defined derived columns (name → SQL expr) added to
  *                    the dataset before evaluating queries and included in
  *                    outputs
  * @param summary     user-defined aggregate expressions (name → SQL agg
  *                    expr) computed over this rule's invalid rows
  * @param sampleWindow optional context-window parameters
  */
case class Rule(
    query: String,
    description: String,
    threshold: Double,
    features: Map[String, String] = Map.empty,
    summary: Map[String, String] = Map.empty,
    sampleWindow: Option[SampleWindowParams] = None)

/** Result of evaluating one rule against a dataset.
  *
  * @param sampleInvalid bounded sample of invalid rows (collected only
  *                      when requested), projected to the columns the
  *                      rule references plus its features — column name
  *                      → string-rendered value per row */
case class RuleReport(
    query: String,
    description: String,
    threshold: Double,
    totalRows: Long,
    numInvalid: Long,
    fractionInvalid: Double,
    failed: Boolean,
    summaryStats: Map[String, Any] = Map.empty,
    sampleInvalid: Seq[Map[String, String]] = Seq.empty)
