package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys.
  *
  * AQE's skew-join handling is the first line of defence (it splits
  * oversized sort-merge partitions at runtime), but it cannot help when
  * the skew feeds an aggregation or when a single key exceeds what one
  * task can hold. Salting rewrites the join shape itself: the big side
  * scatters each row into one of `saltFactor` sub-keys (deterministic —
  * a hash of the whole row, so reruns place rows identically), the
  * small side replicates across ALL sub-keys, and the hot key's rows
  * land on `saltFactor` tasks instead of one.
  *
  * Cost: the small side is materialised `saltFactor` times — use for a
  * genuinely small right side (it is usually broadcast-sized anyway;
  * salting matters when the planner falls back to shuffle because the
  * small side exceeds the broadcast threshold).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(typedLit((0 until saltFactor).toList)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
