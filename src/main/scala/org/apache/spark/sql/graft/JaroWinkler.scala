package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity over two string columns — the fuzzy
  * name-matching primitive (typo-tolerant entity resolution) that Spark
  * ships no builtin for (`levenshtein` is its edit-count cousin, but has
  * no length normalization and over-penalizes transpositions, the
  * dominant human typo class).
  *
  * Textbook semantics, pinned by JaroWinklerSpec against the classic
  * literature vectors (MARTHA/MARHTA = 0.9611…, DIXON/DICKSONX =
  * 0.8133…): match window `max(|a|,|b|)/2 − 1`, transpositions = half
  * the out-of-order matches, Winkler prefix boost `l·0.1·(1−jaro)` with
  * `l` = common prefix capped at 4, applied only when jaro > 0.7, and
  * 0.0 when either side is empty or matchless (including both-empty —
  * the convention DuckDB's `jaro_winkler_similarity` uses, which keeps
  * the cross-engine oracle exact). Operates on UTF-16 code units of the
  * decoded string, identical to byte-wise for ASCII inputs.
  *
  * The inner double-loop is data-dependent, so instead of inlining it,
  * `doGenCode` emits one static call — the same shape as Spark's own
  * `levenshtein` — keeping the operator inside WholeStageCodegen with
  * no interpreted-projection fallback and no per-row closure alloc.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-level entry point (the Column↔Expression bridge is sql-private). */
  def ofColumns(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinkler(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Static kernel referenced by both interpreted eval and codegen. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s = ua.toString
    val t = ub.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    // Match window; max(.,.)/2 - 1, floored at 0 (so equal single chars
    // still match at distance 0).
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!tMatched(j) && s.charAt(i) == t.charAt(j)) {
          sMatched(i) = true
          tMatched(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // Transpositions: matched chars read off in order from each side;
    // t = half the positions where the two readings disagree.
    var transpo = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpo += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpo / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    // Winkler boost: shared prefix capped at 4, scale 0.1.
    var l = 0
    val cap = math.min(4, math.min(n, m))
    while (l < cap && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
