package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array in ONE pass —
  * value-identical to the portable composition
  * `array_distinct(transform(sequence(1, size-(n-1)), i =>
  * [md5(]concat_ws(" ", slice(toks, i, n))[)]))` (empty array below n
  * tokens, first-occurrence order) but without the per-shingle lambda
  * interpretation, slice allocation, and — in the hashed variant — hex
  * string round-trip. Shingling is the scan-side cost of the n-gram
  * Jaccard family, second only to the minhash digests.
  *
  * @param hashed emit `md5(shingle)` hex (the join-key-size variant the
  *               ngram pair operators use) instead of the raw text
  * @param distinct first-occurrence-deduped (the Jaccard/minhash set
  *                 semantics, default) vs POSITIONAL — every shingle in
  *                 document order, duplicates kept — which is what
  *                 winnowing's sliding-min windows need (dedup before
  *                 the window would move fingerprint positions)
  */
case class WordShingles(child: Expression, n: Int, hashed: Boolean,
    distinct: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"shingle width must be positive, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n, hashed, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.compute($arr, $n, $hashed, $distinct);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(toks: ArrayData, n: Int, hashed: Boolean,
      distinct: Boolean = true): GenericArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // Distinct mode: first-occurrence order, as array_distinct keeps it.
    // Positional mode: every shingle in document order (a LinkedHashSet
    // would silently move winnowing fingerprints).
    val seen: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](len - n + 1)
    val md = if (hashed) digests.get() else null
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      // concat_ws parity: null elements are skipped entirely, separator
      // included (split() output never contains nulls; parity-only).
      var j = 0
      var first = true
      while (j < n) {
        if (!toks.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      val shingle = sb.toString
      val out =
        if (!hashed) shingle
        else {
          md.reset()
          val d = md.digest(shingle.getBytes(StandardCharsets.UTF_8))
          val hex = new Array[Char](32)
          var b = 0
          while (b < 16) {
            hex(2 * b) = hexDigits((d(b) >> 4) & 0xf)
            hex(2 * b + 1) = hexDigits(d(b) & 0xf)
            b += 1
          }
          new String(hex)
        }
      seen.add(UTF8String.fromString(out))
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  /** Column-level entry point (the Column↔Expression bridge is sql-private). */
  def ofColumn(toks: Column, n: Int, hashed: Boolean): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(toks), n, hashed))

  /** Positional (non-distinct) variant: every shingle hash in document
    * order, duplicates kept — the winnowing input. */
  def positional(toks: Column, n: Int, hashed: Boolean): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(toks), n, hashed,
        distinct = false))
}
