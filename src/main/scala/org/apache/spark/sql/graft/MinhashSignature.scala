package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole `numPerms`-permutation MinHash signature of a token array
  * in ONE pass — value-identical to the portable composition
  * (`array_min(transform(toks, t => conv(substring(md5(concat_ws(":",
  * g, t)), 1+8s, 8), 16, 10)))` for permutation k = 4g+s) but without
  * its per-token hex STRING materialisation and 16 base-16 string
  * parses: permutation k reads 32-bit big-endian slot k%4 of the raw
  * `md5("‹k/4›:" + token)` digest bytes directly. The md5-per-group
  * inner loop is the dominant cost of the whole dedup family, so this
  * is where a native expression pays (same reasoning as [[DotProduct]]).
  *
  * Returns NULL for an empty token array (as array_min of an empty
  * transform does). Null ELEMENTS are skipped; the callers feed
  * split() output, which never contains nulls, so the two formulations
  * cannot diverge there — skipping just keeps this expression total
  * rather than null-poisoned.
  *
  * Codegen emits a static call (the digest loop has no per-element
  * expression dispatch to eliminate), keeping the surrounding
  * projection inside WholeStageCodegen.
  */
case class MinhashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numPerms > 0 && numPerms % 4 == 0,
    s"numPerms must be a positive multiple of 4, got $numPerms")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = MinhashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.compute($arr, $numPerms);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** One pass over the tokens: mins(k) = min over tokens of slot k%4 of
    * md5("‹k/4›:token"). Returns null for empty/all-null input. */
  def compute(toks: ArrayData, numPerms: Int): GenericArrayData = {
    val md = digests.get()
    val groups = numPerms / 4
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var seen = false
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      if (!toks.isNullAt(i)) {
        seen = true
        val tok = toks.getUTF8String(i).toString
        var g = 0
        while (g < groups) {
          md.reset()
          val digest = md.digest(
            (g.toString + ":" + tok).getBytes(StandardCharsets.UTF_8))
          var s = 0
          while (s < 4) {
            val v = ((digest(4 * s) & 0xffL) << 24) |
              ((digest(4 * s + 1) & 0xffL) << 16) |
              ((digest(4 * s + 2) & 0xffL) << 8) |
              (digest(4 * s + 3) & 0xffL)
            val k = 4 * g + s
            if (v < mins(k)) mins(k) = v
            s += 1
          }
          g += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  /** Column-level entry point (the Column↔Expression bridge is sql-private). */
  def ofColumn(toks: Column, numPerms: Int): Column =
    ExpressionUtils.column(
      MinhashSignature(ExpressionUtils.expression(toks), numPerms))
}
