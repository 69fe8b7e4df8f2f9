package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}

/** Native `size(array_intersect(a, b))` over two `array<string>`
  * columns — the verification hot path of every exact set-similarity
  * operator (prefix join, sorted-neighborhood, n-gram Jaccard): those
  * plans need only the CARDINALITY of the intersection, but the
  * built-in route materializes the full intersection array (an
  * OpenHashSet walk plus a GenericArrayData allocation per row-pair)
  * just to read its length.
  *
  * This expression counts matches directly — one hash set build over
  * the right array, one membership-and-first-seen walk over the left,
  * zero output allocation beyond the two sets. Value-identical to
  * `size(array_intersect(a, b))` on every input this family produces:
  * distinct count of left elements present in right (duplicates count
  * once, matching array_intersect's dedup), a null element common to
  * both sides counts once, NULL when either array is NULL (which is
  * why [[RewriteIntersectionSize]] only fires where that matches
  * `size`'s configured null behavior).
  */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "intersection_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val inRight = new java.util.HashSet[Any]()
    var rightHasNull = false
    var i = 0
    val ny = y.numElements()
    while (i < ny) {
      if (y.isNullAt(i)) rightHasNull = true
      else inRight.add(y.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.HashSet[Any]()
    var cnt = 0
    var nullCounted = false
    var j = 0
    val nx = x.numElements()
    while (j < nx) {
      if (x.isNullAt(j)) {
        if (rightHasNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else {
        val v = x.getUTF8String(j)
        if (inRight.contains(v) && seen.add(v)) cnt += 1
      }
      j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val inRight = ctx.freshName("inRight")
      val seen = ctx.freshName("seen")
      val rightHasNull = ctx.freshName("rightHasNull")
      val nullCounted = ctx.freshName("nullCounted")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |java.util.HashSet<Object> $inRight = new java.util.HashSet<Object>();
         |boolean $rightHasNull = false;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if ($b.isNullAt($i)) $rightHasNull = true;
         |  else $inRight.add($b.getUTF8String($i));
         |}
         |java.util.HashSet<Object> $seen = new java.util.HashSet<Object>();
         |int $cnt = 0;
         |boolean $nullCounted = false;
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  if ($a.isNullAt($j)) {
         |    if ($rightHasNull && !$nullCounted) { $cnt++; $nullCounted = true; }
         |  } else {
         |    UTF8String $v = $a.getUTF8String($j);
         |    if ($inRight.contains($v) && $seen.add($v)) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectionSize =
    copy(left = newLeft, right = newRight)
}

object IntersectionSize {
  def ofColumns(a: Column, b: Column): Column =
    ExpressionUtils.column(IntersectionSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
