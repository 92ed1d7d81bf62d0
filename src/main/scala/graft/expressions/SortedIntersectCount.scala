package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED long-array columns as one codegen'd
  * two-pointer merge.
  *
  * Why a custom Expression (build-plan preference (b)): the built-in
  * `size(array_intersect(a, b))` materializes the intersection — per
  * row it builds a hash set over one side, probes with the other, and
  * allocates the result array only to take its length. On the triangle
  * counting hot path (q105: one intersection per oriented edge, arrays
  * up to O(√m) elements) that allocation and hashing dominate. Sorted
  * inputs admit the two-pointer merge: no allocation, no hashing,
  * O(|A|+|B|) primitive comparisons inside whole-stage codegen.
  *
  * Semantics: inputs MUST be sorted ascending (q105's adjacency arrays
  * come from sort_array); duplicate runs are skipped after each match,
  * so the count equals `size(array_intersect(a, b))` — set semantics —
  * for ANY sorted inputs. That equivalence is what lets
  * `plans.IntersectCountRewrite` (injectOptimizerRule) swap this
  * expression in for the composed form whenever both arguments are
  * syntactically `sort_array(..., asc)` over non-null elements. Any
  * NULL element poisons the row to NULL (the rewrite never fires on
  * nullable-element arrays, where array_intersect's null handling
  * differs).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    while (i < nx) { if (x.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < ny) { if (y.isNullAt(i)) return null; i += 1 }
    var j = 0
    var c = 0
    i = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) {
        c += 1
        while (i < nx && x.getLong(i) == xv) i += 1
        while (j < ny && y.getLong(j) == yv) j += 1
      }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |boolean ${ev.isNull}_elems = false;
         |for (int $i = 0; $i < $nx && !${ev.isNull}_elems; $i++) {
         |  if ($a.isNullAt($i)) ${ev.isNull}_elems = true;
         |}
         |for (int $i = 0; $i < $ny && !${ev.isNull}_elems; $i++) {
         |  if ($b.isNullAt($i)) ${ev.isNull}_elems = true;
         |}
         |if (${ev.isNull}_elems) { ${ev.isNull} = true; } else {
         |int $c = 0;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) {
         |    $c++;
         |    while ($i < $nx && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $ny && $b.getLong($j) == $yv) { $j++; }
         |  }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
