package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen cosine similarity over two float-array columns.
  *
  * Why a custom Catalyst Expression (build-plan preference (b)): the
  * composed form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a
  * higher-order function — Spark evaluates HOF lambdas interpreted,
  * allocating an intermediate array per row and boxing every element.
  * At ANN scale (cosine against millions of vectors per query) that
  * interpreter overhead dominates. This expression generates a tight
  * primitive loop inside whole-stage codegen: no allocation, no boxing.
  *
  * Semantics are IDENTICAL to the composed form for equal-length,
  * non-null vectors: a sequential double fold in index order — so it is
  * bit-for-bit compatible with the DuckDB oracle's
  * list_sum(list_transform(...)) and interchangeable with
  * Similarity.cosine. Mismatched lengths use the common prefix for the
  * dot product and each vector's own full norm.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    // NULL elements poison the result, matching the composed
    // zip_with/aggregate form (null product → null fold)
    var i = 0
    while (i < nx) { if (x.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < ny) { if (y.isNullAt(i)) return null; i += 1 }
    val n = math.min(nx, ny)
    var dot = 0.0
    i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < nx) { val v = x.getFloat(i).toDouble; na += v * v; i += 1 }
    var nb = 0.0
    i = 0
    while (i < ny) { val v = y.getFloat(i).toDouble; nb += v * v; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val v = ctx.freshName("v")
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
         |final int $n = java.lang.Math.min($nx, $ny);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |double $na = 0.0;
         |for (int $i = 0; $i < $nx; $i++) {
         |  final double $v = (double) $a.getFloat($i);
         |  $na += $v * $v;
         |}
         |double $nb = 0.0;
         |for (int $i = 0; $i < $ny; $i++) {
         |  final double $v = (double) $b.getFloat($i);
         |  $nb += $v * $v;
         |}
         |${ev.value} = $dot /
         |  (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
