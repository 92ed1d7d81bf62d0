package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sliding-window word n-grams over a token array as ONE codegen'd
  * expression.
  *
  * Why a custom Expression (build-plan preference (b)): the composed
  * form — `transform(sequence(...), i -> concat_ws(' ', slice(toks, i,
  * n)))`, optionally under `array_distinct` — is a chain of
  * higher-order functions, and Spark's HOFs are CodegenFallback: every
  * row pays interpreted lambda dispatch plus a slice allocation and a
  * concat per WINDOW. Shingling is the single hottest subtree in this
  * engine (MinHash/LSH dedup, decontamination, prefix-similarity,
  * dup-gram statistics all start with it), so it earns the native
  * one-pass form: direct UTF8String window joins, no intermediate
  * slices, inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the two composed forms in use
  * (property-asserted in CosineExpressionSpec):
  *  - `padShort = true` (shingle-SET form, [[graft.functions.TextOps
  *    .shinglesFromTokens]]): window starts 1..max(size-n+1, 1) — short
  *    inputs yield ONE truncated gram (empty input: one "" gram) —
  *    matching `sequence(1, greatest(size-(n-1), 1))` + slice.
  *  - `padShort = false` (strict multiplicity form): size < n yields
  *    [], else exactly size-n+1 full windows.
  *  - `distinct = true` applies first-occurrence-order dedup, matching
  *    `array_distinct`.
  *  - NULL elements are skipped inside a window join exactly like
  *    `concat_ws`; a NULL input array yields NULL.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean,
    padShort: Boolean) extends UnaryExpression {
  require(n >= 1, s"WordNgrams: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  override def nullable: Boolean = child.nullable

  /** Shared by eval and the generated code (called reflectively from
    * codegen): the whole windowing loop. Lives here once so the two
    * paths cannot drift. */
  def build(a: ArrayData): ArrayData = {
    val sz = a.numElements()
    val wins =
      if (padShort) math.max(sz - (n - 1), 1)
      else if (sz >= n) sz - n + 1 else 0
    val out = new java.util.ArrayList[AnyRef](wins)
    val seen = if (distinct) new java.util.HashSet[UTF8String](wins * 2)
      else null
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < wins) {
      val end = math.min(i + n, sz)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (a.isNullAt(j)) null else a.getUTF8String(j)
        j += 1
      }
      val g = UTF8String.concatWs(space, parts: _*)
      if (seen == null || seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // The loop body manipulates UTF8String collections — no profitable
    // per-element primitive codegen exists, so the generated code calls
    // the SHARED build() on a captured reference: the expression stays
    // inside whole-stage codegen (no CodegenFallback stage break, no
    // per-row lambda dispatch), and the window loop runs as one JIT'd
    // method.
    val ref = ctx.addReferenceObj("wordNgrams", this,
      classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.build($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}
