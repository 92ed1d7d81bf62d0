package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types._

/** Shared evaluation kernel for [[Hash60]] — also called directly from
  * generated code. */
object Hash60Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) == the value of
    * `conv(substr(md5(x), 1, 15), 16, 10)::long`: 15 hex digits are the
    * top 60 bits of the first 8 digest bytes. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val g = d.digest(bytes)
    (((g(0) & 0xffL) << 56) | ((g(1) & 0xffL) << 48) |
      ((g(2) & 0xffL) << 40) | ((g(3) & 0xffL) << 32) |
      ((g(4) & 0xffL) << 24) | ((g(5) & 0xffL) << 16) |
      ((g(6) & 0xffL) << 8) | (g(7) & 0xffL)) >>> 4
  }
}

/** Native codegen form of the engine's portable 60-bit hash
  * (see functions.Hashing): semantically identical to
  * `conv(substring(md5(c), 1, 15), 16, 10).cast(long)` but with no
  * intermediate 32-char hex string, no substring copy, and no radix
  * parse — one digest and eight shifts per row. The hash sits in the
  * hot path of every sketch operator (MinHash shingles, SimHash votes,
  * HLL registers, CMS lanes, fingerprints, sampling thresholds), which
  * justifies custom-expression preference (b) of the build plan.
  *
  * Hash60Spec asserts bit-parity with the composed form on real data,
  * through SQL registration, and on the interpreted (non-codegen) path.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  // AbstractDataType (and with it ImplicitCastInputTypes.inputTypes) is
  // private[sql] in Spark 4, so the input contract is a manual check;
  // callers cast to binary explicitly (Hashing.hash60 does)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Util.hash60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Hash60Util.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}
