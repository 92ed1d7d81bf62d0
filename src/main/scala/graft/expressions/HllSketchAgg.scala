package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count as a TypedImperativeAggregate — the
  * buffer-based production form of `functions.Sketches.hllDistinct`
  * (build-plan custom-operator preference (b), aggregate flavor).
  *
  * The compositional form shuffles ≤1024 register ROWS per group; this
  * one shuffles ONE 1024-byte buffer per group (serialized registers),
  * merged bytewise-max — the better constant factor when groups are
  * many. Parameters and arithmetic are IDENTICAL to Sketches: hash60
  * (p=10, top 10 bits → bucket, low 50 bits → rho = 51 − bitlength),
  * alpha·m² bias constant, linear-counting small-range correction,
  * round(·, 4). The register power sum is a dyadic rational with <52
  * significant bits, so the double math is order-exact and the two
  * forms agree BIT-FOR-BIT (spec-asserted in ScaleSpec), which also
  * means the DuckDB-oracle portability of q52 carries over unchanged.
  */
case class HllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val P = 10
  private val M = 1 << P
  private val WBits = 60 - P
  private val WMask = (1L << WBits) - 1

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string or binary, got ${other.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch_estimate"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v match {
        case s: UTF8String => s.getBytes
        case b: Array[Byte] => b
      }
      val h = Hash60Util.hash60(bytes)
      val bucket = (h >>> WBits).toInt
      val w = h & WMask
      // rho = (leading zeros in the 50-bit field) + 1 = 51 - bitlength(w);
      // bitlength(0) = 0 → rho = 51, matching ltrim(bin(w),'0') = ''
      val rho = (WBits + 1 -
        (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var sp = 0.0
    var v = 0
    var i = 0
    while (i < M) {
      val r = buf(i)
      if (r == 0) v += 1
      else sp += math.pow(0.5, r.toDouble)
      i += 1
    }
    val alphaM2 = 0.7213 / (1.0 + 1.079 / M.toDouble) *
      M.toDouble * M.toDouble
    val raw = alphaM2 / (sp + v.toDouble)
    val est =
      if (raw <= 2.5 * M && v > 0) M.toDouble * math.log(M.toDouble / v)
      else raw
    // mirror Spark's Round: valueOf (canonical repr), not the exact
    // binary expansion — keeps bit-parity with round(col, 4)
    java.math.BigDecimal.valueOf(est)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}
