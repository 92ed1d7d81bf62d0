package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Min-K hash sample as a TypedImperativeAggregate — the aggregate form
  * of `Sketches.sampleQuantiles`' membership rule (keep the K rows with
  * the smallest key hash), built for streaming: state is one ≤K-pair
  * buffer per group in the state store, merged across micro-batches via
  * the serialize/merge path, so continuous grouped quantile monitoring
  * costs O(groups × K) state forever. Mergeable because min-K(A ∪ B) =
  * min-K(min-K(A) ∪ min-K(B)); deterministic because the HASH decides
  * membership, not arrival order — restart, repartition, or replay all
  * produce the identical sample (batch⇄streaming equality is
  * spec-asserted). Returns the sampled values ordered by (hash, value);
  * feed them to `percentile`/sort-based quantile math downstream.
  *
  * The window form (WindowGroupLimit) wins for one-shot batch jobs —
  * fully codegen'd; this buffer form wins when groups are many (one
  * buffer vs K rows per group through the exchange) and is the only
  * form streaming state can hold.
  */
case class MinKSampleAgg(
    key: Expression,
    value: Expression,
    k: Int = 64,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.PriorityQueue[(Long, Double)]] {

  type Buf = scala.collection.mutable.PriorityQueue[(Long, Double)]
  // max-heap on (hash, value): the largest pair is evicted first
  private implicit val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def children: Seq[Expression] = Seq(key, value)

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, value.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint key, double value), got $other")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mink_sample"

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.PriorityQueue.empty[(Long, Double)]

  private def offer(buf: Buf, h: Long, v: Double): Unit =
    if (buf.size < k) buf.enqueue((h, v))
    else if (ord.lt((h, v), buf.head)) { buf.dequeue(); buf.enqueue((h, v)) }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null)
      offer(buf, kv.asInstanceOf[Long], vv.asInstanceOf[Double])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (h, v) => offer(a, h, v) }
    a
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.toArray.sorted.map(_._2))

  override def serialize(buf: Buf): Array[Byte] = {
    val arr = buf.toArray
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (1 to n).foreach(_ => buf.enqueue((bb.getLong, bb.getDouble)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinKSampleAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinKSampleAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKSampleAgg =
    copy(key = newChildren.head, value = newChildren(1))
}
