package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic distributed exact-k sample as a typed imperative
  * aggregate (SURVEY.md §2.10's reservoir-sample slot, upgraded).
  *
  * A classic reservoir sample depends on encounter order, so its output
  * changes with partitioning — useless under a hash-match gate and
  * non-reproducible on a cluster. Instead we keep the k values with the
  * smallest `xxhash64(value, salt)`: a bottom-k sketch. Min-k is
  * associative and commutative, so partial buffers merge in any order,
  * any partitioning, any cluster size — same sample every time, and
  * hash-uniformity makes it a uniform sample of the distinct values.
  *
  * Buffer: max-heap of (hash, value) capped at k; serialized as fixed
  * 16-byte pairs for shuffle-safe partial aggregation.
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    salt: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottomk_sample"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottomk_sample expects bigint, got ${child.dataType.simpleString}")

  // max-heap on hash: the head is the current worst candidate.
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](Ordering.by(_._1))

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val v = child.eval(input)
    if (v != null) add(buf, XXH64.hashLong(v.asInstanceOf[Long], salt), v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
                     other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { case (h, v) => add(buf, h, v) }
    buf
  }

  private def add(buf: mutable.PriorityQueue[(Long, Long)], h: Long, v: Long): Unit = {
    if (buf.size < k) buf.enqueue((h, v))
    else if (h < buf.head._1) { buf.dequeue(); buf.enqueue((h, v)) }
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sortBy(_._1).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 16)
    buf.foreach { case (h, v) => bb.putLong(h).putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.enqueue((bb.getLong, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
