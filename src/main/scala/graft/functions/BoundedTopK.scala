package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Exact top-k aggregate with a bounded heap: `topk_agg(ord_struct, k)`
  * returns the k smallest `ord_struct` values in ascending order (sort the
  * struct so ascending = your desired order, e.g. `struct(-score, id)`).
  *
  * This is the memory-safe form of per-key top-k at 100 TB: a
  * `collect_list`-then-slice keeps every row of a (key, partition) group in
  * the aggregation buffer before truncating, so one hot key can hold a
  * partition's worth of rows in memory; this buffer never exceeds k rows in
  * update OR merge, and the shuffle carries at most k rows per key per map
  * partition. Window `row_number` would instead sort entire partitions.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"topk_agg needs k > 0, got $k")

  private def childStruct: StructType = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if TypeUtils.checkForOrderingExpr(s, prettyName).isSuccess =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"topk_agg expects an orderable struct, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(childStruct, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"
  override def children: Seq[Expression] = Seq(child)

  /** head of the queue = LARGEST retained value (dequeued first when a
    * smaller candidate arrives).
    */
  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(childStruct).asInstanceOf[Ordering[InternalRow]]

  @transient private lazy val toUnsafe = UnsafeProjection.create(childStruct)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ordering)

  private def offer(buf: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit =
    if (buf.size < k) buf.enqueue(row)
    else if (ordering.lt(row, buf.head)) {
      buf.dequeue()
      buf.enqueue(row)
    }

  override def update(
      buf: mutable.PriorityQueue[InternalRow], input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[InternalRow],
      b: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering).asInstanceOf[Array[Any]])

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      val u = toUnsafe(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val buf = createAggregationBuffer()
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(childStruct.size)
      row.pointTo(rowBytes, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
