package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `capped_collect(v, cap)` — collect long values per group, but bound the
  * buffer at `cap` in update AND merge: the skew-safe inverted-index
  * bucket builder. Groups holding ≤ cap values yield the full collected
  * array (ascending, deterministic); groups that OVERFLOW yield NULL —
  * the exact overflow decision still lands because the buffer tracks the
  * true count past the cap while discarding the values.
  *
  * This is what makes a df-capped gram inventory (containment dedup,
  * `operators/Dedup.scala`) safe on 100 TB: a boilerplate gram appearing
  * in a billion documents moves AT MOST cap+count per (gram, map
  * partition) through the shuffle and occupies ≤ cap slots on the
  * reducer, where `collect_list` + `size(..) <= cap` would materialize
  * the full billion-element array before filtering it away. [[KmvAgg]]
  * bounds a different statistic (bottom-k distinct) the same way.
  *
  * Values are NOT deduplicated — callers feeding (doc, gram) rows that
  * are already distinct per group (e.g. `array_distinct` shingles) get
  * exact multiplicity semantics for free.
  */
case class CappedCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedCollect.Buf] {

  require(cap > 0, s"capped_collect needs cap > 0, got $cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"capped_collect expects a BIGINT column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_collect"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): CappedCollect.Buf =
    new CappedCollect.Buf(cap)

  override def update(buf: CappedCollect.Buf, input: InternalRow): CappedCollect.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: CappedCollect.Buf, b: CappedCollect.Buf): CappedCollect.Buf = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: CappedCollect.Buf): Any =
    if (buf.count > cap) null
    else {
      val out = buf.sortedItems
      val arr = new Array[Any](out.length)
      var i = 0
      while (i < out.length) { arr(i) = out(i); i += 1 }
      new GenericArrayData(arr)
    }

  override def serialize(buf: CappedCollect.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    val n = buf.size
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeLong(buf.item(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedCollect.Buf = {
    val buf = createAggregationBuffer()
    val in = ByteBuffer.wrap(bytes)
    val count = in.getLong
    val n = in.getInt
    var i = 0
    while (i < n) { buf.add(in.getLong); i += 1 }
    // restore the true count (adds past the cap were dropped above too,
    // but the serialized count carries the overflow information)
    buf.count = count
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CappedCollect {
  /** True count + at most `cap` stored values: overflow keeps counting,
    * stops storing.
    */
  final class Buf(cap: Int) {
    var count: Long = 0L
    private var items = new Array[Long](math.min(cap, 16))
    private var n = 0

    def add(v: Long): Unit = {
      count += 1
      if (count <= cap) {
        if (n == items.length) {
          val grown = new Array[Long](math.min(cap.toLong, items.length * 2L).toInt)
          System.arraycopy(items, 0, grown, 0, n)
          items = grown
        }
        items(n) = v
        n += 1
      }
    }

    def mergeFrom(b: Buf): Unit = {
      val total = count + b.count
      var i = 0
      while (i < b.n && count < cap) { add(b.item(i)); i += 1 }
      count = total
    }

    def size: Int = n
    def item(i: Int): Long = items(i)
    def sortedItems: Array[Long] = {
      val out = java.util.Arrays.copyOf(items, n)
      java.util.Arrays.sort(out)
      out
    }
  }
}
