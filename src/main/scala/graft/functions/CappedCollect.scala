package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

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

/** `capped_collect2(k, v, cap)` — the two-column sibling of
  * [[CappedCollect]]: collect (k, v) long pairs per group with the same
  * update-AND-merge cap, exact overflow count, and NULL-past-cap
  * contract. Output is `array<struct<k bigint, v bigint>>` sorted by
  * (k, v) — deterministic regardless of arrival order. Built for
  * weighted inverted-index buckets (doc id + term weight per gram,
  * `operators/Search.cosinePairs`) where packing two values into one
  * long would force documented-arbitrary bit bounds on both.
  */
case class CappedCollectPairs(
    key: Expression,
    value: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedCollectPairs.Buf] {

  require(cap > 0, s"capped_collect2 needs cap > 0, got $cap")

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, value.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (k, v) => TypeCheckResult.TypeCheckFailure(
        s"capped_collect2 expects two BIGINT columns, got ${k.simpleString}, ${v.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_collect2"
  override def children: Seq[Expression] = Seq(key, value)

  override def createAggregationBuffer(): CappedCollectPairs.Buf =
    new CappedCollectPairs.Buf(cap)

  override def update(buf: CappedCollectPairs.Buf, input: InternalRow): CappedCollectPairs.Buf = {
    val k = key.eval(input)
    val v = value.eval(input)
    if (k != null && v != null)
      buf.add(k.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(a: CappedCollectPairs.Buf, b: CappedCollectPairs.Buf): CappedCollectPairs.Buf = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: CappedCollectPairs.Buf): Any =
    if (buf.count > cap) null
    else {
      val n = buf.size
      val idx = buf.sortedIndices
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        arr(i) = InternalRow(buf.keyAt(idx(i)), buf.valueAt(idx(i)))
        i += 1
      }
      new GenericArrayData(arr)
    }

  override def serialize(buf: CappedCollectPairs.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    val n = buf.size
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeLong(buf.keyAt(i)); out.writeLong(buf.valueAt(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedCollectPairs.Buf = {
    val buf = createAggregationBuffer()
    val in = ByteBuffer.wrap(bytes)
    val count = in.getLong
    val n = in.getInt
    var i = 0
    while (i < n) { buf.add(in.getLong, in.getLong); i += 1 }
    buf.count = count
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren.head, value = newChildren(1))
}

object CappedCollectPairs {
  /** True count + at most `cap` stored (k, v) pairs — [[CappedCollect.Buf]]
    * with parallel key/value arrays.
    */
  final class Buf(cap: Int) {
    var count: Long = 0L
    private var ks = new Array[Long](math.min(cap, 16))
    private var vs = new Array[Long](math.min(cap, 16))
    private var n = 0

    def add(k: Long, v: Long): Unit = {
      count += 1
      if (count <= cap) {
        if (n == ks.length) {
          val cap2 = math.min(cap.toLong, ks.length * 2L).toInt
          ks = java.util.Arrays.copyOf(ks, cap2)
          vs = java.util.Arrays.copyOf(vs, cap2)
        }
        ks(n) = k
        vs(n) = v
        n += 1
      }
    }

    def mergeFrom(b: Buf): Unit = {
      val total = count + b.count
      var i = 0
      while (i < b.n && count < cap) { add(b.ks(i), b.vs(i)); i += 1 }
      count = total
    }

    def size: Int = n
    def keyAt(i: Int): Long = ks(i)
    def valueAt(i: Int): Long = vs(i)
    def sortedIndices: Array[Int] = {
      val idx = Array.tabulate(n)(identity)
      val boxed = idx.map(Integer.valueOf)
      java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
        override def compare(a: Integer, b: Integer): Int = {
          val c = java.lang.Long.compare(ks(a), ks(b))
          if (c != 0) c else java.lang.Long.compare(vs(a), vs(b))
        }
      })
      boxed.map(_.intValue())
    }
  }
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
