package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable Bloom filter — the fixed-memory membership artifact for
  * 100 TB decontamination and visited-set checks.
  *
  * Where the existing gate ([[graft.streaming.StreamingQuality]]
  * `decontaminateAtIngest`) broadcasts the benchmark's n-grams as an exact
  * map, a Bloom filter caps the broadcast at `numBits/8` bytes REGARDLESS
  * of benchmark size (a 1 B-gram benchmark at 10 bits/item is ~1.25 GB as
  * a bitset vs ~60 GB of gram strings), trading exactness for a one-sided
  * error: no false negatives ever; false positives at the standard rate
  * (1 − e^{−kn/m})^k. For decontamination that one-sidedness is the safe
  * direction — a false positive drops a clean document, never leaks a
  * contaminated one.
  *
  * Spark's own `BloomFilterAggregate` is internal (runtime row-group
  * filtering) and speaks xxhash64, which no oracle engine reproduces. This
  * implementation hashes like the CMS sketch ([[Sketches.cmsCell]]): ONE
  * md5 per item, Kirsch–Mitzenmacher double hashing from the digest's two
  * 60-bit halves — so DuckDB rebuilds the identical bit positions and the
  * whole probe query (false positives included, they are deterministic) is
  * hash-oracled, not merely spec-pinned.
  *
  * Blob layout: int numBits | int k | ⌈numBits/64⌉ big-endian longs. The
  * header makes `bloom_contains(blob, item)` self-describing — probes
  * can't silently run with mismatched (m, k).
  *
  * Scale shape: the aggregate buffer is the bitset itself — constant
  * size, merged by OR map-side, so building over 100 TB of grams shuffles
  * ⌈m/64⌉ longs per map partition and nothing input-sized. Probing is a
  * narrow codegen'd scan against one broadcast blob: zero shuffle.
  */
object Bloom {

  /** (h1, h2) = the two 60-bit halves of md5(utf8 bytes) — identical to
    * DuckDB `('0x' || substring(md5(x), 1, 15))::BIGINT` and chars 16-30.
    */
  private def halves(item: UTF8String): (Long, Long) = {
    val d = MessageDigest.getInstance("MD5").digest(item.getBytes)
    // hex chars 0..14 = bytes 0..6 + high nibble of byte 7
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    h1 = (h1 << 4) | ((d(7) & 0xf0L) >> 4)
    // hex chars 15..29 = low nibble of byte 7 + bytes 8..14
    var h2 = d(7) & 0x0fL
    i = 8
    while (i < 15) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    (h1, h2)
  }

  /** Set the k lane bits of `item` in `words`. Lane i sits at
    * (h1 + i·h2) mod numBits, computed with both halves pre-reduced mod
    * numBits so `h1r + i·h2r` never overflows a long (numBits ≤ 2^31,
    * i < k ≤ 64 ⇒ sum < 2^37) — congruent to the oracle's HUGEINT form.
    */
  def add(words: Array[Long], numBits: Int, k: Int, item: UTF8String): Unit = {
    val (h1, h2) = halves(item)
    val m = numBits.toLong
    val h1r = h1 % m
    val h2r = h2 % m
    var i = 0
    while (i < k) {
      val pos = ((h1r + i * h2r) % m).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Membership probe against a header-carrying blob. Static so codegen
    * emits one call — stays inside whole-stage codegen.
    */
  def contains(blob: Array[Byte], item: UTF8String): Boolean = {
    val numBits = readInt(blob, 0)
    val k = readInt(blob, 4)
    val (h1, h2) = halves(item)
    val m = numBits.toLong
    val h1r = h1 % m
    val h2r = h2 % m
    var i = 0
    while (i < k) {
      val pos = ((h1r + i * h2r) % m).toInt
      val word = readLong(blob, 8 + (pos >>> 6) * 8)
      if ((word & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  private def readInt(b: Array[Byte], off: Int): Int = {
    var v = 0
    var i = 0
    while (i < 4) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    v
  }

  private def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  def toBlob(words: Array[Long], numBits: Int, k: Int): Array[Byte] = {
    val out = new Array[Byte](8 + words.length * 8)
    writeInt(out, 0, numBits)
    writeInt(out, 4, k)
    var w = 0
    while (w < words.length) {
      var v = words(w)
      var i = 7
      while (i >= 0) { out(8 + w * 8 + i) = (v & 0xff).toByte; v >>>= 8; i -= 1 }
      w += 1
    }
    out
  }

  def fromBlob(blob: Array[Byte]): (Array[Long], Int, Int) = {
    val numBits = readInt(blob, 0)
    val k = readInt(blob, 4)
    val words = new Array[Long]((numBits + 63) >>> 6)
    var w = 0
    while (w < words.length) { words(w) = readLong(blob, 8 + w * 8); w += 1 }
    (words, numBits, k)
  }

  private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte
    b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte
    b(off + 3) = v.toByte
  }
}

/** `bloom_agg(item, numBits, k)` → the header-carrying bitset blob.
  * Buffer = the bitset; update sets k bits, merge ORs — constant memory,
  * map-side combining, input-size-independent shuffle.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0,
    s"bloom_agg needs numBits > 0 and a multiple of 64, got $numBits")
  require(k > 0 && k <= 64, s"bloom_agg needs 0 < k <= 64, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a string item, got ${t.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, numBits, k, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = Bloom.toBlob(buf, numBits, k)

  override def serialize(buf: Array[Long]): Array[Byte] =
    Bloom.toBlob(buf, numBits, k)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Bloom.fromBlob(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `bloom_union_agg(blob)` — OR stored blobs back together (the
  * `hll_union_agg` analog): per-stratum bloom artifacts roll up to any
  * coarser stratum without rescanning the data. All inputs must carry the
  * same (numBits, k) header; mismatches fail loudly.
  */
case class BloomUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_union_agg expects a bloom blob, got ${t.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_union_agg"
  override def children: Seq[Expression] = Seq(child)

  /** empty = not-yet-seen sentinel (blob geometry unknown until input). */
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def orInto(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (b.isEmpty) a
    else if (a.isEmpty) b.clone()
    else {
      require(a.length == b.length &&
        java.util.Arrays.equals(a.slice(0, 8), b.slice(0, 8)),
        "bloom_union_agg: mismatched (numBits, k) headers")
      var i = 8
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else orInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = orInto(a, b)

  override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `bloom_contains(blob, item)` — codegen'd membership probe; the blob is
  * normally a broadcast scalar or a literal, so the probe is a narrow
  * whole-stage-codegen scan.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(blob: Any, item: Any): Any =
    Bloom.contains(blob.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, item) =>
      s"${ev.value} = graft.functions.Bloom.contains($blob, $item);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
