package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_chunks(hx, windowBytes, maskBits)` — native content-defined
  * chunking over the hex rendering of an opaque payload: the same
  * boundary predicate and chunk digests as the relational formulation
  * documented at [[graft.operators.Multimodal.cdcChunks]] (a boundary
  * sits at byte offset p, windowBytes ≤ p < byte_len, iff the portable
  * 60-bit hash — first 15 hex chars of md5, i.e. first 8 digest bytes
  * >>> 4 — of the hex of the windowBytes-byte window ending at p has
  * its maskBits low bits zero; chunk_md5 = md5 of the chunk's hex), but
  * ONE JVM pass per payload instead of one exploded row + one
  * interpreted `substr`+`md5` Column chain per BYTE POSITION, and no
  * boundary∪start union, payload re-join, or per-media window
  * afterwards — the chunks assemble in the same loop (r13 optimization;
  * the same retire-the-lambda-stack move as [[WinnowFingerprints]]).
  * Input hex is ASCII (Spark's `hex()`), so byte slices of the
  * UTF8String are exactly the character slices the md5 Column saw — the
  * digests are bit-identical and the DuckDB oracle is unaffected.
  *
  * Output: array of (start, chunk_len, chunk_md5) structs ordered by
  * start, tiling [0, byte_len); an empty payload yields the single
  * zero-length chunk (md5 of the empty string). Null payloads yield
  * null (the callers attach non-null blobs).
  */
// CodegenFallback is deliberate (r13 verdict note): the rolling-digest
// loop IS the work here, so interpreted eval costs nothing measurable —
// but it does block whole-stage-codegen fusion of the SURROUNDING
// project. Currently irrelevant (the plan around it is two codegen'd
// projects); revisit only if this expression ever lands inside a wider
// codegen'd pipeline.
case class CdcChunks(child: Expression, windowBytes: Int, maskBits: Int)
    extends UnaryExpression with CodegenFallback {

  require(windowBytes >= 1, s"cdc_chunks needs windowBytes >= 1, got $windowBytes")
  require(maskBits >= 0 && maskBits <= 32,
    s"cdc_chunks needs 0 <= maskBits <= 32, got $maskBits")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", LongType, nullable = false),
      StructField("chunk_len", LongType, nullable = false),
      StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    val hx = input.asInstanceOf[UTF8String].getBytes
    val blen = hx.length / 2
    val md = CdcChunks.md.get()
    val mask = (1L << maskBits) - 1L
    val starts = new scala.collection.mutable.ArrayBuffer[Int](16)
    starts += 0
    var p = windowBytes
    while (p < blen) {
      md.reset()
      md.update(hx, (p - windowBytes) * 2, windowBytes * 2)
      val d = md.digest()
      val h60 = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      if ((h60 & mask) == 0L) starts += p
      p += 1
    }
    val out = new Array[Any](starts.length)
    var i = 0
    while (i < starts.length) {
      val st = starts(i)
      val en = if (i + 1 < starts.length) starts(i + 1) else blen
      md.reset()
      md.update(hx, st * 2, (en - st) * 2)
      out(i) = InternalRow(st.toLong, (en - st).toLong,
        UTF8String.fromString(CdcChunks.hexLower(md.digest())))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  private val md = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))

  private val digits = "0123456789abcdef".toCharArray

  /** Lowercase hex — what Spark's and DuckDB's `md5()` render. */
  private def hexLower(d: Array[Byte]): String = {
    val c = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      c(2 * i) = digits((d(i) >> 4) & 0xf)
      c(2 * i + 1) = digits(d(i) & 0xf)
      i += 1
    }
    new String(c)
  }
}
