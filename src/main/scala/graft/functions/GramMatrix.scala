package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass Gram-matrix aggregate: `gram_agg(vec, dim)` sums the outer
  * product vᵀv over every `array<double>` row, returning the upper
  * triangle (row-major: (0,0),(0,1),…,(0,d−1),(1,1),…) as a
  * `dim·(dim+1)/2`-element `array<double>`.
  *
  * This is the covariance/PCA building block of an embedding pipeline: the
  * d×d second-moment matrix in ONE scan with an O(d²) buffer — no explode
  * to (row, i, j) triples (which would shuffle d²/2 rows per vector), no
  * driver-side accumulation. Partial buffers merge by element-wise add, so
  * the shuffle carries exactly one O(d²) array per map partition; for
  * d = 64 that is 2 080 doubles, smaller than a single exploded vector's
  * worth of triple rows.
  *
  * Exactness: double addition of INTEGER-VALUED inputs (e.g. int8-quantized
  * embeddings) is exact while every partial sum stays within 2^53, so the
  * result is order-independent and bit-portable — what lets an oracle pin
  * the gram of a quantized corpus exactly (q_embed_gram). On raw float
  * embeddings the sums are ordinary floating-point (order-dependent in the
  * last ulp) — fine for the PCA fit they feed, not for a hash-compared
  * oracle.
  *
  * A NULL vector row is skipped; a non-NULL vector of length ≠ `dim`
  * raises (a silent skip would corrupt the statistic).
  */
case class GramMatrix(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0 && dim <= 4096, s"gram_agg needs 0 < dim <= 4096, got $dim")

  private val triLen = dim * (dim + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_agg expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](triLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"gram_agg(dim=$dim) saw a vector of length ${arr.numElements()}")
      var e = 0
      while (e < dim) {
        // toDoubleArray on a null element reads unspecified bits on some
        // ArrayData implementations — corrupt statistics, not an error
        if (arr.isNullAt(e))
          throw new IllegalArgumentException(
            s"gram_agg saw a NULL at position $e — impute or filter first")
        e += 1
      }
      val x = arr.toDoubleArray()
      var p = 0
      var i = 0
      while (i < dim) {
        val xi = x(i)
        var j = i
        while (j < dim) {
          buf(p) += xi * x(j)
          p += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var p = 0
    while (p < triLen) { a(p) += b(p); p += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * triLen)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(triLen)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
