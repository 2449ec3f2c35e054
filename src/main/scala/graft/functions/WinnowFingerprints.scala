package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text, k, w)` — native winnowing fingerprint selection
  * (Schleimer-Wilkerson-Aiken SIGMOD'03): the same (min k-gram hash per
  * w-window, leftmost tie-break, distinct) contract as the
  * higher-order-function formulation documented in
  * [[TextAnalysis.winnow]], but ONE JVM loop per row with an O(n)
  * monotonic-deque sliding minimum instead of an interpreted O(n·w)
  * lambda chain — HigherOrderFunction expressions never enter
  * whole-stage codegen, and the nested transform/slice/array_min stack
  * made q_winnow the board's slowest row (6.7 s at sf0.1; this
  * expression retires that). Hashes are the portable 60-bit md5 prefix
  * (first 8 digest bytes big-endian >>> 4 == the first 15 hex chars in
  * base 16), positions count CODE POINTS, 1-based — both exactly what
  * the DuckDB twin computes, so the oracle match is preserved.
  *
  * Deque invariant: indices ascending, hash values strictly increasing —
  * a new hash pops strictly-greater tails, so equal values keep the
  * EARLIER index at the front: the front is each window's leftmost
  * minimum, the documented tie-break. Selected indices are
  * non-decreasing across windows (entries only arrive with larger
  * indices and the head only advances), so the winnowing dedup is a
  * last-selected check — no set, no sort.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"winnow_fps needs k >= 1, got $k")
  require(w >= 1, s"winnow_fps needs w >= 1, got $w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("fp", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].toLowerCase.toString
    val cps = t.codePoints().toArray
    val n = cps.length
    val hashes: Array[Long] =
      if (n < k) Array(WinnowFingerprints.hash60(t))
      else {
        val out = new Array[Long](n - k + 1)
        var i = 0
        while (i <= n - k) {
          out(i) = WinnowFingerprints.hash60(new String(cps, i, k))
          i += 1
        }
        out
      }
    val m = hashes.length
    val nw = math.max(m - w + 1, 1)
    val selIdx = new Array[Int](nw)
    var nSel = 0
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    val firstEnd = math.min(w, m) // first window is shorter when m < w
    while (i < firstEnd) {
      while (tail > head && hashes(deque(tail - 1)) > hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      i += 1
    }
    selIdx(0) = deque(head); nSel = 1
    var j = 1
    while (j < nw) {
      // evict left of window [j, j+w-1]
      while (tail > head && deque(head) < j) head += 1
      val r = j + w - 1
      while (tail > head && hashes(deque(tail - 1)) > hashes(r)) tail -= 1
      deque(tail) = r; tail += 1
      if (deque(head) != selIdx(nSel - 1)) { selIdx(nSel) = deque(head); nSel += 1 }
      j += 1
    }
    val arr = new Array[Any](nSel)
    var o = 0
    while (o < nSel) {
      arr(o) = InternalRow(hashes(selIdx(o)), (selIdx(o) + 1).toLong)
      o += 1
    }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val md = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5 parsed base 16 == first 8 digest bytes
    * big-endian, unsigned-shifted right 4.
    */
  def hash60(s: String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hi = ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    hi >>> 4
  }
}
