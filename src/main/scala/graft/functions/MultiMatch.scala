package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `multi_match(text, p1, p2, …)` — Aho–Corasick multi-pattern substring
  * counting (Aho & Corasick CACM'75): ONE automaton walk over the text
  * counts ALL occurrences (overlapping included) of every pattern at
  * once, returned as `array<bigint>` aligned with the pattern order.
  * The blocklist / banned-phrase primitive of a release pipeline: K
  * patterns cost O(n + matches) per document, not K regex passes — and
  * the automaton is built once per expression instance (a JVM-lazy
  * field), never per row.
  *
  * Matching is raw character equality on the string as given (callers
  * lower-case both sides for case-insensitive semantics), so the DuckDB
  * twin is a plain sliding `substring(text, p, len(pat)) = pat` count —
  * occurrence COUNTS are encoding-agnostic even where char vs
  * code-point positions differ.
  */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "multi_match needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "multi_match patterns must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_match"

  @transient private lazy val ac = new MultiMatchCounts.Automaton(patterns.toArray)

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(ac.countAll(t))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiMatchCounts {

  /** Classic goto/fail automaton; `out` per node carries every pattern id
    * ending there, fail-chain outputs pre-merged at build so the walk
    * never follows fail links for output.
    */
  final class Automaton(patterns: Array[String]) extends Serializable {
    private val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    private val outOwn = scala.collection.mutable.ArrayBuffer(List.empty[Int])

    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { ch =>
        val nxt = goto(s).get(ch)
        s = if (nxt != null) nxt.intValue()
        else {
          goto += new java.util.HashMap[Character, Integer]()
          outOwn += Nil
          goto(s).put(ch, goto.size - 1)
          goto.size - 1
        }
      }
      outOwn(s) = pid :: outOwn(s)
    }

    private val n = goto.size
    private val fail = new Array[Int](n)
    val out: Array[Array[Int]] = new Array[Array[Int]](n)
    locally { // BFS fail links + merged outputs
      val queue = scala.collection.mutable.Queue.empty[Int]
      out(0) = outOwn(0).toArray
      goto(0).forEach { (_, v) => fail(v) = 0; queue += v.intValue() }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        out(u) = (outOwn(u) ++ out(fail(u)).toList).toArray
        goto(u).forEach { (ch, v) =>
          var f = fail(u)
          while (f != 0 && !goto(f).containsKey(ch)) f = fail(f)
          val t = goto(f).get(ch)
          fail(v) = if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
          queue += v.intValue()
        }
      }
    }

    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch: Character = text.charAt(i)
        while (s != 0 && !goto(s).containsKey(ch)) s = fail(s)
        val nxt = goto(s).get(ch)
        s = if (nxt != null) nxt.intValue() else 0
        val o = out(s)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }
}
