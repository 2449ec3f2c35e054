package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Selection

/** Exact k-th selection vs a literal sort: the histogram-bisection loop
  * must land on the identical element for every group, fraction, and
  * value distribution — including heavy ties, negatives, and windows
  * wider than the bucket count (multi-round refinement).
  */
class SelectionSpec extends SparkSpec {

  private def brute(rows: Seq[(String, Long)], num: Int, den: Int)
      : Map[String, (Long, Long, Long)] =
    rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.size.toLong
      val k = (n * num + den - 1) / den
      g -> (n, k, sorted((k - 1).toInt))
    }

  private def check(rows: Seq[(String, Long)], num: Int, den: Int): Unit = {
    val df = spark.createDataFrame(rows).toDF("g", "v")
    val got = Selection.exactKthByGroup(df, Seq("g"), col("v"), num, den,
        buckets = 16) // small buckets force multi-round refinement
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === brute(rows, num, den))
  }

  test("median, p10, p99 equal sort-based selection on randomized groups") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      (s"g${i % 7}", (rnd.nextLong() % 1000000L) - 500000L)
    }
    check(rows, 1, 2)
    check(rows, 1, 10)
    check(rows, 99, 100)
  }

  test("heavy ties: constant groups and two-value groups") {
    val rows = Seq.tabulate(500)(i => ("c", 42L)) ++
      Seq.tabulate(301)(i => ("d", if (i % 3 == 0) -5L else 9L))
    check(rows, 1, 2)
    check(rows, 1, 1)   // maximum
    check(rows, 1, 500) // k = 1, minimum
  }

  test("wide 64-bit-ish windows refine over several rounds") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(400)(_ => ("w", rnd.nextLong() / 4))
    check(rows, 1, 2)
    check(rows, 3, 4)
  }

  test("FULL 64-bit domain: extremes at Long.MinValue/MaxValue (span " +
      "overflows long arithmetic) still select exactly") {
    val rnd = new scala.util.Random(12)
    val rows = Seq(("f", Long.MinValue), ("f", Long.MinValue + 1),
      ("f", -3L), ("f", 0L), ("f", 7L),
      ("f", Long.MaxValue - 1), ("f", Long.MaxValue)) ++
      Seq.tabulate(300)(_ => ("f", rnd.nextLong()))
    check(rows, 1, 2)
    check(rows, 1, 100)
    check(rows, 99, 100)
    // a group that IS the two extremes alone
    val tiny = Seq(("t", Long.MinValue), ("t", Long.MaxValue))
    check(tiny, 1, 2)
    check(tiny, 2, 2)
  }

  test("multi-column strata and null exclusion") {
    val df = spark.createDataFrame(Seq(
      ("en", "web", java.lang.Long.valueOf(10L)),
      ("en", "web", java.lang.Long.valueOf(20L)),
      ("en", "web", null.asInstanceOf[java.lang.Long]),
      ("en", "book", java.lang.Long.valueOf(7L)),
      ("fr", "web", java.lang.Long.valueOf(5L)),
      ("fr", "web", java.lang.Long.valueOf(6L))))
      .toDF("lang", "src", "v")
    val got = Selection.exactKthByGroup(df, Seq("lang", "src"), col("v"), 1, 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(
      ("en", "web") -> (2L, 1L, 10L),
      ("en", "book") -> (1L, 1L, 7L),
      ("fr", "web") -> (2L, 1L, 5L)))
  }

  test("weighted selection equals cumulative-weight brute force; zero-weight groups omitted") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(2000)(i =>
      (s"g${i % 5}", rnd.nextInt(1000).toLong, rnd.nextInt(50).toLong)) ++
      Seq(("z", 1L, 0L), ("z", 2L, 0L)) // all-zero-weight group
    val df = spark.createDataFrame(rows).toDF("g", "v", "wt")
    for ((num, den) <- Seq((1, 2), (9, 10))) {
      val got = graft.operators.Selection.exactWeightedKthByGroup(
        df, Seq("g"), col("v"), col("wt"), num, den, buckets = 16)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, vs) =>
        val wTot = vs.map(_._3).sum
        if (wTot == 0) None
        else {
          val k = (wTot * num + den - 1) / den
          val sorted = vs.map(v => (v._2, v._3)).sortBy(_._1)
          var cum = 0L
          val kth = sorted.find { case (_, w) => cum += w; cum >= k }.get._1
          Some(g -> (wTot, k, kth))
        }
      }
      assert(got === want, s"fraction $num/$den")
    }
  }

  test("empty input yields an empty result with the contract schema") {
    val df = spark.createDataFrame(Seq.empty[(String, Long)]).toDF("g", "v")
    val out = Selection.exactKthByGroup(df, Seq("g"), col("v"), 1, 2)
    assert(out.columns.toSeq === Seq("g", "n", "k", "kth"))
    assert(out.count() === 0)
  }
}
