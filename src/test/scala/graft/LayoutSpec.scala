package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonInterleave: hand-checked bit weave, x in even positions") {
    // bx = 0b101, by = 0b011 → even bits 1,0,1 (1 + 16), odd bits 1,1,0
    // (2 + 8) → 27
    val out = Seq((5L, 3L)).toDF("bx", "by")
      .select(Layout.mortonInterleave(col("bx"), col("by"), 3).as("z"))
      .as[Long].head()
    assert(out === 27L)
    // identity lattice: z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,2)=12
    val lattice = Seq((1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L)).toDF("bx", "by")
      .select(Layout.mortonInterleave(col("bx"), col("by"), 2).as("z"))
      .as[Long].collect().toSeq
    assert(lattice === Seq(1L, 2L, 3L, 12L))
  }

  test("linearBucket: full 64-bit domain (MinValue..MaxValue span overflows " +
      "plain BIGINT) buckets exactly and monotonically") {
    import spark.implicits._
    val xs = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue)
    val got = xs.toDF("x")
      .select(Layout.linearBucket(col("x"), lit(Long.MinValue),
        lit(Long.MaxValue), bits = 8).as("b"))
      .as[Long].collect().toSeq
    // brute: stride = floor(2^64-1 / 256) + 1 computed in BigInt
    val stride = ((BigInt(Long.MaxValue) - BigInt(Long.MinValue)) / 256 + 1)
    val want = xs.map(x => ((BigInt(x) - BigInt(Long.MinValue)) / stride).toLong)
    assert(got === want)
    assert(got === got.sorted, "bucketing must be monotone in x")
    assert(got.forall(b => b >= 0 && b < 256))
  }

  test("linearBucket is exact past 2^53 where double math would round") {
    // stride = (2^62 - 0) div 2 + 1 = 2^61 + 1: values straddling the
    // boundary bucket exactly; a floor((x/range)·nb) double path cannot
    // represent these longs
    val mx = 1L << 62
    val half = (1L << 61) + 1
    val out = Seq(half - 1, half, mx).toDF("x")
      .select(Layout.linearBucket(col("x"), lit(0L), lit(mx), bits = 1).as("b"))
      .as[Long].collect().toSeq
    assert(out === Seq(0L, 1L, 1L))
    // constant column: everything in bucket 0
    val const = Seq(7L, 7L).toDF("x")
      .select(Layout.linearBucket(col("x"), lit(7L), lit(7L), 4).as("b"))
      .as[Long].collect().toSeq
    assert(const === Seq(0L, 0L))
  }

  test("zOrderLayout: partitions carry disjoint, ordered zvalue ranges") {
    val df = Seq.tabulate(1000)(i => (i.toLong, (i * 37 % 1000).toLong, (i * 91 % 1000).toLong))
      .toDF("id", "x", "y")
    val laid = Layout.zOrderLayout(df, "x", "y", bits = 6, numFiles = 8)
    val ranges = laid
      .select(spark_partition_id().as("p"), col("zvalue"))
      .groupBy("p").agg(min("zvalue").as("lo"), max("zvalue").as("hi"), count(lit(1)).as("n"))
      .orderBy("p")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(ranges.map(_._4).sum === 1000L)
    assert(ranges.size > 1, "range partitioning collapsed to one partition")
    // each partition's range ends before the next begins — the property
    // that gives per-file min/max pruning on zvalue (and thus both keys)
    ranges.sliding(2).foreach {
      case Seq((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // within a partition, rows are sorted by zvalue
    val sortedWithin = laid.select(spark_partition_id().as("p"), col("zvalue"))
      .as[(Int, Long)].mapPartitions { it =>
        val v = it.toSeq.map(_._2); Iterator.single(v == v.sorted)
      }.collect()
    assert(sortedWithin.forall(identity))
  }

  test("zvalue locality: nearby (x, y) cells map to nearby z ranges") {
    // the quadrant property: both buckets < 2^(bits-1) ⇔ both top
    // interleaved bits clear ⇔ z < 2^(2·bits-2)
    val bits = 4
    val df = Seq.tabulate(16, 16)((x, y) => (x.toLong, y.toLong)).flatten
      .toDF("bx", "by")
      .select(col("bx"), col("by"),
        Layout.mortonInterleave(col("bx"), col("by"), bits).as("z"))
      .as[(Long, Long, Long)].collect()
    df.foreach { case (bx, by, z) =>
      assert((bx < 8 && by < 8) === (z < 64), s"($bx,$by)→$z breaks quadrants")
    }
  }
}
