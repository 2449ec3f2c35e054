package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-mega-cell benchmark for [[operators.Similarity.semDedupSkewSafe]]
  * (SCALING.md "skewed semantic dedup" row): a synthetic corpus where 30%
  * of all vectors land in ONE cluster cell — the shape a boilerplate
  * template or crawl artifact produces at corpus scale — and the rest
  * spread evenly. Times the quadratic in-cell path (semDedup) against the
  * skew-safe LSH route at increasing scale.
  *
  * The corpus is deterministic (hash-derived components): cell directions
  * are one-hot axes; each vector is its cell's axis plus a 0.6-norm
  * pseudo-random perpendicular, so intra-cell pairwise cosine sits ~0.74 —
  * below the 0.95 dedup threshold — with exact-duplicate PAIRS planted
  * every 50 ids (cosine 1, always found by both paths: identical vectors
  * share every hyperplane bucket). `bits` scales with log2(cell size) to
  * hold per-bucket occupancy constant — the knob that keeps the LSH
  * route's candidate work ~linear while the quadratic path grows with
  * |cell|².
  *
  * Usage: `sbt "runMain graft.SkewBench [n1,n2,...] [runQuadratic]
  * [maxCellSize]"` — defaults 20000,80000, true, n/10 (the third arg
  * routes EVERY cell through the LSH path when set below the balanced
  * cell size, the fixed-k regime's escape when k cannot grow with n).
  */
object SkewBench {

  private val Dim = 64
  private val Cells = 32
  private val MegaFrac = 0.3

  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val mega = (n * MegaFrac).toLong
    // cell 0 holds `mega` vectors; the rest round-robin cells 1..31
    val base = spark.range(n).select(col("id").as("vec_id"),
      when(col("id") < mega, lit(0))
        .otherwise(pmod(col("id"), lit(Cells - 1)).cast("int") + 1).as("_cell"))
    // duplicate pairs: id ≡ 1 (mod 50) reuses the previous id's seed
    val seeded = base.withColumn("_seed",
      when(pmod(col("vec_id"), lit(50)) === 1, col("vec_id") - 1)
        .otherwise(col("vec_id")))
    seeded.select(col("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)), j =>
        (when(j === col("_cell"), lit(1.0)).otherwise(lit(0.0)) +
          (pmod(xxhash64(col("_seed"), j), lit(1000)).cast("double") / 1000.0
            - 0.5) * lit(1.2))
          .cast("float")).as("emb"))
  }

  def centroids(spark: SparkSession): DataFrame =
    spark.range(Cells).select(col("id").cast("int").as("cell"),
      transform(sequence(lit(0), lit(Dim - 1)), j =>
        when(j === col("id").cast("int"), lit(1.0f)).otherwise(lit(0.0f)))
        .as("c_emb"))

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.nonEmpty) args(0) else "20000,80000")
      .split(",").map(_.trim.toLong).toSeq
    val runQuadratic = args.length < 2 || args(1).toBoolean
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.ensure(spark) // rhp_buckets + friends
    val cents = centroids(spark).localCheckpoint(true)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    sizes.foreach { n =>
      val c = corpus(spark, n).localCheckpoint(true)
      val megaCell = (n * MegaFrac).toLong
      // hold expected bucket occupancy ~64: bits = log2(mega/64), and the
      // small-cell threshold routes only the mega-cell through LSH
      val bits = math.max(2,
        (math.log(megaCell / 64.0) / math.log(2)).ceil.toInt)
      val maxCell = if (args.length > 2) args(2).toLong else n / 10
      val (safeSec, safeRows) = time {
        operators.Similarity.semDedupSkewSafe(c, "vec_id", "emb", cents,
          minCosine = 0.95, maxCellSize = maxCell, tables = 8, bits = bits,
          dim = Dim).filter(!col("kept")).count()
      }
      val quad = if (runQuadratic) {
        val (s, r) = time {
          operators.Similarity.semDedup(c, "vec_id", "emb", cents, 0.95)
            .filter(!col("kept")).count()
        }
        s""""semdedup_sec":${f"$s%.1f"},"semdedup_dropped":$r,"""
      } else ""
      println(s"""{"n":$n,"mega_cell":$megaCell,"bits":$bits,""" + quad +
        s""""skewsafe_sec":${f"$safeSec%.1f"},"skewsafe_dropped":$safeRows}""")
      c.unpersist()
    }
    spark.stop()
  }
}
