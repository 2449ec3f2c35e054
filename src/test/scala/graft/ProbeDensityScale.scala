package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Density-preserving scale probe for `semDedupSkewSafe` (VERDICT r9
  * task 3): the standing BENCH_100x row replicates the corpus under a
  * FIXED centroid count and FIXED LSH bucket count, so per-cell and
  * per-bucket populations grow 100× and candidate verify work grows
  * ~quadratically — SCALING.md argues that is a synthetic-density
  * artifact, and this probe DEMONSTRATES it: grow the corpus N× while
  * scaling what a real deployment scales (centroids ∝ N so cell
  * population stays ~constant; LSH `bits` ∝ log N so mega-cell bucket
  * occupancy stays ~constant; the planted-dup fraction and the 5%
  * mega-cell fraction are scale-invariant). Same operator, same
  * routes (every regular cell > maxCellSize → LSH; mega cell 40×
  * larger than the regular cells), min_of_2 per scale.
  *
  * Construction (the q_semdedup_skew recipe generalized to a scalable
  * cell count): seed s = id − (id%4==1), so ids ≡ 1 (mod 4) duplicate
  * their predecessor exactly (25% planted dups at every scale); 5% of
  * seeds (s%20==0) land in the mega cell; the rest spread over
  * 15·scale regular cells. Cell signal = e_a + 2·e_b over dims 0..39
  * ((a,b) = cell index base-40; mega cell = plain e_0), hash noise
  * ±1.5 on dims 40..63 (noise² ≈ 18 ≫ signal² ≤ 5) — own centroid is
  * nearest DETERMINISTICALLY (centroids are zero on the noise dims, so
  * the noise term cancels across centroids and the signal margin is
  * ≥ 2.0), same-cell non-dup cosine ~0.2, and, critically, the
  * hyperplane bits are noise-driven: a shared cell signal that
  * dominates the noise would bias every bit the same way and LSH could
  * not split the mega cell (the first cut of this probe did exactly
  * that — 3·e_0 signal² = 9 vs noise² 2.9 measured 181.7 s at 100×,
  * quadratic in-bucket verify; the operator was fine, the synthetic
  * cell was pathologically LSH-hostile).
  *
  *   sbt "Test/runMain graft.ProbeDensityScale"
  */
object ProbeDensityScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.ensure(spark)
    val baseN = 2000L // = sf0.1 embeddings row count

    // cell 0 (mega): e_0; cell c >= 1: e_a + 2·e_b, (a, b) = c base-40
    def signal(cellC: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column) = {
      val aC = (cellC / 40).cast("int")
      val bC = pmod(cellC, lit(40)).cast("int")
      when(cellC === 0, when(i === 0, lit(1.0)).otherwise(lit(0.0)))
        .otherwise(
          when(i === aC, lit(1.0)).otherwise(lit(0.0)) +
            when(i === bC, lit(2.0)).otherwise(lit(0.0)))
    }

    def corpus(scale: Int) = {
      val nCells = 15 * scale // regular cells; + mega cell 0
      val s = col("id") - when(pmod(col("id"), lit(4)) === 1, 1L).otherwise(0L)
      val cell = when(pmod(s, lit(20)) === 0, 0L)
        .otherwise(pmod(s, lit(nCells.toLong)) + 1)
      spark.range(baseN * scale)
        .select(col("id").as("vec_id"), s.as("_s"), cell.as("_c"))
        .select(col("vec_id"), transform(sequence(lit(0), lit(63)), i =>
          (signal(col("_c"), i) +
            when(i >= 40,
              (pmod(graft.operators.Dedup.portableHash64(
                  (col("_s") * 64 + i).cast("string")), lit(1000L))
                .cast("double") / 1000.0 - 0.5) * 3.0)
              .otherwise(lit(0.0))).cast("float")).as("emb"))
    }

    def centroids(scale: Int) = {
      val nCells = 15 * scale
      spark.range(nCells + 1)
        .select(col("id").cast("int").as("cell"),
          transform(sequence(lit(0), lit(63)),
            i => signal(col("id"), i).cast("float")).as("c_emb"))
    }

    // bits sized to hold mega-cell bucket occupancy ~constant
    // (mega = 5% of corpus: 100 → 2^2 lanes, 1k → 2^5, 10k → 2^8)
    val bitsFor = Map(1 -> 2, 10 -> 5, 100 -> 8)
    // shuffle partitions scale with data, as a real cluster's would
    val shuffleFor = Map(1 -> 32, 10 -> 64, 100 -> 256)
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to 2; scale <- Seq(1, 10, 100)) {
      spark.conf.set("spark.sql.shuffle.partitions", shuffleFor(scale))
      // (a) fused brute-force assignment — O(N·k), quadratic when k ∝ N
      var t0 = System.nanoTime()
      graft.operators.Similarity.semDedupSkewSafe(
          corpus(scale), "vec_id", "emb", centroids(scale),
          minCosine = 0.9, maxCellSize = 50,
          tables = 8, bits = bitsFor(scale), dim = 64)
        .write.format("noop").mode("overwrite").save()
      var sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] pass=$pass scale=$scale brute $sec%.2f s")
      results(s"$scale brute") = sec :: results.getOrElse(s"$scale brute", Nil)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // (b) IVF-routed assignment — O(N·√k) expected, the scale path
      t0 = System.nanoTime()
      graft.operators.Similarity.semDedupSkewSafeAssigned(
          graft.operators.Similarity.assignToCentroidsIvf(
            corpus(scale), "emb", centroids(scale), nprobe = 4),
          "vec_id", "emb",
          minCosine = 0.9, maxCellSize = 50,
          tables = 8, bits = bitsFor(scale), dim = 64)
        .write.format("noop").mode("overwrite").save()
      sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] pass=$pass scale=$scale ivf   $sec%.2f s")
      results(s"$scale ivf") = sec :: results.getOrElse(s"$scale ivf", Nil)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // IVF assignment recall vs brute force at scale 10 (cheap to verify)
    val bruteA = graft.operators.Similarity.assignToCentroids(
        corpus(10), "emb", centroids(10))
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ivfA = graft.operators.Similarity.assignToCentroidsIvf(
        corpus(10), "emb", centroids(10), nprobe = 4)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = ivfA.count { case (v, c) => bruteA(v) == c }
    println(s"[probe] scale=10 ivf assignment agreement: $agree/${bruteA.size}")
    // correctness spot check at scale 1: drops = planted dups that share
    // a cell with their original (always true: same seed ⇒ same cell)
    val out = graft.operators.Similarity.semDedupSkewSafe(
      corpus(1), "vec_id", "emb", centroids(1),
      minCosine = 0.9, maxCellSize = 50, tables = 8, bits = 2, dim = 64)
    val dropped = out.filter(!col("kept")).count()
    val expected = corpus(1).count() / 4
    println(s"[probe] scale=1 dropped=$dropped expected=$expected")
    results.toSeq.sortBy(_._1).foreach { case (tag, ts) =>
      println(f"[probe] MIN $tag min_of_2=${ts.min}%.2f s")
    }
    spark.stop()
  }
}
