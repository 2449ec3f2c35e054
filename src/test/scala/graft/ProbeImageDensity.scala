package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Density-preserving scale probe for [[graft.operators.Multimodal.imageNearDupPairs]]
  * (round 13): the standing BENCH_100x row replicates the q_image_neardup
  * corpus, whose closed-form pixel pattern has a PERIOD of 768 images
  * (w has 24 values, h 16, the pixel byte 256 — lcm over sequential
  * ids = 768), so duplicate-class sizes grow ∝ N and the Hamming-0
  * pair OUTPUT grows ∝ N² — a synthetic-density artifact of the
  * oracle-able generator, not an operator property. This probe
  * demonstrates that by running the same operator over two corpora of
  * identical size, dims distribution, and planted-dup fraction:
  *
  *   - `fixed`: pixel seed folded mod 768 — the standing row's
  *     bounded pattern space; classes grow linearly, pairs
  *     quadratically;
  *   - `distinct`: pixel seed through a 64-bit mix (splitmix64
  *     increment) — every image distinct except 20% planted exact
  *     duplicates (seed s = id−(id%5==1), the ProbeDensityScale
  *     recipe), the shape a real corpus has: duplicate-class size
  *     scale-INVARIANT, signatures spread over the 4×16-bit band
  *     blocks, candidate work ~N²/2^16 per band with a tiny constant.
  *
  * The probe's BMP writer is the public DIB layout of
  * [[graft.operators.Multimodal.encodeBmpGray]] with the pixel byte as a
  * parameter — no oracle runs here (q_image_neardup carries the
  * closed-form correctness), so the pixel function only needs
  * controllable distinctness, not closed-form SQL.
  *
  *   sbt "Test/runMain graft.ProbeImageDensity"
  */
object ProbeImageDensity {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val baseN = 5000L // = sf0.1 documents row count

    // 24-bit gray BMP, the encodeBmpGray layout, pixel byte = f(seed, idx)
    def bmp(w: Int, h: Int, px: Int => Int): Array[Byte] = {
      val rowBytes = (w * 3 + 3) / 4 * 4
      val b = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
        .putShort(0).putShort(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(rowBytes * h)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var fy = 0
      while (fy < h) {
        val y = h - 1 - fy
        var x = 0
        while (x < w) {
          val v = px(y * w + x)
          b.put(v.toByte).put(v.toByte).put(v.toByte)
          x += 1
        }
        var pad = w * 3
        while (pad < rowBytes) { b.put(0.toByte); pad += 1 }
        fy += 1
      }
      b.array()
    }

    // seed s = id − (id%5==1): ids ≡ 1 (mod 5) duplicate their
    // predecessor byte-exactly — 20% planted dup pairs at every scale
    def corpus(scale: Int, patternSpace: Long): DataFrame =
      spark.range(baseN * scale)
        .select(col("id"),
          (col("id") - when(pmod(col("id"), lit(5)) === 1, 1L)
            .otherwise(0L)).as("s"))
        .as[(Long, Long)]
        .mapPartitions { rows =>
          rows.map { case (id, s) =>
            val w = (9 + s % 24).toInt
            val h = (8 + s % 16).toInt
            val seed = s % patternSpace
            // splitmix64-style mix: distinct seeds → unrelated pixels
            val px = (i: Int) => {
              val z0 = (seed * 0x9E3779B97F4A7C15L) + i * 0xBF58476D1CE4E5B9L
              val z1 = (z0 ^ (z0 >>> 30)) * 0x94D049BB133111EBL
              (((z1 ^ (z1 >>> 31)) >>> 8) & 0xff).toInt
            }
            (id, "image/bmp", bmp(w, h, px))
          }
        }.toDF("media_id", "kind", "payload")

    val shuffleFor = Map(1 -> 32, 10 -> 64, 100 -> 256)
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to 2; scale <- Seq(1, 10, 100)) {
      spark.conf.set("spark.sql.shuffle.partitions", shuffleFor(scale))
      for ((tag, space) <- Seq("fixed" -> 768L, "distinct" -> Long.MaxValue)) {
        val t0 = System.nanoTime()
        graft.operators.Multimodal
          .imageNearDupPairs(corpus(scale, space), maxHamming = 3, bands = 4)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] pass=$pass scale=$scale $tag%-8s $sec%.2f s")
        results(s"$scale $tag") = sec :: results.getOrElse(s"$scale $tag", Nil)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
    }
    // pair-population check at scale 1: every planted dup surfaces at
    // Hamming 0 in the distinct arm (the fixed arm's classes subsume them)
    val pairs = graft.operators.Multimodal
      .imageNearDupPairs(corpus(1, Long.MaxValue), maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect()
    val planted = (0L until baseN).count(_ % 5 == 1)
    val zeroHam = pairs.count(_._3 == 0)
    println(s"[probe] scale=1 distinct: pairs=${pairs.length} " +
      s"hamming0=$zeroHam planted=$planted")
    results.toSeq.sortBy(_._1).foreach { case (tag, ts) =>
      println(f"[probe] min $tag%-12s ${ts.min}%.2f s")
    }
    spark.stop()
  }
}
