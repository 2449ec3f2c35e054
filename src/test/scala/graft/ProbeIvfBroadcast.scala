package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Broadcast-object scale probe for `assignToCentroidsIvf` (VERDICT r9
  * task 1): the pre-round-10 fine level collapsed ALL k member centroids
  * into ONE group→members map row — a single broadcast object of
  * O(k·d) bytes that crosses ~100 MB long before compute hurts and hits
  * Spark's 2 GiB single-object limit at exactly the k ∝ N regime the
  * operator was built for. The sharded form broadcasts one packed row
  * PER coarse group (≈ k/√k members each), so the largest single object
  * is O(k·d/√k) — this probe grows the INDEX BYTES k·d until the map
  * form's blob passes 100 MB and shows (a) the monolithic single-row
  * payload growing linearly with k·d while the sharded max-row payload
  * grows only with (k/√k)·d, and (b) the sharded form's runtime staying
  * on the same curve as the monolithic one (the shard is a memory fix,
  * not a compute trade: identical flops, one reused broadcast).
  *
  * Geometry: wide embeddings (d = 8192 — large-model hidden states),
  * k = 1024 → 4096 centroids, i.e. 34 MB → 134 MB of index. The blob
  * bound is k·d·4 bytes regardless of group count, while every stage's
  * flops carry a k·√k·d (index prep) or n·√k·d (probe) factor — so the
  * probe puts the bytes in d, not k, and crosses 100 MB in minutes, not
  * hours, of Catalyst lambda time (a first cut at d = 256, k = 131072
  * was the same bytes but 24 GFlop of index prep per timed run). The
  * corpus is small and fixed (500 rows): broadcast cost is
  * per-executor, independent of n — the probe times index pressure, not
  * corpus growth. Centroids are unit-ish hash noise so the group
  * k-means has real work. Single pass by default (SPARK_GRAFT_PASSES=2
  * for min_of_2): the compared quantity is a ~2× mono-vs-shard delta at
  * the same k in the same heap minutes apart, an order of magnitude
  * above the one-sided disk-drift envelope that motivates min_of_2 on
  * absolute rows.
  *
  * Each (form, k) point should run in its OWN JVM: a task-thread
  * OutOfMemoryError trips Spark's uncaught-exception handler and kills
  * the process, so a mono OOM inside a combined run would take the
  * shard measurements down with it — and the mono form DOES OOM the
  * build's 8 GiB forked-JVM default heap at the 134 MB point (measured;
  * the shard form completes there in the same heap, which is the
  * probe's thesis, and the mono form given SPARK_DRIVER_MEM=32g is
  * STILL 1.4× slower than the shard in a quarter of the memory).
  *
  *   sbt "Test/runMain graft.ProbeIvfBroadcast <mono|shard|both> <k,k,...>"
  */
object ProbeIvfBroadcast {
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
    // SPARK_GRAFT_PROBE_D narrows the vectors to place points near the
    // shardBytes dispatch default (d=1024: k=512 → 2 MB, k=1024 → 4 MB)
    val d = sys.env.getOrElse("SPARK_GRAFT_PROBE_D", "8192").toInt
    // SPARK_GRAFT_PROBE_N grows the CORPUS (the k ∝ N regime's left
    // side): the default 500 keeps the original index-pressure-only
    // geometry; the round-11 corpus-scale rows run 500→50000 at a fixed
    // sharded-route index to show the probe-slot joins stay flat when
    // the left side is no longer trivial
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "500").toLong

    def noiseVec(seed: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(d - 1)), i =>
        ((pmod(graft.operators.Dedup.portableHash64(
            (seed * d + i).cast("string")), lit(1000L))
          .cast("double") / 1000.0) - 0.5).cast("float"))

    val corpus = spark.range(n)
      .select(col("id").as("vec_id"), noiseVec(col("id")).as("emb"))
      .localCheckpoint(true) // identical input rows for every timed point
    val corpusIds = spark.sparkContext.getPersistentRDDs.keySet

    def centroids(k: Long) = spark.range(k)
      .select(col("id").cast("int").as("cell"),
        noiseVec(col("id") + 1000000L).as("c_emb"))

    val formWanted = args.headOption.getOrElse("both")
    val ks = if (args.length > 1) args(1).split(",").map(_.toLong).toSeq
      else Seq(1024L, 4096L)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "1").toInt
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to passes; k <- ks) {
      val cents = centroids(k).localCheckpoint(true)
      val g = math.ceil(math.sqrt(k.toDouble)).toLong
      val mapMb = k * d * 4 / 1e6          // monolithic single-row floats
      val shardMb = (k / g + 1) * d * 4 / 1e6 // ~largest per-group row
      println(f"[probe] pass=$pass k=$k map-row=$mapMb%.0f MB " +
        f"max-shard-row=$shardMb%.1f MB")
      // probe inputs stay pinned; everything the runs checkpoint
      // (ivfIndex's reps/members/groupPacks) is released between points
      val keepIds = spark.sparkContext.getPersistentRDDs.keySet
      for ((tag, run) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "mono " -> (() => graft.operators.Similarity
          .assignToCentroidsIvfMonolithic(corpus, "emb", cents, nprobe = 4)),
        "shard" -> (() => graft.operators.Similarity
          .assignToCentroidsIvf(corpus, "emb", cents, nprobe = 4,
            shardBytes = 0L)))
        if formWanted == "both" || formWanted == tag.trim) {
        val t0 = System.nanoTime()
        if (sys.env.get("SPARK_GRAFT_PROBE_REUSE").contains("1")) {
          // collect()-driven execution so the FINAL adaptive plan is
          // inspectable: confirms the nprobe probe-slot right sides
          // still collapse to ReusedExchange under AQE when the corpus
          // side is real (df.write runs a different QueryExecution — the
          // PlanShapeSpec lesson)
          val df = run()
          df.collect()
          val fp = df.queryExecution.executedPlan.toString
          println(s"[probe] pass=$pass k=$k n=$n $tag " +
            s"reusedExchange=${"ReusedExchange".r.findAllMatchIn(fp).size} " +
            s"final=${fp.contains("isFinalPlan=true")}")
        } else run().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] pass=$pass k=$k n=$n $tag $sec%.2f s")
        results(f"k=$k%5d $tag") =
          sec :: results.getOrElse(f"k=$k%5d $tag", Nil)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs
          .filterNot(e => keepIds.contains(e._1))
          .values.foreach(_.unpersist(true))
      }
      // same assignments, point for point (the probe is also an
      // equality check at a k·d far beyond the spec's 60-centroid pin)
      if (pass == 1 && k == 1024L && formWanted == "both") {
        val mism = graft.operators.Similarity
          .assignToCentroidsIvf(corpus, "emb", cents, nprobe = 4,
            shardBytes = 0L)
          .select(col("vec_id"), col("cell").as("c1"))
          .join(graft.operators.Similarity
            .assignToCentroidsIvfMonolithic(corpus, "emb", cents, nprobe = 4)
            .select(col("vec_id"), col("cell").as("c2")), "vec_id")
          .filter(col("c1") =!= col("c2")).count()
        println(s"[probe] k=$k shard-vs-mono mismatches: $mism (want 0)")
      }
      // release this point's pinned centroid table (and anything else
      // the equality check checkpointed) before the next point
      spark.sparkContext.getPersistentRDDs
        .filterNot(e => corpusIds.contains(e._1))
        .values.foreach(_.unpersist(true))
    }
    results.toSeq.sortBy(_._1).foreach { case (tag, ts) =>
      println(f"[probe] MIN $tag min_of_$passes=${ts.min}%.2f s")
    }
    spark.stop()
  }
}
