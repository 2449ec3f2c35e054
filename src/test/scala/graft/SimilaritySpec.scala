package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: exact values on known vectors") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)), // identical -> 1
      (Seq(1f, 0f), Seq(0f, 1f)), // orthogonal -> 0
      (Seq(1f, 0f), Seq(-1f, 0f)) // opposite -> -1
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(out(0) === 1.0 && out(1) === 0.0 && out(2) === -1.0)
  }

  test("native cosine_sim expression matches the composable form bit-for-bit") {
    graft.GraftExtensions.ensure(spark)
    val emb = queries.Tables.t(spark, sf, "embeddings").limit(200)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") < col("b")).limit(500)
    val diff = pairs.select(
      (Similarity.cosine(col("ea"), col("eb")) =!=
        Similarity.cosineSim(col("ea"), col("eb"))).as("d"))
      .filter(col("d")).count()
    assert(diff === 0)
    // and it resolves from SQL through the registered function
    val viaSql = spark.sql(
      "SELECT cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f))").head().getDouble(0)
    assert(viaSql === 1.0)
  }

  test("topKPerKey returns the exact global top-k without a window sort") {
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "score", "id")
      .repartition(7) // force multiple partial groups
    val top = Similarity.topKPerKey(df, Seq("g"),
        struct((-col("score")).as("ns"), col("id").as("nid")), 3)
      .select(col("topk.nid")).as[Seq[Long]].head()
    assert(top === Seq(100L, 99L, 98L))
  }

  test("bruteForceKnn ranks by cosine desc, excludes self") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0.9f, 0.1f, 0f)), // closest to 0
      (2L, Seq(0.5f, 0.5f, 0f)),
      (3L, Seq(0f, 0f, 1f)) // orthogonal to 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceKnn(
        vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(out === Seq(1L, 2L, 3L))
  }

  test("lshKnn recall >= 0.5 vs brute force on real embeddings") {
    val emb = queries.Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceKnn(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshKnn(q, emb, "vec_id", "embedding", 5,
        tables = 16, bits = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
  }

  test("multiprobe LSH: candidate superset of plain LSH at equal config; " +
      "recall >= plain and >= 0.5 at a quarter of q_ann_lsh's tables") {
    val emb = queries.Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceKnn(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val plain = recallOf(Similarity.lshKnn(q, emb, "vec_id", "embedding", 5,
      tables = 4, bits = 4))
    val multi = recallOf(Similarity.lshKnnMultiprobe(q, emb, "vec_id",
      "embedding", 5, tables = 4, bits = 4))
    // Hamming-1 probes only ADD candidates; exact rerank keeps the best —
    // recall can never drop below the plain form at the same index
    assert(multi >= plain, s"multiprobe $multi < plain $plain")
    assert(multi >= 0.5, s"multiprobe recall $multi too low at 4 tables")
  }

  test("ivfKnn recall >= 0.6 vs brute force (one Lloyd step, 4/16 probes)") {
    val emb = queries.Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceKnn(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfKnn(q, emb, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }

  test("ivfKnnWithCentroids: perfect centroids give exact results") {
    // two well-separated clusters; centroids placed exactly on them ⇒
    // probing 1 cell per query already finds every true neighbor
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0.1f)), (1L, Seq(1f, 0.1f, 0f, 0f)),
      (2L, Seq(0f, 0.1f, 1f, 0f)), (3L, Seq(0f, 0f, 1f, 0.1f))
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 0f))
    ).toDF("cell", "c_emb")
    val got = Similarity.ivfKnnWithCentroids(
        vecs, vecs, "vec_id", "embedding", k = 1, centroids, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 1L, 1L -> 0L, 2L -> 3L, 3L -> 2L))
  }

  test("quantizeInt8: max component maps to ±127, zero vector to zeros") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), // max |x| = 1.0 ⇒ scale 127
      (2L, Seq(0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, "embedding")
      .select("vec_id", "q_emb").as[(Long, Seq[Int])].collect().toMap
    assert(q(1L) === Seq(64, -127, 32)) // floor(63.5+0.5), floor(-126.5), floor(32.25)
    assert(q(2L) === Seq(0, 0, 0))
  }

  test("pqEncode: codes are valid, m per vector, deterministic") {
    val emb = queries.Tables.t(spark, sf, "embeddings")
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 8, numCodes = 16, dim = 64)
    assert(cb.count() === 8 * 16)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb, m = 8, dim = 64)
      .as[(Long, Int, Int)].collect()
    val n = emb.count()
    assert(codes.length === n * 8)           // m codes per vector
    assert(codes.forall { case (_, s, c) => s >= 0 && s < 8 && c >= 0 && c < 16 })
    val again = Similarity.pqEncode(emb, "vec_id", "embedding", cb, 8, 64)
      .as[(Long, Int, Int)].collect()
    assert(again.toSet === codes.toSet)      // pure function of the data
    // the quantizer actually discriminates: every subspace uses >1 code
    val codesPerSub = codes.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size)
    assert(codesPerSub.values.forall(_ > 1), s"degenerate subspace: $codesPerSub")
  }

  test("PQ: raw ADC beats chance; ADC pool + exact rerank recalls >= 0.7") {
    val emb = queries.Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    // exact squared-L2 top-5 per query (small cross join, test-only)
    val exact = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("d", Similarity.sqDist(col("qv"), col("nv")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number.over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d"), col("neighbor_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // raw ADC ranking: coarse (16 codes/subspace) but far above chance
    // (random 5 of 500 ⇒ ~0.01)
    val adc = Similarity.pqTopK(q, emb, "vec_id", "embedding", k = 5,
        m = 8, numCodes = 16, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adcRecall = (exact & adc).size.toDouble / exact.size
    assert(adcRecall >= 0.15, s"raw ADC recall $adcRecall too low")
    // the production pipeline: ADC pool (10x oversample) + exact rerank
    val reranked = Similarity.pqTopKReranked(q, emb, "vec_id", "embedding",
        k = 5, oversample = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & reranked).size.toDouble / exact.size
    assert(recall >= 0.7, s"PQ+rerank recall $recall too low")
  }

  test("IVF-PQ: probed-cell ADC pool + exact rerank recall vs brute force") {
    val emb = queries.Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("d", Similarity.sqDist(col("qv"), col("nv")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number.over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d"), col("neighbor_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // real coarse quantizer (trained k-means), residual PQ, 4/16 probes —
    // recall is bounded above by IVF's probe hit rate (~0.6 floor at these
    // parameters); the residual-coded pool + rerank must not fall far
    // below it
    val cents = Similarity.kMeansCentroids(emb, "vec_id", "embedding",
      k = 16, iters = 3)
    val got = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", k = 5,
        centroids = cents, nprobe = 4, oversample = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall too low")
  }

  test("seeded corpus: LSH, IVF, and PQ all EQUAL brute force (the oracle construction)") {
    // sf0.01: 500 vectors / 16 cells ≈ 31 per cell. The proof's premise is
    // "every cell holds ≥ k+1 vectors" — true at every shipped sf (500
    // vectors at sf0.001/sf0.01, 2000 at sf0.1); pin at the driver's gate
    // scale
    val d = "/root/testdata/sf0.01"
    val se = queries.SimilarityQueries.seededCorpus(spark, d)
    val q = se.filter(col("vec_id") < 20)

    val cosTruth = Similarity.bruteForceKnn(q, se, "vec_id", "emb", k = 5)
      .as[(Long, Int, Long)].collect().toSet
    val lsh = Similarity.lshKnn(q, se, "vec_id", "emb", k = 5, tables = 16, bits = 4)
      .as[(Long, Int, Long)].collect().toSet
    val ivf = Similarity.ivfKnnWithCentroids(q, se, "vec_id", "emb", k = 5,
        centroids = queries.SimilarityQueries.seededCentroids(spark), nprobe = 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(lsh === cosTruth, "seeded LSH must equal brute-force cosine top-k")
    assert(ivf === cosTruth, "seeded IVF must equal brute-force cosine top-k")

    // PQ reranks by exact squared-L2 — its ground truth is the L2 top-k
    val scored = se.select(col("vec_id").as("neighbor_id"), col("emb").as("c_emb"))
      .join(broadcast(q.select(col("vec_id").as("query_id"), col("emb").as("q_emb"))),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("d", Similarity.sqDist(col("q_emb"), col("c_emb")))
    val l2Truth = Similarity.topKPerKey(
        scored.select(col("query_id"), col("d"), col("neighbor_id")),
        Seq("query_id"), struct(col("d"), col("neighbor_id").as("nid")), 5)
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("col.nid").as("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet
    val pq = Similarity.pqTopKReranked(q, se, "vec_id", "emb", k = 5)
      .as[(Long, Int, Long)].collect().toSet
    assert(pq === l2Truth, "seeded PQ (ADC + rerank) must equal brute-force L2 top-k")
  }

  test("k-means on the seeded corpus recovers the planted cells and is a fixed point") {
    val se = queries.SimilarityQueries.seededCorpus(spark, sf)
    val cents = Similarity.kMeansCentroids(se, "vec_id", "emb", k = 16, iters = 2)
    // every vector lands in its own one-hot cell (cluster i == vec_id % 16)
    val wrong = Similarity.assignToCentroids(se, "emb", cents)
      .filter(col("cell") =!= col("vec_id") % 16).count()
    assert(wrong === 0)
    // Lloyd's has converged: one more iteration moves nothing
    def m(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Seq[Float])].collect().toMap
    val more = Similarity.kMeansCentroids(se, "vec_id", "emb", k = 16, iters = 3)
    assert(m(cents) === m(more))
  }

  test("k-means keeps empty cells' centroids; output always k rows") {
    // all three vectors identical -> everything assigns to cell 0 (tie
    // breaks to the smallest cell), cell 1 never wins and keeps its seed
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kMeansCentroids(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Int, Seq[Float])].collect().toMap
    assert(cents.keySet === Set(0, 1))
    assert(cents(0) === Seq(1f, 0f) && cents(1) === Seq(1f, 0f))
  }

  test("embeddingNearDups finds planted high-cosine pairs only") {
    val vecs = Seq(
      (0L, Seq(1f, 0.01f, 0f, 0f)),
      (1L, Seq(1f, 0.02f, 0f, 0f)), // ~identical to 0
      (2L, Seq(0f, 0f, 1f, 0.5f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(vecs, "vec_id", "embedding",
        minCosine = 0.99, tables = 8, bits = 4, dim = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("semDedup keeps the min id of each within-cluster duplicate group") {
    // two clusters along axes 0 and 1; ids 0,1,2 are near-identical in
    // cluster 0 (min id 0 survives), ids 10,11 near-identical in cluster 1
    // (10 survives), id 3 sits in cluster 0 but far from the dup group
    val vecs = Seq(
      (0L,  Seq(1f, 0f, 0.01f, 0f)),
      (1L,  Seq(1f, 0f, 0.02f, 0f)),
      (2L,  Seq(1f, 0f, 0.03f, 0f)),
      (3L,  Seq(0.6f, 0.1f, -0.75f, 0f)), // cluster 0, cosine ~0.6 to the group
      (10L, Seq(0f, 1f, 0f, 0.01f)),
      (11L, Seq(0f, 1f, 0f, 0.02f))
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (0, Seq(1f, 0f, 0f, 0f)), (1, Seq(0f, 1f, 0f, 0f))
    ).toDF("cell", "c_emb")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", cents, minCosine = 0.95)
      .as[(Long, Int, Boolean)].collect().toSet
    assert(out === Set(
      (0L, 0, true), (1L, 0, false), (2L, 0, false),
      (3L, 0, true), (10L, 1, true), (11L, 1, false)))
  }

  test("semDedup never pairs across clusters even above the threshold") {
    // identical vectors forced into different cells by degenerate
    // centroids equal to the ids' own positions? No — same vector always
    // lands in one cell. Instead: two near-identical vectors whose tiny
    // difference flips the argmin between two near-equidistant centroids.
    val vecs = Seq(
      (0L, Seq(0.51f, 0.49f)),
      (1L, Seq(0.49f, 0.51f)) // cosine ~0.9992 with id 0, different cell
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (0, Seq(1f, 0f)), (1, Seq(0f, 1f))
    ).toDF("cell", "c_emb")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", cents, minCosine = 0.99)
      .as[(Long, Int, Boolean)].collect().toSet
    // both kept: the cluster partition hides the cross-cell pair (the
    // documented SemDeDup approximation)
    assert(out === Set((0L, 0, true), (1L, 1, true)))
  }

  test("semDedupSkewSafe equals semDedup with a planted mega-cell (both paths exact)") {
    // cell 0 is the mega-cell (24 vectors > maxCellSize=10 → LSH route):
    // three exact-duplicate groups of 8, group directions mutually below
    // the 0.95 threshold (cos ≈ 0.835/0.904). Identical vectors share
    // EVERY hyperplane bucket, so in-cell LSH finds every qualifying pair
    // — both paths are exact and must agree bit-for-bit. Cell 1 stays
    // under the threshold → the small path, pinned identical to semDedup.
    val g1 = Seq(1f, 0.3f, 0f, 0f, 0f, 0f, 0f, 0f)
    val g2 = Seq(1f, -0.3f, 0f, 0f, 0f, 0f, 0f, 0f)
    val g3 = Seq(1f, 0f, 0.35f, 0f, 0f, 0f, 0f, 0f)
    val d1 = Seq(0f, 0f, 0f, 0f, 1f, 0.2f, 0f, 0f)
    val s1 = Seq(0f, 0f, 0f, 0f, 1f, -0.6f, 0f, 0f)
    val vecs = (
      (1L to 8L).map(i => (i, g1)) ++ (9L to 16L).map(i => (i, g2)) ++
        (17L to 24L).map(i => (i, g3)) ++
        Seq((30L, d1), (31L, d1), (32L, s1))
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (0, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1, Seq(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f))
    ).toDF("cell", "c_emb")
    val exact = Similarity.semDedup(vecs, "vec_id", "embedding", cents, 0.95)
      .as[(Long, Int, Boolean)].collect().toSet
    val safe = Similarity.semDedupSkewSafe(vecs, "vec_id", "embedding", cents,
        0.95, maxCellSize = 10, tables = 8, bits = 2, dim = 8)
      .as[(Long, Int, Boolean)].collect().toSet
    assert(safe === exact, "skew-safe must agree with the quadratic path")
    // sanity on the content: min id of each duplicate group survives
    val kept = safe.filter(_._3).map(_._1)
    assert(kept === Set(1L, 9L, 17L, 30L, 32L))
  }

  test("semDedupSkewSafe with no oversized cells IS semDedup (small path bit-identical)") {
    val se = queries.SimilarityQueries.seededCorpus(spark, sf)
    val cents = Similarity.kMeansCentroids(se, "vec_id", "emb", k = 16, iters = 1)
    val a = Similarity.semDedup(se, "vec_id", "emb", cents, minCosine = 0.9)
      .as[(Long, Int, Boolean)].collect().toSet
    val b = Similarity.semDedupSkewSafe(se, "vec_id", "emb", cents,
        minCosine = 0.9, maxCellSize = 1L << 20)
      .as[(Long, Int, Boolean)].collect().toSet
    assert(b === a)
  }

  test("semDedup drop set matches exactNearDupPairs restricted to same-cell pairs") {
    val se = queries.SimilarityQueries.seededCorpus(spark, sf)
    val cents = Similarity.kMeansCentroids(se, "vec_id", "emb", k = 16, iters = 1)
    val out = Similarity.semDedup(se, "vec_id", "emb", cents, minCosine = 0.9)
    val cellOf = out.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val dropped = out.filter(!col("kept")).select("vec_id").as[Long].collect().toSet
    val allPairs = Similarity.exactNearDupPairs(se, "vec_id", "emb", minCosine = 0.9)
      .as[(Long, Long)].collect()
    val expectDropped = allPairs
      .filter { case (a, b) => cellOf(a) == cellOf(b) }.map(_._2).toSet
    assert(dropped === expectDropped)
    assert(dropped.nonEmpty, "seeded corpus must contain same-cell near-dups at 0.9")
  }

  test("assignToCentroidsIvf: exhaustive probing EQUALS brute force; default nprobe recalls the planted cells") {
    // 60 centroids (one-hot pairs over 64 dims), corpus points = their
    // centroid + small noise — the density-scaled assignment setting
    // where brute force is O(N·k)
    val cents = spark.range(60).select(col("id").cast("int").as("cell"),
      transform(sequence(lit(0), lit(63)), i =>
        (when(i === pmod(col("id"), lit(16)), lit(1.0)).otherwise(lit(0.0)) +
          when(i === pmod(col("id"), lit(13)) + 16, lit(2.0)).otherwise(lit(0.0)))
          .cast("float")).as("c_emb"))
    val corpus = spark.range(600).select(col("id").as("vec_id"),
      pmod(col("id"), lit(60)).cast("int").as("_pc"))
      .select(col("vec_id"), col("_pc"), transform(sequence(lit(0), lit(63)), i =>
        (when(i === pmod(col("_pc"), lit(16)), lit(1.0)).otherwise(lit(0.0)) +
          when(i === pmod(col("_pc"), lit(13)) + 16, lit(2.0)).otherwise(lit(0.0)) +
          when(i >= 32,
            (pmod(graft.operators.Dedup.portableHash64(
                (col("vec_id") * 64 + i).cast("string")), lit(1000L))
              .cast("double") / 1000.0 - 0.5) * 0.2)
            .otherwise(lit(0.0))).cast("float")).as("emb"))
    val brute = Similarity.assignToCentroids(
        corpus.select("vec_id", "emb"), "emb", cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    // noise amplitude 0.1 << the >= 1.0 inter-centroid gap: planted = true
    brute.foreach { case (v, c) => assert(c === (v % 60).toInt) }
    // exhaustive probing (nprobe >= groups) must equal brute force exactly
    val exhaustive = Similarity.assignToCentroidsIvf(
        corpus.select("vec_id", "emb"), "emb", cents,
        nprobe = 60, groups = 8)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(exhaustive === brute, "nprobe >= groups must be exact")
    // small nprobe: standard IVF recall contract — measure, don't guess
    val ivf = Similarity.assignToCentroidsIvf(
        corpus.select("vec_id", "emb"), "emb", cents, nprobe = 4)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val agree = ivf.count { case (v, c) => brute(v) == c }
    assert(agree >= 540, s"expected >= 90% assignment recall, got $agree/600")
    // determinism: second run bit-identical
    val again = Similarity.assignToCentroidsIvf(
        corpus.select("vec_id", "emb"), "emb", cents, nprobe = 4)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(again === ivf)
    // sharded fine level ≡ the monolithic map form, assignment-for-
    // assignment — at EXHAUSTIVE probing and at small nprobe (same
    // deterministic group k-means → same routing, so the only degree of
    // freedom is the fine-level fold, which must not change a single
    // cell). This index is tiny, so the default-dispatch results above
    // exercised the map form; shardBytes = 0 forces the sharded plan.
    val shardEx = Similarity.assignToCentroidsIvf(
        corpus.select("vec_id", "emb"), "emb", cents, nprobe = 60, groups = 8,
        shardBytes = 0L)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(shardEx === exhaustive,
      "sharded and monolithic must agree under exhaustive probing")
    val shard4 = Similarity.assignToCentroidsIvf(
        corpus.select("vec_id", "emb"), "emb", cents, nprobe = 4,
        shardBytes = 0L)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(shard4 === ivf,
      "sharded and monolithic must agree at small nprobe")
  }

  test("embedDecontaminate: planted hits counted exactly; empty benchmark keeps everything; streams statelessly") {
    // benchmark: e_x and e_y; corpus: near-e_x (1 hit), between x and y
    // at ~0.707 each (2 hits), orthogonal e_z (0 hits)
    val bench = Seq((900L, Seq(1f, 0f, 0f)), (901L, Seq(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.99f, 0.1f, 0f)), // cos vs x ≈ 0.995 → 1 hit
      (2L, Seq(1f, 1f, 0f)),      // cos ≈ 0.707 vs both → 2 hits
      (3L, Seq(0f, 0f, 1f)))      // orthogonal → 0 hits
      .toDF("vec_id", "embedding")
    val got = Similarity.embedDecontaminate(
        corpus, "vec_id", "embedding", bench, "embedding", minCosine = 0.6)
      .select("vec_id", "n_hits", "kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 1L, false), (2L, 2L, false), (3L, 0L, true)))
    // empty benchmark: nothing is contaminated, not a failure
    val none = Similarity.embedDecontaminate(corpus, "vec_id", "embedding",
        bench.filter(col("vec_id") < 0), "embedding", minCosine = 0.6)
      .select("vec_id", "n_hits", "kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(none === Set((1L, 0L, true), (2L, 0L, true), (3L, 0L, true)))
    // a benchmark past the pack byte ceiling REFUSES loudly (the
    // single-object-broadcast discipline) instead of building the row
    val tooBig = intercept[IllegalArgumentException] {
      Similarity.embedDecontaminate(corpus, "vec_id", "embedding",
        bench, "embedding", minCosine = 0.6, maxPackBytes = 8L)
    }
    assert(tooBig.getMessage.contains("ceiling"))
    // stateless on a streaming frame: the benchmark pack is a static
    // broadcast side — arriving vectors flag at the door
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark)
    val out = Similarity.embedDecontaminate(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      bench, "embedding", minCosine = 0.6)
    assert(out.isStreaming, "decontamination must stream without state")
    val q = out.select("vec_id", "n_hits", "kept").writeStream
      .format("memory").queryName("embed_decon_sink").outputMode("append").start()
    try {
      mem.addData((1L, Seq(0.99f, 0.1f, 0f)), (3L, Seq(0f, 0f, 1f)))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("embed_decon_sink")
      .as[(Long, Long, Boolean)].collect().toSet ===
      Set((1L, 1L, false), (3L, 0L, true)))
  }

  test("embedDecontaminateBucketed: exhaustive probing equals the broadcast form; misses only lose hits; empty benchmark keeps everything") {
    // the bench query's own data and split, so the pin covers the
    // oracled configuration exactly
    val e = queries.Tables.t(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") >= 100).select("vec_id", "embedding")
    val bench = e.filter(col("vec_id") < 100)
    val exact = Similarity.embedDecontaminate(corpus, "vec_id", "embedding",
        bench, "embedding", minCosine = 0.45)
      .select("vec_id", "n_hits", "kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(exact.exists(!_._3), "split must have real hits for the pin to bite")
    val bucketedEx = Similarity.embedDecontaminateBucketed(
        corpus, "vec_id", "embedding", bench, "vec_id", "embedding",
        minCosine = 0.45, nprobe = 10, groups = 10)
      .select("vec_id", "n_hits", "kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(bucketedEx === exact,
      "exhaustive probing must equal the one-object exact form")
    // small nprobe: the IVF recall trade loses hits, never invents them —
    // per-vector counts are bounded by the exact count
    val exactMap = exact.map(r => r._1 -> r._2).toMap
    val probed2 = Similarity.embedDecontaminateBucketed(
        corpus, "vec_id", "embedding", bench, "vec_id", "embedding",
        minCosine = 0.45, nprobe = 2, groups = 10)
      .select("vec_id", "n_hits").as[(Long, Long)].collect()
    assert(probed2.length === exactMap.size)
    probed2.foreach { case (id, h) =>
      assert(h <= exactMap(id), s"vec $id: probed count $h above exact") }
    // empty benchmark: nothing is contaminated, not a failure
    val none = Similarity.embedDecontaminateBucketed(
        corpus.limit(3), "vec_id", "embedding",
        bench.filter(col("vec_id") < 0), "vec_id", "embedding",
        minCosine = 0.45, nprobe = 4)
      .select("n_hits", "kept").as[(Long, Boolean)].collect()
    assert(none.forall(r => r._1 == 0L && r._2))
    // stateless on a streaming frame: the group index builds once from
    // the static benchmark (k-means + packs are checkpointed statics)
    // and arriving vectors ride the same per-slot stream-static
    // broadcast joins — the at-the-door deployment, like the broadcast
    // form
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark)
    val out = Similarity.embedDecontaminateBucketed(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      bench, "vec_id", "embedding", minCosine = 0.45,
      nprobe = 10, groups = 10)
    assert(out.isStreaming, "bucketed decontamination must stream without state")
    val streamIds = corpus.limit(40).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val q = out.select("vec_id", "n_hits", "kept").writeStream
      .format("memory").queryName("embed_bd_sink").outputMode("append").start()
    try {
      mem.addData(streamIds.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("embed_bd_sink")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(streamed === exact.filter(r => streamIds.map(_._1).contains(r._1)),
      "streamed verdicts must equal the exhaustive batch form")
    // plan-depth guard: one broadcast join per probe slot means large
    // nprobe is an analysis/codegen blowup, not a data cost — refuse
    // loudly and point at the exact alternatives instead of hanging
    val deep = intercept[IllegalArgumentException] {
      Similarity.embedDecontaminateBucketed(
        corpus, "vec_id", "embedding", bench, "vec_id", "embedding",
        minCosine = 0.45, nprobe = 316)
    }
    assert(deep.getMessage.contains("maxProbeJoins"))
    assert(deep.getMessage.contains("embedDecontaminate"))
  }

  test("embedDecontaminateSharded: exact at any shard count, empty benchmark keeps everything") {
    val e = queries.Tables.t(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") >= 100).select("vec_id", "embedding")
    val bench = e.filter(col("vec_id") < 100)
    val exact = Similarity.embedDecontaminate(corpus, "vec_id", "embedding",
        bench, "embedding", minCosine = 0.45)
      .select("vec_id", "n_hits", "kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(exact.exists(!_._3), "split must have real hits for the pin to bite")
    // hash sharding carries no geometry: EVERY shard count gives the
    // one-object exact verdict (1 = degenerate single pack, 3 = uneven
    // shards, 10 = the oracled configuration)
    for (sh <- Seq(1, 3, 10)) {
      val got = Similarity.embedDecontaminateSharded(corpus, "vec_id",
          "embedding", bench, "vec_id", "embedding", minCosine = 0.45,
          shards = sh)
        .select("vec_id", "n_hits", "kept")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got === exact, s"shards=$sh must equal the one-object exact form")
    }
    // empty benchmark: nothing is contaminated, not a failure
    val none = Similarity.embedDecontaminateSharded(corpus.limit(3), "vec_id",
        "embedding", bench.filter(col("vec_id") < 0), "vec_id", "embedding",
        minCosine = 0.45)
      .select("n_hits", "kept").as[(Long, Boolean)].collect()
    assert(none.length === 3)
    assert(none.forall(r => r._1 == 0L && r._2))
  }

  test("semDedupSkewSafeAssigned composes: pre-assigned frame gives the same dedup as the fused form") {
    val se = queries.SimilarityQueries.seededCorpus(spark, sf)
    val cents = Similarity.kMeansCentroids(se, "vec_id", "emb", k = 16, iters = 1)
    val fused = Similarity.semDedupSkewSafe(se, "vec_id", "emb", cents,
        minCosine = 0.9, maxCellSize = 10, dim = 64)
      .as[(Long, Int, Boolean)].collect().toSet
    val assigned = Similarity.assignToCentroids(
      se.select("vec_id", "emb"), "emb", cents)
    val split = Similarity.semDedupSkewSafeAssigned(
        assigned, "vec_id", "emb", minCosine = 0.9, maxCellSize = 10, dim = 64)
      .as[(Long, Int, Boolean)].collect().toSet
    assert(split === fused)
    assert(split.exists(!_._3), "the seeded corpus must drop something")
  }

  test("hardNegatives: same-label near-dup excluded, nearest other-label wins") {
    // anchor 1 (label 0) at e_x; vector 2 is nearly identical but SAME
    // label → must never appear; 3 (label 1) is the true hard negative;
    // 4 (label 1) is orthogonal → rank 2
    val rows = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.99f, 0.1f), 0),
      (3L, Seq(0.9f, 0.4f), 1),
      (4L, Seq(0f, 1f), 1))
      .toDF("vec_id", "emb", "label")
    val got = Similarity.hardNegatives(
        rows.filter(col("vec_id") === 1), rows, "vec_id", "emb", "label", k = 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 1, 3L), (1L, 2, 4L)))
  }
}
