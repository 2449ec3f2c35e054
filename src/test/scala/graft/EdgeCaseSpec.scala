package graft

import org.apache.spark.sql.functions._

import graft.dsl.{KGlobalTable, KStream}
import graft.operators.{Dedup, Similarity}
import graft.state.Upserts

/** Degenerate inputs: empty frames, single rows, all-duplicate corpora —
  * the shapes that surface accidental head()/assumption bugs.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup operators on an empty corpus return empty, not errors") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.nearDupPairs(emptyDocs, "doc_id", "text", 3, 4, 5).count() === 0)
    assert(Dedup.simHashAgg(emptyDocs, "doc_id", Dedup.tokenSet(col("text"))).count() === 0)
    assert(Dedup.dupSpans(emptyDocs, "doc_id", "text", 3).count() === 0)
  }

  test("dupSpans: docs shorter than n and all-unique corpora yield no spans") {
    val docs = Seq(
      (1L, "a b"),                 // shorter than n=3: no windows at all
      (2L, "x y z w"),             // unique grams only
      (3L, "p q r s")).toDF("doc_id", "text")
    assert(Dedup.dupSpans(docs, "doc_id", "text", 3).count() === 0)
    // id-name collision with internal columns fails fast, not silently
    intercept[IllegalArgumentException] {
      Dedup.dupSpans(docs.withColumnRenamed("doc_id", "s"), "s", "text", 3)
    }
  }

  test("semDedup and bigramTypicality handle empty and degenerate corpora") {
    import graft.operators.Corpus
    val cents = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("cell", "c_emb")
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semDedup(emptyVecs, "vec_id", "embedding", cents, 0.9).count() === 0)
    // single vector: trivially kept
    val one = Seq((7L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(one, "vec_id", "embedding", cents, 0.9)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toSeq
    assert(kept === Seq((7L, true)))
    // typicality: empty corpus → empty; all-identical docs → typicality 1
    // under full smoothing collapse (N=2, V=1 → (2+1)/(1·3) = 1.0)
    assert(Corpus.bigramTypicality(emptyDocs, "doc_id", "text").count() === 0)
    val twins = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val ty = Corpus.bigramTypicality(twins, "doc_id", "text")
      .select("typicality").as[Double].collect().toSeq
    assert(ty === Seq(1.0, 1.0))
  }

  test("CMS estimate of a never-inserted item is 0; sketch of empty input is empty") {
    import graft.functions.Sketches
    val sketch = Sketches.cmsBuild(
      Seq("a", "a", "b").toDF("tok"), col("tok"), depth = 4, width = 64)
    val est = Sketches.cmsEstimate(sketch,
        Seq("zzz").toDF("tok"), col("tok"), depth = 4, width = 64)
      .as[(String, Long)].collect().toMap
    assert(est === Map("zzz" -> 0L))
    assert(Sketches.cmsBuild(
      Seq.empty[String].toDF("tok"), col("tok"), depth = 4, width = 64).count() === 0)
  }

  test("knn with empty corpus / empty query set returns empty") {
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val one = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceKnn(one, emptyVecs, "vec_id", "embedding", 3).count() === 0)
    assert(Similarity.bruteForceKnn(emptyVecs, one, "vec_id", "embedding", 3).count() === 0)
  }

  test("topKPerKey with k larger than the group returns the whole group") {
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 2L)).toDF("g", "score", "id")
    val top = Similarity.topKPerKey(df, Seq("g"),
        struct((-col("score")).as("ns"), col("id").as("nid")), 10)
      .select(col("topk.nid")).as[Seq[Long]].head()
    assert(top === Seq(2L, 1L))
  }

  test("banded as-of join on empty sides; left keeps all with null right") {
    import graft.operators.Temporal
    val trades = Seq((1, "A", 5L), (2, "B", 9L)).toDF("tid", "sym", "t")
    val noQuotes = Seq.empty[(String, Long, Double)].toDF("q_sym", "q_t", "price")
    assert(Temporal.asOfJoinBanded(trades, noQuotes,
      col("sym"), col("q_sym"), col("t"), col("q_t"),
      leftId = Seq("tid"), tolerance = lit(10L)).count() === 0)
    val left = Temporal.asOfJoinBanded(trades, noQuotes,
        col("sym"), col("q_sym"), col("t"), col("q_t"),
        leftId = Seq("tid"), tolerance = lit(10L), joinType = "left")
      .select("tid", "price").as[(Int, Option[Double])].collect().toMap
    assert(left === Map(1 -> None, 2 -> None))
    val noTrades = Seq.empty[(Int, String, Long)].toDF("tid", "sym", "t")
    val quotes = Seq(("A", 1L, 10.0)).toDF("q_sym", "q_t", "price")
    assert(Temporal.asOfJoinBanded(noTrades, quotes,
      col("sym"), col("q_sym"), col("t"), col("q_t"),
      leftId = Seq("tid"), tolerance = lit(10L)).count() === 0)
  }

  test("banded as-of join raises on tolerance 0 instead of dropping rows") {
    import graft.operators.Temporal
    val trades = Seq((1, "A", 5L)).toDF("tid", "sym", "t")
    val quotes = Seq(("A", 5L, 10.0)).toDF("q_sym", "q_t", "price")
    val ex = intercept[Exception] {
      Temporal.asOfJoinBanded(trades, quotes,
        col("sym"), col("q_sym"), col("t"), col("q_t"),
        leftId = Seq("tid"), tolerance = lit(0L)).collect()
    }
    assert(ex.getMessage.contains("tolerance > 0") ||
      Option(ex.getCause).exists(_.getMessage.contains("tolerance > 0")))
    // the zero-width match itself is served by the plain form
    val exact = Temporal.asOfJoin(trades, quotes,
        col("sym"), col("q_sym"), col("t"), col("q_t"),
        leftId = Seq("tid"), tolerance = Some(lit(0L)))
      .select("tid", "price").as[(Int, Double)].collect().toSeq
    assert(exact === Seq((1, 10.0)))
  }

  test("scd2: null values collapse as runs; empty input; single record stays open") {
    import graft.operators.Temporal
    // null -> null is NOT a change (null-safe compare); the interval chain
    // still closes each value at the next change
    val log = Seq(
      (1L, 0L, 0L, Option("a")), (1L, 1L, 1L, None), (1L, 2L, 2L, None),
      (1L, 3L, 3L, Option("a")))
      .toDF("k", "ts", "seq", "v")
    val out = Temporal.scd2(log, "k", "v", col("ts"), col("seq"))
      .select("k", "v", "valid_from", "valid_to")
      .as[(Long, Option[String], Long, Option[Long])].collect().toSet
    assert(out === Set(
      (1L, Some("a"), 0L, Some(1L)),
      (1L, None, 1L, Some(3L)),
      (1L, Some("a"), 3L, None)))
    assert(Temporal.scd2(log.limit(0), "k", "v", col("ts"), col("seq")).count() === 0)
    val single = Temporal.scd2(log.limit(1), "k", "v", col("ts"), col("seq"))
      .select("v", "valid_to").as[(Option[String], Option[Long])].collect().toSeq
    assert(single === Seq((Some("a"), None)))
  }

  test("simHashPairs and exactNearDupPairs on empty/singleton corpora") {
    assert(Dedup.simHashPairs(emptyDocs, "doc_id", Dedup.tokenSet(col("text")),
      maxHamming = 3, bands = 4).count() === 0)
    val one = Seq((1L, "only doc")).toDF("doc_id", "text")
    assert(Dedup.simHashPairs(one, "doc_id", Dedup.tokenSet(col("text")),
      maxHamming = 3, bands = 4).count() === 0)
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.exactNearDupPairs(emptyVecs, "vec_id", "embedding", 0.5).count() === 0)
    val oneVec = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.exactNearDupPairs(oneVec, "vec_id", "embedding", 0.5).count() === 0)
  }

  test("upserts on empty input and single-record keys") {
    val empty = Seq.empty[(String, Long, String)].toDF("k", "off", "v")
    assert(Upserts.latestByKey(empty, Seq("k"), Seq(col("off"))).count() === 0)
    val single = Seq(("a", 1L, "x")).toDF("k", "off", "v")
    assert(Upserts.latestByKey(single, Seq("k"), Seq(col("off")))
      .select("v").as[String].head() === "x")
  }

  test("branch with no matching records yields empty branches, not failures") {
    val df = Seq((1L, 5.0)).toDF("id", "v")
    val bs = KStream(df, "id").branch(col("v") > 100, col("v") > 50)
    assert(bs.map(_.toDF.count()).sum === 0)
  }

  test("global-table join against an empty table: inner drops all, left keeps all") {
    val stream = Seq((1L, 10L)).toDF("id", "fk")
    val table = KGlobalTable.fromStatic(
      Seq.empty[(Long, String)].toDF("k", "name"), "k")
    assert(KStream(stream, "id").joinGlobalTable(table, col("fk")).toDF.count() === 0)
    assert(KStream(stream, "id").joinGlobalTable(table, col("fk"), "left").toDF.count() === 1)
  }

  test("graph ops on degenerate graphs: empty, single-edge, all-self-loop") {
    import graft.operators.Graph
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRankExact(empty, iters = 2).count() === 0)
    assert(Graph.triangleCounts(empty).count() === 0)
    // all self-loops: triangles must filter them to an empty graph
    val selfs = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    assert(Graph.triangleCounts(selfs).count() === 0)
    // single edge: both endpoints ranked; no triangles
    val one = Seq((1L, 2L)).toDF("src", "dst")
    val pr = Graph.pageRankExact(one, iters = 2).as[(Long, Long)].collect().toMap
    assert(pr.keySet === Set(1L, 2L))
    assert(pr(1L) === 150000000L) // nothing points at 1 after round 1
    val tc = Graph.triangleCounts(one).as[(Long, Long, Long)].collect().sorted
    assert(tc.toSeq === Seq((1L, 1L, 0L), (2L, 1L, 0L)))
    // PPR with an empty seed set: every rank is exactly 0
    val ppr = Graph.personalizedPageRankExact(one,
        Seq.empty[Long].toDF("node"), iters = 2)
      .as[(Long, Long)].collect()
    assert(ppr.length === 2 && ppr.forall(_._2 === 0L))
    // BFS on an empty graph: seeds survive at 0; empty seeds yield empty
    val bfs = Graph.shortestPaths(empty, Seq(7L).toDF("node"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(bfs === Map(7L -> 0L))
    assert(Graph.shortestPaths(one, Seq.empty[Long].toDF("node"),
      rounds = 3).count() === 0)
    // kCore: empty graph stays empty; k=1 keeps every non-isolated node
    assert(Graph.kCore(empty, k = 1, rounds = 2).count() === 0)
    val k1 = Graph.kCore(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      k = 1, rounds = 2).as[(Long, Long)].collect().toMap
    assert(k1 === Map(1L -> 1L, 2L -> 1L))
  }

  test("tokenShift: absent corpus label yields all-zero gaps, ordered by token") {
    import graft.operators.Corpus
    import spark.implicits._
    // corpus 'b' absent: totB = 0, every gap |cntA·0 − 0·totA| = 0 → the
    // top-k is the token-ascending prefix with shift 0, not a crash
    val docs = Seq(("a", "x y z")).toDF("src", "text")
    val out = Corpus.tokenShift(docs, col("src"), col("text"), "a", "b", k = 2)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("x", 1L, 0L, 0.0), ("y", 1L, 0L, 0.0)))
  }

  test("containmentPairs: all grams df-capped yields empty output, not failure") {
    import graft.operators.Dedup
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    // the only gram "a b" has df 3 > maxDf 2 → no distinctive grams at all
    assert(Dedup.containmentPairs(docs, "doc_id", "text",
      shingleN = 2, minNum = 1, minDen = 2, maxDf = 2).count() === 0)
  }

  test("round-8 ops on degenerate inputs: empty corpus / empty batch / empty merges") {
    import graft.operators.{Bpe, Dedup, Similarity}
    // novelty vs an EMPTY corpus: everything is unseen, never an error
    val nv = Dedup.noveltyReport(Seq((1L, "a b c")).toDF("doc_id", "text"),
        emptyDocs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(nv === Seq((1L, 1L, 1L, 1000000L)))
    // empty batch against a real corpus: zero rows
    assert(Dedup.noveltyReport(emptyDocs,
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .count() === 0)
    // multiprobe ANN over an empty corpus: zero rows, no failure
    val q = Seq((1L, Array.fill(64)(1.0f))).toDF("vec_id", "emb")
    assert(Similarity.lshKnnMultiprobe(q,
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "emb"),
      "vec_id", "emb", k = 3, tables = 2, bits = 4).count() === 0)
    // fertility with an EMPTY merge table degrades to char counts
    val f = Bpe.fertilityReport(Seq((1L, "s", "ab cd")).toDF("d", "source", "text"),
        "d", "text", Seq.empty, "source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(f === Seq(("s", 2L, 4L, 4L, 2000L, 1000000L)))
    // fertility on an empty frame: zero rows
    assert(Bpe.fertilityReport(
      Seq.empty[(Long, String, String)].toDF("d", "source", "text"),
      "d", "text", Seq.empty, "source").count() === 0)
  }

  test("f2Estimate: empty input yields zero rows; singleton yields est_f2 = 1") {
    import graft.functions.Sketches
    import spark.implicits._
    // empty input: no lane sums exist → zero rows (the documented
    // contract, matching the SQL-oracle shape), never a NULL-est row
    assert(Sketches.f2Estimate(
      Seq.empty[String].toDF("k"), col("k"), lanes = 9).count() === 0)
    // one item: every lane sum is ±1, every lane square 1 → median 1,
    // which is exactly F2 of a singleton
    val one = Sketches.f2Estimate(Seq("x").toDF("k"), col("k"), lanes = 9)
      .as[(Int, Double)].collect().toSeq
    assert(one === Seq((9, 1.0)))
  }

  test("tsMillis is exact at millisecond boundaries beyond double's 2^53 range") {
    // 1.7e18 ns has a double ulp of 256 ns: boundary±1 ns rounds to the
    // boundary itself in double, so `/ 1e6` would mis-bucket by 1 ms.
    // Decimal division must floor exactly.
    val ms = 1704240000000L
    val nanos = Seq(ms * 1000000L - 1, ms * 1000000L, ms * 1000000L + 1,
      ms * 1000000L + 999999, ms * 1000000L + 1000000)
    val got = nanos.toDF("ts")
      .select(graft.queries.Tables.tsMillis(col("ts"))).as[Long].collect().toSeq
    assert(got === Seq(ms - 1, ms, ms, ms, ms + 1))
  }
  test("round-7 sixth-session ops on empty / degenerate inputs") {
    import graft.operators.SuffixArray
    // continuations: empty corpus and empty pattern set both yield empty
    val pats = Seq("a b").toDF("pattern")
    assert(SuffixArray.ngramContinuations(
      emptyDocs, "doc_id", "text", pats, "pattern", n = 2, k = 3).count() === 0)
    assert(SuffixArray.ngramContinuations(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
      Seq.empty[String].toDF("pattern"), "pattern", n = 2, k = 3)
      .count() === 0)
    // SNM: corpus smaller than the window emits each pair once; singleton
    // and empty emit none
    val tiny = Seq((1L, "b"), (2L, "a")).toDF("id", "k")
    assert(Dedup.sortedNeighborhoodPairs(tiny, "id", "k", window = 10)
      .as[(Long, String, Long, String)].collect().toSeq ===
      Seq((2L, "a", 1L, "b")))
    assert(Dedup.sortedNeighborhoodPairs(
      Seq((1L, "a")).toDF("id", "k"), "id", "k", window = 5).count() === 0)
    assert(Dedup.sortedNeighborhoodPairs(
      Seq.empty[(Long, String)].toDF("id", "k"), "id", "k", window = 5)
      .count() === 0)
    // lshRecall on an empty corpus: one all-zero report row, recall 0
    val r = Dedup.lshRecall(emptyDocs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq((0L, 0L, 0L, 0L)))
  }

  test("round-9 ops on degenerate inputs: empty sides, empty centroid table, empty text") {
    import graft.operators.{Similarity, Temporal}
    // interval overlap: either side empty yields empty, never a failure
    val ivs = Seq((1L, 5L, 20L)).toDF("iid", "lo", "hi")
    val noIvs = Seq.empty[(Long, Long, Long)].toDF("sid", "s_lo", "s_hi")
    assert(Temporal.intervalOverlapJoin(
      noIvs, ivs, "s_lo", "s_hi", "lo", "hi", band = 8L).count() === 0)
    assert(Temporal.intervalOverlapJoin(
      ivs, noIvs, "lo", "hi", "s_lo", "s_hi", band = 8L).count() === 0)
    // IVF assignment: empty corpus yields empty; empty centroid table
    // yields null cells (the brute-force assignNarrow contract)
    val cents = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("cell", "c_emb")
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "emb")
    assert(Similarity.assignToCentroidsIvf(noVecs, "emb", cents).count() === 0)
    val noCents = Seq.empty[(Int, Seq[Float])].toDF("cell", "c_emb")
    val vecs = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "emb")
    val assignedEmpty = Similarity.assignToCentroidsIvf(vecs, "emb", noCents)
      .select("vec_id", "cell").as[(Long, Option[Int])].collect().toMap
    assert(assignedEmpty === Map(1L -> None))
    // bloom novelty on empty text: the [""] gram — one total row, ppm
    // defined (shingles emits [""], so the div never sees 0)
    val blob = graft.streaming.StreamingDedup.buildNoveltyBloom(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 3)
    val scored = graft.streaming.StreamingDedup.noveltyAtIngestBloom(
        Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text", 3, blob)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(scored === Seq((9L, 1L, 1L, 1000000L)))
  }

  test("round-10 ops on degenerate inputs: empty pair graph, empty arrivals, 1x1 image") {
    import graft.operators.{Corpus, Multimodal}
    // icpOrder under an EMPTY pair graph: every doc self-anchors, the
    // order is dense doc_id order
    val docs = Seq(5L, 2L, 9L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long, Long)].toDF("node_a", "node_b", "score")
    val order = Corpus.icpOrder(docs, "doc_id", noPairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(order === Set((2L, 2L, 1L), (5L, 5L, 2L), (9L, 9L, 3L)))
    // icpAttach with NO arrivals: empty in, empty out, no numbering crash
    val noCands = Seq.empty[(Long, Option[Long], Option[Long])]
      .toDF("doc_id", "old_id", "score")
    val ord = Corpus.icpOrder(docs, "doc_id", noPairs)
    assert(Corpus.icpAttach(noCands, ord, 3L).count() === 0)
    // arrivals whose every candidate is null: all self-anchored, doc order
    val nullCands = Seq((20L, None, None), (19L, None, None))
      .asInstanceOf[Seq[(Long, Option[Long], Option[Long])]]
      .toDF("doc_id", "old_id", "score")
    assert(Corpus.icpAttach(nullCands, ord, 3L)
      .as[(Long, Long, Long)].collect().toSet ===
      Set((19L, 19L, 4L), (20L, 20L, 5L)))
    // 1x1 BMP decodes: one pixel, luma = closed form
    val one = Multimodal.decodeImageMeta(Multimodal.encodeBmpGray(
      Seq((3L, 1, 1)).toDF("doc_id", "w", "h"), "doc_id", "w", "h"))
      .collect().head
    assert((one.width, one.height, one.n_pixels) === ((1, 1, 1L)))
    assert(one.luma_sum === (3L * 31 * 7) % 256)
  }
}
