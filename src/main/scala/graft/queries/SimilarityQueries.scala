package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.{Pca, Similarity}
import graft.queries.Tables.t

/** Similarity-search queries over the `embeddings` table (64-dim float
  * vectors). The brute-force KNN is the oracled baseline (outputs are ids
  * and ranks only — never float scores — so the compare is exact). The
  * three approximate paths (LSH / IVF / PQ) are oracled on a SEEDED corpus
  * construction under which each is provably EQUAL to brute force — see
  * [[seededEmb]] — turning the former rows-only checks into full
  * rows+schema+hash rows; their genuinely-approximate behavior on the raw
  * embeddings stays pinned by recall floors in SimilaritySpec.
  */
object SimilarityQueries {

  /** Seeded ANN corpus: vector i is rebuilt as `e_cell + ε·jitter`, where
    * `cell = vec_id % 16` selects a one-hot dimension in 0..15 and the
    * jitter is ε × the raw embedding restricted to dims 16..63 (ε = 0.01).
    * Derived purely from the testdata (no synthesized inputs) and written
    * identically in Spark and DuckDB (double arithmetic, one float cast).
    *
    * Why every ANN path is EXACT here (embeddings are unit-norm, so the
    * jitter has |u| ≤ 1, Σ|uᵢ| ≤ √48 < 7, and per-dim |uᵢ| ≤ 0.53 on this
    * data):
    *
    *  - geometry: same-cell cosine ≥ (1−ε²)/(1+ε²) ≈ 0.9998; cross-cell
    *    cosine ≤ ε² /(1−ε²)-ish ≈ 1e-4. Same-cell squared-L2 ≤ 4ε² = 4e-4;
    *    cross-cell ≥ 2 − O(ε). So with ≥ k+1 vectors per cell (31 per cell
    *    at the sf0.01 gate) the true top-k of every query is same-cell,
    *    under both metrics.
    *  - LSH ([[Similarity.lshKnn]]): hyperplanes are ±1 vectors, so
    *    h·v = ±1 + ε·(h·u) with |ε·h·u| ≤ 0.01·√48 ≈ 0.07 < 1 — every
    *    same-cell vector lands in the SAME bucket of every table, the
    *    candidate set contains the true top-k, and the exact-cosine rerank
    *    makes the output identical to brute force.
    *  - IVF ([[Similarity.ivfKnnWithCentroids]] with the exact one-hot
    *    centroids): a vector's own-cell centroid scores ≈ 1 vs ≤ ε·0.53
    *    for any other, so assignment and probing are provably own-cell.
    *  - PQ ([[Similarity.pqTopKReranked]]): subspaces 0–1 hold only the
    *    exact one-hot (floats 1.0/0.0), so the bootstrapped codebook is
    *    exact there and ADC distance is 0 same-cell vs ≥ 2 cross-cell in
    *    those subspaces, while jitter subspaces contribute ≤ 24ε² ≈ 0.002.
    *    All same-cell members outrank every cross-cell one, so the 10×k
    *    ADC pool contains the whole cell whenever cell size ≤ 10·k (500
    *    vectors / 16 cells ≈ 31 ≤ 50 at the sf0.01 gate — past that the
    *    pool truncates within-cell and the query degrades to approximate,
    *    which the bench-only larger SFs tolerate), and the exact-L2
    *    rerank equals brute force.
    */
  private[graft] def seededEmb(cell: Column, emb: Column): Column =
    transform(sequence(lit(0), lit(63)), i =>
      (when(i === cell, lit(1.0)).otherwise(lit(0.0))
        + when(i >= 16, element_at(emb, i + 1).cast("double") * lit(0.01))
          .otherwise(lit(0.0))).cast("float"))

  private[graft] def seededCorpus(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "embeddings").select(col("vec_id"),
      seededEmb(col("vec_id") % 16, col("embedding")).as("emb"))

  /** The 16 exact one-hot cell centroids (the caller-provided-centroids
    * production entry of IVF, fed the provably-right coarse quantizer).
    */
  private[graft] def seededCentroids(s: org.apache.spark.sql.SparkSession) =
    s.range(16).select(col("id").cast("int").as("cell"),
      transform(sequence(lit(0), lit(63)),
        i => when(i === col("id"), lit(1.0f)).otherwise(lit(0.0f))).as("c_emb"))

  /** DuckDB rendering of [[seededEmb]] — same doubles, same float cast. */
  private val seededSql =
    """WITH se AS (SELECT vec_id, list_transform(range(0, 64), i ->
      |  CAST(CASE WHEN i = vec_id % 16 THEN 1.0 ELSE 0.0 END
      |     + CASE WHEN i >= 16 THEN embedding[i+1]::DOUBLE * 0.01 ELSE 0.0 END AS REAL)) AS emb
      |  FROM embeddings)""".stripMargin

  /** Brute-force cosine top-5 over the seeded corpus (LSH/IVF oracle). */
  private val seededCosineTop5Sql = seededSql +
    """
      |, e AS (SELECT vec_id, emb,
      |  sqrt(list_sum(list_transform(emb, x -> x::DOUBLE * x::DOUBLE))) AS nrm FROM se),
      |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_sum(list_transform(range(1, 65), i -> q.emb[i]::DOUBLE * c.emb[i]::DOUBLE))
      |    / (q.nrm * c.nrm) AS score
      |  FROM e q JOIN e c ON c.vec_id <> q.vec_id WHERE q.vec_id < 20)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      |  FROM s) WHERE rank <= 5""".stripMargin

  /** Oracle-side cosine, same fold: per-element double widening. */
  private val cosineSql =
    """WITH e AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings)""".stripMargin

  val all: Seq[Q] = Seq(

    // brute-force cosine top-5 for the first 20 vectors. The engine path is
    // broadcast-queries × corpus-scan with two-phase bounded top-k (no
    // window sort, no per-query corpus materialization).
    Q("q_knn_bruteforce", Some(cosineSql +
      """
        |, s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1, 65), i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
        |    / (q.nrm * c.nrm) AS score
        |  FROM e q JOIN e c ON c.vec_id <> q.vec_id WHERE q.vec_id < 20)
        |SELECT query_id, rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM s) WHERE rank <= 5""".stripMargin))(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.bruteForceKnn(
          emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 5)
      }),

    // hard-negative mining: top-5 nearest DIFFERENT-label vectors per
    // anchor — the contrastive-training prep; label mismatch filters
    // before ranking, so the top-k is exact among negatives.
    Q("q_hard_negatives", Some(
      """WITH e AS (SELECT vec_id, label, embedding,
        |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings)
        |, s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1, 65), i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
        |    / (q.nrm * c.nrm) AS score
        |  FROM e q JOIN e c ON c.vec_id <> q.vec_id AND c.label <> q.label
        |  WHERE q.vec_id < 20)
        |SELECT query_id, rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM s) WHERE rank <= 5""".stripMargin))(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.hardNegatives(
          emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
          "label", k = 5)
      }),

    // LSH-bucketed ANN on the seeded corpus — fully oracled: the plan is
    // the production one (explode bucket keys → equi-join → exact-cosine
    // rerank), and the construction makes its output PROVABLY equal to
    // brute-force cosine top-5 (see seededEmb). Raw-embedding recall stays
    // pinned in SimilaritySpec (≥ 0.5 at these parameters).
    Q("q_ann_lsh", Some(seededCosineTop5Sql))(
      (s, d) => {
        val se = seededCorpus(s, d)
        Similarity.lshKnn(
          se.filter(col("vec_id") < 20), se, "vec_id", "emb", k = 5,
          tables = 16, bits = 4)
      }),

    // multi-probe LSH on the seeded corpus: 4 tables where q_ann_lsh
    // needs 16 — the Hamming-1 probes recover the recall while the
    // corpus-side index shrinks 4×. Exact on the seeded geometry (every
    // same-cell vector shares the EXACT bucket of every table, so the
    // Hamming-0 probe alone already contains the true top-5 and the
    // extra probes only add re-rank losers) — same brute-force oracle.
    // Raw-embedding recall ≥ the plain-LSH recall at equal (tables,
    // bits) is pinned in SimilaritySpec.
    Q("q_ann_multiprobe", Some(seededCosineTop5Sql))(
      (s, d) => {
        val se = seededCorpus(s, d)
        Similarity.lshKnnMultiprobe(
          se.filter(col("vec_id") < 20), se, "vec_id", "emb", k = 5,
          tables = 4, bits = 4)
      }),

    // IVF ANN on the seeded corpus with the exact one-hot centroids (the
    // caller-provided-centroids production entry) — fully oracled, same
    // brute-force answer by construction. Raw-embedding recall ≥ 0.6
    // pinned in SimilaritySpec.
    Q("q_ann_ivf", Some(seededCosineTop5Sql))(
      (s, d) => {
        val se = seededCorpus(s, d)
        Similarity.ivfKnnWithCentroids(
          se.filter(col("vec_id") < 20), se, "vec_id", "emb", k = 5,
          centroids = seededCentroids(s), nprobe = 4)
      }),

    // PQ ANN (ADC scan + exact rerank) on the seeded corpus — fully
    // oracled against brute-force squared-L2 top-5: one-hot subspaces make
    // the bootstrapped codebook exact and the ADC pool provably contains
    // the true neighbors (see seededEmb). The corpus is deterministically
    // bounded to the first 500 vectors so the proof's cell-occupancy
    // premise (cell size ≤ 10·k pool) holds at EVERY verification sf, not
    // just sf0.01 — PQ's at-scale behavior is what the bench and the raw-
    // embedding recall floor (≥ 0.7, SimilaritySpec) measure.
    Q("q_ann_pq", Some(seededSql +
      """
        |, sp AS (SELECT * FROM se WHERE vec_id < 500),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1, 65), i ->
        |    (q.emb[i]::DOUBLE - c.emb[i]::DOUBLE) * (q.emb[i]::DOUBLE - c.emb[i]::DOUBLE))) AS d
        |  FROM sp q JOIN sp c ON c.vec_id <> q.vec_id WHERE q.vec_id < 20)
        |SELECT query_id, rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
        |  FROM s) WHERE rank <= 5""".stripMargin))(
      (s, d) => {
        val se = seededCorpus(s, d).filter(col("vec_id") < 500)
        Similarity.pqTopKReranked(
          se.filter(col("vec_id") < 20), se, "vec_id", "emb", k = 5)
      }),

    // IVF-PQ ANN (coarse cells × residual product quantization — the
    // billion-vector index shape) on the seeded corpus with the exact
    // one-hot coarse centroids — fully oracled against brute-force
    // squared-L2 top-5. Why exact here: assignment and probing are
    // provably own-cell (see seededEmb's IVF argument); residuals are 0
    // in dims 0–15 for every vector, so the residual codebook's one-hot
    // subspaces are exactly zero and cross-cell ADC distance carries the
    // ~2.0 coarse gap in those subspaces, while same-cell ADC error is
    // O(ε²) — the 50-row pool therefore holds the whole own cell (≤ 32
    // vectors at the 500 bound) and the exact rerank equals brute force.
    // Raw-embedding recall is pinned in SimilaritySpec.
    Q("q_ann_ivfpq", Some(seededSql +
      """
        |, sp AS (SELECT * FROM se WHERE vec_id < 500),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1, 65), i ->
        |    (q.emb[i]::DOUBLE - c.emb[i]::DOUBLE) * (q.emb[i]::DOUBLE - c.emb[i]::DOUBLE))) AS d
        |  FROM sp q JOIN sp c ON c.vec_id <> q.vec_id WHERE q.vec_id < 20)
        |SELECT query_id, rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
        |  FROM s) WHERE rank <= 5""".stripMargin))(
      (s, d) => {
        val se = seededCorpus(s, d).filter(col("vec_id") < 500)
        Similarity.ivfPqTopK(
          se.filter(col("vec_id") < 20), se, "vec_id", "emb", k = 5,
          centroids = seededCentroids(s), nprobe = 4)
      }),

    // embedding-cosine near-dup pairs, exact all-pairs baseline (the
    // corpus has no planted high-cosine dups — max pair ≈ 0.51 — so the
    // threshold sits where real pairs exist; integer-id output keeps the
    // compare exact). The LSH scale path (embeddingNearDups) is pinned
    // against this baseline in SimilaritySpec.
    Q("q_embed_neardup", Some(cosineSql +
      """
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |  / (a.nrm * b.nrm) >= 0.45""".stripMargin))(
      (s, d) => Similarity.exactNearDupPairs(
        t(s, d, "embeddings"), "vec_id", "embedding", minCosine = 0.45)),

    // embedding-space decontamination (round 10): the eval-leakage door
    // the n-gram forms can't close — corpus vectors (vec_id >= 100)
    // flagged against the benchmark set (vec_id < 100) at cosine >= 0.45
    // (the family threshold; this split has real hits — max cross-split
    // cosine 0.493). Benchmark rides ONE broadcast row; the corpus pass
    // is narrow, no shuffle. Integer n_hits keeps the compare exact.
    Q("q_embed_decontaminate", Some(cosineSql +
      """
        |, b AS (SELECT vec_id, embedding, nrm FROM e WHERE vec_id < 100)
        |, c AS (SELECT vec_id, embedding, nrm FROM e WHERE vec_id >= 100)
        |, h AS (SELECT c.vec_id, CAST(count(b.vec_id) AS BIGINT) AS n_hits
        |  FROM c LEFT JOIN b
        |  ON list_sum(list_transform(range(1, 65), i ->
        |       c.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |     / (c.nrm * b.nrm) >= 0.45
        |  GROUP BY c.vec_id)
        |SELECT vec_id, n_hits, n_hits = 0 AS kept FROM h""".stripMargin))(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.embedDecontaminate(
            e.filter(col("vec_id") >= 100).select("vec_id", "embedding"),
            "vec_id", "embedding",
            e.filter(col("vec_id") < 100), "embedding", minCosine = 0.45)
          .select(col("vec_id"), col("n_hits"), col("kept"))
      }),

    // bucketed decontamination (round 11): the route for benchmark packs
    // past embedDecontaminate's 256 MiB one-object ceiling — the same
    // verdict through √B-group k-means + per-group sharded packs. At
    // nprobe = groups every group is probed, so the semantics are EXACT
    // and the oracle is the identical left-join hit count; small-nprobe
    // recall is spec territory (SimilaritySpec), like every IVF form.
    Q("q_embed_decontaminate_bucketed", Some(cosineSql +
      """
        |, b AS (SELECT vec_id, embedding, nrm FROM e WHERE vec_id < 100)
        |, c AS (SELECT vec_id, embedding, nrm FROM e WHERE vec_id >= 100)
        |, h AS (SELECT c.vec_id, CAST(count(b.vec_id) AS BIGINT) AS n_hits
        |  FROM c LEFT JOIN b
        |  ON list_sum(list_transform(range(1, 65), i ->
        |       c.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |     / (c.nrm * b.nrm) >= 0.45
        |  GROUP BY c.vec_id)
        |SELECT vec_id, n_hits, n_hits = 0 AS kept FROM h""".stripMargin))(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.embedDecontaminateBucketed(
            e.filter(col("vec_id") >= 100).select("vec_id", "embedding"),
            "vec_id", "embedding",
            e.filter(col("vec_id") < 100), "vec_id", "embedding",
            minCosine = 0.45, nprobe = 10, groups = 10)
          .select(col("vec_id"), col("n_hits"), col("kept"))
      }),

    // sharded EXACT decontamination (round 12): the flat-plan route for
    // benchmark packs past the one-object ceiling — √B HASH shards (no
    // k-means: an exact scan visits every shard, so the grouping needs
    // only determinism) broadcast as rows, one BNLJ, per-shard counts
    // re-aggregated on the document id. Exact at ANY benchmark size with
    // constant plan depth — the identical left-join hit-count oracle.
    Q("q_embed_decontaminate_sharded", Some(cosineSql +
      """
        |, b AS (SELECT vec_id, embedding, nrm FROM e WHERE vec_id < 100)
        |, c AS (SELECT vec_id, embedding, nrm FROM e WHERE vec_id >= 100)
        |, h AS (SELECT c.vec_id, CAST(count(b.vec_id) AS BIGINT) AS n_hits
        |  FROM c LEFT JOIN b
        |  ON list_sum(list_transform(range(1, 65), i ->
        |       c.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |     / (c.nrm * b.nrm) >= 0.45
        |  GROUP BY c.vec_id)
        |SELECT vec_id, n_hits, n_hits = 0 AS kept FROM h""".stripMargin))(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.embedDecontaminateSharded(
            e.filter(col("vec_id") >= 100).select("vec_id", "embedding"),
            "vec_id", "embedding",
            e.filter(col("vec_id") < 100), "vec_id", "embedding",
            minCosine = 0.45, shards = 10)
          .select(col("vec_id"), col("n_hits"), col("kept"))
      }),

    // SemDeDup: cluster (16 one-hot caller centroids — the production
    // entry takes kMeansCentroids), drop within-cluster cosine near-dups
    // keeping the min id. Oracle replays the identical L2 argmin (same
    // fold, same struct tie-break) and pair predicate. τ = 0.45 sits
    // where this corpus has real pairs (q_embed_neardup).
    Q("q_semdedup", Some("""
      |WITH dists AS (
      |  SELECT e.vec_id, e.embedding, t.j,
      |    list_sum(list_transform(range(1, 65), i ->
      |      (e.embedding[i]::DOUBLE - CASE WHEN i - 1 = t.j THEN 1.0 ELSE 0.0 END)
      |    * (e.embedding[i]::DOUBLE - CASE WHEN i - 1 = t.j THEN 1.0 ELSE 0.0 END))) AS d
      |  FROM embeddings e CROSS JOIN generate_series(0, 15) AS t(j)),
      |a AS (SELECT vec_id, any_value(embedding) AS embedding,
      |  CAST(min({'k': d, 'cell': j}).cell AS INT) AS cell
      |  FROM dists GROUP BY vec_id),
      |b AS (SELECT vec_id, embedding, cell,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm FROM a),
      |drp AS (SELECT DISTINCT y.vec_id FROM b x JOIN b y ON x.cell = y.cell AND x.vec_id < y.vec_id
      |  WHERE list_sum(list_transform(range(1, 65), i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
      |        / (x.nrm * y.nrm) >= 0.45)
      |SELECT b.vec_id, b.cell, (drp.vec_id IS NULL) AS kept
      |FROM b LEFT JOIN drp ON b.vec_id = drp.vec_id
      |""".stripMargin.trim))(
      (s, d) => Similarity.semDedup(
        t(s, d, "embeddings"), "vec_id", "embedding",
        centroids = seededCentroids(s), minCosine = 0.45)),

    // SemDeDup SKEW route: a constructed corpus (derived from the
    // embeddings ids, identical arithmetic both engines) with a planted
    // MEGA-CELL — every vec_id with seed < 100 lands in cell 0, ~25% of
    // the corpus — and exact-duplicate pairs (vec_id ≡ 1 mod 4 copies its
    // predecessor's vector). maxCellSize = 50 forces cell 0 through the
    // in-cell LSH route while the other 15 cells take the small quadratic
    // path. The hash-noise payload (dims 16..63, amplitude ±0.6 vs the
    // 1.0 one-hot) keeps non-identical same-cell cosines far below the
    // 0.9 threshold, so the qualifying pairs are exactly the planted
    // duplicates — which share EVERY hyperplane bucket, making the LSH
    // route provably exact and the DuckDB pairwise replay a true oracle
    // of the whole operator.
    Q("q_semdedup_skew", Some("""
      |WITH base AS (SELECT vec_id,
      |    vec_id - CASE WHEN vec_id % 4 = 1 THEN 1 ELSE 0 END AS s FROM embeddings),
      |cc AS (SELECT vec_id, s,
      |    CAST(CASE WHEN s < 100 THEN 0 ELSE s % 15 + 1 END AS INT) AS c FROM base),
      |v AS (SELECT vec_id, c, list_transform(range(0, 64), i -> CAST(
      |    CASE WHEN i = c THEN 1.0 ELSE 0.0 END +
      |    CASE WHEN i >= 16 THEN
      |      ((('0x' || substring(md5(CAST(s * 64 + i AS VARCHAR)), 1, 15))::BIGINT % 1000)
      |        / 1000.0 - 0.5) * 1.2
      |    ELSE 0.0 END AS REAL)) AS emb FROM cc),
      |n AS (SELECT vec_id, c, emb,
      |    sqrt(list_sum(list_transform(emb, x -> x::DOUBLE * x::DOUBLE))) AS nrm FROM v),
      |drp AS (SELECT DISTINCT y.vec_id FROM n x JOIN n y ON x.c = y.c AND x.vec_id < y.vec_id
      |  WHERE list_sum(list_transform(range(1, 65), i -> x.emb[i]::DOUBLE * y.emb[i]::DOUBLE))
      |        / (x.nrm * y.nrm) >= 0.9)
      |SELECT n.vec_id, n.c AS cell, (drp.vec_id IS NULL) AS kept
      |FROM n LEFT JOIN drp ON n.vec_id = drp.vec_id
      |""".stripMargin.trim))(
      (s, d) => {
        val seed = col("vec_id") -
          when(pmod(col("vec_id"), lit(4)) === 1, 1L).otherwise(0L)
        val corpus = t(s, d, "embeddings").select(col("vec_id"), seed.as("_s"))
          .withColumn("_c",
            when(col("_s") < 100, 0)
              .otherwise(pmod(col("_s"), lit(15)) + 1).cast("int"))
          .select(col("vec_id"), transform(sequence(lit(0), lit(63)), i =>
            (when(i === col("_c"), lit(1.0)).otherwise(lit(0.0)) +
              when(i >= 16,
                (pmod(graft.operators.Dedup.portableHash64(
                    (col("_s") * 64 + i).cast("string")), lit(1000L))
                  .cast("double") / 1000.0 - 0.5) * 1.2)
                .otherwise(lit(0.0))).cast("float")).as("emb"))
        Similarity.semDedupSkewSafe(corpus, "vec_id", "emb",
          centroids = seededCentroids(s), minCosine = 0.9,
          maxCellSize = 50, tables = 8, bits = 2, dim = 64)
      }),

    // int8 quantization: per-vector symmetric scale, floor(x·s + 0.5)
    // mapping (identical in every engine, unlike round-half). Output is
    // integer stats of the quantized vector — exact compare.
    Q("q_embed_quantize", Some(
      """WITH m AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx FROM embeddings),
        |q AS (SELECT vec_id, list_transform(embedding,
        |  x -> CAST(floor(x::DOUBLE * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END) + 0.5) AS INT)) AS qe
        |  FROM m)
        |SELECT vec_id, CAST(list_min(qe) AS INT) AS q_min,
        |  CAST(list_max(qe) AS INT) AS q_max,
        |  CAST(list_sum(qe) AS BIGINT) AS q_sum
        |FROM q""".stripMargin))(
      (s, d) =>
        Similarity.quantizeInt8(t(s, d, "embeddings"), "embedding")
          .select(col("vec_id"),
            array_min(col("q_emb")).as("q_min"),
            array_max(col("q_emb")).as("q_max"),
            aggregate(col("q_emb"), lit(0L), (a, v) => a + v).as("q_sum"))),

    // one-pass Gram matrix (the covariance/PCA building block) over the
    // int8-quantized corpus: gram_agg keeps the d(d+1)/2 triangle in ONE
    // aggregation buffer — no (row, i, j) explode, the shuffle carries one
    // O(d²) array per map partition. Integer-valued inputs make the double
    // sums exact (< 2^53), so the full 2 080-entry triangle hash-matches
    // DuckDB's integer arithmetic.
    Q("q_embed_gram", Some(
      """WITH m AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx FROM embeddings),
        |q AS (SELECT vec_id, list_transform(embedding,
        |  x -> CAST(floor(x::DOUBLE * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END) + 0.5) AS INT)) AS qe
        |  FROM m),
        |p AS (SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j
        |  FROM range(0, 64) r1(i), range(0, 64) r2(j) WHERE j >= i)
        |SELECT i, j, CAST(sum(CAST(qe[i + 1] AS BIGINT) * qe[j + 1]) AS BIGINT) AS gram
        |FROM q, p GROUP BY 1, 2""".stripMargin))(
      (s, d) =>
        Pca.gramMatrix(
          Similarity.quantizeInt8(t(s, d, "embeddings"), "embedding"),
          col("q_emb"), dim = 64)
          .select(col("i"), col("j"), col("gram").cast("long").as("gram"))),

    // distributed Lloyd's k-means on the seeded corpus — the offline
    // trainer for IVF's coarse quantizer, end-to-end oracled. Seeds are
    // vec_ids 0..15, one per one-hot cell; every vector's nearest seed
    // (and nearest moved centroid — the mean keeps the 1.0 one-hot
    // component, jitter contributes <= 4eps^2·48 ~ 2e-2 squared-L2 vs >= 2
    // cross-cell) is provably its own cell, so cluster i == {vec_id % 16
    // = i} at every iteration and DuckDB can rebuild the exact partition.
    // Output is the q_label_centroid shape: per-cluster count + centroid
    // L1 under scale-4 portable rounding.
    Q("q_kmeans", Some(seededSql +
      """
        |, a AS (SELECT vec_id, CAST(vec_id % 16 AS INT) AS cell, emb FROM se),
        |x AS (SELECT cell,
        |  unnest(list_transform(range(1, 65), i -> {'i': i, 'v': emb[i]::DOUBLE})) AS e FROM a),
        |m AS (SELECT cell, e.i AS i, sum(e.v) AS s, count(*) AS c FROM x GROUP BY 1, 2)
        |SELECT cell, max(c) AS n,
        |  floor(sum(abs(s / c)) * 1e4 + 0.5) / 1e4 AS centroid_l1
        |FROM m GROUP BY cell""".stripMargin))(
      (s, d) => {
        val se = seededCorpus(s, d)
        val cents = Similarity.kMeansCentroids(se, "vec_id", "emb", k = 16, iters = 2)
        Similarity.assignToCentroids(se, "emb", cents)
          .select(col("cell"), posexplode(col("emb")))
          .groupBy("cell", "pos")
          .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("c"))
          .groupBy("cell")
          .agg(max(col("c")).as("n"),
            (floor(sum(abs(col("s") / col("c"))) * 1e4 + 0.5) / 1e4).as("centroid_l1"))
      }),

    // two-level (IVF-routed) centroid assignment — the scale path for
    // centroid counts that grow with the corpus, where brute-force
    // assignment is the O(N·k) quadratic term (measured: SCALING.md
    // round-9 density demonstration). Coarse groups come from one
    // k-means over the CENTROID table (k rows, never the corpus), each
    // vector probes its nprobe nearest group reps, exact argmin within
    // the probed groups' members; both levels ride 1-row broadcast
    // packs, the corpus is never shuffled. nprobe = groups is
    // exhaustive-EXACT (spec-pinned ≡ assignToCentroids), so on the
    // seeded corpus every vector provably lands in its own one-hot cell
    // and DuckDB replays the assignment as vec_id % 16.
    Q("q_assign_ivf", Some(seededSql +
      """
        |SELECT vec_id, CAST(vec_id % 16 AS INT) AS cell FROM se""".stripMargin))(
      (s, d) => Similarity.assignToCentroidsIvf(
          seededCorpus(s, d), "emb", seededCentroids(s),
          nprobe = 4, groups = 4)
        .select(col("vec_id"), col("cell"))),

    // the full production IVF story in one query: TRAIN the coarse
    // quantizer with k-means, then probe with it. On the seeded corpus the
    // trained centroids stay within eps of the one-hot axes (see q_kmeans),
    // so assignment and probing are provably own-cell and the output
    // equals brute-force cosine top-5 — same oracle as q_ann_ivf.
    Q("q_kmeans_ivf", Some(seededCosineTop5Sql))(
      (s, d) => {
        val se = seededCorpus(s, d)
        val cents = Similarity.kMeansCentroids(se, "vec_id", "emb", k = 16, iters = 1)
        Similarity.ivfKnnWithCentroids(
          se.filter(col("vec_id") < 20), se, "vec_id", "emb", k = 5,
          centroids = cents, nprobe = 4)
      }),

    // label centroids: the clustering-side consumer of embeddings.
    // Scale shape: posexplode to (label, dim, component) → two partial-agg
    // shuffles — never a per-group vector materialization (collect_list of
    // embeddings would OOM a hot label at 100 TB). Output = per-label count
    // and centroid L1 norm, integer count + scale-4 rounding.
    Q("q_label_centroid", Some(
      """WITH x AS (SELECT label,
        |  unnest(list_transform(range(1, 65), i -> {'i': i, 'v': embedding[i]::DOUBLE})) AS e
        |  FROM embeddings),
        |m AS (SELECT label, e.i AS i, sum(e.v) AS s, count(*) AS c FROM x GROUP BY 1, 2)
        |SELECT label, max(c) AS n,
        |  floor(sum(abs(s / c)) * 1e4 + 0.5) / 1e4 AS centroid_l1
        |FROM m GROUP BY label""".stripMargin))(
      (s, d) =>
        t(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .groupBy("label", "pos")
          .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("c"))
          .groupBy("label")
          .agg(max(col("c")).as("n"),
            // portable half-up (see TextAnalysis.halfUp): round() splits
            // across engines at repr-vs-binary .5 boundaries
            (floor(sum(abs(col("s") / col("c"))) * 1e4 + 0.5) / 1e4).as("centroid_l1"))),
  )
}
