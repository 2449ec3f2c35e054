package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.Tables.t

/** Similarity-search queries over the `embeddings` table (64-dim float
  * vectors). The brute-force KNN is the oracled baseline (outputs are ids
  * and ranks only — never float scores — so the compare is exact); the LSH
  * path is the approximate scale variant, checked rows-only plus a
  * recall unit test.
  */
object SimilarityQueries {

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

    // LSH-bucketed ANN, same shape — approximate (rows-only check;
    // SimilaritySpec pins recall ≥ 0.5 vs brute force on this data).
    Q("q_ann_lsh", None)(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.lshKnn(
          emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 5,
          tables = 16, bits = 4)
      }),

    // IVF ANN — the inverted-file scale path (probe 4 of 16 cells;
    // SimilaritySpec pins recall ≥ 0.6 vs brute force).
    Q("q_ann_ivf", None)(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.ivfKnn(
          emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 5,
          nlist = 16, nprobe = 4)
      }),

    // PQ ANN — the compressed-corpus scale path: vectors stored as m
    // one-byte codes; queries scan only codes (ADC), then exactly rerank
    // a 10×k pool (SimilaritySpec pins recall ≥ 0.7 vs exact L2).
    Q("q_ann_pq", None)(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.pqTopKReranked(
          emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 5)
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
