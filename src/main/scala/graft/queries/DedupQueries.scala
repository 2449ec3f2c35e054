package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.Tables.t

/* Dedup inputs are re-spread across the cluster before the signature
 * stage: the testdata ships one row group per file, so without this the
 * map-side partial aggregation (where all MinHash/SimHash work happens)
 * runs in a single scan task. Cost: one shuffle of (id, text) — trivial
 * next to the signature computation it parallelizes. */

/** Deduplication queries over the `documents` table. The near-dup oracle is
  * the exact O(n²) pair join — the MinHash+LSH path must reproduce it
  * row-for-row (it does: recall ≈ 1 − 4.6e-8 at the J=0.8 boundary with
  * 128 hashes / 32 bands, and verification makes precision exact).
  * All similarity outputs are INTEGER set sizes, never floats, so the
  * cross-engine compare is bit-exact.
  */
object DedupQueries {

  /** Shared tokenization, rendered identically for DuckDB: lowercase
    * whitespace tokens → distinct 3-word shingles (docs shorter than 3
    * words collapse to one whole-doc shingle).
    */
  private def spread(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "documents").repartition(s.sparkContext.defaultParallelism)

  private val shinglesSql =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |  ELSE list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) END AS s
      |  FROM toks)""".stripMargin

  val all: Seq[Q] = Seq(

    // exact dedup: identical-content groups by full hash, smallest id
    // survives. One partial-agg shuffle.
    Q("q_dedup_exact", Some(
      "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, " +
      "count(*) AS n_dups FROM documents GROUP BY 1"))(
      (s, d) => Dedup.exact(t(s, d, "documents"), "doc_id", "text")),

    // MinHash+LSH near-dup pairs at 3-gram Jaccard ≥ 0.8, verified exact.
    // Oracle = the brute-force O(n²) answer; the engine path is linear.
    Q("q_dedup_near", Some(shinglesSql +
      """
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.s, b.s)) AS n_common,
        |  len(list_distinct(list_concat(a.s, b.s))) AS n_union
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(list_distinct(list_concat(a.s, b.s)))""".stripMargin))(
      (s, d) => Dedup.nearDupPairs(
        spread(s, d), "doc_id", "text", shingleN = 3,
        minNum = 4, minDen = 5)),

    // n-gram Jaccard similarity on a deterministic linear pairing
    // (doc i vs doc i+1) — the exact-similarity primitive in isolation.
    Q("q_ngram_jaccard", Some(shinglesSql +
      """
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.s, b.s)) AS n_common,
        |  len(list_distinct(list_concat(a.s, b.s))) AS n_union
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin))(
      (s, d) => {
        val docs = spread(s, d)
        val a = docs.select(col("doc_id").as("a_id"),
          Dedup.shingles(col("text"), 3).as("a_set"))
        val b = docs.select(col("doc_id").as("b_id"),
          Dedup.shingles(col("text"), 3).as("b_set"))
        a.join(b, col("b_id") === col("a_id") + 1)
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("a_set"), col("b_set"))).as("n_common"),
            size(array_union(col("a_set"), col("b_set"))).as("n_union"))
      }),

    // SimHash signatures (64-bit; Hamming distance tracks similarity).
    // xxhash64 is Spark-native with no DuckDB twin ⇒ rows-only check; the
    // SimHashSpec unit test pins the semantics instead.
    Q("q_dedup_simhash", None)(
      (s, d) => Dedup.simHashAgg(
          spread(s, d), "doc_id", Dedup.tokenSet(col("text")))
        .select(col("doc").as("doc_id"), col("simhash"))),

    // SimHash near-dup candidates: pairs within Hamming distance ≤ 8,
    // found by banding the 64-bit signature into 4 16-bit blocks (a pair
    // within distance 3 shares ≥1 exact block; wider distances probed via
    // the verified Hamming filter). Rows-only (xxhash64-seeded).
    Q("q_simhash_pairs", None)(
      (s, d) => {
        val sigs = Dedup.simHashAgg(
            spread(s, d), "doc_id", Dedup.tokenSet(col("text")))
          .select(col("doc").as("doc_id"), col("simhash").as("sig"))
          .localCheckpoint(true) // both self-join sides read the signatures
        val banded = sigs.select(col("doc_id"), col("sig"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
          .select(col("doc_id"), col("sig"), col("pos").as("band"), col("col").as("block"))
        val a = banded.select(col("band"), col("block"),
          col("doc_id").as("a_id"), col("sig").as("a_sig"))
        val b = banded.select(col("band"), col("block"),
          col("doc_id").as("b_id"), col("sig").as("b_sig"))
        a.join(b, Seq("band", "block"))
          .filter(col("a_id") < col("b_id"))
          .dropDuplicates("a_id", "b_id")
          .select(col("a_id"), col("b_id"),
            Dedup.hammingDistance(col("a_sig"), col("b_sig")).as("hamming"))
          .filter(col("hamming") <= 8)
      }),
  )
}
