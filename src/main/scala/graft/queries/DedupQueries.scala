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

  /** The mutual-best-matching engine call shared by q_mutual_match /
    * q_icp_order: exact-Jaccard pair graph at J ≥ 1/2, 8 rounds.
    */
  private def mutualMatch(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graft.operators.Graph.mutualBestMatching(
      graft.operators.Dedup.jaccardPairs(spread(s, d), "doc_id", "text",
        shingleN = 3, minNum = 1, minDen = 2),
      "id_a", "id_b", "n_common", maxRounds = 8)

  /** Unrolled-round oracle of [[mutualMatch]] ending in a `matched(a, b,
    * s)` CTE: DuckDB inlines plain CTEs (a first cut re-expanded the
    * O(n²) pair join once per round and exhausted file handles), so the
    * expensive frames are MATERIALIZED; the (score desc, partner asc)
    * argmax is packed into one BIGINT (s·2^40 + (2^40−1−p)) so the
    * tie-break is pure integer arithmetic in both engines; the 8-round
    * cap is part of the operator contract (capped and converged runs
    * agree). Headroom: the pack assumes partner doc_ids < 2^40 and
    * scores (shared-shingle counts ≤ doc token count) < 2^23 — both
    * hold with 10^7× slack at every bench SF (doc_id tops out ~10^5 at
    * the 100× sweep; docs are ~100 tokens), and an id past 2^40 would
    * make (2^40−1−p) negative, corrupting the tie-break silently, so
    * the bound is stated here rather than guessed from the literal.
    */
  private lazy val mbmSql: String = shinglesSql +
    """
      |, hx AS (SELECT doc_id, list_distinct(list_transform(s,
      |    g -> ('0x' || substring(md5(g), 1, 15))::BIGINT)) AS hs FROM sh)
      |""".stripMargin + mbmMatchedSql("hx")

  /** The matching rounds alone, reading shingle-hash sets from `$hx`
    * (doc_id, hs) — reused by [[mbmSql]] (whole corpus) and
    * q_icp_attach's oracle (standing docs only).
    */
  private def mbmMatchedSql(hx: String): String =
    s"""|, pr AS MATERIALIZED (SELECT a.doc_id AS pa, b.doc_id AS pb,
        |    len(list_intersect(a.hs, b.hs)) AS s
        |  FROM $hx a JOIN $hx b ON a.doc_id < b.doc_id
        |  WHERE 2 * len(list_intersect(a.hs, b.hs)) >=
        |    (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))))
        |, edges AS MATERIALIZED (SELECT pa AS n, pb AS p, s FROM pr
        |    UNION ALL SELECT pb, pa, s FROM pr)
        |, m_0 AS (SELECT CAST([] AS BIGINT[]) AS m)
        |""".stripMargin +
    (1 to 8).map { r =>
      s"""|, best_$r AS (SELECT n,
          |    max(s * 1099511627776 + (1099511627775 - p)) AS bp
          |  FROM edges e, m_${r - 1} mm
          |  WHERE NOT list_contains(mm.m, e.n)
          |    AND NOT list_contains(mm.m, e.p)
          |  GROUP BY n)
          |, bestp_$r AS MATERIALIZED (
          |  SELECT n, 1099511627775 - (bp % 1099511627776) AS p,
          |    bp // 1099511627776 AS s FROM best_$r)
          |, mutual_$r AS MATERIALIZED (SELECT x.n AS a, x.p AS b, x.s
          |  FROM bestp_$r x JOIN bestp_$r y
          |  ON x.p = y.n AND y.p = x.n AND x.n < x.p)
          |, m_$r AS MATERIALIZED (SELECT mm.m || coalesce(
          |    (SELECT flatten(list([a, b])) FROM mutual_$r),
          |    CAST([] AS BIGINT[])) AS m FROM m_${r - 1} mm)
          |""".stripMargin
    }.mkString +
    ", matched AS MATERIALIZED (" +
    (1 to 8).map(r => s"SELECT a, b, s FROM mutual_$r")
      .mkString("", " UNION ALL ", ")\n")

  private val shinglesSql =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |  ELSE list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) END AS s
      |  FROM toks)""".stripMargin

  /** [[shinglesSql]]'s CTE chain ending in shingle-hash sets, with a doc
    * filter and a CTE-name prefix (no leading WITH) — composed twice by
    * q_icp_attach's oracle (standing vs arriving docs).
    */
  private def shingleHx(p: String, where: String): String =
    s"""|${p}toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tk
        |  FROM documents $where),
        |${p}sh AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |  ELSE list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) END AS s
        |  FROM ${p}toks),
        |${p}hx AS (SELECT doc_id, list_distinct(list_transform(s,
        |    g -> ('0x' || substring(md5(g), 1, 15))::BIGINT)) AS hs FROM ${p}sh)""".stripMargin

  /** q_icp_attach oracle: the mbm rounds over STANDING docs anchor a
    * row_number order; arriving docs take their best exact-Jaccard
    * standing partner with the SAME bigint argmax pack as the matching
    * oracle (score·2^40 + (2^40−1−old), bounds documented on [[mbmSql]])
    * and append after the standing count, ordered by (anchor's standing
    * position — self-anchored docs take LONG_MAX and sort last, doc_id).
    */
  private lazy val icpAttachSql: String =
    "WITH " + shingleHx("s_", "WHERE doc_id % 10 != 0") + ",\n" +
    shingleHx("a_", "WHERE doc_id % 10 = 0") + "\n" +
    mbmMatchedSql("s_hx") +
    """
      |, mm AS (SELECT a AS doc_id, a AS anchor, 0 AS w FROM matched
      |    UNION ALL SELECT b, a, 1 FROM matched)
      |, lab AS (SELECT d.doc_id, coalesce(mm.anchor, d.doc_id) AS anchor,
      |    coalesce(mm.w, 0) AS w
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 != 0) d
      |  LEFT JOIN mm USING (doc_id))
      |, ord AS (SELECT doc_id, row_number() OVER (ORDER BY anchor, w) AS icp_pos
      |  FROM lab)
      |, cand AS (SELECT a.doc_id AS new_id, s.doc_id AS old_id,
      |    len(list_intersect(a.hs, s.hs)) AS score
      |  FROM a_hx a JOIN s_hx s
      |  ON 2 * len(list_intersect(a.hs, s.hs)) >=
      |    (len(a.hs) + len(s.hs) - len(list_intersect(a.hs, s.hs))))
      |, best AS (SELECT new_id AS doc_id,
      |    max(score * 1099511627776 + (1099511627775 - old_id)) AS bp
      |  FROM cand GROUP BY 1)
      |, anch AS (SELECT d.doc_id,
      |    coalesce(1099511627775 - (b.bp % 1099511627776), d.doc_id) AS anchor
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
      |  LEFT JOIN best b USING (doc_id))
      |, keyed AS (SELECT a.doc_id, a.anchor,
      |    coalesce(o.icp_pos, 9223372036854775807) AS k
      |  FROM anch a LEFT JOIN ord o ON a.anchor = o.doc_id)
      |SELECT doc_id, anchor,
      |  (SELECT count(*) FROM ord) + row_number() OVER (ORDER BY k, doc_id)
      |    AS icp_pos
      |FROM keyed""".stripMargin

  val all: Seq[Q] = Seq(

    // exact dedup: identical-content groups by full hash, smallest id
    // survives. One partial-agg shuffle.
    Q("q_dedup_exact", Some(
      "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, " +
      "count(*) AS n_dups FROM documents GROUP BY 1"))(
      (s, d) => Dedup.exact(t(s, d, "documents"), "doc_id", "text")),

    // line-level dedup (the RefinedWeb/Dolma boilerplate-removal
    // granularity): documents split on a literal separator, each repeated
    // line kept only at its first corpus-wide (doc_id, pos) occurrence,
    // documents rebuilt from survivors. The synthetic corpus has no
    // newlines, so "lines" are the segments between occurrences of the
    // word 'batch' — the same literal split in both engines.
    Q("q_line_dedup", Some("""
      |WITH s AS (SELECT doc_id, string_split(text, 'batch') AS ls FROM documents),
      |l AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos, ls[i] AS ln
      |  FROM s, unnest(range(1, len(ls) + 1)) AS u(i)),
      |k AS (SELECT doc_id, pos, ln FROM (
      |  SELECT doc_id, pos, ln,
      |    CASE WHEN trim(ln) = '' THEN 0
      |      ELSE row_number() OVER (PARTITION BY ln ORDER BY doc_id, pos) END AS rn
      |  FROM l) WHERE rn <= 1),
      |r AS (SELECT doc_id, count(*) AS n_kept,
      |  string_agg(ln, 'batch' ORDER BY pos) AS text_dedup FROM k GROUP BY doc_id)
      |SELECT d.doc_id, CAST(len(string_split(d.text, 'batch')) AS INT) AS n_lines,
      |  COALESCE(r.n_kept, 0) AS n_kept, COALESCE(r.text_dedup, '') AS text_dedup
      |FROM documents d LEFT JOIN r USING (doc_id)
      |""".stripMargin.trim))(
      (s, d) => Dedup.lineDedup(t(s, d, "documents"), "doc_id", "text",
        sep = "batch")),

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

    // cross-source duplication matrix: near-dup pairs (same generator
    // and threshold as q_dedup_near) rolled up by unordered source pair
    // — the "which crawls duplicate which" report that decides what a
    // new source actually adds before it enters the mix. Rides the
    // linear LSH pair plan; the source labels attach by doc-id equi-join
    // (pair-sized), the rollup is a |sources|²-bounded agg.
    //
    // Recall caveat, AMPLIFIED by the rollup: like q_dedup_near this
    // compares LSH candidates (128×32 banding, ~4.6e-8 miss at J=0.8)
    // against an exact all-pairs oracle — but here one missed
    // threshold pair doesn't drop one output row, it decrements a
    // MATRIX COUNT, flipping that whole (src_a, src_b) row's n_pairs on
    // an unlucky corpus. Accepted under the repo's standing
    // recall-envelope convention (the banding's miss probability at the
    // test thresholds is orders below one expected miss on this
    // corpus); a corpus-independent exact alternative is deriving the
    // matrix from jaccardPairs (complete by the AllPairs proof) at the
    // cost of the prefix-index join.
    Q("q_dup_matrix", Some(shinglesSql +
      """
        |SELECT least(da.source, db.source) AS src_a,
        |  greatest(da.source, db.source) AS src_b,
        |  count(*) AS n_pairs
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |JOIN documents da ON da.doc_id = a.doc_id
        |JOIN documents db ON db.doc_id = b.doc_id
        |WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(list_distinct(list_concat(a.s, b.s)))
        |GROUP BY 1, 2""".stripMargin))(
      (s, d) => {
        val src = t(s, d, "documents").select(col("doc_id"), col("source"))
        Dedup.nearDupPairs(spread(s, d), "doc_id", "text", shingleN = 3,
            minNum = 4, minDen = 5)
          .join(src.select(col("doc_id").as("a_id"), col("source").as("_sa")),
            Seq("a_id"))
          .join(src.select(col("doc_id").as("b_id"), col("source").as("_sb")),
            Seq("b_id"))
          .groupBy(least(col("_sa"), col("_sb")).as("src_a"),
            greatest(col("_sa"), col("_sb")).as("src_b"))
          .agg(count(lit(1)).as("n_pairs"))
      }),

    // per-doc n-gram novelty of the %10 "new batch" vs the standing
    // corpus gram inventory: distinct-3-gram counts, corpus-unseen
    // counts, and exact novelty ppm — the crawl-triage aggregate that
    // decides whether a source enters the mix, before any pairwise
    // dedup runs. Grams join by the portable md5 hash on both sides.
    Q("q_novelty", Some(shinglesSql +
      """
        |, ex AS (SELECT doc_id, ('0x' || substring(md5(unnest(s)), 1, 15))::BIGINT AS g FROM sh),
        |o AS (SELECT DISTINCT g FROM ex WHERE doc_id % 10 != 0),
        |a AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN o.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen
        |  FROM ex e LEFT JOIN o ON e.g = o.g WHERE e.doc_id % 10 = 0 GROUP BY 1)
        |SELECT doc_id, n_grams, n_unseen,
        |  n_unseen * 1000000 // n_grams AS novelty_ppm
        |FROM a""".stripMargin))(
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.noveltyReport(docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
          shingleN = 3)
      }),

    // banded-minhash candidate recall vs exact-Jaccard ground truth —
    // the LSH tuning loop as a first-class measurement: (n_true, n_cand,
    // n_found, recall_ppm) at 12 hashes × 2 bands against τ = 1/2 truth
    // (bands of 6 catch a j ≈ 0.9 pair with prob 1−(1−0.9⁶)² ≈ 0.78 —
    // deliberately lossy, so the report shows REAL misses on this
    // corpus, not a vacuous 100%).
    // Lanes ride the portable md5 double-hash, so the oracle replays the
    // identical bands — misses included — and the recall number itself
    // hash-matches.
    Q("q_lsh_recall", Some(shinglesSql +
      """
        |, ex AS (SELECT doc_id, ('0x' || substring(md5(g0), 1, 15))::BIGINT % 576460752303423488 AS h1,
        |    ('0x' || substring(md5(g0), 16, 15))::BIGINT % 576460752303423488 AS h2
        |  FROM (SELECT doc_id, unnest(s) AS g0 FROM sh)),
        |ln AS (SELECT doc_id, i, min((h1 + i * h2) % 576460752303423488) AS lane
        |  FROM ex, unnest(range(0, 12)) AS u(i) GROUP BY 1, 2),
        |bk AS (SELECT doc_id, i // 6 AS band, array_agg(lane ORDER BY i) AS bucket
        |  FROM ln GROUP BY 1, 2),
        |cd AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
        |    AND a.doc_id < b.doc_id),
        |hx AS (SELECT doc_id, list_distinct(list_transform(s,
        |    g -> ('0x' || substring(md5(g), 1, 15))::BIGINT)) AS hs FROM sh),
        |tr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM hx a JOIN hx b ON a.doc_id < b.doc_id
        |  WHERE 2 * len(list_intersect(a.hs, b.hs)) >=
        |    (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))),
        |fd AS (SELECT count(*) AS c FROM tr JOIN cd USING (id_a, id_b))
        |SELECT CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_true,
        |  CAST((SELECT count(*) FROM cd) AS BIGINT) AS n_cand,
        |  CAST((SELECT c FROM fd) AS BIGINT) AS n_found,
        |  CAST((SELECT c FROM fd) * 1000000 //
        |    greatest((SELECT count(*) FROM tr), 1) AS BIGINT) AS recall_ppm""".stripMargin))(
      (s, d) => Dedup.lshRecall(spread(s, d), "doc_id", "text",
        shingleN = 3, minNum = 1, minDen = 2, numHashes = 12, bands = 2)),

    // EXACT Jaccard >= 1/2 self-join via the AllPairs prefix filter —
    // guaranteed complete where banded LSH recall is probabilistic.
    // Candidates from the rarity-ordered s-ceil(τs)+1 gram prefix +
    // length filter; verify = exact array_intersect on fingerprint sets,
    // integer cross-multiplied threshold. Oracle = brute force over the
    // same portable fingerprints.
    Q("q_jaccard_join", Some(shinglesSql +
      """
        |, hx AS (SELECT doc_id, list_distinct(list_transform(s,
        |    g -> ('0x' || substring(md5(g), 1, 15))::BIGINT)) AS hs FROM sh)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.hs, b.hs)) AS n_common,
        |  len(a.hs) AS n_a, len(b.hs) AS n_b
        |FROM hx a JOIN hx b ON a.doc_id < b.doc_id
        |WHERE 2 * len(list_intersect(a.hs, b.hs)) >=
        |  (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))""".stripMargin))(
      (s, d) => Dedup.jaccardPairs(spread(s, d), "doc_id", "text",
        shingleN = 3, minNum = 1, minDen = 2)),

    // similar-document pairing for in-context packing (Shi et al. 2023):
    // deterministic greedy matching by iterated MUTUAL best choice over
    // the exact-Jaccard pair graph — each round every unmatched doc
    // points at its best available partner (shared-shingle count desc,
    // partner id asc), mutual picks marry, both leave the pool. The
    // oracle replays the SAME 8 rounds as unrolled CTEs (the round cap
    // is part of the operator contract, so capped and converged runs
    // agree), with the (score, partner) argmax packed into one BIGINT
    // (s·2^40 + (2^40−1−p)) so the tie-break is pure integer arithmetic
    // in both engines.
    Q("q_mutual_match", Some(mbmSql +
      "SELECT a AS node_a, b AS node_b, CAST(s AS BIGINT) AS score FROM matched"))(
      (s, d) => mutualMatch(s, d)),

    // end-to-end in-context ORDERING: every document gets its training
    // position, matched pairs adjacent (anchor = the pair's smaller id,
    // partner right behind it), unmatched docs anchored at their own id —
    // the order a packer consumes for related-docs-adjacent context
    // windows. The position is a distributed dense numbering over the
    // DISTINCT (anchor, within) keys (the denseNumber range-exchange
    // shape — never a global single-partition sort); the oracle replays
    // it as one row_number.
    Q("q_icp_order", Some(mbmSql +
      """
        |, mm AS (SELECT a AS doc_id, a AS anchor, 0 AS w FROM matched
        |    UNION ALL SELECT b, a, 1 FROM matched)
        |, lab AS (SELECT d.doc_id, coalesce(mm.anchor, d.doc_id) AS anchor,
        |    coalesce(mm.w, 0) AS w
        |  FROM documents d LEFT JOIN mm USING (doc_id))
        |SELECT doc_id, CAST(row_number() OVER (ORDER BY anchor, w) AS BIGINT)
        |  AS icp_pos
        |FROM lab""".stripMargin))(
      (s, d) => graft.operators.Corpus.icpOrder(
          t(s, d, "documents"), "doc_id", mutualMatch(s, d))
        .select("doc_id", "icp_pos")),

    // in-context ATTACH (round 10): the % 10 = 0 arrivals append to the
    // STANDING in-context order (matching + order over the % 10 != 0
    // docs only — the incremental-family split). Anchors come from the
    // arrivals' exact-Jaccard matches against the standing corpus under
    // the matching family's (score desc, old_id asc) total order;
    // appended positions are standing-count + a dense numbering by
    // (anchor's standing position, doc_id) — issued positions never
    // renumber, the shard-ledger append contract. Streaming twin
    // spec-pinned bit-identical (StreamingCorpus.icpAttachAtIngest).
    Q("q_icp_attach", Some(icpAttachSql))(
      (s, d) => {
        val docs = spread(s, d)
        val standing = docs.filter(col("doc_id") % 10 =!= 0)
        val arrivals = docs.filter(col("doc_id") % 10 === 0)
        // the standing corpus's gram inventory is built ONCE and shared
        // by the self-join (matching) and the against-join (attach) —
        // formerly each operator tokenized+hashed the standing side
        // independently (r13 verdict #1; guide §1.2-1)
        val idx = Dedup.jaccardIndex(standing, "doc_id", "text",
          shingleN = 3, minNum = 1, minDen = 2)
        val pairs = graft.operators.Graph.mutualBestMatching(
          Dedup.jaccardPairs(idx), "id_a", "id_b", "n_common", maxRounds = 8)
        val order = graft.operators.Corpus.icpOrder(standing, "doc_id", pairs)
          .localCheckpoint(true) // reused: the attach join + basePos count
        val cands = arrivals.select(col("doc_id"))
          .join(Dedup.jaccardPairsAgainst(arrivals, idx, "doc_id",
              "text", shingleN = 3)
            .select(col("new_id").as("doc_id"), col("old_id"),
              col("n_common").as("score")),
            Seq("doc_id"), "left")
        graft.operators.Corpus.icpAttach(cands, order, order.count())
      }),

    // in-context PACKING (round 10): the ICP order concatenated into one
    // token stream and split into fixed 2048-token training sequences,
    // documents crossing boundaries — the GPT-style packGlobal layout
    // under the similarity order instead of the hash permutation, so
    // matched documents share training sequences (the point of Shi et
    // al. 2023's ordering). Prefix sum = range exchange + per-partition
    // window + ≤32 collected bases; never a single-partition sort.
    Q("q_icp_pack", Some(mbmSql +
      """
        |, mm AS (SELECT a AS doc_id, a AS anchor, 0 AS w FROM matched
        |    UNION ALL SELECT b, a, 1 FROM matched)
        |, lab AS (SELECT d.doc_id, coalesce(mm.anchor, d.doc_id) AS anchor,
        |    coalesce(mm.w, 0) AS w
        |  FROM documents d LEFT JOIN mm USING (doc_id))
        |, ord AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY anchor, w) AS icp_pos FROM lab)
        |, st AS (SELECT o.doc_id, o.icp_pos, d.n_chars,
        |    CAST(coalesce(sum(d.n_chars) OVER (ORDER BY o.icp_pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS global_start
        |  FROM ord o JOIN documents d USING (doc_id))
        |SELECT doc_id, CAST(icp_pos AS BIGINT) AS icp_pos, n_chars,
        |  global_start,
        |  global_start // 2048 AS first_seq,
        |  CASE WHEN n_chars = 0 THEN global_start // 2048
        |    ELSE (global_start + n_chars - 1) // 2048 END AS last_seq
        |FROM st""".stripMargin))(
      (s, d) => {
        val ordered = graft.operators.Corpus.icpOrder(
            t(s, d, "documents"), "doc_id", mutualMatch(s, d))
          .join(t(s, d, "documents").select(col("doc_id"), col("n_chars")),
            Seq("doc_id"))
        graft.operators.Corpus.packByOrder(ordered, col("icp_pos"),
            col("n_chars"), seqLen = 2048)
          .select(col("doc_id"), col("icp_pos"), col("n_chars"),
            col("global_start"), col("first_seq"), col("last_seq"))
      }),

    // the packer's CONSUMER view (round 11): one row per (document,
    // training sequence) intersection — the spans a data loader and a
    // loss mask actually read, since documents cross the fixed
    // seqLen boundaries by design. Pack order = doc_id (any explicit
    // total order works; the ICP order is q_icp_pack's subject), then a
    // narrow per-row explode; the oracle replays the identical prefix
    // sum and tiles each doc over generate_series.
    Q("q_pack_manifest", Some("""
      |WITH st AS (SELECT doc_id, n_chars,
      |    CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS global_start
      |  FROM documents),
      |m AS (SELECT doc_id, n_chars, global_start,
      |    CAST(unnest(generate_series(global_start // 2048,
      |      (global_start + n_chars - 1) // 2048)) AS BIGINT) AS seq_id
      |  FROM st WHERE n_chars > 0)
      |SELECT doc_id, seq_id,
      |  greatest(global_start, seq_id * 2048) - global_start AS doc_off,
      |  greatest(global_start, seq_id * 2048) - seq_id * 2048 AS seq_off,
      |  least(global_start + n_chars, (seq_id + 1) * 2048)
      |    - greatest(global_start, seq_id * 2048) AS len
      |FROM m""".stripMargin.trim))(
      (s, d) => {
        val packed = graft.operators.Corpus.packByOrder(
          t(s, d, "documents").select(col("doc_id"), col("n_chars")),
          col("doc_id"), col("n_chars"), seqLen = 2048)
        graft.operators.Corpus.sequenceManifest(packed, col("n_chars"), 2048)
          .select(col("doc_id"), col("seq_id"), col("doc_off"),
            col("seq_off"), col("len"))
      }),

    // incremental exact Jaccard: the % 10 = 0 batch against the standing
    // corpus under FROZEN corpus rarity (unseen grams take df = 0, the
    // rarest slot — they can't match but they fill prefixes first).
    // Oracle = directed brute force; the prefix + positional pruning must
    // lose nothing.
    Q("q_jaccard_incremental", Some(shinglesSql +
      """
        |, hx AS (SELECT doc_id, list_distinct(list_transform(s,
        |    g -> ('0x' || substring(md5(g), 1, 15))::BIGINT)) AS hs FROM sh)
        |SELECT n.doc_id AS new_id, o.doc_id AS old_id,
        |  len(list_intersect(n.hs, o.hs)) AS n_common,
        |  len(n.hs) AS n_new, len(o.hs) AS n_old
        |FROM hx n JOIN hx o ON n.doc_id % 10 = 0 AND o.doc_id % 10 != 0
        |WHERE 2 * len(list_intersect(n.hs, o.hs)) >=
        |  (len(n.hs) + len(o.hs) - len(list_intersect(n.hs, o.hs)))""".stripMargin))(
      (s, d) => {
        val docs = spread(s, d)
        Dedup.jaccardPairsAgainst(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", shingleN = 3, minNum = 1, minDen = 2)
      }),

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

    // near-dup cluster resolution: MinHash pairs → connected components →
    // (doc, canonical survivor). Oracle recomputes the closure with a
    // recursive CTE over the brute-force pair set.
    Q("q_dedup_components", Some((shinglesSql +
      """
        |, pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(list_distinct(list_concat(a.s, b.s)))),
        |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(node, l) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node)
        |SELECT node, min(l) AS canonical FROM reach GROUP BY node""".stripMargin)
        .replaceFirst("WITH toks", "WITH RECURSIVE toks")))(
      (s, d) => Dedup.resolveComponentsStar(
        Dedup.nearDupPairs(spread(s, d), "doc_id", "text", shingleN = 3,
          minNum = 4, minDen = 5),
        "a_id", "b_id")),

    // INCREMENTAL component refresh: standing labels from the % 10 != 0
    // history collapse old connectivity to depth-1 stars; folding the
    // batch's new pairs into {star edges ∪ new pairs} must equal the
    // full closure over ALL pairs — so the oracle is the same recursive
    // CTE as q_dedup_components, and the hash match IS the correctness
    // theorem of the incremental path.
    Q("q_dedup_components_incremental", Some((shinglesSql +
      """
        |, pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(list_distinct(list_concat(a.s, b.s)))),
        |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(node, l) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node)
        |SELECT node, min(l) AS canonical FROM reach GROUP BY node""".stripMargin)
        .replaceFirst("WITH toks", "WITH RECURSIVE toks")))(
      (s, d) => {
        val pairs = Dedup.nearDupPairs(spread(s, d), "doc_id", "text",
          shingleN = 3, minNum = 4, minDen = 5)
        val oldSide = pairs.filter(
          col("a_id") % 10 =!= 0 && col("b_id") % 10 =!= 0)
        val newSide = pairs.filter(
          col("a_id") % 10 === 0 || col("b_id") % 10 === 0)
        Dedup.resolveComponentsIncremental(
          Dedup.resolveComponentsStar(oldSide, "a_id", "b_id"),
          newSide, "a_id", "b_id")
      }),

    // best-representative collapse: same components as q_dedup_components,
    // but the survivor is the LONGEST member (max n_chars, ties to min id)
    // instead of the min id — the keep-the-best-copy policy a quality-aware
    // pipeline wants. Oracle recomputes components via the recursive CTE,
    // then the same two-agg argmax.
    Q("q_dedup_best", Some((shinglesSql +
      """
        |, pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(list_distinct(list_concat(a.s, b.s)))),
        |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(node, l) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node),
        |comp AS (SELECT node, min(l) AS canonical FROM reach GROUP BY node),
        |lab AS (SELECT d.doc_id, d.n_chars, coalesce(c.canonical, d.doc_id) AS canonical
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
        |best AS (SELECT canonical, max(n_chars) AS bs FROM lab GROUP BY 1),
        |keep AS (SELECT l.canonical, min(l.doc_id) AS keep_id FROM lab l
        |  JOIN best b ON l.canonical = b.canonical AND l.n_chars = b.bs GROUP BY 1)
        |SELECT l.doc_id, l.canonical, l.n_chars FROM lab l
        |JOIN keep k ON l.canonical = k.canonical AND l.doc_id = k.keep_id""".stripMargin)
        .replaceFirst("WITH toks", "WITH RECURSIVE toks")))(
      (s, d) => {
        val docs = spread(s, d)
        val comps = Dedup.resolveComponentsStar(
          Dedup.nearDupPairs(docs, "doc_id", "text", shingleN = 3,
            minNum = 4, minDen = 5),
          "a_id", "b_id")
        Dedup.keepBestPerComponent(docs, comps, "doc_id", col("n_chars"))
          .select("doc_id", "canonical", "n_chars")
      }),

    // SimHash signatures, fully oracled: built on the portable md5-derived
    // 60-bit token hash (Dedup.portableHash64), so DuckDB recomputes the
    // identical bit votes. The xxhash64-seeded production path is pinned
    // bit-equal to the expression form by DedupSpec instead.
    Q("q_dedup_simhash", Some(simHashSql +
      """
        |SELECT doc_id, simhash FROM sigs""".stripMargin))(
      (s, d) => Dedup.simHashAgg(
          spread(s, d), "doc_id", Dedup.tokenSet(col("text")),
          hash = Dedup.portableHash64)
        .select(col("doc").as("doc_id"), col("simhash"))),

    // SimHash near-dup pairs within Hamming ≤ 3, banded 4×16-bit — SOUND by
    // pigeonhole (3 differing bits can't touch all 4 blocks), so the banded
    // linear plan equals the brute-force O(n²) pair join the oracle runs.
    // 16-bit blocks keep buckets selective on this densely-packed corpus
    // (short docs ⇒ close signatures; 8-bit blocks collide quadratically).
    Q("q_simhash_pairs", Some(simHashSql +
      """
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin))(
      (s, d) => Dedup.simHashPairs(
        spread(s, d), "doc_id", Dedup.tokenSet(col("text")),
        maxHamming = 3, bands = 4, hash = Dedup.portableHash64)),

    // dedup APPLIED: the corpus after near-dup removal — every connected
    // component keeps only its canonical (min-id) member, untouched docs
    // pass through. Composition of detection + resolution + anti-join;
    // the anti side (non-canonical nodes) is pair-sized, not corpus-sized.
    Q("q_dedup_apply", Some((shinglesSql +
      """
        |, pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(list_distinct(list_concat(a.s, b.s)))),
        |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(node, l) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node),
        |resolved AS (SELECT node, min(l) AS canonical FROM reach GROUP BY node)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT node FROM resolved WHERE node != canonical)""".stripMargin)
        .replaceFirst("WITH toks", "WITH RECURSIVE toks")))(
      (s, d) => {
        val resolved = Dedup.resolveComponentsStar(
          Dedup.nearDupPairs(spread(s, d), "doc_id", "text", shingleN = 3,
            minNum = 4, minDen = 5),
          "a_id", "b_id")
        t(s, d, "documents").select("doc_id").join(
          resolved.filter(col("node") =!= col("canonical"))
            .select(col("node").as("doc_id")),
          Seq("doc_id"), "left_anti")
      }),

    // INCREMENTAL near-dup: a "new batch" (every 10th doc) against the
    // standing corpus (the rest) — bipartite band-bucket join, exact
    // Jaccard verify. Oracle = brute-force batch × corpus; the engine
    // path joins signatures, never the cross product.
    Q("q_dedup_incremental", Some(shinglesSql +
      """
        |SELECT n.doc_id AS new_id, o.doc_id AS old_id,
        |  len(list_intersect(n.s, o.s)) AS n_common,
        |  len(list_distinct(list_concat(n.s, o.s))) AS n_union
        |FROM sh n JOIN sh o
        |  ON n.doc_id % 10 = 0 AND o.doc_id % 10 != 0
        |WHERE 5 * len(list_intersect(n.s, o.s)) >= 4 * len(list_distinct(list_concat(n.s, o.s)))""".stripMargin))(
      (s, d) => {
        val docs = spread(s, d)
        Dedup.nearDupPairsAgainst(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", shingleN = 3, minNum = 4, minDen = 5)
      }),

    // exact-substring duplicate spans: maximal token intervals covered by
    // 8-token windows occurring ≥2 times corpus-wide (suffix-array dedup
    // output shape, as sliding-gram semi-join + per-doc interval merge).
    // Oracle replays the identical windows/digests and a window-function
    // gaps-and-islands merge.
    Q("q_dup_spans", Some("""
      |WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |st AS (SELECT doc_id, tk, unnest(range(0, greatest(len(tk) - 7, 0))) AS s FROM toks),
      |occ AS (SELECT doc_id, s, md5(array_to_string(tk[s + 1 : s + 8], ' ')) AS g FROM st),
      |dup AS (SELECT g FROM occ GROUP BY g HAVING count(*) >= 2),
      |hits AS (SELECT o.doc_id, o.s FROM occ o JOIN dup USING (g)),
      |m AS (SELECT doc_id, s, max(s + 8) OVER (PARTITION BY doc_id ORDER BY s
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM hits),
      |isl AS (SELECT doc_id, s, sum(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
      |  OVER (PARTITION BY doc_id ORDER BY s) AS span FROM m)
      |SELECT doc_id, min(s) AS span_start, max(s) + 8 - min(s) AS span_tokens
      |FROM isl GROUP BY doc_id, span
      |""".stripMargin.trim))(
      (s, d) => Dedup.dupSpans(spread(s, d), "doc_id", "text", n = 8)),

    // the apply half of exact-substring dedup: cut every duplicated span
    // and rebuild (normalized token space). Digest output keeps the
    // compare exact; fully-cut docs survive as (0, md5('')).
    Q("q_dup_spans_apply", Some("""
      |WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |st AS (SELECT doc_id, tk, unnest(range(0, greatest(len(tk) - 7, 0))) AS s FROM toks),
      |occ AS (SELECT doc_id, s, md5(array_to_string(tk[s + 1 : s + 8], ' ')) AS g FROM st),
      |dup AS (SELECT g FROM occ GROUP BY g HAVING count(*) >= 2),
      |hits AS (SELECT o.doc_id, o.s FROM occ o JOIN dup USING (g)),
      |m AS (SELECT doc_id, s, max(s + 8) OVER (PARTITION BY doc_id ORDER BY s
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM hits),
      |isl AS (SELECT doc_id, s, sum(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
      |  OVER (PARTITION BY doc_id ORDER BY s) AS span FROM m),
      |spans AS (SELECT doc_id, min(s) AS st, max(s) + 8 AS en FROM isl GROUP BY doc_id, span),
      |pos AS (SELECT doc_id, tk, unnest(range(0, len(tk))) AS p FROM toks),
      |kept AS (SELECT p.doc_id, p.p, p.tk[p.p + 1] AS t FROM pos p
      |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |    WHERE sp.doc_id = p.doc_id AND p.p >= sp.st AND p.p < sp.en)),
      |agg AS (SELECT doc_id, count(*) AS kept_tokens,
      |  md5(string_agg(t, ' ' ORDER BY p)) AS cleaned_md5 FROM kept GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(a.kept_tokens, 0) AS kept_tokens,
      |  coalesce(a.cleaned_md5, md5('')) AS cleaned_md5
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |""".stripMargin.trim))(
      (s, d) => Dedup.stripDupSpans(spread(s, d), "doc_id", "text", n = 8)),

    // corpus-wide token suffix array by distributed prefix doubling
    // (Manber–Myers; the Lee-et-al-2021 exact-substring dedup index).
    // Rank is DENSE over full-suffix equivalence classes in global
    // lexicographic token order; the oracle sorts the materialized
    // suffix strings (joined with ' ', chr(1)-terminated so a shorter
    // suffix orders before its extensions — byte-identical to the
    // token-sequence order for whitespace-split text).
    Q("q_suffix_ranks", Some("""
      |WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |s AS (SELECT doc_id, u.off, array_to_string(tk[off + 1:], ' ') || chr(1) AS suf
      |  FROM t, unnest(range(len(tk))) AS u(off))
      |SELECT doc_id, off, dense_rank() OVER (ORDER BY suf) AS srank FROM s
      |""".stripMargin.trim))(
      (s, d) => graft.operators.SuffixArray.suffixRanks(
        spread(s, d), "doc_id", "text")),

    // every maximal repeated token span >= 8 tokens, as SA-adjacent
    // suffix pairs + exact token LCP: a phrase occurring m times costs
    // m-1 rows (adjacency, never all-pairs), yet witnesses every
    // repeated region at every width at once — what the fixed-width
    // sliding-gram q_dup_spans approximates. Oracle prescreens on the
    // 8-token prefix string, then counts equal token prefixes.
    Q("q_repeated_spans", Some("""
      |WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |s AS (SELECT doc_id, u.off, tk[off + 1:] AS sufl,
      |    array_to_string(tk[off + 1:], ' ') || chr(1) AS suf
      |  FROM t, unnest(range(len(tk))) AS u(off)),
      |r AS (SELECT doc_id, off, sufl, suf,
      |  row_number() OVER (ORDER BY suf, doc_id, off) AS pos FROM s),
      |adj AS (SELECT a.doc_id AS doc_a, a.off AS off_a, a.sufl AS la,
      |    b.doc_id AS doc_b, b.off AS off_b, b.sufl AS lb
      |  FROM r a JOIN r b ON b.pos = a.pos + 1
      |  WHERE array_to_string(a.sufl[1:8], ' ') = array_to_string(b.sufl[1:8], ' ')
      |    AND len(a.sufl) >= 8 AND len(b.sufl) >= 8)
      |SELECT doc_a, off_a, doc_b, off_b,
      |  len(list_filter(range(1, least(len(la), len(lb)) + 1),
      |    i -> la[1:i] = lb[1:i])) AS lcp
      |FROM adj
      |""".stripMargin.trim))(
      (s, d) => graft.operators.SuffixArray.repeatedSpans(
        spread(s, d), "doc_id", "text", minLen = 8)),

    // cross-corpus verbatim-window decontamination on the suffix-array
    // index (Lee et al. 2021): test windows (odd doc_id) occurring
    // verbatim in train (even doc_id), located exactly. The engine joins
    // two 8-byte level-rank keys per position (never L-token strings);
    // the oracle replays with literal 8-gram strings. Witness = the
    // lexicographically least (train_doc, train_off), packed.
    Q("q_sa_contamination", Some("""
      |WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |g AS (SELECT doc_id, u.off, array_to_string(tk[off + 1:off + 8], ' ') AS w
      |  FROM t, unnest(range(len(tk) - 7)) AS u(off) WHERE len(tk) >= 8),
      |tr AS (SELECT w, count(*) AS n_train, min(doc_id * 1048576 + off) AS wk
      |  FROM g WHERE doc_id % 2 = 0 GROUP BY w)
      |SELECT g.doc_id, g.off, tr.n_train,
      |  wk // 1048576 AS train_doc, wk % 1048576 AS train_off
      |FROM g JOIN tr USING (w) WHERE g.doc_id % 2 = 1
      |""".stripMargin.trim))(
      (s, d) => {
        val docs = spread(s, d)
        graft.operators.SuffixArray.contaminatedSpans(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", windowLen = 8)
      }),

    // keep-first exact-substring dedup apply (Lee et al. removal policy):
    // each repeated 8-token window keeps its corpus-first occurrence;
    // later occurrences are cut and documents rebuilt. Contrast
    // q_dup_spans_apply, which removes EVERY occurrence.
    Q("q_dedup_keep_first", Some("""
      |WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |g AS (SELECT doc_id, u.off, array_to_string(tk[off + 1:off + 8], ' ') AS w
      |  FROM t, unnest(range(len(tk) - 7)) AS u(off) WHERE len(tk) >= 8),
      |cls AS (SELECT w, min(doc_id * 1048576 + off) AS wk
      |  FROM g GROUP BY w HAVING count(*) >= 2),
      |cut AS (SELECT g.doc_id, g.off FROM g JOIN cls USING (w)
      |  WHERE g.doc_id * 1048576 + g.off != wk),
      |pos AS (SELECT doc_id, tk, unnest(range(0, len(tk))) AS p FROM t),
      |kept AS (SELECT p.doc_id, p.p, p.tk[p.p + 1] AS tok FROM pos p
      |  WHERE NOT EXISTS (SELECT 1 FROM cut c
      |    WHERE c.doc_id = p.doc_id AND p.p >= c.off AND p.p < c.off + 8)),
      |agg AS (SELECT doc_id, count(*) AS kept_tokens,
      |  md5(string_agg(tok, ' ' ORDER BY p)) AS cleaned_md5 FROM kept GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(a.kept_tokens, 0) AS kept_tokens,
      |  coalesce(a.cleaned_md5, md5('')) AS cleaned_md5
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |""".stripMargin.trim))(
      (s, d) => graft.operators.SuffixArray.stripRepeatedKeepFirst(
        spread(s, d), "doc_id", "text", windowLen = 8)),

    // ∞-gram continuations (Liu et al. 2024): the corpus as an exact
    // n-gram LM — for each 4-token pattern (first 4 tokens of every
    // 97th document), the top-3 next tokens by exact occurrence count.
    // Matching rides the SA window-class keys (≤ 32-byte rank tuples,
    // never gram-string shuffles); the oracle replays with literal
    // 4-gram strings.
    Q("q_infinigram", Some("""
      |WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |pat AS (SELECT DISTINCT array_to_string(tk[1:4], ' ') AS pattern
      |  FROM t WHERE doc_id % 97 = 0 AND len(tk) >= 4),
      |g AS (SELECT array_to_string(tk[off + 1:off + 4], ' ') AS w,
      |    coalesce(tk[off + 5], '</s>') AS next_tok
      |  FROM t, unnest(range(len(tk) - 3)) AS u(off) WHERE len(tk) >= 4),
      |c AS (SELECT pattern, next_tok, count(*) AS cnt
      |  FROM g JOIN pat ON g.w = pat.pattern GROUP BY 1, 2),
      |r AS (SELECT pattern, next_tok, cnt, row_number() OVER (
      |    PARTITION BY pattern ORDER BY cnt DESC, next_tok) AS rk FROM c)
      |SELECT pattern, next_tok, CAST(cnt AS BIGINT) AS cnt FROM r WHERE rk <= 3
      |""".stripMargin.trim))(
      (s, d) => {
        val docs = spread(s, d)
        val pats = docs.filter(col("doc_id") % 97 === 0)
          .select(split(lower(col("text")), "\\s+").as("tk"))
          .filter(size(col("tk")) >= 4)
          .select(array_join(slice(col("tk"), 1, 4), " ").as("pattern"))
        graft.operators.SuffixArray.ngramContinuations(
          docs, "doc_id", "text", pats, "pattern", n = 4, k = 3)
      }),

    // asymmetric near-containment: (src, dst) where dst covers ≥ 1/2 of
    // src's distinctive (df ≤ 10) shingles — the quote/subset detector
    // Jaccard-banded LSH is blind to. Integer threshold, df-capped gram
    // self-join (fanout ≤ maxDf² per gram), exact vs the oracle's
    // inverted-index recomputation. Both engines key the inventory on
    // the portable 60-bit md5 gram fingerprint (8-byte shuffle keys).
    Q("q_containment", Some(shinglesSql +
      """
        |, ex AS (SELECT doc_id, ('0x' || substring(md5(g0), 1, 15))::BIGINT AS g
        |         FROM (SELECT doc_id, unnest(s) AS g0 FROM sh)),
        |dft AS (SELECT g, count(*) AS df FROM ex GROUP BY 1),
        |kept AS (SELECT e.doc_id, e.g FROM ex e JOIN dft USING (g) WHERE df <= 10),
        |sz AS (SELECT doc_id, count(*) AS n_src FROM kept GROUP BY 1),
        |pr AS (SELECT a.doc_id AS src_id, b.doc_id AS dst_id, count(*) AS n_common
        |       FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id <> b.doc_id
        |       GROUP BY 1, 2)
        |SELECT src_id, dst_id, n_common, n_src
        |FROM pr JOIN sz ON sz.doc_id = pr.src_id
        |WHERE 2 * n_common >= n_src""".stripMargin))(
      (s, d) => Dedup.containmentPairs(spread(s, d), "doc_id", "text",
        shingleN = 3, minNum = 1, minDen = 2, maxDf = 10)),

    // incremental containment: the % 10 "new batch" checked against the
    // corpus inventory, distinctiveness by CORPUS df (unseen grams df 0
    // count toward the new doc's size). Directed new→old, batch-linear.
    Q("q_containment_incremental", Some(shinglesSql +
      """
        |, exn AS (SELECT doc_id, ('0x' || substring(md5(g0), 1, 15))::BIGINT AS g
        |          FROM (SELECT doc_id, unnest(s) AS g0 FROM sh WHERE doc_id % 10 = 0)),
        |exo AS (SELECT doc_id, ('0x' || substring(md5(g0), 1, 15))::BIGINT AS g
        |        FROM (SELECT doc_id, unnest(s) AS g0 FROM sh WHERE doc_id % 10 != 0)),
        |dft AS (SELECT g, count(*) AS df FROM exo GROUP BY 1),
        |keptn AS (SELECT e.doc_id, e.g FROM exn e LEFT JOIN dft USING (g)
        |          WHERE coalesce(df, 0) <= 10),
        |kepto AS (SELECT e.doc_id, e.g FROM exo e JOIN dft USING (g) WHERE df <= 10),
        |sz AS (SELECT doc_id, count(*) AS n_src FROM keptn GROUP BY 1),
        |pr AS (SELECT n.doc_id AS new_id, o.doc_id AS old_id, count(*) AS n_common
        |       FROM keptn n JOIN kepto o ON n.g = o.g GROUP BY 1, 2)
        |SELECT new_id, old_id, n_common, n_src
        |FROM pr JOIN sz ON sz.doc_id = pr.new_id
        |WHERE 2 * n_common >= n_src""".stripMargin))(
      (s, d) => {
        val docs = spread(s, d)
        Dedup.containmentPairsAgainst(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", shingleN = 3, minNum = 1, minDen = 2, maxDf = 10)
      }),

    // edit-distance near-identical keys (entity-resolution dedup): all
    // distinct p_name pairs within Levenshtein 2 — deletion-neighborhood
    // candidates (FastSS), codegen'd levenshtein verify. Oracle = brute
    // force over the distinct-name vocabulary.
    Q("q_fuzzy_pairs", Some("""
      |WITH n AS (SELECT DISTINCT p_name AS name FROM part)
      |SELECT a.name AS name_a, b.name AS name_b,
      |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
      |FROM n a JOIN n b ON a.name < b.name
      |WHERE levenshtein(a.name, b.name) <= 2
      |""".stripMargin.trim))(
      (s, d) => Dedup.fuzzyKeyPairs(t(s, d, "part"), "p_name", maxDist = 2)),

    // the same operator on the pathological common-prefix corpus
    // ('Customer#00000…' shares nearly every gram with every other name,
    // the corpus that defeats gram-inventory filters): the deletion
    // variants are near-unique bucket keys, so candidates stay near the
    // true-pair count instead of the all-pairs square.
    Q("q_fuzzy_entities", Some("""
      |WITH n AS (SELECT DISTINCT c_name AS name FROM customer)
      |SELECT a.name AS name_a, b.name AS name_b,
      |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
      |FROM n a JOIN n b ON a.name < b.name
      |WHERE levenshtein(a.name, b.name) <= 1
      |""".stripMargin.trim))(
      (s, d) => Dedup.fuzzyKeyPairs(t(s, d, "customer"), "c_name",
        maxDist = 1)),

    // entity canonicalization: typo-variant pairs close into components
    // (large-star/small-star over hashed name ids), every name normalized
    // to its component's lexicographic minimum. Oracle replays the hash,
    // the recursive-CTE closure, and the min-name collapse.
    Q("q_fuzzy_resolve", Some("""
      |WITH RECURSIVE n AS (SELECT DISTINCT p_name AS name FROM part),
      |h AS (SELECT name, ('0x' || substring(md5(name), 1, 15))::BIGINT AS hid FROM n),
      |p0 AS (SELECT a.name AS na, b.name AS nb FROM n a JOIN n b ON a.name < b.name
      |  WHERE levenshtein(a.name, b.name) <= 2),
      |pairs AS (SELECT ha.hid AS a_id, hb.hid AS b_id FROM p0
      |  JOIN h ha ON p0.na = ha.name JOIN h hb ON p0.nb = hb.name),
      |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
      |  UNION SELECT b_id, a_id FROM pairs),
      |reach(node, l) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node),
      |comp AS (SELECT node, min(l) AS canonical FROM reach GROUP BY node),
      |lab AS (SELECT h.name, coalesce(c.canonical, h.hid) AS cl
      |  FROM h LEFT JOIN comp c ON h.hid = c.node),
      |can AS (SELECT cl, min(name) AS canonical_name FROM lab GROUP BY cl)
      |SELECT l.name, c.canonical_name FROM lab l JOIN can c USING (cl)
      |""".stripMargin.trim))(
      (s, d) => Dedup.resolveFuzzyEntities(t(s, d, "part"), "p_name",
        maxDist = 2)),

    // sorted-neighborhood (merge/purge, Hernández & Stolfo 1995)
    // candidate pairs on customer names, verified at edit distance ≤ 2:
    // the POSITIONAL blocking family — coverage comes from sort
    // adjacency, cost is fixed n·(w−1) pairs however degenerate the key
    // distribution (the case that blows up gram inventories). Engine
    // positions come from the distributed dense numbering; the oracle
    // replays the identical window semantics with row_number + a banded
    // self-join.
    Q("q_snm_pairs", Some("""
      |WITH o AS (SELECT c_custkey AS id, c_name AS k,
      |  row_number() OVER (ORDER BY c_name, c_custkey) AS pos FROM customer)
      |SELECT a.k AS name_a, b.k AS name_b,
      |  CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
      |FROM o a JOIN o b ON b.pos > a.pos AND b.pos <= a.pos + 9
      |WHERE levenshtein(a.k, b.k) <= 2
      |""".stripMargin.trim))(
      (s, d) => Dedup.sortedNeighborhoodPairs(
        t(s, d, "customer"), "c_custkey", "c_name", window = 10)
        .filter(levenshtein(col("key_a"), col("key_b")) <= 2)
        .select(col("key_a").as("name_a"), col("key_b").as("name_b"),
          levenshtein(col("key_a"), col("key_b")).cast("long").as("dist"))),
  )

  /** Oracle-side SimHash over the portable hash: one row per (doc, token),
    * 60 bit-vote sums, bits packed — the same fold [[Dedup.simHashAgg]]
    * runs (bits 60..63 of the 60-bit hash are always 0 ⇒ vote −1 ⇒ unset).
    */
  private lazy val simHashSql =
    """WITH toks AS (SELECT doc_id,
      |  unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS tok
      |  FROM documents),
      |h AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM toks),
      |v AS (SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM h CROSS JOIN (SELECT unnest(range(60)) AS j) GROUP BY doc_id, j),
      |sigs AS (SELECT doc_id,
      |  CAST(coalesce(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END), 0) AS BIGINT) AS simhash
      |  FROM v GROUP BY doc_id)""".stripMargin
}
