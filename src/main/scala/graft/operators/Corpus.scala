package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines: context-window
  * chunking and deterministic sampling. Both are narrow per-row transforms
  * (chunking explodes rows but never shuffles; sampling is a filter), so
  * they compose with any downstream dedup/analysis at any corpus size.
  */
object Corpus {

  /** Split each document into token windows of `chunkTokens` with
    * `overlapTokens` carried between consecutive chunks — the standard
    * context-window preparation step. Chunk starts advance by
    * `chunkTokens − overlapTokens`; the final chunk may be short, but a
    * window is only emitted if it contributes at least one token beyond
    * the carried overlap (starts stop at `tokens − overlap − 1`) — a
    * trailing window of only overlap tokens would be wholly contained in
    * the previous chunk and would double-count its tokens downstream.
    * Empty docs produce one empty chunk (the whole-doc window).
    *
    * Output: (id, chunk_no, chunk_tokens, chunk_md5) — one row per chunk,
    * digest instead of text so downstream exact-compare is cheap; callers
    * wanting the text select the same `concat_ws` expression.
    */
  def chunk(docs: DataFrame, id: String, text: String,
      chunkTokens: Int, overlapTokens: Int,
      keepCols: Seq[String] = Nil): DataFrame = {
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunk, got overlap=$overlapTokens chunk=$chunkTokens")
    val stride = chunkTokens - overlapTokens
    val tk = split(col(text), "\\s+")
    // upper bound tokens−overlap−1: the last window must add a token the
    // previous chunk didn't already cover (see scaladoc)
    val starts = sequence(lit(0), greatest(size(tk) - overlapTokens - 1, lit(0)), lit(stride))
    val kept = keepCols.map(col)
    docs.select(
        (col(id) +: kept) :+
        posexplode(transform(starts, s => struct(
          concat_ws(" ", slice(tk, s + 1, lit(chunkTokens))).as("txt"),
          least(lit(chunkTokens), size(tk) - s).as("n")))): _*)
      .select(
        (col(id) +: kept) ++ Seq(col("pos").as("chunk_no"),
          col("col.n").as("chunk_tokens"), md5(col("col.txt")).as("chunk_md5")): _*)
  }

  /** One row per word n-gram OCCURRENCE (not distinct): (id, g). Documents
    * shorter than n tokens produce no rows — callers that must keep them
    * re-join from the doc table. Narrow (one explode), never shuffles.
    */
  def ngramOccurrences(docs: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val grams = element_at(
      transform(array(split(lower(col(text)), "\\s+")), tk =>
        when(size(tk) >= n,
          transform(sequence(lit(0), size(tk) - n),
            i => concat_ws(" ", slice(tk, i + lit(1), lit(n)))))
          .otherwise(array().cast("array<string>"))),
      1)
    docs.select(col(id), explode(grams).as("g"))
  }

  /** Gopher-style repetition/boilerplate stats per document: total bigram
    * occurrences, the fraction held by the single most frequent bigram, and
    * the fraction of trigram occurrences that are duplicates (their trigram
    * appears more than once in the doc). High values flag boilerplate and
    * degenerate repetition — the standard pretraining quality gates.
    *
    * Two explode+agg passes (bigrams, trigrams), each a per-doc partial
    * agg; no cross-document state, so the operator is scale-free. Docs
    * shorter than the n-gram emit null stats (kept via left join).
    */
  def repetitionStats(docs: DataFrame, id: String, text: String): DataFrame = {
    val bg = ngramOccurrences(docs, id, text, 2)
      .groupBy(col(id), col("g")).agg(count(lit(1)).as("c"))
    val bstat = bg.groupBy(id).agg(
      sum("c").as("n_bigrams"),
      (max("c").cast("double") / sum("c").cast("double"))
        .cast("double").as("top_bigram_frac"))
    val tg = ngramOccurrences(docs, id, text, 3)
      .groupBy(col(id), col("g")).agg(count(lit(1)).as("c"))
    val tstat = tg.groupBy(id).agg(
      (sum(when(col("c") > 1, col("c")).otherwise(0)).cast("double") /
        sum("c").cast("double")).cast("double").as("dup_trigram_frac"))
    docs.select(col(id)).join(bstat, Seq(id), "left").join(tstat, Seq(id), "left")
  }

  /** Train/test contamination: for each test document, how many of its
    * DISTINCT word n-grams also occur anywhere in the train corpus.
    * Documents with no shared n-gram (or shorter than n) are absent —
    * the output is the contamination report, not a per-doc scorecard.
    *
    * Scale shape: both sides reduce to distinct n-grams first (partial
    * agg), then one equi-shuffle on the gram joins them — never a
    * doc × doc comparison. The gram can be hashed ([[Dedup.portableHash64]])
    * to shrink the shuffle at 100 TB; the string form here keeps the
    * DuckDB oracle exact.
    */
  def contamination(test: DataFrame, train: DataFrame,
      id: String, text: String, n: Int): DataFrame = {
    val testGrams = ngramOccurrences(test, id, text, n).distinct()
    val trainGrams = ngramOccurrences(train, id, text, n).select("g").distinct()
    testGrams.join(trainGrams, Seq("g"), "left_semi")
      .groupBy(id).agg(count(lit(1)).as("n_shared"))
  }

  /** Deterministic hash sampling: keep rows whose key hashes into
    * `num`/`den` of the hash space. Unlike `DataFrame.sample`, the
    * decision is a pure function of the key — stable across runs,
    * partitionings, and cluster sizes, and reproducible by any engine
    * with md5 ([[Dedup.portableHash64]]); that stability is what makes
    * dataset mixes auditable. Stratify by sampling within group keys.
    */
  def sampleByHash(df: DataFrame, key: Column, num: Int, den: Int): DataFrame = {
    require(num >= 0 && num <= den && den > 0, s"need 0 <= num <= den, got $num/$den")
    df.filter(pmod(Dedup.portableHash64(key.cast("string")), lit(den)) < num)
  }
}
