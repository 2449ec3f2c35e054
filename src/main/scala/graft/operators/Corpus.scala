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
