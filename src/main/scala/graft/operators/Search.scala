package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus search scoring — the retrieval side of a training-data platform
  * (mining documents for a topic, building eval sets). Complements the
  * exact/ANN embedding search in [[Similarity]] with lexical ranking over
  * the inverted-index statistics.
  */
object Search {

  /** BM25 ranking of documents for a bag of query terms, with a LOG-FREE
    * rational idf: `(N − df + 0.5) / (df + 0.5)` instead of its logarithm.
    * `ln` is deliberately avoided: libm implementations differ in the last
    * ulp across engines, so a log-based score could not be verified
    * bit-exactly by a cross-engine oracle. The rational form is a strictly
    * monotone function of the classic idf, so rankings by a single term
    * agree; multi-term totals weight rare terms more sharply — acceptable
    * for corpus mining, and stated here so the choice is explicit.
    *
    * All inputs to the arithmetic are exact integers (term/doc counts,
    * doc lengths), every division is a single IEEE op, and the per-term
    * scores sum in a FIXED left-to-right term order — identical bits in
    * any engine evaluating the same expression tree, which is what lets
    * the DuckDB oracle pin the exact top-k.
    *
    * Scale shape: ONE pass over the exploded tokens — a per-doc partial
    * agg computing length and every per-term tf together (conditional
    * sums). Everything else derives from that one-row-per-doc frame: doc
    * count, average length, and per-term dfs (docs with tf > 0) in a
    * single O(1)-row global agg, broadcast to the scorer; a TakeOrdered
    * keeps the top-k. No shuffle carries more than one row per document.
    */
  def bm25TopK(docs: DataFrame, id: String, text: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val tok = docs.select(col(id), explode(split(lower(col(text)), "\\s+")).as("tk"))
    // length + every per-term tf in ONE per-doc partial agg
    val docStats = tok.groupBy(id).agg(
      count(lit(1)).as("dl"),
      terms.map(t =>
        sum(when(col("tk") === t, 1).otherwise(0)).as(s"tf_$t")): _*)
    val stats = docStats.agg(
      count(lit(1)).as("n"),
      ((sum("dl").cast("double") / count(lit(1))).as("avglen") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).as(s"df_$t"))): _*)
    val lenNorm = lit(1.0) - b + lit(b) * (col("dl").cast("double") / col("avglen"))
    val score = terms.map { t =>
      ((col("n").cast("double") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5)) *
        ((col(s"tf_$t") * lit(k1 + 1)) / (col(s"tf_$t") + lit(k1) * lenNorm))
    }.reduce(_ + _)
    docStats
      .crossJoin(broadcast(stats))
      .select(col(id), score.as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }
}
