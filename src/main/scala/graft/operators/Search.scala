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
    // tokens are lowercased, so match terms in lowercase too (an
    // uppercase term would otherwise silently score 0 everywhere);
    // dedupe — a repeated term would double-count and collide columns
    val qTerms = terms.map(_.toLowerCase).distinct
    require(qTerms.nonEmpty, "need at least one query term")
    // columns are indexed, not named after the term: a term containing
    // '.', '`' or a space would break column resolution
    val ti = qTerms.indices
    val tok = docs.select(col(id), explode(split(lower(col(text)), "\\s+")).as("tk"))
    // length + every per-term tf in ONE per-doc partial agg
    val docStats = tok.groupBy(id).agg(
      count(lit(1)).as("dl"),
      ti.map(i =>
        sum(when(col("tk") === qTerms(i), 1).otherwise(0)).as(s"tf_$i")): _*)
    val stats = docStats.agg(
      count(lit(1)).as("n"),
      ((sum("dl").cast("double") / count(lit(1))).as("avglen") +:
        ti.map(i =>
          sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).as(s"df_$i"))): _*)
    val lenNorm = lit(1.0) - b + lit(b) * (col("dl").cast("double") / col("avglen"))
    val score = ti.map { i =>
      ((col("n").cast("double") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5)) *
        ((col(s"tf_$i") * lit(k1 + 1)) / (col(s"tf_$i") + lit(k1) * lenNorm))
    }.reduce(_ + _)
    docStats
      .crossJoin(broadcast(stats))
      .select(col(id), score.as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }
}
