package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016, the
  * standard subword-vocabulary construction) — the tokenizer-training leg
  * of a pretraining pipeline, next to the vocabulary stats
  * (`q_vocab_topk`) and token counting (`TextAnalysis`).
  *
  * Scale shape: the corpus collapses to its WORD-FREQUENCY table first
  * (one corpus-sized explode + count shuffle — the same vocab artifact
  * `q_vocab_topk` builds); everything after runs on that vocab-sized
  * frame: each merge round is a pair-count aggregate over distinct words
  * weighted by frequency, and only the single argmax row reaches the
  * driver per round (like the k-means trainer's per-round count). BPE's
  * merge sequence is inherently serial, so rounds are driver-sequenced —
  * production trainers cap the word table (frequency floor / top-N) so
  * thousands of rounds stay cheap; pass such a cap via `minFreq`.
  *
  * This trains PLAIN character BPE (no end-of-word marker) — stated so
  * the oracle and the spec hand-computation are unambiguous. Symbols are
  * Java chars (UTF-16 code units): fine for BMP scripts; a non-BMP
  * code point would split into surrogates.
  */
object Bpe {

  /** The corpus word-frequency table: (word, f), lowercased whitespace
    * tokens — the persistable artifact every round of training consumes.
    */
  def wordFreq(docs: DataFrame, text: String, minFreq: Long = 1L): DataFrame = {
    require(minFreq >= 1, s"need minFreq >= 1, got $minFreq")
    docs.select(explode(split(lower(col(text)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .filter(col("f") >= minFreq)
  }

  /** Round-0 adjacent-symbol pair counts over a (word, f) table: each
    * word contributes its adjacent character pairs weighted by corpus
    * frequency — the statistic BPE's first merge argmaxes over. Output
    * (a, b, n); single-char words contribute nothing. Vocab-sized work:
    * the explode is ≤ (word length) rows per DISTINCT word.
    */
  def pairStats(vocab: DataFrame): DataFrame =
    vocab
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("f"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(col("f"),
        expr("substring(word, i, 1)").as("a"),
        expr("substring(word, i + 1, 1)").as("b"))
      .groupBy("a", "b").agg(sum("f").as("n"))

  /** One learned merge: rank order, the merged pair, and its count at
    * selection time.
    */
  final case class Merge(rank: Int, a: String, b: String, n: Long)

  /** Train `merges` BPE merges on the corpus: build the word-frequency
    * table once, then per round count adjacent SYMBOL pairs (weighted by
    * word frequency), pick the most frequent pair (ties: lexicographic
    * smallest, so the sequence is deterministic), and apply it
    * left-to-right non-overlapping inside every word. Returns the ordered
    * merge table — the tokenizer artifact (applying it to new text IS the
    * tokenizer).
    */
  def train(docs: DataFrame, text: String, merges: Int,
      minFreq: Long = 1L): Seq[Merge] = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Seq[String], Long)] = wordFreq(docs, text, minFreq)
      .select(split(col("word"), "").as("sym"), col("f"))
      .as[(Seq[String], Long)]
      .localCheckpoint(true)
    val out = Seq.newBuilder[Merge]
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      val top = vocab.flatMap { case (sym, f) =>
          if (sym.length < 2) Iterator.empty
          else sym.iterator.zip(sym.iterator.drop(1)).map { case (x, y) => (x, y, f) }
        }
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .as[(String, String, Long)]
        .take(1)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = top.head
        out += Merge(r, a, b, n)
        val merged = vocab.map { case (sym, f) =>
          (mergePair(sym, a, b), f)
        }.localCheckpoint(true)
        vocab.unpersist()
        vocab = merged
        r += 1
      }
    }
    vocab.unpersist()
    out.result()
  }

  /** Apply a trained merge table to a document column: (id, bpe_tokens)
    * rows, each word split to characters and the merges replayed in rank
    * order — the TOKENIZER the training loop exists to produce. Runs on
    * the typed Dataset path (a per-row Scala map over (id, text) pairs,
    * the [[Corpus.packChunksTyped]] precedent — tokenization is honest
    * per-row CPU; no UDF, no shuffle), so the same call works on a
    * streaming frame at ingest. The merge list rides along as a plain
    * broadcast-serialized local. O(merges · word length) per word — fine
    * for vocab-scale merge tables; a production tokenizer keeps a
    * priority-queue per word, same output by construction.
    */
  def tokenize(docs: DataFrame, id: String, text: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = merges.sortBy(_.rank).map(m => (m.a, m.b))
    docs.select(col(id).cast("long"), lower(col(text)))
      .as[(Long, String)]
      .map { case (docId, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty).flatMap { w =>
          ranked.foldLeft(w.split(""): Seq[String]) {
            case (sym, (a, b)) => mergePair(sym, a, b)
          }
        }
        (docId, toks)
      }
      .toDF(id, "bpe_tokens")
  }

  /** Left-to-right non-overlapping merge of adjacent (a, b) into a+b —
    * the standard BPE application rule (aaa with merge (a,a) → [aa, a]).
    */
  private[graft] def mergePair(sym: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i < sym.length - 1 && sym(i) == a && sym(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += sym(i)
        i += 1
      }
    }
    out.toSeq
  }
}
