package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Streaming context-window preparation at ingest — the deployment shape
  * of `Corpus.chunk` + `Corpus.packChunks`: documents arrive whole (one
  * row per document, the Kafka-record shape of `k_source.go:51-67`), and
  * each is chunked into token windows and greedily packed into
  * fixed-budget bins IN THE SAME ROW, before the explode. Because packing
  * never mixes documents, the whole operator is a narrow per-row
  * projection: no shuffle, no state store, append-mode safe,
  * checkpoint-free — the same call works identically on a batch frame.
  *
  * Contrast with the batch pipeline, which chunks first and re-groups by
  * document to pack (one shuffle): the stream gets the packing for free
  * because the document boundary IS the row boundary at ingest. The
  * window list and the greedy fold are the SAME definitions the batch
  * operators use (`Corpus.tokenWindows` / `Corpus.greedyPackFold`), so
  * the two forms cannot drift; a test additionally pins them equal.
  *
  * Output: (id, [keepCols...], chunk_no, chunk_tokens, chunk_md5, bin) —
  * the batch pipeline's columns, one row per chunk.
  */
object StreamingCorpus {

  def chunkAndPackAtIngest(docs: DataFrame, id: String, text: String,
      chunkTokens: Int, overlapTokens: Int, capacity: Int,
      keepCols: Seq[String] = Nil): DataFrame = {
    // the fold's accumulator carries (md5, n, bin) directly so the
    // explode below needs no re-join
    val packed = Corpus.greedyPackFold(col("_g_ws"), capacity,
      "md5", "string", w => md5(w.getField("txt")))
    val kept = keepCols.map(col)
    docs
      .withColumn("_g_ws", Corpus.tokenWindows(col(text), chunkTokens, overlapTokens))
      .select((col(id) +: kept) :+ posexplode(packed): _*)
      .select(
        (col(id) +: kept) ++ Seq(
          col("pos").as("chunk_no"),
          col("col.n").as("chunk_tokens"),
          col("col.md5").as("chunk_md5"),
          col("col.bin").as("bin")): _*)
  }
}
