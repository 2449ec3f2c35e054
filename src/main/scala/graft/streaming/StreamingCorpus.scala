package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * because the document boundary IS the row boundary at ingest. A test
  * pins this form equal to `packChunks ∘ chunk` on the same input.
  *
  * Output: (id, [keepCols...], chunk_no, chunk_tokens, chunk_md5, bin) —
  * the batch pipeline's columns, one row per chunk.
  */
object StreamingCorpus {

  def chunkAndPackAtIngest(docs: DataFrame, id: String, text: String,
      chunkTokens: Int, overlapTokens: Int, capacity: Int,
      keepCols: Seq[String] = Nil): DataFrame = {
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunk, got overlap=$overlapTokens chunk=$chunkTokens")
    require(capacity > 0, s"need capacity > 0, got $capacity")
    val stride = chunkTokens - overlapTokens
    val tk = split(col(text), "\\s+")
    val starts = sequence(lit(0), greatest(size(tk) - overlapTokens - 1, lit(0)), lit(stride))
    // (txt, n) per window — same window expression as Corpus.chunk
    val windows = transform(starts, s => struct(
      concat_ws(" ", slice(tk, s + 1, lit(chunkTokens))).as("txt"),
      least(lit(chunkTokens), size(tk) - s).as("n")))
    // greedy pack over the in-row window list — same fold as packChunks,
    // but the accumulator carries (md5, n, bin) directly so the explode
    // below needs no re-join
    val packed = aggregate(
      col("_g_ws"),
      struct(
        array().cast("array<struct<md5:string,n:int,bin:int>>").as("bins"),
        lit(0).as("curBin"), lit(0L).as("curSum")),
      (acc, w) => {
        val n = w.getField("n").cast("long")
        val overflow = acc.getField("curSum") + n > capacity &&
          acc.getField("curSum") > 0
        val bin = when(overflow, acc.getField("curBin") + 1)
          .otherwise(acc.getField("curBin"))
        struct(
          concat(acc.getField("bins"),
            array(struct(md5(w.getField("txt")).as("md5"),
              w.getField("n").as("n"), bin.as("bin")))).as("bins"),
          bin.as("curBin"),
          when(overflow, n).otherwise(acc.getField("curSum") + n).as("curSum"))
      },
      acc => acc.getField("bins"))
    val kept = keepCols.map(col)
    docs
      .withColumn("_g_ws", windows)
      .select((col(id) +: kept) :+ posexplode(packed): _*)
      .select(
        (col(id) +: kept) ++ Seq(
          col("pos").as("chunk_no"),
          col("col.n").as("chunk_tokens"),
          col("col.md5").as("chunk_md5"),
          col("col.bin").as("bin")): _*)
  }
}
