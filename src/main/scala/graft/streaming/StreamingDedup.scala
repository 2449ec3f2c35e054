package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate detection: documents arriving on a stream are
  * checked against every document seen so far — at ingest, not as a nightly
  * batch. The batch MinHash+LSH plan ([[Dedup.nearDupPairs]]) becomes a
  * stateful streaming topology:
  *
  *   per-row signature (narrow, the expression form — no shuffle)
  *   → explode (band, bucket) keys
  *   → flatMapGroupsWithState keyed by bucket: state = signatures seen in
  *     this bucket; each new doc emits a candidate per stored signature
  *     whose estimated Jaccard (matching-lane fraction) clears the bar
  *
  * State is bounded by bucket occupancy (near-dup clusters), not corpus
  * size: a doc's signature lands in `bands` buckets, and unrelated docs
  * rarely share one. The same pair can surface from several buckets —
  * exactly-once pair emission would need a second stateful dedup; route
  * candidates through `dropDuplicates` downstream or dedup at the sink.
  */
object StreamingDedup {

  final case class Candidate(a_id: Long, b_id: Long, est_jaccard: Double)

  def nearDupCandidates(
      docs: DataFrame, id: String, text: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      minEstJaccard: Double = 0.7): Dataset[Candidate] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = numHashes / bands
    val sig = Dedup.minHashSignature(Dedup.shingles(col(text), shingleN), numHashes)
    val keyed = docs
      .select(col(id).cast("long").as("doc_id"), sig.as("sig"))
      .withColumn("bk", explode(Dedup.lshBandKeys(col("sig"), bands, r)))
      .select(col("bk.band"), col("bk.bucket"), col("doc_id"), col("sig"))
      .as[(Int, Long, Long, Seq[Long])]

    keyed.groupByKey(x => (x._1, x._2))
      .flatMapGroupsWithState[List[(Long, Seq[Long])], Candidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[Candidate]
          rows.foreach { case (_, _, docId, docSig) =>
            seen.foreach { case (prevId, prevSig) =>
              if (prevId != docId) {
                val est = prevSig.iterator.zip(docSig.iterator)
                  .count { case (a, b) => a == b }.toDouble / docSig.size
                if (est >= minEstJaccard)
                  out += Candidate(math.min(prevId, docId), math.max(prevId, docId), est)
              }
            }
            seen = (docId, docSig) :: seen
          }
          state.update(seen)
          out.result().iterator
      }
  }

  final case class LineOut(doc_id: Long, pos: Int, line: String, keep: Boolean)

  /** Line-level dedup at ingest — the streaming twin of
    * [[Dedup.lineDedup]]: each arriving document's lines are checked
    * against every line EVER seen, keyed by line digest in the state
    * store; the first occurrence (by (doc_id, pos) within a batch, by
    * arrival across batches) keeps, repeats drop, blank lines are
    * structural and bypass state. Emits one (doc_id, pos, line, keep) row
    * per input line — documents arrive whole, so the sink rebuilds a doc
    * from its kept lines within the same micro-batch (no cross-batch doc
    * state needed; see the spec).
    *
    * State is one boolean per DISTINCT line — the persistable form of the
    * batch operator's first-occurrence table, partitioned by digest hash
    * across executors. Equals the batch operator when ids arrive in
    * ascending order (the ingest contract; out-of-order arrival resolves
    * by arrival time, which is the streaming-correct answer).
    */
  def lineDedupAtIngest(docs: DataFrame, id: String, text: String,
      sep: String = "\n"): Dataset[LineOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lines = docs
      .select(col(id).cast("long").as("doc_id"),
        posexplode(split(col(text), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .select(md5(col("line")).as("h"), col("doc_id"), col("pos"), col("line"))
      .as[(String, Long, Int, String)]
    lines.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, LineOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var seen = state.getOption.getOrElse(false)
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).map {
            case (_, docId, pos, line) =>
              val blank = line.trim.isEmpty
              val keep = blank || !seen
              if (!blank && !seen) seen = true
              LineOut(docId, pos, line, keep)
          }
          if (seen) state.update(true)
          out.iterator
      }
  }
}
