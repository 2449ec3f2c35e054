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
}
