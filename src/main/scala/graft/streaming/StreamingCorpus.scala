package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

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

  final case class Admitted(stratum: String, key: Long, seq: Long)

  /** Per-stratum admission quota at ingest — the streaming face of
    * [[graft.operators.Corpus.capPerStratum]]: admit rows first-come
    * until each stratum's `quota` is filled, then drop. (Best-N-by-score
    * is inherently retractive — a better late row would have to EVICT an
    * already-emitted one, which append semantics cannot do — so the
    * ingest-time contract is a quota, exactly how a crawl frontier or
    * per-domain rate cap behaves; run the batch cap over the admitted
    * corpus when best-N matters.)
    *
    * State per stratum is ONE long (the admitted count). Within a
    * micro-batch rows are ordered by (`seq`, `key`) before admission —
    * Spark does not guarantee per-group iterator order after the shuffle,
    * so an explicit sort key is what makes admission deterministic and
    * retry-stable (the snapshotEvery lesson); across batches admission
    * order is arrival order, as for any quota.
    */
  final case class Sharded(shard: Long, key: Long, seq: Long)

  /** Continuous export sharding at ingest — the streaming face of
    * [[graft.operators.Corpus.shuffleShards]] (and seed-0
    * [[graft.operators.Corpus.exportShards]]' hash layout): each arriving
    * row gets its deterministic shard (portable hash of (seed, key)) and
    * a dense per-shard `seq` from a ledger that CONTINUES across
    * micro-batches — the WireLog offset-ledger pattern applied to corpus
    * export. Already-emitted (shard, seq) assignments never renumber when
    * later data arrives, which is what lets a training job consume shards
    * while ingest is still appending (append-stable resume).
    *
    * Within a micro-batch rows order by (hash, key) — exactly
    * shuffleShards' within-shard order, so ONE batch reproduces the batch
    * operator bit-for-bit (spec-pinned); across batches order is arrival
    * order, as for any log (a global (hash, key) order over not-yet-seen
    * rows is unknowable at append time — run the batch shuffle for a
    * frozen corpus when the full permutation matters).
    *
    * State per shard is ONE long (the next seq); the in-batch sort is
    * bounded by one shard's slice of one micro-batch.
    */
  def exportShardsAtIngest(rows: DataFrame, key: String, seed: Long,
      numShards: Int): Dataset[Sharded] = {
    require(numShards > 0, s"need numShards > 0, got $numShards")
    val spark = rows.sparkSession
    import spark.implicits._
    val h = graft.operators.Dedup.portableHash64(
      concat(lit(seed.toString), lit(":"), col(key).cast("string")))
    rows
      .select(col(key).cast("long").as("_k"), h.as("_h"),
        pmod(h, lit(numShards.toLong)).as("_sh"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Long, Sharded](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (shard, it, state) =>
          var next = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Sharded]
          it.toSeq.sortBy(r => (r._2, r._1)).foreach { case (k, _, _) =>
            next += 1
            out += Sharded(shard, k, next)
          }
          state.update(next)
          out.result().iterator
      }
  }

  /** One appended in-context slot: the doc, the standing doc it anchored
    * to (itself when unmatched), and its issued position.
    */
  final case class IcpSlot(doc_id: Long, anchor: Long, icp_pos: Long)

  /** In-context packing at ingest — the streaming twin of
    * [[graft.operators.Corpus.icpAttach]]: arriving documents append to
    * the STANDING in-context order (built once by
    * [[graft.operators.Corpus.icpOrder]] over the frozen pair-graph
    * artifact — `graft.state.Artifacts.savePairGraph` — and persisted
    * with the corpus release). `cands` is the arriving stream LEFT-joined
    * to its match candidates against the standing corpus ((doc_id,
    * old_id?, score?) — at least one row per doc); the join to
    * `standingOrder` is stream-static under the frozen artifact, so the
    * scoring stays distributed. Each doc anchors to its best candidate
    * (score desc, old_id asc) among candidates present in the standing
    * order, and positions issue from a ledger that CONTINUES across
    * micro-batches starting at `basePos` (the standing order's max) —
    * issued positions never renumber, the same append-stability contract
    * as [[exportShardsAtIngest]].
    *
    * The ledger is deliberately ONE group: a dense global append order
    * is a log, and a log has one tail. The per-record work there is a
    * sort of one micro-batch's doc list and a counter bump — all
    * scoring/joining runs distributed upstream. Within a micro-batch
    * docs order by (anchor's standing position, doc_id) — exactly the
    * batch operator's order, so ONE batch reproduces [[Corpus.icpAttach]]
    * bit-for-bit and K batches equal K sequential batch applications
    * (spec-pinned); across batches order is arrival order, as for any
    * log.
    */
  def icpAttachAtIngest(cands: DataFrame, standingOrder: DataFrame,
      basePos: Long): Dataset[IcpSlot] = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .select(col("doc_id").cast("long"), col("old_id").cast("long"),
        col("score").cast("long"))
      .join(standingOrder.select(col("doc_id").cast("long").as("old_id"),
        col("icp_pos").cast("long").as("_iaP")), Seq("old_id"), "left")
      .select(col("doc_id"), col("old_id"), col("score"), col("_iaP"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Long, IcpSlot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var next = state.getOption.getOrElse(basePos)
          val slots = rows.toSeq.groupBy(_._1).toSeq.map { case (docId, cs) =>
            // best positioned candidate: max (score, -old_id), the
            // matching family's total order
            val best = cs.collect {
              case (_, Some(o), Some(sc), Some(p)) => ((sc, -o), p, o)
            }.sortBy(_._1).lastOption
            best match {
              case Some((_, p, o)) => (p, docId, o)
              case None => (Long.MaxValue, docId, docId)
            }
          }.sortBy(t => (t._1, t._2))
          val out = slots.map { case (_, docId, anchor) =>
            next += 1
            IcpSlot(docId, anchor, next)
          }
          state.update(next)
          out.iterator
      }
  }

  /** One appended pack slot: the doc's global token offset and the
    * training-sequence ids it lands in (the packGlobal outputs).
    */
  final case class PackSlot(doc_id: Long, global_start: Long,
      first_seq: Long, last_seq: Long)

  /** Concat-and-split packing at ingest — the streaming twin of
    * [[graft.operators.Corpus.packByOrder]]'s append hook: arriving
    * documents EXTEND the standing token stream (packed offline to
    * total `baseOffset`) and keep cutting training sequences at
    * absolute `seqLen` boundaries, so a training job can consume
    * sequences while ingest appends (the exportShardsAtIngest
    * append-stability contract: issued offsets never renumber).
    *
    * The ledger (the stream's running token total) is ONE long in ONE
    * group — a token stream, like a log, has one tail; all per-record
    * work upstream is stateless. Within a micro-batch docs order by
    * (`pos`, doc_id) — so ONE batch reproduces
    * `packByOrder(batch, pos, tokens, seqLen, baseOffset = ledger)`
    * bit-for-bit (spec-pinned) and K batches equal K sequential batch
    * applications; across batches order is arrival order. Token counts
    * must be non-negative (zero-token docs land at their offset with a
    * zero span, as in the batch form).
    */
  def packAppendAtIngest(rows: DataFrame, seqLen: Int,
      baseOffset: Long): Dataset[PackSlot] = {
    require(seqLen > 0, s"need seqLen > 0, got $seqLen")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col("doc_id").cast("long"), col("pos").cast("long"),
        col("n_tok").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Long, PackSlot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          var off = state.getOption.getOrElse(baseOffset)
          val out = it.toSeq.sortBy(r => (r._2, r._1)).map {
            case (docId, _, t) =>
              require(t >= 0,
                s"packAppendAtIngest needs non-negative token counts, " +
                  s"doc $docId has $t")
              val start = off
              off += t
              PackSlot(docId, start, start / seqLen,
                if (t == 0) start / seqLen else (start + t - 1) / seqLen)
          }
          state.update(off)
          out.iterator
      }
  }

  def admitQuotaAtIngest(rows: DataFrame, stratum: String, key: String,
      seq: String, quota: Int): Dataset[Admitted] = {
    require(quota > 0, s"need quota > 0, got $quota")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col(stratum).cast("string").as("_s"),
        col(key).cast("long").as("_k"), col(seq).cast("long").as("_q"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (s, it, state) =>
          var count = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Admitted]
          it.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, k, q) =>
            if (count < quota) {
              out += Admitted(s, k, q)
              count += 1
            }
          }
          state.update(count)
          out.result().iterator
      }
  }
}
