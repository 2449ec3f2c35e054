package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.dsl.KGlobalTable

/** The reference's GlobalTable stays continuously synced from its topic and
  * every stream record joins against the CURRENT table state
  * (`/root/reference/kstream/global_table_stream.go:64-176`, SURVEY §3.3).
  * The Spark form: re-materialize the snapshot per micro-batch inside
  * `foreachBatch` — each batch joins the freshest table, broadcast to
  * executors by the join itself. For slow-changing dims, swap `load` for a
  * cached loader with a TTL; for truly static dims use the plain
  * stream-static join (Spark re-plans it per batch anyway).
  */
object GlobalTableRefresh {

  /** Stream–global-table join with per-batch table refresh. `load` runs on
    * the driver each micro-batch (e.g. re-reads a compacted topic snapshot
    * or a dimension path); `sink` receives the enriched batch.
    *
    * Bootstrap depth is `load`'s choice — the reference's
    * `GlobalTableOffsetDefault` (replay the topic from offset 0,
    * kstream/global_table.go:20-29) is a full snapshot load; its
    * `GlobalTableOffsetLatest` ("skip history") is a load over only-new
    * records, e.g. a Kafka read opened with
    * [[graft.io.KafkaIO.tableStartingOffsets]]`(skipHistory = true)`.
    */
  def enrichEachBatch(
      stream: DataFrame,
      load: () => KGlobalTable,
      fk: Column,
      joinType: String = "inner")(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(load().join(batch, fk, joinType), batchId)
    }
}

/** Per-record retries + DLQ routing (the reference's
  * `stream.processor.retry` config, default 2 retries / 100 ms —
  * kstream/k_stream.go:120-132 — and the DLQ escape, kstream/dlq/
  * dlq.go:14-87). On Spark the retry unit is the micro-batch body; rows
  * that keep a batch failing are split out with [[graft.io.KafkaIO.dlqSplit]].
  */
object Resilience {

  def withRetries[T](attempts: Int, intervalMs: Long)(body: => T): T = {
    var left = attempts
    while (true) {
      try return body
      catch {
        case e: Throwable if left > 0 =>
          left -= 1
          Thread.sleep(intervalMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Wrap a foreachBatch body with bounded retries. */
  def foreachBatchWithRetry(
      attempts: Int = 2, intervalMs: Long = 100)(
      body: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, id) => withRetries(attempts, intervalMs)(body(batch, id))
}
