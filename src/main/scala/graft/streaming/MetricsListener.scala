package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming metrics observer — the Spark stand-in for the reference's
  * Prometheus observers on every stage (`/root/reference/kstream/
  * processor.go:61-64`, consumer/consumer.go:196-220): per-batch input
  * rows, processed rows/sec, and batch duration, collected from the
  * engine's own instrumentation instead of hand-placed counters. Attach
  * with `spark.streams.addListener`; export to any metrics backend from
  * [[snapshots]].
  */
final class MetricsListener extends StreamingQueryListener {

  final case class BatchMetrics(
      queryName: String, batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double, batchDurationMs: Long)

  private val buf = ArrayBuffer.empty[BatchMetrics]

  def snapshots: Seq[BatchMetrics] = buf.synchronized(buf.toVector)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    buf.synchronized {
      buf += BatchMetrics(
        Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
        p.processedRowsPerSecond, p.batchDuration)
    }
  }
}
