package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-task funnel probe for the ledgered at-ingest twins (VERDICT
  * r10 task 1): the pre-round-11 `packAppendAtIngest` /
  * `icpAttachAtIngest` shuffled EVERY row of a micro-batch to one
  * `groupByKey(_ => 0)` group and materialized it with `.toSeq` in that
  * task's heap — correct (the ledger tail is genuinely sequential) but a
  * single-task memory/throughput funnel at exactly the continuous-ingest
  * regime the twins were built for. The round-11 form runs the
  * DISTRIBUTED batch operator per micro-batch (`Corpus.packByOrder`'s
  * range-exchange prefix sum; `icpAttach`'s denseNumber — the same
  * numbering machinery, so the pack twin is the representative probe)
  * and carries only the running base through the tail, one ledger row
  * per batch.
  *
  * The probe grows ONE micro-batch 100× (1e5 → 1e7 rows) and reports,
  * per form:
  *   - max shuffle-read records landing in ANY single task — the
  *     concentration measure: the one-group form concentrates ALL n
  *     rows in one task (grows 1:1 with the batch), the ledger form's
  *     largest task holds ~n/buckets spillable-SORT rows and its only
  *     driver-side materialization is the ≤ buckets per-partition bases
  *     (O(1) in the batch);
  *   - max task peakExecutionMemory — flat for the ledger form (the
  *     sort spills); NOTE the one-group `.toSeq` is USER heap, invisible
  *     to this metric, which is exactly why it OOMs without warning;
  *   - wall seconds.
  *
  * Each form can run in its OWN JVM (the ProbeIvfBroadcast discipline:
  * a task-thread OutOfMemoryError kills the process, so a one-group
  * death at a heap the ledger form survives must not take the ledger
  * measurements down with it):
  *
  *   sbt "Test/runMain graft.ProbeLedgerTwins <ledger|onegroup|both> <n,n,...>"
  *
  * with SPARK_DRIVER_MEM sizing the forked heap (memory: the one-group
  * Seq is ~50-80 B/row of untracked objects on top of the shuffle).
  */
object ProbeLedgerTwins {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val maxRecords = new AtomicLong
    val maxPeak = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          maxRecords.getAndUpdate(c => math.max(c, m.shuffleReadMetrics.recordsRead))
          maxPeak.getAndUpdate(c => math.max(c, m.peakExecutionMemory))
        }
      }
    })

    val formWanted = args.headOption.getOrElse("both")
    val ns = if (args.length > 1) args(1).split(",").map(_.toLong).toSeq
      else Seq(100000L, 1000000L, 10000000L)
    val root = java.nio.file.Files.createTempDirectory("graft_ledger_probe")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "1").toInt
    val results = scala.collection.mutable.Map.empty[String, List[Double]]

    for (pass <- 1 to passes; n <- ns) {
      // one micro-batch: sparse shuffled pos, realistic token counts
      def batch = spark.range(n).select(
        col("id").as("doc_id"),
        ((col("id") * 2654435761L) % (n * 8)).as("pos"),
        (col("id") % 1900 + 100).as("n_tok"))

      for ((tag, run) <- Seq[(String, () => Unit)](
        "ledger  " -> (() => {
          val state = s"$root/state_${pass}_$n"
          graft.streaming.StreamingCorpus.ingestPackBatch(
            batch, state, batchId = 0L, seqLen = 2048, baseOffset = 0L)
          ()
        }),
        "onegroup" -> (() => {
          // the pre-round-11 shape, reconstructed as the measured
          // baseline: all rows to ONE group, materialized via .toSeq
          batch.as[(Long, Long, Long)]
            .groupByKey(_ => 0)
            .flatMapGroups { (_, it) =>
              var off = 0L
              it.toSeq.sortBy(r => (r._2, r._1)).map { case (docId, _, t) =>
                val start = off
                off += t
                (docId, start, start / 2048, (start + math.max(t - 1, 0)) / 2048)
              }.iterator
            }
            .write.format("noop").mode("overwrite").save()
        }))
        .filter { case (tag, _) =>
          formWanted == "both" || formWanted == tag.trim }) {
        maxRecords.set(0L); maxPeak.set(0L)
        val t0 = System.nanoTime()
        run()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] pass=$pass n=$n $tag $sec%.2f s " +
          f"maxTaskRecords=${maxRecords.get()} " +
          f"peakExecMB=${maxPeak.get() / 1e6}%.1f")
        results(f"n=$n%8d $tag") =
          sec :: results.getOrElse(f"n=$n%8d $tag", Nil)
      }
    }
    results.toSeq.sortBy(_._1).foreach { case (tag, ts) =>
      println(f"[probe] MIN $tag min_of_$passes=${ts.min}%.2f s")
    }
    spark.stop()
  }
}
