package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Live-ingest maintenance probe (VERDICT r11 task 2): drive the
  * ledgered pack harness for MANY micro-batches — the months-of-ingest
  * regime compressed into one run — with the `compactEvery` policy on
  * or off, and measure the two costs the policy exists to bound:
  *
  *   - per-batch wall time (windowed average): without maintenance the
  *     ledger's version listing grows one directory per batch and each
  *     `readLedger` pays an ever-longer `listStatus`; with the policy
  *     (`pruneVersions` keep-2) it is flat;
  *   - standing read time (sampled every `sample` batches): without
  *     compaction `standingPackSlots` opens one tiny parquet dir per
  *     historical batch (the small-files regime the compaction-probe
  *     measures in isolation); with `compactSlices` folding all but the
  *     replayable tip it is flat.
  *
  * Batches are TINY (default 32 rows) on purpose: the probe times the
  * MAINTENANCE overhead as a function of batch COUNT, not the
  * distributed per-batch work (ProbeLedgerTwins covers that axis).
  *
  *   sbt "Test/runMain graft.ProbeLedgerMaintenance <compactEvery> <numBatches> [batchRows] [sample]"
  */
object ProbeLedgerMaintenance {
  def main(args: Array[String]): Unit = {
    val compactEvery = args.headOption.map(_.toInt).getOrElse(64)
    val numBatches = args.lift(1).map(_.toInt).getOrElse(10000)
    val batchRows = args.lift(2).map(_.toInt).getOrElse(32)
    val sample = args.lift(3).map(_.toInt).getOrElse(math.max(numBatches / 10, 1))
    val window = math.max(numBatches / 20, 1)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val state = java.nio.file.Files
      .createTempDirectory("graft_ledger_maint").toString + "/state"
    val ddl = "doc_id BIGINT, pos BIGINT, n_tok BIGINT, global_start BIGINT, " +
      "first_seq BIGINT, last_seq BIGINT, batch BIGINT"
    println(s"[probe] compactEvery=$compactEvery numBatches=$numBatches " +
      s"batchRows=$batchRows window=$window sample=$sample")

    var windowStart = System.nanoTime()
    for (b <- 0 until numBatches) {
      val batch = spark.range(batchRows).select(
        (col("id") + b.toLong * batchRows).as("doc_id"),
        ((col("id") * 2654435761L) % (batchRows * 8)).as("pos"),
        (col("id") % 1900 + 100).as("n_tok"))
      graft.streaming.StreamingCorpus.ingestPackBatch(
        batch, state, batchId = b.toLong, seqLen = 2048, baseOffset = 0L)
      graft.state.Artifacts.maybeCompact(spark, b.toLong, compactEvery,
        sliceDirs = Seq(s"$state/slots" -> ddl),
        versionDirs = Seq(s"$state/ledger"))
      if ((b + 1) % window == 0) {
        val sec = (System.nanoTime() - windowStart) / 1e9
        println(f"[probe] batches=${b + 1}%6d perBatch=${sec / window}%.3f s " +
          f"(window of $window)")
        windowStart = System.nanoTime()
      }
      if ((b + 1) % sample == 0) {
        val t0 = System.nanoTime()
        val n = graft.streaming.StreamingCorpus
          .standingPackSlots(spark, state).count()
        println(f"[probe] batches=${b + 1}%6d standingRead=" +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        windowStart = System.nanoTime() // don't charge the read to the window
      }
    }
    spark.stop()
  }
}
