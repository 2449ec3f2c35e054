package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{KRecord, StreamingState}

/** Exactly-once recovery — the behavior that subsumes the reference's
  * whole changelog/replica subsystem (SURVEY S5: mark/replay topics,
  * standby replicas, last-write-wins replay dedup): stop a checkpointed
  * stateful query, restart it from the checkpoint against a durable sink,
  * and the state continues exactly where it left off — a value already
  * seen before the restart is still suppressed after it.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stateful query resumes from checkpoint with state intact") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[KRecord]
    def start() =
      StreamingState.distinctUntilChanged(mem.toDS())
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append())
        .start()

    // phase 1: establish state, then stop
    val q1 = start()
    try {
      mem.addData(KRecord("a", 1, "x"))
      q1.processAllAvailable()
    } finally q1.stop()

    // phase 2: restart from the checkpoint; the same value again must be
    // SUPPRESSED (state survived), a new value must pass
    val q2 = start()
    try {
      mem.addData(KRecord("a", 2, "x"))
      mem.addData(KRecord("a", 3, "y"))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(s"$dir/out").as[KRecord].collect().sortBy(_.ord)
    assert(rows.map(r => (r.ord, r.value)).toSeq === Seq((1L, "x"), (3L, "y")))
  }

  test("ledgered foreachBatch harness resumes from checkpoint: batch ids continue, offsets stay append-stable") {
    // the versioned-artifact twins' recovery story run for REAL: stop a
    // checkpointed ingest query, restart it from the same checkpoint,
    // and the continuation batch reads its base from the ledger written
    // before the restart — already-issued offsets never renumber
    import graft.streaming.StreamingCorpus
    val dir = Files.createTempDirectory("graft_ckpt_pack").toString
    val state = s"$dir/state"
    val mem = MemoryStream[(Long, Long, Long)]
    def start() = mem.toDF().toDF("doc_id", "pos", "n_tok").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(StreamingCorpus.packAppendAtIngest(
        state, seqLen = 64, baseOffset = 1000L))
      .start()

    val q1 = start()
    try {
      mem.addData((3L, 10L, 63L), (4L, 20L, 65L))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterB1 = StreamingCorpus.standingPackSlots(spark, state)
      .select("doc_id", "global_start").as[(Long, Long)].collect().toSet
    assert(afterB1 === Set((3L, 1000L), (4L, 1063L)))

    val q2 = start()
    try {
      mem.addData((7L, 30L, 100L))
      q2.processAllAvailable()
    } finally q2.stop()
    val all = StreamingCorpus.standingPackSlots(spark, state)
      .select("doc_id", "global_start").as[(Long, Long)].collect().toSet
    assert(all === afterB1 + ((7L, 1128L)),
      "the post-restart batch must continue from the pre-restart ledger")
    assert(graft.state.Artifacts.readLedger(spark, s"$state/ledger")
      === Some(1228L))
  }
}
