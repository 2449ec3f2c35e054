package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files probe for the versioned slice logs (round 11): the
  * foreachBatch harnesses write one `batch=N` parquet directory per
  * micro-batch — correct and replay-idempotent, but the standing read
  * (`Artifacts.readSlices`) then pays per-slice costs that have nothing
  * to do with row count: directory listing, one parquet footer per
  * slice, one scan task per tiny file. This probe holds the DATA
  * constant-ish (a few rows per slice) and grows only the SLICE COUNT,
  * then times the standing read before and after
  * `Artifacts.compactSlices` — the claim under test is "compaction
  * makes the standing read flat in batch count", which is what lets an
  * ingest tier run for months.
  *
  *   sbt "Test/runMain graft.ProbeSliceCompaction <slices,slices,...>"
  *
  * (SPARK_GRAFT_PASSES for min_of_N on the timed reads; slice creation
  * is once per point.)
  */
object ProbeSliceCompaction {
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

    val counts = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
      else Seq(64, 512)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val ddl = "doc_id BIGINT, n_tok BIGINT, batch BIGINT"
    val root = java.nio.file.Files.createTempDirectory("graft_slice_probe")

    def timeRead(dir: String): Double = {
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.state.Artifacts.readSlices(spark, dir, ddl).count()
        require(n > 0)
        (System.nanoTime() - t0) / 1e9
      }
      times.min
    }

    for (s <- counts) {
      val dir = s"$root/slots_$s"
      (0 until s).foreach { n =>
        Seq((n.toLong, 100L), (n.toLong + 1, 50L)).toDF("doc_id", "n_tok")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=$n")
      }
      val sliced = timeRead(dir)
      println(f"[probe] slices=$s uncompacted min_of_$passes=$sliced%.2f s")
      graft.state.Artifacts.compactSlices(spark, dir, upTo = s - 2L, ddl = ddl)
      val compacted = timeRead(dir)
      println(f"[probe] slices=$s compacted   min_of_$passes=$compacted%.2f s")
      // the fold must preserve every row (count is 2 per slice here)
      require(graft.state.Artifacts.readSlices(spark, dir, ddl).count() == 2L * s)
    }
    spark.stop()
  }
}
