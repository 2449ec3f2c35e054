package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Does a pre-sorted localCheckpoint carry its outputOrdering into the
  * LogicalRDD, letting downstream sort-merge joins skip the big side's
  * per-consumer sort? (r13 probe — decides whether the SA levels and the
  * graph loops' static edge sides should materialize sorted.) Mirrors
  * the construction loop: BOTH sides are doc-partitioned projections of
  * checkpointed frames, joined on (doc, off).
  */
object ProbeSortedCheckpoint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.range(100000).select(
      (col("id") % 997).as("doc"), (col("id") % 31).as("off"),
      col("id").as("rank"))
    def shiftJoin(cur: org.apache.spark.sql.DataFrame): Unit = {
      val shifted = cur.select(col("doc"), (col("off") - lit(1)).as("off"),
        col("rank").as("r1"))
      val j = cur.join(shifted, Seq("doc", "off"), "left")
      println(j.queryExecution.explainString(FormattedMode))
    }
    println("===== shift_join_unsorted_ckpt =====")
    shiftJoin(base.repartition(4, col("doc")).localCheckpoint(true))
    println("===== shift_join_sorted_ckpt =====")
    shiftJoin(base.repartition(4, col("doc"))
      .sortWithinPartitions(col("doc"), col("off")).localCheckpoint(true))
    spark.stop()
  }
}
