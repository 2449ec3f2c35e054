package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Prints the formatted physical plan of the suffix-array numbering
  * stage in both forms (r13 optimization evidence, plans/r13/):
  * the generic range form (what the construction loop used through
  * round 12 — sampled range exchange + window re-exchange on
  * spark_partition_id) vs the dense-primary arithmetic-bucket form
  * (one hash exchange; the window reuses the bucket partitioning).
  * The final query plans cannot show this stage — every round is
  * checkpointed — so this probe explains the pre-checkpoint stage the
  * way PlanShapeSpec pins it.
  */
object ProbeDenseNumberPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the construction loop's tuple shape: previous-round dense rank +
    // three shifted ranks
    val rows = spark.range(100000).select(
      (col("id") % 4000 + 1).as("rank"), (col("id") % 17).as("_saZ1"),
      (col("id") % 5).as("_saZ2"), (col("id") % 3).as("_saZ3"))
    val keys = Seq(col("rank"), col("_saZ1"), col("_saZ2"), col("_saZ3"))
    import org.apache.spark.sql.expressions.Window
    val rangeForm = rows.repartitionByRange(32, keys: _*)
      .withColumn("_dnP", spark_partition_id())
      .withColumn("_dnL", dense_rank().over(
        Window.partitionBy(col("_dnP")).orderBy(keys: _*)).cast("long"))
    val denseForm = graft.operators.SuffixArray.denseNumberDenseLocal(
      rows, col("rank"), 4000L, keys, buckets = 32)
    println("===== sa_numbering_stage_before =====")
    println(rangeForm.queryExecution.explainString(FormattedMode))
    println("===== sa_numbering_stage_after =====")
    println(denseForm.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
