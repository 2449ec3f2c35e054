package graft
import org.apache.spark.sql.SparkSession
object TimeFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (n <- Seq("q_fuzzy_pairs", "q_fuzzy_entities", "q_fuzzy_resolve"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[t] $n%-20s run$i ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    spark.stop()
  }
}
