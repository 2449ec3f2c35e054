package graft

import org.apache.spark.sql.SparkSession

/** Construction-time probe for the suffix-array doubling radix
  * (VERDICT r7 task 8): alternate radix-4 / radix-8 builds over the
  * sf0.1 documents table, min_of_2 each, printed as one line per radix.
  * Test-scope only — production stays radix 4 unless the probe wins.
  *
  *   sbt "Test/runMain graft.ProbeSaRadix /root/testdata/sf0.1"
  */
object ProbeSaRadix {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val times = scala.collection.mutable.Map.empty[Int, List[Double]]
    for (pass <- 1 to 2; radix <- Seq(4, 8)) {
      val t0 = System.nanoTime()
      graft.operators.SuffixArray
        .suffixRanksRadix(docs, "doc_id", "text", 0, Long.MaxValue, radix)
        .full.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      times(radix) = sec :: times.getOrElse(radix, Nil)
      println(f"[probe] pass=$pass radix=$radix $sec%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    times.toSeq.sortBy(_._1).foreach { case (r, ts) =>
      println(f"[probe] radix=$r min_of_2=${ts.min}%.2f s")
    }
    spark.stop()
  }
}
