package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Width-cap probe for the suffix-array family (VERDICT r8 task 5):
  * the fixed-window consumers (`stripRepeatedKeepFirst`,
  * `contaminatedSpans`, both windowLen = 8 in the bench) already cut
  * construction at ⌈log₄ L⌉ rounds via `windowClassKeys`' maxPrefix —
  * this probe MEASURES what that cap is worth by timing the capped
  * construction against the full (converged) construction on the same
  * labeled union frame the contamination consumer builds, min_of_2
  * each. Also attributes `repeatedSpans` (the #1 wall-clock row, which
  * genuinely needs full ranks for exact LCP): construction vs
  * prefilter+walk split.
  *
  *   sbt "Test/runMain graft.ProbeSaWidthCap /root/testdata/sf0.1"
  */
object ProbeSaWidthCap {
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
    // the contaminatedSpans union shape: test (odd) + train (even)
    val lab = docs.select((col("doc_id").cast("long") * 2 + 1).as("_d"),
        col("text").as("_t"))
      .unionByName(docs.select((col("doc_id").cast("long") * 2).as("_d"),
        col("text").as("_t")))
    val windowLen = 8
    val jWant = (63 - java.lang.Long.numberOfLeadingZeros(windowLen.toLong)) / 2
    val capped = 1L << (2 * jWant)
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def time(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag $sec%.2f s")
      clear()
      sec
    }
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
    def rec(tag: String)(body: => Unit): Unit =
      results(tag) = time(tag)(body) :: results.getOrElse(tag, Nil)

    for (_ <- 1 to 2) {
      rec(s"construction capped(maxPrefix=$capped)") {
        graft.operators.SuffixArray
          .suffixRanksAll(lab, "_d", "_t", 0, capped)
          .full.write.format("noop").mode("overwrite").save()
      }
      rec("construction full(converged)") {
        graft.operators.SuffixArray
          .suffixRanksAll(lab, "_d", "_t", 0)
          .full.write.format("noop").mode("overwrite").save()
      }
      rec("repeatedSpans total(minLen=8)") {
        graft.operators.SuffixArray
          .repeatedSpans(docs, "doc_id", "text", minLen = 8)
          .write.format("noop").mode("overwrite").save()
      }
      rec("repeatedSpans construction-only") {
        graft.operators.SuffixArray
          .suffixRanksAll(docs, "doc_id", "text", 0)
          .full.write.format("noop").mode("overwrite").save()
      }
    }
    results.toSeq.sortBy(_._1).foreach { case (tag, ts) =>
      println(f"[probe] MIN $tag = ${ts.min}%.2f s")
    }
    spark.stop()
  }
}
