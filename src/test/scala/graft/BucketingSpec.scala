package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioning fact tables on the join key so repeated
  * joins/aggregations run shuffle-free — the batch analog of the
  * reference's co-partitioned repartition topics (SURVEY J4), but paid
  * once at write time instead of per query.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val d = sf
    queries.Tables.t(spark, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    queries.Tables.t(spark, d, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders").hint("merge"), // force SMJ: no broadcast
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must need no exchange — bucketing satisfies the
    // distribution requirement on both sides (one exchange remains for the
    // final o_custkey aggregation, which is keyed differently)
    assert(plan.contains("SortMergeJoin"))
    val exchangesBelowJoin = plan.linesIterator
      .dropWhile(l => !l.contains("SortMergeJoin"))
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchangesBelowJoin === 0,
      s"expected shuffle-free bucketed join, plan:\n$plan")

    // and it still computes the right thing
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("hive-style partitionBy: a partition-key filter prunes at PLANNING " +
      "time — PartitionFilters set, non-matching directories never scanned") {
    // the third write-layout lever beside bucketing (join locality) and
    // z-order (range locality): directory partitioning turns a
    // partition-key predicate into file listing, not I/O — at 100 TB the
    // difference between reading one source's directory and all of them
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.queries.Tables.t(spark, sf, "documents")
      .write.partitionBy("source").mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("source") === "src0")
    val fmt = read.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(fmt.contains("PartitionFilters") &&
      fmt.matches("(?s).*PartitionFilters: \\[[^\\]]*src0[^\\]]*\\].*"),
      s"source predicate must prune partitions at planning time:\n$fmt")
    // the pruned read equals the filtered flat read, row for row
    val want = graft.queries.Tables.t(spark, sf, "documents")
      .filter(col("source") === "src0")
    assert(read.count() === want.count() && read.count() > 0)
    assert(read.select("doc_id").exceptAll(want.select("doc_id")).isEmpty)
  }
}
