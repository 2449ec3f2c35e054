package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsl.{KGlobalTable, KStream}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Seq[Q] =
    CoreQueries.all ++ HeadlineQueries.all ++ TpchQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ ScaleQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 slice-0 shape: events stream filtered, enriched against
    * a latest-per-key global table, keyed and materialized.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val customers = KGlobalTable.fromStatic(
      Tables.t(spark, d, "customer").select("c_custkey", "c_name", "c_mktsegment"),
      "c_custkey")
    KStream(Tables.t(spark, d, "orders"), "o_orderkey")
      .filter(col("o_totalprice") > 0)
      .joinGlobalTable(customers, col("o_custkey"))
      .toDF.select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
