package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv and jsonl round-trip with explicit schemas (no inference pass)") {
    val dir = Files.createTempDirectory("graft_src").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,name\n1,alpha\n2,beta\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.jsonl"),
      """{"id": 1, "name": "alpha"}
        |{"id": 2, "name": "beta"}
        |not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))

    val fromCsv = Sources.csv(spark, s"$dir/data.csv", schema)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(fromCsv.toSeq === Seq((1L, "alpha"), (2L, "beta")))

    val fromJson = Sources.jsonl(spark, s"$dir/data.jsonl", schema)
    assert(fromJson.filter(col("id").isNotNull).count() === 2) // corrupt row tolerated
  }

  test("orc round-trips and pushes filters down to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/lineitem"
    val src = queries.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    Sources.writeOrc(src, dir)
    val back = Sources.orc(spark, dir)
    assert(back.count() === src.count())
    val filtered = back.filter(col("l_returnflag") === "R")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_returnflag"),
      s"expected ORC predicate pushdown in:\n$scan")
    assert(filtered.count() === src.filter(col("l_returnflag") === "R").count())
  }

  test("compact rewrites a many-small-files table into few files") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    queries.Tables.t(spark, sf, "orders").repartition(64).write.parquet(dir)
    def files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    val before = files
    val rows = spark.read.parquet(dir).count()
    Sources.compact(spark, dir)
    assert(files < before)
    assert(spark.read.parquet(dir).count() === rows)
  }

  test("partitioned write prunes directories on read (PartitionFilters)") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    Sources.writePartitioned(
      queries.Tables.t(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "value"),
      dir, Seq("event_type"))

    val pruned = Sources.parquet(spark, dir).filter(col("event_type") === "click")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type#") && scan.contains("click"),
      s"expected partition pruning in:\n$scan")
    // and the pruned read matches the unpartitioned filter
    val expected = queries.Tables.t(spark, sf, "events")
      .filter(col("event_type") === "click").count()
    assert(pruned.count() === expected)
  }
}
