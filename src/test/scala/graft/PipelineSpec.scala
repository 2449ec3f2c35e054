package graft

import org.apache.spark.sql.functions._

import graft.dsl.{KGlobalTable, KStream}
import graft.io.KafkaIO

/** End-to-end pipeline mirroring the reference's example_1 banking app
  * (/root/reference/examples/example_1/stream/account_credited.go:24-78 and
  * init.go): transaction stream → branch by type → filter → enrich against
  * two global tables (account detail, customer profile) → format → sink
  * frame. The reference runs this on mock Kafka; here the identical
  * operator chain runs on DataFrames.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("branch -> filter -> two global-table joins -> sink frame") {
    val transactions = Seq(
      (1L, 100L, "credited", 250.0),
      (2L, 100L, "debited", 40.0),
      (3L, 200L, "credited", 0.0), // filtered: zero amount
      (4L, 999L, "credited", 10.0), // dropped: unknown account
      (5L, 200L, "credited", 75.0)
    ).toDF("tx_id", "account_id", "tx_type", "amount")

    val accounts = KGlobalTable.fromStatic(
      Seq((100L, 5000L), (200L, 6000L)).toDF("acc_id", "customer_id"), "acc_id")
    val customers = KGlobalTable.fromStatic(
      Seq((5000L, "alice"), (6000L, "bob")).toDF("cust_id", "cust_name"), "cust_id")

    val branches = KStream(transactions, "account_id")
      .branch(col("tx_type") === "credited", col("tx_type") === "debited")

    val enriched = branches(0)
      .filter(col("amount") > 0)
      .starJoin( // J6: both dims in one fold of broadcast joins
        accounts -> col("account_id"),
        customers -> col("customer_id"))
      .transformValues("message" ->
        concat(col("cust_name"), lit(" credited "), col("amount").cast("string")))

    val framed = enriched // S2 terminal verb
      .to(keyExpr = col("account_id"), valueExpr = col("message"))
      .as[(Long, String)].collect().toMap

    assert(framed === Map(
      100L -> "alice credited 250.0",
      200L -> "bob credited 75.0"))
  }

  test("sink frame carries headers and the topology renders") {
    val ks = KStream(
      Seq((1L, "v", "trace-1")).toDF("k", "v", "trace_id"), "k")
    val framed = KafkaIO.sinkFrame(ks.toDF,
      keyExpr = col("k"), valueExpr = col("v"),
      headers = Some(array(struct(lit("trace").as("key"), col("trace_id").as("value")))))
    val row = framed.select(col("headers")(0).getField("key"),
      col("headers")(0).getField("value")).as[(String, String)].head()
    assert(row === ("trace", "trace-1"))
    assert(ks.describe().contains("Physical Plan"))
  }

  test("source-side header read: first match by name, NULL when absent") {
    // the Kafka source's headers shape: array<struct<key,value>>; Read()
    // returns the FIRST header with the name (data/record.go:17-31)
    val df = Seq(
      (1L, Seq(("trace", "t-1"), ("trace", "t-2"), ("src", "api"))),
      (2L, Seq(("src", "batch"))))
      .toDF("k", "hs")
      .select(col("k"), transform(col("hs"),
        h => struct(h.getField("_1").as("key"), h.getField("_2").as("value"))).as("headers"))
    val got = df.select(col("k"),
        KafkaIO.headerValue(col("headers"), "trace").as("trace"),
        KafkaIO.hasHeader(col("headers"), "src").as("has_src"))
      .as[(Long, Option[String], Boolean)].collect().toSet
    assert(got === Set((1L, Some("t-1"), true), (2L, None, true)))
  }
}
