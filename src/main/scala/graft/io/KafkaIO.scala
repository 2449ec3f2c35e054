package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kafka-shaped source/sink column conventions
  * (`/root/reference/data/record.go:33-42` ↔ Spark's Kafka source schema:
  * key binary, value binary, topic, partition, offset, timestamp, headers).
  * These helpers are pure column transforms, so the same code serves
  * `spark.readStream.format("kafka")` in production and plain DataFrames in
  * tests/batch verification.
  */
object KafkaIO {

  /** S1 decode: kSource turns wire bytes into typed key/value
    * (kstream/k_source.go:51-67). `keyExpr`/`valueExpr` play the role of the
    * reference's Encoder.Decode (encoding/encoder.go:10-15) — e.g.
    * `from_json(col("value").cast("string"), schema)` for a JSON topic.
    */
  def decode(raw: DataFrame, keyExpr: Column, valueExpr: Column): DataFrame =
    raw.withColumn("key", keyExpr).withColumn("value", valueExpr)

  /** S2 sink framing: KSink encodes key/value and applies the tombstone
    * filter — a record whose tombstone predicate fires is produced with a
    * NULL value (a Kafka delete marker), k_sink.go:195-249 (tombstoner at
    * 230-240). `headers` is an optional array<struct<key,value>> column.
    */
  def sinkFrame(
      df: DataFrame, keyExpr: Column, valueExpr: Column,
      tombstoneWhen: Option[Column] = None,
      headers: Option[Column] = None): DataFrame = {
    val value = tombstoneWhen match {
      case Some(t) => when(t.eqNullSafe(true), lit(null)).otherwise(valueExpr)
      case None    => valueExpr
    }
    // headers must project in the SAME select — they reference source
    // columns that the key/value projection drops
    df.select((Seq(keyExpr.as("key"), value.as("value")) ++
      headers.map(_.as("headers"))).toIndexedSeq: _*)
  }

  /** S6 DLQ split: records failing validation go to a dead-letter frame
    * instead of aborting the pipeline (kstream/dlq/dlq.go:14-87). Returns
    * (ok, dead); dead rows carry the failure reason like the DLQ topic's
    * payload. NULL validation = failed (the reference DLQs on any error).
    */
  def dlqSplit(df: DataFrame, valid: Column, reason: Column): (DataFrame, DataFrame) = {
    val ok = df.filter(valid.eqNullSafe(true))
    val dead = df.filter(!valid.eqNullSafe(true)).withColumn("dlq_reason", reason)
    (ok, dead)
  }
}
