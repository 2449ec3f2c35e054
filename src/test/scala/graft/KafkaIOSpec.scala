package graft

import org.apache.spark.sql.functions._

import graft.io.{KafkaIO, WireLog}

/** Producer/partitioner conventions and the wire-shaped log — the
  * reference's produce path (`/root/reference/producer/producer.go:117-196`,
  * partitioner modes `producer/config.go:46-56`) against [[WireLog]]'s
  * full `data/record.go:33-42` record schema.
  */
class KafkaIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_wirelog").toString

  test("hash partitioner: key-affine, stable, in range — the HashBased default") {
    val df = (1L to 200L).map(i => (s"k${i % 17}", s"v$i")).toDF("key", "value")
    val parts = df.select(col("key"),
        KafkaIO.partitionByHash(col("key"), 8).as("p"))
      .distinct().as[(String, Int)].collect()
    // in range, and ONE partition per key (affinity — the property keyed
    // topologies rely on for co-partitioned state)
    assert(parts.forall(p => p._2 >= 0 && p._2 < 8))
    assert(parts.groupBy(_._1).forall(_._2.length == 1))
    // stable across evaluations
    val again = df.select(col("key"),
        KafkaIO.partitionByHash(col("key"), 8).as("p"))
      .distinct().as[(String, Int)].collect().toSet
    assert(again === parts.toSet)
    // uses more than one partition (spread, not constant)
    assert(parts.map(_._2).distinct.length > 1)
  }

  test("manual partitioner: sinkFrame projects the explicit partition verbatim") {
    // producer.go:137-139 — manual mode reads message.Partition
    val df = Seq((1L, "a", 3), (2L, "b", 0), (3L, "c", 3))
      .toDF("k", "v", "target")
    val framed = KafkaIO.sinkFrame(df,
      keyExpr = col("k").cast("string"), valueExpr = col("v"),
      partition = Some(col("target")))
    assert(framed.columns.toSeq === Seq("key", "value", "partition"))
    val got = framed.as[(String, String, Int)].collect().toSet
    assert(got === Set(("1", "a", 3), ("2", "b", 0), ("3", "c", 3)))
    // hash default: NO partition column in the frame — the producer's
    // hash partitioner owns placement (config.go:50-52)
    val hashed = KafkaIO.sinkFrame(df, col("k").cast("string"), col("v"))
    assert(!hashed.columns.contains("partition"))
  }

  test("random partitioner: in range and spread") {
    val ps = spark.range(500)
      .select(KafkaIO.partitionRandom(4).as("p")).as[Int].collect()
    assert(ps.forall(p => p >= 0 && p < 4))
    assert(ps.distinct.length === 4, "500 draws must touch all 4 partitions")
  }

  test("wire log append: per-partition offsets contiguous from 0 across appends") {
    val dir = tmp()
    def rec(k: String, v: String, seq: Long) =
      (k.getBytes, v.getBytes, "orders", seq)
    // append 1: two partitions' worth of records under MANUAL placement so
    // the per-partition ledger is deterministic
    WireLog.append(spark, dir,
      Seq((Array[Byte](1), "a".getBytes, "orders", 0, 10L),
        (Array[Byte](2), "b".getBytes, "orders", 1, 20L),
        (Array[Byte](3), "c".getBytes, "orders", 0, 30L))
        .toDF("key", "value", "topic", "partition", "seq"),
      numPartitions = 2, orderBy = Seq(col("seq")))
    // append 2 continues partition 0's log from where it ended
    WireLog.append(spark, dir,
      Seq((Array[Byte](4), "d".getBytes, "orders", 0, 40L))
        .toDF("key", "value", "topic", "partition", "seq"),
      numPartitions = 2, orderBy = Seq(col("seq")))

    val log = WireLog.read(spark, dir)
    assert(log.schema === WireLog.recordSchema, "full record.go:33-42 shape")
    val offs = log.select("partition", "offset", "value")
      .as[(Int, Long, Array[Byte])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // partition 0: offsets 0,1 in seq order within append 1, then 2
    assert(offs(0).map(_._2).toSeq === Seq(0L, 1L, 2L))
    assert(offs(0).map(r => new String(r._3)).toSeq === Seq("a", "c", "d"))
    // partition 1: its own independent log
    assert(offs(1).map(_._2).toSeq === Seq(0L))
    // timestamps stamped by the producer when the record has none
    // (producer.go:122 time.Now() analog)
    assert(log.filter(col("timestamp").isNull).count() === 0)
  }

  test("wire log hash mode + tombstone + headers round-trip bit-exact") {
    val dir = tmp()
    val framed = KafkaIO.sinkFrame(
      Seq((7L, "alive", false, "t-1"), (8L, "gone", true, "t-2"))
        .toDF("id", "payload", "deleted", "trace"),
      keyExpr = col("id").cast("string"),
      valueExpr = col("payload"),
      tombstoneWhen = Some(col("deleted")),
      headers = Some(array(struct(lit("trace").as("key"),
        col("trace").cast("binary").as("value")))))
    WireLog.append(spark, dir,
      framed.withColumn("topic", lit("messages")),
      numPartitions = 4, orderBy = Seq(col("key")))

    val back = WireLog.read(spark, dir)
    assert(back.schema === WireLog.recordSchema)
    val rows = back.select(col("key").cast("string"), col("value").cast("string"),
        KafkaIO.headerValue(col("headers"), "trace").cast("string"))
      .as[(String, Option[String], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("7") === ((Some("alive"), "t-1")))
    // the tombstone survives as a NULL value — a Kafka delete marker,
    // k_sink.go:230-240
    val gone = back.filter(col("key").cast("string") === "8")
      .select(col("value"), KafkaIO.headerValue(col("headers"), "trace").cast("string"))
      .as[(Option[Array[Byte]], String)].head()
    assert(gone._1.isEmpty && gone._2 === "t-2")
    // hash placement: both rows landed in [0, 4) and key-affinity holds on
    // a re-produce of the same keys
    val placed = back.select(col("key").cast("string"), col("partition"))
      .as[(String, Int)].collect().toMap
    assert(placed.values.forall(p => p >= 0 && p < 4))
    WireLog.append(spark, dir, framed.withColumn("topic", lit("messages")),
      numPartitions = 4, orderBy = Seq(col("key")))
    val placed2 = WireLog.read(spark, dir)
      .select(col("key").cast("string"), col("partition"))
      .as[(String, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(placed2.values.forall(_.length === 1),
      "re-producing the same key must land on the same partition")
  }
}
