package graft

import org.apache.spark.sql.functions._

import graft.dsl.KStream

/** Stateless-operator semantics, mirroring the reference's processor unit
  * tests (/root/reference/kstream/processors/filter_test.go,
  * transformer_test.go, branch/branch.go first-match contract).
  */
class KStreamSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, 10L, "click", 5.0),
    (2L, 10L, "purchase", 150.0),
    (3L, 20L, "view", 50.0),
    (4L, 30L, "purchase", 20.0),
    (5L, 20L, "error", 0.5)
  ).toDF("event_id", "user_id", "event_type", "value")

  test("filter keeps only matching records (P1)") {
    val out = KStream(events, "user_id").filter(col("value") >= 50).toDF
    assert(out.select("event_id").as[Long].collect().sorted === Seq(2L, 3L))
  }

  test("filterNot treats NULL predicate as kept") {
    val df = Seq((1, Some(true)), (2, Some(false)), (3, None))
      .toDF("id", "flag")
    val out = KStream(df, "id").filterNot(col("flag")).toDF
    assert(out.select("id").as[Int].collect().sorted === Seq(2, 3))
  }

  test("transformValues rejects key modification (P3 contract)") {
    val ks = KStream(events, "user_id")
    intercept[IllegalArgumentException] {
      ks.transformValues("user_id" -> lit(0L))
    }
    val ok = ks.transformValues("doubled" -> (col("value") * 2)).toDF
    assert(ok.filter(col("event_id") === 1).select("doubled").as[Double].head() === 10.0)
  }

  test("selectKey marks the key changed (P4)") {
    val ks = KStream(events, "user_id").selectKey("k2", col("user_id") % 10)
    assert(ks.keyChanged)
    assert(ks.keyCols === Seq("k2"))
  }

  test("branch routes each record to the FIRST matching branch only (P6)") {
    val bs = KStream(events, "user_id")
      .branch(col("value") >= 100, col("event_type") === "purchase", col("value") >= 5)
    // event 2 matches branch 0 AND 1 — must land only in 0
    assert(bs(0).toDF.select("event_id").as[Long].collect().sorted === Seq(2L))
    assert(bs(1).toDF.select("event_id").as[Long].collect().sorted === Seq(4L))
    assert(bs(2).toDF.select("event_id").as[Long].collect().sorted === Seq(1L, 3L))
    // event 5 (value 0.5) matches nothing — dropped everywhere
    assert(bs.map(_.toDF.count()).sum === 4)
  }

  test("branchTag assigns first-match index, NULL when none") {
    val out = KStream(events, "user_id")
      .branchTag("b", col("value") >= 100, col("event_type") === "purchase")
      .toDF.select("event_id", "b").as[(Long, Option[Int])].collect().toMap
    assert(out(2L) === Some(0))
    assert(out(4L) === Some(1))
    assert(out(1L) === None)
  }

  test("merge unions streams by column name") {
    val a = KStream(events.filter(col("event_type") === "click"), "user_id")
    val b = KStream(events.filter(col("event_type") === "view"), "user_id")
    assert(a.merge(b).toDF.count() === 2)
  }

  test("process passes records through with side effect (P5)") {
    val counter = spark.sparkContext.longAccumulator("n")
    val out = KStream(events, "user_id").process(_ => counter.add(1)).toDF
    assert(out.count() === 5)
    assert(counter.value === 5)
  }

  test("through repartitions on the key without changing data (S3)") {
    val out = KStream(events, "user_id").through(Some(8))
    assert(out.toDF.rdd.getNumPartitions === 8)
    assert(out.toDF.count() === 5)
    assert(!out.keyChanged)
  }
}
