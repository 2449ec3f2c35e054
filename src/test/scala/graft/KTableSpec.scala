package graft

import org.apache.spark.sql.functions._

import graft.dsl.{KStream, KTable}

/** The stream–table abstraction the reference declared but never shipped
  * (k_table.go commented out, JoinKTable panics — SURVEY J5).
  */
class KTableSpec extends SparkSpec {
  import spark.implicits._

  private def changelog = Seq(
    // (key, ord, value) — NULL value = tombstone
    ("u1", 1L, Some("bronze")), ("u1", 5L, Some("silver")), ("u1", 9L, Some("gold")),
    ("u2", 3L, Some("bronze")), ("u2", 7L, None) // deleted at ord 7
  ).toDF("k", "ord", "tier")

  private def table = KTable.fromChangelog(changelog, "k", "ord", Some("tier"))

  test("snapshot is the latest live state; tombstoned keys are gone") {
    assert(table.snapshot.select("k", "tier").as[(String, String)].collect().toMap
      === Map("u1" -> "gold"))
  }

  test("snapshotAt time-travels the changelog") {
    assert(table.snapshotAt(lit(6L)).select("k", "tier")
      .as[(String, String)].collect().toMap
      === Map("u1" -> "silver", "u2" -> "bronze"))
  }

  test("joinAsOf: each record sees the table state as of its own time") {
    val events = Seq(
      (100L, "u1", 2L), // sees bronze (ord 1)
      (101L, "u1", 6L), // sees silver (ord 5)
      (102L, "u2", 4L), // sees bronze (ord 3)
      (103L, "u2", 8L), // state tombstoned at 7 -> dropped
      (104L, "u2", 1L) // no state yet -> dropped
    ).toDF("event_id", "user", "t")
    val out = table.joinAsOf(
        KStream(events, "user"), col("user"), col("t"), recordId = Seq("event_id"))
      .toDF.select("event_id", "tier").as[(Long, String)].collect().toMap
    assert(out === Map(100L -> "bronze", 101L -> "silver", 102L -> "bronze"))
  }

  test("toGlobalTable joins against the current snapshot") {
    val stream = KStream(Seq(("e1", "u1")).toDF("id", "user"), "id")
    val out = stream.joinGlobalTable(table.toGlobalTable(), col("user"))
      .toDF.select("id", "tier").as[(String, String)].collect().toMap
    assert(out === Map("e1" -> "gold"))
  }
}
