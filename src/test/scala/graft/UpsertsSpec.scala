package graft

import org.apache.spark.sql.functions._

import graft.state.Upserts

/** Store materialization semantics from /root/reference:
  * latest-by-key (global_table.go:31-60), tombstones (:36-44), strict
  * version comparator (builder.go:231-233 — ties keep the OLD record),
  * first-write-wins replay dedup (changelog/state_changelog.go:285-305).
  */
class UpsertsSpec extends SparkSpec {
  import spark.implicits._

  private def changelog = Seq(
    ("a", 1L, "a1"), ("a", 3L, "a3"), ("a", 2L, "a2"),
    ("b", 7L, "b7")
  ).toDF("k", "off", "v")

  test("latestByKey keeps the greatest-ord row per key") {
    val out = Upserts.latestByKey(changelog, Seq("k"), Seq(col("off")))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "a3", "b" -> "b7"))
  }

  test("firstByKey keeps the smallest-ord row per key") {
    val out = Upserts.firstByKey(changelog, Seq("k"), Seq(col("off")))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "a1", "b" -> "b7"))
  }

  test("tombstone deletes the key only when it is the newest record") {
    val df = Seq(
      ("a", 1L, Some("x")), ("a", 2L, None), // newest = tombstone ⇒ gone
      ("b", 1L, None), ("b", 2L, Some("y")) // value after tombstone ⇒ alive
    ).toDF("k", "off", "v")
    val out = Upserts.latestByKeyWithTombstones(df, Seq("k"), Seq(col("off")), "v")
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out === Map("b" -> "y"))
  }

  test("versioned upsert: max version wins, ties keep the EARLIEST arrival") {
    val df = Seq(
      ("a", 1L, 5L, "first-v5"), ("a", 2L, 5L, "second-v5"), // tie on version
      ("a", 3L, 4L, "late-lower"),
      ("b", 1L, 1L, "b1"), ("b", 2L, 9L, "b9")
    ).toDF("k", "arrival", "ver", "v")
    val out = Upserts.versionedUpsert(df, Seq("k"), col("ver"), col("arrival"))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "first-v5", "b" -> "b9"))
  }
}
