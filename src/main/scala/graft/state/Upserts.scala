package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed-upsert helpers: the batch forms of the reference's store
  * materialization semantics.
  *
  * Reference behaviors reproduced (file:line into /root/reference):
  *  - latest-by-key upsert with tombstone (`nil` value) deletes:
  *    kstream/global_table.go:31-60, global_table_stream_instance.go:200-234
  *  - version-gated upsert, strict `new > current` comparator (ties keep the
  *    OLD value): kstream/builder.go:231-233,
  *    global_table_stream_instance.go:236-268
  *  - changelog replay last-write-wins dedup:
  *    kstream/changelog/state_changelog.go:285-305
  *
  * Scale notes: every helper here is a single hash-shuffle `groupBy` with a
  * map-side partial aggregate (`max_by`/`min_by` over a struct ordering) —
  * NOT a `Window`+`row_number`, which would sort every partition and cannot
  * partially aggregate. At 100 TB the partial agg collapses each map
  * partition to ~1 row per hot key before the shuffle.
  */
object Upserts {

  /** Row with the greatest `ord` per key — "latest value per key".
    * `ord` must be a total order (include a unique tiebreaker like offset)
    * for deterministic output.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame =
    argMax(df, keys, ord)

  /** Row with the smallest `ord` per key — "first write wins" (the
    * changelog-replay / exactly-once dedup shape, A3).
    */
  def firstByKey(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val all = struct(df.columns.map(col).toIndexedSeq: _*)
    val o = struct(ord.toIndexedSeq: _*)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(min_by(all, o).as("_r"))
      .select("_r.*")
  }

  /** Latest-by-key where a NULL `valueCol` is a tombstone: the key is
    * considered deleted iff its newest record is a tombstone
    * (global_table.go:36-44 — delete on nil, upsert otherwise).
    */
  def latestByKeyWithTombstones(
      df: DataFrame, keys: Seq[String], ord: Seq[Column], valueCol: String): DataFrame =
    latestByKey(df, keys, ord).filter(col(valueCol).isNotNull)

  /** Version-gated upsert: a new record replaces the stored one iff
    * `newVersion > storedVersion` (strict; equal versions keep the earlier
    * record). Winner = max version, earliest `arrival` among that version.
    * global_table_stream_instance.go:236-268, builder.go:231-233.
    */
  def versionedUpsert(
      df: DataFrame, keys: Seq[String], version: Column, arrival: Column): DataFrame =
    argMax(df, keys, Seq(version, -arrival))

  private def argMax(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val all = struct(df.columns.map(col).toIndexedSeq: _*)
    val o = struct(ord.toIndexedSeq: _*)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max_by(all, o).as("_r"))
      .select("_r.*")
  }
}
