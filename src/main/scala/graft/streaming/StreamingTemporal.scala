package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval matching at ingest — the streaming twins of the batch
  * [[graft.operators.Temporal]] banded joins: arriving events/spans are
  * checked against a FROZEN interval artifact (yesterday's incident
  * table, the maintenance calendar, embargo windows) the moment they
  * land. The artifact side is a static DataFrame, so both forms are
  * stream-static equi-joins on the band key — append-safe, no state
  * store, no watermark needed — and EQUAL the batch operator on the same
  * data (spec-pinned).
  */
object StreamingTemporal {

  private def floorDiv(c: Column, band: Long): Column =
    ((c - pmod(c, lit(band))).cast("decimal(38,0)") / lit(band)).cast("long")

  /** Point-in-interval at ingest: each arriving row's `point` probes the
    * frozen `[lo, hi]` intervals — the streaming
    * [[graft.operators.Temporal.rangeJoin]]. The interval side fans out
    * to its bands ONCE (static, reused every micro-batch); the stream
    * side computes its single band narrowly, so the per-batch work is a
    * hash equi-join on the band plus the residual range filter — never a
    * nested loop, never interval-table state.
    */
  def rangeMatchAtIngest(stream: DataFrame, intervals: DataFrame,
      point: String, lo: String, hi: String, band: Long): DataFrame = {
    require(band > 0, s"need band > 0, got $band")
    val overlap = stream.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"stream and interval columns must be disjoint, both have: $overlap")
    val iv = intervals.withColumn("_rj_iband",
      explode(when(col(hi) >= col(lo),
        sequence(floorDiv(col(lo), band), floorDiv(col(hi), band)))
        .otherwise(array().cast("array<long>"))))
    stream.withColumn("_rj_band", floorDiv(col(point), band))
      .join(iv,
        col("_rj_band") === col("_rj_iband") &&
          col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_rj_band", "_rj_iband")
  }

  /** Interval-overlap at ingest: each arriving `[loS, hiS]` span is
    * paired with every frozen `[loA, hiA]` interval it overlaps — the
    * streaming [[graft.operators.Temporal.intervalOverlapJoin]], same
    * first-shared-band claim so each (span, interval) pair emits exactly
    * once per arrival (a filter, not a dedup shuffle — append mode keeps
    * exactly-once end to end).
    */
  def overlapAtIngest(stream: DataFrame, intervals: DataFrame,
      loS: String, hiS: String, loA: String, hiA: String,
      band: Long): DataFrame = {
    require(band > 0, s"need band > 0, got $band")
    val overlap = stream.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"stream and interval columns must be disjoint, both have: $overlap")
    def banded(df: DataFrame, lo: String, hi: String, as: String) =
      df.withColumn(as,
        explode(when(col(hi) >= col(lo),
          sequence(floorDiv(col(lo), band), floorDiv(col(hi), band)))
          .otherwise(array().cast("array<long>"))))
    banded(stream, loS, hiS, "_ij_sband")
      .join(banded(intervals, loA, hiA, "_ij_aband"),
        col("_ij_sband") === col("_ij_aband") &&
          col(loS) <= col(hiA) && col(loA) <= col(hiS) &&
          col("_ij_sband") === floorDiv(greatest(col(loS), col(loA)), band))
      .drop("_ij_sband", "_ij_aband")
  }
}
