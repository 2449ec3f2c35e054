package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch artifacts — the incremental form of
  * `COUNT(DISTINCT …)` at 100 TB. An exact distinct over a year of events
  * rescans the year; the sketch pattern builds a small HLL per partition
  * (day, source, …) ONCE, stores it as bytes next to the partition, and
  * answers any later rollup ("distinct users last quarter, by source") by
  * merging kilobyte sketches — no history rescan, one tiny shuffle.
  *
  * Uses Spark's built-in DataSketches HLL aggregates (`hll_sketch_agg` /
  * `hll_union_agg`, codegen'd, mergeable by construction), so the
  * artifact is portable across any engine speaking the DataSketches
  * wire format. Error is the standard HLL envelope (~1.6%/√(2^lgK/2),
  * ≈1.6% at the default lgK=12); SketchSpec pins the estimate against
  * the exact count AND pins merge-of-parts == sketch-of-whole.
  *
  * No DuckDB-oracle query entry: DuckDB's approx_count_distinct speaks a
  * different HLL dialect, so the contract is spec-pinned instead (the
  * same reasoning SURVEY applies to S5/J4).
  */
object Sketches {

  /** Build one HLL sketch per stratum — the per-partition artifact a
    * pipeline writes alongside its data. Output: strata columns +
    * `hll: binary`. One partial-agg shuffle (sketches merge map-side).
    */
  def distinctSketches(df: DataFrame, strata: Seq[String], value: Column,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(strata.map(col): _*)
      .agg(hll_sketch_agg(value, lit(lgConfigK)).as("hll"))

  /** Roll stored sketch artifacts up to coarser strata (or to a single
    * row with `strata = Nil`) by merging — kilobytes per group, never
    * touching the underlying data again.
    */
  def mergeSketches(parts: DataFrame, strata: Seq[String],
      sketch: String = "hll"): DataFrame =
    if (strata.isEmpty) parts.agg(hll_union_agg(col(sketch)).as(sketch))
    else parts.groupBy(strata.map(col): _*)
      .agg(hll_union_agg(col(sketch)).as(sketch))

  /** The distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
