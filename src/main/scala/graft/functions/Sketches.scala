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

  // ── Count-Min Sketch ───────────────────────────────────────────────────
  // The heavy-hitter twin of the HLL artifact above: where HLL answers
  // "how many distinct", CMS answers "how often does THIS item occur"
  // from a fixed-size summary. Represented as a DataFrame of cells
  // (i, cell, cnt) — ≤ depth×width rows regardless of input size — so the
  // artifact is mergeable by cell-wise sum (like the HLL bytes) and,
  // unlike a binary blob, fully reproducible by the DuckDB oracle: cells
  // come from the two 60-bit halves of one md5 per item (see [[cmsCell]]).
  //
  // Guarantees (standard CMS): estimate ≥ true count always (only hash
  // collisions inflate, never deflate); estimate ≤ true + εN with
  // probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. SketchSpec pins
  // both the floor and merge-of-parts == sketch-of-whole.
  //
  // Scale shape: one narrow explode (×depth) feeding a partial agg that
  // collapses to ≤ depth×width rows PER MAP TASK before the (tiny)
  // shuffle — the input is scanned once and nothing input-sized moves.

  /** Lane-i cell via Kirsch–Mitzenmacher double hashing: ONE md5 per item
    * (h1 = hex chars 1-15, h2 = chars 16-30 of the same digest), lane
    * cells derived as (h1 + i·h2) mod width — d-wise independence enough
    * for the CMS bound at 1/d of the hashing cost of d independent
    * hashes. Both halves are < 2^60, so h1 + 3·h2 < 2^62 never overflows
    * a long. Portable: any engine with md5 rebuilds the identical cells.
    */
  private def cmsCell(i: Column, item: Column, width: Int): Column = {
    val m = md5(item)
    val h1 = conv(substring(m, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(m, 16, 15), 16, 10).cast("long")
    pmod(h1 + i * h2, lit(width.toLong))
  }

  /** Build the sketch: one (strata…, i, cell, cnt) row per touched cell.
    * `strata` names pre-projected grouping columns (day, source, an
    * event-time `window(...)` struct in streaming) — one independent
    * sketch per stratum, the per-partition artifact form.
    *
    * `weight` (default 1 per row) builds from pre-aggregated
    * (item, count) pairs: CMS is linear, so sketching a vocab-sized
    * count table is cell-identical to sketching the raw occurrences —
    * when a per-item aggregate already exists (or is needed anyway),
    * sketch THAT and skip re-exploding the corpus.
    */
  def cmsBuild(df: DataFrame, item: Column, depth: Int, width: Int,
      strata: Seq[String] = Nil, weight: Column = lit(1L)): DataFrame = {
    val reserved = Seq("i", "cell", "cnt", "_cms_it", "_cms_w")
    require(strata.forall(s => !reserved.contains(s)),
      s"strata ${strata.mkString(",")} collide with the sketch's own columns ($reserved)")
    df.select(strata.map(col) ++ Seq(item.as("_cms_it"), weight.as("_cms_w"),
        explode(sequence(lit(0), lit(depth - 1))).as("i")): _*)
      .groupBy(strata.map(col) ++ Seq(col("i"),
        cmsCell(col("i"), col("_cms_it"), width).as("cell")): _*)
      .agg(sum("_cms_w").as("cnt"))
  }

  /** Merge sketch artifacts built with the same (depth, width): cell-wise
    * sum, optionally rolled up to coarser `strata`. Kilobytes per part —
    * rollups never rescan the data.
    */
  def cmsMerge(parts: DataFrame, strata: Seq[String] = Nil): DataFrame =
    parts.groupBy(strata.map(col) ++ Seq(col("i"), col("cell")): _*)
      .agg(sum("cnt").as("cnt"))

  /** Point-query the sketch: min over the item's `depth` cells (absent
    * cell = 0 — the item was never inserted). Output: (item, est).
    * The probe set is small by construction (heavy-hitter candidates),
    * so the lanes frame broadcasts into the join against the cell table.
    *
    * Takes an UNSTRATIFIED sketch only — exactly (i, cell, cnt). A
    * strata-built sketch joined here would match every stratum's row per
    * (i, cell) and min ACROSS strata — neither a per-stratum nor a total
    * estimate, and silently below the true total. `cmsMerge` the strata
    * away (or filter to one stratum and drop its columns) first.
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, item: Column,
      depth: Int, width: Int): DataFrame = {
    require(sketch.columns.sorted.sameElements(Array("cell", "cnt", "i")),
      s"cmsEstimate needs an unstratified sketch (i, cell, cnt); got " +
        s"(${sketch.columns.mkString(", ")}) — cmsMerge strata away first")
    items.select(item.as("item"),
        explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .withColumn("cell", cmsCell(col("i"), col("item"), width))
      .join(sketch, Seq("i", "cell"), "left")
      .groupBy("item").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
