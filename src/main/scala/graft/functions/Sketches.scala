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

  // ── Portable HLL (register rows) ───────────────────────────────────────
  // The oracle-able twin of [[distinctSketches]]: same HyperLogLog
  // mathematics, but the sketch is a DataFrame of register rows
  // (bucket, rho) derived from the md5-based [[graft.operators.Dedup
  // .portableHash64]] instead of a DataSketches binary blob — so any
  // engine with md5 rebuilds the IDENTICAL registers and the estimate is
  // one deterministic arithmetic expression over them (the same
  // portability design as the CMS cells above). Use [[distinctSketches]]
  // when interoperating with the DataSketches ecosystem; use this form
  // when the artifact itself must be cross-engine reproducible/auditable.
  //
  // Register derivation (Flajolet et al. 2007, standard HLL): the 60-bit
  // hash splits into a p-bit bucket (top bits) and a (60-p)-bit suffix;
  // rho = 1 + leading zeros of the suffix (suffix 0 → the max, 61-p).
  // rho is computed by STRING position over a fixed-width binary
  // rendering — `instr(lpad(bin(x), 60-p, '0'), '1')` — because both
  // Java regex-free string ops and DuckDB's bin/lpad/position agree
  // exactly, whereas floor(log2(x)) can land on the wrong side of a
  // power of two in floating point.
  //
  // Scale shape: one narrow projection + one partial agg collapsing to
  // ≤ 2^p register rows per map task before a tiny shuffle — input
  // scanned once, nothing input-sized moves; registers merge by MAX, so
  // per-partition artifacts roll up without rescanning history.

  private def hllCheckP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got $p")

  /** Register table for one sketch per stratum: (strata…, bucket, rho) —
    * only TOUCHED buckets appear (absent bucket ≡ register 0), ≤ 2^p rows
    * per stratum regardless of input size.
    */
  def hllRegisters(df: DataFrame, value: Column, p: Int,
      strata: Seq[String] = Nil): DataFrame = {
    hllCheckP(p)
    val reserved = Seq("bucket", "rho", "_hll_h")
    require(strata.forall(s => !reserved.contains(s)),
      s"strata ${strata.mkString(",")} collide with the sketch's own columns ($reserved)")
    val width = 60 - p
    val h = graft.operators.Dedup.portableHash64(value)
    val rest = pmod(h, lit(1L << width))
    val rho = when(rest === 0, lit(width + 1))
      .otherwise(instr(lpad(bin(rest), width, "0"), "1"))
    df.select(strata.map(col) ++ Seq(
        shiftright(h, width).as("bucket"), rho.cast("int").as("rho")): _*)
      .groupBy(strata.map(col) :+ col("bucket"): _*)
      .agg(max("rho").as("rho"))
  }

  /** The production hot path of [[hllRegisters]]: identical registers,
    * but rho comes from the codegen'd [[LeadingZeros]] expression (one
    * LZCNT after JIT) instead of the oracle-portable bin/lpad/instr
    * string pipeline — at 100 TB the sketch build is a pure scan whose
    * per-row cost IS this rank computation. SketchSpec pins the two
    * forms register-identical on real data; oracled queries keep the
    * string form so DuckDB reproduces them.
    */
  def hllRegistersNative(df: DataFrame, value: Column, p: Int,
      strata: Seq[String] = Nil): DataFrame = {
    hllCheckP(p)
    val reserved = Seq("bucket", "rho", "_hll_h")
    require(strata.forall(s => !reserved.contains(s)),
      s"strata ${strata.mkString(",")} collide with the sketch's own columns ($reserved)")
    graft.GraftExtensions.ensure(df.sparkSession)
    val width = 60 - p
    val h = graft.operators.Dedup.portableHash64(value)
    val rest = pmod(h, lit(1L << width))
    // nlz within the width-bit window = nlz64(rest) - (64 - width)
    val rho = when(rest === 0, lit(width + 1))
      .otherwise(call_function("nlz64", rest) - lit(64 - width) + lit(1))
    df.select(strata.map(col) ++ Seq(
        shiftright(h, width).as("bucket"), rho.cast("int").as("rho")): _*)
      .groupBy(strata.map(col) :+ col("bucket"): _*)
      .agg(max("rho").as("rho"))
  }

  /** Merge register artifacts built with the same `p` (bucket-wise max),
    * optionally rolled up to coarser strata — the kilobyte rollup that
    * never rescans the data, exactly like [[mergeSketches]]/[[cmsMerge]].
    */
  def hllMergeRegisters(parts: DataFrame, strata: Seq[String] = Nil): DataFrame =
    parts.groupBy(strata.map(col) :+ col("bucket"): _*)
      .agg(max("rho").as("rho"))

  /** The distinct-count estimate from a register table, as exact-integer
    * arithmetic up to ONE final double division (the [[graft.operators
    * .Corpus.samplePps]] portability pattern): with R = 61-p (the max
    * rho), the raw HLL estimate α·m²/Σ2^-ρ is rescaled by 2^R so the
    * denominator S = Σ 2^(R-ρ) is an exact BIGINT sum (every term a
    * power of two ≤ 2^(R-1); S ≤ m·2^(R-1) = 2^60 — no overflow, no
    * order-dependent double rounding), and the numerator C = α·m²·2^R is
    * one constant (α·m² rounds once; ·2^R is exact scaling). est = C/S is
    * then a single correctly-rounded division — bit-portable. Output per
    * stratum: (m, v = untouched-register count, s = S, est). No
    * small/large-range corrections: v is returned so a caller (or the
    * linear-counting spec bound) can apply them; the raw estimator keeps
    * the arithmetic transcendental-free.
    */
  /** The estimate numerator C = α_m·m²·2^R (R = 61-p): α_m·m² rounds
    * once, ·2^R is exact binary scaling — ONE double, whose shortest-repr
    * rendering an oracle embeds literally (round-trips to the identical
    * bits in any correctly-rounded parser).
    */
  private[graft] def hllC(p: Int): Double = {
    val m = 1 << p
    val alpha = 0.7213 / (1 + 1.079 / m)
    alpha * m * m * java.lang.Math.scalb(1.0, 61 - p)
  }

  // ── Fixed-bound histogram (quantile artifact) ──────────────────────────
  // The distribution member of the sketch family (HLL = distinct, CMS =
  // frequency, HIST = quantiles): a fixed-width integer bucket table
  // (bucket, cnt) over caller-supplied bounds. Because the bounds and
  // width are part of the artifact's definition (like CMS's depth×width),
  // per-partition histograms merge by CELL SUM with no renormalization,
  // and every derived statistic is integer arithmetic — fully
  // reproducible by the DuckDB oracle, unlike approx_percentile's opaque
  // t-digest (kept as the Spark-native alternative; see
  // Corpus.approxQuantileThresholds). Quantile error is bounded by ONE
  // bucket width by construction.
  //
  // Scale shape: one narrow projection + a partial agg collapsing to
  // ≤ buckets rows per map task; threshold extraction windows over the
  // ≤ buckets-row artifact, never the data.

  /** Bucket counts per stratum: bucket = clamp((v - lo) div width,
    * 0, buckets-1) — values outside the bounds land in the edge buckets
    * (open-ended tails, the standard histogram convention; pick bounds
    * from domain knowledge or a prior bounds pass). NULL values are
    * excluded, as in any quantile.
    */
  def histogramFixed(df: DataFrame, value: Column, lo: Long, width: Long,
      buckets: Int, strata: Seq[String] = Nil): DataFrame = {
    require(width > 0, s"need width > 0, got $width")
    require(buckets > 0, s"need buckets > 0, got $buckets")
    val reserved = Seq("bucket", "cnt", "_hbV")
    require(strata.forall(s => !reserved.contains(s)),
      s"strata ${strata.mkString(",")} collide with the histogram's own columns ($reserved)")
    df.select(strata.map(col) :+ value.cast("long").as("_hbV"): _*)
      .filter(col("_hbV").isNotNull)
      // the difference runs in DECIMAL(38,0): an open-ended-tail outlier
      // at one long extreme with a bound of the opposite sign overflows
      // plain BIGINT and clamps to the WRONG edge bucket (the Selection
      // window-span lesson — 65-bit differences need the wide type)
      .withColumn("bucket",
        least(greatest(expr(
          s"CAST((CAST(_hbV AS DECIMAL(38,0)) - $lo) div $width AS BIGINT)"),
          lit(0L)), lit(buckets - 1L)))
      .groupBy(strata.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram artifacts built with the same (lo, width, buckets):
    * cell-wise sum, optionally rolled up to coarser strata.
    */
  def histogramMerge(parts: DataFrame, strata: Seq[String] = Nil): DataFrame =
    parts.groupBy(strata.map(col) :+ col("bucket"): _*)
      .agg(sum("cnt").as("cnt"))

  /** The p-quantile threshold from a histogram artifact, p given as the
    * EXACT rational pNum/pDen: per stratum, the lower bound of the first
    * bucket whose cumulative count reaches ⌈p·n⌉ (cum ≥ ⌈a/b⌉ ⟺
    * cum·b ≥ a on integers — no division, no doubles anywhere). The
    * ⌈p·n⌉-th smallest value provably lies in [thr, thr + width), so the
    * threshold is conservative within one bucket width. Output per
    * stratum: (n, bucket, thr).
    *
    * The cumulative window runs over the ≤ buckets-row artifact (per
    * stratum; strata-free frames carry the [[graft.plans.Hints
    * .onePartition]] key — bounded by construction).
    */
  def histogramThreshold(hist: DataFrame, pNum: Long, pDen: Long,
      lo: Long, width: Long, strata: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pDen > 0 && pNum >= 0 && pNum <= pDen,
      s"need 0 <= pNum/pDen <= 1, got $pNum/$pDen")
    val w = (if (strata.isEmpty)
        Window.partitionBy(graft.plans.Hints.onePartition(col("bucket")))
      else Window.partitionBy(strata.map(col): _*))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = if (strata.isEmpty) hist.agg(sum("cnt").as("_hbN"))
      else hist.groupBy(strata.map(col): _*).agg(sum("cnt").as("_hbN"))
    val cum = hist.withColumn("_hbC", sum(col("cnt")).over(w))
    val joined = if (strata.isEmpty) cum.crossJoin(broadcast(tot))
      else cum.join(broadcast(tot), strata)
    joined
      .filter(col("_hbC") * pDen >= col("_hbN") * pNum)
      .groupBy(strata.map(col) :+ col("_hbN"): _*)
      .agg(min(col("bucket")).as("bucket"))
      .withColumnRenamed("_hbN", "n")
      .withColumn("thr", lit(lo) + col("bucket") * lit(width))
  }

  def hllEstimate(registers: DataFrame, p: Int,
      strata: Seq[String] = Nil): DataFrame = {
    hllCheckP(p)
    val m = 1 << p
    val bigR = 61 - p
    val c = hllC(p)
    val base = if (strata.isEmpty) registers.groupBy()
      else registers.groupBy(strata.map(col): _*)
    base.agg(count(lit(1)).as("_hllNb"),
        coalesce(sum(pow(lit(2.0), lit(bigR) - col("rho")).cast("long")),
          lit(0L)).as("_hllSp"))
      .select(strata.map(col) ++ Seq(
        lit(m).as("m"),
        (lit(m.toLong) - col("_hllNb")).as("v"),
        (col("_hllSp") + (lit(m.toLong) - col("_hllNb")) * lit(1L << bigR)).as("s")): _*)
      .withColumn("est", lit(c) / col("s").cast("double"))
  }

  // ── AMS / Tug-of-War second moment (F2) ────────────────────────────────

  /** Second frequency moment F2 = Σ_k f_k² — the self-join-size /
    * skew-mass estimator (Alon–Matias–Szegedy '96, all-public): before
    * shuffling a 100 TB join, F2 of the key column IS its self-join
    * cardinality, and a spiking F2 is the earliest skew alarm. Lane l
    * draws its ±1 sign per key from BIT l of the key's portable 60-bit
    * md5 hash (a lane-indexed double-hash parity like [[cmsCell]]'s
    * would overflow a BIGINT at l·h2 for l ≥ 8 — and Spark wraps where
    * DuckDB raises, so the bit extraction is both safer and simpler),
    * folds one signed sum per lane (map-side collapse to ≤ lanes rows
    * per task — the input is scanned once, nothing input-sized moves),
    * and squares it in decimal(38,0); the estimate is the MEDIAN lane
    * square, an exact order statistic over the odd lane count, with one
    * correctly-rounded double conversion at the end (the
    * hllEstimate/ppsHt portability pattern — DuckDB replays every step
    * bit-for-bit). E[X_l] = F2 exactly; the median over lanes tames the
    * variance (lane signs share one md5 hash — a documented
    * independence trade-off that avoids the l·h2 BIGINT overflow).
    * Output: one row (lanes, est_f2) on non-empty input; ZERO rows on an
    * empty input frame (no lane sums exist → same shape as the SQL
    * oracle, never a NULL estimate row).
    */
  def f2Estimate(df: DataFrame, key: Column, lanes: Int = 9): DataFrame = {
    require(lanes >= 1 && lanes % 2 == 1 && lanes <= 60,
      s"need an odd lane count <= 60 for the exact median, got $lanes")
    val h = graft.operators.Dedup.portableHash64(key.cast("string"))
    val sums = df
      .select(h.as("_f2h"),
        explode(sequence(lit(0), lit(lanes - 1))).as("l"))
      .groupBy("l")
      .agg(sum(when(expr("shiftright(_f2h, l) % 2") === 1L, 1L)
        .otherwise(-1L)).as("_f2s"))
    val sq = col("_f2s").cast("decimal(38,0)") * col("_f2s").cast("decimal(38,0)")
    sums.select(sq.as("_f2x"))
      .agg(sort_array(collect_list(col("_f2x"))).as("_f2xs"))
      .where(size(col("_f2xs")) === lanes)
      .select(lit(lanes).as("lanes"),
        element_at(col("_f2xs"), (lanes + 1) / 2).cast("double").as("est_f2"))
  }

  // ── KMV / theta sketch ─────────────────────────────────────────────────
  // The set-operations member of the sketch family (Beyer et al.,
  // SIGMOD'07; the bottom-k theta sketch): keep the k smallest distinct
  // 60-bit hashes of a column. Like the CMS cells and HLL registers above,
  // the artifact is plain rows/arrays of exact integers, so the DuckDB
  // oracle rebuilds it bit-identically, it merges by re-taking bottom-k,
  // and — unlike HLL — two sketches support INTERSECTION / A-NOT-B /
  // Jaccard estimates, the cross-corpus overlap questions (how much of
  // crawl B is already in crawl A?) that inclusion-exclusion on HLL
  // answers with catastrophic variance.
  //
  // Estimator (k smallest distinct of n hashes uniform on [0, 2^60)):
  //   full sketch:  n̂ = (k-1) · 2^60 / h_k       (unbiased)
  //   short sketch: n̂ = |sketch|                  (exact — all hashes kept)
  // Set ops on sketches A, B with thresholds θ_X = h_k(X) (2^60 if short):
  //   θ = min(θ_A, θ_B); restricted to {h < θ} both sketches are uniform
  //   bottom samples of their sets, so |A∩B ∩ {h<θ}| · 2^60/θ estimates
  //   |A∩B|, likewise union / A-not-B; Jaccard = inter/union counts.
  // All arithmetic is exact BIGINT until one correctly-rounded double
  // division (the samplePps / hllEstimate portability pattern).
  //
  // Scale shape: kmvBuild is ONE partial agg — the [[KmvAgg]] buffer is
  // bounded at k in update and merge, so ≤ k longs per (group, map
  // partition) cross the shuffle, never the distinct hash set. Merge and
  // set-estimate stages run on k-sized arrays per group row.

  private val Two60 = 1L << 60

  /** The portable 60-bit item hash (top 15 hex chars of md5) — the same
    * hash space as samplePps / hllRegisters, so any engine rebuilds it.
    */
  def kmvHash(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** Build one KMV sketch per stratum: strata columns + `kmv:
    * array<bigint>` (the ≤ k smallest distinct hashes, ascending).
    */
  def kmvBuild(df: DataFrame, strata: Seq[String], value: Column,
      k: Int): DataFrame =
    df.groupBy(strata.map(col): _*)
      .agg(call_function("kmv_agg", kmvHash(value), lit(k)).as("kmv"))

  /** Roll stored sketches up to coarser strata (or one row with
    * `strata = Nil`): explode the k-sized arrays and re-take bottom-k —
    * dedup is the aggregate's job, so parts sharing hashes merge exactly.
    */
  def kmvMerge(parts: DataFrame, strata: Seq[String], k: Int,
      sketch: String = "kmv"): DataFrame =
    parts.select(strata.map(col) :+ explode(col(sketch)).as("_h"): _*)
      .groupBy(strata.map(col): _*)
      .agg(call_function("kmv_agg", col("_h"), lit(k)).as(sketch))

  /** Sketch threshold θ: h_k for a full sketch, 2^60 for a short one
    * (every hash of the set is present below 2^60).
    */
  def kmvTheta(sketch: Column, k: Int): Column =
    when(size(sketch) < k, lit(Two60)).otherwise(element_at(sketch, k))

  /** Distinct-count estimate: exact size when short, (k-1)·2^60/h_k when
    * full — exact integers into one correctly-rounded double division.
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(Two60.toDouble) /
          element_at(sketch, k).cast("double"))

  /** Pairwise set-operation estimates between two sketch columns of the
    * same k: (est_intersect, est_union, est_anotb, jaccard,
    * containment_a, containment_b) appended. `jaccard` and the
    * containments are exact ratios of retained-sample counts (the
    * standard bottom-k estimators) — NULL when the denominator sample is
    * empty. `containment_a` ≈ |A∩B|/|A| answers the DIRECTED overlap
    * question ("how much of crawl A is already in B") that Jaccard
    * symmetrizes away — the sketch-level analog of
    * [[graft.operators.Dedup.containmentPairs]]'s per-document signal.
    */
  def kmvSetEstimates(df: DataFrame, a: String, b: String, k: Int): DataFrame = {
    val th = least(kmvTheta(col(a), k), kmvTheta(col(b), k))
    val ra = filter(col(a), h => h < th)
    val rb = filter(col(b), h => h < th)
    val scale: Column => Column =
      cnt => cnt.cast("double") * lit(Two60.toDouble) / th.cast("double")
    def ratio(den: Column): Column =
      when(den > 0, col("_kmvI").cast("double") / den.cast("double"))
    df.withColumn("_kmvI", size(array_intersect(ra, rb)))
      .withColumn("_kmvU", size(array_union(ra, rb)))
      .withColumn("est_intersect", scale(col("_kmvI")))
      .withColumn("est_union", scale(col("_kmvU")))
      .withColumn("est_anotb", scale(col("_kmvU") - size(rb)))
      .withColumn("jaccard", ratio(col("_kmvU")))
      .withColumn("containment_a", ratio(size(ra)))
      .withColumn("containment_b", ratio(size(rb)))
      .drop("_kmvI", "_kmvU")
  }

  /** Cross-corpus overlap matrix: one KMV sketch per `stratum` value over
    * `value`, then every stratum pair's distinct / intersection / union /
    * A-not-B / Jaccard estimates. One corpus scan builds the sketches;
    * the pairwise stage runs on the (tiny) stratum-count-sized sketch
    * table — corpora are never joined against each other.
    */
  def kmvOverlapMatrix(df: DataFrame, stratum: String, value: Column,
      k: Int): DataFrame = {
    val s = kmvBuild(df, Seq(stratum), value, k)
    val a = s.select(col(stratum).as("stratum_a"), col("kmv").as("_kmvA"))
    val b = s.select(col(stratum).as("stratum_b"), col("kmv").as("_kmvB"))
    val pairs = a.join(b, col("stratum_a") < col("stratum_b"))
      .withColumn("est_a", kmvEstimate(col("_kmvA"), k))
      .withColumn("est_b", kmvEstimate(col("_kmvB"), k))
    kmvSetEstimates(pairs, "_kmvA", "_kmvB", k).drop("_kmvA", "_kmvB")
  }
}
