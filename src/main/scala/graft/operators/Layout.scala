package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout: Z-order (Morton) clustering of a table on two
  * numeric/temporal keys, so parquet row groups carry tight min/max ranges
  * on BOTH keys and scans filtered on either dimension skip most files —
  * the `OPTIMIZE ... ZORDER BY` shape of lakehouse engines, composed from
  * plain Spark ops.
  *
  * The pipeline is: per-key linear bucketing into 2^bits cells (exact
  * integer arithmetic against a 1-row global min/max broadcast — no
  * sampling pass, no sort), bit-interleave the two bucket ids into one
  * Morton value, then ONE `repartitionByRange` on that value +
  * `sortWithinPartitions` at write time. The range shuffle is the cost of
  * any clustering rewrite; everything before it is narrow.
  *
  * Linear (equi-width) bucketing is deterministic and engine-portable;
  * under heavy value skew it degrades to fewer effective cells — swap the
  * bucket stage for quantile boundaries (`approx_percentile` at scale)
  * when keys are pathological. Integer stride division keeps every step
  * exact past 2^53, where double arithmetic (and thus `floor(x/y)`) would
  * silently round: nanosecond timestamps live there.
  */
object Layout {

  /** Equi-width bucket of `x` into [0, 2^bits): (x − min) div stride with
    * stride = (max − min) div 2^bits + 1. Exact integer arithmetic (`div`
    * truncates; the differences are non-negative, so it equals floor and
    * DuckDB's `//`) — no doubles anywhere, and the subtractions run in
    * DECIMAL(38,0) because a domain spanning both long extremes
    * (min < 0 ≤ max with max − min past 2^63) overflows plain BIGINT —
    * the exact-for-full-range-longs contract has to carry the 65-bit
    * span (the Selection window-width lesson). Stride still fits a long
    * (≤ 2^64/2^bits + 1, bits ≥ 1). Constant inputs (min = max) land
    * every row in bucket 0.
    */
  def linearBucket(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    val nb = lit(1L << bits)
    def dec(c: Column) = c.cast("long").cast(
      org.apache.spark.sql.types.DecimalType(38, 0))
    def idiv(a: Column, b: Column) = call_function("div", a, b) // IntegralDivide
    val stride = idiv(dec(mx) - dec(mn), nb).cast("long") + lit(1L)
    idiv(dec(x) - dec(mn), stride).cast("long")
  }

  /** Morton interleave of two bucket ids (`bits` each, x in the even bit
    * positions): Σ_b ((bx>>b)&1)·2^(2b) + ((by>>b)&1)·2^(2b+1). A sum of
    * 2·bits codegen'd long terms — narrow.
    */
  def mortonInterleave(bx: Column, by: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    (0 until bits).map { b =>
      shiftright(bx, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(by, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** Adds `bx`, `by` (bucket ids) and `zvalue` (Morton code) for the two
    * key columns. The min/max frame is a 1-row broadcast; the projection
    * is narrow — this is the analyzable half of the layout, and what the
    * cross-engine oracle replays bit-for-bit.
    */
  def zOrderValue(df: DataFrame, xCol: String, yCol: String, bits: Int): DataFrame = {
    require(!df.columns.exists(Seq("bx", "by", "zvalue").contains),
      "input already has a bx/by/zvalue column")
    val mm = df.agg(
      min(col(xCol)).cast("long").as("_z_xmin"), max(col(xCol)).cast("long").as("_z_xmax"),
      min(col(yCol)).cast("long").as("_z_ymin"), max(col(yCol)).cast("long").as("_z_ymax"))
    df.crossJoin(broadcast(mm))
      .withColumn("bx", linearBucket(col(xCol), col("_z_xmin"), col("_z_xmax"), bits))
      .withColumn("by", linearBucket(col(yCol), col("_z_ymin"), col("_z_ymax"), bits))
      .withColumn("zvalue", mortonInterleave(col("bx"), col("by"), bits))
      .drop("_z_xmin", "_z_xmax", "_z_ymin", "_z_ymax")
  }

  /** The full layout rewrite: Z-values, then one range shuffle into
    * `numFiles` partitions sorted by `zvalue` within each — write this
    * frame out and scans filtered on either key prune most files. The
    * ONLY exchange is the range partitioning (sampling the zvalue is how
    * Spark picks balanced bounds — skew-proof where fixed bounds are not).
    */
  def zOrderLayout(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"need numFiles >= 1, got $numFiles")
    zOrderValue(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("zvalue"))
      .sortWithinPartitions("zvalue")
  }
}
