package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query per SURVEY §2 operator: a Spark DataFrame form plus an
  * equivalent DuckDB oracle SQL (None ⇒ driver records a rows-only check,
  * used for ops whose logic isn't portably SQL-expressible, e.g. seeded
  * LSH projections).
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val fn: (SparkSession, String) => DataFrame)

object Tables {
  /** TESTDATA.md tables; parquet scan with column pruning + filter pushdown
    * (column-pruned `ReadSchema` verified via `.explain("formatted")`).
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has been generated as both parquet TIMESTAMP(NANOS)
    // (which Spark 4 rejects unless read as a raw long) and plain
    // timestamp[us]. Normalize to ONE engine-facing contract — `ts` is a
    // LONG of epoch nanos — so every operator and every DuckDB oracle
    // (`epoch_ns(ts)`) sees identical values regardless of the vintage.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // timezone pin: a timestamp[us] vintage reads as (N)TZ and converts
    // to epoch micros through the session zone — UTC makes that exact
    // and matches the driver's Verify session. CONTRACT: t() OWNS the
    // session's datetime semantics — every harness entry point (Verify,
    // Bench, EntrySmoke, SparkSpec) reads tables only through t(), so the
    // whole engine runs under one pinned zone; callers embedding graft in
    // a session with other datetime logic should pin UTC themselves at
    // session build (as Verify.scala does) rather than rely on this
    // side effect's timing.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // native engine expressions, for sessions built without
    // spark.sql.extensions=graft.GraftExtensions
    graft.GraftExtensions.ensure(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType != org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")) *
          org.apache.spark.sql.functions.lit(1000L))
      case _ => df
    }
  }

  /** events.ts (nanos-as-long) to epoch milliseconds. Division runs in
    * DECIMAL, not the `/` operator: `/` is double division, and epoch
    * nanos (~1.7e18) exceed double's 2^53 exact-integer range (ulp =
    * 256 ns), so a timestamp within a few hundred ns of a millisecond
    * boundary could land one ms off the oracle's exact `epoch_ms`.
    * Decimal-by-1e6 is exact (≤ 6 fractional digits) and the long cast
    * truncates — identical to integral division for the non-negative
    * domain.
    */
  def tsMillis(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c.cast("decimal(38,0)") / org.apache.spark.sql.functions.lit(1000000L)).cast("long")
}
