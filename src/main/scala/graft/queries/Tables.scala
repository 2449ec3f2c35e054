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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless
    // read as a raw long (nanos since epoch). Set dynamically so any
    // session (driver's, tests') can read the testdata.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // native engine expressions, for sessions built without
    // spark.sql.extensions=graft.GraftExtensions
    graft.GraftExtensions.ensure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.ts (nanos-as-long) to epoch milliseconds. */
  def tsMillis(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c / 1000000L).cast("long")
}
