package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink conventions for the batch side of the engine. The reference
  * has exactly one wire format (Kafka topics + user encoders,
  * `/root/reference/kstream/encoding/encoder.go:10-15`); a Spark engine
  * feeding a 100 TB pipeline reads lakehouse files, so these helpers pin
  * the rules that keep those reads cluster-friendly:
  *
  *  - ALWAYS pass an explicit schema to csv/json — schema inference scans
  *    the input once before the real job (2× I/O at 100 TB);
  *  - parquet carries its schema; select early so column pruning reaches
  *    the scan (`ReadSchema` in explain);
  *  - write fact tables `partitionBy` their hot filter column(s) so reads
  *    prune whole directories (`PartitionFilters`), and bucket join keys
  *    where repeated co-keyed joins justify it (see BucketingSpec).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Header-less CSV with explicit schema — no inference pass. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** JSON-lines with explicit schema — no inference pass; unparseable rows
    * land in `_corrupt_record` (permissive) instead of failing the job.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** ORC — the other columnar lakehouse format Spark ships natively.
    * Same pushdown/pruning properties as parquet (predicate pushdown via
    * ORC SearchArguments, column projection, vectorized read).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Hive-style partitioned parquet write: one directory per value of
    * `partitionCols` — the layout that turns hot filters into directory
    * pruning instead of data reads.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(bytes / targetFileBytes)` files. Streaming sinks and
    * fine-grained partitioned writes accumulate small files that tax the
    * scan scheduler (one task per file) and the namenode; periodic
    * compaction is standing maintenance for any long-lived table.
    * Returns the new file count.
    */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long = 128L << 20): Int = {
    val in = spark.read.parquet(path)
    val bytes = in.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    in.repartition(files).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    files
  }
}
