package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape inspection over the formatted physical plan — the properties
  * that make a query scale are facts about its plan (filters reaching the
  * scan, dims broadcast, bounded shuffle count, no accidental global
  * sorts), so they are asserted in tests like any other behavior
  * (PlanShapeSpec) instead of being re-checked by hand after every change.
  */
object PlanChecks {

  def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Scan-level pushed filters, one entry per scan. */
  def pushedFilters(df: DataFrame): Seq[String] =
    formatted(df).linesIterator
      .filter(_.trim.startsWith("PushedFilters:"))
      .map(_.trim.stripPrefix("PushedFilters:").trim)
      .toSeq

  /** Columns actually read by each parquet scan. */
  def readSchemas(df: DataFrame): Seq[String] =
    formatted(df).linesIterator
      .filter(_.trim.startsWith("ReadSchema:"))
      .map(_.trim.stripPrefix("ReadSchema:").trim)
      .toSeq

  /** Count physical operators by name, anchored on the formatted detail
    * header `(n) NodeName` (the tree section repeats every node; the
    * detail section lists each exactly once).
    */
  def countNodes(df: DataFrame, node: String): Int = {
    val header = ("""^\(\d+\) """ + java.util.regex.Pattern.quote(node) + """\b.*""").r
    formatted(df).linesIterator.count(l => header.matches(l.trim))
  }

  /** Shuffle exchanges in the (initial) plan — the number Catalyst would
    * run without AQE coalescing; the scale budget for the query.
    * (`Exchange` = shuffle; broadcast is the distinct `BroadcastExchange`.)
    */
  def countShuffles(df: DataFrame): Int = countNodes(df, "Exchange")

  def hasNode(df: DataFrame, node: String): Boolean = countNodes(df, node) > 0

  /** Substring presence anywhere in the formatted plan (for expression
    * names inside Arguments lines, e.g. an aggregate function).
    */
  def mentions(df: DataFrame, s: String): Boolean =
    formatted(df).contains(s)
}
