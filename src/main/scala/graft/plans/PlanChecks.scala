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

  /** Parquet root paths scanned under every join side that carries a
    * BROADCAST hint in the optimized logical plan. A `broadcast()` hint is
    * honored unconditionally by Spark (no threshold, no AQE demotion), so
    * "no sf-scaled table appears here" is the plan-level proof that a
    * query cannot force-broadcast a scale-factor-sized side at 100 TB.
    */
  def broadcastHintedLeaves(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def leafPaths(p: LogicalPlan): Seq[String] = p.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }
    df.queryExecution.optimizedPlan.collect { case j: Join =>
      Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).flatMap {
        case (Some(h), side) if h.strategy.contains(BROADCAST) => leafPaths(side)
        case _ => Nil
      }
    }.flatten
  }
}
