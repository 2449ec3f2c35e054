package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.state.Upserts

/** Temporal (as-of) join: pair each left row with the single latest right
  * row whose time does not exceed the left row's time — "the state of the
  * table as of this event". The reference can only join against the
  * CURRENT table state (kstream/processors/join/global_table_joiner.go);
  * this operator reconstructs point-in-time state from the version
  * history.
  *
  * Built by composition (the preference-order (a) route — the semantics
  * decompose exactly): range equi-join on key with `rightTime <= leftTime`,
  * then argmax-by-time per left row via one partial-agg shuffle
  * ([[Upserts.latestByKey]] — never a per-partition window sort).
  *
  * Scale: the intermediate join output is |left| × (matching versions per
  * key). Pass `tolerance` to band the match window (`leftTime - tolerance
  * <= rightTime`), which both bounds that blow-up and is usually the
  * business semantics ("ignore versions older than a day"). With AQE on,
  * a skewed hot key re-splits at runtime; for known-heavy keys compose
  * with [[Skew.saltedJoin]].
  */
object Temporal {

  /** @param leftId    unique left-row identity (the argmax group key)
    * @param tieBreak  extra ordering under equal `rightTime` (ascending
    *                  argmax — pass `-col` for prefer-smallest)
    * @param joinType  "inner" (drop unmatched) or "left" (keep with nulls)
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftId: Seq[String],
      tolerance: Option[Column] = None,
      tieBreak: Seq[Column] = Nil,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"as-of join is inner or left, got $joinType")
    val bound = tolerance match {
      case Some(tol) => rightTime <= leftTime && rightTime >= leftTime - tol
      case None      => rightTime <= leftTime
    }
    val joined = left.join(right, leftKey === rightKey && bound, joinType)
    Upserts.latestByKey(joined, leftId, rightTime +: tieBreak)
  }
}
