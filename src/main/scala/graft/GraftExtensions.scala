package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Engine extension installer: `spark.sql.extensions=graft.GraftExtensions`
  * (or `builder.withExtensions`) registers the engine's native expressions
  * in every session — the standard deployment route for custom Catalyst
  * functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineSim)
}

object GraftExtensions {
  private[graft] val cosineSim = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children.head, children(1)))

  /** Idempotent in-session registration, for sessions created without the
    * extensions config (tests, the driver harness).
    */
  def ensure(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(cosineSim._1))
      registry.registerFunction(cosineSim._1, cosineSim._2, cosineSim._3)
  }
}
