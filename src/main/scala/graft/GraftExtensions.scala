package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.HashExpressions.{DotProduct, SimHash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT simhash64(...)")`
  * works in any session built with
  * `.withExtensions(new GraftExtensions)` — or via
  * `spark.sql.extensions=graft.GraftExtensions` in config (the standard
  * plugin path for a Spark cluster, no code changes needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    // the custom-operator tier rides the same plugin: sessions built with
    // spark.sql.extensions=graft.GraftExtensions can plan AsOfJoinPlan /
    // IntervalJoinPlan without touching spark.experimental
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}

object GraftExtensions {
  /** Runtime registration for an ALREADY-RUNNING session (the builder path
    * above only applies at session construction — `getOrCreate` on an
    * existing session silently ignores `withExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      (children: Seq[Expression]) => SimHash64(children.head), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      (children: Seq[Expression]) => DotProduct(children(0), children(1)), "built-in")
  }
}
