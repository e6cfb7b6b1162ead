package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Shared plumbing for the custom-plan public entry points — ONE copy of
  * the strategy self-registration and the attribute-by-name lookup that
  * AsOfJoin and IntervalJoin previously duplicated verbatim (a fix to
  * one copy silently missed the other).
  */
private[plans] object PlanApi {

  /** Idempotently add `strategy` to the session's extra strategies so
    * callers need no session-construction cooperation. */
  def registerStrategy(spark: SparkSession, strategy: SparkStrategy): Unit =
    if (!spark.experimental.extraStrategies.contains(strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy

  /** Resolve a column name against a plan's output, failing with the
    * available names instead of a downstream analysis error. */
  def attr(p: LogicalPlan, n: String): Attribute =
    p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
}
