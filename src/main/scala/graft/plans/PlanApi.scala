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
    * callers need no session-construction cooperation. SYNCHRONIZED
    * (round-16 review): `extraStrategies` is a shared mutable var, and
    * two threads' concurrent FIRST asof/interval calls could each read
    * the same seq, append their own strategy, and lose one — the loser's
    * query then dies at planning with Spark's "no plan" assertion.
    * Registration happens once per (session, strategy), so the lock is
    * never contended on the query path. */
  def registerStrategy(spark: SparkSession, strategy: SparkStrategy): Unit =
    registerLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(strategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ strategy
    }
  private val registerLock = new Object

  /** Resolve a column name against a plan's output, failing with the
    * available names instead of a downstream analysis error. AMBIGUITY
    * is an error (round-16 review): frames produced by joins routinely
    * carry duplicate names, and `find` would silently bind the first —
    * the as-of merge then runs on the wrong column with no diagnostic.
    * Matching stays case-SENSITIVE, documented: these entry points take
    * exact physical names, not analyzer-resolved identifiers. */
  def attr(p: LogicalPlan, n: String): Attribute = {
    val hits = p.output.filter(_.name == n)
    require(hits.size <= 1,
      s"column $n is ambiguous (${hits.size} attributes share the name) — " +
        "disambiguate with aliases before the join")
    hits.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
  }
}
