package graft

import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}

/** Optimized-plan shape pins for queries whose 100 TB posture depends on
  * a specific plan, not just a correct answer. */
class PlanShapeSpec extends SparkSpec {

  test("min-cost supplier prunes lineitem below the pre-aggregation") {
    // the p_size part filter must reach lineitem BEFORE the big
    // (l_partkey, l_suppkey) aggregation — as a left-semi join under the
    // Aggregate — so the shuffle carries only surviving rows
    val df = graft.operators.Relational.minCostSupplier(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val aggs = optimized.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, s"no Aggregate in plan:\n$optimized")
    val semiUnderAgg = aggs.exists(_.child.collect {
      case j: Join if j.joinType == LeftSemi => j
    }.nonEmpty)
    assert(semiUnderAgg, s"no LeftSemi join below an Aggregate:\n$optimized")
    // and the final answer is non-trivial
    assert(df.count() > 0)
  }
}
