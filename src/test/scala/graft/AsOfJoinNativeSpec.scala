package graft

import org.apache.spark.sql.functions._

/** The native sorted-merge as-of join (custom LogicalPlan + Strategy +
  * physical operator) must agree row-for-row with the composed
  * join-explosion + window formulation — and must actually plan through
  * [[graft.plans.AsOfJoinExec]] with no Window operator. */
class AsOfJoinNativeSpec extends SparkSpec {

  private def native() = {
    val e = Tables.load(spark, sf, "events").select("event_id", "user_id", "ts")
    val o = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
    graft.plans.AsOfJoin
      .asof(e, o, "user_id", "o_custkey", "ts", "o_orderdate", "o_orderkey")
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("orderkey"))
  }

  test("native as-of == composed window formulation") {
    val composed = graft.operators.Breadth.asofJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = native()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == composed, s"native ${got.size} rows vs composed ${composed.size}")
    assert(got.nonEmpty)
  }

  test("native as-of plans through AsOfJoinExec, no Window, one pass") {
    val plan = native().queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom operator missing:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into native plan:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), "no cross product")
  }

  test("native as-of is deterministic under repartitioning") {
    val e = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "ts").repartition(7)
    val o = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate").repartition(3)
    val shuffled = graft.plans.AsOfJoin
      .asof(e, o, "user_id", "o_custkey", "ts", "o_orderdate", "o_orderkey")
      .select("event_id", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = native().select("event_id", "orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shuffled == base)
  }
}
