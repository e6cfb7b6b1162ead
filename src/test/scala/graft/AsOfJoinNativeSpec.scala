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

  test("left-outer native as-of == composed LEFT window formulation") {
    val e = Tables.load(spark, sf, "events").select("event_id", "user_id", "ts")
    val o = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
    // composed formulation: left join-explosion + window, keep rn=1
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_id")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val composed = e
      .join(o, e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val got = graft.plans.AsOfJoin
      .asof(e, o, "user_id", "o_custkey", "ts", "o_orderdate", "o_orderkey",
        "left_outer")
      .select(col("event_id"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == composed, s"native ${got.size} rows vs composed ${composed.size}")
    // left-outer must cover every event exactly once
    val nEvents = Tables.load(spark, sf, "events").count()
    assert(got.size.toLong == nEvents, s"${got.size} rows vs $nEvents events")
    // and must be a strict superset of the inner result
    val inner = native().select("event_id", "orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inner.subsetOf(got))
  }

  test("as-of exec reports SQLMetrics output rows") {
    val df = native()
    val n = df.collect().length.toLong
    // descend through AQE wrappers and query-stage leaves; the node
    // instances carry the run's metrics
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findAll(p: SparkPlan): Seq[graft.plans.AsOfJoinExec] = {
      val here = p match {
        case e: graft.plans.AsOfJoinExec => Seq(e); case _ => Nil
      }
      val below = p match {
        case a: AdaptiveSparkPlanExec => findAll(a.executedPlan)
        case q: QueryStageExec => findAll(q.plan)
        case other => other.children.flatMap(findAll)
      }
      here ++ below
    }
    val exec = findAll(df.queryExecution.executedPlan).headOption
    assert(exec.nonEmpty, "AsOfJoinExec not found in executed plan")
    assert(exec.get.metrics.contains("numOutputRows"))
    assert(exec.get.metrics("numOutputRows").value == n,
      s"metric ${exec.get.metrics("numOutputRows").value} != $n rows")
  }

  test("salted as-of (skew mitigation) output is identical to unsalted") {
    val e = Tables.load(spark, sf, "events").select("event_id", "user_id", "ts")
    val o = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
    def run(salt: Int, joinType: String) = graft.plans.AsOfJoin
      .asof(e, o, "user_id", "o_custkey", "ts", "o_orderdate", "o_orderkey",
        joinType, salt)
      .select(col("event_id"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val innerBase = run(1, "inner")
    assert(run(8, "inner") == innerBase)
    assert(innerBase.nonEmpty)
    val outerBase = run(1, "left_outer")
    assert(run(8, "left_outer") == outerBase)
    assert(outerBase.size.toLong == Tables.load(spark, sf, "events").count())
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
