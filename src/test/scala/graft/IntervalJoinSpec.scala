package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native point-in-interval join (custom LogicalPlan + Strategy +
  * broadcast binary-search physical operator) must agree row-for-row
  * with Spark's own BroadcastNestedLoopJoin formulation of the same
  * predicate — and must actually plan through IntervalJoinExec, with no
  * nested loop and no cartesian product. */
class IntervalJoinSpec extends SparkSpec {

  private def events() =
    Tables.load(spark, sf, "events").select("event_id", "value")

  private def bands() = {
    val start = (col("p_partkey") % 44) * 11 + (col("p_size") % 9)
    Tables.load(spark, sf, "part")
      .filter(col("p_partkey") % 29 === 0)
      .select(col("p_partkey").as("band_id"),
        start.cast("double").as("lo"),
        (start + col("p_size")).cast("double").as("hi"))
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("event_id", "band_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("native interval join == BroadcastNestedLoopJoin formulation") {
    val e = events(); val b = bands()
    val nested = pairsOf(
      e.join(b, e("value") >= b("lo") && e("value") < b("hi")))
    val got = pairsOf(
      graft.plans.IntervalJoin.pointInInterval(e, b, "value", "lo", "hi"))
    assert(got == nested,
      s"native ${got.size} pairs vs nested-loop ${nested.size}")
    assert(got.nonEmpty)
  }

  test("plans through IntervalJoinExec — no nested loop, no cartesian") {
    val joined = graft.plans.IntervalJoin
      .pointInInterval(events(), bands(), "value", "lo", "hi")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), s"custom operator missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), s"nested loop leaked:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), "no cross product")
  }

  test("interval exec reports SQLMetrics output rows") {
    val df = graft.plans.IntervalJoin
      .pointInInterval(events(), bands(), "value", "lo", "hi")
    // collect() (not count()) so the metric-carrying plan instance is the
    // one that actually executed
    val n = df.collect().length.toLong
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findAll(p: SparkPlan): Seq[graft.plans.IntervalJoinExec] = {
      val here = p match {
        case e: graft.plans.IntervalJoinExec => Seq(e); case _ => Nil
      }
      val below = p match {
        case a: AdaptiveSparkPlanExec => findAll(a.executedPlan)
        case q: QueryStageExec => findAll(q.plan)
        case other => other.children.flatMap(findAll)
      }
      here ++ below
    }
    val exec = findAll(df.queryExecution.executedPlan).headOption
    assert(exec.nonEmpty, "IntervalJoinExec not found in executed plan")
    assert(exec.get.metrics("numOutputRows").value == n,
      s"metric ${exec.get.metrics("numOutputRows").value} != $n rows")
  }

  test("[lo, hi) boundaries, overlaps, gaps, and null semantics") {
    val s = spark; import s.implicits._
    // points: hand-picked against hand-computed expectations below
    val pts = Seq(
      (1L, Some(1.0)), (2L, Some(5.0)), (3L, Some(7.0)), (4L, Some(10.0)),
      (5L, None), (6L, Some(15.0)), (7L, Some(20.0)))
      .toDF("pid", "p")
    // overlapping (A⊂B, F spans everything), gapped, and null-bounded rows
    val ivs = Seq(
      ("A", Some(5.0), Some(7.0)),
      ("B", Some(5.0), Some(10.0)),
      ("E", Some(6.0), Some(8.0)),
      ("F", Some(0.0), Some(20.0)),
      ("G", Some(15.0), Some(16.0)),
      ("C", None, Some(3.0)),      // null lo never matches
      ("D", Some(2.0), None))      // null hi never matches
      .toDF("iid", "lo", "hi")
    val got = graft.plans.IntervalJoin.pointInInterval(pts, ivs, "p", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = Set(
      (1L, "F"),                       // only the wide interval
      (2L, "A"), (2L, "B"), (2L, "F"), // p == lo is INCLUDED
      (3L, "B"), (3L, "E"), (3L, "F"),
      (4L, "F"),                       // p == hi(B) is EXCLUDED
      (6L, "F"), (6L, "G"),
      // pid 5 (null point) and pid 7 (p == hi of F) match nothing
    )
    assert(got == expected, s"got $got")
  }

  test("salted band aggregate is identical to the unsalted plan") {
    // the skew option must be result-invariant: decimal partial sums
    // merge to the same totals regardless of salt bucketing
    val plain = graft.operators.Scale.intervalJoinBands(spark, sf)
      .orderBy("band_id").collect()
    val salted = graft.operators.Scale.intervalJoinBandsSalted(spark, sf)
      .orderBy("band_id").collect()
    assert(plain.nonEmpty)
    assert(salted.toSeq === plain.toSeq)
  }

  test("time-window variant == nested-loop formulation and is non-trivial") {
    val e = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("double").as("t"), col("value"))
    val jan1 = lit(1704067200.0)
    val lo = jan1 + (col("o_orderkey") % 30) * 86400.0 +
      (col("o_orderkey") % 7) * 3600.0
    val wins = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 701 === 0)
      .select(col("o_orderkey").as("win_id"),
        lo.as("lo"),
        (lo + (col("o_orderkey") % 45 + 2) * 3600.0).as("hi"))
    val nested = e.join(wins, e("t") >= wins("lo") && e("t") < wins("hi"))
      .select("event_id", "win_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.plans.IntervalJoin.pointInInterval(e, wins, "t", "lo", "hi")
      .select("event_id", "win_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == nested, s"native ${got.size} pairs vs nested ${nested.size}")
    assert(got.nonEmpty, "time windows must actually capture events")
  }
}
