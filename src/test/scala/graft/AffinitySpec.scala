package graft

import graft.operators.{Affinity, Breadth}
import org.apache.spark.sql.functions._

/** Co-occurrence / sequence mining invariants. The oracle already
  * hash-checks both operators against DuckDB; these specs pin the
  * SCALE-shape claims — that the map-side pair expansion is exactly the
  * naive self-join, and that the trigram stream conserves counts. */
class AffinitySpec extends SparkSpec {

  test("basket pair expansion equals the naive basket self-join exactly") {
    val fast = Affinity.basketPairs(spark, sf, minSupport = 1L)
      .orderBy("a", "b").collect().toSeq
    // the textbook formulation the oracle uses: distinct (order, brand)
    // self-joined on the order key
    val ob = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val x = ob.select(col("okey"), col("brand").as("a"))
    val y = ob.select(col("okey").as("okey2"), col("brand").as("b"))
    val nOrders = ob.select(countDistinct("okey")).head.getLong(0)
    val singles = ob.groupBy("brand").agg(count(lit(1)).as("n1")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = x.join(y, x("okey") === y("okey2") && x("a") < y("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .orderBy("a", "b").collect()
      .map { r =>
        val (a, b, nab) = (r.getString(0), r.getString(1), r.getLong(2))
        (a, b, nab,
          BigDecimal(nab.toDouble * nOrders / (singles(a) * singles(b)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(nab.toDouble / singles(a))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
    assert(fast.nonEmpty)
    assert(fast.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))) == naive)
  }

  test("basket pair plan scans the fact once (shared materialized frame, no self-join)") {
    val df = Affinity.basketPairs(spark, sf)
    df.collect() // finalize the adaptive plan so exchange reuse is visible
    val plan = df.queryExecution.executedPlan.toString
    val lineitemScans = "lineitem".r.findAllIn(plan).size
    assert(lineitemScans <= 1, s"lineitem referenced $lineitemScans times:\n$plan")
    assert(!plan.contains("CartesianProduct"), "cartesian in basket plan")
  }

  test("trigram totals conserve: sum(n) == sum over users of max(0, n_u - 2)") {
    val all = Affinity.pathTrigrams(spark, sf, k = Int.MaxValue).collect()
    val total = all.map(_.getLong(1)).sum
    val expected = Tables.load(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(sum(greatest(col("n") - 2, lit(0L)))).head.getLong(0)
    assert(total == expected, s"trigram total $total vs $expected")
    // top-k ordering is by count desc with a deterministic tiebreak
    val top = Affinity.pathTrigrams(spark, sf, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.sliding(2).forall { case Array((ta, na), (tb, nb)) =>
      na > nb || (na == nb && ta < tb) }, top.mkString(", "))
  }

  test("histogram bins partition every row and stay inside [0, bins)") {
    val h = Breadth.valueHistogram(spark, sf).collect()
    val perType = h.groupBy(_.getString(0))
    val counts = Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perType.foreach { case (t, rows) =>
      assert(rows.map(_.getLong(3)).sum == counts(t), s"$t bin counts != total")
      assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 10))
    }
  }

  test("yoy growth recomputes from the displayed revenue columns") {
    val rows = Breadth.yoyGrowth(spark, sf).collect()
    assert(rows.count(!_.isNullAt(2)) > 0, "no rows with a prior-year month")
    rows.filter(!_.isNullAt(2)).foreach { r =>
      val (rev, prev, g) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val expect = BigDecimal((rev - prev) / prev)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(g - expect) <= 1e-12, s"${r.getDate(0)}: $g vs $expect")
    }
  }
}
