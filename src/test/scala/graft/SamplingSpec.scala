package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

/** Sampling operators. The deterministic hash sample is oracle-checked
  * (q_hash_sample); Spark's native seeded sampling APIs are covered here
  * because their draws are engine-specific (not DuckDB-reproducible).
  */
class SamplingSpec extends SparkSpec {

  test("hash sample rate is ~10% and stable across partitionings") {
    val total = Tables.load(spark, sf, "customer").count()
    val s1 = Scale.hashSample(spark, sf).collect().map(_.getLong(0)).toSet
    assert(s1.size > total * 0.04 && s1.size < total * 0.2,
      s"sampled ${s1.size} of $total")
    val s2 = Scale.hashSample(spark, sf).collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    // repartitioning the input must not change a hash-based sample
    val s3 = Tables.load(spark, sf, "customer").repartition(7)
      .withColumn("h", pmod(col("c_custkey") * lit(2654435761L), lit(4294967296L)))
      .filter(col("h") < lit(429496720L))
      .collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(s1 == s3)
  }

  test("sampleBy draws per-stratum fractions with a fixed seed") {
    val c = Tables.load(spark, sf, "customer")
    val fractions = c.select("c_mktsegment").distinct().collect()
      .map(r => r.getString(0) -> 0.2).toMap
    val s = c.stat.sampleBy("c_mktsegment", fractions, 42L)
    val n = s.count()
    assert(n > 0 && n < c.count())
    // same seed → same draw
    assert(c.stat.sampleBy("c_mktsegment", fractions, 42L).count() == n)
  }

  test("percentile_approx lands within the p10-p90 spread tolerance of exact") {
    val rows = graft.operators.Scale.approxQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val spread = r.getDouble(4) /* p90_exact */ - r.getDouble(5) /* p10_exact */
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 0.05 * spread + 1e-9,
        s"p50 off for ${r.getString(0)}: approx=${r.getDouble(1)} exact=${r.getDouble(2)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) <= 0.05 * spread + 1e-9,
        s"p90 off for ${r.getString(0)}")
    }
  }

  test("TABLESAMPLE via SQL text parses and bounds the scan") {
    Tables.load(spark, sf, "customer").createOrReplaceTempView("customer_ts")
    val n = spark.sql(
      "SELECT count(*) AS n FROM customer_ts TABLESAMPLE (50 PERCENT) REPEATABLE (7)")
      .head().getLong(0)
    val total = Tables.load(spark, sf, "customer").count()
    assert(n > 0 && n <= total)
  }

  test("robust outliers: medians are data values, outliers a strict minority") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Breadth.robustOutliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(out.nonEmpty)
    val ranges = Tables.load(spark, sf, "events").groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { case (t, n, med, mad, nOut) =>
      val (lo, hi) = ranges(t)
      assert(med >= lo && med <= hi, s"$t median $med outside [$lo, $hi]")
      assert(mad >= 0, s"$t negative MAD")
      // a 50%-breakdown estimator can never flag half the data
      assert(nOut < n / 2, s"$t flagged $nOut of $n")
    }
  }

  test("rolling hour window replays exactly for the busiest user") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, sf, "events")
    val user = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).head.getLong(0)
    val rows = events.filter(col("user_id") === user)
      .select(col("event_id"), expr("unix_micros(ts) div 1000000").as("sec"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2)
    assert(rows.length > 10)
    val got = graft.operators.Breadth.rollingHour(spark, sf)
      .join(events.filter(col("user_id") === user).select("event_id"), "event_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.foreach { case (id, sec, _) =>
      val frame = rows.filter(r => r._2 >= sec - 3600 && r._2 <= sec)
      val n = frame.length.toLong
      val s = frame.map(r => BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      val mean = BigDecimal(s.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gm) = got(id)
      assert(gn == n, s"event $id: n $gn vs $n")
      assert(math.abs(gm - mean) <= 1e-9, s"event $id: mean $gm vs $mean")
    }
  }

  test("contingency margins conserve and residuals recompute from counts") {
    import org.apache.spark.sql.functions._
    val cells = graft.operators.Breadth.contingencyResiduals(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val total = Tables.load(spark, sf, "events").count()
    assert(cells.map(_._3).sum == total, "observed cells lose rows")
    // expected margins also sum to N (within rounding of the displayed values)
    assert(math.abs(cells.map(_._4).sum - total) < 0.01 * cells.length)
    val nType = cells.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._3).sum }
    val nHr = cells.groupBy(_._2).map { case (h, xs) => h -> xs.map(_._3).sum }
    cells.foreach { case (t, h, obs, exp, res) =>
      val e = nType(t).toDouble * nHr(h) / total
      assert(math.abs(exp - e) <= 5e-7, s"($t,$h) expected $exp vs $e")
      val r = (obs - e) / math.sqrt(e)
      assert(math.abs(res - r) <= 5e-7, s"($t,$h) residual $res vs $r")
    }
  }

  test("lorenz profile: counts conserve, shares sum to 1, curve monotone") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Breadth.lorenzProfile(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    val nCust = Tables.load(spark, sf, "orders")
      .select(countDistinct("o_custkey")).head.getLong(0)
    assert(rows.map(_._2).sum == nCust, "bucket counts lose customers")
    assert(math.abs(rows.map(_._4).sum - 1.0) <= 1e-4, "shares don't sum to 1")
    assert(math.abs(rows.last._5 - 1.0) <= 1e-6, "cumulative doesn't end at 1")
    assert(rows.sliding(2).forall { case Array(a, b) => a._5 <= b._5; case _ => true },
      "cumulative share not monotone")
    // higher buckets hold richer customers: per-customer average revenue
    // must be non-decreasing across buckets
    val avg = rows.map(r => r._3 / r._2)
    assert(avg.sliding(2).forall { case Array(a, b) => a <= b + 1e-9; case _ => true },
      s"avg revenue per bucket not monotone: ${avg.mkString(", ")}")
  }

  test("trend slope matches a driver-side exact least-squares replay") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Breadth.trendSlope(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val raw = Tables.load(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 1000000").as("sec"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    raw.foreach { case (t, rows) =>
      val sec0 = rows.map(_._2).min
      // exact integer/decimal sums, mirroring the operator's arithmetic
      val xs = rows.map(_._2 - sec0)
      val ys = rows.map(r => BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val n = rows.length.toLong
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val sy = ys.sum; val sxy = xs.zip(ys).map { case (x, y) => BigDecimal(x) * y }.sum
      val slope = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n * sxx.toDouble - sx.toDouble * sx.toDouble)
      val intercept = (sy.toDouble - slope * sx.toDouble) / n
      val (gn, gs, gi) = got(t)
      assert(gn == n, s"$t n: $gn vs $n")
      assert(math.abs(gs - slope) <= 1e-9, s"$t slope: $gs vs $slope")
      assert(math.abs(gi - intercept) <= 1e-5, s"$t intercept: $gi vs $intercept")
    }
  }
}
