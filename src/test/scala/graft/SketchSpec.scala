package graft

/** Error-floor pins for the mergeable-sketch operators — the rows-only
  * queries' correctness weight, same discipline as ANN recall floors. */
class SketchSpec extends SparkSpec {

  test("hll rollup: merged daily sketches estimate within 5% of exact per type") {
    val rows = graft.operators.Sketches.hllRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val est = r.getAs[Long]("est_users").toDouble
      val rel = math.abs(est - exact) / math.max(exact, 1.0)
      // lgK=14 ⇒ ~0.8% standard error; 5% is > 6 sigma — a real
      // regression (wrong column, wrong merge) lands far outside.
      // THE shared envelope constant, not a spec-local literal — the
      // hash-gated within_bound booleans verify the same bound
      assert(rel < graft.operators.Sketches.HllEnvelope,
        s"type ${r.getAs[String]("event_type")}: est $est vs exact $exact (rel $rel)")
    }
  }

  test("cms heavy hitters: estimate bounded below by exact and above by exact + eps*N") {
    val rows = graft.operators.Sketches.cmsHeavyHitters(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("est_cnt")
      val n = r.getAs[Long]("n_tokens")
      assert(est >= exact, s"CMS undercount on ${r.getAs[String]("token")}: $est < $exact")
      // eps = 1e-4; the 0.99-confidence bound is est <= exact + eps*N PER
      // probe, so across 20 probes the a-priori pass chance is only
      // ~0.99^20 ≈ 82%. The fixed seed makes the current testdata
      // deterministic, but a fixture REGENERATION could legitimately land
      // in the unlucky tail without any code bug — hence 2× slack (heavy
      // hitters sit far below even eps*N in practice; a real parameter or
      // probe bug overshoots by orders of magnitude, not 2×).
      assert(est <= exact + 2 * (1e-4 * n).toLong + 1,
        s"CMS overcount beyond 2*eps*N on ${r.getAs[String]("token")}: $est vs $exact (N=$n)")
    }
  }

  test("bounded rollups: booleans all true, audited frames agree across variants") {
    // the round-19 oracle shapes — every within_bound must hold on the
    // fixture (a false boolean is exactly what the t2 hash gate would
    // catch), and the in-session and persisted variants must emit the
    // SAME audited frame (one oracle text serves both)
    val mem = graft.operators.Sketches.hllRollupBounded(spark, sf).collect()
    val saved = graft.operators.Sketches.hllRollupSavedBounded(spark, sf).collect()
    assert(mem.nonEmpty)
    (mem ++ saved).foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"type ${r.getAs[String]("event_type")}: estimate outside the 5% envelope")
    }
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("event_type"), r.getAs[Long]("n_days"),
        r.getAs[Long]("exact_users"))
    assert(saved.map(key).toSet == mem.map(key).toSet)
  }

  test("hll rollup from the persisted sketch table equals the in-session rollup") {
    val mem = graft.operators.Sketches.hllRollup(spark, sf)
      .select("event_type", "n_days", "est_users").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val saved = graft.operators.Sketches.hllRollupSaved(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(saved == mem)
  }

  test("hll rollup is deterministic across runs") {
    val a = graft.operators.Sketches.hllRollup(spark, sf).collect().toSet
    val b = graft.operators.Sketches.hllRollup(spark, sf).collect().toSet
    assert(a == b)
  }

  test("kmv aggregator: k smallest distinct values, invariant to order, duplication and merge shape") {
    val k = 32
    val agg = new graft.functions.KmvSketch.KmvMinValues(k)
    val rnd = new scala.util.Random(7)
    val values = Array.fill(5000)(rnd.nextLong())
    val expected = values.distinct.sorted.take(k).toSeq
    // one buffer, in order
    val b1 = values.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b1).mins.toSeq == expected)
    // shuffled + every value duplicated, merged from 7 uneven partials
    val shuffled = rnd.shuffle((values ++ values).toSeq).toArray
    val parts = shuffled.grouped(shuffled.length / 7 + 1).map(
      _.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.reduce(agg.merge)
    assert(agg.finish(merged).mins.toSeq == expected)
    // fewer distinct values than k: sketch is the whole set
    val small = Array(5L, 3L, 5L, 9L, 3L)
    val bs = small.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(bs).mins.toSeq == Seq(3L, 5L, 9L))
  }

  test("kmv overlap: exact on unsaturated sketches (sets smaller than k)") {
    // sf0.001 nations hold ~24 distinct parts each — far under k=1024,
    // so every sketch is exhaustive and every estimate must be EXACT
    val rows = graft.operators.Sketches.kmvAssortmentOverlap(spark, sf).collect()
    assert(rows.length == 25 * 24 / 2)
    rows.foreach { r =>
      val (na, nb, nBoth) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))
      assert(na < 1024, s"fixture grew past k — saturated path, not this test's claim")
      assert(r.getAs[Double]("est_a") == na.toDouble)
      assert(r.getAs[Double]("est_b") == nb.toDouble)
      assert(r.getAs[Double]("est_inter") == nBoth.toDouble)
      assert(r.getAs[Double]("est_union") == (na + nb - nBoth).toDouble)
    }
  }

  test("kmv overlap: saturated estimates within floors of exact (sf0.01, k=1024)") {
    // sf0.01 nations hold ~1300-1550 distinct parts — saturated at
    // k=1024, the real estimator path. Measured max rel errs across all
    // 300 pairs: set 2.9%, union 3.4%, intersection 7.9%, jaccard abs
    // 4.2% (KMV theory: ~1/sqrt(k) = 3.1% per set; intersection error
    // compounds via rho). Floors carry ~2.5x slack for fixture
    // regeneration (fixed xxhash64 seed makes current data
    // deterministic, but new data re-rolls the sample).
    // saturation needs the sf0.01 assortments (~1300+ distinct parts per
    // nation); derive the dir from the suite's base and skip with a clear
    // message where that scale isn't generated
    val sf001 = s"$sfBase/sf0.01"
    assume(new java.io.File(sf001).isDirectory,
      s"$sf001 not present — saturated-KMV test needs the sf0.01 testdata")
    val rows = graft.operators.Sketches
      .kmvAssortmentOverlap(spark, sf001).collect()
    assert(rows.length == 25 * 24 / 2)
    var saturated = 0
    rows.foreach { r =>
      val (na, nb, nBoth) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))
      if (na >= 1024) saturated += 1
      def rel(est: Double, exact: Long) = math.abs(est - exact) / exact.toDouble
      assert(rel(r.getAs[Double]("est_a"), na) < 0.08)
      assert(rel(r.getAs[Double]("est_b"), nb) < 0.08)
      assert(rel(r.getAs[Double]("est_union"), na + nb - nBoth) < 0.10)
      assert(rel(r.getAs[Double]("est_inter"), nBoth) < 0.20,
        s"${r.getAs[String]("nation_a")}x${r.getAs[String]("nation_b")}: " +
          s"est_inter ${r.getAs[Double]("est_inter")} vs $nBoth")
      val trueJ = nBoth.toDouble / (na + nb - nBoth)
      assert(math.abs(r.getAs[Double]("est_jaccard") - trueJ) < 0.12)
    }
    assert(saturated == rows.length,
      s"only $saturated/${rows.length} pairs saturated — estimator path not exercised")
  }

  test("kmv overlap is deterministic across runs") {
    val a = graft.operators.Sketches.kmvAssortmentOverlap(spark, sf).collect().toSet
    val b = graft.operators.Sketches.kmvAssortmentOverlap(spark, sf).collect().toSet
    assert(a == b)
  }

  test("kmv estimate-only variant matches the audited query's estimate columns exactly") {
    val estCols = Seq("nation_a", "nation_b", "est_a", "est_b", "est_union",
      "est_inter", "est_only_a", "est_only_b", "est_jaccard")
    val audited = graft.operators.Sketches.kmvAssortmentOverlap(spark, sf)
      .select(estCols.head, estCols.tail: _*).collect().map(_.toSeq).toSet
    val estOnly = graft.operators.Sketches.kmvOverlapEstimates(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(estOnly == audited)
  }

  test("streaming hll sketch table: estimates within 5% of batch exact per (day, type)") {
    val streamed = graft.streaming.EventsStream.hllDailyUsers(spark, sf).collect()
    assert(streamed.nonEmpty)
    val exact = Tables.load(spark, sf, "events")
      .select(org.apache.spark.sql.functions.expr(
        "unix_timestamp(date_trunc('DAY', ts))").as("day_start"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("user_id"))
      .groupBy("day_start", "event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.length == exact.size,
      s"windowed grain mismatch: ${streamed.length} stream rows vs ${exact.size} exact")
    streamed.foreach { r =>
      val key = (r.getAs[Long]("day_start"), r.getAs[String]("event_type"))
      val est = r.getAs[Long]("est_users").toDouble
      val ex = exact(key).toDouble
      assert(math.abs(est - ex) / math.max(ex, 1.0)
          < graft.operators.Sketches.HllEnvelope,
        s"$key: streamed HLL est $est vs exact $ex")
    }
  }
}
