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
      // regression (wrong column, wrong merge) lands far outside
      assert(rel < 0.05,
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
}
