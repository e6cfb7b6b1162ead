package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function plugin path: a session built with GraftExtensions can
  * call the native expressions from SQL text. */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate may return a pre-existing session (other suites share the
  // JVM), where builder-time withExtensions is silently ignored — use the
  // runtime registration path, which covers the same injected functions.
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("simhash64 and dot_product are callable from SQL text") {
    val r = spark.sql(
      """SELECT simhash64(array(CAST(5 AS BIGINT))) AS sh,
        |       dot_product(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |                   array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS dp""".stripMargin)
      .head()
    assert(r.getLong(0) == 5L) // singleton simhash == the hash itself
    assert(r.getDouble(1) == 11.0)
  }

  test("shingle_hash and minhash_sig are callable from SQL text") {
    val r = spark.sql(
      """SELECT shingle_hash(split('a b c d', ' '), 3) AS sh,
        |       minhash_sig(shingle_hash(split('a b c d', ' '), 3)) AS sig""".stripMargin)
      .head()
    assert(r.getSeq[Long](0).length == 2) // 4 tokens → 2 distinct 3-grams
    assert(r.getSeq[Long](1).length == 128) // engine-standard signature width
    // SQL-produced signatures must be band-compatible with the Scala
    // dedup path: same basis → identical signature for identical input
    import org.apache.spark.sql.functions._
    val viaScala = spark.range(1)
      .select(graft.functions.HashExpressions.minhash_sig(
        graft.functions.HashExpressions.shingle_hash(split(lit("a b c d"), " "), 3),
        graft.operators.Dedup.permA, graft.operators.Dedup.permB,
        graft.operators.Dedup.P).as("sig"))
      .head().getSeq[Long](0)
    assert(r.getSeq[Long](1) == viaScala)
  }

  test("SessionMemo hits within a session and recomputes across sessions") {
    val m = new SessionMemo[java.lang.Integer]
    var calls = 0
    def body: java.lang.Integer = { calls += 1; Integer.valueOf(calls) }
    val a = m.getOrCompute(spark, "k")(body)
    val b = m.getOrCompute(spark, "k")(body)
    assert((a eq b) && calls == 1, "same session must hit the memo")
    // a cached checkpointed frame is bound to its session — a different
    // session must recompute, never receive the other session's value
    val s2 = spark.newSession()
    val c = m.getOrCompute(s2, "k")(body)
    assert(calls == 2 && c.intValue == 2, "different session must recompute")
  }

  test("SessionMemo evicts entries of unreachable sessions on insert") {
    val m = new SessionMemo[java.lang.Integer]
    val s2 = spark.newSession()
    m.getOrCompute(s2, "k")(Integer.valueOf(1))
    assert(m.size == 1)
    // simulate s2 becoming unreachable (what GC does to a dropped
    // session): clear its weak owner ref, then trigger the sweep with an
    // insert from the live session — s2's entries must be gone, the live
    // session's entry must survive
    val sid2 = org.apache.spark.sql.graft.ColumnBridge.sessionUUID(s2)
    m.owners.get(sid2).clear()
    m.getOrCompute(spark, "k")(Integer.valueOf(2))
    assert(m.size == 1, "stale session's entry must be evicted")
    // and the surviving entry is the live session's (memo hit, no recompute)
    val v = m.getOrCompute(spark, "k")(Integer.valueOf(99))
    assert(v.intValue == 2)
  }

  test("extensions class loads by name, as spark.sql.extensions would load it") {
    // the cluster path (`spark.sql.extensions=graft.GraftExtensions`)
    // instantiates the class reflectively: it must be public, no-arg,
    // and of type SparkSessionExtensions => Unit
    val inst = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    inst(ext) // must inject without throwing
  }

  test("an extensions-built session plans both custom operators with no session-local registration") {
    // Force a genuinely NEW session (same SparkContext) so builder-time
    // withExtensions actually applies — this is the deployment shape of
    // spark.sql.extensions on a cluster, where no code ever touches
    // spark.experimental.extraStrategies.
    spark.sparkContext // ensure a context exists before clearing handles
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(ext.experimental.extraStrategies.isEmpty,
        "session-local strategies present — test would not prove the extensions path")
      import org.apache.spark.sql.graft.ColumnBridge
      // interval join: points 0..99 into [10k, 10k+5) intervals
      val pts = ext.range(0, 100).selectExpr("id AS pid", "CAST(id AS DOUBLE) AS p")
      val ivs = ext.range(0, 10).selectExpr("id AS iid",
        "CAST(id * 10 AS DOUBLE) AS lo", "CAST(id * 10 + 5 AS DOUBLE) AS hi")
      val lp = pts.queryExecution.analyzed
      val rp = ivs.queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val ij = ColumnBridge.ofRows(ext, graft.plans.IntervalJoinPlan(
        lp, rp, attr(lp, "p"), attr(rp, "lo"), attr(rp, "hi")))
      assert(ij.count() === 50) // 5 of every 10 points land in an interval
      assert(ij.queryExecution.executedPlan.toString.contains("IntervalJoin"),
        s"extensions did not plan IntervalJoinExec:\n${ij.queryExecution.executedPlan}")
      // as-of join: each left row matches the latest right row at/before t
      val l = ext.range(0, 20).selectExpr("id % 2 AS k", "CAST(id AS DOUBLE) AS t")
      val r = ext.range(0, 4).selectExpr("id % 2 AS k",
        "CAST(id * 5 AS DOUBLE) AS rt", "id AS v")
      val lp2 = l.queryExecution.analyzed
      val rp2 = r.queryExecution.analyzed
      val aj = ColumnBridge.ofRows(ext, graft.plans.AsOfJoinPlan(
        lp2, rp2, attr(lp2, "k"), attr(rp2, "k"),
        attr(lp2, "t"), attr(rp2, "rt"), attr(rp2, "v"), isOuter = false))
      assert(aj.count() > 0)
      assert(aj.queryExecution.executedPlan.toString.contains("AsOfJoin"),
        s"extensions did not plan AsOfJoinExec:\n${aj.queryExecution.executedPlan}")
      assert(ext.experimental.extraStrategies.isEmpty,
        "planning must not have fallen back to session-local registration")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
