package graft

import org.apache.spark.sql.functions._

/** Fixed-point PageRank invariants (the values themselves are fully
  * oracle-checked; these pin the graph semantics). */
class GraphSpec extends SparkSpec {

  test("pagerank conserves rank mass up to integer truncation") {
    val r = graft.operators.Graph.pageRank(spark, sf)
    val n = r.count()
    val total = r.agg(sum("rank_fp")).head().getLong(0)
    val full = n * 1000000000L
    // each div truncates at most 1 unit per edge per iteration; mass can
    // only leak DOWN, and only by ppm-scale amounts
    assert(total <= full, s"rank mass grew: $total > $full")
    assert(total >= full * 999L / 1000L, s"rank mass leaked: $total vs $full")
  }

  test("pagerank loop lineage holds the checkpointed edges, not lineitem") {
    // und/deg are materialized once before the loop; a regression back to
    // plain frames would re-scan parquet ~2x per iteration and show up
    // here as FileScan nodes in the final plan.
    val r = graft.operators.Graph.pageRank(spark, sf)
    val plan = r.queryExecution.executedPlan.toString()
    assert(!plan.contains("Scan parquet"),
      s"pagerank plan re-scans parquet instead of the checkpointed edges:\n$plan")
  }

  test("degree-oriented triangle count equals the brute-force triple join") {
    val r = graft.operators.Graph.triangleCount(spark, sf).head()
    val (nNodes, nEdges, nWedges, nTri) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // brute force: three-way join over canonical a<b<c edges — the
    // definition, with no orientation cleverness to share a bug with
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val e = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct().cache()
    val brute = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    e.unpersist()
    assert(nTri === brute, s"oriented $nTri vs brute $brute")
    assert(nTri <= nWedges, "more triangles than wedges")
    assert(nNodes > 0 && nEdges > 0)
  }

  test("k-core peel cascades: a chain's 2-core peels from the ends inward") {
    import spark.implicits._
    // path 0-1-2-...-9: every interior node has degree 2, but the
    // 2-core is EMPTY — peeling removes the two endpoints each round,
    // which is exactly the cascade a single degree-filter pass misses
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    def survivors(rounds: Int): Set[Long] =
      graft.operators.Graph.kCorePeel(chain, k = 2, rounds = rounds)
        .collect().map(_.getLong(0)).toSet
    // driver-side reference peel with the same round bound
    def refPeel(rounds: Int): Set[Long] = {
      var edges = (0L until 9L).map(i => (i, i + 1)).toSet
      for (_ <- 1 to rounds) {
        val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val keep = deg.filter(_._2 >= 2).keySet
        edges = edges.filter(e => keep(e._1) && keep(e._2))
      }
      edges.flatMap(e => Seq(e._1, e._2))
    }
    for (r <- 1 to 5) {
      assert(survivors(r) == refPeel(r), s"round $r diverged")
    }
    // each round strictly shrinks the chain until nothing is left
    assert(survivors(1) == (1L to 8L).toSet)
    assert(survivors(4) == Set(4L, 5L))
    assert(survivors(5).isEmpty)
  }

  test("k-core default rounds reach the fixpoint on the test graph") {
    // k=10 keeps the sf0.001 core non-trivial (both smaller and larger k
    // either keep ~everything or empty the graph — see the degree census
    // in the operator's docs); the query default k=30 targets sf>=0.01
    val a = graft.operators.Graph.kCore(spark, sf, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = graft.operators.Graph.kCore(spark, sf, k = 10, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "4 rounds did not reach the fixpoint at spec scale")
    assert(a.nonEmpty)
    // every member of the core retains >= k edges within the core — the
    // defining property — except where the round budget cut a cascade
    // short, which the fixpoint equality above rules out
    assert(a.forall(_._3 >= 10), "a core member has fewer than k in-core edges")
    // the cut is real: some nodes were peeled away
    val allNodes = Tables.load(spark, sf, "orders")
      .select(countDistinct("o_custkey")).head.getLong(0) +
      Tables.load(spark, sf, "lineitem")
        .select(countDistinct("l_suppkey")).head.getLong(0)
    assert(a.size < allNodes, "peel removed nothing at k=10")
  }

  test("high-degree suppliers outrank parts on average (bipartite shape)") {
    val r = graft.operators.Graph.pageRank(spark, sf)
    val avg = r.groupBy("is_part").agg(
      (sum("rank_fp") / count(lit(1))).as("avg_rank"))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    // far fewer suppliers than parts share the same edge set, so each
    // supplier accumulates much more rank
    assert(avg(0) > avg(1) * 2, s"supplier avg ${avg(0)} vs part avg ${avg(1)}")
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted-distinct arrays") {
    // pins the round-21 triangle inner-loop swap: the two-pointer merge
    // must agree with the hash-set built-in on exactly the input class
    // the adjacency build produces (ascending, distinct), including
    // empty and disjoint arrays
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      def arr() = rnd.shuffle((0L until 60L).toList)
        .take(rnd.nextInt(12)).distinct.sorted.toArray
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.HashExpressions.sorted_intersect_count(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(got == 0, s"$got rows disagree with array_intersect")
  }
}
