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

  test("high-degree suppliers outrank parts on average (bipartite shape)") {
    val r = graft.operators.Graph.pageRank(spark, sf)
    val avg = r.groupBy("is_part").agg(
      (sum("rank_fp") / count(lit(1))).as("avg_rank"))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    // far fewer suppliers than parts share the same edge set, so each
    // supplier accumulates much more rank
    assert(avg(0) > avg(1) * 2, s"supplier avg ${avg(0)} vs part avg ${avg(1)}")
  }
}
