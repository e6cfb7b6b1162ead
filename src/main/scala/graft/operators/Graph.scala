package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames — the loop lives on the
  * driver, every iteration is one distributed join + keyed aggregation
  * (the standard Pregel-on-relational shape; see also
  * [[Dedup.dedupComponents]]' min-label propagation).
  */
object Graph {

  /** FIXED-POINT PAGERANK over the bipartite part↔supplier graph from
    * lineitem (edge = "supplier ships part", deduplicated).
    *
    * Ranks are carried as BIGINT fixed-point (1.0 == 1e9), every step is
    * integer arithmetic (`div`, integer sums): bit-exact across engines
    * and accumulation orders, so the oracle hash-matches without any
    * floating-point discipline — double PageRank would diverge in the
    * last ulp because contribution sums are order-dependent and three
    * iterations amplify them.
    *
    * Scale shape: per iteration one shuffle keyed on the destination
    * node (the contribution aggregation) plus one broadcast-able join
    * against the rank/degree frame; node ids are longs (parts at 2k,
    * suppliers at 2k+1), payloads are two longs — nothing wide moves.
    * Iterations are a fixed constant (3), not a convergence loop, so the
    * lineage stays bounded and the whole computation is replayable. */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val scale = 1000000000L // 1.0 in fixed-point
    val edges = Tables.load(spark, dir, "lineitem")
      .select((col("l_partkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    // undirected: both directions carry contributions.
    // Materialized ONCE (localCheckpoint) before the loop: `und`/`deg`
    // appear in every iteration's lineage, so as plain frames the final
    // plan would re-scan and re-distinct lineitem ~2 per iteration — 6
    // redundant full-fact shuffles at 3 iterations, a scale-killer at
    // 100 TB. Checkpoint blocks are owned by the frames' RDDs and
    // reclaimed by the ContextCleaner when the result is dropped.
    val und = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    val deg = und.groupBy("src").agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    var ranks = deg.select(col("src").as("node"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      val contribs = und
        .join(ranks, und("src") === ranks("node"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("r div d").as("c"))
        .groupBy("node")
        .agg(sum("c").as("csum"))
      ranks = contribs.select(col("node"),
        (lit(scale * 15 / 100) + expr("85L * csum div 100")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_fp"),
      (col("node") % 2 === 0).cast("int").as("is_part"))
  }
}
