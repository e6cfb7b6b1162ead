package graft

import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}

/** Optimized-plan shape pins for queries whose 100 TB posture depends on
  * a specific plan, not just a correct answer. */
class PlanShapeSpec extends SparkSpec {

  test("min-cost supplier prunes lineitem below the pre-aggregation") {
    // the p_size part filter must reach lineitem BEFORE the big
    // (l_partkey, l_suppkey) aggregation — as a left-semi join under the
    // Aggregate — so the shuffle carries only surviving rows
    val df = graft.operators.Relational.minCostSupplier(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val aggs = optimized.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, s"no Aggregate in plan:\n$optimized")
    val semiUnderAgg = aggs.exists(_.child.collect {
      case j: Join if j.joinType == LeftSemi => j
    }.nonEmpty)
    assert(semiUnderAgg, s"no LeftSemi join below an Aggregate:\n$optimized")
    // and the final answer is non-trivial
    assert(df.count() > 0)
  }

  test("blocklist scrub and chunking are shuffle-free map plans") {
    for (df <- Seq(
        graft.operators.TextAnalysis.scrubBlocklist(spark, sf),
        graft.operators.TextAnalysis.chunkDocuments(spark, sf),
        graft.operators.TextAnalysis.redactNumbers(spark, sf))) {
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"map-side operator shuffles:\n$physical")
    }
  }

  test("bm25 broadcasts the 1-row stats frame — no sort-merge join, no data-sized shuffle") {
    val df = graft.operators.TextAnalysis.bm25Rank(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("Broadcast"), s"stats not broadcast:\n$physical")
    assert(!physical.contains("SortMergeJoin"), s"sort-merge join crept in:\n$physical")
    assert(df.count() > 0)
  }

  test("tight-threshold embedding dedup mines via banded equi-joins — no corpus cross join") {
    // the oracled tight-dup query must carry the 100 TB plan: LSH band
    // equi-join + id equi-joins, never a corpus-wide cartesian
    val df = graft.operators.Dedup.tightEmbeddingPairs(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.toLowerCase.contains("cartesianproduct"),
      s"corpus-wide cross join in tight-dup plan:\n$physical")
    // 3 views per source ⇒ exactly 3 intra-source pairs per source id
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(df.count() == 3 * n)
  }

  test("rfm and abc plans hold no unpartitioned Window and no global Sort") {
    // the two-pass cumsum/ntile must keep every Window partitioned (the
    // only acceptable single-task shapes are scalar aggregates); a
    // Window with an empty partitionSpec is the single-task funnel the
    // distributed rewrite exists to remove
    import org.apache.spark.sql.catalyst.plans.logical.{Sort => LSort, Window => LWindow}
    for (df <- Seq(
        graft.operators.Breadth.rfmSegments(spark, sf),
        graft.operators.Breadth.abcClassification(spark, sf))) {
      val optimized = df.queryExecution.optimizedPlan
      val globalWindows = optimized.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty, s"unpartitioned window:\n$optimized")
      val globalSorts = optimized.collect { case s: LSort if s.global => s }
      assert(globalSorts.isEmpty, s"global sort:\n$optimized")
      assert(df.count() > 0)
    }
  }

  test("tpch q6 pushes all three predicates into the scan and prunes to 4 columns") {
    // Q6's 100 TB cost IS the scan: the shipdate range, discount band and
    // quantity cap must appear in the parquet PushedFilters, and the
    // ReadSchema must carry only the four referenced columns — a scan
    // reading all 11 lineitem columns for this query is the wrong plan
    val df = graft.operators.SqlInterface.tpchQ6(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = formatted.linesIterator.filter(_.contains("PushedFilters")).mkString
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c not pushed:\n$formatted")
    val readSchema = formatted.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"scan reads unreferenced columns:\n$readSchema")
    assert(df.count() == 1)
  }

  test("tpch q4 plans the EXISTS as a left-semi join, not a per-row subquery") {
    val df = graft.operators.SqlInterface.tpchQ4(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val semis = optimized.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"no LeftSemi join in Q4 plan:\n$optimized")
    assert(df.count() > 0)
  }

  test("tpch q17 decorrelates the scalar-agg subquery into a per-part aggregate join") {
    // the correlated 0.2*AVG must become ONE aggregate over lineitem
    // joined back on l_partkey — never a per-row re-aggregation
    val df = graft.operators.SqlInterface.tpchQ17(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val aggUnderJoin = optimized.collect { case j: Join => j }.exists(_.exists {
      case a: Aggregate => a.groupingExpressions.nonEmpty
      case _ => false
    })
    assert(aggUnderJoin, s"no grouped Aggregate under a Join (decorrelation failed):\n$optimized")
    assert(df.count() == 1)
  }

  test("tpch q2 decorrelates the scalar-MIN into a per-part aggregate join") {
    // the region-wide minimum must become ONE aggregate over the pruned
    // cost table joined back on p_partkey — never a per-part re-scan
    val df = graft.operators.SqlInterface.tpchQ2(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val aggUnderJoin = optimized.collect { case j: Join => j }.exists(_.exists {
      case a: Aggregate => a.groupingExpressions.nonEmpty
      case _ => false
    })
    assert(aggUnderJoin, s"no grouped Aggregate under a Join (decorrelation failed):\n$optimized")
    assert(df.count() > 0)
  }

  test("tpch q21 plans EXISTS as left-semi and NOT EXISTS as left-anti joins") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val df = graft.operators.SqlInterface.tpchQ21(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val semis = optimized.collect { case j: Join if j.joinType == LeftSemi => j }
    val antis = optimized.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(semis.nonEmpty, s"no LeftSemi join in Q21 plan:\n$optimized")
    assert(antis.nonEmpty, s"no LeftAnti join in Q21 plan:\n$optimized")
    assert(df.count() > 0)
  }

  test("zipf/quantile-norm/pareto plans hold no unpartitioned Window and no global Sort") {
    // the round-12 rfm/abc defect class, propagated: vocabulary- and
    // value-grain global ranks must ride the GlobalOrder two-pass (range
    // shuffle + partitioned window + broadcast offsets), never a
    // single-task Window/Sort. The partitioned local windows live behind
    // a localCheckpoint, so the observable plan must be window-free.
    import org.apache.spark.sql.catalyst.plans.logical.{Sort => LSort, Window => LWindow}
    for (df <- Seq(
        graft.operators.TextAnalysis.zipfSlope(spark, sf),
        graft.operators.Breadth.quantileNorm(spark, sf),
        graft.operators.Breadth.paretoFrontier(spark, sf))) {
      val optimized = df.queryExecution.optimizedPlan
      val globalWindows = optimized.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty, s"unpartitioned window:\n$optimized")
      val globalSorts = optimized.collect { case s: LSort if s.global => s }
      assert(globalSorts.isEmpty, s"global sort:\n$optimized")
      assert(df.count() > 0)
    }
  }

  test("vocab growth cuts deciles arithmetically — global windows only over the decile rollup") {
    // the corpus-sized doc frame must NOT flow through an unpartitioned
    // ntile window; the only global windows allowed are the cumulative
    // sums over the 10-row decile aggregate
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = graft.operators.TextAnalysis.vocabGrowth(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val globalWindows = optimized.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    globalWindows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"global window over non-aggregated input:\n$w")
    }
    assert(df.count() == 10)
  }

  test("neg-sampling and token-coverage top-k plans as TakeOrderedAndProject, not a vocabulary window") {
    // both only need a ≤50-row head: the plan must carry per-partition
    // top-k heaps + one k-row driver merge (TakeOrderedAndProject); the
    // rank window in tokenCoverage may run only over that bounded head
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
    for (df <- Seq(
        graft.operators.TextAnalysis.negSamplingTable(spark, sf),
        graft.operators.TextAnalysis.tokenCoverage(spark, sf))) {
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("TakeOrderedAndProject"),
        s"no TakeOrderedAndProject in top-k plan:\n$physical")
      val optimized = df.queryExecution.optimizedPlan
      val globalWindows = optimized.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      globalWindows.foreach { w =>
        assert(w.child.collectFirst { case l: GlobalLimit => l }.nonEmpty,
          s"global window over un-limited input:\n$w")
      }
      assert(df.count() > 0)
    }
  }

  test("token budget rides the GlobalOrder two-pass — no window at all in the observable plan") {
    // the round-13 weak class, closed: the prefix sum must NOT partition
    // by the fixed 21-value quality band (bounded parallelism, unbounded
    // per-lane rows) — it rides withDistributedRunningSum, whose local
    // windows live behind the localCheckpoint, so the observable plan
    // holds NO Window and NO global Sort of any kind
    import org.apache.spark.sql.catalyst.plans.logical.{Sort => LSort, Window => LWindow}
    val df = graft.operators.TextAnalysis.tokenBudget(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val windows = optimized.collect { case w: LWindow => w }
    assert(windows.isEmpty, s"window survived the two-pass rewrite:\n$optimized")
    val globalSorts = optimized.collect { case s: LSort if s.global => s }
    assert(globalSorts.isEmpty, s"global sort:\n$optimized")
    assert(df.count() > 0)
  }

  test("hot-shingle and source-cap top-k run two-phase: every window partitioned, phase 1 sub-sharded") {
    // per-group top-k over an unbounded group (a language's vocabulary, a
    // viral domain) must rank inside (group, hash sub-shard) lanes first
    // and only rank the bounded survivors per group: no unpartitioned
    // window anywhere, and at least one window keyed by TWO expressions
    // (the sub-shard) below each single-key merge window
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (df <- Seq(
        graft.operators.Dedup.hotShingleProfile(spark, sf),
        graft.operators.TextAnalysis.sourceCaps(spark, sf))) {
      val optimized = df.queryExecution.optimizedPlan
      val windows = optimized.collect { case w: LWindow => w }
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"unpartitioned window:\n$optimized")
      assert(windows.exists(_.partitionSpec.size >= 2),
        s"no sub-sharded phase-1 window (single-key lanes are unbounded):\n$optimized")
      // the merge window must sit above the phase-1 rank filter: a
      // single-key window whose child contains the 2-key window
      val merged = windows.exists(w => w.partitionSpec.size == 1 &&
        w.child.collectFirst { case i: LWindow if i.partitionSpec.size >= 2 => i }.nonEmpty)
      assert(merged, s"merge window not above the sub-sharded window:\n$optimized")
      assert(df.count() > 0)
    }
  }

  test("stacked-ntile encodings finer than 6 dp are rejected at plan time") {
    // the DECIMAL(38,6) comparison domain is an ENFORCED precondition: a
    // 7-dp decimal (or double) encoding would be silently quantized,
    // merging near-ties — the call must fail loudly instead
    import org.apache.spark.sql.functions._
    val df = spark.range(10).select(col("id"),
      col("id").cast("decimal(20,7)").as("fine"),
      col("id").cast("double").as("dbl"))
    for (enc <- Seq(org.apache.spark.sql.functions.col("fine"), col("dbl"))) {
      val e = intercept[IllegalArgumentException] {
        graft.operators.GlobalOrder.withStackedNtiles(df, "id", 5, Seq(("m", enc)))
      }
      assert(e.getMessage.contains("DECIMAL(38,6)"), e.getMessage)
    }
    // the sanctioned encodings still pass: integral and 2-dp decimal
    val ok = graft.operators.GlobalOrder.withStackedNtiles(
      spark.range(10).select(col("id"), col("id").cast("decimal(18,2)").as("m2")),
      "id", 5, Seq(("a", org.apache.spark.sql.functions.col("id")), ("b", -col("m2"))))
    assert(ok.count() == 10)
  }

  test("withStackedGlobalRowNumber equals per-metric withGlobalRowNumber") {
    // the quantileNorm single-exchange rewrite (round 22) is only legal
    // because the stacked rank is bit-equal to ranking each metric lane
    // independently — pin that identity on a frame with cross-lane value
    // collisions and uneven lane sizes
    import org.apache.spark.sql.functions._
    val df = spark.range(200).select(
      (col("id") % 3).cast("string").as("m"),
      (col("id") * 37 % 41).as("v"),
      col("id").as("k"))
    val stacked = graft.operators.GlobalOrder
      .withStackedGlobalRowNumber(df, "m", "rn", col("v"), col("k"))
      .select("m", "k", "rn")
    val perMetric = Seq("0", "1", "2").map { mv =>
      graft.operators.GlobalOrder
        .withGlobalRowNumber(df.filter(col("m") === mv), "rn", col("v"), col("k"))
        .select("m", "k", "rn")
    }.reduce(_ unionAll _)
    assert(stacked.count() == 200)
    assert(stacked.exceptAll(perMetric).isEmpty && perMetric.exceptAll(stacked).isEmpty,
      "stacked global row numbers diverge from the per-metric two-pass")
  }

  test("as-of join picks via partial-aggregated argmax, not a join-product window") {
    // the most-recent-order pick must be a max(struct) aggregate whose
    // map-side partial collapses each event's candidate orders BEFORE
    // the exchange — a row_number window would shuffle and sort the full
    // event x order join product instead
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = graft.operators.Breadth.asofJoin(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collect { case w: LWindow => w }.isEmpty,
      s"window in as-of plan:\n$optimized")
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"), s"window in physical as-of plan:\n$physical")
    // partial + final aggregate pair present (struct-max rides the
    // object/sort aggregate path; both halves must appear)
    val nAgg = "Aggregate".r.findAllMatchIn(physical).length
    assert(nAgg >= 2, s"no partial+final aggregate pair:\n$physical")
    assert(df.count() > 0)
  }

  test("kmv sketch build shuffles buffers, not the value stream") {
    // the whole point of the KMV Aggregator: partial ObjectHashAggregate
    // BEFORE the exchange (map-side sketch build), final after — and no
    // distinct/extra exchange of the raw values anywhere below it
    val sk = graft.operators.Sketches.kmvSketches(
      Tables.load(spark, sf, "lineitem"), "l_suppkey", "l_partkey", 64)
    val physical = sk.queryExecution.executedPlan.toString
    val aggIdx = "ObjectHashAggregate".r.findAllMatchIn(physical).map(_.start).toSeq
    assert(aggIdx.length == 2, s"expected partial+final object agg:\n$physical")
    val exIdx = physical.indexOf("Exchange")
    assert(exIdx > aggIdx.head && exIdx < aggIdx.last,
      s"no exchange between partial and final sketch agg:\n$physical")
    assert("Exchange".r.findAllMatchIn(physical).length == 1,
      s"extra value-grain shuffle in sketch build:\n$physical")
    assert(sk.count() > 0)
  }
}
