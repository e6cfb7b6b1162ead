package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Scale-up spot-bench: derives a 10× corpus ("sf1") from the sf0.1
  * testdata and times the headline scale queries at both sizes in one
  * JVM, writing `SCALEBENCH_sf1.json` — the measurement that converts
  * the operators' "100 TB posture" arguments from plan-reading into
  * observed scaling ratios.
  *
  * Derivation (NOT new synthetic data — a replication of the
  * driver-generated tables with shifted key spaces, so per-copy
  * statistics are exactly the originals'):
  *   - `documents`: 10 copies, ids offset, every token prefixed with
  *     its copy tag — copies are textually DISJOINT (cross-copy Jaccard
  *     = 0), so the near-dup pair graph is exactly 10× the original
  *     and the dedup queries measure 10× the WORK, not a
  *     quadratically-denser output;
  *   - `embeddings`: ids offset + per-copy sign-flip rotation (intra-copy
  *     geometry exact, cross-copy cosines near zero — the probe set stays
  *     the original, the scanned corpus is 10× and non-degenerate);
  *   - `events` / `lineitem`: ids offset per copy — 10 disjoint user
  *     populations / join graphs.
  * Each query runs twice per scale; the min is recorded (same
  * self-defense as [[Bench]]).
  */
object ScaleBench {
  // THE tenant stride (Scale.TenantStride), not an independent literal:
  // the interval joins derive per-tenant value domains from `key div
  // stride`, and that only measures ~10× pair volume because the staging
  // offsets keys by copy × the SAME stride (round-16 diff review)
  private val Stride = graft.operators.Scale.TenantStride

  /** Per-query run count: 2 by default (min-of-2, same self-defense as
    * [[Bench]]); queries whose committed ratio has shown RUN VARIANCE
    * wider than the scaling signal get 4 runs so the recorded min is a
    * stable floor, not a coin flip. q_analyze_stats: the r15 artifact
    * recorded a 10.27 ratio from 2 runs while mid-round min-of-more
    * measurements sat at ~6.4 — ANALYZE's stats-collection pass is
    * warmup-sensitive (2-4× spread in the recorded sf01_runs). */
  private val ExtraRuns = Map("q_analyze_stats" -> 4)
  private def runsFor(name: String): Int = ExtraRuns.getOrElse(name, 2)

  // one list drives BOTH the recall computation and the JSON emitter —
  // adding a variant to only one of two copies would throw a Map lookup
  // at artifact-write time, after the whole sweep's timings completed.
  // The recall measurements call the SERVE-shape library functions
  // directly (round 20): the registered q_ann_ivf query is now the
  // bounded-recall AUDIT frame (exact half + floor boolean — ask #4),
  // while the artifact keys keep naming the serve paths they measure.
  private val AnnVariants = Seq("q_ann_ivf", "q_ann_pq")
  private val AnnServe: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_ivf" -> ((s, d) => graft.operators.Similarity.ivfTopK(s, d)),
    "q_ann_pq" -> ((s, d) => graft.operators.Similarity.pqTopK(s, d)))

  // q_dedup_embedding is deliberately NOT here: an exact cosine pair join
  // at threshold 0.4 over this (weakly-clustered) embedding space is
  // Ω(n²) for every engine — see Dedup.embeddingPairs — so a 10× ratio
  // would only measure the quadratic semantics, not the implementation.
  // The embedding family's scale representatives are q_ann_ivf (bounded
  // per-probe work, below) and the recall-floored LSH miner.
  private val Queries = Seq(
    "q_dedup_minhash", "q_dedup_ngram_prefix", "q_ann_ivf",
    "q_pagerank", "q_sessionize_batch",
    "q_dedup_incremental", "q_hot_shingles", "q_stream_dedup_incremental",
    "q_triangle_count", "q_funnel_steps", "q_kcore", "q_basket_pairs",
    "q_path_trigrams",
    "q_dedup_containment", "q_analyze_stats", "q_mask_spans",
    "q_modularity", "q_prototype_prune",
    // round-11/12 wave: window-over-pre-aggregate and sweep-line shapes
    // (events/orders/lineitem ride per-copy key offsets → 10× the work),
    // plus the banded tight-dup path over the 10× augmented corpus
    "q_rfm_segments", "q_abc_class", "q_interval_union",
    "q_peak_concurrency", "q_audience_overlap", "q_drawdown",
    "q_dedup_embedding_tight",
    // mergeable sketches: the pattern exists FOR scale — the rollup
    // shuffles only (day,type) sketch rows, the CMS one ~1 MB sketch.
    // The PROBE-ONLY variant is benched (not q_cms_heavy_hitters, whose
    // 17× r12 ratio measured its test-scale exact audit — a vocabulary-
    // sized groupBy the 100 TB pattern drops; the audited version keeps
    // carrying the correctness weight in CORRECTNESS/SketchSpec)
    "q_sketch_rollup", "q_cms_probe_only",
    // streaming state-store family: stream-stream inner+outer joins and
    // the timer sessionizer — RocksDB state scaling was the one
    // measured-ratio blind spot (events ride per-copy user_id offsets →
    // 10× disjoint key populations, so state size scales 10× while the
    // per-key watermark/timer logic is copy-invariant)
    "q_stream_stream_join", "q_stream_stream_outer",
    "q_stream_sessions_timers",
    // round-13 GlobalOrder rewrites: the two-pass rank/running-max pays
    // a fixed range-exchange cost at sf0.1 — these entries measure the
    // payoff side (ratios should sit well under 10× because the fixed
    // half amortizes; vocab/zipf ride the 10× token stream, quantile
    // the 10× event values, pareto the 10× part prices)
    "q_vocab_growth", "q_zipf_slope", "q_quantile_norm",
    "q_pareto_frontier",
    // the full TPC-H suite at 10×: per-copy key offsets keep every join
    // graph intact (10 disjoint copies), dims (nation/region) and the
    // date domain are copy-invariant, so selectivities hold and each
    // shape measures 10× the join/agg work under the SAME optimizer
    // choices AQE would face on a growing warehouse. Scalar-subquery
    // thresholds (Q11's 2×-mean, Q15's MAX, Q17/Q20's per-key aggs) are
    // per-copy-invariant by construction, so result cardinality scales
    // ~10× rather than degenerating to 0 or n².
    "q_sql_tpch_q1", "q_sql_tpch_q2", "q_sql_tpch_q3", "q_sql_tpch_q4",
    "q_sql_tpch_q5", "q_sql_tpch_q6", "q_sql_tpch_q7", "q_sql_tpch_q8",
    "q_sql_tpch_q9", "q_sql_tpch_q10", "q_sql_tpch_q11", "q_sql_tpch_q12",
    "q_sql_tpch_q13", "q_sql_tpch_q14", "q_sql_tpch_q15", "q_sql_tpch_q16",
    "q_sql_tpch_q17", "q_sql_tpch_q18", "q_sql_tpch_q19", "q_sql_tpch_q20",
    "q_sql_tpch_q21", "q_sql_tpch_q22",
    // heavy curation / analytic shapes not yet ratio-measured: the
    // copy-prefixed token streams make span/ngram work honestly 10×
    // (cross-copy Jaccard 0), the events/orders copies make the
    // percentile/window shapes 10× the fact. q_fuzzy_canonical is
    // deliberately absent: it operates at DISTINCT-name grain and part
    // names repeat verbatim across copies, so its 10× ratio would
    // trivially measure ~1×, not the operator.
    "q_corpus_curation", "q_dup_spans", "q_token_budget",
    "q_repetition_signals", "q_tfidf_features", "q_hybrid_search",
    "q_decontaminate_bloom", "q_winsorize", "q_robust_outliers",
    "q_cohort_retention", "q_asof_join", "q_scd2_apply",
    // KMV set-operation sketches and the streaming HLL sketch-table
    // build: per-copy partkey/user offsets make assortments and daily
    // cohorts honestly 10×, while the sketch/pair/state sizes stay
    // constant per key. NOTE (r18): q_kmv_overlap_est now carries its
    // bounded-error oracle, so the benched query includes the exact
    // audit trio alongside the estimates — unlike the CMS case (whose
    // audit was a vocabulary-sized groupBy that measured 17× and got a
    // probe-only bench twin), the KMV audit self-join rides DISJOINT
    // per-copy partkeys and stays linear at 10× (measured 7.0), so the
    // oracled shape remains a fair scale representative; the pure
    // estimate shape (kmvOverlapEstimates) keeps its SketchSpec
    // bit-equality coverage.
    "q_kmv_overlap_est", "q_stream_hll_daily",
    // round-15 blind-spot closures (the r14 verdict's ask #2): the
    // multimodal decode seam (mapPartitions batched kernels over 10×
    // the payload bytes — the one LLM-pillar family with no prior
    // ratio), the custom interval-join physical operator (binary
    // search + prefix-max pruning — its whole reason to exist is
    // asymptotics), the two-phase sub-shard source-caps rewrite (the
    // ledger's "sub-linear" claim, now backed by a committed number),
    // and the IVFADC PQ serve path beside its recall row.
    // Interval joins are TENANT-SCOPED as of round 16 (Scale.TenantStride):
    // spine and probe both derive a per-key-stride tenant whose intervals
    // live in a disjoint value neighborhood, so the staged copies' pair
    // volume is ~10× the original's (DuckDB-verified), not the ~100×
    // same-value-domain cross product the r15 artifact measured (97.5×
    // pairs → 52.7/19.3 time ratios that graded the STAGING, not the
    // operator). On the driver testdata the tenant term is zero — oracle
    // hashes unchanged.
    "q_multimodal_meta", "q_multimodal_features", "q_multimodal_frames",
    "q_interval_join", "q_interval_join_time", "q_source_caps",
    "q_ann_pq",
    // the rest of the streaming family — the round-13 ratio blind spot:
    // windowed/sliding aggregation, both sessionizer APIs, the
    // stream-static broadcast join and the foreachBatch sink. Each entry
    // also records its peak state-store footprint (rows/bytes from the
    // progress metrics) at both scales — watermark-scoped aggregation
    // state and per-user session state are the 100 TB memory story.
    "q_stream_hourly", "q_stream_sliding", "q_stream_sessions",
    "q_stream_static_join", "q_stream_foreachbatch", "q_stream_sessions_tws")

  // the 30× staging parameters, shared by the full sweep's slope block
  // and the SLOPE_ONLY mode — two copies would let the modes silently
  // measure different stagings under the same artifact key
  private val Sf3Copies = 30
  private val Sf3Tables = Set("customer", "documents", "events",
    "lineitem", "nation", "orders", "supplier")

  /** SAME-PHASE slope quotient measurement (round 18, extracted round
    * 20 for the SLOPE_ONLY mode): each query's sf0.1 runs are re-timed
    * IMMEDIATELY BESIDE its sf3 runs, so the committed ratio30 is a
    * quotient of same-minute measurements — a local box drifts over the
    * ~30-min window separating the sweep's sf0.1 phase from the 30×
    * phase, and the round-18 first cut recorded a 50× "slope" purely
    * from that drift. */
  private def samePhaseSlope(spark: SparkSession, names: Seq[String],
      src: String, sf3: String): Map[String, (Seq[Double], Seq[Double])] =
    names.map { nq =>
      val fn = SparkEntry.queries(nq)
      def runsAt(dir: String): Seq[Double] = (1 to runsFor(nq)).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      nq -> (runsAt(src), runsAt(sf3))
    }.toMap

  /** SLOPE-ONLY mode (round 20, the r19 verdict's ask #3):
    * `SPARK_GRAFT_SLOPE_ONLY=q_a,q_b` measures 30× slope points for
    * just the named queries — same sf3 staging, same same-phase
    * quotient as the full sweep's slope block — without re-paying the
    * ~1.5 h sweep whose data the quotient does not use. Emits
    * `SCALEBENCH_slope_only.json`; `tools/merge_slopes.py` splices the
    * entries into the canonical artifact's `thirty_x` map, backfilling
    * the display-only sweep fields (sf01_sweep_sec, the 10× point)
    * from the committed artifact's own `queries` map. */
  private def runSlopeOnly(spark: SparkSession, src: String, csv: String): Unit = {
    val names = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "SPARK_GRAFT_SLOPE_ONLY: empty query list")
    names.foreach(n => require(SparkEntry.queries.contains(n),
      s"SPARK_GRAFT_SLOPE_ONLY: unknown query '$n'"))
    val sf3 = sys.env.getOrElse("SPARK_GRAFT_SF3_DIR", "/tmp/graft_sf3")
    validateStagedParams(sf3, s"copies=$Sf3Copies;src=$src")
    generate(spark, src, sf3, Sf3Copies, Sf3Tables)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => } // warm-up
    val slope = samePhaseSlope(spark, names, src, sf3)
    val entries = names.map { nq =>
      val (adj01Runs, sf3Runs) = slope(nq)
      val s01 = adj01Runs.min
      val s30 = sf3Runs.min
      s""""$nq":{"sf01_sec":${f3(s01)},"sf3_sec":${f3(s30)},""" +
        s""""ratio30":${f3(s30 / s01)},""" +
        s""""sf01_adjacent_runs":[${adj01Runs.map(f3).mkString(",")}],""" +
        s""""sf3_runs":[${sf3Runs.map(f3).mkString(",")}]}"""
    }.mkString(s"""{"copies":$Sf3Copies,""", ",", "}")
    val line =
      s"""{"metric":"slope_only","copies":$Sf3Copies,"src":"${jsonEscape(src)}","commit":"$gitShortHead","measured_at_epoch_sec":${System.currentTimeMillis() / 1000L},"thirty_x":$entries}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/SCALEBENCH_slope_only.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
  }

  /** The staged corpus is only valid for the params that generated it:
    * a rerun with different copies/src would silently bench stale
    * tables while the artifact records the NEW parameters. Fail loudly
    * on mismatch (auto-deleting a multi-GB staged dir is not this
    * tool's call); the sentinel is written ONLY for a fresh/empty dir —
    * a dir that already holds staged tables but no `_PARAMS` (a
    * pre-sentinel-era leftover) is exactly the stale-corpus case the
    * guard exists to catch, and stamping it with the CURRENT params
    * would validate nothing. */
  private[graft] def validateStagedParams(out: String, params: String): Unit = {
    val paramsFile = java.nio.file.Paths.get(out, "_PARAMS")
    if (java.nio.file.Files.exists(paramsFile)) {
      val staged = java.nio.file.Files.readString(paramsFile).trim
      // legacy acceptance (round-20, r19 ADVICE): a sentinel written
      // before round 19 dropped the tables list still carries
      // `;tables=...` after the SAME copies/src — that dir IS valid for
      // this run (table membership is governed per-table by generate()'s
      // _SUCCESS backfill), so rewrite the sentinel to the new format
      // instead of hard-failing into the multi-GB restage the format
      // change existed to avoid. Prefix-match on `params + ";tables="`
      // only: a differing copies/src still fails loudly below.
      if (staged != params && staged.startsWith(params + ";tables=")) {
        java.nio.file.Files.writeString(paramsFile, params)
        println(s"[graft] $out: legacy _PARAMS [$staged] rewritten to " +
          s"[$params] (same copies/src; table membership is per-table)")
        return
      }
      require(staged == params,
        s"staged corpus at $out was generated with [$staged] but this " +
          s"run asks for [$params] — remove $out (or point " +
          "SPARK_GRAFT_SF1_DIR elsewhere) to regenerate")
    } else {
      val existing = Option(new java.io.File(out).listFiles()).toSeq.flatten
      require(!existing.exists(_.getName.endsWith(".parquet")),
        s"staged corpus at $out holds tables but no _PARAMS sentinel — " +
          "it predates parameter stamping and cannot be validated; " +
          s"remove $out to regenerate (or stamp _PARAMS manually if you " +
          "are certain of its provenance)")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      java.nio.file.Files.writeString(paramsFile, params)
    }
  }

  /** Served-fraction gate (round-18, verdict ask #7): the auto nprobe
    * rule targets the ≤10% done-bar budget (bisection-calibrated on
    * content-hash probes for the single-level index, the fixed
    * 6%-of-cells rule for the two-level route), while the artifact
    * records the id<10 evaluation probes. The two agree on every staged
    * corpus today, but a corpus whose early ids sit in dense cells can
    * serve above the calibrated fraction — this turns the RUN red at
    * [[graft.operators.Similarity.ServedFractionBound]] (0.098 + 0.007
    * allowance, the shared constant) instead of recording a
    * silently-higher number. Callers invoke it AFTER their artifact
    * write (round-18 review): the divergent number must be persisted
    * and visible, then the run fails loudly — a pre-write throw would
    * vaporize hours of completed measurements, recording nothing.
    * Applied only where the auto rule, not the small-corpus candidate
    * floor, governs the geometry: the sf0.1 source corpus (2k vectors)
    * floors at ~0.33 BY DESIGN and is exempt. */
  private[graft] def requireServedFraction(what: String, frac: Double): Unit =
    require(frac <= graft.operators.Similarity.ServedFractionBound,
      String.format(java.util.Locale.ROOT,
        "%s: served scanned fraction %.3f exceeds the calibrated 0.098 " +
          "target + 0.007 divergence allowance - the id<10 evaluation " +
          "probes sit in denser cells than the auto rule's calibration " +
          "(single-level: content-hash bisection, see " +
          "Similarity.measuredNprobeOf's HONEST LIMIT; two-level: the " +
          "6%%-of-cells rule). The artifact retains the divergent number.",
        what, Double.box(frac)))

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ANN5M-ONLY mode (round 18): the 64g build-class JVM exists for ONE
    // measurement — the 5M two-level point — yet the r17 protocol re-ran
    // the whole 8g sweep inside it first (~2 h of heap-inflated timings
    // committed only as provenance). SPARK_GRAFT_ANN5M_ONLY=1 goes
    // straight to the 5M block (which writes SCALEBENCH_sf1_64g.json
    // itself, incrementally per draw); the canonical 8g artifact is
    // untouched and a later 8g run merges the refreshed field as before.
    if (sys.env.get("SPARK_GRAFT_ANN5M_ONLY").contains("1")) {
      // CANARY sub-mode (round 20): SPARK_GRAFT_ANN5M_CANARY=<seed>
      // runs the promotion gate + escalation ladder on ONE draw instead
      // of the full sweep — see [[runAnn5mCanary]].
      if (sys.env.get("SPARK_GRAFT_ANN5M_CANARY").exists(_.trim.nonEmpty))
        runAnn5mCanary(spark, src)
      else runAnn5m(spark, src)
      spark.stop()
      return
    }

    // SLOPE-ONLY mode (round 20): measure named 30× points without the
    // full sweep — see [[runSlopeOnly]].
    val slopeOnly = sys.env.get("SPARK_GRAFT_SLOPE_ONLY").filter(_.trim.nonEmpty)
    if (slopeOnly.isDefined) {
      runSlopeOnly(spark, src, slopeOnly.get)
      spark.stop()
      return
    }

    validateStagedParams(out, s"copies=$copies;src=$src")
    // EVERY staged dir validates up front (round-18 review — learned
    // live: this round's q_analyze_stats addition changed the sf3
    // params string, and the stale-staging require only fired ~30 min
    // in, after the full timed sweep, losing it; a sentinel mismatch
    // must cost seconds, not the run). Staging itself still happens at
    // each block — a fresh dir is stamped here and backfilled there.
    val emb100 = sys.env.getOrElse("SPARK_GRAFT_EMB100_DIR", "/tmp/graft_emb100")
    validateStagedParams(emb100, s"copies=100;src=$src;tables=embeddings")
    val sf3 = sys.env.getOrElse("SPARK_GRAFT_SF3_DIR", "/tmp/graft_sf3")
    val sf3Copies = Sf3Copies
    // the sentinel guards GENERATION parameters (copies/src) only — NOT
    // the table list (round-19 review): table membership is governed
    // per-table by generate()'s _SUCCESS backfill checks, and encoding
    // it here forced a full multi-GB restage every time a new slope
    // query pulled another table in (r18 lost a timed sweep to exactly
    // that; this round's customer/supplier/nation additions would have
    // again). A dir staged under the same copies/src but a narrower set
    // is simply backfilled.
    validateStagedParams(sf3, s"copies=$sf3Copies;src=$src")
    // per-TABLE existence checks, not a single all-or-nothing sentinel:
    // a cached dir generated before a new table joined the generator
    // (region, round 13) must be backfilled, not trusted — a missing dim
    // would abort the whole sweep at the first query that reads it
    generate(spark, src, out, copies)

    try SparkEntry.entry(spark).count() catch { case _: Throwable => } // warm-up

    final case class Timing(name: String, runs: Seq[Double],
      state: Option[graft.streaming.EventsStream.StateFootprint]) {
      def min: Double = runs.min
    }
    def timeAt(dir: String): Seq[Timing] = Queries.map { n =>
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // reset, then read AFTER the timed runs: a stale footprint from the
      // previous (streaming) query must not be billed to a batch query
      graft.streaming.EventsStream.lastStateFootprint = None
      val runs = (1 to runsFor(n)).map(_ => once())
      Timing(n, runs, graft.streaming.EventsStream.lastStateFootprint)
    }
    val small = timeAt(src)
    val big = timeAt(out)

    // ANN recall@k vs the exact brute-force top-k at BOTH scales: the
    // latency ratio alone would hide an index whose fixed nlist/nprobe
    // degrades as the corpus grows — recall is the number a user trusts.
    // The brute frame is computed ONCE per dir and shared with the seed
    // sweep below (round-17 review: it is seed-INVARIANT, and the per-
    // seed recomputation paid 6 exact scans where 2 suffice).
    def bruteOf(dir: String): (org.apache.spark.sql.DataFrame, Double) = {
      val brute = SparkEntry.queries("q_ann_brute")(spark, dir)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val denom = brute.count().toDouble
      // fail loudly rather than emit 0/0 = NaN unquoted into the JSON
      // artifact (an empty embeddings table would otherwise pass every
      // rows-only .count() timing and corrupt the output line silently)
      require(denom > 0, s"bruteOf($dir): brute-force top-k is empty")
      (brute, denom)
    }
    def recallWith(brute: org.apache.spark.sql.DataFrame, denom: Double,
        dir: String): Map[String, Double] =
      AnnVariants.map { n =>
        val approx = AnnServe(n)(spark, dir)
          .select("query_id", "neighbor_id")
        n -> brute.join(approx, Seq("query_id", "neighbor_id")).count() / denom
      }.toMap
    def recallAt(dir: String): Map[String, Double] = {
      val (b, d) = bruteOf(dir)
      recallWith(b, d, dir)
    }
    val recallSmall = recallAt(src)
    val (bruteBig, denomBig) = bruteOf(out)
    val recallBig = recallWith(bruteBig, denomBig, out)

    // THIRD ANN scale point (round 16): a 100× embeddings-only corpus
    // (200k vectors off the sf0.1 source — ids offset, per-copy sign
    // flips, same staging as the 10× tables). Two points (2k → 20k)
    // could not show whether the recall-at-fraction pair HOLDS as the
    // auto geometry walks its rule; three spanning 100× can. Staged
    // once and param-stamped like the main corpus; only the embeddings
    // table exists there, which is all the ANN queries read.
    if (!new java.io.File(s"$emb100/embeddings.parquet/_SUCCESS").exists())
      stageEmbeddings(spark, src, emb100, 100)
    val (brute100, denom100) = bruteOf(emb100)
    val recall100 = recallWith(brute100, denom100, emb100)

    // MIN-OVER-SEEDS recall (round-17 verdict ask #2): the committed
    // recall numbers were single-draw while the round-16 ledger measured
    // quantizer draws moving recall ±0.04-0.08 at fixed geometry — so
    // the artifact now records recall@5 under THREE independent draws at
    // the 20k and 200k points, and the MIN is the margin number. The
    // seed reaches the build via the graft.ivf.seed system property
    // (trainSeed); the seed is part of every index-memo key, so draws
    // coexist in-session and the default-seed indexes the timed sweep
    // used above are untouched.
    val seedList = Seq(1L, 2L, 3L)
    def seedRecallsAt(dir: String, brute: org.apache.spark.sql.DataFrame,
        denom: Double): Map[String, Seq[Double]] = {
      val per = seedList.map { s =>
        sys.props("graft.ivf.seed") = s.toString
        try recallWith(brute, denom, dir)
        finally sys.props.remove("graft.ivf.seed")
      }
      AnnVariants.map(v => v -> per.map(_(v))).toMap
    }
    val seedsBig = seedRecallsAt(out, bruteBig, denomBig)
    val seeds100 = seedRecallsAt(emb100, brute100, denom100)

    // SCANNED FRACTION beside recall (round 15): recall alone can hide
    // an index that scans most of the corpus — the pair is the cost
    // model. The coarse-gate fraction is SHARED by q_ann_ivf and
    // q_ann_pq (IVFADC rides the same auto geometry); PQ additionally
    // records its constant exact-rerank fraction.
    def fracsAt(dir: String): (Double, Double) = (
      graft.operators.Similarity.ivfScannedFraction(spark, dir, 10),
      graft.operators.Similarity.pqRerankFraction(spark, dir, 5))
    val (ivfFracSmall, pqRrFracSmall) = fracsAt(src)
    val (ivfFracBig, pqRrFracBig) = fracsAt(out)
    val (ivfFrac100, pqRrFrac100) = fracsAt(emb100)

    // THIRD SCALE POINT for the heaviest documented-linear floors
    // (round-17 verdict ask #4): q_asof_join (10× ratio 8.19),
    // q_dup_spans (7.17), q_hot_shingles (6.54) were asserted linear
    // from two points — a 30× staging (only the tables those queries
    // read) turns the assertion into a measured slope: ratio ≈ copies
    // for a linear operator. q_analyze_stats joined in round 18 (the
    // r17 verdict's ask #4 remainder: at 7.82 it was the second-
    // heaviest 10× ratio yet had no slope point — its per-copy-offset
    // l_orderkey stream makes the two-phase NDV shuffle honestly 30×).
    // Round-19 additions (the r18 verdict's ask #4): the corrected
    // same-phase instrument changed asof's story (25→34), so the
    // heaviest 10×-only ratios get 30× points before their committed
    // numbers are trusted at face value — q_corpus_curation (7.11, the
    // heaviest without a slope), q_kmv_overlap_est (7.04, new bounded
    // shape: the audit self-join rides disjoint per-copy partkeys, so
    // its slope should stay ≈ linear), q_modularity (6.86, the graph
    // family's representative: nations are copy-invariant, edges 30×).
    // Their tables pull customer/supplier/nation into the staging set —
    // custkey/suppkey offsets keep 30 disjoint join graphs while
    // nationkeys stay copy-invariant (the modularity partition and the
    // KMV nation grain hold their 25 groups as work scales).
    val SlopeQueries = Seq("q_asof_join", "q_dup_spans", "q_hot_shingles",
      "q_analyze_stats", "q_corpus_curation", "q_kmv_overlap_est",
      "q_modularity")
    generate(spark, src, sf3, sf3Copies, Sf3Tables)
    // SAME-PHASE slope quotient (round 18): the sweep's sf0.1 timing for
    // these queries lands ~30 min earlier in the run than the 30× point,
    // and a local box drifts over that window — the round's first cut
    // recorded q_asof_join at ratio30 = 50 purely from a fast-early
    // denominator (0.29 s, vs 0.43 in the r17 artifact and this run's
    // own 30×-adjacent re-timing) over a slow-late numerator. The slope
    // block therefore re-times sf0.1 IMMEDIATELY BESIDE each query's 30×
    // runs and the committed ratio is a quotient of same-minute
    // measurements; the sweep timings keep feeding the 10× table, whose
    // two phases are adjacent.
    val slope30 = samePhaseSlope(spark, SlopeQueries, src, sf3)

    // FOURTH ANN SCALE POINT — the two-level residual route on real data
    // past the cap-bind point: see [[runAnn5m]]. A 64g build-class run
    // (SPARK_GRAFT_ANN5M=1) measures and writes SCALEBENCH_sf1_64g.json;
    // this 8g-sweep artifact merges that file's two_level_5m field.
    val ann5mOn = sys.env.get("SPARK_GRAFT_ANN5M").contains("1")

    val perQuery = small.zip(big).map { case (s, b) =>
      val (sMin, bMin) = (s.min, b.min)
      // emit whichever scales actually reported a footprint — a query
      // with state at one scale only (all-zero batches or progress
      // retention at the other) must not read back as stateless
      val state = (s.state, b.state) match {
        case (None, None) => ""
        case (os, ob) =>
          def pair(field: graft.streaming.EventsStream.StateFootprint => Long): String =
            Seq(os.map(x => s""""sf01":${field(x)}"""), ob.map(x => s""""sf1":${field(x)}"""))
              .flatten.mkString("{", ",", "}")
          s""","state_rows":${pair(_.rows)},"state_bytes":${pair(_.bytes)}"""
      }
      s""""${s.name}":{"sf01_sec":${f3(sMin)},"sf1_sec":${f3(bMin)},"ratio":${f3(bMin / sMin)},"sf01_runs":[${s.runs.map(f3).mkString(",")}],"sf1_runs":[${b.runs.map(f3).mkString(",")}]$state}"""
    }.mkString("{", ",", "}")
    val recallJson = AnnVariants.map { n =>
      s""""$n":{"sf01":${f3(recallSmall(n))},"sf1":${f3(recallBig(n))},"sf10":${f3(recall100(n))}}"""
    }.mkString("{", ",", "}")
    val seedsJson = AnnVariants.map { n =>
      def arr(m: Map[String, Seq[Double]]): String =
        m(n).map(f3).mkString("[", ",", "]")
      s""""$n":{"seeds":[${seedList.mkString(",")}],""" +
        s""""sf1":${arr(seedsBig)},"sf1_min":${f3(seedsBig(n).min)},""" +
        s""""sf10":${arr(seeds100)},"sf10_min":${f3(seeds100(n).min)}}"""
    }.mkString("{", ",", "}")
    val slopeJson = SlopeQueries.map { nq =>
      val s01Sweep = small.find(_.name == nq).get.min
      val s10 = big.find(_.name == nq).get.min
      val (adj01Runs, sf3Runs) = slope30(nq)
      val s01 = adj01Runs.min // the 30×-adjacent re-timing (same phase)
      val s30 = sf3Runs.min
      s""""$nq":{"sf01_sec":${f3(s01)},"sf01_sweep_sec":${f3(s01Sweep)},""" +
        s""""sf1_sec":${f3(s10)},"sf3_sec":${f3(s30)},""" +
        s""""ratio10":${f3(s10 / s01Sweep)},"ratio30":${f3(s30 / s01)},""" +
        s""""sf01_adjacent_runs":[${adj01Runs.map(f3).mkString(",")}],""" +
        s""""sf3_runs":[${sf3Runs.map(f3).mkString(",")}]}"""
    }.mkString(s"""{"copies":$sf3Copies,""", ",", "}")
    // ONE artifact per JVM class (round-17 review): an ANN5M=1 (64g
    // build-heap) run writes its OWN file — its sweep timings are
    // heap-inflated and must never overwrite the canonical 8g-sweep
    // artifact — and an 8g run MERGES the 64g file's two_level_5m field
    // (heap-independent recall/fraction; the build-time field names its
    // own protocol) instead of silently dropping it. The documented
    // split-JVM protocol is now enforced by the code, not by operator
    // care.
    val artifactPath =
      if (ann5mOn) "/root/repo/SCALEBENCH_sf1_64g.json"
      else "/root/repo/SCALEBENCH_sf1.json"
    val fiveMJson = if (ann5mOn) runAnn5m(spark, src) else {
      // merge from a prior 64g run if one is committed. The field is a
      // FLAT object (scalar values and flat arrays only) by construction
      // of the [[runAnn5m]] emitter, so brace-matching is a substring
      // scan; the legacy "sec" name is normalized. Absent file or field
      // → no two_level_5m (honest).
      val p64 = java.nio.file.Paths.get("/root/repo/SCALEBENCH_sf1_64g.json")
      if (!java.nio.file.Files.exists(p64)) "" else {
        val s64 = java.nio.file.Files.readString(p64)
        val key = "\"two_level_5m\":{"
        val i = s64.indexOf(key)
        if (i < 0) "" else {
          val j = s64.indexOf('}', i)
          val body = s64.substring(i + key.length, j)
            .replace("\"sec\":", "\"build_plus_serve_sec\":")
          // r17 ADVICE: the splice assumes flatness — verify it instead
          // of silently emitting truncated JSON if the 64g emitter ever
          // grows a nested object (or a brace inside a string value).
          // On violation DEGRADE to the honest no-field path with a loud
          // stderr line rather than throwing (round-18 ADVICE): this
          // check runs BEFORE the 8g artifact write, and an abort here
          // would vaporize the ~1.5 h sweep it rides on — the sweep data
          // must land; the stale 64g field can be spliced later with
          // tools/merge_scalebench.py once repaired.
          if (body.contains("{") || body.contains("\\")) {
            System.err.println(
              "SCALEBENCH WARNING: SCALEBENCH_sf1_64g.json two_level_5m is " +
                "not the flat scalars-and-arrays object the splice contract " +
                "requires - emitting this artifact WITHOUT the field; repair " +
                "the 64g file and splice with tools/merge_scalebench.py")
            ""
          } else
          s""","two_level_5m":{$body,"jvm":"merged from SCALEBENCH_sf1_64g.json (its own 64g build-class JVM; this file's sweeps ran at the 8g serving heap - a 64g local JVM inflates allocation-heavy sweep queries 2-3x, see PLANS.md round-17)"}"""
        }
      }
    }
    val fracJson =
      s"""{"coarse_gate":{"sf01":${f3(ivfFracSmall)},"sf1":${f3(ivfFracBig)},"sf10":${f3(ivfFrac100)}},""" +
      s""""pq_rerank":{"sf01":${f3(pqRrFracSmall)},"sf1":${f3(pqRrFracBig)},"sf10":${f3(pqRrFrac100)}}}"""
    val srcJson = jsonEscape(src)
    val line =
      s"""{"metric":"scaleup_ratio","copies":$copies,"src":"$srcJson","recall_at_5":$recallJson,"recall_seeds":$seedsJson,"scanned_frac":$fracJson,"thirty_x":$slopeJson$fiveMJson,"queries":$perQuery}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(artifactPath),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    // gates AFTER the write (see requireServedFraction's doc): the
    // artifact keeps the divergent number, then the run turns red.
    // sf01 is exempt — its 2k-vector corpus is candidate-floor-governed
    // (~0.33 by design, "ANN on a tiny corpus should be near-exact").
    requireServedFraction("scanned_frac.coarse_gate sf1", ivfFracBig)
    requireServedFraction("scanned_frac.coarse_gate sf10", ivfFrac100)
    spark.stop()
  }

  /** The 5M-vector ANN measurement (round-17 ask #1; extended round 18
    * with the PQ route and a min-over-draws sweep) — the two-level
    * residual route on real data past the cap-bind point, through the
    * exact user-facing dispatches: `ivfTopK` and `pqTopK` both
    * auto-route their coarse gate two-level at 5M vectors. Env-gated
    * because the 65536-centroid level-1 KMeans costs ~85 min per draw
    * and wants a BUILD-class heap (64g), while timed sweeps must run at
    * the 8g SERVING heap (a 64g local[32] JVM inflates allocation-heavy
    * sweep queries 2-3x — measured, PLANS.md round-17); the split-JVM
    * protocol routes this run's output to SCALEBENCH_sf1_64g.json and
    * the 8g sweep artifact merges the field. recall / measured_scanned
    * are heap-independent.
    *
    * The artifact is REWRITTEN after every draw (a killed multi-hour
    * sweep keeps its completed draws), and carries commit + timestamp
    * provenance (r17 ADVICE: a later 8g merge of a stale 64g file is
    * now detectable). Extra quantizer draws via
    * SPARK_GRAFT_ANN5M_SEEDS="2,3" (r17 ask #3: the committed 5M point
    * was single-draw); index memos are cleared between draws so the JVM
    * holds one 5M index at a time. PQ is measured PER DRAW (round 19 —
    * the r18 verdict's "the shared-quantizer claim should hold per
    * seed"): the codebook itself is strided-init deterministic
    * (seed-free), so each draw's PQ window re-pays codebook train +
    * encode + attach + serve over that seed's coarse gate — budget it
    * on top of the ~85-min IVF build per extra seed.
    *
    * Returns the `,"two_level_5m":{...}` artifact fragment. The field
    * stays FLAT (scalars + flat arrays, no nested objects, no escaped
    * strings) — the 8g merge's splice contract. */
  private def runAnn5m(spark: SparkSession, src: String): String = {
    val emb5m = sys.env.getOrElse("SPARK_GRAFT_EMB5M_DIR", "/tmp/graft_emb5m")
    // mirrors Similarity.trainSeed's resolution order — the artifact must
    // record the draw actually measured, even if a calibration env/prop
    // was set at launch (round-18 review: a hardcoded 1 would lie then).
    // Resolved FIRST so the seed-list hygiene below can filter against it.
    val defaultSeed = sys.props.get("graft.ivf.seed")
      .orElse(sys.env.get("SPARK_GRAFT_IVF_SEED")).map(_.toLong).getOrElse(1L)
    // parse BEFORE the ~85-min default draw (round-18 review): a
    // malformed seed list must fail at t=0, not abort the sweep the
    // env var was set to run after the first build completes. Tokens
    // fail with a NAMED error, duplicates collapse, and a seed equal to
    // the default draw's is dropped rather than rebuilt and appended as
    // a duplicate array entry (round-18 ADVICE).
    val extraSeeds = sys.env.get("SPARK_GRAFT_ANN5M_SEEDS").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      .map { tok =>
        // anchored regex, not a character-set check: "1-2" or "-" would
        // pass a per-char filter and die as a bare NumberFormatException
        // (round-19 review) — the named failure is the point
        require(tok.matches("-?\\d+"),
          s"SPARK_GRAFT_ANN5M_SEEDS: token '$tok' is not a long seed")
        tok.toLong
      }.distinct.filterNot(_ == defaultSeed)
    validateStagedParams(emb5m, s"copies=2500;src=$src;tables=embeddings")
    if (!new java.io.File(s"$emb5m/embeddings.parquet/_SUCCESS").exists())
      stageEmbeddings(spark, src, emb5m, 2500)
    val n5 = spark.read.parquet(s"$emb5m/embeddings.parquet").count()
    // brute-force top-k is quantizer-seed-invariant: computed once,
    // shared by every draw below (the r17-review lesson)
    val brute5 = SparkEntry.queries("q_ann_brute")(spark, emb5m)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val denom5 = brute5.count().toDouble
    require(denom5 > 0, "two_level_5m: brute-force top-k is empty")
    def recallOf(name: String): Double = {
      val served = AnnServe(name)(spark, emb5m)
        .select("query_id", "neighbor_id")
      brute5.join(served, Seq("query_id", "neighbor_id")).count() / denom5
    }
    val commit = scala.util.Try(scala.sys.process.Process(
      Seq("git", "rev-parse", "--short", "HEAD"),
      new java.io.File("/root/repo")).!!.trim).getOrElse("unknown")
    val measuredAt = System.currentTimeMillis() / 1000L

    // PQ's exact-rerank fraction for a given coarse fraction — the
    // pqRerankFraction arithmetic over the two-level gate's pool.
    def pqRerankFracOf(frac: Double): Double = math.min(
      graft.operators.Similarity.autoRerank(5).toDouble,
      frac * (n5 - 1)) / (n5 - 1)

    // ONE draw measured end-to-end: the IVF window deliberately spans
    // the COLD memoized index build (the ~85 min l1=65536 fit) plus the
    // first serve (round-17 review: a bare "sec" beside recall read as
    // serve latency, off by two orders of magnitude). PQ rides the
    // SAME draw's memoized ivf2 coarse gate, so its window is the
    // marginal cost of a second index type sharing its quantizer
    // (codebook train + 5M encode + cell attach + ADC serve) — and it
    // is measured PER DRAW (round-18 verdict: the shared-quantizer
    // claim must hold per seed, not only on the default draw; the
    // codebook itself is strided-init deterministic, so per-draw
    // sensitivity enters through the gate).
    final case class Draw(seed: Long, rec: Double, frac: Double,
      sec: Double, pqRec: Double, pqSec: Double)
    def measureDraw(seed: Long): Draw = {
      val t0 = System.nanoTime()
      val rec = recallOf("q_ann_ivf")
      val sec = (System.nanoTime() - t0) / 1e9
      val frac = graft.operators.Similarity.ivf2ScannedFraction(spark, emb5m, 10)
      val tPq = System.nanoTime()
      val pqRec = recallOf("q_ann_pq")
      val pqSec = (System.nanoTime() - tPq) / 1e9
      Draw(seed, rec, frac, sec, pqRec, pqSec)
    }

    // SKIP-DEFAULT mode (round 19): extra draws cost ~85 min EACH, and a
    // fresh JVM would re-pay the default draw's build before the seeds
    // this run was launched for. The quantizer is deterministic per seed
    // on a fixed staged corpus — the r18 run REPRODUCED the r17 seed-1
    // point bit-for-bit from the surviving /tmp staging — so when the
    // committed artifact already holds a single-seed measurement of the
    // SAME default seed, SPARK_GRAFT_ANN5M_SKIP_DEFAULT=1 carries it
    // instead of rebuilding, and the artifact names the carried commit
    // (seed1_carried_from_commit). Refuses anything but the exact
    // singleton-seed shape — a multi-seed or foreign-seed artifact means
    // the operator should run a full draw, not splice.
    val skipDefault = sys.env.get("SPARK_GRAFT_ANN5M_SKIP_DEFAULT").contains("1")
    val srcJson = jsonEscape(src)
    val (defaultDraw, carriedFrom): (Draw, Option[String]) = if (!skipDefault) {
      (measureDraw(defaultSeed), None)
    } else {
      val p = java.nio.file.Paths.get("/root/repo/SCALEBENCH_sf1_64g.json")
      require(java.nio.file.Files.exists(p),
        "ANN5M_SKIP_DEFAULT=1 but no committed SCALEBENCH_sf1_64g.json to carry from")
      val c = parseCarriedSingleton(
        java.nio.file.Files.readString(p), defaultSeed, n5, srcJson)
      (Draw(c.seed, c.rec, c.frac, c.sec, c.pqRec, c.pqSec), Some(c.from))
    }

    var draws = Seq(defaultDraw)
    def emit(write: Boolean = true): String = {
      // headline scalars are the sweep's WORST draw (round-18 ADVICE: a
      // consumer reading recall_at_5 must never see better than the
      // min; fractions/rerank pair conservatively as the max), with the
      // per-seed arrays carrying the full detail. build_plus_serve_sec
      // stays the default draw's cold-build provenance window.
      val carried = carriedFrom.map(c =>
        s""""seed1_carried_from_commit":"$c",""").getOrElse("")
      val field =
        s""","two_level_5m":{"n":$n5,"recall_at_5":${f3(draws.map(_.rec).min)},""" +
          s""""measured_scanned":${f3(draws.map(_.frac).max)},"build_plus_serve_sec":${f3(defaultDraw.sec)},""" +
          s""""pq_recall_at_5":${f3(draws.map(_.pqRec).min)},"pq_measured_scanned":${f3(draws.map(_.frac).max)},""" +
          s""""pq_rerank_frac":${String.format(java.util.Locale.ROOT, "%.6f", Double.box(pqRerankFracOf(draws.map(_.frac).max)))},""" +
          s""""pq_marginal_sec":${f3(defaultDraw.pqSec)},""" +
          s""""seeds":[${draws.map(_.seed).mkString(",")}],""" +
          s""""recall_seeds":[${draws.map(d => f3(d.rec)).mkString(",")}],""" +
          s""""recall_seeds_min":${f3(draws.map(_.rec).min)},""" +
          s""""pq_recall_seeds":[${draws.map(d => f3(d.pqRec)).mkString(",")}],""" +
          s""""pq_recall_seeds_min":${f3(draws.map(_.pqRec).min)},""" +
          s""""pq_marginal_secs":[${draws.map(d => f3(d.pqSec)).mkString(",")}],""" +
          s""""scanned_seeds":[${draws.map(d => f3(d.frac)).mkString(",")}],""" +
          s""""build_plus_serve_secs":[${draws.map(d => f3(d.sec)).mkString(",")}],""" +
          carried +
          s""""commit":"$commit","measured_at_epoch_sec":$measuredAt}"""
      val line = s"""{"metric":"ann5m","src":"$srcJson"$field}"""
      if (write) {
        java.nio.file.Files.write(
          java.nio.file.Paths.get("/root/repo/SCALEBENCH_sf1_64g.json"),
          (line + "\n").getBytes("UTF-8"))
      }
      println(line)
      field
    }
    // skip-default defers the first artifact write until a REAL
    // measurement lands (round-20, r19 ADVICE): the first emit in that
    // mode holds purely carried numbers, and overwriting the committed
    // artifact with them under a new commit/timestamp before the
    // ~85-min seed build completes would leave a zero-new-data rewrite
    // behind if the build dies
    var fragment = emit(write = !skipDefault)
    // gate AFTER the draw's artifact write (see requireServedFraction's
    // doc): the divergent number persists, then the run turns red
    requireServedFraction("two_level_5m", defaultDraw.frac)
    for (s <- extraSeeds) {
      // one 5M index in the JVM at a time: drop the previous draw's
      // memoized frames before building the next (the brute frame is a
      // plain local localCheckpoint, unaffected)
      graft.operators.Similarity.clearIndexMemosForTest(spark)
      sys.props("graft.ivf.seed") = s.toString
      val d = try measureDraw(s) finally sys.props.remove("graft.ivf.seed")
      draws :+= d
      fragment = emit()
      requireServedFraction(s"two_level_5m seed $s", d.frac)
    }
    fragment
  }

  /** The promotion floor the 5M canary gates on — ABOVE the ≥0.92
    * sweep done-bar on purpose: the round-19 weak draw (seed 3, recall
    * 0.92) sat exactly at the done-bar with zero margin, which is
    * precisely the draw a deployment must not promote at the auto
    * geometry without remediation. */
  private[graft] val CanaryFloor = 0.95

  private def gitShortHead: String = scala.util.Try(scala.sys.process.Process(
    Seq("git", "rev-parse", "--short", "HEAD"),
    new java.io.File("/root/repo")).!!.trim).getOrElse("unknown")

  /** CANARY-AT-SCALE mode (round 20, the r19 verdict's ask #1):
    * `SPARK_GRAFT_ANN5M_CANARY=<seed>` with `ANN5M_ONLY=1` executes the
    * promotion gate the weak draw motivated AT the scale that motivated
    * it — [[graft.operators.Similarity.recallCanary]] (the productized
    * entry point, not the sweep's inline join) on ONE re-built draw of
    * the staged 5M corpus, then the
    * [[graft.operators.Similarity.canaryEscalate]] remediation ladder:
    * probe budget ×7/6 per rung through the shipped dispatch until
    * recall clears [[CanaryFloor]] or the measured fraction exits the
    * 0.105 budget (→ reject + re-draw, the documented promotion rule).
    *
    * The committed three-draw `two_level_5m` field is carried VERBATIM
    * (this mode extends the record, it does not re-measure it) under
    * the skip-default identity rules: top-level src AND n must match
    * the staged corpus. The artifact is rewritten after the canary
    * measurement and after every ladder rung (crash-keep), appending
    * flat `canary_*` fields only — the 8g merge's splice contract and
    * `tools/merge_scalebench.py` carry them unchanged. `canary_seeds`
    * holds the live value at the measured seed's position and the
    * committed `recall_seeds` values elsewhere, with the basis named in
    * the artifact itself: recallCanary IS the sweep's recall
    * computation (same brute, same dispatch, same join — spec-pinned),
    * so a non-measured seed's canary equals its committed recall by
    * construction. */
  private def runAnn5mCanary(spark: SparkSession, src: String): Unit = {
    val emb5m = sys.env.getOrElse("SPARK_GRAFT_EMB5M_DIR", "/tmp/graft_emb5m")
    val seedTok = sys.env("SPARK_GRAFT_ANN5M_CANARY").trim
    require(seedTok.matches("-?\\d+"),
      s"SPARK_GRAFT_ANN5M_CANARY: '$seedTok' is not a long seed")
    val seed = seedTok.toLong
    validateStagedParams(emb5m, s"copies=2500;src=$src;tables=embeddings")
    if (!new java.io.File(s"$emb5m/embeddings.parquet/_SUCCESS").exists())
      stageEmbeddings(spark, src, emb5m, 2500)
    val n5 = spark.read.parquet(s"$emb5m/embeddings.parquet").count()
    val srcJson = jsonEscape(src)
    val p = java.nio.file.Paths.get("/root/repo/SCALEBENCH_sf1_64g.json")
    require(java.nio.file.Files.exists(p),
      "ANN5M_CANARY: no committed SCALEBENCH_sf1_64g.json to extend")
    val whole = java.nio.file.Files.readString(p)
    // shape guard (round-21 ADVICE): emit() rewrites the artifact as
    // {metric,src,two_level_5m} only — on a legacy full-sweep-shaped 64g
    // artifact every other top-level field (recall_at_5, thirty_x,
    // queries) would be silently discarded on the first write. Refuse to
    // extend anything but an ann5m-shaped artifact.
    require(whole.startsWith("""{"metric":"ann5m""""),
      "ANN5M_CANARY: committed SCALEBENCH_sf1_64g.json is not ann5m-shaped " +
        "— rewriting it would discard its non-two_level_5m top-level " +
        "fields; convert or re-emit it as ann5m before extending")
    val priorSrc = topLevelSrc(whole)
    require(priorSrc == srcJson,
      s"ANN5M_CANARY: prior artifact src [$priorSrc] != this run's src " +
        s"[$srcJson] — the canary must gate the corpus the sweep measured")
    val field = extractTwoLevelField(whole)
    val bodyRaw = field.substring("\"two_level_5m\":{".length, field.length - 1)
    require(!bodyRaw.contains("{") && !bodyRaw.contains("\\"),
      "ANN5M_CANARY: prior two_level_5m is not the flat object the " +
        "splice contract requires — repair before extending")
    // idempotent re-run: strip a previously-appended canary block so a
    // second canary invocation replaces rather than double-appends
    val ci = bodyRaw.indexOf(",\"canary_floor\":")
    val body = if (ci >= 0) bodyRaw.substring(0, ci) else bodyRaw
    def num(key: String): Double = {
      val m = java.util.regex.Pattern
        .compile("\"" + key + "\":(-?[0-9.eE+-]+)").matcher(body)
      require(m.find(), s"ANN5M_CANARY: prior artifact lacks '$key'")
      m.group(1).toDouble
    }
    def numArr(key: String): Seq[Double] = {
      val m = java.util.regex.Pattern
        .compile("\"" + key + "\":\\[([^\\]]*)\\]").matcher(body)
      require(m.find(), s"ANN5M_CANARY: prior artifact lacks '$key'")
      m.group(1).split(",").map(_.trim.toDouble).toSeq
    }
    require(num("n").toLong == n5,
      s"ANN5M_CANARY: prior artifact n=${num("n").toLong} != staged corpus n=$n5")
    val priorSeeds = numArr("seeds").map(_.toLong)
    val recSeeds = numArr("recall_seeds")
    // si >= 0: re-gating a draw the sweep measured (the committed value
    // doubles as the determinism check). si < 0: the RE-DRAW flow — the
    // promotion rule's prescribed response to a rejected draw is a
    // FRESH quantizer seed, which by definition has no committed recall
    // yet; the gate itself is its first measurement (round 20: the
    // seed-3 ladder measured escalation futile, so re-draw is the one
    // live remediation and must be runnable end-to-end).
    val si = priorSeeds.indexOf(seed)
    if (si < 0)
      println(s"[graft] canary: seed $seed is a FRESH draw (sweep seeds " +
        s"[${priorSeeds.mkString(",")}]) — re-draw flow, no committed " +
        "recall to cross-check")
    val commit = gitShortHead
    val measuredAt = System.currentTimeMillis() / 1000L
    val bound = graft.operators.Similarity.ServedFractionBound
    println(s"[graft] canary: corpus=$emb5m n=$n5 seed=$seed floor=$CanaryFloor")
    sys.props("graft.ivf.seed") = seed.toString
    try {
      val t0 = System.nanoTime()
      val canary = graft.operators.Similarity.recallCanary(spark, emb5m, 5, 10)
      val canarySec = (System.nanoTime() - t0) / 1e9
      val committedNote = if (si >= 0)
        String.format(java.util.Locale.ROOT,
          " (committed recall_seeds[%d] = %.3f)", Int.box(si),
          Double.box(recSeeds(si)))
      else " (fresh draw - first measurement)"
      println(String.format(java.util.Locale.ROOT,
        "[graft] recallCanary(seed=%d) = %.3f in %.1f s%s", Long.box(seed),
        Double.box(canary), Double.box(canarySec), committedNote))
      var steps = Vector.empty[graft.operators.Similarity.CanaryStep]
      def emit(): Unit = {
        val promoted = steps.find(s =>
          s.recall >= CanaryFloor && s.fraction <= bound)
        // a re-gated sweep seed replaces its committed value with the
        // live one; a fresh re-draw seed leaves the sweep's record
        // untouched (its own numbers live in the canary_* fields)
        val canarySeeds = recSeeds.zipWithIndex
          .map { case (r, i) => if (i == si) canary else r }
        val promotedFields = promoted.map(pr =>
          s""""canary_promoted":true,"promoted_nprobe":${pr.nprobe},""" +
            s""""promoted_recall":${f3(pr.recall)},"promoted_fraction":${f3(pr.fraction)},""")
          .getOrElse(s""""canary_promoted":false,""")
        val line =
          s"""{"metric":"ann5m","src":"$srcJson","two_level_5m":{$body,""" +
            s""""canary_floor":${f3(CanaryFloor)},"canary_seed":$seed,""" +
            // "cold": the window spans the memoized index BUILD for this
            // draw plus the brute half plus the served join (the r17
            // lesson — a bare "sec" beside recall reads as serve latency)
            s""""canary_recall":${f3(canary)},"canary_gate_cold_sec":${f3(canarySec)},""" +
            s""""canary_steps_nprobe":[${steps.map(_.nprobe).mkString(",")}],""" +
            s""""canary_steps_recall":[${steps.map(s => f3(s.recall)).mkString(",")}],""" +
            s""""canary_steps_fraction":[${steps.map(s => f3(s.fraction)).mkString(",")}],""" +
            promotedFields +
            s""""canary_seeds":[${canarySeeds.map(f3).mkString(",")}],""" +
            (if (si >= 0)
              s""""canary_seeds_basis":"seed $seed re-measured live through recallCanary; other seeds carry their committed recall_seeds values - recallCanary computes the identical brute-and-served join through the identical dispatch the sweep measured (spec-pinned identity)","""
            else
              s""""canary_seeds_basis":"seed $seed is a FRESH re-draw gated live through recallCanary (its numbers are the canary_* fields); canary_seeds carries the committed sweep values unchanged",""") +
            s""""promotion_rule":"promote a trained quantizer iff recallCanary >= ${f3(CanaryFloor)} at a ladder rung whose measured scanned fraction <= ${f3(bound)}; a draw that cannot reach the floor inside the fraction budget is rejected and re-drawn",""" +
            s""""canary_commit":"$commit","canary_measured_at_epoch_sec":$measuredAt}}"""
        java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
        println(line)
      }
      // first write holds the canary itself — real measured data, the
      // deferred-write discipline the skip-default mode follows
      emit()
      graft.operators.Similarity.canaryEscalate(spark, emb5m, 5, 10,
        floor = CanaryFloor, maxSteps = 4,
        onStep = step => {
          steps :+= step
          println(String.format(java.util.Locale.ROOT,
            "[graft] canary rung: nprobe=%d recall=%.3f fraction=%.3f",
            Int.box(step.nprobe), Double.box(step.recall),
            Double.box(step.fraction)))
          emit()
        })
      if (steps.nonEmpty && math.abs(steps.head.recall - canary) > 1e-9)
        System.err.println(String.format(java.util.Locale.ROOT,
          "[graft] canary WARNING: ladder head recall %.3f != recallCanary " +
            "%.3f — the two share brute, dispatch and probes and must agree " +
            "on a deterministic build", Double.box(steps.head.recall),
          Double.box(canary)))
      val promoted = steps.find(s => s.recall >= CanaryFloor && s.fraction <= bound)
      promoted match {
        case Some(pr) =>
          println(String.format(java.util.Locale.ROOT,
            "[graft] canary: seed %d PROMOTED at nprobe=%d (recall %.3f, " +
              "fraction %.3f)", Long.box(seed), Int.box(pr.nprobe),
            Double.box(pr.recall), Double.box(pr.fraction)))
          // gate AFTER the write, as everywhere: the number persists,
          // then a divergence turns the run red
          requireServedFraction(s"canary_5m promoted seed $seed", pr.fraction)
        case None =>
          System.err.println(
            s"[graft] canary: seed $seed NOT promotable inside the fraction " +
              "budget — the promotion rule rejects this draw (re-draw the " +
              "quantizer); the artifact records the full ladder")
      }
    } finally sys.props.remove("graft.ivf.seed")
  }

  /** The scalars a skip-default splice carries for one prior draw. */
  private[graft] final case class CarriedDraw(
    seed: Long, rec: Double, frac: Double, sec: Double,
    pqRec: Double, pqSec: Double, from: String)

  /** First (top-level) `"src"` of an ann5m artifact line — the emitter
    * writes it immediately after `"metric"`, before any nested field,
    * so the first match IS the top-level one. JSON-escaped form, as
    * stored. */
  private[graft] def topLevelSrc(whole: String): String = {
    val m = java.util.regex.Pattern
      .compile("\"src\":\"([^\"]*)\"").matcher(whole)
    require(m.find(), "ann5m artifact lacks a top-level 'src' field")
    m.group(1)
  }

  /** The flat `two_level_5m` object substring (key + braces included) —
    * parse WITHIN this field only (round-19 review): a legacy
    * full-sweep-shaped artifact carries a recall_seeds object whose own
    * "seeds" array precedes the field, and a whole-file regex would
    * match that one. Flat by the emitter's splice contract, so the
    * first `}` closes it. */
  private[graft] def extractTwoLevelField(whole: String): String = {
    val fieldKey = "\"two_level_5m\":{"
    val fi = whole.indexOf(fieldKey)
    require(fi >= 0, "prior artifact lacks two_level_5m")
    whole.substring(fi, whole.indexOf('}', fi) + 1)
  }

  /** Parse-and-validate of the skip-default carry (round 19; extracted
    * round 20 so the refusal paths are spec-testable): accepts ONLY a
    * singleton measurement of `defaultSeed`, on the SAME staged corpus
    * — n must match AND the artifact's top-level src must equal this
    * run's (r19 ADVICE: n5 = base × copies, so any same-scale source
    * yields an identical n and size alone cannot prove corpus
    * identity). Number regex admits negative exponents (r19 ADVICE:
    * `1.2E-4` died on the old class). `srcJson` is the CURRENT run's
    * src in its JSON-escaped form. */
  private[graft] def parseCarriedSingleton(
      whole: String, defaultSeed: Long, n5: Long,
      srcJson: String): CarriedDraw = {
    val priorSrc = topLevelSrc(whole)
    require(priorSrc == srcJson,
      s"ANN5M_SKIP_DEFAULT: prior artifact src [$priorSrc] != this run's " +
        s"src [$srcJson] — a same-sized staging from a different source " +
        "corpus must be re-measured, not spliced")
    val s64 = extractTwoLevelField(whole)
    def num(key: String): Double = {
      val m = java.util.regex.Pattern
        .compile("\"" + key + "\":(-?[0-9.eE+-]+)").matcher(s64)
      require(m.find(), s"ANN5M_SKIP_DEFAULT: prior artifact lacks '$key'")
      m.group(1).toDouble
    }
    val mSeeds = java.util.regex.Pattern
      .compile("\"seeds\":\\[([^\\]]*)\\]").matcher(s64)
    require(mSeeds.find(), "ANN5M_SKIP_DEFAULT: prior artifact lacks 'seeds'")
    val priorSeeds = mSeeds.group(1).split(",").map(_.trim.toLong).toSeq
    require(priorSeeds == Seq(defaultSeed),
      s"ANN5M_SKIP_DEFAULT: prior artifact seeds [${priorSeeds.mkString(",")}] " +
        s"are not the singleton [$defaultSeed] — run a full draw instead of splicing")
    // a chained skip-default splice must keep pointing at the commit
    // where the seed was MEASURED, not at the previous splice (round-19
    // review): prefer an existing carried marker over the file's own
    // commit field
    def str(key: String): Option[String] = {
      val m = java.util.regex.Pattern
        .compile("\"" + key + "\":\"([^\"]*)\"").matcher(s64)
      if (m.find()) Some(m.group(1)) else None
    }
    val from = str("seed1_carried_from_commit")
      .orElse(str("commit")).getOrElse("unknown")
    require(num("n").toLong == n5,
      s"ANN5M_SKIP_DEFAULT: prior artifact n=${num("n").toLong} != staged corpus n=$n5")
    CarriedDraw(defaultSeed, num("recall_at_5"), num("measured_scanned"),
      num("build_plus_serve_sec"), num("pq_recall_at_5"),
      num("pq_marginal_sec"), from)
  }

  // Locale.ROOT like Bench.f3: a comma-decimal default locale would
  // corrupt the JSON artifact. ONE copy (round-18 review: main and
  // runAnn5m each had a private duplicate of this and of the escape —
  // an edit to one would silently fork the artifact format).
  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Minimal JSON string escape for interpolated paths — a quote or
    * backslash in an env-provided dir would corrupt the artifact line. */
  private def jsonEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private val AllTables = Set("documents", "embeddings", "events",
    "lineitem", "orders", "part", "customer", "supplier", "nation", "region")

  private def generate(spark: SparkSession, src: String, out: String,
      copies: Int, tables: Set[String] = AllTables): Unit = {
    val cp = spark.range(copies).select(col("id").as("copy"))
    def raw(name: String, schema: StructType): DataFrame =
      spark.read.schema(schema).parquet(s"$src/$name.parquet").crossJoin(cp)
    // skip tables already staged; a table counts as staged only when its
    // _SUCCESS marker exists — a run killed mid-write leaves a partial
    // parquet directory a bare-existence check would silently bench
    // against. Each block below is independent. `tables` narrows the set
    // for partial stagings (the 30× slope corpus needs only the three
    // tables its queries read).
    def missing(name: String): Boolean =
      tables(name) &&
        !new java.io.File(s"$out/$name.parquet/_SUCCESS").exists()

    if (missing("documents"))
    raw("documents", Tables.documents)
      .withColumn("doc_id", col("doc_id") + col("copy") * Stride)
      .withColumn("text", array_join(
        transform(split(col("text"), " "),
          t => concat(lit("c"), col("copy").cast("string"), lit("_"), t)), " "))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("copy")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // Copies get a per-copy SIGN-FLIP rotation (a diagonal orthogonal
    // transform): intra-copy geometry — norms, cosines, cluster structure
    // — is preserved EXACTLY, while cross-copy cosines scatter like
    // random projections (|cos| ~ 1/√dim ≪ the 0.4 near-dup threshold),
    // so the near-dup pair graph is ~10× the original's rather than the
    // ~100× degenerate blow-up verbatim copies would create (every
    // vector 10× duplicated ⇒ quadratic cross-copy pair volume). Copy 0
    // keeps identity signs, so the original corpus is a literal subset.
    if (missing("embeddings")) stageEmbeddings(spark, src, out, copies)

    if (missing("events"))
    raw("events", Tables.events)
      .withColumn("event_id", col("event_id") + col("copy") * Stride)
      .withColumn("user_id", col("user_id") + col("copy") * Stride)
      .drop("copy")
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    if (missing("lineitem"))
    raw("lineitem", Tables.lineitem)
      .withColumn("l_orderkey", col("l_orderkey") + col("copy") * Stride)
      .withColumn("l_partkey", col("l_partkey") + col("copy") * Stride)
      .withColumn("l_suppkey", col("l_suppkey") + col("copy") * Stride)
      .drop("copy")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // orders + part ride the same key offsets so the order→lineitem and
    // part→lineitem joins stay intact per copy: 10 disjoint join graphs
    // (k-core bipartite graphs, baskets), while brand NAMES repeat across
    // copies — basket pair counts and order totals both scale 10×, so
    // lift is copy-invariant and the pair query measures 10× the work.
    if (missing("orders"))
    raw("orders", Tables.orders)
      .withColumn("o_orderkey", col("o_orderkey") + col("copy") * Stride)
      .withColumn("o_custkey", col("o_custkey") + col("copy") * Stride)
      .drop("copy")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    if (missing("part"))
    raw("part", Tables.part)
      .withColumn("p_partkey", col("p_partkey") + col("copy") * Stride)
      .drop("copy")
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    // customer/supplier ride the custkey/suppkey offsets (modularity's
    // trade graph: 10 disjoint copies) but keep their nationkeys, so the
    // nation partition — and Q_c — is copy-invariant while the edge
    // counts scale 10×. nation itself is a dim, copied verbatim.
    if (missing("customer"))
    raw("customer", Tables.customer)
      .withColumn("c_custkey", col("c_custkey") + col("copy") * Stride)
      .drop("copy")
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    if (missing("supplier"))
    raw("supplier", Tables.supplier)
      .withColumn("s_suppkey", col("s_suppkey") + col("copy") * Stride)
      .drop("copy")
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    if (missing("nation"))
    spark.read.schema(Tables.nation).parquet(s"$src/nation.parquet")
      .write.mode("overwrite").parquet(s"$out/nation.parquet")

    if (missing("region"))
    spark.read.schema(Tables.region).parquet(s"$src/region.parquet")
      .write.mode("overwrite").parquet(s"$out/region.parquet")
  }

  /** The embeddings staging on its own — shared by [[generate]] (10×,
    * all tables) and the ANN-only 100× third scale point ([[main]] /
    * [[graft.AnnStage]]): ids offset by copy × [[Stride]], per-copy
    * sign-flip rotation (copy 0 = identity, so the original corpus is a
    * literal subset and the probe set is unchanged). Sign-vector length
    * derives from the DATA, not a hardcoded dim — a 64-literal array
    * would silently null-pad zip_with if the generator ever changed the
    * embedding width. */
  private[graft] def stageEmbeddings(
      spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    val cp = spark.range(copies).select(col("id").as("copy"))
    val dim = spark.read.schema(Tables.embeddings)
      .parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding")).as("d")).head().getInt(0)
    val signRows = (0 until copies).map { c =>
      val r = new scala.util.Random(c * 7919L + 13)
      val signs = Array.fill(dim)(if (c == 0 || r.nextBoolean()) 1.0f else -1.0f)
      (c.toLong, signs.toSeq)
    }
    val signsDf = spark.createDataFrame(signRows).toDF("copy", "signs")
    spark.read.schema(Tables.embeddings).parquet(s"$src/embeddings.parquet")
      .crossJoin(cp)
      .join(broadcast(signsDf), "copy")
      .withColumn("vec_id", col("vec_id") + col("copy") * Stride)
      .withColumn("embedding",
        zip_with(col("embedding"), col("signs"), (x, s) => (x * s).cast("float")))
      .drop("copy", "signs")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }
}
