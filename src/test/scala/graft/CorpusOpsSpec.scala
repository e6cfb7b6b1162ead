package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Invariants for the round-8 corpus-preparation operators (scrubbing,
  * redaction, chunking, bigram LM, BM25, token budget, dedup
  * representatives, embedding stats) beyond their DuckDB oracles. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("scrubBlocklist removes every blocklisted token, preserves token count") {
    val out = TextAnalysis.scrubBlocklist(spark, sf).cache()
    val leaked = out.filter(
      expr("exists(split(scrubbed, ' '), t -> t IN ('customer', 'user', 'key'))"))
    assert(leaked.count() === 0)
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_orig"))
    val mismatched = out
      .withColumn("n_scrubbed", size(split(col("scrubbed"), " ")))
      .join(docs, "doc_id")
      .filter(col("n_scrubbed") =!= col("n_orig"))
    assert(mismatched.count() === 0)
    assert(out.agg(sum("n_masked")).as[Long].head() > 0, "blocklist never fired")
    out.unpersist()
  }

  test("decontaminateBloom output is identical to the broadcast-exact variant") {
    // bloom false positives only admit candidates the exact join then
    // removes — a divergence here means the prefilter dropped a TRUE match
    val exact = TextAnalysis.decontaminate(spark, sf)
      .orderBy("doc_id").collect()
    val bloom = TextAnalysis.decontaminateBloom(spark, sf)
      .orderBy("doc_id").collect()
    assert(exact.length > 0, "decontamination never fired on sf0.001")
    assert(bloom.toSeq === exact.toSeq)
  }

  test("normalization merges every noisy copy back onto its clean twin") {
    val out = TextAnalysis.normalizeDedup(spark, sf).cache()
    // a raw-identical pair is also norm-identical, so group sizes can
    // only grow under normalization
    assert(out.filter(col("n_norm_dups") < col("n_raw_dups")).count() === 0)
    assert(out.agg(sum("changed")).as[Long].head() > 0,
      "normalization never changed any document")
    // the injected noisy copy must land in its clean twin's norm group
    assert(out.filter(col("n_norm_dups") < 2).count() === 0,
      "a noisy copy failed to rejoin its twin")
    out.unpersist()
  }

  test("calibrated quality z-scores center on zero per language") {
    val out = TextAnalysis.qualityCalibrated(spark, sf).cache()
    val mz = out.groupBy("lang").agg(avg("z").as("mz")).collect()
    mz.foreach(r => assert(math.abs(r.getDouble(1)) < 0.01,
      s"lang ${r.getString(0)} mean z = ${r.getDouble(1)}"))
    // a one-sigma floor keeps the bulk of every distribution
    assert(out.filter(col("keep") === 1).count() > out.count() / 2)
    out.unpersist()
  }

  test("lmNovelty rates are valid fractions and hits never exceed totals") {
    val out = TextAnalysis.lmNovelty(spark, sf).cache()
    assert(out.filter(col("n_known") > col("n_bigrams")).count() === 0)
    assert(out.filter(col("known_rate") < 0 || col("known_rate") > 1).count() === 0)
    // the synthetic corpus repeats template bigrams heavily: the LM must
    // actually recognize some text (non-degenerate fixture)
    assert(out.agg(sum("n_known")).as[Long].head() > 0, "LM never fired")
    out.unpersist()
  }

  test("bpeMergeCandidates emits 2-char pairs in strict (count, pair) rank order") {
    val rows = TextAnalysis.bpeMergeCandidates(spark, sf)
      .orderBy("rank").collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getString(1).length === 2))
    val ranked = rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    ranked.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
        s"rank order violated: $a then $b")
    }
  }

  test("redactNumbers leaves no digits and counts each masked run") {
    val out = TextAnalysis.redactNumbers(spark, sf).cache()
    assert(out.filter(col("redacted").rlike("[0-9]")).count() === 0)
    // masked-marker count equals the per-row redaction count
    val bad = out.filter(
      expr("size(regexp_extract_all(redacted, '<NUM>', 0))") =!= col("n_redacted"))
    assert(bad.count() === 0)
    assert(out.agg(sum("n_redacted")).as[Long].head() > 0)
    out.unpersist()
  }

  test("chunkDocuments covers every token: chunk 0 at 0, last chunk ends at n-1, counts match formula") {
    val chunks = TextAnalysis.chunkDocuments(spark, sf).cache()
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    val per = chunks.groupBy("doc_id").agg(
      min("chunk_id").as("first_chunk"),
      max(col("start_tok") + col("n_chunk_toks")).as("max_end"),
      count(lit(1)).as("n_chunks")).join(docs, "doc_id").cache()
    assert(per.filter(col("first_chunk") =!= 0).count() === 0)
    assert(per.filter(col("max_end") =!= col("n_toks")).count() === 0)
    val badCount = per.filter(col("n_chunks") =!=
      expr("CASE WHEN n_toks <= 32 THEN 1 ELSE CAST(ceil((n_toks - 32) / 24.0) AS INT) + 1 END"))
    assert(badCount.count() === 0)
    // every chunk is non-empty and at most `window` wide
    assert(chunks.filter(col("n_chunk_toks") < 1 || col("n_chunk_toks") > 32).count() === 0)
    per.unpersist(); chunks.unpersist()
  }

  test("bigramLm: ranks are 1..topK and top-3 mass per prefix is a valid sub-distribution") {
    val lm = TextAnalysis.bigramLm(spark, sf, minCount = 10).cache()
    assert(lm.filter(col("rnk") < 1 || col("rnk") > 3).count() === 0)
    assert(lm.filter(col("prob") <= 0 || col("prob") > 1).count() === 0)
    val massBad = lm.groupBy("w1").agg(sum("prob").as("mass"))
      .filter(col("mass") > 1.000001)
    assert(massBad.count() === 0)
    // rank 1 within each w1 has the max count
    val r1 = lm.filter(col("rnk") === 1).select(col("w1"), col("n").as("n1"))
    assert(lm.join(r1, "w1").filter(col("n") > col("n1")).count() === 0)
    lm.unpersist()
  }

  test("bm25Rank scores exactly the docs containing a query term, all positive") {
    val out = TextAnalysis.bm25Rank(spark, sf).cache()
    val expected = Tables.load(spark, sf, "documents")
      .filter(expr("exists(split(text, ' '), x -> x IN ('spark', 'merge', 'window'))"))
      .count()
    assert(out.count() === expected)
    assert(out.filter(col("score") <= 0).count() === 0)
    out.unpersist()
  }

  test("tokenBudget keeps a (band, doc_id)-prefix that fills but never exceeds the budget") {
    val out = TextAnalysis.tokenBudget(spark, sf).cache()
    val base = TextAnalysis.qualityScore(spark, sf)
      .select(col("doc_id"), col("n_toks").as("n_tok"),
        floor((lit(1.0) - col("quality")) * 20).cast("int").as("band"))
    val budget = base.agg(floor(sum("n_tok") * 0.5)).as[Long].head()
    val total = out.agg(sum("n_tok")).as[Long].head()
    assert(total <= budget, s"kept $total > budget $budget")
    // prefix property: every dropped doc sorts after every kept doc in
    // (band, doc_id) order, and the first dropped doc would overflow.
    val dropped = base.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxKept = out.orderBy(col("band").desc, col("doc_id").desc)
      .select("band", "doc_id").as[(Int, Long)].head()
    val minDropped = dropped.orderBy(col("band").asc, col("doc_id").asc)
      .select("band", "doc_id").as[(Int, Long)].head()
    assert(minDropped._1 > maxKept._1 ||
      (minDropped._1 == maxKept._1 && minDropped._2 > maxKept._2))
    val firstDroppedTok = dropped.orderBy(col("band").asc, col("doc_id").asc)
      .select("n_tok").as[Int].head()
    assert(total + firstDroppedTok > budget, "budget not filled greedily")
    out.unpersist()
  }

  test("dedupRepresentative picks the max-quality (min doc_id) member of every component") {
    val reps = Dedup.dedupRepresentative(spark, sf).cache()
    val comp = Dedup.dedupComponents(spark, sf)
    val q = TextAnalysis.qualityScore(spark, sf).select("doc_id", "quality")
    val members = comp.join(q, "doc_id").cache()
    // component count and membership totals line up
    assert(reps.count() === members.select("component_id").distinct().count())
    assert(reps.agg(sum("n_members")).as[Long].head() === members.count())
    // no member strictly beats its representative
    val beaten = members.join(
        reps.select(col("component_id"), col("rep_doc"), col("rep_quality")),
        "component_id")
      .filter(col("quality") > col("rep_quality") ||
        (col("quality") === col("rep_quality") && col("doc_id") < col("rep_doc")))
    assert(beaten.count() === 0)
    members.unpersist(); reps.unpersist()
  }

  test("duplicatedSpans: exact-duplicate docs score dup_frac 1, bounds hold") {
    val spans = Dedup.duplicatedSpans(spark, sf).cache()
    assert(spans.filter(col("n_dup") > col("n_windows")).count() === 0)
    assert(spans.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() === 0)
    // every doc whose full text appears verbatim elsewhere must have
    // every window duplicated
    val docs = Tables.load(spark, sf, "documents")
    val dupTexts = docs.groupBy("text").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("text")
    val dupIds = docs.join(dupTexts, "text").select("doc_id")
    val notFull = spans.join(dupIds, "doc_id").filter(col("dup_frac") =!= 1.0)
    assert(notFull.count() === 0, "verbatim-duplicated doc with dup_frac < 1")
    assert(spans.count() === docs.filter(size(split(col("text"), " ")) >= 8).count())
    spans.unpersist()
  }

  test("hardNegatives: one row per probe, labels always differ, cos bounded by brute top-1") {
    val hn = Similarity.hardNegatives(spark, sf).cache()
    val e = Tables.load(spark, sf, "embeddings")
    val nProbes = e.filter(col("vec_id") < 50).count()
    assert(hn.count() === nProbes) // 10 labels × 50 probes → negatives always exist
    assert(hn.filter(col("true_label") === col("nbr_label")).count() === 0)
    // the hardest negative can never beat the unconstrained nearest
    // neighbor from the same candidate pool
    // (probes whose global top-1 is another probe drop out of the inner
    // join — the bound only applies where the pools coincide)
    val brute = Similarity.bruteTopK(spark, sf, k = 1, nProbes = 50)
      .filter(col("neighbor_id") >= 50)
      .select(col("query_id"), col("cos").as("best_cos"))
    val violations = hn.join(brute, "query_id")
      .filter(col("cos") > col("best_cos") + 1e-9)
    assert(violations.count() === 0)
    hn.unpersist()
  }

  test("locfFill carries the last non-null value forward, never backward") {
    val out = operators.Breadth.locfFill(spark, sf).cache()
    // filled value equals observed value wherever one is present
    assert(out.filter(col("v").isNotNull && col("v_filled") =!= col("v")).count() === 0)
    // rows before a user's first observation (in (ts, event_id) order)
    // stay null; at or after it, never null
    val withTs = out.join(
      Tables.load(spark, sf, "events").select("event_id", "ts"), "event_id")
    val firstObs = withTs.filter(col("v").isNotNull)
      .groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"))).as("f"))
    val joined = withTs.join(firstObs, Seq("user_id"), "left")
    assert(joined.filter(struct(col("ts"), col("event_id")) >= col("f") &&
      col("v_filled").isNull).count() === 0)
    assert(joined.filter(struct(col("ts"), col("event_id")) < col("f") &&
      col("v_filled").isNotNull).count() === 0)
    assert(out.filter(col("v_filled").isNull).count() > 0, "no leading gaps exercised")
    out.unpersist()
  }

  test("quality model reproduces the rule-based gate with >= 0.95 agreement") {
    val scored = ml.QualityModel.trainScore(spark, sf).cache()
    val n = scored.count()
    val agree = scored.agg(sum("correct")).as[Long].head()
    assert(n > 0)
    assert(agree.toDouble / n >= 0.95, s"agreement ${agree.toDouble / n}")
    // both classes must actually occur, or the fit is degenerate
    assert(scored.select("label").distinct().count() === 2)
    scored.unpersist()
  }

  test("embeddingStats: per-label counts total the corpus and min <= avg <= max") {
    val st = Similarity.embeddingStats(spark, sf).cache()
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(st.agg(sum("n_vecs")).as[Long].head() === n)
    assert(st.filter(col("min_norm") > col("avg_norm") ||
      col("avg_norm") > col("max_norm")).count() === 0)
    assert(st.filter(col("min_norm") <= 0).count() === 0, "degenerate zero-norm label")
    st.unpersist()
  }

  test("trainSplit is deterministic, total, and near the 90/5/5 design") {
    val s1 = TextAnalysis.trainSplit(spark, sf).cache()
    val n = Tables.load(spark, sf, "documents").count()
    assert(s1.count() === n, "every doc must receive a split")
    val bySplit = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    val trainFrac = bySplit("train").toDouble / n
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"train fraction $trainFrac")
    // content-independent determinism: a rerun assigns identically
    val s2 = TextAnalysis.trainSplit(spark, sf)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    s1.unpersist()
  }

  test("oovRate bounds and zero-OOV on in-vocabulary docs") {
    val o = TextAnalysis.oovRate(spark, sf).cache()
    assert(o.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() === 0)
    assert(o.filter(col("n_oov") > col("n_tokens")).count() === 0)
    // with topK=20 of a 31-token vocabulary a real OOV tail must exist
    assert(o.agg(sum("n_oov")).as[Long].head() > 0, "OOV cut never fired")
    o.unpersist()
  }

  test("mixture weights lift small sources and shares sum to 1") {
    val m = TextAnalysis.mixtureWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
    val totalDocs = m.map(_._2).sum.toDouble
    assert(math.abs(m.map(_._3).sum - 1.0) < 1e-4, s"shares must sum to ~1: $m")
    // temperature flattening: every below-average source gains share,
    // every above-average source loses share vs proportional sampling
    m.foreach { case (src, n, share) =>
      val prop = n / totalDocs
      if (prop < 1.0 / m.size) assert(share > prop, s"$src not lifted")
      if (prop > 1.0 / m.size) assert(share < prop, s"$src not damped")
    }
  }

  test("int8 quantization error is small relative to vector norms") {
    val e = graft.operators.Similarity.quantizationError(spark, sf).cache()
    assert(e.filter(col("q_err") < 0).count() === 0)
    val avgErr = e.agg(avg("q_err")).as[Double].head()
    val avgNorm = graft.operators.Similarity.embeddingStats(spark, sf)
      .agg(avg("avg_norm")).as[Double].head()
    // 8-bit midpoint dequantization: per-dim error <= step/2, so the
    // relative L2 error must sit far below the signal
    assert(avgErr > 0, "quantization reported zero error — fold inert")
    assert(avgErr < avgNorm * 0.05,
      s"avg q_err $avgErr vs avg norm $avgNorm — int8 unsafe?")
    e.unpersist()
  }

  test("frequentTokens output is partition-independent and exactly freq*k > N") {
    import org.apache.spark.sql.functions._
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val out = asMap(graft.operators.TextAnalysis.frequentTokens(spark, sf))
    assert(out.nonEmpty, "no heavy hitters at k=200 — threshold inert")
    // ground truth from the definition: plain groupBy + threshold, no
    // sketch involved (pins the MG pigeonhole superset guarantee)
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("token")).cache()
    val n = toks.count()
    val truth = toks.groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 200 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.unpersist()
    assert(out.keySet === truth.keySet,
      s"missing=${truth.keySet -- out.keySet} extra=${out.keySet -- truth.keySet}")
    out.foreach { case (t, (f, _)) => assert(f === truth(t), s"$t count $f") }
  }

  test("sort-free length deciles equal the naive global-sort NTILE") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val fast = graft.operators.TextAnalysis.lengthDeciles(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    val naive = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      .withColumn("decile", ntile(10).over(Window.orderBy(col("n_tok"), col("doc_id"))))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), min("n_tok").as("min_len"),
        max("n_tok").as("max_len"), min("doc_id").as("first_doc"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(fast.keySet === (1 to 10).toSet, s"deciles = ${fast.keySet}")
    assert(fast === naive)
  }

  test("fuzzyCanonical is a total idempotent mapping onto cluster minima") {
    val m = Dedup.fuzzyCanonical(spark, sf).cache()
    val names = Tables.load(spark, sf, "part").select("p_name").distinct()
    assert(m.count() === names.count(), "mapping must cover the vocabulary")
    // canonical is the lexicographic cluster minimum: never above the name
    assert(m.filter(col("canonical") > col("p_name")).count() === 0)
    // idempotent: canonicals map to themselves
    val canon = m.select(col("canonical").as("p_name")).distinct()
    val fixed = m.join(canon, "p_name").filter(col("canonical") =!= col("p_name"))
    assert(fixed.count() === 0, "a canonical name must be its own canonical")
    m.unpersist()
  }

  test("source entropy: bounded by ln(n_distinct), replays for one source") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.sourceEntropy(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, n, d, h) =>
      assert(h >= 0 && h <= math.log(d.toDouble) + 1e-9,
        s"$s: H=$h outside [0, ln($d)]")
      assert(n >= d, s"$s: fewer tokens than distinct tokens")
    }
    // driver replay with the operator's own rounding discipline
    val (src, nTok, _, got) = rows.minBy(_._1)
    val counts = Tables.load(spark, sf, "documents")
      .filter(col("source") === src)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val sum = counts.map { c =>
      val p = c.toDouble / nTok
      BigDecimal(-p * math.log(p)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val expect = BigDecimal(sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got - expect) <= 1e-9, s"$src: $got vs $expect")
  }
}
