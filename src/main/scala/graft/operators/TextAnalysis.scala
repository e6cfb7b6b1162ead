package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — the pre-training corpus
  * toolkit (north-star extension): token statistics, quality scoring,
  * n-gram-profile language ID, and content fingerprinting.
  *
  * Everything is per-document map-side work — no shuffle at all until an
  * (optional) aggregation, so the operators scale linearly and stay inside
  * whole-stage codegen (pure `functions._`/`expr` — no UDFs).
  */
object TextAnalysis {

  /** Token counting: whitespace tokens + a subword-ish alpha-run count
    * (the BPE-style proxy: alpha runs + digits + punctuation marks each
    * count as one token). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).as("n_alpha_runs"),
        regexp_count(col("text"), lit("[0-9]")).as("n_digits"),
        regexp_count(col("text"), lit("[^a-z0-9 ]")).as("n_other"),
        length(col("text")).as("len_chars"))

  private val Stopwords = Seq(
    "the", "a", "of", "and", "in", "to", "is",
    "der", "und", "le", "la", "el", "de", "et", "un")

  /** Quality scoring: length, punctuation and stopword signals combined
    * into a deterministic [0,1] score (arithmetic identical in the DuckDB
    * oracle — same op order). The stopword list rides as a typed array
    * Column (`typedlit`), not SQL-string interpolation — same discipline
    * as [[scrubBlocklist]]/[[bm25Rank]]. */
  /** Corpus-pass intermediates shared across declared queries (round 21;
    * the [[graft.operators.Dedup.docShinglesShared]] charter): the
    * quality frame feeds q_text_quality, the curation chain (×2 queries),
    * q_quality_calibrated and q_dedup_rep; the langId frame feeds
    * q_text_langid and the curation chain; the (doc, term, tf) frame
    * feeds q_tfidf_terms, q_tfidf_features' relational sibling and
    * q_hybrid_search. Each is built once per (session, dir); checkpoint
    * blocks are owned by the memoized frames. */
  private val qualityMemo = new graft.SessionMemo[DataFrame]()
  private val langIdMemo = new graft.SessionMemo[DataFrame]()
  private val termFreqMemo = new graft.SessionMemo[DataFrame]()

  /** The raw (doc_id, term, tf) term-frequency table — the tokenize-once
    * step every TF-IDF-family consumer re-derived inline before round 21. */
  private[graft] def docTermFreqShared(spark: SparkSession, dir: String): DataFrame =
    termFreqMemo.getOrCompute(spark, dir) {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
    }

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityMemo.getOrCompute(spark, dir) {
      qualityScoreUncached(spark, dir).localCheckpoint(true)
    }

  private def qualityScoreUncached(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = typedlit(Stopwords)
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_stop",
        size(filter(col("toks"), t => array_contains(stopArr, t))))
      .withColumn("n_punct", regexp_count(col("text"), lit("[^a-z0-9 ]")))
      .select(
        col("doc_id"),
        col("n_toks"),
        col("n_stop"),
        (col("n_punct").cast("double") / length(col("text"))).as("punct_ratio"),
        (col("n_stop").cast("double") / col("n_toks")).as("stop_ratio"),
        round(
          least(lit(1.0), col("n_toks").cast("double") / 100) * 0.5
            + (lit(1.0) - least(lit(1.0), col("n_punct").cast("double") / length(col("text")) * 10)) * 0.2
            + least(lit(1.0), col("n_stop").cast("double") / col("n_toks") * 5) * 0.3,
          6).as("quality"))
  }

  /** PER-LANGUAGE QUALITY CALIBRATION — standardize the quality score
    * against each language's own distribution (z-score) and keep docs
    * at most one sigma BELOW their language mean (the cut is one-sided:
    * a doc scoring far above its language's mean is high quality, not
    * an outlier to drop): the per-language-threshold cut a multilingual
    * curation pass needs, because one absolute quality bar over-filters
    * the languages the heuristic scores low.
    *
    * Float discipline for an exact oracle: per-language moments are
    * EXACT decimal sums (quality is a 6-dp value → DECIMAL(18,6) and its
    * square → 12-dp decimal, both sum exactly), converted to double once
    * — so mean/sigma are bit-identical across engines and partitionings;
    * the z arithmetic then mirrors the oracle expression op-for-op
    * (`GREATEST(var, 0)` guards the zero-variance sqrt). Scale shape:
    * one language-keyed rollup (a handful of rows) broadcast back over
    * the corpus — no window, no second corpus shuffle. */
  def qualityCalibrated(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val q = qualityScore(spark, dir).select("doc_id", "quality")
      .join(Tables.load(spark, dir, "documents").select("doc_id", "lang"), "doc_id")
      .withColumn("q_dec", col("quality").cast(DecimalType(18, 6)))
    val stats = q.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum("q_dec").as("s"),
        sum(col("q_dec") * col("q_dec")).as("ss"))
      .select(col("lang"),
        (col("s").cast("double") / col("n")).as("mu"),
        sqrt(greatest(
          col("ss").cast("double") / col("n") -
            (col("s").cast("double") / col("n")) * (col("s").cast("double") / col("n")),
          lit(0.0))).as("sigma"))
    val z = when(col("sigma") > 0,
      (col("quality") - col("mu")) / col("sigma")).otherwise(0.0)
    q.join(broadcast(stats), "lang")
      .select(col("doc_id"), col("lang"), col("quality"),
        round(z, 6).as("z"),
        (z >= -1.0).cast("int").as("keep"))
  }

  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "les", "et", "des", "une", "dans"),
    "es" -> Seq("el", "los", "y", "las", "por", "como"))

  /** N-gram-heuristic language ID: integer stopword-profile hit counts per
    * language, argmax with fixed priority (en > de > fr > es), `und` when
    * no profile matches. Integer-only → bit-exact oracle. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdMemo.getOrCompute(spark, dir) {
      langIdUncached(spark, dir).localCheckpoint(true)
    }

  private def langIdUncached(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
    val withCounts = LangProfiles.foldLeft(base) { case (df, (lang, words)) =>
      val arr = typedlit(words)
      df.withColumn(s"n_$lang",
        size(filter(col("toks"), t => array_contains(arr, t))))
    }
    withCounts.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      col("n_en"), col("n_de"), col("n_fr"), col("n_es"),
      when(col("n_en") >= col("n_de") && col("n_en") >= col("n_fr") &&
          col("n_en") >= col("n_es") && col("n_en") > 0, "en")
        .when(col("n_de") >= col("n_fr") && col("n_de") >= col("n_es") &&
          col("n_de") > 0, "de")
        .when(col("n_fr") >= col("n_es") && col("n_fr") > 0, "fr")
        .when(col("n_es") > 0, "es")
        .otherwise("und").as("pred_lang"))
  }

  /** End-to-end corpus CURATION — the composed filter chain a
    * training-data pipeline runs before tokenization, every stage one of
    * this engine's oracle-checked operators:
    *   1. exact dedup: keep the min doc_id per identical text;
    *   2. quality gate: [[qualityScore]] ≥ 0.5;
    *   3. language gate: [[langId]] ≠ "und";
    *   4. near-dup gate: drop any doc with a STRICT near-duplicate of
    *      smaller id (pairwise keep-first at Jaccard ≥ 0.5 — the simple
    *      deterministic rule; transitive-closure clustering is
    *      [[Dedup.dedupComponents]]'s job).
    * All four run as one declarative plan — Catalyst sees the whole
    * chain, so column pruning and the semi/anti joins compose instead of
    * materializing intermediate corpora (the reason curation belongs IN
    * the engine rather than as four scripted passes over storage). */
  private val curateMemo = new graft.SessionMemo[DataFrame]()

  /** Memoized per (session, dir): the curated corpus is THE pipeline
    * product every downstream consumer reads — the per-source provenance
    * rollup ([[curationBySource]]) must profile the same materialized
    * keep-set the curation query emitted, not re-run the four-gate chain
    * (the [[graft.operators.Dedup.dedupComponents]] precedent: a declared
    * query whose result is itself the shared pipeline intermediate). */
  def curateCorpus(spark: SparkSession, dir: String): DataFrame =
    curateMemo.getOrCompute(spark, dir) {
      curateCorpusUncached(spark, dir).localCheckpoint(true)
    }

  private def curateCorpusUncached(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // Dedup.exact's fingerprint shape, not groupBy(text): grouping on the
    // full text column shuffles the whole corpus payload as the key —
    // the exact hazard Dedup.exact exists to avoid (its shuffle carries
    // (hash, id) pairs, never text)
    val exactKeep = Dedup.exact(spark, dir)
      .select(col("keep_id").as("doc_id"))
    val nearLosers = Dedup.ngramJaccardPairsPrefix(spark, dir, 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    docs.select("doc_id")
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(qualityScore(spark, dir).select("doc_id", "quality"), "doc_id")
      .filter(col("quality") >= 0.5)
      .join(langId(spark, dir).select("doc_id", "pred_lang"), "doc_id")
      .filter(col("pred_lang") =!= "und")
      .join(nearLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("pred_lang"), col("quality"))
  }

  /** Provenance rollup over [[curateCorpus]] — the per-source cut every
    * corpus pipeline reports: how many documents each source contributed,
    * how many survived curation, and the kept-rate. One broadcast-sized
    * left join (kept set is a projection of the curated frame) followed
    * by a keyed aggregation on `source` — the whole curation chain stays
    * one declarative plan below it. kept_rate is an exact integer ratio
    * and min/max pick already-rounded quality values, so every output
    * column is bit-stable across engines. */
  def curationBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "source")
    val kept = curateCorpus(spark, dir).select("doc_id", "quality")
    docs.join(kept, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("quality")).as("n_kept"),
        (count(lit(1)) - count(col("quality"))).as("n_dropped"),
        (count(col("quality")).cast("double") / count(lit(1))).as("kept_rate"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
  }

  /** Relational TF-IDF — top-`topN` characteristic terms per document,
    * computed as three declarative aggregations (term frequency per doc,
    * document frequency per term, corpus size) joined back together:
    * tfidf = tf · (ln((N+1)/(df+1)) + 1), the smoothed sklearn-style
    * formulation. The 1-row corpus count broadcasts; the df join keys on
    * `term` and is left to AQE (a raw-text vocabulary can outgrow the
    * broadcast threshold at corpus scale — forcing a broadcast here would
    * be the 100 TB mistake); the big shuffles key on (doc_id, term) —
    * linear in corpus token count.
    * Fully SQL-expressible → DuckDB oracle (ln + round(6) per the float
    * discipline). */
  def tfidfTerms(spark: SparkSession, dir: String, topN: Int = 5): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tf = docTermFreqShared(spark, dir)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfc"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf_raw").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf_raw",
        col("tf") * (log((col("n_docs") + lit(1.0)) / (col("dfc") + lit(1.0))) + lit(1.0)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("doc_id"), col("term"), col("tf").cast("int").as("tf"),
        col("dfc").cast("int").as("doc_freq"), col("rnk"),
        round(col("tfidf_raw"), 6).as("tfidf"))
  }

  /** MLlib TF-IDF FEATURIZATION — the canonical "featurize corpus"
    * pipeline stage (SURVEY §7.3): Tokenizer → StopWordsRemover (this
    * engine's stopword list) → HashingTF(2^10) → IDF, emitting per-doc
    * scalar summaries of the tf-idf vector (nnz, l2 norm, argmax bucket)
    * rather than the raw vector so the result is row-comparable.
    *
    * Scale posture: HashingTF is stateless map-side work; IDF's fit is one
    * treeAggregate over the corpus producing a 1024-dim broadcastable
    * model — nothing here holds state proportional to the corpus. Not
    * SQL-expressible (hash bucketing) → rows-only + TfidfSpec invariants
    * cross-checking against [[tfidfTerms]]'s relational formulation. */
  def tfidfFeatures(spark: SparkSession, dir: String, numFeatures: Int = 1024): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, IDF, StopWordsRemover, Tokenizer}
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val tok = new Tokenizer().setInputCol("text").setOutputCol("raw_tokens")
    val stop = new StopWordsRemover().setStopWords(Stopwords.toArray)
      .setInputCol("raw_tokens").setOutputCol("tokens")
    val htf = new HashingTF().setNumFeatures(numFeatures)
      .setInputCol("tokens").setOutputCol("tf_vec")
    val tfDf = htf.transform(stop.transform(tok.transform(docs)))
    val idf = new IDF().setInputCol("tf_vec").setOutputCol("tfidf_vec").fit(tfDf)
    import org.apache.spark.ml.functions.vector_to_array
    idf.transform(tfDf)
      .withColumn("arr", vector_to_array(col("tfidf_vec")))
      .select(
        col("doc_id"),
        size(col("tokens")).as("n_tokens"),
        expr("size(filter(arr, x -> x > 0))").as("nnz"),
        round(sqrt(expr(
          "aggregate(arr, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)")), 6).as("l2_norm"),
        expr("array_position(arr, array_max(arr)) - 1").cast("int").as("argmax_bucket"))
  }

  /** L2-NORMALIZED TF-IDF VECTORS, relationally assembled — the FULL
    * per-document feature vector the top-5 [[tfidfTerms]] view only
    * samples, emitted as its unnested sparse representation
    * (doc_id, term, weight) with Σ weight² = 1 per doc. This is the
    * exact-arithmetic sibling of the MLlib [[tfidfFeatures]] pipeline
    * (which hashes terms into buckets and is therefore only
    * spec-checkable): every number here is DuckDB-replicable, so the
    * whole featurization is oracle-checked end to end.
    *
    * Float discipline: tf·idf products are fixed-shape doubles (the
    * [[tfidfTerms]] precedent); the per-doc norm sums raw² rounded
    * 12 dp as DECIMAL(28,12) (exact, order-independent), is narrowed
    * to 6 dp IN THE DECIMAL DOMAIN before the double cast (a
    * DECIMAL(28,12) unscaled value can exceed 2⁵³, where the
    * decimal→double cast rounds differently per engine — PLANS.md
    * float-boundary lesson #1), and the final ratio goes through
    * floor(x·1e6 + 0.5)/1e6 half-up rounding (lesson #3: ROUND(double)
    * midpoint divergence). Scale shape: one corpus-sized (doc, term)
    * aggregate, one vocabulary-sized doc-frequency re-aggregate with a
    * broadcast 1-row total, one doc-keyed norm re-aggregate — two
    * data-sized shuffles (term join, doc join), no windows, no driver
    * state. */
  def tfidfVectors(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.load(spark, dir, "documents")
    val tf = docTermFreqShared(spark, dir)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfc"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("raw",
        col("tf") * (log((col("n_docs") + lit(1.0)) / (col("dfc") + lit(1.0))) + lit(1.0)))
    val norms = scored
      .select(col("doc_id"),
        round(col("raw") * col("raw"), 12).cast(DecimalType(28, 12)).as("r2"))
      .groupBy("doc_id").agg(sum("r2").as("s2"))
    scored.join(norms, "doc_id")
      .withColumn("nrm", sqrt(round(col("s2"), 6).cast("double")))
      .select(col("doc_id"), col("term"),
        (floor(col("raw") / col("nrm") * lit(1e6) + lit(0.5)) / lit(1e6)).as("weight"))
  }

  /** Content fingerprinting (fully oracle-checked):
    *   - `kr_fp`: Karp–Rabin polynomial rolling hash of the token stream;
    *   - `winnow`: winnowing sketch — min-hash of each 5-wide window over
    *     token-4-gram rolling hashes (MOSS-style), as a distinct set.
    * Both are order-sensitive (unlike the MinHash SET signature). Token
    * hashes are the classic base-31 character polynomial mod 2^31-1 —
    * pure integer arithmetic, so the whole pipeline (hashes, 4-grams,
    * winnow windows, digest) is bit-replicable in the DuckDB oracle,
    * unlike an engine-specific xxhash64 basis. All intermediates stay
    * under 2^52, so no step overflows a long in either engine. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("th",
        expr("transform(toks, t -> aggregate(split(t, ''), CAST(0 AS BIGINT), (a, c) -> pmod(a * 31 + ascii(c), 2147483647L)))"))
      .withColumn("kr_fp",
        expr("aggregate(th, CAST(0 AS BIGINT), (acc, h) -> pmod(acc * 1000003L + h, 2147483647L))"))
      .withColumn("grams4",
        expr("CASE WHEN size(th) >= 4 THEN transform(sequence(0, size(th) - 4), i -> pmod(((th[i] * 31 + th[i+1]) * 31 + th[i+2]) * 31 + th[i+3], 2147483647L)) ELSE array(CAST(0 AS BIGINT)) END"))
      .withColumn("winnow",
        expr("CASE WHEN size(grams4) >= 5 THEN array_distinct(transform(sequence(0, size(grams4) - 5), i -> array_min(slice(grams4, i + 1, 5)))) ELSE array(array_min(grams4)) END"))
      .select(col("doc_id"), col("kr_fp"), size(col("winnow")).as("sketch_size"),
        // scalar digests of the winnowed sketch (array columns break
        // downstream row-compare tooling; set membership is spec-tested)
        array_min(col("winnow")).as("winnow_min"),
        array_max(col("winnow")).as("winnow_max"),
        expr("aggregate(winnow, CAST(0 AS BIGINT), (acc, h) -> pmod(acc + h, 9007199254740881L))")
          .as("winnow_digest"))

  /** TRAINING-MIX WEIGHTS (temperature sampling): the standard
    * multi-source data-mixing computation — per-source weight
    * ∝ count^α (α = 0.5 dampens head sources, boosts tail ones; α = 1 is
    * proportional, α = 0 is uniform), normalized, plus the resulting
    * per-100k-document allocation. One tiny aggregate over per-source
    * counts; the normalizing total is a 1-row cross join, never a
    * collect. The per-source sqrt rounds to 6-dp DECIMAL BEFORE the
    * normalizing sum (the [[mixtureWeights]] discipline: a raw double
    * sum of irrational sqrts is accumulation-order dependent, so the
    * 6-dp ratios could flip at a rounding boundary between runs or
    * engines); only the final ratio is floating-point. Allocations
    * FLOOR to integers (floor is midpoint-free, unlike round). */
  def sourceMixing(spark: SparkSession, dir: String): DataFrame =
    temperatureWeights(spark, dir)
      .select(col("source"), col("n_docs"),
        round(col("w").cast("double") / col("w_total").cast("double"), 6).as("mix_weight"),
        floor(col("w").cast("double") / col("w_total").cast("double") * 100000)
          .cast("long").as("docs_per_100k"))

  /** ONE copy of the α=0.5 temperature-weight frame (per-source count,
    * 6-dp-decimal √n weight, broadcast 1-row total) shared by
    * [[mixtureWeights]] and [[sourceMixing]] — the two previously
    * maintained the identical float-discipline pipeline independently,
    * so a rounding fix to one could silently diverge the other. */
  private def temperatureWeights(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = Tables.load(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs").cast("double")), 6)
        .cast(DecimalType(18, 6)))
    val total = counts.agg(sum("w").as("w_total"))
    counts.crossJoin(broadcast(total))
  }

  /** Gopher-style REPETITION signals — the quality cut that catches
    * boilerplate and degenerate generations: per-doc duplicate-token
    * fraction and most-frequent-bigram mass. Everything up to the
    * per-doc bigram top-1 is map-side array work inside codegen; the only
    * shuffle keys on (doc_id, bigram) and is linear in corpus token
    * count. Output values are integer ratios — bit-exact cross-engine. */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val base = t.select(col("doc_id"), size(col("t")).as("n_tokens"),
      size(array_distinct(col("t"))).as("n_distinct"))
    val bg = t.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
        .as("bigram"))
    val bgc = bg.groupBy("doc_id", "bigram").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("n").desc, col("bigram").asc)
    val top = bgc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    // LEFT join: a document under 2 tokens has no bigram, and an inner
    // join silently removed it from the profile — a curation stage keyed
    // on this operator saw the doc as missing rather than scored (its
    // bigram columns are honestly NULL)
    base.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
          .as("dup_token_frac"),
        col("bigram").as("top_bigram"), col("n").as("top_bigram_n"),
        (col("n").cast("double") / (col("n_tokens") - 1)).as("top_bigram_frac"))
  }

  /** DECONTAMINATION — flag training documents sharing any 3-gram shingle
    * with the eval set (stood in by one `source` partition, the
    * provenance cut a real pipeline would hold out). Shingles are the
    * same 64-bit-hashed distinct sets the dedup suite uses (count over
    * hashes == count over strings up to ~1e-10 collision odds), so the
    * DuckDB oracle's string shingles produce identical counts.
    *
    * Scale shape: the join keys on the shingle value; the eval side is a
    * distinct shingle set orders of magnitude smaller than the corpus —
    * AQE broadcasts it, and at 100 TB the same frame feeds a bloom filter
    * on the train side so non-overlapping docs die in the scan. */
  def decontaminate(spark: SparkSession, dir: String,
      evalSource: String = "src0"): DataFrame =
    decontaminateCore(spark, dir, evalSource, trainPrefilter = None)

  /** The shared eval-set/train-side/contamination core of
    * [[decontaminate]] and [[decontaminateBloom]] — one copy of the
    * evalSh distinct rule, the contamination formula and the output
    * columns, so the two variants (pinned frame-EQUAL by CorpusOpsSpec)
    * cannot drift; the bloom variant differs ONLY by the map-side
    * train prefilter it passes in. The corpus shingles ride the
    * session-memoized [[Dedup.docShinglesShared]] frame joined to the
    * skinny source column (the dedupIncremental pattern) — re-shingling
    * the corpus per call paid a redundant materialization on every
    * repeat run. */
  private def decontaminateCore(
      spark: SparkSession, dir: String, evalSource: String,
      trainPrefilter: Option[DataFrame => DataFrame]): DataFrame = {
    val sh = Dedup.docShinglesShared(spark, dir)
      .join(Tables.load(spark, dir, "documents").select("doc_id", "source"),
        "doc_id")
    val evalSh = sh.filter(col("source") === evalSource)
      .select(explode(col("sh")).as("s")).distinct()
    val trainRaw = sh.filter(col("source") =!= evalSource)
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("s"))
    val train = trainPrefilter.fold(trainRaw)(f => f(trainRaw))
    train.join(evalSh, "s")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_shared")) // per-doc shingles are distinct
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        (col("n_shared").cast("double") / col("n_shingles")).as("contamination"))
  }

  /** DECONTAMINATION, BLOOM-PREFILTERED — the 100 TB variant the
    * [[decontaminate]] scale notes promise: instead of shuffling every
    * exploded train shingle into the join, build a bounded bloom sketch
    * over the eval shingle set (one aggregate job; ~1.2 MB at the
    * default 1M-item sizing) and kill non-matching train shingles
    * MAP-SIDE with a codegen'd `might_contain` probe before the exact
    * join. Bloom false positives only admit extra candidates — the
    * exact join against the eval set removes them — so the output is
    * IDENTICAL to [[decontaminate]] (same oracle;
    * CorpusOpsSpec pins frame equality).
    *
    * The sketch is collected to the driver once and embedded as a
    * binary literal — the same bounded-state shape as Spark's own
    * InjectRuntimeFilter (which materializes the build side in a scalar
    * subquery) and the repo's PQ codebook: O(sketch), never O(data).
    * At 100 TB the probe prunes the fact-side shuffle down to the
    * contaminated ~% instead of every (doc, shingle) pair. */
  def decontaminateBloom(spark: SparkSession, dir: String,
      evalSource: String = "src0"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    // bloom sketch over the eval shingle set, collected once (O(sketch))
    val evalSh = Dedup.docShinglesShared(spark, dir)
      .join(Tables.load(spark, dir, "documents").select("doc_id", "source"),
        "doc_id")
      .filter(col("source") === evalSource)
      .select(explode(col("sh")).as("s")).distinct()
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(col("s")))
        .toAggregateExpression())
    val bloomBytes = evalSh.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), ColumnBridge.expression(col("s"))))
    decontaminateCore(spark, dir, evalSource,
      trainPrefilter = Some(_.filter(mightContain)))
  }

  /** MIXING-TEMPERATURE SOURCE REWEIGHTING — the T5/multilingual-style
    * α = 0.5 rebalance: a source's sampling weight is √n_s rather than
    * n_s, lifting small sources and damping the head so no domain
    * dominates the mixture. Emits per source the raw count, the
    * temperature weight, and the resulting mixture share — the table a
    * sampling stage consumes as its rates.
    *
    * Float discipline for the exact oracle: √n rounds to a 6-dp DECIMAL
    * before the total (exact decimal sum, order-independent), and the
    * share is one decimal→double division mirrored op-for-op — so the
    * handful of output rows hash-match despite double arithmetic.
    * Scale: sources are few; everything after the one count rollup is
    * constant-size. */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame =
    temperatureWeights(spark, dir)
      .select(col("source"), col("n_docs"),
        col("w").cast("double").as("weight"),
        round(col("w").cast("double") / col("w_total").cast("double"), 6).as("share"))

  /** DETERMINISTIC TRAIN/VAL/TEST SPLIT — the reproducible assignment a
    * training pipeline needs: each document hashes to a uniform [0,1)
    * coordinate (first 60 bits of md5 over the id — content-independent,
    * so re-crawls keep their split) and the 0.9/0.95 thresholds cut
    * train/val/test. Pure map-side arithmetic: no shuffle, no state, no
    * seed to desync across reruns — the property that matters when the
    * split must be IDENTICAL between the tokenization run and an
    * evaluation run months later. The md5-prefix fold is the same
    * DuckDB-replicable basis the SimHash pipeline uses, and h/2⁶⁰ is an
    * IEEE double division of exactly-represented operands in both
    * engines → bit-identical labels → full oracle. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame = {
    val u = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
      .cast("double") / lit(math.pow(2, 60))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        when(u < 0.9, "train").when(u < 0.95, "val").otherwise("test").as("split"))
  }

  /** VOCABULARY COVERAGE / OOV RATE — per-document fraction of token
    * OCCURRENCES outside the corpus's `topK` most frequent tokens (count
    * desc, token asc tiebreak): the classic "is this doc written in the
    * corpus's working vocabulary" quality signal, and the measurement a
    * tokenizer-budget decision reads. Two shuffles, both skinny: the
    * vocabulary rollup (token → count, vocabulary-scale) whose top-K is
    * a `TakeOrderedAndProject` (per-partition heaps, K-row merge — never
    * a global sort), and the per-doc aggregation of (doc_id, flag)
    * pairs; the vocabulary itself broadcasts to the membership join.
    * Integer counts → exact oracle. (The test corpus has 31 distinct
    * tokens, so the default `topK = 20` leaves a real OOV tail.) */
  def oovRate(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok").asc).limit(topK)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** BLOCKLIST SCRUBBING — mask every token on a blocklist (the PII /
    * unwanted-term scrub a corpus pipeline runs before tokenization),
    * emitting the masked text and a per-doc mask count. Pure map-side
    * higher-order-function work (`filter`/`transform`/`array_join`) —
    * codegen'd, no shuffle, linear in corpus size; the blocklist is a
    * compile-time array literal here and would broadcast as a set at a
    * realistic list size.
    *
    * NOTE: the `q_scrub_blocklist` DuckDB oracle is generated for the
    * DEFAULT `blocklist` — oracle parity holds only at the defaults; a
    * non-default call still computes correctly but is not what the
    * oracle replays. */
  def scrubBlocklist(spark: SparkSession, dir: String,
      blocklist: Seq[String] = Seq("customer", "user", "key")): DataFrame = {
    // typed array literal, not string interpolation into expr() — a
    // blocklist entry containing a quote must stay a value, never SQL text
    val blockArr = array(blocklist.map(lit): _*)
    val isBlocked = (t: Column) => array_contains(blockArr, t)
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(org.apache.spark.sql.functions.filter(col("toks"), isBlocked))
          .as("n_masked"),
        array_join(transform(col("toks"),
            t => when(isBlocked(t), lit("<MASKED>")).otherwise(t)), " ")
          .as("scrubbed"))
  }

  /** REGEX REDACTION — mask digit runs in the semi-structured `props`
    * payload (the numeric-identifier scrub of a PII pass; emails/phones
    * are the same `regexp_replace` shape with a different pattern).
    * Map-side regex work on every row — no shuffle, and the pattern
    * compiles once per task, not per row. */
  def redactNumbers(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(
        col("event_id"),
        regexp_count(col("props"), lit("[0-9]+")).as("n_redacted"),
        regexp_replace(col("props"), "[0-9]+", "<NUM>").as("redacted"))

  /** DOCUMENT CHUNKING with overlap — split each document into
    * fixed-size token windows (`window` tokens, `stride` step, so
    * consecutive chunks overlap by `window - stride`), the
    * context-window preparation step ahead of tokenization. A doc of n
    * tokens yields 1 chunk when n ≤ window, else ceil((n-window)/stride)+1,
    * so the final chunk always reaches the last token. All map-side
    * array arithmetic (`sequence` → `explode` → `slice`) — the explode
    * multiplies rows ~n/stride× but shuffles nothing. */
  def chunkDocuments(spark: SparkSession, dir: String,
      window: Int = 32, stride: Int = 24): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_chunks",
        expr(s"CASE WHEN n_toks <= $window THEN 1 ELSE CAST(ceil((n_toks - $window) / CAST($stride AS DOUBLE)) AS INT) + 1 END"))
      .withColumn("chunk_id", explode(expr("sequence(0, n_chunks - 1)")))
      .select(
        col("doc_id"),
        col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        expr(s"size(slice(toks, chunk_id * $stride + 1, $window))").as("n_chunk_toks"),
        expr(s"array_join(slice(toks, chunk_id * $stride + 1, $window), ' ')").as("chunk_text"))

  /** Count-based BIGRAM LANGUAGE MODEL — corpus-wide conditional
    * continuation probabilities P(w2|w1), keeping the top-`topK`
    * continuations of every prefix token with at least `minCount`
    * occurrences AS A BIGRAM PREFIX — `w1_total` sums bigram counts, so
    * a word's document-final occurrences don't count toward the floor
    * (the classic n-gram LM estimation pass, and the profile a
    * decontamination or synthetic-text detector reads).
    * One (w1, w2)-keyed count with map-side partials, a prefix-total
    * window partitioned by w1 (vocabulary-wide parallelism — no global
    * window), integer ratios rounded at 6 dp. */
  def bigramLm(spark: SparkSession, dir: String,
      minCount: Int = 50, topK: Int = 3): DataFrame = {
    val bg = Tables.load(spark, dir, "documents")
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(
        expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val counts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    val rnk = org.apache.spark.sql.expressions.Window
      .partitionBy("w1").orderBy(col("n").desc, col("w2").asc)
    counts
      .withColumn("w1_total", sum("n").over(w))
      .withColumn("rnk", row_number().over(rnk))
      .filter(col("rnk") <= topK && col("w1_total") >= minCount)
      .select(col("w1"), col("w2"), col("n"), col("w1_total"), col("rnk"),
        round(col("n").cast("double") / col("w1_total"), 6).as("prob"))
  }

  /** PMI COLLOCATIONS — pointwise mutual information for adjacent token
    * pairs: PMI(a,b) = ln( (n_ab/B) / ((n_a/N)(n_b/N)) ) over bigram
    * count n_ab (B bigrams total) and unigram counts n_a, n_b (N tokens
    * total) — the classic collocation detector ("new york" scores high,
    * "of the" scores low). All counts are exact integers; the one
    * log-of-ratio happens per output row on identical operands, rounded
    * at 6 dp.
    *
    * Scale shape: one bigram count and one unigram count over the corpus
    * (both with map-side partial aggregation); the unigram frame is
    * vocabulary-sized and broadcasts onto the bigram counts; totals are
    * 1-row broadcasts. The `minCount` cut bounds the output and kills
    * the hapax tail before the joins. */
  def pmiCollocations(spark: SparkSession, dir: String,
      minCount: Long = 20L): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(split(col("text"), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds N and both margin joins: one corpus scan
    val nTok = uni.select(sum("n").as("n_tokens"))
    val bg = toks.filter(size(col("t")) >= 2)
      .select(explode(
        expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(true) // feeds B and the output: one corpus scan
    val nBg = bg.select(sum("n_ab").as("n_bigrams"))
    // the unigram margins join WITHOUT a broadcast hint: uni is the full
    // token vocabulary, which outgrows the broadcast limit at corpus
    // scale — forcing it is the 100 TB mistake the tfidfTerms docstring
    // names; AQE picks broadcast when it measures small. Only the 1-row
    // totals are hinted.
    bg.filter(col("n_ab") >= minCount)
      .join(uni.select(col("w").as("w1"), col("n").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), "w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBg))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        round(log((col("n_ab").cast("double") / col("n_bigrams")) /
          ((col("n_a").cast("double") / col("n_tokens")) *
           (col("n_b").cast("double") / col("n_tokens")))), 6).as("pmi"))
  }

  /** DETERMINISTIC WEIGHTED SAMPLE — k docs per language drawn with
    * probability proportional to a quality weight, via the A-ES
    * exponential-key trick: key(d) = −ln(u_d)/w_d with u_d a uniform
    * deviate DERIVED FROM THE DOC ID by integer hashing (Knuth
    * multiplicative, the same generator as [[Scale.hashSample]]'s) —
    * no RNG state, so the draw is reproducible on any cluster, any
    * partitioning, any engine, and the DuckDB oracle replays it exactly.
    * Weight = ln(1 + n_chars): longer docs proportionally likelier, the
    * standard size-weighted corpus draw.
    *
    * One window per language ordered by the key — WindowGroupLimit
    * pushes the rank cut into each partition, so only k rows per
    * language survive to the driver-facing stage. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("key"), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        // id reduced mod a prime BEFORE the Knuth multiply so the
        // product never overflows a long (ANSI-safe at any id range).
        // TWO rounds — residue and quotient mod the same prime — summed
        // mod 2^32: a single round gave ids 1048573 apart the SAME
        // deviate, so related doc pairs drew perfectly correlated keys
        // past ~1M docs per language (the quotient term is 0 for
        // doc_id < 1048573, keeping small-corpus draws unchanged).
        // Each product ≤ 1048572·2654435761 ≈ 2.8e15 — no overflow.
        expr("((((doc_id % 1048573) * 2654435761) % 4294967296" +
          " + (((doc_id div 1048573) % 1048573) * 2654435761) % 4294967296)" +
          " % 4294967296) + 1").as("h"))
      .withColumn("key",
        -log(col("h").cast("double") / lit(4294967297.0)) /
          log(lit(1.0) + col("n_chars")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("doc_id"),
        round(col("key"), 6).as("key"))
  }

  /** PER-SOURCE TOKEN ENTROPY — Shannon entropy of each source's token
    * distribution (the diversity signal behind "is this source boilerplate
    * or varied?"): H = Σ_w −p_w·ln(p_w), p_w = n_w/N.
    *
    * Determinism discipline: a double Σ over the vocabulary would be
    * accumulation-order dependent, so each term is computed from exact
    * integer counts, ROUNDED at 12 dp, and cast to DECIMAL(28,12) — the
    * decimal sum is then exact and order-independent (the same
    * round-then-decimal-sum pattern as [[qualityCalibrated]]'s moments).
    * Scale shape: one (source, token) count with map-side combine, one
    * source-sized total broadcast back, one decimal rollup. */
  def sourceEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("source").agg(sum("n").as("n_tokens"))
    counts.join(broadcast(totals), "source")
      .select(col("source"), col("n_tokens"),
        round(-(col("n").cast("double") / col("n_tokens")) *
          log(col("n").cast("double") / col("n_tokens")), 12)
          .cast(DecimalType(28, 12)).as("term"))
      .groupBy("source")
      .agg(max("n_tokens").as("n_tokens"), count(lit(1)).as("n_distinct"),
        round(sum("term").cast("double"), 6).as("entropy"))
  }

  /** NORMALIZATION + DUP DELTA — the canonicalization pass that runs
    * before exact dedup: lowercase, strip non-alphanumerics, collapse
    * spaces; then per document, the exact-duplicate group size under the
    * RAW text vs under the NORMALIZED text. `n_norm_dups > n_raw_dups`
    * rows are the duplicates that case/punctuation noise was hiding —
    * the reason every production dedup normalizes first.
    *
    * The fixture corpus is pre-canonicalized (all lowercase alphanumeric
    * + single spaces), so the dirty side of the ingest is injected
    * deterministically: every document also arrives as an uppercased,
    * punctuation-suffixed copy at doc_id + 10⁷ — the case/punct noise a
    * real crawl carries. Normalization must map each noisy copy back
    * onto its clean twin's group (n_norm_dups ≥ 2 for every row) while
    * the raw fingerprints keep them apart.
    *
    * Scale shape: both group counts shuffle md5 fingerprints (16 bytes),
    * never text — the same never-shuffle-the-payload discipline as exact
    * dedup; the normalization itself is map-side regex work. md5 keeps
    * the fingerprints oracle-replicable. */
  def normalizeDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val noisy = base.select((col("doc_id") + 10000000L).as("doc_id"),
      concat(upper(col("text")), lit(" !!")).as("text"))
    val d = base.unionAll(noisy)
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .withColumn("raw_fp", md5(col("text")))
      .withColumn("norm_fp", md5(col("norm")))
    val wRaw = org.apache.spark.sql.expressions.Window.partitionBy("raw_fp")
    val wNorm = org.apache.spark.sql.expressions.Window.partitionBy("norm_fp")
    d.select(col("doc_id"),
      (col("text") =!= col("norm")).cast("int").as("changed"),
      count(lit(1)).over(wRaw).as("n_raw_dups"),
      count(lit(1)).over(wNorm).as("n_norm_dups"))
  }

  /** LM NOVELTY SCORING — per-document fraction of adjacent bigrams that
    * are "known" to the corpus bigram LM (≥ `minCount` corpus
    * occurrences): the CCNet-style LM-filtering cut that separates
    * in-distribution text (high known-rate) from noise, boilerplate
    * mutations, and synthetic junk (low known-rate), without carrying
    * float log-probabilities — hit fractions are integer ratios, so the
    * whole query is bit-exact cross-engine.
    *
    * Scale shape: the known-bigram table is vocabulary-scale after the
    * `minCount` cut — orders of magnitude smaller than the corpus — so
    * AQE broadcasts it under the doc-side explode join; per-doc totals
    * are map-side arithmetic. One linear explode, one bounded join, one
    * keyed agg. */
  def lmNovelty(spark: SparkSession, dir: String, minCount: Int = 50): DataFrame = {
    val t = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
    val bg = t.select(col("doc_id"), explode(
      expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
      .as("bigram"))
    val known = bg.groupBy("bigram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select("bigram")
    val hits = bg.join(known, Seq("bigram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_known"))
    t.select(col("doc_id"), (size(col("t")) - 1).as("n_bigrams"))
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_known"))
      .select(col("doc_id"), col("n_bigrams"), col("n_known"),
        (col("n_known").cast("double") / col("n_bigrams")).as("known_rate"))
  }

  /** BPE MERGE CANDIDATES — the first step of byte-pair-encoding
    * tokenizer training at corpus scale: corpus-weighted counts of
    * adjacent character pairs inside tokens, ranked; the top pair is the
    * merge a BPE trainer would apply next. (Iterating this map-reduce
    * step IS BPE training — each round re-counts over the merged
    * vocabulary.)
    *
    * Scale shape: pair counting runs over the VOCABULARY (token,
    * frequency) table, not the corpus — the token groupBy collapses
    * 100 TB of text to vocabulary scale first with map-side combine, and
    * the per-token character explode is linear in vocabulary size. The
    * final top-N is a bounded sort. Integer counts, deterministic
    * (count DESC, pair ASC) tie-break — bit-exact oracle. */
  def bpeMergeCandidates(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val pairs = vocab.filter(length(col("tok")) >= 2)
      .select(col("freq"), explode(
        expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))
    // rank window runs over topN rows only (bounded single reducer)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("pair").asc)
    pairs.orderBy(col("n").desc, col("pair").asc).limit(topN)
      .withColumn("rank", row_number().over(w))
      .select("rank", "pair", "n")
  }

  /** BM25 RANKING — the full-text relevance score for a fixed query
    * term set (k1 = 1.2, b = 0.75, the Robertson/Sparck-Jones idf with
    * +1 smoothing), emitting every document matching ≥1 term.
    *
    * Scale shape: per-term tf is a map-side `size(filter(...))` per doc
    * (NO token explode — the query is small, so counting per term beats
    * inverting the corpus); N, avgdl and every per-term df come out of
    * ONE 1-row aggregate that broadcasts back over the corpus; the score
    * is then pure map-side arithmetic. Zero data-sized shuffles.
    *
    * NOTE: the `q_bm25_rank` DuckDB oracle is generated for the DEFAULT
    * `terms`/`k1`/`b` — oracle parity holds only at the defaults; a
    * non-default call still computes correctly but is not what the
    * oracle replays. */
  def bm25Rank(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "merge", "window"),
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("dl", size(col("toks")))
    // typed HOF, not string interpolation into expr() — a term containing
    // a quote must stay a value, never become SQL text
    val withTf = terms.foldLeft(docs) { (df, t) =>
      df.withColumn(s"tf_$t",
        size(org.apache.spark.sql.functions.filter(
          col("toks"), x => x === lit(t))))
    }
    val statAggs =
      Seq(count(lit(1)).as("n_docs"), avg(col("dl").cast("double")).as("avgdl")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).as(s"df_$t"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.map { t =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      val tf = col(s"tf_$t").cast("double")
      idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      // membership test on integer tf counts, not the rounded float score
      .filter(terms.map(t => col(s"tf_$t")).reduce(_ + _) > 0)
      .select(Seq(col("doc_id"), col("dl")) ++
        terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
  }

  /** TOKEN-BUDGET CORPUS CUT — keep the best-quality documents until a
    * token budget (half the corpus here) is exhausted: the "train on the
    * top-N tokens" selection every data-constrained run makes. Ordering
    * is (quality-band, doc_id) — a TOTAL order (doc_id is unique), so the
    * cumulative token count rides [[GlobalOrder.withDistributedRunningSum]]:
    * one range repartition on the order, partitioned local running sums,
    * broadcast per-partition prefix offsets. Every window lane holds one
    * RANGE of the order (~n/partitions rows), not one of 21 fixed quality
    * bands — the previous per-band windows bounded PARALLELISM (21 lanes)
    * but not per-lane size (~5 TB per lane at 100 TB; measured as the
    * bench's only super-linear 10× ratio). Integer token math end-to-end
    * → bit-exact oracle (the oracle can afford the single global window
    * at test scale). */
  def tokenBudget(spark: SparkSession, dir: String,
      fraction: Double = 0.5): DataFrame = {
    // checkpoint: the quality-score frame feeds the budget aggregate, the
    // range partitioner's sampling pass and the ranked main pass — three
    // executions of the quality pipeline without it
    val base = qualityScore(spark, dir)
      .select(col("doc_id"), col("n_toks").as("n_tok"),
        floor((lit(1.0) - col("quality")) * 20).cast("int").as("band"))
      .localCheckpoint(true)
    val budget = base.agg(floor(sum("n_tok") * fraction).cast("long").as("budget"))
    GlobalOrder.withDistributedRunningSum(base, col("n_tok"), "cum_end",
        col("band"), col("doc_id"))
      .crossJoin(broadcast(budget))
      .filter(col("cum_end") <= col("budget"))
      .select(col("doc_id"), col("band"), col("n_tok"), col("cum_end"))
  }

  /** SEQUENCE PACKING — assign documents to fixed-token-budget training
    * bins by cumulative token count, the deterministic first-fit packing
    * a pre-training dataloader runs. Documents stream in doc_id order
    * within a (lang, shard) packing lane; a doc starts in the bin its
    * cumulative start offset falls into (docs longer than the remaining
    * budget spill into the next bin — simple offset packing, no
    * re-ordering).
    *
    * Scale shape: the running sum partitions by (lang, shard) — shard =
    * doc_id mod `shards` keeps every lane bounded, so no single-reducer
    * window at any corpus size (more shards = more parallelism, same
    * semantics per lane). The rollup is one keyed aggregation. All
    * integers — bit-exact. */
  def packSequences(spark: SparkSession, dir: String,
      budget: Int = 512, shards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        size(split(col("text"), " ")).as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("bin", expr(s"(cum - n_tok) div $budget"))
      .groupBy("lang", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  /** PROPORTIONAL SAMPLE ALLOCATION (Hamilton / largest-remainder) —
    * split a fixed labeling/eval budget across sources proportional to
    * their document counts, with the fractional seats going to the
    * largest remainders: the apportionment problem every annotation
    * budget hits, solved EXACTLY in integers (base = B·n div N, extra
    * seats by remainder rank, ties by source) — no floating-point
    * shares, so allocations sum to exactly B and the oracle replays
    * bit-for-bit. The remainder-ranking window runs over the SOURCE
    * table (20 rows) — bounded, like lengthDeciles' histogram window. */
  def sampleAllocation(spark: SparkSession, dir: String, budget: Long = 10000L): DataFrame = {
    val s = Tables.load(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val t = s.agg(sum("n_docs").as("total"))
    val j = s.crossJoin(broadcast(t))
      .withColumn("base", expr(s"($budget * n_docs) div total"))
      .withColumn("rem", expr(s"($budget * n_docs) % total"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source").asc)
    val deficit = j.agg((lit(budget) - sum("base")).as("d"))
    j.withColumn("rk", row_number().over(wr))
      .crossJoin(broadcast(deficit))
      .select(col("source"), col("n_docs"),
        (col("base") + when(col("rk") <= col("d"), 1L).otherwise(0L)).as("alloc"))
  }

  /** PER-SOURCE QUOTA CAP — the anti-spam guard a corpus pipeline runs
    * before mixing: no source (domain) may contribute more than `cap`
    * documents, and WHICH documents survive must be a property of the
    * data, not of partition order — so the keep-rank is a deterministic
    * Knuth-multiplicative hash of doc_id (an unseeded uniform shuffle
    * both engines compute identically), not sample() or monotonic ids.
    *
    * TWO-PHASE top-cap via [[GlobalOrder.withShardedGroupTopK]], so a
    * viral domain never funnels through one window partition: phase 1
    * ranks within (source, doc-hash sub-shard) lanes — each holds
    * ~n_source/`shards` rows however hot the source — phase 2 ranks the
    * ≤ shards×cap survivors per source for the true keep-rank
    * (exactness argument at the helper; a count+threshold cutoff could
    * not produce the contract's exact 1..cap keep-rank column). */
  def sourceCaps(spark: SparkSession, dir: String, cap: Int = 20,
      shards: Int = 32): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("((doc_id % 1048573) * 2654435761) % 4294967296").as("hash_val"))
    GlobalOrder.withShardedGroupTopK(base, Seq("source"), col("doc_id"),
        cap, "rk", shards)(col("hash_val"), col("doc_id"))
      .select(col("source"), col("doc_id"), col("rk"))
  }

  /** LENGTH-DECILE BINNING (curriculum buckets) — exact global NTILE(10)
    * over (doc length, doc_id) WITHOUT the global sort that naive
    * `Window.orderBy` would plan (one task holding the corpus — the
    * 100 TB mistake). Global rank decomposes into:
    *   rank = (# docs with shorter length) + (row_number among equals)
    * where the first term comes from a cumulative sum over the LENGTH
    * HISTOGRAM (distinct lengths — hundreds of rows, the one bounded
    * single-partition window here) broadcast back, and the second from a
    * window partitioned by length (distributed, no hot key at corpus
    * scale where lengths spread). The NTILE bin is then closed-form
    * integer arithmetic on the rank: the first N%10 bins take
    * ceil(N/10) rows. DuckDB's plain `NTILE(10) OVER (ORDER BY ...)` is
    * the independent oracle for the whole decomposition. */
  def lengthDeciles(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val hist = d.groupBy("n_tok").agg(count(lit(1)).as("cnt"))
    val wh = org.apache.spark.sql.expressions.Window
      .orderBy("n_tok")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cum_before", coalesce(sum("cnt").over(wh), lit(0L)))
      .select("n_tok", "cum_before")
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("n_tok").orderBy("doc_id")
    val n = d.agg(count(lit(1)).as("n_total"))
    d.withColumn("rk_in", row_number().over(wr))
      .join(broadcast(cum), "n_tok")
      .crossJoin(broadcast(n))
      .withColumn("r", col("cum_before") + col("rk_in"))
      // the shared closed-form NTILE row partition (GlobalOrder.ntileExpr,
      // proven bit-equal to engine ntile by the RFM work) — not an inline
      // re-derivation that could drift from it
      .withColumn("decile", graft.operators.GlobalOrder.ntileExpr("r", "n_total", 10))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        min("n_tok").as("min_len"), max("n_tok").as("max_len"),
        min("doc_id").as("first_doc"))
  }

  /** FREQUENT TOKENS via bounded-memory two-pass (Misra-Gries candidates
    * + exact verify) — the heavy-hitter pattern for a corpus whose
    * DISTINCT vocabulary doesn't fit anywhere: pass 1 runs a k-counter
    * Misra-Gries sketch per partition (mapPartitions, O(k) memory, NO
    * shuffle of the long tail — the billions of rare tokens die in their
    * partition), pass 2 broadcast-semi-joins the ≤ k·nPartitions
    * candidates back and exact-counts ONLY them.
    *
    * Determinism: the per-partition candidate sets depend on partition
    * boundaries, but the FINAL answer does not — MG's pigeonhole
    * guarantee (a token with global freq > N/k must exceed the local
    * n_p/k threshold in at least one partition, so it survives that
    * partition's sketch) makes the candidate set a superset of the true
    * heavy hitters under ANY partitioning, and the exact pass-2 filter
    * `freq·k > N` cuts it back to exactly {token : freq > N/k}. Hence a
    * plain GROUP BY/HAVING DuckDB oracle replays it bit-exactly even
    * though the intermediate sketch is partition-dependent.
    *
    * The one mapPartitions in this codebase earns its place: Misra-Gries'
    * decrement step is genuinely imperative per-partition state that no
    * relational operator expresses without shuffling the full token
    * stream first — which is the exact cost this operator exists to
    * avoid. */
  def frequentTokens(spark: SparkSession, dir: String, k: Int = 200): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val total = toks.agg(count(lit(1)).as("total"))
    val candidates = toks.select("token").as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters(t) = c + 1
          case None if counters.size < k => counters(t) = 1L
          case None => // decrement-all: kills one unit of every counter
            counters.keys.toArray.foreach { key =>
              val c = counters(key)
              if (c == 1L) counters.remove(key) else counters(key) = c - 1
            }
        }
      }
      counters.keysIterator
    }.toDF("token").distinct()
    toks.join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * k > col("total"))
      .select(col("token"), col("freq"),
        round(col("freq") / col("total"), 6).as("share"))
  }

  /** DETERMINISTIC MLM MASKING PLAN — which tokens a BERT-style
    * masked-language-model pass would corrupt, decided by position hash
    * instead of an RNG so every epoch, retry, and straggler re-execution
    * masks the SAME positions (reproducible training, resumable shards).
    * A token at (doc_id, pos) is masked iff
    * `((doc_id·1000003 + pos) mod p) · 48271 mod p ≡ < 15 (mod 100)`
    * (p = 2³¹−1; Lehmer-style mixing, all-integer, overflow-free since
    * the first mod bounds the multiplicand below 2³¹). ~15% of
    * positions, uncorrelated with token content. Per-doc summary:
    * token count, masked count, and the first masked position. Pure
    * integer arithmetic end to end → bit-exact oracle; the whole pass
    * is map-side expressions plus one doc-keyed aggregate. */
  def maskSpans(spark: SparkSession, dir: String): DataFrame = {
    val p = 2147483647L
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("h",
        pmod(pmod(col("doc_id") * 1000003L + col("pos"), lit(p)) * 48271L, lit(p)))
      .withColumn("masked", (pmod(col("h"), lit(100L)) < 15).cast("int"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum("masked").as("n_masked"),
        min(when(col("masked") === 1, col("pos"))).as("first_masked_pos"))
  }

  /** NEGATIVE-SAMPLING TABLE — the word2vec/contrastive-training noise
    * distribution: P(token) ∝ freq^0.75 over the corpus vocabulary
    * (the published 3/4-power unigram flattening), materialized for the
    * top `k` tokens by frequency (freq desc, token asc tiebreak — the
    * candidates a sampler actually draws). Scale shape: one
    * token-keyed count with map-side partials (vocabulary-sized, not
    * corpus-sized), then `orderBy + limit` — planned as
    * TakeOrderedAndProject (per-partition k-row heaps + one k-row
    * driver merge), NEVER a global row_number window, which would sort
    * the whole ~10⁸-type vocabulary in one task to keep 50 rows — and
    * a broadcast total. Float discipline: weights are 6-dp-rounded
    * doubles summed as DECIMAL(18,6) — exact and order-independent —
    * with one double division at the end. */
  def negSamplingTable(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val freqs = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("w", round(pow(col("freq").cast("double"), 0.75), 6)
        .cast(DecimalType(18, 6)))
    val top = freqs.orderBy(col("freq").desc, col("token").asc).limit(k)
    val tot = top.agg(sum("w").as("w_tot"))
    top.crossJoin(broadcast(tot))
      .select(col("token"), col("freq"),
        col("w").cast("double").as("weight"),
        round(col("w").cast("double") / col("w_tot").cast("double"), 6).as("p_draw"))
  }

  /** CONTENT-DEFINED CHUNKING dedup ratio (FastCDC-style, token
    * granularity): a token opens a new chunk iff its portable hash ≡ 0
    * (mod 16) — the boundary depends on CONTENT ONLY, so an identical
    * passage chunks identically wherever it appears and shared chunks
    * collapse under fingerprint dedup; fixed-width chunking misses
    * every shifted copy. Per source: chunk count, distinct chunk
    * fingerprints, the storage dedup ratio, and mean chunk length.
    *
    * Uses the same per-token char-fold hash as [[fingerprint]] and a
    * Karp–Rabin fold per chunk — all integer arithmetic mod 2³¹−1,
    * bit-replicable in the oracle. Scale shape: one posexplode, one
    * per-doc running-sum window (chunk ids), one (doc, chunk) fold,
    * then the TWO-PHASE distinct — groupBy (source, fp) with map-side
    * combine before the per-source rollup — so the shuffle above the
    * chunk frame carries distinct fingerprints, not chunks. */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkFingerprints(Tables.load(spark, dir, "documents"))
    val perFp = chunks.groupBy("source", "fp")
      .agg(count(lit(1)).as("n_copies"), sum("chunk_len").as("len_sum"))
    perFp.groupBy("source").agg(
      sum("n_copies").as("n_chunks"),
      count(lit(1)).as("n_distinct"),
      round(lit(1.0) - count(lit(1)).cast("double") / sum("n_copies"), 6)
        .as("dedup_ratio"),
      round(sum("len_sum").cast("double") / sum("n_copies"), 4).as("avg_chunk_toks"))
  }

  /** CONDITIONAL BIGRAM ENTROPY per source — H(w₂|w₁), how predictable
    * the next token is given the current one: the corpus-diversity
    * number that separates boilerplate-heavy sources (low H) from
    * genuinely varied text (high H), complementing the unigram
    * [[sourceEntropy]] and the [[bigramLm]] family.
    *
    * H(w₂|w₁) = −Σ p(w₁,w₂)·ln(c₁₂/c₁), computed with the same
    * round-then-decimal-sum discipline as [[sourceEntropy]]: each term
    * is one fixed-shape double expression rounded 12 dp, summed as
    * DECIMAL(28,12) (exact, order-independent), final round 6. Scale
    * shape: the bigram count is the only corpus-sized aggregate; c₁ and
    * the pair total REAGGREGATE c₁₂ (vocabulary²-sized), so the fact is
    * scanned once. */
  def bigramCondEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val pairs = Tables.load(spark, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("p"))
      .select(col("source"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = pairs.groupBy("source", "w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("source", "w1").agg(sum("c12").as("c1"))
    val n = c12.groupBy("source").agg(sum("c12").as("n_pairs"))
    c12.join(c1, Seq("source", "w1"))
      .join(broadcast(n), "source")
      .select(col("source"), col("n_pairs"),
        round(-(col("c12").cast("double") / col("n_pairs")) *
          log(col("c12").cast("double") / col("c1")), 12)
          .cast(DecimalType(28, 12)).as("term"))
      .groupBy("source")
      .agg(max("n_pairs").as("n_pairs"), count(lit(1)).as("n_bigrams"),
        round(sum("term").cast("double"), 6).as("cond_entropy"))
  }

  /** HEAPS'-LAW VOCABULARY GROWTH — cumulative distinct vocabulary vs
    * cumulative tokens as the corpus is ingested in doc_id order,
    * sampled at ingest deciles: the curve that predicts how much NEW
    * vocabulary the next 10 TB will add (sublinear growth = the corpus
    * is saturating; linear = still worth crawling).
    *
    * Each token type is attributed to the decile of its FIRST document
    * (one min-aggregate over the token postings — no cumulative
    * distinct-count window, which wouldn't scale); cumulative sums then
    * run over the 10-row decile frame. All integers → bit-exact.
    *
    * Decile assignment is the other scale hazard: `ntile(10)` over an
    * unpartitioned doc_id window funnels the CORPUS-sized doc frame
    * through one task. Instead the doc frame gets a distributed global
    * row_number ([[GlobalOrder.withGlobalRowNumber]]: range shuffle +
    * partitioned window + broadcast prefix counts) and the decile is cut
    * arithmetically from (position, total) with the standard NTILE row
    * partition ([[GlobalOrder.ntileExpr]]) — bit-identical boundaries,
    * no single-task window anywhere. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val ranked = GlobalOrder.withGlobalRowNumber(
      docs.select(col("doc_id"), size(col("t")).as("n_toks")), "_i", col("doc_id"))
    val nDocs = ranked.agg(count(lit(1)).as("_n"))
    val dec = ranked.crossJoin(broadcast(nDocs))
      .withColumn("decile", GlobalOrder.ntileExpr("_i", "_n", 10))
      .drop("_i", "_n")
    val firstOcc = docs.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy("w").agg(min("doc_id").as("first_doc"))
    val newTypes = firstOcc
      .join(dec.select(col("doc_id").as("first_doc"), col("decile")), "first_doc")
      .groupBy("decile").agg(count(lit(1)).as("new_types"))
    val toksPerDec = dec.groupBy("decile").agg(sum("n_toks").as("toks"))
    val w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    toksPerDec.join(newTypes, Seq("decile"), "left").na.fill(0L, Seq("new_types"))
      .select(col("decile"),
        sum("toks").over(w).as("cum_tokens"),
        sum("new_types").over(w).as("cum_vocab"))
  }

  /** LOG-NORMAL LENGTH FIT per source — method-of-moments μ and σ² of
    * ln(n_chars): document lengths are canonically log-normal, and the
    * fitted parameters drive chunk-size and batch-shape planning.
    * ln and ln² are rounded 12 dp BEFORE the decimal sums (exact,
    * order-independent); the two divisions and the variance subtraction
    * are fixed-shape double arithmetic, rounded 6. One map-side
    * projection + one source-keyed aggregate. */
  def lengthLognormal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val x = Tables.load(spark, dir, "documents")
      .withColumn("lxd", log(col("n_chars").cast("double")))
      .select(col("source"),
        round(col("lxd"), 12).cast(DecimalType(28, 12)).as("lx"),
        round(col("lxd") * col("lxd"), 12).cast(DecimalType(28, 12)).as("lx2"))
    x.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      round(sum("lx").cast("double") / count(lit(1)), 6).as("mu_log"),
      round(sum("lx2").cast("double") / count(lit(1)) -
        (sum("lx").cast("double") / count(lit(1))) *
          (sum("lx").cast("double") / count(lit(1))), 6).as("var_log"))
  }

  /** TOP-K TOKEN COVERAGE — what fraction of all corpus tokens the k
    * most frequent types account for, at k ∈ {10, 20, 50}: the
    * Zipf-mass curve that sizes a tokenizer's core vocabulary (and the
    * complement of [[oovRate]]: coverage(k) = 1 − oov at vocab k).
    * Vocabulary-sized count with map-side partials; the top-k head is
    * `orderBy + limit(max k)` — TakeOrderedAndProject, per-partition
    * 50-row heaps + one 50-row driver merge — and the row_number that
    * labels ranks runs over THAT 50-row head only (the
    * [[graft.operators.Similarity]] hybridSearch pattern), never over
    * the full ~10⁸-type vocabulary; broadcast 1-row total; integer
    * sums, one rounded division per k. */
  def tokenCoverage(spark: SparkSession, dir: String): DataFrame = {
    val kVals = Seq(10, 20, 50)
    val freqs = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val ranked = freqs
      .orderBy(col("freq").desc, col("token").asc).limit(kVals.max)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("freq").desc, col("token").asc)))
    val total = freqs.agg(sum("freq").as("total_tokens"))
    val ks = spark.range(0, kVals.size).select(
      element_at(array(kVals.map(lit(_)): _*), (col("id") + 1).cast("int")).as("k"))
    ranked.join(broadcast(ks), col("rk") <= col("k"))
      .groupBy("k")
      .agg(sum("freq").as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("covered_tokens"), col("total_tokens"),
        round(col("covered_tokens").cast("double") / col("total_tokens"), 6)
          .as("coverage"))
  }

  /** ZIPF SLOPE — least-squares slope of ln(freq) on ln(rank) over the
    * vocabulary (canonically ≈ −1): the one-number summary of the
    * rank-frequency curve that [[tokenCoverage]] samples pointwise.
    * A corpus whose slope drifts shallow is template-heavy; steep means
    * a tiny head dominates. Closed-form least squares on exact sums
    * (the `Breadth.trendSlope` discipline): ln terms and their products
    * rounded 12 dp, summed as DECIMAL(28,12), one fixed-shape double
    * expression at the end. Vocabulary-sized frames throughout — and
    * unlike [[tokenCoverage]], the regression needs EVERY type's rank,
    * so the ranking runs through the distributed two-pass
    * [[GlobalOrder.withGlobalRowNumber]] (range shuffle + partitioned
    * window + broadcast prefix counts), not a single-task global
    * row_number over the ~10⁸-type vocabulary. */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val freqs = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val r = GlobalOrder.withGlobalRowNumber(
      freqs, "rk", col("freq").desc, col("token").asc)
    val t = r.select(
        round(log(col("rk").cast("double")), 12).as("x"),
        round(log(col("freq").cast("double")), 12).as("y"))
      .select(
        col("x").cast(DecimalType(28, 12)).as("xd"),
        col("y").cast(DecimalType(28, 12)).as("yd"),
        round(col("x") * col("y"), 12).cast(DecimalType(28, 12)).as("xy"),
        round(col("x") * col("x"), 12).cast(DecimalType(28, 12)).as("xx"))
    val s = t.agg(count(lit(1)).as("n"),
      sum("xd").as("sx"), sum("yd").as("sy"),
      sum("xy").as("sxy"), sum("xx").as("sxx"))
    s.select(col("n").as("n_types"),
      round((col("n") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
        (col("n") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")), 6)
        .as("zipf_slope"))
  }

  /** The chunking core of [[cdcChunks]] over any (doc_id, source, text)
    * frame: per chunk, its Karp–Rabin fingerprint and length. Exposed
    * separately so the shift-invariance spec can drive it with
    * synthetic passages. */
  private[graft] def chunkFingerprints(docs: DataFrame): DataFrame = {
    val toks = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("th",
        expr("transform(toks, t -> aggregate(split(t, ''), CAST(0 AS BIGINT), " +
          "(a, c) -> pmod(a * 31 + ascii(c), 2147483647L)))"))
      .select(col("doc_id"), col("source"), posexplode(col("th")).as(Seq("pos", "h")))
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    toks
      .withColumn("boundary", (pmod(col("h"), lit(16L)) === 0L).cast("int"))
      .withColumn("chunk_id", sum("boundary").over(wRun))
      .groupBy("doc_id", "source", "chunk_id")
      .agg(expr("aggregate(transform(sort_array(collect_list(struct(pos, h))), s -> s.h), " +
        "CAST(0 AS BIGINT), (acc, x) -> pmod(acc * 1000003L + x, 2147483647L))").as("fp"),
        count(lit(1)).as("chunk_len"))
  }
}
