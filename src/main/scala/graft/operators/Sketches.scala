package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — the 100 TB distinct-counting and
  * heavy-hitter pattern the engine's exact operators deliberately do not
  * cover: pre-aggregate each partition/day into a CONSTANT-SIZE sketch,
  * then merge sketches instead of re-scanning rows. This is the shape
  * that turns "distinct users per segment, any date range" from a
  * fact-table scan per question into a sketch-table scan (thousands of
  * rows), and it is why the sketch column is first-class here rather
  * than an approx function call: the INTERMEDIATE is the product.
  *
  * No DuckDB oracle can check estimates across engines (different
  * sketch families), so both queries are rows-only with spec-pinned
  * error floors against the exact answers at test scale
  * (`SketchSpec`) — the same discipline as ANN recall.
  */
object Sketches {

  /** HLL SKETCH ROLLUP over events: build one HyperLogLog sketch of
    * `user_id` per (day, event_type) — the grain a 100 TB pipeline would
    * persist as a sketch table — then merge the daily sketches per type
    * with `hll_union_agg` and estimate. The audit columns hold the exact
    * distinct count (computed independently; affordable at test scale,
    * DROPPED at 100 TB where the sketch table IS the source) and the
    * day count, so the spec can pin relative error without a second
    * query. lgK = 14 ⇒ ~0.8% standard error in ~16 KB per sketch; the
    * merged estimate is datasketches-deterministic for fixed input, but
    * cross-engine no oracle exists → rows-only + spec floor.
    *
    * 100 TB shape: the daily aggregation is one map-side-combinable
    * shuffle on (day, type); the union re-aggregation shuffles only
    * days×types sketch rows (KBs each), never users. */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
    val daily = ev
      .groupBy("day", "event_type")
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
    val merged = daily
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
    val exact = ev
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_days"), col("exact_users"),
        col("est_users"))
  }

  /** [[hllRollup]] THROUGH A PERSISTED SKETCH TABLE — the storable half
    * of the pattern (mirroring the `q_ann_ivf_saved` precedent): the
    * (day, type) sketch frame is written to parquet (binary sketch
    * column + keys), re-read, and merged from the STORED bytes. At
    * 100 TB this is the nightly job + the interactive half: build once,
    * answer every date-range distinct question from the sketch table.
    * Output equals [[hllRollup]] minus the exact audit column (the
    * stored table no longer carries user ids — the point), and the spec
    * pins saved == in-session estimates exactly. */
  def hllRollupSaved(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Scratch.dir("hll_sketches") // per-process root — see Scratch
    Tables.load(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
      .groupBy("day", "event_type")
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
      .write.mode("overwrite").parquet(s"$tmp/daily")
    val out = spark.read.parquet(s"$tmp/daily")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
      .localCheckpoint(true)
    Scratch.delete(tmp)
    out
  }

  /** COUNT-MIN-SKETCH heavy hitters over document tokens: one
    * map-side-combinable `count_min_sketch` aggregate compresses the
    * whole token stream into a ~1 MB sketch (eps 1e-4, confidence 0.99,
    * fixed seed ⇒ deterministic), then the exact top-20 tokens are
    * looked up in it, surfacing per-token (exact, estimate, overcount).
    * CMS guarantees est ≥ exact and est ≤ exact + eps·N w.p. 0.99 —
    * both spec-pinned. The exact top-20 frame is the test-scale audit
    * half; at 100 TB the sketch is built in one pass and probed for
    * candidate tokens (from a sample or a prior day's top-k) WITHOUT the
    * exact groupBy — the point of CMS is answering "how often does X
    * occur" for adversarially many X without keeping per-key state.
    *
    * The probe deserializes the sketch per row via a UDF over the
    * broadcast 1-row sketch frame — 20 bounded rows, never data-sized;
    * the only driver transfer is the sketch itself inside the broadcast
    * (the k-centers precedent: constant-size, not data-sized). */
  def cmsHeavyHitters(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val tokens = Tables.load(spark, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val sk = tokens.agg(
      count_min_sketch(col("token"), lit(0.0001d), lit(0.99d), lit(42)).as("sk_bytes"),
      count(lit(1)).as("n_tokens"))
    val top = tokens.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token").asc)
      .limit(k)
    top.crossJoin(broadcast(sk))
      .withColumn("est_cnt", cmsEstimate(col("sk_bytes"), col("token")))
      .select(col("token"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"),
        col("n_tokens"))
  }

  /** [[cmsHeavyHitters]] WITHOUT the exact audit half — the shape that
    * actually runs at 100 TB, where the exact token groupBy is dropped
    * and the sketch alone answers frequency questions. One linear pass
    * builds the ~1 MB sketch; candidates come from a BOUNDED
    * deterministic sample (the distinct tokens of the first 200
    * documents by id — the "prior day's top-k / sample" seeding the
    * docstring above describes), are probed against the broadcast
    * sketch, and the top-k estimates survive via orderBy+limit
    * (TakeOrderedAndProject). Nothing but the sketch build scales with
    * the corpus, which is exactly what the 10× spot-bench measures —
    * [[cmsHeavyHitters]]'s ratio is dominated by its test-scale exact
    * audit, a super-linear cost the production pattern doesn't pay. */
  def cmsHeavyHittersProbeOnly(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tokens = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val sk = tokens.agg(
      count_min_sketch(col("token"), lit(0.0001d), lit(0.99d), lit(42)).as("sk_bytes"),
      count(lit(1)).as("n_tokens"))
    val candidates = docs.filter(col("doc_id") < 200)
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    candidates.crossJoin(broadcast(sk))
      .withColumn("est_cnt", cmsEstimate(col("sk_bytes"), col("token")))
      .orderBy(col("est_cnt").desc, col("token").asc).limit(k)
      .select(col("token"), col("est_cnt"), col("n_tokens"))
  }

  /** CMS point probe. A UDF is justified here (the repo's only one
    * besides nothing): Spark has no built-in CMS probe expression, and
    * every caller runs it over ≤ a few hundred candidate rows against a
    * broadcast sketch — never data-sized input. */
  private val cmsEstimate = udf { (bytes: Array[Byte], token: String) =>
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(token)
  }
}
