package graft.ml

import graft.operators.Relational
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-preparation pipeline mirroring `prepare_data`
  * (`/root/reference/utils/kmeans_utils.py:55-77`), re-targeted onto the
  * testdata star schema via [[Relational.customerFeatures]].
  *
  * Reference semantics preserved:
  *   - log features appended in the reference's order
  *     (`/root/reference/utils/kmeans_utils.py:63-64`);
  *   - Q3 positional feature selection: `columns[4:]`
  *     (`/root/reference/utils/kmeans_utils.py:68`) — the feature set is a
  *     function of column ORDER, so raw `max_buy` is included while raw
  *     `age`/`avg_buy`/`min_buy` are not;
  *   - `VectorAssembler` → `features_unscaled`, then `StandardScaler`
  *     (withMean, withStd) → `features`
  *     (`/root/reference/utils/kmeans_utils.py:70-75`).
  *
  * Deliberate improvements over the reference (SURVEY.md §3.2):
  *   - the feature table is `.cache()`d — the reference recomputes the whole
  *     CSV→join→agg DAG for every one of the 5 k-fits;
  *   - partitioning is pinned (`coalesce(4)`) for k-means‖ reproducibility
  *     (quirk Q7), matching `/root/reference/pyspark_kmeans.py:12`.
  *
  * Scale note: at 100 TB the feature table is the output of a heavy
  * aggregation — caching it is mandatory, and `coalesce(4)` would become
  * `repartition(nExecutors * cores)`; the pinned small value is only for
  * single-node determinism against the reference.
  */
object FeaturePipeline {

  /** Column layout after the joins, matching the reference's frame:
    * positions 0-3 are identity/raw columns excluded from features. */
  private val dropLeading = 4

  /** The `load_data`-equivalent frame + log columns (still un-assembled). */
  def featureTable(spark: SparkSession, dir: String): DataFrame =
    Relational.customerFeatures(spark, dir)
      .withColumn("log_age", log(col("age")))
      .withColumn("log_avg_buy", log(col("avg_buy")))
      .withColumn("log_min_buy", log(col("min_buy")))
      .withColumn("log_max_buy", log(col("max_buy")))

  /** Positional feature list — quirk Q3: everything after the 4th column. */
  def featureCols(df: DataFrame): Array[String] = df.columns.drop(dropLeading)

  private val namesMemo = new graft.SessionMemo[Array[String]]()

  /** The feature-name list on its own, memoized per (session, dir) —
    * three call sites (kmeansQuery, reportTable, the job main) were each
    * rebuilding the whole multi-join [[featureTable]] plan (plus the
    * parquet schema reads behind it) solely to call `.columns` on it
    * (round-16 review). Plan construction only — no job runs either
    * way — but the names are a per-dir constant, so derive them once. */
  def featureNames(spark: SparkSession, dir: String): Array[String] =
    namesMemo.getOrCompute(spark, dir)(featureCols(featureTable(spark, dir)))

  private val prepared = new graft.SessionMemo[DataFrame]()

  /** Assemble + standard-scale; returns the cached, partition-pinned frame
    * with `features_unscaled` and `features` vector columns. Memoized per
    * (session, sf dir) — keying by dir alone handed a SECOND SparkSession
    * a frame bound to the first (stopped session ⇒ IllegalStateException;
    * live one ⇒ the query silently runs under the wrong session's conf).
    * The scan/assignments/report queries all share one scaler fit and one
    * Spark cache, like a real pipeline would. */
  def prepareData(spark: SparkSession, dir: String): DataFrame =
    prepared.getOrCompute(spark, dir)(prepareDataUncached(spark, dir))

  private def prepareDataUncached(spark: SparkSession, dir: String): DataFrame = {
    val table = featureTable(spark, dir).coalesce(4).cache()
    val features = featureCols(table)
    val assembled = new VectorAssembler()
      .setInputCols(features)
      .setOutputCol("features_unscaled")
      .transform(table)
    val scaler = new StandardScaler()
      .setWithStd(true).setWithMean(true)
      .setInputCol("features_unscaled").setOutputCol("features")
    // localCheckpoint, not .cache(): SessionMemo allows a concurrent
    // duplicate compute (putIfAbsent keeps the first) — a losing
    // thread's cache() entry would be pinned in the shared CacheManager
    // forever, while an unreachable checkpointed frame's blocks are
    // reclaimed by the ContextCleaner. Same hygiene as Tables.withCached.
    val scaled = scaler.fit(assembled).transform(assembled).localCheckpoint(true)
    table.unpersist(blocking = false)
    scaled
  }
}
