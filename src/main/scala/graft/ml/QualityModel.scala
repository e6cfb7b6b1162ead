package graft.ml

import graft.operators.TextAnalysis
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supervised QUALITY CLASSIFIER — train a logistic regression to
  * reproduce the rule-based quality gate from raw text signals, the
  * "distill the heuristic into a model" step a curation pipeline takes
  * when the hand-written rules stop scaling to new domains.
  *
  * The label is the engine's own `quality >= 0.5` gate; features are
  * the underlying signals (token count, punctuation ratio, stopword
  * ratio). Training is one MLlib LBFGS fit — a broadcastable
  * coefficient vector, no corpus-sized state — and scoring is a
  * map-side `model.transform`. Iterative-solver outputs are not
  * bit-portable across engines, so the query is rows-only; the spec
  * pins ≥0.95 agreement with the rule it was trained on. */
object QualityModel {

  def features(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(spark, dir)
      // a ZERO-LENGTH document carries NULL ratios (x/0) and a NULL
      // quality — one such row would hard-fail the whole fit
      // (VectorAssembler's default handleInvalid='error', LR rejects a
      // null label). An empty doc has no quality signal to distill:
      // drop it from the TRAINING frame, exactly as a curation pipeline
      // filters empties before any model sees them (round-16 review —
      // latent: the driver fixtures have no empty docs)
      .filter(col("quality").isNotNull)
      .select(col("doc_id"),
        col("n_toks").cast("double").as("f_len"),
        col("punct_ratio").as("f_punct"),
        col("stop_ratio").as("f_stop"),
        (col("quality") >= 0.5).cast("double").as("label"))

  /** Fit + score in one pass; returns (doc_id, label, prediction,
    * correct).
    *
    * The assembled feature frame is cached for the duration of the fit
    * (LBFGS makes one treeAggregate pass per iteration — uncached, each
    * pass would re-read parquet and re-tokenize, ~50× redundant work at
    * 100 TB); [[graft.Tables.withCached]] checkpoints the scored output
    * and unpersists the intermediate before returning.
    *
    * Scoring is the decision rule written as COLUMN ARITHMETIC on the
    * fitted coefficients (margin > 0 ⇔ P(1) > 0.5, Spark's default
    * threshold), NOT `model.transform`: the three coefficients travel as
    * plan literals inside whole-stage codegen — the "broadcastable
    * coefficient vector" promise made literal — whereas the transform
    * UDF closure captures the model object, whose training summary pins
    * the driver's SparkSession and fails task serialization outright
    * (NotSerializableException: ObservationManager) once the shared
    * session has been touched by other queries — the root cause of the
    * round-8 0-row record, reproducible only in full-sweep runs. */
  def trainScore(spark: SparkSession, dir: String): DataFrame = {
    val df = features(spark, dir)
    val assembled = new VectorAssembler()
      .setInputCols(Array("f_len", "f_punct", "f_stop"))
      .setOutputCol("features")
      .transform(df)
    graft.Tables.withCached(assembled) {
      val model = new LogisticRegression()
        .setMaxIter(50)
        .setRegParam(0.0)
        .fit(assembled)
      val w = model.coefficients.toArray // 3 values, driver-side
      val margin = lit(model.intercept) +
        col("f_len") * w(0) + col("f_punct") * w(1) + col("f_stop") * w(2)
      assembled
        .select(col("doc_id"), col("label"),
          when(margin > 0d, 1.0).otherwise(0.0).as("prediction"))
        .withColumn("correct",
          (col("label") === col("prediction")).cast("int"))
    }
  }
}
