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
      .select(col("doc_id"),
        col("n_toks").cast("double").as("f_len"),
        col("punct_ratio").as("f_punct"),
        col("stop_ratio").as("f_stop"),
        (col("quality") >= 0.5).cast("double").as("label"))

  /** Fit + score in one pass; returns (doc_id, label, prediction,
    * correct). */
  def trainScore(spark: SparkSession, dir: String): DataFrame = {
    val df = features(spark, dir)
    val assembled = new VectorAssembler()
      .setInputCols(Array("f_len", "f_punct", "f_stop"))
      .setOutputCol("features")
      .transform(df)
    val model = new LogisticRegression()
      .setMaxIter(50)
      .setRegParam(0.0)
      .fit(assembled)
    model.transform(assembled)
      .select(col("doc_id"), col("label"), col("prediction"),
        (col("label") === col("prediction")).cast("int").as("correct"))
  }
}
