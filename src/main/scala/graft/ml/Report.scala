package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native analog of the reference's report stage
  * (`/root/reference/utils/reports.py:39-145`): the PDF/plot rendering is
  * out of engine scope (SURVEY.md §2.1 S7/S8), but its DATA
  * transformations are reproduced relationally:
  *   - cluster ids per k — pandas `groupby('k').cumcount()+1`
  *     (`utils/reports.py:83`) → `row_number` window;
  *   - long-form feature table — pandas `melt` (`utils/reports.py:88`)
  *     → `unpivot`;
  *   - best-k pick by silhouette — `describe()`/argmax logic → order+limit.
  */
object Report {

  /** Long-form (k, cluster, score, feature, value) table from a k-scan. */
  def reportTable(spark: SparkSession, dir: String): DataFrame = {
    val featureNames = FeaturePipeline.featureCols(
      FeaturePipeline.featureTable(spark, dir))
    val results = KMeansScan.scanCached(spark, dir).filter(_.k <= 4)
    val frame = KMeansScan.resultsFrame(spark, results, featureNames.toSeq)
    val withCluster = frame.withColumn("cluster",
      row_number().over(Window.partitionBy("k").orderBy(featureNames.map(col): _*)))
    withCluster.unpivot(
      Array(col("k"), col("cluster"), col("score")),
      featureNames.map(col),
      "feature", "value")
  }

  /** Best k by silhouette (ties → smaller k), with its centers count. */
  def bestK(spark: SparkSession, dir: String): DataFrame = {
    val results = KMeansScan.scanCached(spark, dir)
    import spark.implicits._
    results.map(r => (r.k, r.silhouette, r.centers.length))
      .toDF("k", "score", "n_centers")
      .orderBy(col("score").desc, col("k").asc)
      .limit(1)
  }
}
