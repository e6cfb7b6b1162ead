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

  /** Long-form (k, cluster, score, feature, value) table from a k-scan.
    * Round-16 review fixes: the FULL k=2..6 scan feeds the table (an
    * undocumented `k <= 4` cut had silently dropped two k tiers the
    * reference report renders), and cluster ids follow MODEL CENTER
    * ORDER — the `groupby('k').cumcount()+1` analog over the CSV's row
    * order (`utils/reports.py:83`) — so the report's cluster i+1 names
    * the same centroid as `assignmentsQuery`'s prediction i. The former
    * feature-value sort renumbered clusters and severed that join. */
  def reportTable(spark: SparkSession, dir: String): DataFrame = {
    val featureNames = FeaturePipeline.featureNames(spark, dir)
    val results = KMeansScan.scanCached(spark, dir)
    import spark.implicits._
    val rows = for {
      r <- results
      (center, i) <- r.centers.zipWithIndex
    } yield (r.k, i + 1, r.silhouette, center)
    val withFeatures = KMeansScan.widenCenters(
      rows.toDF("k", "cluster", "score", "center"), featureNames.toSeq)
    withFeatures.unpivot(
      Array(col("k"), col("cluster"), col("score")),
      featureNames.map(col),
      "feature", "value")
  }

  /** Best k by silhouette (ties → smaller k), with its centers count.
    * A NaN silhouette (degenerate fit) ranks LAST, not first: Spark
    * orders NaN above every double, so a bare `desc` would crown the
    * degenerate k — pandas' argmax (the reference's pick) skips NaN. */
  def bestK(spark: SparkSession, dir: String): DataFrame = {
    val results = KMeansScan.scanCached(spark, dir)
    import spark.implicits._
    results.map(r => (r.k, r.silhouette, r.centers.length))
      .toDF("k", "score", "n_centers")
      .orderBy(
        when(isnan(col("score")), lit(Double.NegativeInfinity))
          .otherwise(col("score")).desc,
        col("k").asc)
      .limit(1)
  }
}
