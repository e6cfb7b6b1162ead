package graft

import graft.ml.FeaturePipeline
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

class FeaturePipelineSpec extends SparkSpec {

  test("Q3: feature selection is positional — columns[4:], 7 features") {
    val table = FeaturePipeline.featureTable(spark, sf)
    val feats = FeaturePipeline.featureCols(table)
    // Mirrors the reference layout (/root/reference/utils/kmeans_utils.py:68):
    // raw max_buy IS a feature; raw age/avg_buy/min_buy are NOT (their log
    // versions are); accuracy/strength map isHit/strength.
    assert(feats.toSeq == Seq("max_buy", "accuracy", "strength",
      "log_age", "log_avg_buy", "log_min_buy", "log_max_buy"))
  }

  test("scaled features have ~zero mean and ~unit std per dimension") {
    val data = FeaturePipeline.prepareData(spark, sf)
    val vecs = data.select("features").collect().map(_.getAs[Vector](0))
    val n = vecs.length
    assert(n > 0)
    val d = vecs.head.size
    for (j <- 0 until d) {
      val col = vecs.map(_(j))
      val mean = col.sum / n
      val varSum = col.map(x => (x - mean) * (x - mean)).sum
      val std = math.sqrt(varSum / (n - 1)) // StandardScaler uses sample std
      assert(math.abs(mean) < 1e-9, s"dim $j mean=$mean")
      assert(math.abs(std - 1.0) < 1e-6 || varSum == 0.0, s"dim $j std=$std")
    }
  }

  test("prepareData output contains no nulls in the vector (VectorAssembler would throw)") {
    val data = FeaturePipeline.prepareData(spark, sf)
    assert(data.filter(col("features").isNull).count() == 0)
  }
}
