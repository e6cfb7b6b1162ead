package graft

import graft.ml.{FeaturePipeline, KMeansScan}

class KMeansScanSpec extends SparkSpec {

  lazy val data = FeaturePipeline.prepareData(spark, sf)
  lazy val tmp = java.nio.file.Files.createTempDirectory("kmeans_spec").toString

  test("scan covers k=2..6 with silhouette in [-1,1] and k centers each") {
    val results = KMeansScan.scan(data, 2, 6, tmp)
    assert(results.map(_.k) == Seq(2, 3, 4, 5, 6))
    results.foreach { r =>
      assert(r.silhouette >= -1.0 && r.silhouette <= 1.0, s"k=${r.k} score=${r.silhouette}")
      assert(r.centers.length == r.k)
      assert(r.centers.forall(_.length == 7))
    }
  }

  test("scan is deterministic under pinned seed + partitioning (Q7)") {
    val a = KMeansScan.scan(data, 3, 3, tmp + "/a")
    val b = KMeansScan.scan(data, 3, 3, tmp + "/b")
    assert(a.head.silhouette == b.head.silhouette)
    assert(a.head.centers.flatten.toSeq == b.head.centers.flatten.toSeq)
  }

  test("persisted model reloads with identical centers (S3/S4)") {
    val r = KMeansScan.scan(data, 2, 2, tmp + "/persist").head
    val loaded = KMeansScan.loadModel(r.modelPath)
    assert(loaded.clusterCenters.map(_.toArray.toSeq).toSeq ==
      r.centers.map(_.toSeq).toSeq)
  }

  test("resultsFrame has one row per (k, center) with named feature columns") {
    val results = KMeansScan.scan(data, 2, 3, tmp + "/frame")
    val names = Seq("max_buy", "accuracy", "strength", "log_age",
      "log_avg_buy", "log_min_buy", "log_max_buy")
    val df = KMeansScan.resultsFrame(spark, results, names)
    assert(df.count() == 2 + 3)
    assert(df.columns.toSeq == Seq("k", "score") ++ names)
  }
}
