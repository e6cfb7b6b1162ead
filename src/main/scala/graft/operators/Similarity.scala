package graft.operators

import graft.Tables
import graft.functions.VecText._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over `embeddings.embedding`
  * (`array<float>`, 64-dim).
  *
  * Two tiers:
  *   - [[bruteTopK]]: exact cosine top-k — the correctness baseline,
  *     fully oracle-checkable. O(probes × corpus); only viable when the
  *     probe set is small or the corpus is broadcastable.
  *   - [[ivfTopK]]: IVF — KMeans coarse quantizer (seeded, deterministic)
  *     partitions the corpus into nlist inverted lists; a probe scans only
  *     its nprobe nearest lists. At 100 TB the corpus is hash-partitioned
  *     by list id, the (tiny) centroid table is broadcast, and each probe
  *     shuffles to exactly nprobe partitions instead of all of them —
  *     the standard IVF-Flat layout (FAISS-style) expressed relationally.
  *
  * Cosine ranking == L2 ranking on unit-normalized vectors, so both tiers
  * rank with the same `cos` expression on pre-normalized doubles.
  */
object Similarity {

  /** Corpus with unit-norm double vectors (computed once, codegen'd). */
  private def normalized(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .withColumn("emb_d", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(norm2("emb_d")))
      .withColumn("unit", expr("transform(emb_d, x -> x / nrm)"))
      .select(col("vec_id"), col("emb_d"), col("unit"))

  /** Exact cosine top-k for probe vectors (vec_id < nProbes). Norms are
    * precomputed per side; cos = dot/(nq·nc) matches the oracle formula
    * bit-for-bit. */
  def bruteTopK(spark: SparkSession, dir: String, k: Int = 5, nProbes: Int = 10): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .withColumn("emb_d", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(norm2("emb_d")))
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("query_id"), col("emb_d").as("emb_q"), col("nrm").as("nq"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("emb_d").as("emb_c"), col("nrm").as("nc"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    probes.crossJoin(corpus)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw", dot("emb_q", "emb_c") / (col("nq") * col("nc")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos_raw"), 6).as("cos"))
  }

  /** Random-hyperplane LSH near-dup pair mining — the O(n) scale path
    * beside [[Dedup.embeddingPairs]]'s exact baseline. Each vector gets a
    * `nBits`-bit sign signature against fixed seeded hyperplanes; vectors
    * sharing any of the `nBands` signature bands become candidates, then
    * exact cosine verifies. Deterministic (fixed planes), rows-only check;
    * the spec asserts recall vs the exact pairs. */
  def lshEmbeddingPairs(
      spark: SparkSession,
      dir: String,
      threshold: Double = 0.4,
      nBits: Int = 16,
      nBands: Int = 8): DataFrame = {
    val rnd = new scala.util.Random(7)
    val dim = 64
    val planes = Array.fill(nBits, dim)(rnd.nextGaussian())
    val planesLit = expr(planes.map(p =>
      s"array(${p.mkString(", ")})").mkString("array(", ", ", ")"))
    val base = Tables.load(spark, dir, "embeddings")
      .withColumn("emb_d", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(norm2("emb_d")))
      .withColumn("planes", planesLit)
      .withColumn("sigbits", expr(
        "transform(planes, pl -> IF(aggregate(zip_with(emb_d, pl, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) >= 0, 1, 0))"))
      .drop("planes")
    val rowsPerBand = nBits / nBands
    val banded = base.withColumn("band", explode(expr(
        s"transform(sequence(0, ${nBands - 1}), k -> named_struct('band_idx', k, 'band_val', slice(sigbits, k * $rowsPerBand + 1, $rowsPerBand)))")))
      .select(col("vec_id"), col("emb_d"), col("nrm"),
        col("band.band_idx"), col("band.band_val"))
    val a = banded.select(col("band_idx"), col("band_val"),
      col("vec_id").as("id_a"), col("emb_d").as("emb_a"), col("nrm").as("na"))
    val b = banded.select(col("band_idx"), col("band_val"),
      col("vec_id").as("id_b"), col("emb_d").as("emb_b"), col("nrm").as("nb"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot("emb_a", "emb_b") / (col("na") * col("nb"))).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** IVF-Flat ANN: nlist-way KMeans coarse quantizer, nprobe-list search.
    * Deterministic under the pinned seed; rows-only check (approximate
    * results are not SQL-expressible). */
  def ivfTopK(
      spark: SparkSession,
      dir: String,
      k: Int = 5,
      nProbes: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val base = normalized(spark, dir).cache()
    val vecs = base.withColumn("features", array_to_vector(col("unit")))
    val km = new KMeans().setK(nlist).setSeed(1L).setFeaturesCol("features")
      .setPredictionCol("list_id").fit(vecs)
    // Inverted lists: corpus partitioned by coarse cell.
    val lists = km.transform(vecs)
      .select(col("vec_id").as("neighbor_id"), col("unit").as("unit_c"), col("list_id"))
    // Tiny centroid table — broadcast everywhere.
    val centroids = spark.createDataFrame(
      km.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq)
      .toDF("list_id", "centroid")
    val probes = base.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("query_id"), col("unit").as("unit_q"))
    // Rank centroids per probe, keep nprobe closest lists.
    val wc = Window.partitionBy("query_id").orderBy(col("cdist").desc, col("list_id").asc)
    val probeLists = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", dot("unit_q", "centroid"))
      .withColumn("crnk", row_number().over(wc))
      .filter(col("crnk") <= nprobe)
      .select("query_id", "unit_q", "list_id")
    // Scan only the selected inverted lists.
    val w = Window.partitionBy("query_id").orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    probeLists.join(lists, "list_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw", dot("unit_q", "unit_c"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos_raw"), 6).as("cos"))
  }
}
