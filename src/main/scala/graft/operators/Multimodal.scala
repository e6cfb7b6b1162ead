package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The container has no media codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC FAKE (clearly marked below) — but everything Spark-side
  * is real and tested: the schema (binary payload + metadata struct), the
  * partition-batched execution shape (`mapPartitions` over fixed-size
  * batches — the JVM analog of Arrow-batched `mapInPandas`), and the
  * column plumbing in/out.
  *
  * Scale notes: payload bytes never hit a shuffle — decode is map-side;
  * only the (media_id, feature-vector) rows move. Batching bounds peak
  * memory at batchSize × payload, the same control `mapInPandas` gets
  * from `spark.sql.execution.arrow.maxRecordsPerBatch`.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("mime", StringType))))))

  /** Deterministic synthetic media table derived from `documents`: the
    * UTF-8 bytes of each text stand in for an encoded payload. Real
    * binary columns, real metadata struct — only the CONTENT is fake. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          (pmod(col("doc_id"), lit(8)) * 64 + 64).cast("int").as("width"),
          (pmod(col("doc_id"), lit(8)) * 64 + 64).cast("int").as("height"),
          lit(16000).as("sample_rate"),
          (col("n_chars") * 10).cast("int").as("duration_ms"),
          concat(lit("application/x-fake-"),
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (pmod(col("doc_id"), lit(3)) + 1).cast("int"))).as("mime")).as("meta"))

  /** BINARY PAYLOAD DEDUP — exact dedup in the media domain: group by
    * the raw payload BYTES per kind (byte-equality, the ground truth
    * any perceptual hash approximates), report copies, distinct
    * payloads, the dup ratio and stored-vs-logical byte volumes — the
    * numbers an asset store reads before dedup-compaction. At 100 TB
    * the groupBy key would be a content hash (this engine's exact-dedup
    * discipline: shuffle 16-byte digests, never payloads); byte-exact
    * grouping here keeps the oracle engine-replicable (payload =
    * UTF-8(text), injective, so the oracle groups on text). */
  def payloadDedup(spark: SparkSession, dir: String): DataFrame = {
    val groups = mediaTable(spark, dir)
      .groupBy("kind", "payload")
      .agg(count(lit(1)).as("n_copies"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    groups.groupBy("kind").agg(
      sum("n_copies").as("n_payloads"),
      count(lit(1)).as("n_distinct"),
      round(lit(1.0) - count(lit(1)).cast("double") / sum("n_copies"), 6)
        .as("dup_ratio"),
      sum(col("n_bytes") * col("n_copies")).as("logical_bytes"),
      sum("n_bytes").as("stored_bytes"))
  }

  /** ====== DECODE KERNEL — DETERMINISTIC FAKE ======
    * A real deployment replaces this one function with an actual codec
    * (e.g. TwelveMonkeys/ImageIO for images, JCodec for video); the
    * signature bytes→float tensor is the seam. The fake "decodes" a
    * payload into `dim` floats via byte-bucket averages so results are
    * stable across runs and partitionings. */
  private def decodeKernel(payload: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    if (payload.isEmpty) return out
    val counts = new Array[Int](dim)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      val bucket = b % dim
      out(bucket) += b.toDouble // integer sums stay exact in double (< 2^53)
      counts(bucket) += 1
      i += 1
    }
    var j = 0
    while (j < dim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
    out
  }

  private val FeatureDim = 16
  private val BatchSize = 64

  /** Batched decode + feature extraction. Processes fixed-size batches per
    * partition — the execution shape a vectorized (Arrow) decoder needs —
    * and returns (media_id, kind, features[16], n_bytes). */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(spark, dir)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("features", ArrayType(DoubleType)),
      StructField("n_bytes", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch boundary = where a vectorized decoder would process one
        // Arrow record batch
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // contract, not a dead null-branch (round-18 ledger note):
          // mediaTable payloads are UTF-8(documents.text), non-null by
          // construction — a NULL here means an upstream schema break
          // and must name itself instead of surfacing as a bare NPE
          require(payload != null,
            s"media payload is NULL for media_id=${r.getLong(0)} - " +
              "mediaTable payloads are non-null by construction")
          Row(r.getLong(0), r.getString(1),
            decodeKernel(payload, FeatureDim).toSeq, payload.length)
        }
      }
    }(enc)
  }

  /** "Resize": average-pool the fake feature tensor 16→4 (the plumbing for
    * a spatial downsample). Pure column expression — no kernel needed. */
  def resize(features: DataFrame): DataFrame =
    features.withColumn("features_4",
      expr("transform(sequence(0, 3), i -> (features[4*i] + features[4*i+1] + features[4*i+2] + features[4*i+3]) / 4.0D)"))

  /** "Frame sample": stride-sample every `stride`-th byte of the payload —
    * the shape of video frame sampling (seek + take), in the same batched
    * kernel style as decode (binary is opaque to SQL subscripting). */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 10): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("checksum", LongType),
      StructField("first_frame", IntegerType),
      StructField("last_frame", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    mediaTable(spark, dir)
      .filter(col("kind") === "video")
      .select("media_id", "payload")
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            require(payload != null, // the decodeFeatures contract, same seam
              s"media payload is NULL for media_id=${r.getLong(0)} - " +
                "mediaTable payloads are non-null by construction")
            val frames = payload.indices.by(stride).map(i => payload(i) & 0xff)
            // scalar digest per media (array columns break downstream
            // row-compare tooling; the full frame list stays internal)
            Row(r.getLong(0), frames.length, frames.map(_.toLong).sum,
              frames.headOption.getOrElse(0), frames.lastOption.getOrElse(0))
          }
        }
      }(enc)
  }

  /** Oracle-checkable metadata projection: proves binary round-trip and
    * struct plumbing with SQL-computable values. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        col("meta.width").as("width"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.mime").as("mime"))

  /** Oracle-checkable feature query: full decode → resize pipeline, emitted
    * long-form (media_id, level, bucket, feat) so every tensor cell is a
    * scalar row the DuckDB oracle can recompute (payload = UTF-8 of ASCII
    * text, so byte == codepoint). */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame = {
    // materialized ONCE: the two union branches otherwise each re-scan
    // documents and re-run the decode kernel (no exchange in the
    // scan→mapPartitions lineage, so nothing is reused between them —
    // the basketPairs shared-frame pattern)
    val f = resize(decodeFeatures(spark, dir)).localCheckpoint(true)
    val f16 = f.select(col("media_id"), col("kind"), col("n_bytes"),
      lit("f16").as("level"), posexplode(col("features")).as(Seq("bucket", "feat")))
    val f4 = f.select(col("media_id"), col("kind"), col("n_bytes"),
      lit("f4").as("level"), posexplode(col("features_4")).as(Seq("bucket", "feat")))
    f16.unionAll(f4)
  }
}
