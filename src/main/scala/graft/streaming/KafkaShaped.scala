package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-source-shaped ingestion. There is no broker in the test
  * environment, so the WIRE CONTRACT is exercised instead of a socket:
  * events are encoded into the exact DataFrame shape
  * `spark.read[Stream].format("kafka")` produces — binary key/value plus
  * topic/partition/offset/timestamp metadata columns — and the consumer
  * path (value bytes → `from_json` against a declared schema → typed
  * columns → aggregation) is the code a real topic would run unchanged;
  * only the `.format("parquet")` source line would become
  * `.format("kafka")`.
  *
  * Scale notes: parse + projection are map-side codegen'd expressions
  * (no UDF); the declared schema means no sampling pass over the topic;
  * partition-count parallelism comes from the source's `partition`
  * column exactly as from real Kafka topic partitions.
  */
object KafkaShaped {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", LongType),
    StructField("value", DoubleType)))

  /** Events → kafka-shaped records (the producer side a connector would
    * emit). The offset column carries the global event_id — unique and
    * increasing within each partition like real offsets, though not the
    * dense per-partition position counter a broker assigns (computing
    * one would cost a per-partition window shuffle the wire-contract
    * exercise doesn't need; round-18 review — the earlier doc overstated
    * this as "per-partition positions"). */
  def shaped(spark: SparkSession, dir: String, nPartitions: Int = 8): DataFrame =
    Tables.load(spark, dir, "events")
      .select(
        col("user_id").cast("string").cast("binary").as("key"),
        // event time rides the payload as epoch MICROS — the file's
        // physical precision, so encode→parse is lossless by construction
        to_json(struct(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts"), col("value"))).cast("binary").as("value"),
        lit("events").as("topic"),
        pmod(col("user_id"), lit(nPartitions)).cast("int").as("partition"),
        col("event_id").as("offset"),
        col("ts").as("timestamp"))

  /** Consumer-side round trip: parse the binary value payload back into
    * typed columns and aggregate — hash-matches the oracle computed from
    * the original rows, proving the encode/parse path is lossless. */
  def roundTrip(spark: SparkSession, dir: String): DataFrame =
    shaped(spark, dir)
      .select(from_json(col("value").cast("string"), eventSchema).as("e"))
      .select("e.*")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"),
        // payload ts is already epoch µs; oracle compares epoch_us(ts)
        max(col("ts")).as("max_ts"))
}
