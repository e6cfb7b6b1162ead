package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-pinned loaders for the driver-generated parquet testdata
  * (`/root/repo/TESTDATA.md`).
  *
  * Scale posture: the reference relies on CSV `inferSchema=True`
  * (`/root/reference/utils/kmeans_utils.py:34,40,44,46`), which costs a full
  * extra pass over the data per read — unacceptable at 100 TB. We declare
  * every schema explicitly so a scan starts immediately and Catalyst can
  * prune the read schema down to the referenced columns (visible as
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** `ts` is physically INT64 Timestamp(MICROS) — Spark's native timestamp
    * resolution, read directly by the vectorized reader. (An earlier
    * generation of the testdata stored NANOS, which the vectorized reader
    * rejects; [[load]] asserted its unit via a manual conversion and broke
    * silently when the data was regenerated. The schema now pins the
    * logical type and `ContractSpec` pins the decoded year range, so a
    * future unit flip fails loudly in one test instead of corrupting every
    * downstream time query.) */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Load one testdata table with its pinned schema.
    *
    * For `events`, a nano-epoch Long `ts_ns` is derived from the µs
    * timestamp for consumers that want an integer event time (exactly
    * `unix_micros * 1000`, so it is lossless against the file's MICROS
    * physical precision and stays in Long arithmetic — epoch nanos
    * overflow a double's 53-bit mantissa). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // named error instead of a bare NoSuchElementException("key not
    // found") from the Map — the message should say what the valid
    // tables ARE, since a typo here surfaces from deep inside a query
    require(schemas.contains(name),
      s"Tables.load: unknown table '$name' — expected one of " +
        schemas.keys.toSeq.sorted.mkString(", "))
    val df = spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      df.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    } else df
  }

  /** Run `body` with `frames` cached, eagerly materialize its result
    * (localCheckpoint), then unpersist the intermediates before returning.
    *
    * This is the session-hygiene seam for multi-use intermediates: a bare
    * `.cache()` with no unpersist leaks into the shared CacheManager for
    * the life of the session, and in a long query session (the bench runs
    * ~80 queries on one SparkSession) the accumulated blocks degrade every
    * subsequent query. Checkpoint blocks, by contrast, are owned by the
    * returned frame's RDD and reclaimed by the ContextCleaner once the
    * caller drops it. */
  def withCached(frames: DataFrame*)(body: => DataFrame): DataFrame = {
    frames.foreach(_.cache())
    try body.localCheckpoint(true)
    finally frames.foreach(_.unpersist(blocking = false))
  }
}
