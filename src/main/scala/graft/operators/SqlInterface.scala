package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-string entry point: registers every testdata table as a temp view
  * and runs ANSI SQL through `spark.sql` — a user of the engine can issue
  * the same query text they run today. (The reference is 100% DataFrame
  * API — this is capability breadth beyond it.)
  */
object SqlInterface {

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register `<name>` views over dir for SQL-text querying. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }

  /** TPC-H Q3 (shipping priority) via SQL text, decimal-exact revenue. */
  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT l_orderkey AS orderkey,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       CAST(o_orderdate AS DATE) AS orderdate_str
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, orderkey ASC
        |LIMIT 10""".stripMargin)
      .withColumn("orderdate_str", col("orderdate_str").cast("string"))
  }

  /** Correlated scalar subquery via SQL text: customers above their
    * nation's average balance. */
  def aboveNationAvg(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT c_custkey AS custkey, c_nationkey AS nationkey, c_acctbal AS acctbal
        |FROM customer c1
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)""".stripMargin)
  }
}

/** CSV source/sink parity (reference S1/S2/S5 —
  * `/root/reference/utils/kmeans_utils.py:28-46,112-130`): declared-schema
  * CSV read, inferred-schema CSV read, and a CSV round-trip through a sink.
  * The round-trip is exercised against a temp dir at query time.
  */
object CsvIo {

  /** Write a small result as CSV (S5 sink), read it back BOTH ways the
    * reference reads CSVs — declared schema (S1) and inferSchema (S2) —
    * and return the inner join proving identical content. */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val stats = Relational.userStats(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    // repartition(1), NOT coalesce(1): coalesce propagates upstream and
    // would collapse the whole join+agg pipeline into a single task; the
    // round-robin exchange keeps upstream parallel and only the final
    // file write is single-task (the reference's single-CSV contract).
    stats.repartition(1).write.mode("overwrite")
      .option("header", true).csv(s"$tmp/user_stats")
    val declared = StructType(Seq(
      StructField("custkey", LongType),
      StructField("avg_buy", DoubleType),
      StructField("min_buy", DoubleType),
      StructField("max_buy", DoubleType)))
    val s1 = spark.read.schema(declared).option("header", true)
      .csv(s"$tmp/user_stats")
    val s2 = spark.read.option("inferSchema", true).option("header", true)
      .csv(s"$tmp/user_stats")
      .select(col("custkey").cast("long").as("custkey"),
        col("avg_buy").cast("double"), col("min_buy").cast("double"),
        col("max_buy").cast("double"))
    // inner join on all columns: row count == original ⇔ lossless round-trip
    s1.join(s2, Seq("custkey", "avg_buy", "min_buy", "max_buy"))
  }

  /** JSON-lines + ORC sink/source round trip — the rest of Spark's
    * built-in format matrix beside CSV ([[roundTrip]]) and parquet
    * (every other query). Doubles survive JSON via shortest-round-trip
    * printing; ORC is binary-lossless. The all-columns inner join of the
    * two re-reads proves both formats preserved every row bit-exactly
    * (row count == original ⇔ lossless), and the shared oracle pins the
    * values. */
  def formatRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val stats = Relational.userStats(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    stats.write.mode("overwrite").json(s"$tmp/stats_json")
    stats.write.mode("overwrite").orc(s"$tmp/stats_orc")
    val declared = StructType(Seq(
      StructField("custkey", LongType),
      StructField("avg_buy", DoubleType),
      StructField("min_buy", DoubleType),
      StructField("max_buy", DoubleType)))
    val j = spark.read.schema(declared).json(s"$tmp/stats_json")
    val o = spark.read.schema(declared).orc(s"$tmp/stats_orc")
    j.join(o, Seq("custkey", "avg_buy", "min_buy", "max_buy"))
  }
}
