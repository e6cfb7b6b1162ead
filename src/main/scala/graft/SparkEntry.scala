package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 has a `queries` entry; SQL-expressible
  * ones also have an `oracleSql` entry (DuckDB dialect, same parquet
  * tables). Column names are aliased identically on both sides — the
  * driver's compare hashes values under sorted column names.
  *
  * Float discipline: money columns are exact 2-dp doubles (verified over
  * the testdata), so revenue products are summed as DECIMAL(18,4) — exact
  * and order-independent — then cast back to double. This keeps Spark and
  * DuckDB bit-identical without fragile rounding of order-dependent
  * double sums.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.customerFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_session_revenue"   -> Relational.sessionRevenue _,
    "q_user_stats"        -> Relational.userStats _,
    "q_accuracy"          -> Relational.accuracy _,
    "q_strengths"         -> Relational.strengths _,
    "q_age_derivation"    -> Relational.ageDerivation _,
    "q_log_features"      -> Relational.logFeatures _,
    "q_customer_features" -> Relational.customerFeatures _,
  )

  // Shared oracle CTE fragments (DuckDB dialect).
  private val orderRevCte =
    """order_rev AS (
      |  SELECT o.o_custkey AS custkey, l.l_orderkey AS orderkey,
      |         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS rev_dec
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2)""".stripMargin

  private val userStatsCte =
    s"""$orderRevCte,
       |stats AS (
       |  SELECT custkey,
       |         CAST(SUM(rev_dec) AS DOUBLE) / COUNT(*) AS avg_buy,
       |         CAST(MIN(rev_dec) AS DOUBLE) AS min_buy,
       |         CAST(MAX(rev_dec) AS DOUBLE) AS max_buy
       |  FROM order_rev GROUP BY 1)""".stripMargin

  /** DuckDB-dialect oracle per SQL-expressible query. */
  def oracleSql: Map[String, String] = Map(
    "q_session_revenue" ->
      s"""WITH $orderRevCte
         |SELECT custkey, orderkey, CAST(rev_dec AS DOUBLE) AS order_rev
         |FROM order_rev""".stripMargin,
    "q_user_stats" ->
      s"""WITH $userStatsCte
         |SELECT custkey, avg_buy, min_buy, max_buy FROM stats""".stripMargin,
    "q_accuracy" ->
      """SELECT user_id AS custkey,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS accuracy
        |FROM events GROUP BY 1""".stripMargin,
    "q_strengths" ->
      """SELECT DISTINCT c_custkey AS custkey,
        |       CAST(n_regionkey AS DOUBLE) AS strength
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q_age_derivation" ->
      """SELECT o_orderkey AS orderkey,
        |       DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2016-06-16') / 365.0 AS age
        |FROM orders""".stripMargin,
    "q_log_features" ->
      s"""WITH $userStatsCte
         |SELECT custkey, ROUND(LN(avg_buy), 6) AS log_avg_buy,
         |       ROUND(LN(min_buy), 6) AS log_min_buy,
         |       ROUND(LN(max_buy), 6) AS log_max_buy
         |FROM stats""".stripMargin,
    "q_customer_features" ->
      s"""WITH $userStatsCte,
         |ages AS (
         |  SELECT o_custkey AS custkey,
         |         DATE_DIFF('day', CAST(MIN(o_orderdate) AS DATE), DATE '2016-06-16') / 365.0 AS age
         |  FROM orders GROUP BY 1),
         |acc AS (
         |  SELECT user_id AS custkey,
         |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS accuracy
         |  FROM events GROUP BY 1),
         |strengths AS (
         |  SELECT DISTINCT c_custkey AS custkey,
         |         CAST(n_regionkey AS DOUBLE) AS strength
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
         |SELECT a.custkey, a.age, s.avg_buy, s.min_buy, s.max_buy,
         |       x.accuracy, COALESCE(st.strength, 0) AS strength
         |FROM ages a
         |JOIN stats s USING (custkey)
         |JOIN acc x USING (custkey)
         |LEFT JOIN strengths st USING (custkey)""".stripMargin,
  )
}
