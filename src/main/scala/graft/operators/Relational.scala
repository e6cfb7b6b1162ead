package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reference-parity relational operators re-targeted onto the testdata star
  * schema (mapping table: `/root/repo/FIXTURES.md` §C).
  *
  * Every operator shape of the reference appears here:
  *   - A1 two-key groupBy+sum      (`/root/reference/utils/kmeans_utils.py:36`)
  *   - A2 agg-of-agg avg/min/max   (`/root/reference/utils/kmeans_utils.py:37-38`)
  *   - A3 groupBy+mean             (`/root/reference/utils/kmeans_utils.py:42`)
  *   - A4 dropDuplicates           (`/root/reference/utils/kmeans_utils.py:48`)
  *   - J1-J4 equi-joins inner/left (`/root/reference/utils/kmeans_utils.py:48,50`)
  *   - P1 derived date column      (`/root/reference/utils/kmeans_utils.py:30`)
  *   - P5/F6 log features          (`/root/reference/utils/kmeans_utils.py:63-64`)
  *   - P6 na.fill(0)               (`/root/reference/utils/kmeans_utils.py:50`)
  *
  * Scale notes (100 TB posture):
  *   - dimension joins (`customer ⋈ nation`, anything ⋈ `region`) are
  *     explicitly `broadcast()` — a dim of a few MB must never shuffle the
  *     fact side;
  *   - fact⋈fact joins (`lineitem ⋈ orders`) shuffle on the join key; the
  *     two-level aggregation A1→A2 keeps the first groupBy keyed on
  *     `(custkey, orderkey)` so the second groupBy on `custkey` needs no
  *     second full shuffle of the wide data;
  *   - money aggregates are summed as DECIMAL(18,4): the inputs are exact
  *     2-dp values, so per-row products are exact 4-dp values and decimal
  *     summation is exact and ORDER-INDEPENDENT — the result is identical
  *     no matter how partial aggregation interleaves across 1000 executors
  *     (double summation would drift in the last ulp and flip rounded
  *     values nondeterministically).
  */
object Relational {

  /** Exact per-row revenue: 2dp price × (1 − 2dp discount) is an exact 4dp
    * value; DECIMAL(18,4) captures it losslessly. */
  private def revDec: Column =
    (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(18, 4))

  /** lineitem ⋈ orders keyed revenue rows, the shared A1 input.
    *
    * The sum is pushed BELOW the join: lineitem collapses to one row per
    * orderkey first (~4× fewer, narrower rows through the join shuffle),
    * and the post-join (custkey, orderkey) grouping is then trivially
    * satisfied because orderkey is already unique. Decimal sums are
    * order-independent, so results are bit-identical to the join-first
    * formulation. At 100 TB this is the difference between shuffling the
    * whole fact table twice and shuffling it once pre-reduced. */
  private def orderRevDec(spark: SparkSession, dir: String): DataFrame = {
    val liAgg = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), revDec.as("rev"))
      .groupBy("l_orderkey")
      .agg(sum("rev").as("rev_dec"))
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
    liAgg.join(o, liAgg("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("custkey"),
        col("l_orderkey").as("orderkey"), col("rev_dec"))
  }

  /** A1 analog: per-(customer, order) revenue. */
  def sessionRevenue(spark: SparkSession, dir: String): DataFrame =
    orderRevDec(spark, dir)
      .select(col("custkey"), col("orderkey"),
        col("rev_dec").cast("double").as("order_rev"))

  /** A2 analog: re-aggregation of A1 → per-customer buy stats. */
  def userStats(spark: SparkSession, dir: String): DataFrame =
    orderRevDec(spark, dir)
      .groupBy("custkey")
      .agg(
        (sum("rev_dec").cast("double") / count(lit(1))).as("avg_buy"),
        min("rev_dec").cast("double").as("min_buy"),
        max("rev_dec").cast("double").as("max_buy"))

  /** A3 analog: avg(value) per user over `events` (accuracy = avg(isHit)).
    * `value` is exact 2dp → decimal sum / count is exact. */
  def accuracy(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("user_id").as("custkey"))
      .agg((sum(col("value").cast(DecimalType(18, 4))).cast("double")
        / count(lit(1))).as("accuracy"))

  /** J1 + A4 analog: dim join + projection + dropDuplicates.
    * `nation` is broadcast — the fact side never shuffles for a dim join. */
  def strengths(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n = Tables.load(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("c_custkey").as("custkey"),
        col("n_regionkey").cast("double").as("strength"))
      .dropDuplicates()
  }

  /** Q6 emulation: multi-valued strengths dim. The reference's
    * `strengths` dedups on (userId, strength) PAIRS
    * (`/root/reference/utils/kmeans_utils.py:48`) — a user on several
    * teams keeps one row per distinct strength, and the later left join
    * then DUPLICATES that user's feature rows, so K-Means sees them as
    * distinct weighted points. The customer→nation re-target is 1:1 and
    * makes that quirk structurally invisible, so this variant rebuilds a
    * genuinely multi-valued dim from order priorities: a customer
    * ordering at 3 distinct priorities keeps 3 strength rows. */
  def strengthsMulti(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("custkey"),
        substring(col("o_orderpriority"), 1, 1).cast("double").as("strength"))
      .dropDuplicates()

  /** [[customerFeatures]] against the multi-valued dim — reproduces Q6's
    * duplicated-feature-row semantics end-to-end (oracle-checked). */
  def customerFeaturesMulti(spark: SparkSession, dir: String): DataFrame = {
    val joined = ages(spark, dir)
      .join(userStats(spark, dir), Seq("custkey"))
      .join(accuracy(spark, dir), Seq("custkey"))
      .join(strengthsMulti(spark, dir), Seq("custkey"), "left")
    joined.na.fill(0)
  }

  /** The pipeline's "today" anchor. With `referenceQuirks` on, the parse
    * reproduces reference bug Q1 verbatim: `'yyyy-mm-dd'` uses mm =
    * MINUTES (`/root/reference/utils/kmeans_utils.py:30`), so the month
    * field defaults to January and every age shifts by ~5 months. Default
    * off = the corrected `'yyyy-MM-dd'` (the oracle-facing mode); both
    * modes are pinned in QuirkSpec. */
  private def anchorDate(referenceQuirks: Boolean): Column =
    to_date(lit("2016-06-16"), if (referenceQuirks) "yyyy-mm-dd" else "yyyy-MM-dd")

  /** P1/F2-F4 analog: derived age column — datediff(to_date(lit), d)/365. */
  def ageDerivation(spark: SparkSession, dir: String,
      referenceQuirks: Boolean = false): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("orderkey"),
        (datediff(anchorDate(referenceQuirks), col("o_orderdate"))
          / lit(365)).as("age"))

  /** Per-customer age from first order date (dob analog for the pipeline). */
  def ages(spark: SparkSession, dir: String,
      referenceQuirks: Boolean = false): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg((datediff(anchorDate(referenceQuirks),
        min("o_orderdate")) / lit(365)).as("age"))

  /** P5/F6 analog: natural-log features over the A2 stats. Rounded to 6 dp
    * because libm log may differ from the JVM's by 1 ulp. */
  def logFeatures(spark: SparkSession, dir: String): DataFrame =
    userStats(spark, dir).select(
      col("custkey"),
      round(log(col("avg_buy")), 6).as("log_avg_buy"),
      round(log(col("min_buy")), 6).as("log_min_buy"),
      round(log(col("max_buy")), 6).as("log_max_buy"))

  /** §7.1 flagship: the full `load_data` analog — S2→P1→A1→A2→A3→J2-J4→P6
    * in one query (`/root/reference/utils/kmeans_utils.py:15-52`).
    *
    * Join order (and therefore column order) mirrors the reference:
    * ages ⋈ buy-stats ⋈ accuracy, LEFT ⋈ strengths, then na.fill(0) —
    * quirks Q3 (positional features) and Q5 (blanket fill) preserved.
    */
  def customerFeatures(spark: SparkSession, dir: String,
      referenceQuirks: Boolean = false): DataFrame = {
    val joined = ages(spark, dir, referenceQuirks)
      .join(userStats(spark, dir), Seq("custkey"))
      .join(accuracy(spark, dir), Seq("custkey"))
      .join(strengths(spark, dir), Seq("custkey"), "left")
    joined.na.fill(0)
  }

  /** TPC-H Q2-shaped min-cost supplier: for each mid-size part, the
    * supplier offering the lowest observed unit price (ties broken by
    * richest supplier, then lowest suppkey — Q2's ORDER BY s_acctbal DESC
    * shape). There is no partsupp table in the testdata, so observed unit
    * cost comes from lineitem: min(l_extendedprice / l_quantity) per
    * (part, supplier).
    *
    * Scale shape: the p_size part filter is pushed below the lineitem
    * pre-aggregation as a broadcast left-semi join, so the only big
    * shuffle — the (l_partkey, l_suppkey) aggregation — runs over the
    * surviving rows only; map-side partial min keeps it small.
    * `supplier` and `part` are dims and explicitly broadcast, so the
    * aggregated (part, supplier) frame never re-shuffles for either join.
    * The per-part argmin is one more keyed shuffle of the already-tiny
    * aggregate via min(struct(...)) — no window, no join-back on a double
    * equality. Unit cost is a single IEEE division of exact inputs, so it
    * is bit-identical across engines and needs no rounding.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_name", "s_acctbal")
    val prt = Tables.load(spark, dir, "part")
      .filter(col("p_size").between(10, 25))
      .select("p_partkey", "p_name", "p_size", "p_retailprice")
    // the p_size filter reaches lineitem BEFORE the big pre-aggregation:
    // a broadcast LEFT SEMI on the filtered part keys discards ~3×
    // the rows up front instead of aggregating parts the final inner
    // join would drop anyway (result is identical — the last join is
    // inner on the same keys)
    val unitCost = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("cost"))
      .join(broadcast(prt.select(col("p_partkey").as("l_partkey"))),
        Seq("l_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("cost").as("unit_cost"))
    // argmin per part: struct ordering = (unit_cost asc, acctbal desc,
    // suppkey asc); carried fields after the tiebreak are just cargo
    val best = unitCost
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(min(struct(col("unit_cost"), (-col("s_acctbal")).as("neg_bal"),
        col("s_suppkey"), col("s_name"), col("s_acctbal"))).as("pick"))
    best
      .join(broadcast(prt), Seq("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("p_retailprice"), col("pick.s_name").as("s_name"),
        col("pick.s_acctbal").as("s_acctbal"),
        col("pick.unit_cost").as("unit_cost"))
  }
}
