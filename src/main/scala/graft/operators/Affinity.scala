package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Co-occurrence and sequence mining — "what appears together" over
  * baskets (orders) and "what follows what" over event streams. Both are
  * classic training-corpus analytics (association rules feed
  * recommendation features; path n-grams feed behavioral models).
  *
  * Scale notes:
  *   - basket pairs NEVER self-join the fact: each order's distinct-brand
  *     set is assembled by one keyed aggregation (basket size is bounded
  *     by order size, ~7 items), and the pair expansion is a map-side
  *     array transform of that bounded set — candidate volume is
  *     Σ C(b_i, 2), not |fact|². The DuckDB oracle uses the textbook
  *     self-join, which is fine at test scale and exactly what this
  *     formulation avoids at 100 TB;
  *   - lift/confidence divide INTEGER counts in double, once, on operands
  *     both engines compute identically — no accumulation-order drift;
  *   - path trigrams shuffle once on user_id for the ordered window, then
  *     count fixed-vocabulary trigram strings — state per user is the
  *     window's two-row lookahead, never the whole history.
  */
object Affinity {

  /** MARKET-BASKET PAIR MINING — brand pairs co-purchased in one order,
    * with support count, lift and directional confidence
    * (the Apriori L2 pass, relationally):
    *   lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)
    * Pairs below `minSupport` co-occurrences are cut (the Apriori
    * support threshold — also what keeps the output bounded).
    *
    * Ones-counts and the order total are tiny (brand-vocabulary-sized /
    * 1 row) → broadcast back onto the pair counts; the only data-sized
    * shuffles are the per-order basket aggregation and the pair count. */
  def basketPairs(spark: SparkSession, dir: String, minSupport: Long = 5L): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part").select("p_partkey", "p_brand")
    val ob = li.select("l_orderkey", "l_partkey")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
    // The distinct (order, brand) frame feeds three aggregations, each of
    // which Catalyst rewrites differently (collect_set absorbs the
    // distinct; countDistinct splits it) — so their exchanges never
    // canonicalize equal and exchange reuse cannot fire. Materialize it
    // ONCE instead (the [[Graph.pageRank]] pattern): one scan + one
    // distinct of the fact, three consumers of the checkpointed blocks.
    // The frame is distinct (order, brand) pairs — strictly smaller than
    // the fact and two narrow columns wide, so the materialization is
    // bounded; the spec pins a single lineitem scan in the final plan.
    val dd = ob.distinct().localCheckpoint(true)
    val baskets = dd.groupBy("okey").agg(sort_array(collect_set("brand")).as("brands"))
    val nOrders = dd.select(countDistinct("okey").as("n_orders"))
    val singles = dd.groupBy("brand").agg(count(lit(1)).as("n1"))
    val pairs = baskets.select(explode(expr(
      """flatten(transform(brands, (x, i) ->
        |  transform(slice(brands, i + 2, size(brands) - i - 1),
        |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(singles.select(col("brand").as("a"), col("n1").as("n_a"))), "a")
      .join(broadcast(singles.select(col("brand").as("b"), col("n1").as("n_b"))), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"),
        // denominator multiplies as DOUBLES: a Long*Long product of two
        // popular brands' counts overflows at warehouse scale and the
        // wrap emits a plausible-looking negative lift with no error
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_a_to_b"))
  }

  /** EVENT PATH TRIGRAMS — the top consecutive event-type triples across
    * users (sequence mining for behavioral features). Per user, events
    * are ordered by (ts, event_id) — event_id is unique, so the order and
    * therefore every trigram is deterministic under any partitioning.
    * Top-k cut breaks count ties on the trigram string itself. */
  def pathTrigrams(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lead("event_type", 1).over(w))
      .withColumn("t2", lead("event_type", 2).over(w))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2")).as("trigram"))
      .groupBy("trigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram"))
      .limit(k)
  }
}
