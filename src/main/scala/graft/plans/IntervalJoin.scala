package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.ColumnBridge

/** Native POINT-IN-INTERVAL JOIN — the second custom-operator-tier plan
  * (SURVEY §7.4c, beside [[AsOfJoinPlan]]): left rows carry a numeric
  * point, right rows carry `[lo, hi)` intervals (arbitrary — irregular
  * widths, overlaps, gaps), and the join emits every (point, interval)
  * containment pair.
  *
  * Spark's built-in plan for a non-equi theta join is
  * BroadcastNestedLoopJoin: every left row compares against EVERY
  * interval — O(n·m) comparisons. When intervals are regular, arithmetic
  * binning turns it into an equi-join ([[graft.operators.Scale
  * .binnedRangeJoin]]); this operator covers the irregular case the
  * binning trick can't: the broadcast intervals are sorted by `lo` once
  * per partition, each point binary-searches its candidate window, and a
  * running-max-of-`hi` prefix bounds the backward scan — O(n log m + out)
  * instead of O(n·m).
  *
  * Scale story: the left (point) side streams with NO shuffle at all —
  * any partitioning works, there is no required distribution — and the
  * interval side is a broadcast dim, exactly the regime (big fact,
  * small-but-irregular dim) where the nested loop hurts most.
  *
  * PRECISION DOMAIN: point/lo/hi compare as doubles inside the probe, so
  * integral inputs are exact only up to 2⁵³. Keys beyond that (e.g.
  * nano-epoch longs ~1.7e18) round, and containment at interval edges
  * can flip — use micro-epoch (or smaller) keys, which stay exact past
  * year 2200.
  */
final case class IntervalJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    lo: Expression,
    hi: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, p, lo, hi) =>
      IntervalJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Physical broadcast interval join: EnsureRequirements wraps the right
  * child in an identity-mode BroadcastExchange; each left partition sorts
  * the (small) interval array by `lo` once, then probes per point. */
final case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    point: Expression,
    lo: Expression,
    hi: Expression)
    extends BinaryExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val pointB = BindReferences.bindReference(point, left.output)
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val outAttrs = output
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    // index memoization key: same broadcast + same bound expressions →
    // same sorted index; computed on the driver so the closure carries
    // only compact values. Keyed by the CANONICALIZED expression strings,
    // not semanticHash (round-16 review): hash-as-identity would serve
    // the wrong index to a colliding join with no way to detect it —
    // the canonical form is exact at the same per-executor cost.
    val cacheKey = (bcast.id, lo.canonicalized.toString, hi.canonicalized.toString)
    val numOutputRows = longMetric("numOutputRows")
    left.execute().mapPartitions { lIter =>
      // the sorted index over the broadcast dim (lo-sorted arrays +
      // running-max-of-hi prefix) is built ONCE per executor and shared
      // by every left partition — not rebuilt per partition
      val index = IntervalJoinExec.cachedIndex(cacheKey, () => {
        val triples = bcast.value.flatMap { r =>
          val lv = loB.eval(r); val hv = hiB.eval(r)
          if (lv == null || hv == null) None // null bounds never match
          else {
            val ld = lv.asInstanceOf[Number].doubleValue
            val hd = hv.asInstanceOf[Number].doubleValue
            // a NaN bound never matches any point (every comparison is
            // false) — but left IN the index it would poison the
            // prefMaxHi running max (max(x, NaN) = NaN), silently
            // dropping genuine matches for every point probing at or
            // past it (round-16 review). Drop like nulls.
            if (ld.isNaN || hd.isNaN) None else Some((ld, hd, r))
          }
        }.sortBy(_._1)
        val n = triples.length
        val los = new Array[Double](n)
        val his = new Array[Double](n)
        val prefMaxHi = new Array[Double](n)
        val rows = new Array[InternalRow](n)
        var m = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          los(i) = triples(i)._1; his(i) = triples(i)._2
          rows(i) = triples(i)._3
          m = math.max(m, his(i)); prefMaxHi(i) = m
          i += 1
        }
        new SortedIntervals(los, his, prefMaxHi, rows)
      })
      val n = index.los.length
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // first index with los(idx) > v  (los is sorted ascending)
      def upperBound(v: Double): Int = {
        var a = 0; var b = n
        while (a < b) {
          val mid = (a + b) >>> 1
          if (index.los(mid) <= v) a = mid + 1 else b = mid
        }
        a
      }
      lIter.flatMap { lRow =>
        val pv = pointB.eval(lRow)
        if (pv == null || n == 0) Iterator.empty
        else {
          val v = pv.asInstanceOf[Number].doubleValue
          // lazy iterator, no buffer, no per-row copy: the projection's
          // reused row is the standard operator contract (consumers that
          // buffer copy for themselves) — high-fanout containment joins
          // otherwise paid an ArrayBuffer plus one UnsafeRow copy per
          // output row on the hot path. Candidates have lo <= v by
          // construction; the scan stops once no interval at or below
          // idx can still reach past v (prefMaxHi bound).
          new Iterator[InternalRow] {
            private var idx = upperBound(v) - 1
            private def skipNonMatches(): Unit =
              while (idx >= 0 && index.prefMaxHi(idx) > v && index.his(idx) <= v)
                idx -= 1
            skipNonMatches()
            override def hasNext: Boolean = idx >= 0 && index.prefMaxHi(idx) > v
            override def next(): InternalRow = {
              val r = proj(joined(lRow, index.rows(idx)))
              numOutputRows += 1
              idx -= 1
              skipNonMatches()
              r
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** lo-sorted interval index shared across the left partitions of one
  * executor: parallel arrays (cache-friendly probe loop) plus the
  * original broadcast rows for output assembly. */
final private[plans] class SortedIntervals(
    val los: Array[Double],
    val his: Array[Double],
    val prefMaxHi: Array[Double],
    val rows: Array[InternalRow])

object IntervalJoinExec {
  // per-executor LRU memo of built indexes (access-ordered, evict the
  // eldest past 64 entries): a broadcast dim is small by contract, but a
  // long-lived executor running many DISTINCT interval joins must not
  // pin every index forever, and the previous clear-everything eviction
  // dropped hot entries of concurrent queries along with the cold ones
  // per-key memoized build cell: the map lock below covers only the
  // get/put, and the actual build() runs under the cell's own lazy-val
  // lock — distinct keys build concurrently and cache hits of unrelated
  // keys never block behind a slow build (a single global lock around
  // build() serialized every index build on the executor)
  private final class IndexCell(build: () => SortedIntervals) {
    lazy val value: SortedIntervals = build()
  }
  private val cache =
    new java.util.LinkedHashMap[(Long, String, String), IndexCell](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Long, String, String), IndexCell]): Boolean =
        size() > 64
    }
  private[plans] def cachedIndex(
      key: (Long, String, String), build: () => SortedIntervals): SortedIntervals = {
    val cell = cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else { val c = new IndexCell(build); cache.put(key, c); c }
    }
    cell.value
  }
}

object IntervalJoin {
  /** Public entry: join `left` points into `right` `[lo, hi)` intervals
    * by column name. Strategy self-registers in the session
    * (idempotent). */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    PlanApi.registerStrategy(spark, IntervalJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    import PlanApi.attr
    val (p, l, h) = (attr(lPlan, pointCol), attr(rPlan, loCol), attr(rPlan, hiCol))
    // the probe compares Number-backed doubles: a decimal (Spark's
    // Decimal is not a java.lang.Number) or string column would CCE
    // mid-task AFTER the broadcast is built — reject at the API like
    // AsOfJoin does for its long-backed columns
    val numberBacked = Set("tinyint", "smallint", "int", "bigint",
      "float", "double")
    for (a <- Seq(p, l, h))
      require(numberBacked.contains(a.dataType.simpleString),
        s"pointInInterval: column ${a.name} must be a plain numeric type " +
          s"(got ${a.dataType.simpleString}) — cast decimals/strings " +
          "explicitly; values compare as doubles (exact to 2^53)")
    ColumnBridge.ofRows(spark, IntervalJoinPlan(lPlan, rPlan, p, l, h))
  }
}
