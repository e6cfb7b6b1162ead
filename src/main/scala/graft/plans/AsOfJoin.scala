package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.graft.ColumnBridge

/** Native AS-OF JOIN — the custom-operator tier of the build rules
  * (SURVEY §7.4c): a whole-operator semantic Spark's built-ins only
  * express as join-explosion + window ([[graft.operators.Breadth
  * .asofJoin]]: every event × ALL its earlier orders, then row_number
  * = 1), re-planned as a `LogicalPlan` + `SparkStrategy` + physical
  * sorted-merge that touches each row ONCE.
  *
  * Semantics (inner as-of): for every left row, the single right row
  * with the same key and the greatest right-time <= left-time
  * (ties on right-time broken by greatest tie-break column); left rows
  * with no match are dropped.
  *
  * Scale story: both sides hash-cluster on the key and sort within
  * partitions — the same layout a sort-merge join pays — but the merge
  * emits at most ONE row per left row with O(1) state (the current
  * candidate), instead of materializing the quadratic
  * every-event×every-earlier-order intermediate the window formulation
  * buffers and then throws away. On a 100 TB fact⋈fact as-of, that
  * intermediate IS the bottleneck.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    isOuter: Boolean = false)
    extends BinaryNode {
  // Left-outer keeps unmatched left rows, so every right column may be
  // null in the output regardless of its source nullability.
  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one physical candidate, [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (the cluster plugin
  * path) or `spark.experimental.extraStrategies` (running session). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, outer) :: Nil
    case _ => Nil
  }
}

/** Physical sorted-merge as-of join.
  *
  * Requires children clustered on their keys (EnsureRequirements inserts
  * compatible hash exchanges, exactly as for a sort-merge join) and
  * sorted by (key, time[, tie-break]) — so the merge is a single
  * forward pass per partition: for each left row, right rows are
  * consumed while they are still <= the left time, the last one seen
  * for the current key being the as-of candidate. No per-key buffering,
  * no window state — O(1) memory beyond the two iterators. */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    isOuter: Boolean = false)
    extends BinaryExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" ->
      SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val outAttrs = output
    val outer = isOuter
    val rightWidth = right.output.size
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight: InternalRow = new GenericInternalRow(rightWidth)
      // key/time columns are long-backed (bigint / timestamp-micros);
      // nulls never match, per SQL join semantics
      def num(v: Any): Long = v.asInstanceOf[Number].longValue
      var candidate: InternalRow = null
      var candidateKey = 0L
      lIter.flatMap { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk == null || lt == null) {
          // null key/time never matches; outer still keeps the left row
          if (outer) {
            numOutputRows += 1
            Iterator.single(proj(joined(lRow, nullRight)))
          } else Iterator.empty
        } else {
          val lKey = num(lk); val lTime = num(lt)
          // consume right rows that can no longer matter (smaller key) or
          // that become the newest valid candidate (same key, time <= lt)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val rk = rKeyB.eval(peek)
            val rt = rTimeB.eval(peek)
            if (rk == null || rt == null) { rBuf.next() } // never matches
            else {
              val rKey = num(rk)
              if (rKey < lKey) rBuf.next() // bypassed key: drop
              else if (rKey == lKey && num(rt) <= lTime) {
                candidate = rBuf.next().copy() // newest valid so far wins
                candidateKey = rKey
              } else advancing = false // right is ahead: stop
            }
          }
          if (candidate != null && candidateKey == lKey) {
            numOutputRows += 1; numMatchedRows += 1
            Iterator.single(proj(joined(lRow, candidate)))
          } else if (outer) {
            numOutputRows += 1
            Iterator.single(proj(joined(lRow, nullRight)))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Public entry: as-of join two frames on string column names. The
    * strategy self-registers in the session (idempotent), so callers
    * need no session-construction cooperation. Column names must be
    * unambiguous per side; left/right must not share lineage (use
    * aliased copies for self-joins).
    *
    * `salt > 1` is the SKEW mitigation: the exec clusters on the raw
    * key, so one hot key lands on one reducer at 100 TB. Salting hashes
    * each left row into one of `salt` lanes and replicates the right
    * side into every lane — the hot key's merge work spreads over
    * `salt` reducers at the cost of a ×salt right-side shuffle (the
    * classic trade; use when left ≫ right). Output is IDENTICAL to the
    * unsalted join: each left row still sees the full right set for its
    * key. Keys must fit in a long after ×salt (lane id is packed
    * arithmetically so the merge stays a single long comparison). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      joinType: String = "inner",
      salt: Int = 1): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    if (salt > 1) {
      import org.apache.spark.sql.functions.{array, col, explode, lit, pmod, xxhash64}
      // the salted lane packs the key ARITHMETICALLY (key × salt + lane),
      // so the salted path needs a plain integral key — reject the
      // timestamp/date keys the unsalted path accepts with a usable
      // message instead of the Multiply AnalysisException they'd hit
      // below (round-16 review): the caller can pre-encode exactly
      // (unix_micros for timestamps, datediff-from-epoch for dates)
      // without this function guessing a lossy encoding for them.
      val integral = Set("bigint", "int", "smallint", "tinyint")
      for ((df, k, side) <- Seq((left, leftKey, "left"), (right, rightKey, "right"))) {
        val dt = df.schema(k).dataType.simpleString
        require(integral.contains(dt),
          s"asof(salt=$salt): the salted path packs lanes arithmetically and " +
            s"needs an integral key; $side key '$k' is $dt — pre-encode it " +
            "(unix_micros / datediff from epoch) or use salt = 1")
      }
      // the scratch names are withColumn'd then dropped — a caller frame
      // already carrying one would have its column silently replaced on
      // the input and removed from the output
      for (c <- Seq("__lane", "__rep", "__skey")
           if left.columns.contains(c) || right.columns.contains(c))
        throw new IllegalArgumentException(
          s"asof(salt=$salt): input already has a column named '$c' — " +
            "rename it; the salted path owns that name")
      // salt as a LONG literal: an Int literal over an IntegerType key
      // multiplies in 32-bit arithmetic and silently wraps, colliding
      // distinct keys onto one salted lane.
      // Lane hash over ALL left columns, not just (key, time): a hot key
      // with coarse-grained times (date-granularity) would collapse every
      // row of the hot (key, date) pair back onto ONE lane while the
      // ×salt right replication cost is still paid — whole-row hashing
      // spreads duplicates and stays deterministic for task retries.
      // MapType columns — at ANY nesting depth (a map inside a struct or
      // array fails xxhash64 the same way) — are dropped from the LANE
      // hash only; they still ride the join output. The key+time pair is
      // always hashable, so the hash input is never empty (round-16
      // review, nesting hole closed in the same round's diff review).
      import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
      def hasMap(dt: DataType): Boolean = dt match {
        case _: MapType => true
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: ArrayType => hasMap(a.elementType)
        case _ => false
      }
      val laneCols = left.schema.fields.filterNot(f => hasMap(f.dataType))
        .map(f => col(f.name)).toIndexedSeq
      val l2 = left
        .withColumn("__lane",
          pmod(xxhash64(laneCols: _*), lit(salt.toLong)))
        .withColumn("__skey", col(leftKey) * lit(salt.toLong) + col("__lane"))
      val r2 = right
        .withColumn("__rep",
          explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
        .withColumn("__skey", col(rightKey) * lit(salt.toLong) + col("__rep"))
      return asof(l2, r2, "__skey", "__skey", leftTime, rightTime,
        rightTieBreak, joinType)
        .drop("__lane", "__rep", "__skey")
    }
    val isOuter = joinType match {
      case "inner" => false
      case "left" | "left_outer" => true
      case other => throw new IllegalArgumentException(
        s"as-of joinType must be inner or left_outer, got $other")
    }
    val spark: SparkSession = left.sparkSession
    PlanApi.registerStrategy(spark, AsOfJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    import PlanApi.attr
    // the executor compares RAW long-backed values, so mismatched column
    // types don't error — they silently compare day-numbers against
    // micros (every right row "precedes" every left row) or
    // ClassCastException mid-task. Reject at the API instead.
    val longBacked = Set("bigint", "int", "smallint", "tinyint",
      "timestamp", "timestamp_ntz", "date")
    def checkPair(role: String, a: Attribute, b: Attribute): Unit = {
      require(a.dataType == b.dataType,
        s"as-of $role columns must have identical types: " +
          s"${a.name} is ${a.dataType.simpleString}, ${b.name} is ${b.dataType.simpleString}")
      require(longBacked.contains(a.dataType.simpleString),
        s"as-of $role columns must be integral/timestamp/date, " +
          s"got ${a.dataType.simpleString}")
    }
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    checkPair("key", lk, rk)
    checkPair("time", lt, rt)
    ColumnBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      lk, rk, lt, rt, attr(rPlan, rightTieBreak),
      isOuter))
  }
}
